package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression,
  ImplicitCastInputTypes, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Length of the common prefix of the two SUFFIXES of one string `w`
  * starting at (0-based) positions `pa` and `pb` — the kernel under the
  * LCP array (C101): with the suffix array (C99) giving rank order and
  * this expression giving adjacent-rank common-prefix lengths, repeated
  * substrings are exactly the LCP ≥ threshold runs (Manber & Myers 1993;
  * Kasai et al. CPM 2001 for the classic LCP construction this replaces
  * on the bounded gate window).
  *
  * Why an Expression: the comparison is an iterative tight loop per row
  * (like the Hilbert walk) — spelled as Column algebra it would explode
  * one branch per character; here `doGenCode` emits the loop inside
  * WholeStageCodegen, byte-compares only, zero allocation (no substring
  * is ever materialized — the C99 discipline).
  *
  * Byte-vs-char: comparison is on UTF-8 BYTES, which equals character
  * comparison on the sanitized lowercase-ASCII charset the suffix keys
  * feed it (C99's regexp strips everything else). On general UTF-8 a
  * byte-level common prefix can end mid-codepoint; callers outside the
  * sanitized domain must handle that.
  */
case class CommonPrefixLengthAt(first: Expression, second: Expression,
    third: Expression) extends TernaryExpression with ImplicitCastInputTypes {

  override def dataType: DataType = LongType
  override def prettyName: String = "common_prefix_length_at"
  // ImplicitCastInputTypes so a SQL caller's plain INT literals coerce
  // (common_prefix_length_at(w, 1, 3) used to fail analysis demanding
  // BIGINT — r11 ADVICE); in-repo call sites already pass LongType
  override def inputTypes: Seq[GraftSqlBridge.GraftAbstractDataType] =
    Seq(StringType, LongType, LongType)

  override def nullSafeEval(w: Any, a: Any, b: Any): Any = {
    val s = w.asInstanceOf[UTF8String]
    val n = s.numBytes.toLong
    val pa = a.asInstanceOf[Long]
    val pb = b.asInstanceOf[Long]
    // out-of-domain positions (negative — e.g. from a SQL caller) name no
    // suffix: empty common prefix, NOT an unsafe byte read
    if (pa < 0 || pb < 0) return 0L
    var i = 0L
    while (pa + i < n && pb + i < n &&
        s.getByte((pa + i).toInt) == s.getByte((pb + i).toInt)) i += 1
    i
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (w, a, b) => {
      val n = ctx.freshName("cplN"); val i = ctx.freshName("cplI")
      s"""
         |long $n = (long) $w.numBytes();
         |long $i = 0L;
         |if ($a >= 0 && $b >= 0) {
         |  while ($a + $i < $n && $b + $i < $n &&
         |      $w.getByte((int) ($a + $i)) == $w.getByte((int) ($b + $i))) {
         |    $i++;
         |  }
         |}
         |${ev.value} = $i;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(f: Expression,
      s: Expression, t: Expression): Expression =
    copy(first = f, second = s, third = t)
}

/** Column-API entry point for the suffix expressions. */
object suffix {
  import GraftSqlBridge.{column, expression}

  def common_prefix_length_at(w: Column, pa: Column, pb: Column): Column =
    column(CommonPrefixLengthAt(expression(w), expression(pa),
      expression(pb)))
}
