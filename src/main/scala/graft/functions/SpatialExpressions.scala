package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Hilbert-curve index of a 2-D point whose coordinates are already
  * normalized to `[0, 2^bits)` — the data-clustering sibling of the Morton
  * key (graft.sources.Sinks.zorderKey) with strictly better locality:
  * consecutive curve positions are always grid-adjacent (no Morton
  * "seams"), so a sort by this key gives tighter per-file bounding boxes
  * for the same file count.
  *
  * The standard xy→d walk (s halving from 2^(bits-1), quadrant digit
  * `(3·rx) ⊕ ry`, mirror+swap rotation when ry = 0) is ITERATIVE state —
  * expressed as chained Column algebra the expression tree re-inlines and
  * grows exponentially per iteration, which is exactly when a custom
  * codegen Expression is the right tool: `doGenCode` emits the tight
  * integer loop, one per row, inside WholeStageCodegen. All arithmetic is
  * integer, so any engine replays it (the DuckDB oracle unrolls the loop
  * as one CTE per bit).
  */
case class HilbertIndex(left: Expression, right: Expression, bits: Int)
    extends BinaryExpression {
  require(bits >= 1 && bits <= 31, s"bits=$bits must be in [1, 31]")

  override def dataType: DataType = LongType
  override def prettyName: String = "hilbert_index"

  override def nullSafeEval(a: Any, b: Any): Any = {
    var x = a.asInstanceOf[Long]
    var y = b.asInstanceOf[Long]
    var d = 0L
    var s = 1L << (bits - 1)
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3L * rx) ^ ry)
      if (ry == 0) {
        if (rx == 1) { x = s - 1 - x; y = s - 1 - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (xa, ya) => {
      val x = ctx.freshName("hx"); val y = ctx.freshName("hy")
      val d = ctx.freshName("hd"); val s = ctx.freshName("hs")
      val rx = ctx.freshName("rx"); val ry = ctx.freshName("ry")
      val t = ctx.freshName("ht")
      s"""
         |long $x = $xa; long $y = $ya; long $d = 0L;
         |for (long $s = 1L << ${bits - 1}; $s > 0; $s >>= 1) {
         |  long $rx = (($x & $s) > 0) ? 1L : 0L;
         |  long $ry = (($y & $s) > 0) ? 1L : 0L;
         |  $d += $s * $s * ((3L * $rx) ^ $ry);
         |  if ($ry == 0) {
         |    if ($rx == 1) { $x = $s - 1 - $x; $y = $s - 1 - $y; }
         |    long $t = $x; $x = $y; $y = $t;
         |  }
         |}
         |${ev.value} = $d;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Column-API entry points for the spatial expressions. */
object spatial {
  import GraftSqlBridge.{column, expression}

  def hilbert_index(x: Column, y: Column, bits: Int): Column =
    column(HilbertIndex(expression(x), expression(y), bits))
}
