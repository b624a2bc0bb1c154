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

/** 3-D Hilbert-curve index via Skilling's transpose construction
  * ("Programming the Hilbert curve", AIP Conf. Proc. 707, 2004 — the
  * public-textbook d-dimensional generalization of the 2-D walk): the
  * inverse-undo pass de-rotates each level's sub-cube, the Gray-encode
  * pass converts to curve order, and the transposed coordinates
  * interleave MSB-first into one integer key. Every step is integer
  * XOR/AND/shift, so the DuckDB oracle replays the identical trajectory
  * as one CTE per level. Real 100 TB fact tables cluster 3–4 dimensions
  * (date × customer × amount here); the same loops carry verbatim to
  * d = 4+ — only the dimension count in the codegen template changes.
  * Coordinates must already be normalized to `[0, 2^bits)`. */
case class HilbertIndex3(first: Expression, second: Expression,
    third: Expression, bits: Int)
    extends org.apache.spark.sql.catalyst.expressions.TernaryExpression {
  require(bits >= 1 && 3 * bits <= 62, s"bits=$bits: 3·bits must fit a long")

  override def dataType: DataType = LongType
  override def prettyName: String = "hilbert_index3"

  override def nullSafeEval(a: Any, b: Any, c: Any): Any = {
    var x0 = a.asInstanceOf[Long]
    var x1 = b.asInstanceOf[Long]
    var x2 = c.asInstanceOf[Long]
    // inverse undo: Q from 2^(bits-1) down to 2
    var q = 1L << (bits - 1)
    while (q > 1) {
      val p = q - 1
      // i = 0: the exchange branch is a no-op against itself
      if ((x0 & q) != 0) x0 ^= p
      if ((x1 & q) != 0) x0 ^= p
      else { val t = (x0 ^ x1) & p; x0 ^= t; x1 ^= t }
      if ((x2 & q) != 0) x0 ^= p
      else { val t = (x0 ^ x2) & p; x0 ^= t; x2 ^= t }
      q >>= 1
    }
    // Gray encode
    x1 ^= x0
    x2 ^= x1
    var t = 0L
    q = 1L << (bits - 1)
    while (q > 1) {
      if ((x2 & q) != 0) t ^= q - 1
      q >>= 1
    }
    x0 ^= t; x1 ^= t; x2 ^= t
    // transpose → index: MSB-first round-robin interleave
    var h = 0L
    var bit = bits - 1
    while (bit >= 0) {
      h = (h << 1) | ((x0 >> bit) & 1L)
      h = (h << 1) | ((x1 >> bit) & 1L)
      h = (h << 1) | ((x2 >> bit) & 1L)
      bit -= 1
    }
    h
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b, c) => {
      val x0 = ctx.freshName("h3x0"); val x1 = ctx.freshName("h3x1")
      val x2 = ctx.freshName("h3x2"); val q = ctx.freshName("h3q")
      val p = ctx.freshName("h3p"); val t = ctx.freshName("h3t")
      val h = ctx.freshName("h3h"); val bit = ctx.freshName("h3b")
      s"""
         |long $x0 = $a; long $x1 = $b; long $x2 = $c;
         |for (long $q = 1L << ${bits - 1}; $q > 1; $q >>= 1) {
         |  long $p = $q - 1;
         |  if (($x0 & $q) != 0) $x0 ^= $p;
         |  if (($x1 & $q) != 0) $x0 ^= $p;
         |  else { long $t = ($x0 ^ $x1) & $p; $x0 ^= $t; $x1 ^= $t; }
         |  if (($x2 & $q) != 0) $x0 ^= $p;
         |  else { long $t = ($x0 ^ $x2) & $p; $x0 ^= $t; $x2 ^= $t; }
         |}
         |$x1 ^= $x0; $x2 ^= $x1;
         |long $t = 0L;
         |for (long $q = 1L << ${bits - 1}; $q > 1; $q >>= 1)
         |  if (($x2 & $q) != 0) $t ^= $q - 1;
         |$x0 ^= $t; $x1 ^= $t; $x2 ^= $t;
         |long $h = 0L;
         |for (int $bit = ${bits - 1}; $bit >= 0; $bit--) {
         |  $h = ($h << 1) | (($x0 >> $bit) & 1L);
         |  $h = ($h << 1) | (($x1 >> $bit) & 1L);
         |  $h = ($h << 1) | (($x2 >> $bit) & 1L);
         |}
         |${ev.value} = $h;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(f: Expression, s: Expression,
      t: Expression): Expression = copy(first = f, second = s, third = t)
}

/** The Skilling walk at d = 4 — the "same loops, one more dimension"
  * claim of [[HilbertIndex3]] made concrete: only the dimension count in
  * the inverse-undo/Gray/interleave templates changes. Real 4-D fact
  * keys exist (part × supplier × quantity × price on a lineitem table).
  * Coordinates normalized to `[0, 2^bits)`; 4·bits ≤ 62. */
case class HilbertIndex4(first: Expression, second: Expression,
    third: Expression, fourth: Expression, bits: Int)
    extends org.apache.spark.sql.catalyst.expressions.QuaternaryExpression {
  require(bits >= 1 && 4 * bits <= 62, s"bits=$bits: 4·bits must fit a long")

  override def dataType: DataType = LongType
  override def prettyName: String = "hilbert_index4"

  private def walk(a: Long, b: Long, c: Long, d0: Long): Long = {
    val x = Array(a, b, c, d0)
    var q = 1L << (bits - 1)
    while (q > 1) {
      val p = q - 1
      var i = 0
      while (i < 4) {
        if ((x(i) & q) != 0) x(0) ^= p
        else { val t = (x(0) ^ x(i)) & p; x(0) ^= t; x(i) ^= t }
        i += 1
      }
      q >>= 1
    }
    var i = 1
    while (i < 4) { x(i) ^= x(i - 1); i += 1 }
    var t = 0L
    q = 1L << (bits - 1)
    while (q > 1) { if ((x(3) & q) != 0) t ^= q - 1; q >>= 1 }
    i = 0
    while (i < 4) { x(i) ^= t; i += 1 }
    var h = 0L
    var bit = bits - 1
    while (bit >= 0) {
      i = 0
      while (i < 4) { h = (h << 1) | ((x(i) >> bit) & 1L); i += 1 }
      bit -= 1
    }
    h
  }

  override def nullSafeEval(a: Any, b: Any, c: Any, d: Any): Any =
    walk(a.asInstanceOf[Long], b.asInstanceOf[Long],
      c.asInstanceOf[Long], d.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b, c, d) => {
      val x = ctx.freshName("h4x"); val q = ctx.freshName("h4q")
      val p = ctx.freshName("h4p"); val t = ctx.freshName("h4t")
      val h = ctx.freshName("h4h"); val bit = ctx.freshName("h4b")
      val i = ctx.freshName("h4i")
      s"""
         |long[] $x = new long[]{$a, $b, $c, $d};
         |for (long $q = 1L << ${bits - 1}; $q > 1; $q >>= 1) {
         |  long $p = $q - 1;
         |  for (int $i = 0; $i < 4; $i++) {
         |    if (($x[$i] & $q) != 0) $x[0] ^= $p;
         |    else { long $t = ($x[0] ^ $x[$i]) & $p; $x[0] ^= $t; $x[$i] ^= $t; }
         |  }
         |}
         |for (int $i = 1; $i < 4; $i++) $x[$i] ^= $x[$i - 1];
         |long $t = 0L;
         |for (long $q = 1L << ${bits - 1}; $q > 1; $q >>= 1)
         |  if (($x[3] & $q) != 0) $t ^= $q - 1;
         |for (int $i = 0; $i < 4; $i++) $x[$i] ^= $t;
         |long $h = 0L;
         |for (int $bit = ${bits - 1}; $bit >= 0; $bit--)
         |  for (int $i = 0; $i < 4; $i++)
         |    $h = ($h << 1) | (($x[$i] >> $bit) & 1L);
         |${ev.value} = $h;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(f: Expression, s: Expression,
      t: Expression, q: Expression): Expression =
    copy(first = f, second = s, third = t, fourth = q)
}

/** Column-API entry points for the spatial expressions. */
object spatial {
  import GraftSqlBridge.{column, expression}

  def hilbert_index(x: Column, y: Column, bits: Int): Column =
    column(HilbertIndex(expression(x), expression(y), bits))

  def hilbert_index3(x: Column, y: Column, z: Column, bits: Int): Column =
    column(HilbertIndex3(expression(x), expression(y), expression(z), bits))

  def hilbert_index4(x: Column, y: Column, z: Column, w: Column,
      bits: Int): Column =
    column(HilbertIndex4(expression(x), expression(y), expression(z),
      expression(w), bits))
}
