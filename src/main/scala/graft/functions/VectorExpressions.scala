package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Custom Catalyst expressions for the vector operators (SURVEY §3).
  *
  * All three are full codegen expressions (`doGenCode` emits a primitive
  * loop, no boxing) so they stay inside WholeStageCodegen — the reason to
  * drop below the built-in `functions._` layer here is that the built-in
  * path for array math is higher-order functions, which are interpreted.
  */

/** Exact, engine-portable cosine: elements are quantized to
  * `floor(x * 1e6)` 64-bit integers, the dot product and both norms are
  * exact integer sums (order-independent — safe under any partitioning),
  * and only the final `dot / sqrt(na) / sqrt(nb)` runs in IEEE double
  * (correctly-rounded ops → bit-identical on every engine).
  * Inputs: two array<double> of equal length.
  */
case class QuantizedCosine(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "quantized_cosine"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0L; var na = 0L; var nb = 0L; var i = 0
    while (i < n) {
      val xi = math.floor(x.getDouble(i) * 1e6).toLong
      val yi = math.floor(y.getDouble(i) * 1e6).toLong
      dot += xi * yi; na += xi * xi; nb += yi * yi; i += 1
    }
    dot.toDouble / math.sqrt(na.toDouble) / math.sqrt(nb.toDouble)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val dot = ctx.freshName("dot"); val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val xi = ctx.freshName("xi"); val yi = ctx.freshName("yi")
      s"""
         |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |long $dot = 0L; long $na = 0L; long $nb = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  long $xi = (long) java.lang.Math.floor($x.getDouble($i) * 1.0E6);
         |  long $yi = (long) java.lang.Math.floor($y.getDouble($i) * 1.0E6);
         |  $dot += $xi * $yi; $na += $xi * $xi; $nb += $yi * $yi;
         |}
         |${ev.value} = (double) $dot / java.lang.Math.sqrt((double) $na)
         |    / java.lang.Math.sqrt((double) $nb);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Exact squared L2 distance between a raw vector and an ALREADY-QUANTIZED
  * one: the left input is array<double> (quantized on the fly with the same
  * `floor(x * 1e6)` rule as [[QuantizedCosine]]), the right is array<long>
  * of pre-quantized values (e.g. a k-means centroid literal). The sum of
  * squared integer differences is exact and order-independent, so every
  * engine agrees bit-for-bit — the assignment metric for the deterministic
  * k-means operator (VectorOps.kmeansClusters).
  */
case class QuantizedL2Sq(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "quantized_l2sq"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0L; var i = 0
    while (i < n) {
      val d = math.floor(x.getDouble(i) * 1e6).toLong - y.getLong(i)
      acc += d * d; i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val acc = ctx.freshName("acc"); val d = ctx.freshName("d")
      s"""
         |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  long $d = (long) java.lang.Math.floor($x.getDouble($i) * 1.0E6) - $y.getLong($i);
         |  $acc += $d * $d;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** [[QuantizedCosine]] against an ALREADY-QUANTIZED right side: the left
  * input is array<double> (quantized on the fly with the same
  * `floor(x * 1e6)` rule), the right is array<long> of pre-quantized
  * 1e-6-grid values (e.g. an integer IVF centroid). Integer dot/norms,
  * then the identical double division chain — so any engine holding the
  * same integer centroid reproduces the score bit-for-bit, which is
  * what lets the IVF coarse assignment be DuckDB-replayable
  * (ann_ivf_stats' oracle). A double-valued centroid cannot offer this:
  * floor(cent * 1e6) after a decimal→double round-trip is off-by-one at
  * grid boundaries. */
case class QuantizedCosinePreQ(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "quantized_cosine_preq"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0L; var na = 0L; var nb = 0L; var i = 0
    while (i < n) {
      val xi = math.floor(x.getDouble(i) * 1e6).toLong
      val yi = y.getLong(i)
      dot += xi * yi; na += xi * xi; nb += yi * yi; i += 1
    }
    dot.toDouble / math.sqrt(na.toDouble) / math.sqrt(nb.toDouble)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val dot = ctx.freshName("dot"); val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val xi = ctx.freshName("xi"); val yi = ctx.freshName("yi")
      s"""
         |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |long $dot = 0L; long $na = 0L; long $nb = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  long $xi = (long) java.lang.Math.floor($x.getDouble($i) * 1.0E6);
         |  long $yi = $y.getLong($i);
         |  $dot += $xi * $yi; $na += $xi * $xi; $nb += $yi * $yi;
         |}
         |${ev.value} = (double) $dot / java.lang.Math.sqrt((double) $na)
         |    / java.lang.Math.sqrt((double) $nb);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Plain double-accumulation cosine over array<double> — the fast
  * production scoring path (single pass, no quantization). Not used in
  * oracle-compared queries because float summation order is engine-specific.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_similarity"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < n) {
      val xi = x.getDouble(i); val yi = y.getDouble(i)
      dot += xi * yi; na += xi * xi; nb += yi * yi; i += 1
    }
    dot / math.sqrt(na) / math.sqrt(nb)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val dot = ctx.freshName("dot"); val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val xi = ctx.freshName("xi"); val yi = ctx.freshName("yi")
      s"""
         |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xi = $x.getDouble($i); double $yi = $y.getDouble($i);
         |  $dot += $xi * $yi; $na += $xi * $xi; $nb += $yi * $yi;
         |}
         |${ev.value} = $dot / java.lang.Math.sqrt($na) / java.lang.Math.sqrt($nb);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Random-hyperplane (sign-LSH) bucket ids: `numTables` independent tables
  * of `bits` Rademacher (±1) hyperplanes each, drawn deterministically from
  * `seed`. Returns array<long> of length `numTables`; element t encodes
  * `(t << 24) | bucketBits` so every table's bucket lives in a disjoint key
  * space and one `explode` fans a row into all of its tables.
  *
  * This is the scale path for near-dup and ANN candidate generation: the
  * bucket id becomes the shuffle key, so candidate pairing is a hash
  * self-join bounded by bucket size instead of an O(n²) cross join.
  *
  * Engine-replayable by construction (r13): plane component (p, i) is the
  * TOP BIT of md5("lsh:seed:p:i") — any engine with md5 rebuilds the same
  * ±1 matrix — and the projection is an exact INTEGER dot over the 1e-6
  * quantized vector (`floor(x·1e6)`, the QuantizedCosine grid), so bucket
  * ids are bit-identical everywhere. A float dot (the previous spelling)
  * flips signs at summation-order boundaries in another engine; a JVM
  * `Random(seed)` plane matrix cannot be rebuilt outside the JVM at all.
  * This is what converts `ann_lsh_topk` from rows-only to a hash-checked
  * DuckDB oracle.
  */
case class LshSignBuckets(child: Expression, numTables: Int, bits: Int,
    dim: Int, seed: Long)
    extends UnaryExpression {

  // bucket ids pack (table << 24) | bucket: more than 24 hyperplane bits
  // would silently collide buckets ACROSS tables (wrong candidate pairs)
  require(bits > 0 && bits <= 24, s"bits must be in [1,24], got $bits")
  require(numTables > 0 && numTables <= (1 << 24),
    s"numTables must be in [1,2^24], got $numTables")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "lsh_sign_buckets"

  /** ±1 plane matrix, shape [numTables * bits][dim]: component (p, i) =
    * top bit of md5("lsh:seed:p:i") — the engine-portable derivation. */
  @transient lazy val planes: Array[Array[Byte]] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    Array.tabulate(numTables * bits) { p =>
      Array.tabulate(dim) { i =>
        md.reset()
        val h = md.digest(s"lsh:$seed:$p:$i".getBytes("UTF-8"))
        if ((h(0) & 0x80) != 0) 1.toByte else -1.toByte
      }
    }
  }

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = math.min(dim, x.numElements())
    val out = new Array[Long](numTables)
    var t = 0
    while (t < numTables) {
      var bucket = 0L; var b = 0
      while (b < bits) {
        val plane = planes(t * bits + b)
        var dot = 0L; var i = 0
        while (i < n) {
          dot += plane(i) * math.floor(x.getDouble(i) * 1e6).toLong; i += 1
        }
        if (dot >= 0) bucket |= (1L << b)
        b += 1
      }
      out(t) = (t.toLong << 24) | bucket
      t += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val planesRef = ctx.addReferenceObj("planes", planes, "byte[][]")
    nullSafeCodeGen(ctx, ev, x => {
      val n = ctx.freshName("n"); val out = ctx.freshName("out")
      val t = ctx.freshName("t"); val b = ctx.freshName("b")
      val i = ctx.freshName("i"); val dot = ctx.freshName("dot")
      val bucket = ctx.freshName("bucket"); val plane = ctx.freshName("plane")
      s"""
         |int $n = java.lang.Math.min($dim, $x.numElements());
         |long[] $out = new long[$numTables];
         |for (int $t = 0; $t < $numTables; $t++) {
         |  long $bucket = 0L;
         |  for (int $b = 0; $b < $bits; $b++) {
         |    byte[] $plane = $planesRef[$t * $bits + $b];
         |    long $dot = 0L;
         |    for (int $i = 0; $i < $n; $i++) {
         |      $dot += $plane[$i] * (long) java.lang.Math.floor($x.getDouble($i) * 1.0E6);
         |    }
         |    if ($dot >= 0) $bucket |= (1L << $b);
         |  }
         |  $out[$t] = (((long) $t) << 24) | $bucket;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Product-quantization encoder: for each of `m` equal subspaces of the
  * input vector, the argmin codeword (exact integer squared-L2 over
  * `floor(x*1e6)` quantized values, ties to the lower code). `right` is
  * the flat pre-quantized codebook laid out [sub][code][dim] — a literal
  * by construction (m × ks × subDim longs), so the whole argmin loop runs
  * inside WholeStageCodegen; a `least(struct…)` formulation re-inlines the
  * distance per codeword and breaks down past ~16 codes. Output:
  * array<int> of `m` codes — the 8-byte corpus representation PQ scanning
  * is about (Jégou et al., TPAMI 2011).
  */
case class PqEncode(left: Expression, right: Expression, m: Int, ks: Int)
    extends BinaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "pq_encode"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val books = b.asInstanceOf[ArrayData]
    val subDim = x.numElements() / m
    val codes = new Array[Int](m)
    var s = 0
    while (s < m) {
      var best = 0L; var bestC = -1; var c = 0
      while (c < ks) {
        var acc = 0L; var i = 0
        while (i < subDim) {
          val d = math.floor(x.getDouble(s * subDim + i) * 1e6).toLong -
            books.getLong((s * ks + c) * subDim + i)
          acc += d * d; i += 1
        }
        if (bestC < 0 || acc < best) { best = acc; bestC = c }
        c += 1
      }
      codes(s) = bestC; s += 1
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(codes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, b) => {
      val subDim = ctx.freshName("subDim"); val codes = ctx.freshName("codes")
      val s = ctx.freshName("s"); val c = ctx.freshName("c")
      val i = ctx.freshName("i"); val acc = ctx.freshName("acc")
      val d = ctx.freshName("d"); val best = ctx.freshName("best")
      val bestC = ctx.freshName("bestC")
      s"""
         |int $subDim = $x.numElements() / $m;
         |int[] $codes = new int[$m];
         |for (int $s = 0; $s < $m; $s++) {
         |  long $best = 0L; int $bestC = -1;
         |  for (int $c = 0; $c < $ks; $c++) {
         |    long $acc = 0L;
         |    for (int $i = 0; $i < $subDim; $i++) {
         |      long $d = (long) java.lang.Math.floor(
         |          $x.getDouble($s * $subDim + $i) * 1.0E6)
         |        - $b.getLong(($s * $ks + $c) * $subDim + $i);
         |      $acc += $d * $d;
         |    }
         |    if ($bestC < 0 || $acc < $best) { $best = $acc; $bestC = $c; }
         |  }
         |  $codes[$s] = $bestC;
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData($codes);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** PQ asymmetric-distance score: Σ_s tbl[s·ks + codes[s]] — the lookup-sum
  * that replaces a full dot product when scanning a PQ-compressed corpus
  * against one query's precomputed distance table. Pure integer adds,
  * codegen'd: the hot inner loop of a billion-vector ADC scan must not
  * interpret a lambda per element.
  */
case class PqAdcScore(left: Expression, right: Expression, ks: Int)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "pq_adc_score"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val codes = a.asInstanceOf[ArrayData]
    val tbl = b.asInstanceOf[ArrayData]
    var acc = 0L; var s = 0
    val n = codes.numElements()
    while (s < n) { acc += tbl.getLong(s * ks + codes.getInt(s)); s += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val s = ctx.freshName("s")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = $a.numElements();
         |long $acc = 0L;
         |for (int $s = 0; $s < $n; $s++) {
         |  $acc += $b.getLong($s * $ks + $a.getInt($s));
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Exact integer dot product of an array<long> column against a LITERAL
  * axis (the trained PCA direction): one primitive codegen loop, no
  * interpreted zip_with/aggregate lambdas on the per-row hot path — the
  * expressions-not-lambdas rule applied to the C64/B56 projection. */
case class DotWithLit(child: Expression, weights: Seq[Long])
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "dot_with_lit"

  @transient private lazy val w: Array[Long] = weights.toArray

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    // A dimension-mismatched embedding must fail fast, not silently project
    // onto a truncated axis (r6 ADVICE; matches GramMatrix's d contract).
    if (a.numElements() != w.length)
      throw new IllegalArgumentException(
        s"dot_with_lit: dimension mismatch: ${a.numElements()} vs ${w.length}")
    var s = 0L
    var i = 0
    while (i < w.length) { s += a.getLong(i) * w(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val wRef = ctx.addReferenceObj("dotWeights", w, "long[]")
    nullSafeCodeGen(ctx, ev, x => {
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |if ($x.numElements() != $wRef.length) {
         |  throw new IllegalArgumentException("dot_with_lit: dimension mismatch: "
         |    + $x.numElements() + " vs " + $wRef.length);
         |}
         |long $s = 0L;
         |for (int $i = 0; $i < $wRef.length; $i++) {
         |  $s += $x.getLong($i) * $wRef[$i];
         |}
         |${ev.value} = $s;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Dense d×d Gram-matrix accumulator: one Array[Long] per partition,
  * elementwise-merged — the exact-integer Σ qqᵀ a distributed PCA needs.
  * Input rows are pre-quantized array<long> (the quantization rule stays
  * visible in the calling plan); every accumulation is exact 64-bit
  * integer arithmetic, so the result is ORDER-FREE — identical under any
  * partitioning, which is what lets the downstream power iteration be
  * replayed bit-exactly by another engine. Buffer is d²×8 bytes (32 KiB
  * at d=64) regardless of row count. */
final class GramBuffer(val d: Int) {
  val g = new Array[Long](d * d)
}

case class GramMatrix(child: Expression, d: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends org.apache.spark.sql.catalyst.expressions.aggregate
      .TypedImperativeAggregate[GramBuffer] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "gram_matrix"

  override def createAggregationBuffer(): GramBuffer = new GramBuffer(d)

  // All accumulation is CHECKED 64-bit arithmetic (r6 ADVICE): the docstring
  // promises "exact / order-free", so past ~9e12 rows of the 1e-3-quantized
  // grid a silent wrap would diverge from the HUGEINT oracle — fail loudly
  // instead (the caller's answer at that scale is a coarser quantum).
  override def update(buf: GramBuffer, input: InternalRow): GramBuffer = {
    val a = child.eval(input)
    if (a != null) {
      val q = a.asInstanceOf[ArrayData]
      if (q.numElements() != d)
        throw new IllegalArgumentException(
          s"gram_matrix: dimension mismatch: ${q.numElements()} vs $d")
      var i = 0
      while (i < d) {
        val qi = q.getLong(i)
        if (qi != 0L) {
          var j = 0
          while (j < d) {
            buf.g(i * d + j) =
              Math.addExact(buf.g(i * d + j), Math.multiplyExact(qi, q.getLong(j)))
            j += 1
          }
        }
        i += 1
      }
    }
    buf
  }

  override def merge(buf: GramBuffer, other: GramBuffer): GramBuffer = {
    var i = 0
    while (i < buf.g.length) {
      buf.g(i) = Math.addExact(buf.g(i), other.g(i)); i += 1
    }
    buf
  }

  override def eval(buf: GramBuffer): Any =
    new GenericArrayData(buf.g.map(x => x: Any))

  override def serialize(buf: GramBuffer): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buf.g.length * 8)
    buf.g.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): GramBuffer = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val buf = new GramBuffer(d)
    var i = 0
    while (i < buf.g.length) { buf.g(i) = bb.getLong; i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): GramMatrix =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): GramMatrix =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): Expression = copy(child = c(0))
}

/** Column-facing constructors. */
object vectors {
  import GraftSqlBridge.{column, expression}

  def quantized_cosine(a: Column, b: Column): Column =
    column(QuantizedCosine(expression(a), expression(b)))

  def quantized_cosine_preq(a: Column, b: Column): Column =
    column(QuantizedCosinePreQ(expression(a), expression(b)))

  def cosine_similarity(a: Column, b: Column): Column =
    column(CosineSimilarity(expression(a), expression(b)))

  def quantized_l2sq(v: Column, q: Column): Column =
    column(QuantizedL2Sq(expression(v), expression(q)))

  def lsh_sign_buckets(v: Column, numTables: Int, bits: Int, dim: Int,
      seed: Long = 42L): Column =
    column(LshSignBuckets(expression(v), numTables, bits, dim, seed))

  def pq_encode(v: Column, books: Column, m: Int, ks: Int): Column =
    column(PqEncode(expression(v), expression(books), m, ks))

  def pq_adc_score(codes: Column, tbl: Column, ks: Int): Column =
    column(PqAdcScore(expression(codes), expression(tbl), ks))

  def gram_matrix(q: Column, d: Int): Column =
    column(GramMatrix(expression(q), d).toAggregateExpression())

  def dot_with_lit(q: Column, weights: Seq[Long]): Column =
    column(DotWithLit(expression(q), weights))
}
