package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Text-sketch expressions. These are row-granular (one call per document),
  * so CodegenFallback costs one virtual call per ROW while doing all
  * per-element work (tokens × hashes) in tight JVM loops — versus the
  * built-in higher-order-function chain which interprets every element
  * lambda. At 5k docs this is a ~10× win; at 100 TB the same ratio holds
  * because the inner loops are the work.
  */

/** Distinct word n-gram shingles of a text column (set semantics — element
  * order is unspecified and irrelevant downstream). */
case class WordShingles(child: Expression, n: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_shingles"

  override def nullSafeEval(input: Any): Any =
    SketchKernels.shingles(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x =>
      s"${ev.value} = graft.functions.SketchKernels$$.MODULE$$.shingles($x, $n);")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}


/** Static kernels shared by interpreted eval and generated code. The
  * expressions below emit a single static call from `doGenCode`, so the
  * surrounding stage keeps WholeStageCodegen fusion while the per-row work
  * stays in these tight JVM loops. */
object SketchKernels {

  def shingles(text: UTF8String, n: Int): GenericArrayData = {
    val toks = text.toString.trim.split("\\s+")
    if (toks.length < n) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[String]((toks.length - n + 1) * 2)
    var i = 0
    while (i <= toks.length - n) {
      val sb = new java.lang.StringBuilder(32)
      var k = 0
      while (k < n) { if (k > 0) sb.append(' '); sb.append(toks(i + k)); k += 1 }
      seen.add(sb.toString); i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator(); var j = 0
    while (it.hasNext) { out(j) = UTF8String.fromString(it.next()); j += 1 }
    new GenericArrayData(out)
  }

  /** One tokens pass: word counts + 2-gram occurrence counts (HashMap) with
    * the running top count — O(tokens) time, O(distinct grams) space. */
  def repetitionStats(text: UTF8String)
      : org.apache.spark.sql.catalyst.expressions.GenericInternalRow = {
    val toks = text.toString.trim.split("\\s+")
    val nW = toks.length
    val words = new java.util.HashSet[String](nW * 2)
    var i = 0
    while (i < nW) { words.add(toks(i)); i += 1 }
    val grams = new java.util.HashMap[String, Integer]((nW max 1) * 2)
    var top = 0
    i = 0
    while (i < nW - 1) {
      val g = toks(i) + " " + toks(i + 1)
      val c = grams.merge(g, Integer.valueOf(1),
        (a: Integer, b: Integer) => Integer.valueOf(a.intValue + b.intValue))
      if (c.intValue > top) top = c.intValue
      i += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](nW, words.size, math.max(nW - 1, 0), grams.size, top))
  }

  def minhash(arr: ArrayData, k: Int): GenericArrayData = {
    val sig = Array.fill(k)(Long.MaxValue)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      val fp = SketchHash.fingerprint56(arr.getUTF8String(i))
      var j = 0
      while (j < k) {
        val v = SketchHash.affineM61(fp, j)
        if (v < sig(j)) sig(j) = v
        j += 1
      }
      i += 1
    }
    new GenericArrayData(sig)
  }

  def simhash(arr: ArrayData): Long = {
    val counts = new Array[Int](64)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      val h = SketchHash.fingerprint64(arr.getUTF8String(i))
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
        b += 1
      }
      i += 1
    }
    var fp = 0L; var b = 0
    while (b < 64) { if (counts(b) > 0) fp |= (1L << b); b += 1 }
    fp
  }
}

object TextKernels {

  /** One greedy left-to-right pass: O(tokens) time, one HashSet probe per
    * adjacency. Shared by interpreted eval and generated code. */
  def greedyMerge(arr: org.apache.spark.sql.catalyst.util.ArrayData,
      phrases: java.util.HashSet[String]): GenericArrayData = {
    val n = arr.numElements()
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    val out = new java.util.ArrayList[AnyRef](n)
    var pend = arr.getUTF8String(0).toString
    var i = 1
    while (i < n) {
      val t = arr.getUTF8String(i).toString
      val cand = pend + "_" + t
      if (phrases.contains(cand)) pend = cand
      else { out.add(UTF8String.fromString(pend)); pend = t }
      i += 1
    }
    out.add(UTF8String.fromString(pend))
    new GenericArrayData(out.toArray(new Array[AnyRef](out.size)))
  }

  /** Quantized character-entropy ingredients in ONE pass over the text's
    * code points. Returns (n_chars, distinct_chars, hq) where
    * `hq = floor(n·ln n·1e6) − Σ_c floor(cnt_c·ln cnt_c·1e6)` — entropy in
    * exact integer micro-nats, so `H = hq/1e6/n` is a single IEEE division
    * chain both engines reproduce bit-identically (the LM discipline: no
    * raw libm result ever reaches the output unquantized). */
  def charEntropyStats(text: UTF8String)
      : org.apache.spark.sql.catalyst.expressions.GenericInternalRow = {
    val str = text.toString
    val counts = new java.util.HashMap[Integer, java.lang.Long](64)
    var i = 0
    var n = 0L
    while (i < str.length) {
      val cp = str.codePointAt(i)
      i += Character.charCount(cp)
      n += 1
      counts.merge(Integer.valueOf(cp), java.lang.Long.valueOf(1L),
        (a: java.lang.Long, b: java.lang.Long) =>
          java.lang.Long.valueOf(a.longValue + b.longValue))
    }
    var sq = 0L
    val it = counts.values.iterator
    while (it.hasNext) {
      val c = it.next().longValue
      sq += math.floor(c.toDouble * math.log(c.toDouble) * 1e6).toLong
    }
    val hq =
      if (n == 0L) 0L
      else math.floor(n.toDouble * math.log(n.toDouble) * 1e6).toLong - sq
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](n, counts.size, hq))
  }

  /** One-pass Kneser–Ney bigram scoring over a token array: vocab
    * projection, the four table lookups, and the micro-nat floor terms all
    * happen row-locally — the hoisted-kernel replacement for the
    * interpreted `aggregate(sequence(...))` HOF spelling (the
    * expressions-not-lambdas rule; measured ~4× on the streaming drain).
    * Arithmetic mirrors the SQL term op-for-op (same IEEE association), so
    * the result is bit-identical to the join spelling and the oracle.
    * Returns (n_pairs, sq); n_pairs = 0 marks docs too short to score. */
  def knScore(arr: org.apache.spark.sql.catalyst.util.ArrayData,
      vocab: java.util.HashSet[String],
      bg: java.util.HashMap[String, java.lang.Long],
      ca: java.util.HashMap[String, java.lang.Long],
      n1f: java.util.HashMap[String, java.lang.Long],
      n1p: java.util.HashMap[String, java.lang.Long],
      dTypes: Double, d: Double, q: Double)
      : org.apache.spark.sql.catalyst.expressions.GenericInternalRow = {
    val n = arr.numElements()
    if (n < 2)
      return new org.apache.spark.sql.catalyst.expressions
        .GenericInternalRow(Array[Any](0L, 0L))
    val toks = new Array[String](n)
    var i = 0
    while (i < n) {
      val t = arr.getUTF8String(i).toString
      toks(i) = if (vocab.contains(t)) t else "<unk>"
      i += 1
    }
    val caU = ca.get("<unk>"); val n1fU = n1f.get("<unk>")
    val n1pU = n1p.get("<unk>")
    var sq = 0L
    i = 0
    while (i < n - 1) {
      val a = toks(i); val b = toks(i + 1)
      val bgc = bg.get(a + " " + b)
      val bgd = if (bgc == null) 0.0 else bgc.longValue.toDouble
      val n1fv = { val x = n1f.get(a); if (x == null) n1fU else x }
      val n1pv = { val x = n1p.get(b); if (x == null) n1pU else x }
      val cav = { val x = ca.get(a); if (x == null) caU else x }
      val p = (math.max(bgd - d, 0.0) +
        d * n1fv.longValue.toDouble * (n1pv.longValue.toDouble / dTypes)) /
        cav.longValue.toDouble
      sq += math.floor(-math.log(p) * q).toLong
      i += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any]((n - 1).toLong, sq))
  }

  /** First-fit-decreasing bin packing of one shard's documents. Input is
    * the shard's docs as (negLen, docId) structs ALREADY sorted ascending
    * (negLen asc = length desc, docId asc tiebreak — the caller's
    * sort_array). Walk order is the FFD order; each doc lands in the
    * FIRST bin whose used mass + len fits the budget, else opens a new
    * bin (a doc longer than the budget gets its own bin whole — FFD
    * never splits). Returns (doc_id, n_tokens, bin, bin_off) per doc;
    * bins are 1-based in creation order, bin_off = used mass before
    * placement. O(docs × bins) time, O(bins) state — per-shard work is
    * bounded by shard sizing (the C26 contract: shard granularity is the
    * parallelism/memory knob). */
  /** The first-fit placement step — ONE spelling shared by the batch
    * kernel ([[ffdPack]]) and the B60 streaming admission
    * ([[graft.streaming.StreamOps.streamPackBestfit]]), so the live
    * operator cannot fork the greedy it must replay. Mutates `loads`;
    * returns (1-based bin, offset before placement). */
  def ffdPlace(loads: scala.collection.mutable.ArrayBuffer[Long], len: Long,
      budget: Long): (Int, Long) = {
    var b = 0
    var placed = -1
    while (placed < 0 && b < loads.length) {
      if (loads(b) + len <= budget) placed = b
      b += 1
    }
    if (placed >= 0) { val o = loads(placed); loads(placed) += len; (placed + 1, o) }
    else { loads += len; (loads.length, 0L) }
  }

  def ffdPack(arr: org.apache.spark.sql.catalyst.util.ArrayData,
      budget: Long): GenericArrayData = {
    val n = arr.numElements()
    val loads = new scala.collection.mutable.ArrayBuffer[Long](16)
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      val row = arr.getStruct(i, 2)
      val len = -row.getLong(0)
      val id = row.getLong(1)
      val (bin, off) = ffdPlace(loads, len, budget)
      out(i) = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](id, len, bin, off))
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Viterbi best segmentation of ONE word under a unigram-LM piece
    * vocabulary (Kudo 2018's inference step, integer-cost form): pieces
    * carry micro-nat-quantized costs, unknown SINGLE characters fall back
    * to `unkCost` (so the DP is total — no infinities anywhere), and the
    * lattice is walked positions 1..n with arcs (j → i) for piece lengths
    * 1..maxLen. Tie rule, mirrored by the SQL twin's
    * first-minimum-in-j-ascending-order: at equal cost the SMALLEST j
    * (longest final piece) wins — the forward pass iterates j ascending
    * with a strict `<`, so the kept argmin IS the first j achieving the
    * final minimum. Appends the word's pieces to `out`. O(n·maxLen). */
  def uniSegmentWord(word: String, costs: java.util.HashMap[String, java.lang.Long],
      maxLen: Int, unkCost: Long, out: java.util.ArrayList[AnyRef]): Unit = {
    val n = word.length
    if (n == 0) return
    val best = new Array[Long](n + 1)
    val back = new Array[Int](n + 1)
    var i = 1
    while (i <= n) {
      var bi = Long.MaxValue
      var bj = -1
      var j = math.max(0, i - maxLen)
      while (j < i) {
        val c: java.lang.Long =
          if (i - j == 1) {
            val x = costs.get(word.substring(j, i))
            if (x == null) java.lang.Long.valueOf(unkCost) else x
          } else costs.get(word.substring(j, i))
        if (c != null) {
          val v = best(j) + c.longValue
          if (v < bi) { bi = v; bj = j }
        }
        j += 1
      }
      best(i) = bi
      back(i) = bj
      i += 1
    }
    // backtrace: collect split points, then emit pieces left-to-right
    val cuts = new java.util.ArrayList[Integer](8)
    var p = n
    while (p > 0) { cuts.add(Integer.valueOf(p)); p = back(p) }
    var k = cuts.size - 1
    var start = 0
    while (k >= 0) {
      val end = cuts.get(k).intValue
      out.add(UTF8String.fromString(word.substring(start, end)))
      start = end
      k -= 1
    }
  }

  /** Per-document unigram segmentation: every token of the array segments
    * through [[uniSegmentWord]] and the pieces concatenate in token order
    * — ONE kernel call per document (the greedy_phrase_merge discipline:
    * a codegen'd kernel, not an interpreted per-token HOF lambda). */
  def uniSegmentAll(arr: org.apache.spark.sql.catalyst.util.ArrayData,
      costs: java.util.HashMap[String, java.lang.Long], maxLen: Int,
      unkCost: Long): GenericArrayData = {
    val n = arr.numElements()
    val out = new java.util.ArrayList[AnyRef](n * 2)
    var i = 0
    while (i < n) {
      uniSegmentWord(arr.getUTF8String(i).toString, costs, maxLen, unkCost, out)
      i += 1
    }
    new GenericArrayData(out.toArray(new Array[AnyRef](out.size)))
  }

  /** Greedy longest-match-first (WordPiece) segmentation of one word:
    * at each position take the LONGEST vocabulary piece matching the
    * remaining prefix (continuation positions probe the `##`-prefixed
    * spelling); if any position matches nothing, the WHOLE word becomes
    * `[UNK]` — BERT's fail-to-unk rule, not a partial emit. */
  def wpSegmentWord(word: String, vocab: java.util.HashSet[String],
      out: java.util.ArrayList[AnyRef]): Unit = {
    val n = word.length
    if (n == 0) return
    // high-water mark instead of a per-word staging list: on a positional
    // miss, truncate this word's pieces and emit [UNK] — no per-token
    // allocation in the kernel hot path (the uniSegmentAll discipline)
    val mark = out.size
    var p = 0
    while (p < n) {
      var l = n - p
      var found = -1
      while (l >= 1 && found < 0) {
        val cand =
          if (p == 0) word.substring(0, l) else "##" + word.substring(p, p + l)
        if (vocab.contains(cand)) found = l else l -= 1
      }
      if (found < 0) {
        while (out.size > mark) out.remove(out.size - 1)
        out.add(UTF8String.fromString("[UNK]"))
        p = n
      } else {
        out.add(UTF8String.fromString(
          if (p == 0) word.substring(0, found)
          else "##" + word.substring(p, p + found)))
        p += found
      }
    }
  }

  /** Per-document WordPiece segmentation: every token of the array
    * segments through [[wpSegmentWord]], pieces concatenated in token
    * order — ONE codegen'd kernel call per document (the uniSegmentAll
    * discipline). */
  def wpSegmentAll(arr: org.apache.spark.sql.catalyst.util.ArrayData,
      vocab: java.util.HashSet[String]): GenericArrayData = {
    val n = arr.numElements()
    val out = new java.util.ArrayList[AnyRef](n * 2)
    var i = 0
    while (i < n) {
      wpSegmentWord(arr.getUTF8String(i).toString, vocab, out)
      i += 1
    }
    new GenericArrayData(out.toArray(new Array[AnyRef](out.size)))
  }

  /** Stopword membership count over a token array: one HashSet probe per
    * token. The HOF spelling (`size(filter(toks, _.isin(...)))`) evaluates
    * an interpreted per-token lambda — and, being CodegenFallback, re-runs
    * its whole subtree (including the tokenizing `split`) per referencing
    * column since interpreted eval gets no subexpression elimination. */
  def stopwordCount(arr: org.apache.spark.sql.catalyst.util.ArrayData,
      stops: java.util.HashSet[String]): Int = {
    val n = arr.numElements()
    var c = 0
    var i = 0
    while (i < n) {
      if (stops.contains(arr.getUTF8String(i).toString)) c += 1
      i += 1
    }
    c
  }

  private val deflater = new ThreadLocal[java.util.zip.Deflater] {
    override def initialValue(): java.util.zip.Deflater =
      new java.util.zip.Deflater(6)
  }

  /** Deflate-compressed size / raw size — the redundancy signal CCNet-style
    * quality filters use (boilerplate and repetition compress far below
    * natural text). Deterministic: fixed level, no dictionary. */
  def compressRatio(s: UTF8String): Double = {
    val raw = s.getBytes
    if (raw.isEmpty) return 1.0
    val d = deflater.get(); d.reset()
    d.setInput(raw); d.finish()
    val buf = new Array[Byte](256)
    var out = 0L
    while (!d.finished()) out += d.deflate(buf)
    out.toDouble / raw.length
  }

  private val CombiningMarks = java.util.regex.Pattern.compile("\\p{M}+")

  /** NFKD decompose → strip combining marks → ROOT lowercase (see
    * [[graft.functions.NfkdFold]]). ASCII fast path: NFKD is identity
    * on ASCII and most corpus text is, so skip the Normalizer walk. */
  def nfkdFold(s: UTF8String): UTF8String = {
    val str = s.toString
    var ascii = true
    var i = 0
    while (ascii && i < str.length) { if (str.charAt(i) >= 0x80) ascii = false; i += 1 }
    if (ascii) return UTF8String.fromString(
      str.toLowerCase(java.util.Locale.ROOT))
    val d = java.text.Normalizer.normalize(str,
      java.text.Normalizer.Form.NFKD)
    UTF8String.fromString(CombiningMarks.matcher(d).replaceAll("")
      .toLowerCase(java.util.Locale.ROOT))
  }
}

/** Deflate compression ratio of a text column (see TextKernels). */
case class CompressRatio(child: Expression) extends UnaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.DoubleType
  override def prettyName: String = "compress_ratio"

  override def nullSafeEval(input: Any): Any =
    TextKernels.compressRatio(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x =>
      s"${ev.value} = graft.functions.TextKernels$$.MODULE$$.compressRatio($x);")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Unicode fold for normalization-aware dedup (C86's deploy knob, r11
  * next-round #5): NFKD compatibility decomposition (width variants and
  * ligatures collapse: Ａ→A, ﬁ→fi), strip combining marks (diacritics:
  * é→e), lowercase in the ROOT locale (no Turkish-i surprises). JDK-only
  * (`java.text.Normalizer`). The ASCII normal form stays the ORACLE
  * spelling — DuckDB's lower/regexp have no NFKD, so this fold is
  * spec-gated, composed in FRONT of the shared ASCII pipeline by
  * `TextOps.normFormOf(unicode = true)`.
  */
case class NfkdFold(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "nfkd_fold"

  override def nullSafeEval(input: Any): Any =
    TextKernels.nfkdFold(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x =>
      s"${ev.value} = graft.functions.TextKernels$$.MODULE$$.nfkdFold($x);")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Kneser–Ney bigram scorer over a token array (see TextKernels.knScore):
  * the bounded KN tables ride the generated class as reference objects (the
  * GreedyPhraseMerge discipline — sound below CorpusOps.KnLiteralMax; the
  * production-K path is the broadcast-join spelling). */
case class KnScoreStats(child: Expression, vocab: Seq[String],
    bg: Map[String, Long], ca: Map[String, Long], n1f: Map[String, Long],
    n1p: Map[String, Long], dTypes: Long, discount: Double, quantum: Double)
    extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("n_pairs", LongType, nullable = false),
    StructField("sq", LongType, nullable = false)))
  override def prettyName: String = "kn_score_stats"

  @transient private lazy val vocabSet: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String](vocab.size * 2)
    vocab.foreach(s.add)
    s
  }
  private def jmap(m: Map[String, Long])
      : java.util.HashMap[String, java.lang.Long] = {
    val j = new java.util.HashMap[String, java.lang.Long](m.size * 2)
    m.foreach { case (k, v) => j.put(k, java.lang.Long.valueOf(v)) }
    j
  }
  @transient private lazy val bgJ = jmap(bg)
  @transient private lazy val caJ = jmap(ca)
  @transient private lazy val n1fJ = jmap(n1f)
  @transient private lazy val n1pJ = jmap(n1p)

  override def nullSafeEval(input: Any): Any =
    TextKernels.knScore(
      input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      vocabSet, bgJ, caJ, n1fJ, n1pJ, dTypes.toDouble, discount, quantum)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val vRef = ctx.addReferenceObj("knVocab", vocabSet, "java.util.HashSet")
    val bgRef = ctx.addReferenceObj("knBg", bgJ, "java.util.HashMap")
    val caRef = ctx.addReferenceObj("knCa", caJ, "java.util.HashMap")
    val n1fRef = ctx.addReferenceObj("knN1f", n1fJ, "java.util.HashMap")
    val n1pRef = ctx.addReferenceObj("knN1p", n1pJ, "java.util.HashMap")
    nullSafeCodeGen(ctx, ev, x =>
      s"${ev.value} = graft.functions.TextKernels$$.MODULE$$.knScore($x, " +
        s"$vRef, $bgRef, $caRef, $n1fRef, $n1pRef, " +
        s"${dTypes.toDouble}, $discount, $quantum);")
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Character-level Shannon-entropy ingredients of a text column (see
  * TextKernels.charEntropyStats): one codegen'd pass, integer micro-nat
  * output — the gibberish/boilerplate signal CCNet-style quality filters
  * pair with the compression ratio. */
case class CharEntropyStats(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("n_chars", LongType, nullable = false),
    StructField("distinct_chars", IntegerType, nullable = false),
    StructField("hq", LongType, nullable = false)))
  override def prettyName: String = "char_entropy_stats"

  override def nullSafeEval(input: Any): Any =
    TextKernels.charEntropyStats(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x =>
      s"${ev.value} = graft.functions.TextKernels$$.MODULE$$.charEntropyStats($x);")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Greedy left-to-right phrase merging over a token array: an adjacent
  * pair joins into `a_b` whenever the joined form is in the phrase set.
  * The walk IS `CorpusOps.phraseMergeOn`'s fold semantics (a merged token
  * chain-merges only when the chained form itself is in the vocabulary —
  * which single-round mining can't produce, and multi-round mining
  * deliberately does); hoisting it from an interpreted `aggregate` HOF
  * into one codegen'd kernel call removes a per-token lambda dispatch
  * (measured ~2.5 s → sub-second on the sf0.1 corpus). The phrase set is
  * a constructor parameter (bounded driver vocab), attached to the
  * generated class as a reference object.
  */
case class GreedyPhraseMerge(child: Expression, phrases: Seq[String])
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "greedy_phrase_merge"

  @transient private lazy val set: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String](phrases.size * 2)
    phrases.foreach(s.add)
    s
  }

  override def nullSafeEval(input: Any): Any =
    TextKernels.greedyMerge(
      input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], set)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val setRef = ctx.addReferenceObj("phraseSet", set, "java.util.HashSet")
    nullSafeCodeGen(ctx, ev, x =>
      s"${ev.value} = graft.functions.TextKernels$$.MODULE$$.greedyMerge($x, $setRef);")
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Unigram-LM (SentencePiece-style) Viterbi segmentation of a token-array
  * column (see TextKernels.uniSegmentAll): each token segments into the
  * min-cost piece sequence under a BOUNDED quantized-cost vocabulary
  * (driver literal, attached as a reference object), pieces concatenated
  * in token order — one codegen'd kernel call per document, zero joins,
  * zero shuffles. Unknown single characters cost `unkCost`, so the
  * expression is total over any input. */
case class UnigramSegmentAll(child: Expression, vocab: Seq[(String, Long)],
    maxLen: Int, unkCost: Long) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "unigram_segment_all"

  @transient private lazy val costs
      : java.util.HashMap[String, java.lang.Long] = {
    val m = new java.util.HashMap[String, java.lang.Long](vocab.size * 2)
    vocab.foreach { case (p, c) => m.put(p, java.lang.Long.valueOf(c)) }
    m
  }

  override def nullSafeEval(input: Any): Any =
    TextKernels.uniSegmentAll(
      input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      costs, maxLen, unkCost)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mapRef = ctx.addReferenceObj("uniCosts", costs, "java.util.HashMap")
    nullSafeCodeGen(ctx, ev, x =>
      s"${ev.value} = graft.functions.TextKernels$$.MODULE$$" +
        s".uniSegmentAll($x, $mapRef, $maxLen, ${unkCost}L);")
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** WordPiece greedy longest-match segmentation of a token-array column
  * (see TextKernels.wpSegmentAll): each token segments left-to-right into
  * the longest vocabulary pieces (`##` continuations), failing whole-word
  * to `[UNK]` — one codegen'd kernel call per document, the vocabulary a
  * bounded driver literal attached as a reference object. */
case class WordpieceSegmentAll(child: Expression, vocab: Seq[String])
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "wordpiece_segment_all"

  @transient private lazy val set: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String](vocab.size * 2)
    vocab.foreach(s.add)
    s
  }

  override def nullSafeEval(input: Any): Any =
    TextKernels.wpSegmentAll(
      input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], set)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val setRef = ctx.addReferenceObj("wpVocab", set, "java.util.HashSet")
    nullSafeCodeGen(ctx, ev, x =>
      s"${ev.value} = graft.functions.TextKernels$$.MODULE$$.wpSegmentAll($x, $setRef);")
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Stopword count of a token-array column (see TextKernels.stopwordCount):
  * the codegen'd kernel behind `TextAnalysis.stopwordCount`, feeding the
  * C9 quality score and the C15/B24/B52/C59 gate chain. The stopword set
  * is a constructor parameter (a tiny driver literal), attached to the
  * generated class as a reference object. */
case class StopwordCount(child: Expression, stopwords: Seq[String])
    extends UnaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "stopword_count"

  @transient private lazy val set: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String](stopwords.size * 2)
    stopwords.foreach(s.add)
    s
  }

  override def nullSafeEval(input: Any): Any =
    TextKernels.stopwordCount(
      input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], set)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val setRef = ctx.addReferenceObj("stopSet", set, "java.util.HashSet")
    nullSafeCodeGen(ctx, ev, x =>
      s"${ev.value} = graft.functions.TextKernels$$.MODULE$$.stopwordCount($x, $setRef);")
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** First-fit-decreasing packing of a shard's (negLen, docId) array (see
  * TextKernels.ffdPack): the sequential greedy that cannot be a window
  * function runs as ONE kernel call per shard — shards are the
  * parallelism unit, exactly like C26's per-shard cumsum windows. */
case class FfdPack(child: Expression, budget: Long)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("n_tokens", LongType, nullable = false),
    StructField("bin", IntegerType, nullable = false),
    StructField("bin_off", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "ffd_pack"

  override def nullSafeEval(input: Any): Any =
    TextKernels.ffdPack(
      input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], budget)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x =>
      s"${ev.value} = graft.functions.TextKernels$$.MODULE$$.ffdPack($x, ${budget}L);")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object SketchHash {
  /** splitmix64 finalizer. */
  @inline def mix(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  @inline def baseHash(s: UTF8String): Long =
    XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42L)

  // --- engine-portable MinHash family --------------------------------------
  // The family is chosen so ANY engine can replicate it with exact-integer
  // SQL (the DuckDB oracle does): fingerprint = first 14 hex chars of
  // md5(shingle) as a 56-bit integer; member j is the affine map
  // (A(j)*fp + B(j)) mod M61 — one 128-bit multiply, exact in JVM longs
  // (multiplyHigh) and in DuckDB HUGEINT arithmetic alike.

  val M61: Long = (1L << 61) - 1

  /** Deterministic affine coefficients; A is nonzero mod M61. */
  val AffineA: Array[Long] =
    Array.tabulate(64)(j => math.max(1L, (mix(0xA11CE5L + j) & Long.MaxValue) % M61))
  val AffineB: Array[Long] =
    Array.tabulate(64)(j => (mix(0xB0BCA7L + j) & Long.MaxValue) % M61)

  private val md5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** First 8 md5 bytes as a signed 64-bit value (== parsing the first 16
    * hex chars of the hex digest as unsigned and wrapping to signed —
    * SQL engines do it positionally in 128-bit then subtract 2^64). */
  def fingerprint64(s: UTF8String): Long = {
    val d = md5.get(); d.reset()
    val b = d.digest(s.getBytes)
    ((b(0) & 0xffL) << 56) | ((b(1) & 0xffL) << 48) | ((b(2) & 0xffL) << 40) |
      ((b(3) & 0xffL) << 32) | ((b(4) & 0xffL) << 24) | ((b(5) & 0xffL) << 16) |
      ((b(6) & 0xffL) << 8) | (b(7) & 0xffL)
  }

  /** First 56 bits of md5 (== parsing the first 14 hex chars of the hex
    * digest, which SQL engines can do positionally). */
  def fingerprint56(s: UTF8String): Long = {
    val d = md5.get(); d.reset()
    val b = d.digest(s.getBytes)
    ((b(0) & 0xffL) << 48) | ((b(1) & 0xffL) << 40) | ((b(2) & 0xffL) << 32) |
      ((b(3) & 0xffL) << 24) | ((b(4) & 0xffL) << 16) | ((b(5) & 0xffL) << 8) |
      (b(6) & 0xffL)
  }

  /** (A(j)*fp + B(j)) mod M61 with exact 128-bit intermediate math:
    * 2^64 ≡ 8 (mod M61), so hi*2^64 + lo ≡ (hi<<3) + lo-folded. */
  def affineM61(fp: Long, j: Int): Long = {
    val a = AffineA(j)
    val hi = java.lang.Math.multiplyHigh(a, fp) // both < 2^61: signed==unsigned
    val lo = a * fp
    var r = (hi << 3) + (lo & M61) + (lo >>> 61)
    while (r >= M61) r -= M61
    r += AffineB(j)
    if (r >= M61) r -= M61
    r
  }
}

/** k-wide MinHash signature over a shingle array: one byte-level hash per
  * shingle, then k cheap mixes — O(|sh| · k) register ops, no boxing. */
case class MinHashSignature(child: Expression, k: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_signature"

  override def nullSafeEval(input: Any): Any =
    SketchKernels.minhash(input.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x =>
      s"${ev.value} = graft.functions.SketchKernels$$.MODULE$$.minhash($x, $k);")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** 64-bit SimHash over a token array (with multiplicity): per-token hash,
  * ±1 bit sign sums, sign-threshold fingerprint. Fully map-side — replaces
  * an explode + 64-aggregate shuffle with a per-row loop. */
case class Simhash64(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override def nullSafeEval(input: Any): Any =
    SketchKernels.simhash(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x =>
      s"${ev.value} = graft.functions.SketchKernels$$.MODULE$$.simhash($x);")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Count of positions where two equal-length long arrays agree — the
  * MinHash signature-overlap estimator. Codegen'd primitive loop; the
  * zip_with/aggregate HOF equivalent interprets a lambda per element and
  * dominated candidate verification at 100k+ docs. */
case class SigOverlap(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "sig_overlap"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]; val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var c = 0; var i = 0
    while (i < n) { if (x.getLong(i) == y.getLong(i)) c += 1; i += 1 }
    c
  }

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i"); val c = ctx.freshName("c")
      s"""
         |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |int $c = 0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($x.getLong($i) == $y.getLong($i)) $c++;
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Per-document repetition statistics over whitespace words and word
  * 2-grams, in ONE pass over the tokens (Gopher-style repetition signals;
  * cf. reference-free quality filtering in large-corpus curation). A
  * groupBy-(doc, gram) formulation would shuffle the whole token stream on
  * a per-document question — this stays map-side, like every other
  * row-granular kernel in this file.
  *
  * Output struct (all ints, exactly reproducible in SQL):
  * (n_words, distinct_words, n_grams, distinct_grams, top_gram_n).
  */
case class RepetitionStats(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("n_words", IntegerType, nullable = false),
    StructField("distinct_words", IntegerType, nullable = false),
    StructField("n_grams", IntegerType, nullable = false),
    StructField("distinct_grams", IntegerType, nullable = false),
    StructField("top_gram_n", IntegerType, nullable = false)))
  override def prettyName: String = "repetition_stats"

  override def nullSafeEval(input: Any): Any =
    SketchKernels.repetitionStats(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x =>
      s"${ev.value} = graft.functions.SketchKernels$$.MODULE$$.repetitionStats($x);")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object textsketch {
  import GraftSqlBridge.{column, expression}

  def word_shingles(text: Column, n: Int): Column =
    column(WordShingles(expression(text), n))

  def repetition_stats(text: Column): Column =
    column(RepetitionStats(expression(text)))

  def minhash_signature(sh: Column, k: Int): Column =
    column(MinHashSignature(expression(sh), k))

  def simhash64(tokens: Column): Column =
    column(Simhash64(expression(tokens)))

  def sig_overlap(a: Column, b: Column): Column =
    column(SigOverlap(expression(a), expression(b)))

  def compress_ratio(text: Column): Column =
    column(CompressRatio(expression(text)))

  def nfkd_fold(text: Column): Column =
    column(NfkdFold(expression(text)))

  def greedy_phrase_merge(toks: Column, phrases: Seq[String]): Column =
    column(GreedyPhraseMerge(expression(toks), phrases))

  def stopword_count(toks: Column, stopwords: Seq[String]): Column =
    column(StopwordCount(expression(toks), stopwords))

  def ffd_pack(docs: Column, budget: Long): Column =
    column(FfdPack(expression(docs), budget))

  def unigram_segment_all(toks: Column, vocab: Seq[(String, Long)],
      maxLen: Int, unkCost: Long): Column =
    column(UnigramSegmentAll(expression(toks), vocab, maxLen, unkCost))

  def wordpiece_segment_all(toks: Column, vocab: Seq[String]): Column =
    column(WordpieceSegmentAll(expression(toks), vocab))

  def char_entropy_stats(text: Column): Column =
    column(CharEntropyStats(expression(text)))

  def kn_score_stats(toks: Column, vocab: Seq[String], bg: Map[String, Long],
      ca: Map[String, Long], n1f: Map[String, Long], n1p: Map[String, Long],
      dTypes: Long, discount: Double, quantum: Double): Column =
    column(KnScoreStats(expression(toks), vocab, bg, ca, n1f, n1p,
      dTypes, discount, quantum))
}
