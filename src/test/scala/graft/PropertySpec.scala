package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.apache.spark.sql.functions._

/** Randomized cross-validation of the engine's trickiest kernels against
  * independent in-JVM reference implementations (raw ScalaCheck generators
  * with pinned seeds — the scalatest bridge artifact is not on the offline
  * classpath). */
class PropertySpec extends SparkSpec {

  import spark.implicits._

  private def sample[T](g: Gen[T], n: Int): Seq[T] =
    (0 until n).map(i => g.pureApply(Gen.Parameters.default, Seed(42L + i)))

  test("TopKBuffer matches sort-based reference on random streams") {
    val pairGen = Gen.listOfN(40, Gen.zip(Gen.chooseNum(0.0, 1.0), Gen.chooseNum(0L, 50L)))
    for ((pairs, i) <- sample(pairGen, 30).zipWithIndex) {
      val k = 1 + (i % 8)
      val buf = new graft.functions.TopKBuffer(k)
      pairs.foreach { case (s, id) => buf.add(s, id) }
      val expected = pairs.sortBy { case (s, id) => (-s, id) }.take(k)
      assert(buf.sorted.toList === expected, s"k=$k pairs=$pairs")
    }
  }

  test("quantity rule matches an independent Scala re-implementation") {
    // reference semantics: rules/quantity.py:20 (bottle passthrough, BEER
    // special packs, WINE packs*units, default packs only)
    def reference(qty: Double, uom: String, cat: String, packs: Long, units: Long): Long = {
      if (uom == "bottle") math.floor(qty).toLong
      else if (cat == "BEER" && Set(4L, 6L, 12L, 24L)(packs)) math.floor(qty * packs * units).toLong
      else if (cat == "BEER") math.floor(qty * packs).toLong
      else if (cat == "WINE") math.floor(qty * packs * units).toLong
      else math.floor(qty * packs).toLong
    }
    val gen = Gen.zip(
      Gen.chooseNum(0.0, 500.0),
      Gen.oneOf("bottle", "case", "pack", "oz", "unit"),
      Gen.oneOf("BEER", "WINE", "SPIRITS", "MISCELLANEOUS"),
      Gen.oneOf(1L, 2L, 4L, 6L, 12L, 24L),
      Gen.chooseNum(1L, 4L))
    val rows = sample(gen, 300)
    val df = rows.toDF("qty", "uom", "cat", "packs", "units")
      .withColumn("calc", graft.etl.Rules.quantity(
        col("qty"), col("uom"), col("cat"), col("packs"), col("units")))
    val got = df.select("calc").collect().map(_.getLong(0))
    val want = rows.map { case (q, u, c, p, un) => reference(q, u, c, p, un) }
    assert(got.toSeq === want)
  }

  test("QuantizedCosine matches an integer-exact reference") {
    val vecGen = Gen.listOfN(16, Gen.chooseNum(-1.0, 1.0))
    val cases = sample(Gen.zip(vecGen, vecGen), 50)
    val df = cases.map { case (a, b) => (a.toArray, b.toArray) }.toDF("a", "b")
      .select(graft.functions.vectors.quantized_cosine(col("a"), col("b")).as("c"))
    val got = df.collect().map(_.getDouble(0))
    cases.zip(got).foreach { case ((a, b), g) =>
      def q(v: List[Double]) = v.map(x => math.floor(x * 1e6).toLong)
      val (qa, qb) = (q(a), q(b))
      val dot = qa.zip(qb).map { case (x, y) => x * y }.sum
      val na = qa.map(x => x * x).sum
      val nb = qb.map(x => x * x).sum
      val expected = dot.toDouble / math.sqrt(na.toDouble) / math.sqrt(nb.toDouble)
      assert(g === expected)
    }
  }

  test("minhash estimate converges to true Jaccard on random shingle sets") {
    val docGen = Gen.listOfN(60, Gen.oneOf("a", "b", "c", "d", "e", "f", "g", "h"))
      .map(_.mkString(" "))
    val docs = sample(docGen, 40)
    def sh(s: String) = s.split(" ").sliding(3).map(_.mkString(" ")).toSet
    val sigs = docs.zipWithIndex.map { case (d, i) => (i.toLong, d) }
      .toDF("id", "text")
      .select(col("id"), graft.functions.textsketch.minhash_signature(
        graft.functions.textsketch.word_shingles(col("text"), 3), 64).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    for (i <- docs.indices; j <- (i + 1) until docs.length by 7) {
      val (s1, s2) = (sh(docs(i)), sh(docs(j)))
      val truth = (s1 & s2).size.toDouble / (s1 | s2).size
      val overlap = sigs(i.toLong).zip(sigs(j.toLong)).count { case (x, y) => x == y } / 64.0
      assert(math.abs(overlap - truth) < 0.35, // 64 hashes → σ ≈ 0.06; 5σ+ margin
        s"pair ($i,$j): est=$overlap true=$truth")
    }
  }

  test("wpSegmentWord: greedy longest-match reference equality on random words/vocabs") {
    // independent reference: straightforward recursive greedy matcher
    def ref(word: String, vocab: Set[String]): Seq[String] = {
      val out = collection.mutable.ArrayBuffer.empty[String]
      var p = 0
      while (p < word.length) {
        val ls = (word.length - p) to 1 by -1
        val hit = ls.map { l =>
          if (p == 0) word.substring(0, l) else "##" + word.substring(p, p + l)
        }.find(vocab.contains)
        hit match {
          case None => return Seq("[UNK]")
          case Some(piece) =>
            out += piece
            p += (if (piece.startsWith("##")) piece.length - 2 else piece.length)
        }
      }
      out.toSeq
    }
    def kernel(word: String, vocab: Set[String]): Seq[String] = {
      val s = new java.util.HashSet[String](); vocab.foreach(s.add)
      val out = new java.util.ArrayList[AnyRef]()
      graft.functions.TextKernels.wpSegmentWord(word, s, out)
      (0 until out.size).map(i => out.get(i).toString)
    }
    val wordGen = Gen.chooseNum(1, 10).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf('a', 'b', 'c')).map(_.mkString))
    val vocabGen = Gen.listOfN(12, Gen.chooseNum(1, 4).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf('a', 'b', 'c')).map(_.mkString)))
      .flatMap(ps => Gen.oneOf(true, false).map(full => (ps, full)))
    for (((pieces, fullAlpha), i) <- sample(vocabGen, 60).zipWithIndex) {
      // half the runs guarantee the alphabet (lossless regime), half don't
      // (the whole-word [UNK] path must agree too)
      val base = if (fullAlpha) Set("a", "b", "c", "##a", "##b", "##c")
                 else Set("a", "##b")
      val vocab = base ++ pieces.flatMap(p => Seq(p, "##" + p))
      for (word <- sample(wordGen, 20)) {
        val got = kernel(word, vocab)
        val want = ref(word, vocab)
        assert(got === want, s"word=$word vocab=$vocab")
        // piece-concat losslessness whenever no [UNK]
        if (!got.contains("[UNK]"))
          assert(got.map(_.stripPrefix("##")).mkString === word)
      }
    }
  }
}
