package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** B126 `record_linkage`: Fellegi-Sunter invariants — hand-computed
  * agreement patterns and scores, multi-pass blocking necessity (each
  * pass finds pairs the other cannot), class routing per feed tier, and
  * candidate-set sanity. */
class LinkageSpec extends SparkSpec with graft.streaming.WaveStaging {

  import spark.implicits._

  private def side(rows: Seq[(Long, String, Long, Long, String)]) =
    rows.toDF("id", "name", "nation", "cents", "seg")

  test("agreement levels and scores: hand-computed patterns, incl. the " +
      "exact-name level the shipped feed never fires") {
    val a = side(Seq((1L, "Alice Corp", 5L, 123456L, "AUTO")))
    val b = side(Seq(
      (10L, "Alice Corp", 5L, 123456L, "AUTO"),   // all-exact
      (11L, "alice corp", 5L, 123456L, "AUTO"),   // ci name
      (12L, "alice corp", 5L, 123463L, "AUTO"),   // bal off (same band)
      (13L, "Bob Ltd", 5L, 123400L, "METAL")))    // band-only chance pair
    val got = Linkage.linkagePairsOn(a, b)
      .orderBy(col("b_id"))
      .collect().map(r => (r.getLong(1), r.getInt(2), r.getLong(6),
        r.getString(7)))
    val wAll = Linkage.WNationAgr + Linkage.WBalAgr + Linkage.WSegAgr
    assert(got === Array(
      (10L, 2, Linkage.WNameExact + wAll, "match"),        // 27500
      (11L, 1, Linkage.WNameCi + wAll, "match"),           // 24500
      (12L, 1, Linkage.WNameCi + Linkage.WNationAgr +
        Linkage.WBalDis + Linkage.WSegAgr, "possible"),    // 12500
      (13L, 0, Linkage.WNameDis + Linkage.WNationAgr +
        Linkage.WBalDis + Linkage.WSegDis, "non_match")))  // -9500
  }

  test("multi-pass blocking: each pass reaches pairs the other cannot") {
    // name-pass-only pair: same name, different nation AND band
    val a = side(Seq((1L, "Acme", 1L, 100L, "AUTO"),
      (2L, "Zeta", 2L, 500000L, "AUTO")))
    val b = side(Seq(
      (10L, "acme", 9L, 900000L, "AUTO"),    // only pass 1 (name) reaches
      (20L, "Omega", 2L, 500007L, "AUTO"))) // only pass 2 (band) reaches
    val got = Linkage.linkagePairsOn(a, b)
      .select("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.contains((1L, 10L)), "name pass must reach cross-band pair")
    assert(got.contains((2L, 20L)), "band pass must reach mangled-name pair")
    assert(!got.contains((1L, 20L)) && !got.contains((2L, 10L)),
      "blocking must not produce unreachable pairs")
  }

  test("driver key: every tier routes to its class; truth pairs are " +
      "exactly the %3 feed; candidates stay block-bounded") {
    val res = Linkage.recordLinkage(spark, sfDir).localCheckpoint(eager = true)
    val n = graft.sources.Tables(spark, sfDir).customer.count()
    // every tier-1/tier-2 source key yields its truth pair, classed
    val truth = res.filter(col("b_id") === col("a_id") + 1000000L)
    assert(truth.count() === (n + 2) / 3) // keys %3==0
    assert(truth.filter(col("a_id") % 15 === 0)
      .select("class").distinct().collect().map(_.getString(0)).toSeq
      === Seq("possible"))
    assert(truth.filter(col("a_id") % 15 =!= 0)
      .select("class").distinct().collect().map(_.getString(0)).toSeq
      === Seq("match"))
    // novel records never reach match/possible
    assert(res.filter(col("b_id") >= 2000000L)
      .filter(col("class") =!= "non_match").count() === 0)
    // all three classes fire at the shipped corpus
    assert(res.select("class").distinct().count() === 3)
  }

  test("linkage_golden: total over masters; tier routing; best-match " +
      "provenance (B136)") {
    val g = Linkage.linkageGolden(spark, sfDir).localCheckpoint(eager = true)
    val n = graft.sources.Tables(spark, sfDir).customer.count()
    assert(g.count() === n, "golden is a TOTAL view of the master side")
    // tier-1 masters: exactly one match, and it is the shifted import id
    val t1 = g.filter(col("a_id") % 3 === 0 && col("a_id") % 15 =!= 0)
    assert(t1.filter(col("n_matched") =!= 1L).count() === 0)
    assert(t1.filter(col("best_b_id") =!= col("a_id") + 1000000L)
      .count() === 0)
    // tier-2 masters: no match, exactly one clerical-review candidate
    val t2 = g.filter(col("a_id") % 15 === 0)
    assert(t2.filter(col("n_matched") =!= 0L ||
      col("n_possible") =!= 1L).count() === 0)
    assert(t2.filter(col("best_b_id").isNotNull).count() === 0)
    // non-tier masters never match
    assert(g.filter(col("a_id") % 3 =!= 0)
      .filter(col("n_matched") =!= 0L).count() === 0)
  }

  test("stream twin: a 3-way wave split of the source drains to the " +
      "exact batch verdicts (zero state — A frozen, B batch-local)") {
    val customers = graft.sources.Tables(spark, sfDir).customer
    val d = java.nio.file.Files.createTempDirectory("linkage_waves")
    val t0 = System.currentTimeMillis() - 100000
    (0 until 3).foreach { i =>
      writeWave(d, customers.filter(col("c_custkey") % 3 === i),
        s"w$i.parquet", t0 + i * 1000)
    }
    val schema = spark.read.option("pathGlobFilter", "w*.parquet")
      .parquet(d.toString).schema
    val src = spark.readStream.schema(schema)
      .option("pathGlobFilter", "w*.parquet")
      .option("maxFilesPerTrigger", 1).parquet(d.toString)
    val a = Linkage.sideA(spark, sfDir).localCheckpoint(eager = true)
    val got = graft.streaming.StreamOps
      .recordLinkageStreamOn(spark, a, src)
      .collect().map(_.toString)
    val batch = Linkage.recordLinkage(spark, sfDir)
      .collect().map(_.toString)
    assert(got.toSeq === batch.toSeq)
  }
}
