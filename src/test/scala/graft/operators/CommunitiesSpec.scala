package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** B130 `communities_lpa` / B131 `stream_communities`: two bridged
  * triangles resolve to two communities under the deterministic
  * min-label tie rule; the fixed round count is stable at the
  * fixpoint; the stream twin drains to the exact batch board on a
  * wave split with an order split across batches. */
class CommunitiesSpec extends SparkSpec with graft.streaming.WaveStaging {

  import spark.implicits._

  private def sym(pairs: Seq[(Long, Long)]) =
    (pairs ++ pairs.map(p => (p._2, p._1))).toDF("src", "dst")

  test("two triangles bridged by one edge resolve to two communities; " +
      "fixpoint stable past the cap") {
    val edges = sym(Seq((1L, 2L), (1L, 3L), (2L, 3L),
      (5L, 6L), (5L, 7L), (6L, 7L), (3L, 5L)))
    val got = OlapC.lpaOn(edges, OlapC.LpaRounds)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq === Seq((1L, 1L, 3L), (2L, 1L, 3L), (3L, 1L, 3L),
      (5L, 3L, 3L), (6L, 3L, 3L), (7L, 3L, 3L)),
      s"expected triangle communities 1 and 3: ${got.toSeq}")
    // stability: more rounds change nothing once converged
    val more = OlapC.lpaOn(edges, OlapC.LpaRounds + 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(more.toSeq === got.toSeq)
  }

  test("driver key: communities partition the node set; every community " +
      "size is consistent; labels are member-reachable node ids") {
    val res = OlapC.communitiesLpa(spark, sfDir)
      .localCheckpoint(eager = true)
    val n = res.count()
    assert(res.select("part_id").distinct().count() === n,
      "every node exactly once")
    val sz = res.groupBy("community").agg(count(lit(1)).as("m"))
    val bad = res.join(sz, "community")
      .filter(col("community_size") =!= col("m")).count()
    assert(bad === 0L, "community_size must equal the member count")
  }

  test("stream twin: drain == batch LPA on the K4-with-pendant waves " +
      "(split order merges via state)") {
    def li(rows: Seq[(Long, Long, Int)]) =
      rows.toDF("l_orderkey", "l_partkey", "t")
        .select(col("l_orderkey"), col("l_partkey"),
          timestamp_seconds(lit(1704067200L) + col("t") * 3600L).as("ts"))
    val w0 = li(Seq((10L, 1L, 1), (10L, 2L, 2), (10L, 3L, 3), (10L, 4L, 4)))
    val w1 = li(Seq((11L, 1L, 1500), (11L, 2L, 1501)))
    val w2 = li(Seq((11L, 3L, 1502), (11L, 4L, 1503), (12L, 1L, 1600),
      (12L, 5L, 1601)))
    val flush = li(Seq((-1L, -1L, 24 * 3650)))
    val srcDir = java.nio.file.Files.createTempDirectory("lpa_evict")
    val t0 = System.currentTimeMillis() - 100000
    Seq(w0, w1, w2, flush).zipWithIndex.foreach { case (w, i) =>
      writeWave(srcDir, w, s"w$i.parquet", t0 + i * 1000) }
    val raw = spark.readStream.schema(w0.schema)
      .option("pathGlobFilter", "w*.parquet")
      .option("maxFilesPerTrigger", 1).parquet(srcDir.toString)
    val got = graft.streaming.StreamOps.communitiesStreamOn(spark, raw)
      .collect().map(_.toString)
    val union = Seq(w0, w1, w2).reduce(_ unionAll _)
    val batch = OlapC.lpaOn(
      OlapC.kcoreEdgesOn(union, "l_orderkey", "l_partkey",
        OlapC.KcoreSupport), OlapC.LpaRounds)
      .collect().map(_.toString)
    assert(got.toSeq === batch.toSeq)
  }
}
