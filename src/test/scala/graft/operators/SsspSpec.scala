package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** B128 `sssp_cost` / B129 `stream_sssp`: weighted shortest paths —
  * hand-graph replay (a cheap 3-hop chain must beat an expensive direct
  * edge), the ⌈1000/n⌉ weight law, the round-cap semantics, fixpoint
  * stability past the cap, and stream-drain parity under a wave split
  * that duplicates link partials across batches. */
class SsspSpec extends SparkSpec with graft.streaming.WaveStaging {

  import spark.implicits._

  /** (c, s, nOrders) → the partials frame (one row per distinct order). */
  private def partials(links: Seq[(Long, Long, Int)]) =
    links.zipWithIndex.flatMap { case ((c, s, n), i) =>
      (0 until n).map(j => (c, s, i * 10000L + j))
    }.toDF("c", "s", "ok")

  test("cheap multi-hop beats expensive direct; weights are ceil(1000/n)") {
    // c1—s1 one-off trade (w=1000); c1—s2—c2—s1 strong lanes (w=100 each)
    val p = partials(Seq((1L, 1L, 1), (1L, 2L, 10), (2L, 2L, 10),
      (2L, 1L, 10)))
    val got = OlapC.ssspBoardOn(p, source = 2L, rounds = 8)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    // nodes: c1=2, c2=4, s1=3, s2=5
    assert(got === Map(2L -> 0L, 5L -> 100L, 4L -> 200L, 3L -> 300L),
      s"expected the 300-cost detour to beat the 1000-cost direct: $got")
    // weight law on n=3: ceil(1000/3) = 334
    val w3 = OlapC.ssspBoardOn(partials(Seq((1L, 1L, 3))),
      source = 2L, rounds = 1)
      .filter(col("node") === 3L).head.getLong(3)
    assert(w3 === 334L)
  }

  test("round cap: a node 9 edges out is unreached at 8 rounds; the " +
      "fixpoint is stable past the cap") {
    // bipartite chain c1-s1-c2-s2-c3-s3-c4-s4-c5-s5: s5 is 9 hops out
    val chain = partials(Seq((1L, 1L, 1), (2L, 1L, 1), (2L, 2L, 1),
      (3L, 2L, 1), (3L, 3L, 1), (4L, 3L, 1), (4L, 4L, 1), (5L, 4L, 1),
      (5L, 5L, 1)))
    val at8 = OlapC.ssspBoardOn(chain, source = 2L, rounds = 8)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(!at8.contains(11L), "s5 (node 11) must be beyond the cap")
    assert(at8(10L) === 8000L, "c5 (node 10) reached at 8 weak hops")
    // past the fixpoint nothing changes: 20 rounds == 10 rounds
    val at20 = OlapC.ssspBoardOn(chain, source = 2L, rounds = 20)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    val at10 = OlapC.ssspBoardOn(chain, source = 2L, rounds = 10)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(at20 === at10)
    assert(at10(11L) === 9000L)
  }

  test("driver key: reached set ⊇ BFS-reachable set; cost lower-bounded " +
      "by hops (cheapest possible edge)") {
    val sssp = OlapC.ssspCost(spark, sfDir).localCheckpoint(eager = true)
    val bfs = OlapC.bfsHops(spark, sfDir)
    val reachedS = sssp.select("node").collect().map(_.getLong(0)).toSet
    val bfsRows = bfs.collect().map(r => r.getLong(0) -> r.getLong(3))
    // SsspRounds >= BfsMaxHops over the same edge set
    assert(bfsRows.forall { case (n, _) => reachedS.contains(n) })
    // a node h hops out costs at least h (cheapest edge weight is 1)
    val costs = sssp.collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(bfsRows.forall { case (n, h) => costs(n) >= h })
  }

  test("stream twin: a wave split duplicating link partials across " +
      "batches drains to the exact batch board (set-monoid merge)") {
    val t = graft.sources.Tables(spark, sfDir)
    val d = java.nio.file.Files.createTempDirectory("sssp_waves")
    val t0 = System.currentTimeMillis() - 100000
    // split by linenumber: the SAME (order, supplier) link lands in
    // multiple batches — only the at-read set union keeps n exact
    (0 until 3).foreach { i =>
      writeWave(d, t.lineitem.filter(col("l_linenumber") % 3 === i),
        s"w$i.parquet", t0 + i * 1000)
    }
    val schema = spark.read.option("pathGlobFilter", "w*.parquet")
      .parquet(d.toString).schema
    val src = spark.readStream.schema(schema)
      .option("pathGlobFilter", "w*.parquet")
      .option("maxFilesPerTrigger", 1).parquet(d.toString)
    val orders = t.orders.select(col("o_orderkey"), col("o_custkey"))
      .localCheckpoint(eager = true)
    val got = graft.streaming.StreamOps.ssspStreamOn(spark, orders, src)
      .collect().map(_.toString)
    val batch = OlapC.ssspCost(spark, sfDir).collect().map(_.toString)
    assert(got.toSeq === batch.toSeq)
  }
}
