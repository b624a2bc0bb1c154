package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** r16 optimization guard: the iterative-graph loops pick their per-round
  * join strategy adaptively (`OlapC.maybeBroadcastRows`, priced by the
  * counts the loops already compute). At gate scale every loop frame fits
  * the default 4M-row bound, so the broadcast branch is the one the whole
  * suite exercises — this spec pins the NON-broadcast fallback (the
  * deploy-scale branch: planner-chosen shuffle joins, and for LPA the
  * dst-partitioned pre-sorted edge list) by forcing the bound to 0 and
  * requiring bit-identical boards. */
class LoopBroadcastFallbackSpec extends SparkSpec {

  private val Conf = "graft.loop.broadcastMaxRows"

  private def withFallback[T](f: => T): T = {
    spark.conf.set(Conf, "0")
    try f finally spark.conf.unset(Conf)
  }

  private def sortedRows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).toSeq.sorted

  import spark.implicits._

  test("lpaOn: shuffle-join fallback == broadcast path (two bridged triangles)") {
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (5L, 6L), (5L, 7L),
      (6L, 7L), (3L, 5L))
    val e = (edges ++ edges.map(p => (p._2, p._1))).toDF("src", "dst")
    val fast = sortedRows(OlapC.lpaOn(e, OlapC.LpaRounds))
    val slow = withFallback(sortedRows(OlapC.lpaOn(e, OlapC.LpaRounds)))
    assert(fast === slow)
  }

  test("bfsHopsOn / ssspBoardOn / kcorePartsOn: fallback == broadcast path " +
      "on the sf0.001 driver graphs") {
    val bfsFast = sortedRows(OlapC.bfsHops(spark, sfDir))
    val ssspFast = sortedRows(OlapC.ssspCost(spark, sfDir))
    val kcoreFast = sortedRows(OlapC.kcoreParts(spark, sfDir))
    withFallback {
      assert(sortedRows(OlapC.bfsHops(spark, sfDir)) === bfsFast)
      assert(sortedRows(OlapC.ssspCost(spark, sfDir)) === ssspFast)
      assert(sortedRows(OlapC.kcoreParts(spark, sfDir)) === kcoreFast)
    }
  }

  test("connectedComponents: fallback == broadcast path (chain + clique)") {
    val nodes = (1L to 12L).toDF("id")
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L),
      (8L, 9L), (9L, 10L), (8L, 10L)).toDF("a", "b")
    val fast = sortedRows(
      Cluster.connectedComponents(nodes, "id", edges, "a", "b"))
    val slow = withFallback(sortedRows(
      Cluster.connectedComponents(nodes, "id", edges, "a", "b")))
    assert(fast === slow)
  }
}
