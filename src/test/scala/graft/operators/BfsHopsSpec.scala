package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** B92 `bfs_hops`: hand-checked shortest hops on a fixture graph (with a
  * cycle, a tie, and an unreachable island), plus the frontier
  * invariants on the real bipartite trade graph. */
class BfsHopsSpec extends SparkSpec {

  test("fixture graph: shortest hops through a cycle, tie, and island") {
    import spark.implicits._
    // 1→2→3→4→1 cycle, 1→3 shortcut, 5↔6 island
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L), (1L, 3L),
      (5L, 6L), (6L, 5L)).toDF("src", "dst")
    val got = OlapC.bfsHopsOn(edges, source = 1L, maxHops = 10)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 0L, 2L -> 1L, 3L -> 1L, 4L -> 2L),
      s"island must stay unreached and the shortcut must win: $got")
  }

  test("fixture graph: the hop cap truncates the frontier walk") {
    import spark.implicits._
    val chain = (1L to 9L).map(i => (i, i + 1)).toDF("src", "dst")
    val got = OlapC.bfsHopsOn(chain, source = 1L, maxHops = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 3L))
  }

  test("real corpus: BFS invariants — unique source at 0, every hop-i+1 " +
      "node reached from a hop-i node, no hop beyond the cap") {
    val rows = OlapC.bfsHops(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(3)))
    assert(rows.count(_._3 == 0L) === 1)
    assert(rows.forall(_._3 <= OlapC.BfsMaxHops))
    // bipartite alternation: even hops are customers, odd are suppliers
    rows.foreach { case (_, kind, h) =>
      assert((h % 2 == 0) == (kind == "customer"), s"$kind at hop $h") }
    // real expansion: at least three hop levels populated
    assert(rows.map(_._3).distinct.length >= 3)
  }
}
