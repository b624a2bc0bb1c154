package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** B104 `kcore_parts`: hand-checked peeling (pendant cascade into a
  * clique core), the round cap, and an independent induced-subgraph
  * degree replay on the real corpus. */
class KcorePartsSpec extends SparkSpec {

  /** Bidirectional edge frame from undirected pairs. */
  private def edges(pairs: (Long, Long)*) = {
    import spark.implicits._
    val df = pairs.toSeq.toDF("src", "dst")
    df.unionAll(df.select(col("dst").as("src"), col("src").as("dst")))
  }

  test("fixture: a 2-step pendant cascade peels down to the K4 clique") {
    // K4 on 1–4; 5 hangs off (1, 2, 6); 6 hangs off 5 only.
    // Round 1 drops 6 (deg 1); round 2 drops 5 (deg 2); 1–4 survive.
    val e = edges((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (5L, 1L), (5L, 2L), (5L, 6L))
    val got = OlapC.kcorePartsOn(e, k = 3, maxRounds = 12).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
  }

  test("fixture: the round cap truncates the cascade mid-peel") {
    val e = edges((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (5L, 1L), (5L, 2L), (5L, 6L))
    // one round: only 6 is gone; 5 still shows its stale degree 3→2?
    // no — degrees are measured against the PREVIOUS node set, so after
    // one round node 5 survives with the deg-3 it had in the full graph
    val got = OlapC.kcorePartsOn(e, k = 3, maxRounds = 1).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.keySet === Set(1L, 2L, 3L, 4L, 5L))
    assert(got(5L) === 3L && got(1L) === 4L)
  }

  test("fixture: a graph already at its core converges in one round") {
    val e = edges((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L))
    val got = OlapC.kcorePartsOn(e, k = 3, maxRounds = 12).collect()
    assert(got.length === 4 && got.forall(_.getLong(1) === 3L))
  }

  test("deploy cap: a synthetic hot basket capped through " +
      "capBasketItems shrinks the edge set and the capped core is " +
      "contained in the uncapped one") {
    import spark.implicits._
    // one hot basket with 10 items (45 pairs uncapped) next to three
    // normal baskets that co-order items 1..4 twice each (support 2)
    val hot = (1L to 10L).map(i => (100L, i))
    val normal = Seq((101L, 1L), (101L, 2L), (101L, 3L), (101L, 4L),
      (102L, 1L), (102L, 2L), (102L, 3L), (102L, 4L),
      (103L, 5L), (103L, 6L))
    val items = (hot ++ normal).toDF("o", "p")
    val uncapped = OlapC.kcoreEdgesOn(items, "o", "p",
      support = 2).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val capped = OlapC.kcoreEdgesOn(items, "o", "p",
      support = 2, maxItemsPerBasket = Some(4)).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // supports can only drop under the cap → the edge set only shrinks,
    // and the hot basket's rare-item pairs are exactly what vanishes
    assert(capped.subsetOf(uncapped))
    assert(capped.size < uncapped.size)
    // the frequent items (1..4 appear in 3 baskets each) keep their
    // support-2 edges through the hot basket's top-K pick
    assert(capped.contains((1L, 2L)) && capped.contains((3L, 4L)))
    // k-core is monotone under subgraphs: capped survivors ⊆ uncapped
    def core(e: Set[(Long, Long)]) = OlapC.kcorePartsOn(
      e.toSeq.toDF("src", "dst"), k = 3, maxRounds = 12)
      .collect().map(_.getLong(0)).toSet
    assert(core(capped).subsetOf(core(uncapped)))
  }

  test("maxRounds < 1 fails loudly instead of an unresolved-column error") {
    val e = edges((1L, 2L))
    val ex = intercept[IllegalArgumentException] {
      OlapC.kcorePartsOn(e, k = 3, maxRounds = 0)
    }
    assert(ex.getMessage.contains("maxRounds"))
  }

  test("real corpus: survivors' degrees replay from the induced subgraph " +
      "and every degree clears k") {
    val core = OlapC.kcoreParts(spark, sfDir)
    val got = core.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.nonEmpty)
    assert(got.values.forall(_ >= OlapC.KcoreK))
    // independent replay: degrees of the survivor-induced subgraph of
    // the support-filtered co-purchase graph
    val items = graft.sources.Tables(spark, sfDir).lineitem
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
      .distinct()
    val pairs = items.join(items.select(col("o"), col("p").as("p2")), "o")
      .filter(col("p") < col("p2"))
      .groupBy(col("p").as("u"), col("p2").as("v"))
      .agg(count(lit(1)).as("supp"))
      .filter(col("supp") >= OlapC.KcoreSupport)
      .select("u", "v").collect().map(r => (r.getLong(0), r.getLong(1)))
    val inCore = got.keySet
    val deg = pairs.filter { case (u, v) => inCore(u) && inCore(v) }
      .flatMap { case (u, v) => Seq(u, v) }
      .groupBy(identity).map { case (n, xs) => n -> xs.size.toLong }
    assert(deg === got, "induced-subgraph degrees must match the board")
  }
}
