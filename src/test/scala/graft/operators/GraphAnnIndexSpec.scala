package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The persisted kNN-graph lifecycle (the fourth index family):
  * no rebuild on re-probe, probe of a fresh index == the in-query C117
  * key, cross-segment search after admission, loud duplicate-id
  * admission, replay-idempotent admit, degree-M read view, and a
  * probe-preserving vacuum. */
class GraphAnnIndexSpec extends SparkSpec {

  private def strs(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().toSeq.map(_.toString)

  private def probeSorted(path: String,
      queries: org.apache.spark.sql.DataFrame) =
    GraphAnnIndex.probe(spark, path, queries, "vec_id", "emb")
      .orderBy(col("query_id"), col("rank"))

  test("probe of a fresh index is bit-identical to ann_graph_topk; " +
      "re-probe never rebuilds") {
    val path = GraphAnnIndex.ensure(spark, sfDir)
    val queries = VectorOps.emb(spark, sfDir)
      .filter(col("vec_id") % 50 === 0)
    val stored = strs(probeSorted(path, queries))
    val builds = GraphAnnIndex.buildsPerformed.get()
    assert(stored === strs(probeSorted(path, queries)))
    assert(GraphAnnIndex.buildsPerformed.get() === builds,
      "a re-probe re-ran the graph build")
    assert(stored === strs(VectorOps.annGraphTopk(spark, sfDir)))
  }

  test("admission: cross-segment neighbors found; duplicate ids loud; " +
      "replay a no-op; degree-M view; vacuum probe-preserving") {
    val dir = java.nio.file.Files.createTempDirectory("gann_admit")
      .toString
    val base = VectorOps.emb(spark, sfDir).filter(col("vec_id") < 300)
      .localCheckpoint(eager = true)
    base.select(col("vec_id"),
        col("emb").cast("array<float>").as("embedding"))
      .write.parquet(s"$dir/embeddings.parquet")
    val path = GraphAnnIndex.ensure(spark, dir)
    // batch: near-identical twins of every 10th base vector (the
    // dedupEmbCorpus perturbation, cosine ~0.99999) under shifted ids
    val batch = base.filter(col("vec_id") % 10 === 0)
      .select((col("vec_id") + 1000000L).as("vec_id"),
        transform(col("emb"), x => x + lit(0.01) * x * x).as("emb"))
      .localCheckpoint(eager = true)
    assert(GraphAnnIndex.admit(spark, path, "b1", batch, "vec_id", "emb"))
    assert(!GraphAnnIndex.admit(spark, path, "b1", batch, "vec_id", "emb"),
      "replayed admission must be a no-op")
    // duplicate ids must be refused loudly (df/degree corruption)
    val err = intercept[IllegalArgumentException] {
      GraphAnnIndex.admit(spark, path, "b2",
        base.limit(3), "vec_id", "emb")
    }
    assert(err.getMessage.contains("already indexed"))
    // cross-segment search: each admitted twin finds its base original
    val res = probeSorted(path, batch).localCheckpoint(eager = true)
    val found = res
      .filter(col("neighbor_id") === col("query_id") - 1000000L)
      .select("query_id").distinct().count()
    val nq = batch.count()
    assert(found >= (0.9 * nq).toLong, s"cross-segment recall $found/$nq")
    // and base vectors can now find admitted twins (old→new links)
    val back = probeSorted(path,
      base.filter(col("vec_id") % 10 === 0)).localCheckpoint(eager = true)
    val foundBack = back
      .filter(col("neighbor_id") === col("query_id") + 1000000L)
      .select("query_id").distinct().count()
    assert(foundBack >= (0.9 * nq).toLong,
      s"old-to-new recall $foundBack/$nq")
    // the read view never exceeds degree M despite segment overage
    val deg = GraphAnnIndex.edgesView(spark, path)
      .groupBy("src").count().agg(max("count")).head.getLong(0)
    assert(deg <= VectorOps.GraphM, s"read-view degree $deg")
    // vacuum: fewer-or-equal files, byte-identical probes
    val beforeTwin = strs(res)
    val beforeBack = strs(back)
    // crash-window invariant: a stray edges segment with no post
    // sibling (admit writes edges FIRST) is invisible to every read...
    import spark.implicits._
    Seq((0L, 1L, 0.5)).toDF("src", "dst", "score")
      .write.parquet(s"$path/edges_crashed")
    assert(strs(probeSorted(path, batch)) === beforeTwin,
      "a half-admitted edges segment must be invisible")
    val (fb, fa) = GraphAnnIndex.vacuum(spark, path)
    assert(fa <= fb)
    // ...and vacuum collects it
    assert(!graft.sources.IndexScratch.fsExists(s"$path/edges_crashed"))
    assert(strs(probeSorted(path, batch)) === beforeTwin)
    assert(strs(probeSorted(path,
      base.filter(col("vec_id") % 10 === 0))) === beforeBack)
  }
}
