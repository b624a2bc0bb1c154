package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The generic operator API (Ops.scala) on hand-built frames — the
  * contracts users rely on, independent of the canned driver queries. */
class OpsSpec extends SparkSpec {

  import spark.implicits._

  test("AsofJoin.asof picks the latest past-or-equal right row per key") {
    val left = Seq((1L, 100L, 10L), (1L, 200L, 11L), (2L, 50L, 12L))
      .toDF("k", "t", "lid")
    val right = Seq((1L, 90L, 900L), (1L, 200L, 901L), (2L, 60L, 902L))
      .toDF("k", "t", "rid")
      .withColumn("rv", col("rid") * 10)
    val l = left.withColumn("event_id", col("lid"))
    val r = right.withColumn("event_id", col("rid"))
    val out = AsofJoin.asof(l, r, "k", "t", "event_id", Seq("rv"))
      .select("lid", "rv").collect().map(x => x.getLong(0) -> Option(x.get(1))).toMap
    assert(out(10L) === Some(9000L)) // t=100 matches right t=90
    assert(out(11L) === Some(9010L)) // exact-tie t=200 matches (>= semantics)
    assert(out(12L) === None)        // t=50: no right row at or before
  }

  test("AsofJoin.asof carries NULL value fields from the matched row intact") {
    // right row at t=90 has rv=NULL, rw=7: a per-column carry would reach
    // back to t=10's rv=5 and mix two right rows — the match must surface
    // (NULL, 7) as one row
    val left = Seq((1L, 100L, 10L)).toDF("k", "t", "lid")
      .withColumn("event_id", col("lid"))
    val right = Seq((1L, 10L, Some(5L), 1L, 900L), (1L, 90L, None, 7L, 901L))
      .toDF("k", "t", "rv", "rw", "rid")
      .withColumn("event_id", col("rid"))
    val out = AsofJoin.asof(left, right, "k", "t", "event_id", Seq("rv", "rw"))
      .select("rv", "rw").collect()
    assert(out.length === 1)
    assert(out(0).isNullAt(0), "NULL rv of the matched row must survive")
    assert(out(0).getLong(1) === 7L)
  }

  test("Sessionize.assign starts a new session after the gap") {
    val df = Seq((1L, 0L, 1L), (1L, 100L, 2L), (1L, 2000L, 3L), (2L, 0L, 4L))
      .toDF("u", "ts", "eid")
    val out = Sessionize.assign(df, "u", "ts", gapUs = 1000L, tieCol = "eid")
      .select("eid", "session_id").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out(1L) === 1L && out(2L) === 1L) // within gap
    assert(out(3L) === 2L)                   // after gap
    assert(out(4L) === 1L)                   // other entity restarts at 1
  }

  test("Dedup.exactGroups groups identical content under one keeper") {
    val df = Seq((1L, "same text"), (2L, "same text"), (3L, "other"))
      .toDF("id", "content")
    val out = Dedup.exactGroups(df, "id", "content").collect()
    assert(out.length === 2)
    val dup = out.find(_.getAs[Long]("n_copies") == 2L).get
    assert(dup.getAs[Long]("keeper_id") === 1L)
  }

  test("Dedup.ngramJaccardPairs scores identical docs at 1.0") {
    val df = Seq((1L, "a b c d e f"), (2L, "a b c d e f"), (3L, "x y z w q r"))
      .toDF("id", "text")
    val out = Dedup.ngramJaccardPairs(df, "id", "text", 3, 0.5).collect()
    assert(out.length === 1)
    assert(out(0).getAs[Long]("id_a") === 1L)
    assert(out(0).getAs[Long]("id_b") === 2L)
    assert(out(0).getAs[Double]("jaccard") === 1.0)
  }

  test("Ann.bruteTopK ranks the exact nearest neighbors") {
    val vecs = Seq(
      (1L, Array(1.0, 0.0)), (2L, Array(0.9, 0.1)),
      (3L, Array(0.0, 1.0)), (4L, Array(-1.0, 0.0)))
      .toDF("id", "emb")
    val out = Ann.bruteTopK(vecs, vecs.filter(col("id") === 1), "id", "emb", 2)
      .orderBy("rank").collect()
    assert(out.map(_.getAs[Long]("neighbor_id")).toSeq === Seq(2L, 3L))
  }

  test("ngramJaccardPairs df-cap drops stop-shingle pairs only") {
    // "x y z" is a stop-shingle shared by all docs; docs 1/2 share unique
    // content beyond it, doc 3 shares ONLY the stop-shingle
    val df = Seq((1L, "x y z a b c d"), (2L, "x y z a b c e"), (3L, "x y z q r s t"))
      .toDF("id", "text")
    val exact = Dedup.ngramJaccardPairs(df, "id", "text", 3, 0.01).collect()
    val capped = Dedup.ngramJaccardPairs(df, "id", "text", 3, 0.01,
      maxShingleDf = Some(2)).collect()
    assert(exact.length === 3)  // all pairs share the x-y-z shingle
    assert(capped.length === 1) // only (1,2) survive via their unique overlap
    assert(capped(0).getAs[Long]("id_a") === 1L && capped(0).getAs[Long]("id_b") === 2L)
  }

  test("RangeJoin.pointInInterval reproduces session event counts") {
    // joining raw events against their own session intervals must recover
    // each session's n_events exactly
    val sessions = OlapB.eventsSessionize(spark, sfDir)
    val points = graft.sources.Tables(spark, sfDir).events
      .select(col("user_id"), unix_micros(col("ts")).as("t"))
    val joined = RangeJoin.pointInInterval(points, sessions, "user_id",
      "t", "start_us", "end_us", bucketWidth = 3600L * 1000000)
    val counts = joined.groupBy("user_id", "session_id")
      .agg(count(lit(1)).as("joined_n"))
    val bad = counts.join(sessions, Seq("user_id", "session_id"))
      .filter(col("joined_n") =!= col("n_events")).count()
    assert(bad === 0)
    assert(counts.count() === sessions.count())
    // and the plan is an equi-join, not a nested loop
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("top_k_by_score keeps best-k with deterministic tie-breaks") {
    val df = Seq((1L, 0.9, 10L), (1L, 0.9, 5L), (1L, 0.8, 1L), (1L, 0.95, 7L),
      (2L, 0.1, 3L)).toDF("g", "score", "id")
    val out = df.groupBy("g")
      .agg(graft.functions.topk.top_k_by_score(col("score"), col("id"), 3).as("tk"))
      .collect().map(r => r.getLong(0) -> r.getSeq[org.apache.spark.sql.Row](1)).toMap
    val g1 = out(1L).map(r => (r.getLong(0), r.getDouble(1)))
    // best-first; 0.9-tie broken by smaller id first
    assert(g1 === Seq((7L, 0.95), (5L, 0.9), (10L, 0.9)))
    assert(out(2L).map(_.getLong(0)) === Seq(3L))
  }

  test("Skew.saltedJoin matches a plain join and spreads the hot key") {
    val left = Seq.tabulate(1000)(i => (if (i < 900) "hot" else s"k$i", i))
      .toDF("key", "v")
    val right = Seq(("hot", 1), ("k950", 2), ("other", 3)).toDF("key", "w")
    val salted = Skew.saltedJoin(left, right, "key", 8)
    val plain = left.join(right, "key")
    assert(salted.count() === plain.count())
    assert(salted.agg(sum(col("v") * col("w"))).collect()(0).get(0) ===
      plain.agg(sum(col("v") * col("w"))).collect()(0).get(0))
  }

  test("asof join plan has a single shuffle exchange") {
    val plan = OlapB.asofJoin(spark, sfDir).queryExecution.executedPlan.toString
    // one exchange for the key-partitioned window + the final presentation
    // sort's exchange; no join-induced shuffles of the right side
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges === 1, s"expected 1 hash exchange, plan:\n$plan")
  }
}
