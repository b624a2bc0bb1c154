package graft.operators

import graft.SparkSpec
import graft.sources.Tables
import org.apache.spark.sql.functions._

class OlapSpec extends SparkSpec {

  test("q1_agg returns the 6 flag/status groups with exact sums") {
    val rows = Olap.q1Agg(spark, sfDir).collect()
    assert(rows.length === 6)
    assert(rows.map(_.getAs[Long]("count_order")).sum === 6000 - Tables(spark, sfDir)
      .lineitem.filter(col("l_shipdate") > lit("1998-09-02").cast("timestamp")).count())
  }

  test("q3_topk is a top-10 sorted by revenue desc with a broadcast dim join") {
    val df = OlapB.q3Topk(spark, sfDir)
    val revs = df.collect().map(_.getAs[Double]("revenue"))
    assert(revs.length <= 10)
    assert(revs.sameElements(revs.sortBy(-_)))
    // the customer dim must broadcast — no shuffle of the fact side for it
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"no broadcast join in:\n$plan")
  }

  test("q5_multijoin broadcasts all dims") {
    val plan = OlapB.q5Multijoin(spark, sfDir).queryExecution.executedPlan.toString
    assert(plan.split("BroadcastHashJoin").length >= 4, "expected >=3 broadcast joins")
  }

  test("window_rank emits at most 3 rows per customer, ranked") {
    val bad = OlapB.windowRank(spark, sfDir)
      .groupBy("o_custkey").agg(count(lit(1)).as("n"), max("rn").as("mx"))
      .filter(col("n") > 3 || col("mx") > 3).count()
    assert(bad === 0)
  }

  test("window_running is monotone per customer") {
    val bad = OlapB.windowRunning(spark, sfDir)
      .withColumn("prev", lag("running_spend", 1).over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")))
      .filter(col("prev").isNotNull && col("running_spend") < col("prev"))
      .count()
    assert(bad === 0)
  }

  test("approx_count_distinct tracks exact within 5%") {
    val o = Tables(spark, sfDir).orders
    val Array(exact, approx) = o.select(
      countDistinct(col("o_custkey")).cast("double"),
      approx_count_distinct(col("o_custkey"), 0.02).cast("double")
    ).collect()(0).toSeq.map(_.asInstanceOf[Double]).toArray
    assert(math.abs(approx - exact) / exact < 0.05, s"approx=$approx exact=$exact")
  }

  test("asof_join matches are past-or-equal signups of the same user") {
    val df = OlapB.asofJoin(spark, sfDir)
    val bad = df.filter(col("matched_signup").isNotNull &&
      col("matched_signup_ts") > col("p_ts_us")).count()
    assert(bad === 0)
    assert(df.count() > 0)
  }

  test("asof_join_nearest: hand-checked directions on a seeded frame; " +
      "the chosen match is the true per-row minimum on the corpus (B89)") {
    import spark.implicits._
    // user 1: purchase at 100 — signups at 90 (Δ10 back) and 105 (Δ5 fwd)
    //   → forward wins
    // user 2: purchase at 100 — signups at 95 and 105 (equidistant)
    //   → backward wins ties
    // user 3: purchase at 100 — signup at 100 (exact) → backward, Δ0
    // user 4: purchase at 100 — only a later signup at 200 → forward
    // user 5: purchase with no signup at all → null match
    val left = Seq((1L, 100L, 11L), (2L, 100L, 21L), (3L, 100L, 31L),
      (4L, 100L, 41L), (5L, 100L, 51L))
      .toDF("user_id", "ts_us", "event_id")
    val right = Seq((1L, 90L, 12L), (1L, 105L, 13L),
      (2L, 95L, 22L), (2L, 105L, 23L), (3L, 100L, 32L), (4L, 200L, 42L))
      .toDF("user_id", "ts_us", "event_id")
      .select(col("user_id"), col("ts_us"), col("event_id"),
        col("event_id").as("m_id"), col("ts_us").as("m_ts"))
    val got = AsofJoin.asofNearest(left, right, "user_id", "ts_us",
        "event_id", Seq("m_id", "m_ts"), "m_ts")
      .select(col("user_id"), col("m_id"), col("matched_direction"),
        col("delta_us"))
      .collect().map(r => r.getLong(0) ->
        ((if (r.isNullAt(1)) -1L else r.getLong(1)),
          if (r.isNullAt(2)) "-" else r.getString(2),
          if (r.isNullAt(3)) -1L else r.getLong(3))).toMap
    assert(got === Map(
      1L -> ((13L, "f", 5L)), 2L -> ((22L, "b", 5L)),
      3L -> ((32L, "b", 0L)), 4L -> ((42L, "f", 100L)),
      5L -> ((-1L, "-", -1L))))

    // corpus: every chosen |Δ| equals the brute-force per-purchase min
    val e = graft.sources.Tables(spark, sfDir).events
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us"),
        col("event_type"), col("event_id")).collect()
    val signups = e.filter(_.getString(2) == "signup")
      .groupBy(_.getLong(0)).view
      .mapValues(_.map(_.getLong(1)).sorted).toMap
    val real = OlapB.asofJoinNearest(spark, sfDir).collect()
    assert(real.nonEmpty)
    real.foreach { r =>
      val u = r.getLong(1); val pts = r.getLong(2)
      signups.get(u) match {
        case None => assert(r.isNullAt(3), s"purchase ${r.getLong(0)}")
        case Some(ss) =>
          val best = ss.map(t => math.abs(t - pts)).min
          assert(r.getLong(6) === best,
            s"purchase ${r.getLong(0)}: Δ ${r.getLong(6)} vs best $best")
      }
    }
  }

  test("events_sessionize: session bounds respect the gap") {
    import org.apache.spark.sql.expressions.Window
    val s = OlapB.eventsSessionize(spark, sfDir)
    // consecutive sessions of one user must be separated by > gap
    val w = Window.partitionBy("user_id").orderBy("session_id")
    val bad = s.withColumn("prev_end", lag("end_us", 1).over(w))
      .filter(col("prev_end").isNotNull &&
        col("start_us") - col("prev_end") <= OlapB.SessionGapUs)
      .count()
    assert(bad === 0)
  }

  test("pivot has no collect job: explicit value list produces 1+5 columns") {
    val df = OlapB.pivotEvents(spark, sfDir)
    assert(df.columns.toSeq === Seq("day", "click", "error", "purchase", "signup", "view"))
  }

  test("approx_percentile tracks the exact percentile within 5%") {
    val o = Tables(spark, sfDir).orders
    val r = o.agg(
      percentile(col("o_totalprice"), lit(0.9)),
      approx_percentile(col("o_totalprice"), lit(0.9), lit(1000))).collect()(0)
    val (exact, approx) = (r.getDouble(0), r.getDouble(1))
    assert(math.abs(approx - exact) / exact < 0.05, s"approx=$approx exact=$exact")
  }

  test("events_sliding: every event lands in exactly two overlapping windows") {
    val sliding = OlapB.eventsSliding(spark, sfDir).collect()
    val nEvents = graft.sources.Tables(spark, sfDir).events.count()
    assert(sliding.map(_.getAs[Long]("n")).sum === 2 * nEvents)
    // window starts sit on the 1h slide grid (empty hours may be skipped)
    val starts = sliding.map(_.getAs[Long]("window_start_us")).sorted
    starts.sliding(2).foreach {
      case Array(a, b) => assert((b - a) % 3600000000L === 0L && b > a)
      case _ =>
    }
    sliding.foreach(r =>
      assert(r.getAs[Long]("n_users") <= r.getAs[Long]("n")))
    // each 2h window equals the sum of its two member 1h tumbling buckets
    val tumbling = OlapB.eventsWindowed(spark, sfDir).collect()
      .groupBy(_.getAs[Long]("window_start_us")).view
      .mapValues(_.map(_.getAs[Long]("n")).sum).toMap
    sliding.foreach { r =>
      val ws = r.getAs[Long]("window_start_us")
      val expected = tumbling.getOrElse(ws, 0L) +
        tumbling.getOrElse(ws + 3600000000L, 0L)
      assert(r.getAs[Long]("n") === expected, s"window $ws")
    }
  }

  test("events_cube: subtotal lattice is self-consistent (B49b)") {
    import org.apache.spark.sql.functions._
    val rows = graft.operators.OlapB.eventsCube(spark, sfDir).collect()
      .map(r => (Option(r.getDate(0)), Option(r.getString(1)),
        r.getLong(2), r.getLong(3), r.getDouble(4)))
    // one grand total (gid=3), and it equals the sum of the full cells
    val grand = rows.filter(_._3 == 3L)
    assert(grand.length === 1)
    val cells = rows.filter(_._3 == 0L)
    assert(grand.head._4 === cells.map(_._4).sum)
    assert(math.abs(grand.head._5 - cells.map(_._5).sum) < 1e-6)
    // both one-dim margins also sum to the grand total
    for (gid <- Seq(1L, 2L)) {
      val margin = rows.filter(_._3 == gid)
      assert(margin.nonEmpty && margin.map(_._4).sum === grand.head._4, s"gid=$gid")
    }
    // lattice size: cells + day-margin + type-margin + grand
    assert(rows.length === cells.length +
      rows.count(_._3 == 1L) + rows.count(_._3 == 2L) + 1)
  }

  test("q1 scan prunes columns and pushes the shipdate filter") {
    val formatted = Olap.q1Agg(spark, sfDir).queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(formatted.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"),
      s"no pushed filter:\n$formatted")
    // pruned read schema must not include unused columns like l_partkey
    assert(!formatted.contains("l_partkey"), "scan reads unused columns")
  }
}
