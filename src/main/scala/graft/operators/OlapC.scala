package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** SURVEY §2 block B continued (B19–B20): event-journey analytics — ordered
  * funnel conversion and cohort retention — the two canonical product-
  * analytics queries a reference user would run over the events stream.
  *
  * Scale notes (100 TB):
  *  - Both are ONE shuffle on `user_id` with partial aggregation; the
  *    per-user event history is bounded (a user's events, not the corpus),
  *    so the collected arrays stay small even when the event table is huge.
  *  - The funnel's ordered-step matching runs on the grouped row (array
  *    functions over the per-user history) — no self-joins of the event
  *    table against itself per step, which is the quadratic formulation.
  *  - Event times in/out as epoch-micros BIGINT (oracle precision parity,
  *    see OlapB).
  */
object OlapC {

  // --- B19: ordered funnel (view → click → purchase) -----------------------
  /** Per-user funnel: first `view`, first `click` strictly after it, first
    * `purchase` strictly after that, and the stage reached (0–3). Step
    * times are `min` over filtered per-user history — order-free, so the
    * unordered `collect_list` is safe and no per-user sort ever happens. */
  def funnelOn(events: DataFrame, userCol: String, tsUsCol: String,
      typeCol: String, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val base = events.select(col(userCol).as("user_id"),
      col(tsUsCol).as("ts_us"), col(typeCol).as("event_type"))
    val first = base.groupBy(col("user_id"))
      .agg(min(when(col("event_type") === steps.head, col("ts_us")))
          .as(s"t_${steps.head}"),
        collect_list(struct(col("ts_us"), col("event_type"))).as("_evs"))
    val withSteps = steps.zip(steps.tail).foldLeft(first) { case (df, (prev, s)) =>
      df.withColumn(s"t_$s", array_min(expr(
        s"transform(filter(_evs, x -> x.event_type = '$s' AND x.ts_us > t_$prev), x -> x.ts_us)")))
    }
    // ascending fold: the outermost `when` is the deepest step reached
    val stage = steps.zipWithIndex.foldLeft(lit(0)) { case (acc, (s, i)) =>
      when(col(s"t_$s").isNotNull, i + 1).otherwise(acc)
    }
    withSteps
      .select(col("user_id") +: steps.map(s => col(s"t_$s")) :+
        stage.as("stage"): _*)
      .orderBy(col("user_id"))
  }

  def funnel(spark: SparkSession, dir: String): DataFrame =
    funnelOn(Tables(spark, dir).events
        .withColumn("ts_us", unix_micros(col("ts"))),
      "user_id", "ts_us", "event_type", Seq("view", "click", "purchase"))

  val funnelSql: String =
    """WITH e AS (
      |  SELECT user_id, epoch_ns(ts) // 1000 AS ts_us, event_type FROM events
      |), u AS (SELECT DISTINCT user_id FROM e),
      |v AS (SELECT user_id, MIN(ts_us) AS t_view
      |      FROM e WHERE event_type = 'view' GROUP BY 1),
      |c AS (SELECT e.user_id, MIN(ts_us) AS t_click
      |      FROM e JOIN v USING (user_id)
      |      WHERE event_type = 'click' AND ts_us > t_view GROUP BY 1),
      |p AS (SELECT e.user_id, MIN(ts_us) AS t_purchase
      |      FROM e JOIN c USING (user_id)
      |      WHERE event_type = 'purchase' AND ts_us > t_click GROUP BY 1)
      |SELECT u.user_id, t_view, t_click, t_purchase,
      |  CAST(CASE WHEN t_purchase IS NOT NULL THEN 3
      |            WHEN t_click IS NOT NULL THEN 2
      |            WHEN t_view IS NOT NULL THEN 1 ELSE 0 END AS INT) AS stage
      |FROM u LEFT JOIN v USING (user_id) LEFT JOIN c USING (user_id)
      |       LEFT JOIN p USING (user_id)
      |ORDER BY user_id""".stripMargin

  // --- B20: weekly cohort retention ----------------------------------------
  /** Users per (first-seen week, week offset): the retention triangle.
    * One user-keyed shuffle: first-event week and the distinct active-week
    * set aggregate together; exploding the per-user week set (bounded by
    * the observation span) yields unique (user, week) rows, so the final
    * count is distinct-free. */
  def retentionOn(events: DataFrame, userCol: String, tsCol: String): DataFrame = {
    events
      .select(col(userCol).as("user_id"),
        to_date(date_trunc("week", col(tsCol))).as("wk"))
      .groupBy(col("user_id"))
      .agg(min(col("wk")).as("cohort_week"), collect_set(col("wk")).as("_wks"))
      .select(col("user_id"), col("cohort_week"), explode(col("_wks")).as("wk"))
      .select(col("cohort_week"),
        expr("datediff(wk, cohort_week) div 7").cast("int").as("week_offset"))
      .groupBy(col("cohort_week"), col("week_offset"))
      .agg(count(lit(1)).as("n_users"))
      .orderBy(col("cohort_week"), col("week_offset"))
  }

  def retention(spark: SparkSession, dir: String): DataFrame =
    retentionOn(Tables(spark, dir).events, "user_id", "ts")

  val retentionSql: String =
    """WITH a AS (
      |  SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS wk
      |  FROM events
      |), f AS (
      |  SELECT user_id, MIN(wk) AS cohort_week FROM a GROUP BY 1
      |)
      |SELECT cohort_week,
      |  CAST(date_diff('day', cohort_week, wk) // 7 AS INT) AS week_offset,
      |  COUNT(*) AS n_users
      |FROM a JOIN f USING (user_id)
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "funnel" -> (funnel _),
    "retention" -> (retention _))

  val oracles: Map[String, String] = Map(
    "funnel" -> funnelSql,
    "retention" -> retentionSql)
}
