package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class OlapCSpec extends SparkSpec {

  test("funnel equals a plain-Scala replay of the ordered-step semantics") {
    val evs = graft.sources.Tables(spark, sfDir).events
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us"),
        col("event_type")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val expected = evs.groupBy(_._1).map { case (u, es) =>
      def firstAfter(tpe: String, after: Option[Long]): Option[Long] =
        after.flatMap(t => es.filter(e => e._3 == tpe && e._2 > t)
          .map(_._2).minOption)
      val tView = es.filter(_._3 == "view").map(_._2).minOption
      val tClick = firstAfter("click", tView)
      val tPurchase = firstAfter("purchase", tClick)
      val stage =
        if (tPurchase.isDefined) 3
        else if (tClick.isDefined) 2
        else if (tView.isDefined) 1 else 0
      u -> ((tView, tClick, tPurchase, stage))
    }
    val got = OlapC.funnel(spark, sfDir).collect().map { r =>
      def opt(i: Int) = if (r.isNullAt(i)) None else Some(r.getLong(i))
      r.getLong(0) -> ((opt(1), opt(2), opt(3), r.getInt(4)))
    }.toMap
    assert(got === expected)
    // ordering invariant: whenever present, t_view < t_click < t_purchase
    got.values.foreach { case (v, c, p, _) =>
      c.foreach(tc => assert(v.exists(_ < tc)))
      p.foreach(tp => assert(c.exists(_ < tp)))
    }
  }

  test("retention: offset 0 is the cohort size; counts replay from user-weeks") {
    val userWeeks = graft.sources.Tables(spark, sfDir).events
      .select(col("user_id"),
        to_date(date_trunc("week", col("ts"))).as("wk"))
      .distinct().collect()
      .map(r => (r.getLong(0), r.getDate(1).toLocalDate))
    val cohort = userWeeks.groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
    val expected = userWeeks
      .map { case (u, wk) =>
        (cohort(u), java.time.temporal.ChronoUnit.DAYS.between(cohort(u), wk) / 7)
      }
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val got = OlapC.retention(spark, sfDir).collect()
      .map(r => (r.getDate(0).toLocalDate, r.getInt(1).toLong) -> r.getLong(2))
      .toMap
    assert(got === expected.map { case ((c, o), n) => (c, o) -> n })
    // offset 0 counts every user of the cohort exactly once
    val cohortSizes = cohort.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    got.collect { case ((c, 0L), n) => assert(n === cohortSizes(c)) }
  }
}
