package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** B103 `top_paths`: hand-checked entry paths (prefix truncation, short
  * users, the event_id tie-break, count-then-path ranking) plus board
  * invariants on the real corpus. */
class TopPathsSpec extends SparkSpec {

  private def ev(rows: (Long, String, Long, String)*) = {
    import spark.implicits._
    rows.toSeq.toDF("user_id", "ts", "event_id", "event_type")
      .withColumn("ts", to_timestamp(col("ts")))
  }

  test("fixture: prefix truncation, short users, ties, and ranking") {
    val events = ev(
      // u1: a>b>c (fourth event ignored)
      (1L, "2024-01-01 00:00:01", 1L, "a"),
      (1L, "2024-01-01 00:00:02", 2L, "b"),
      (1L, "2024-01-01 00:00:03", 3L, "c"),
      (1L, "2024-01-01 00:00:04", 4L, "d"),
      // u2: same entry path
      (2L, "2024-01-01 00:00:01", 5L, "a"),
      (2L, "2024-01-01 00:00:02", 6L, "b"),
      (2L, "2024-01-01 00:00:03", 7L, "c"),
      // u3: a single event is a length-1 path
      (3L, "2024-01-01 00:00:01", 8L, "e"),
      // u4: equal timestamps — event_id orders x before y
      (4L, "2024-01-01 00:00:01", 10L, "y"),
      (4L, "2024-01-01 00:00:01", 9L, "x"))
    val got = OlapC.topPathsOn(events, "user_id", "ts", "event_id",
      "event_type").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(got.head === ((1L, "a>b>c", 2L)))
    // count ties rank alphabetically: e before x>y
    assert(got.toSeq === Seq((1L, "a>b>c", 2L), (2L, "e", 1L),
      (3L, "x>y", 1L)))
  }

  test("real corpus: ranks are 1..k, counts non-increasing, user total " +
      "conserved across ALL paths") {
    val rows = OlapC.topPaths(spark, sfDir).collect()
    assert(rows.length <= OlapC.PathTopK && rows.nonEmpty)
    assert(rows.map(_.getLong(0)).toSeq === (1L to rows.length).toSeq)
    val counts = rows.map(_.getLong(2))
    assert(counts.zip(counts.tail).forall { case (a, b) => a >= b })
    rows.foreach(r => assert(
      r.getString(1).split(">").length <= OlapC.PathLen))
    // every user contributes exactly one path (conservation over the
    // un-truncated board)
    val t = graft.sources.Tables(spark, sfDir)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val allPaths = t.events.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= OlapC.PathLen)
      .groupBy(col("user_id")).count().count()
    assert(allPaths === t.events.select("user_id").distinct().count())
  }
}
