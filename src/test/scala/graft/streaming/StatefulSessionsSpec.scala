package graft.streaming

import graft.SparkSpec
import graft.operators.OlapB
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class StatefulSessionsSpec extends SparkSpec {

  test("stateful streaming sessions equal batch sessions (closed set)") {
    val streamed = StatefulSessions.streamSessions(spark, sfDir)
      .select("user_id", "session_id", "n_events", "start_us", "end_us", "session_value")
      .collect().map(_.toString).toSet
    // AvailableNow replay closes a session only when a later event (or a
    // fired timeout) seals it, so the comparison set is the batch result
    // minus each user's final (still-open) session.
    val w = Window.partitionBy("user_id")
    val batchClosed = OlapB.eventsSessionize(spark, sfDir)
      .withColumn("_max", max("session_id").over(w))
      .filter(col("session_id") < col("_max"))
      .select("user_id", "session_id", "n_events", "start_us", "end_us", "session_value")
      .collect().map(_.toString).toSet
    assert(batchClosed.nonEmpty)
    assert(batchClosed.subsetOf(streamed),
      s"missing ${(batchClosed -- streamed).take(3)}")
    // anything extra must be timeout-closed final sessions — also valid
    val extra = streamed -- batchClosed
    val batchAll = OlapB.eventsSessionize(spark, sfDir)
      .select("user_id", "session_id", "n_events", "start_us", "end_us", "session_value")
      .collect().map(_.toString).toSet
    assert(extra.subsetOf(batchAll -- batchClosed),
      s"unexpected sessions ${(extra -- batchAll).take(3)}")
  }

  test("checkpointed restart: exactly-once output, session numbering continues") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.streaming.Trigger
    val base = java.nio.file.Files.createTempDirectory("graft_recovery")
    val src = base.resolve("src").toString
    val out = base.resolve("out").toString
    val ckpt = base.resolve("ckpt").toString
    val events = graft.sources.Tables(spark, sfDir).events
      .select("user_id", "event_id", "ts", "value")

    def runOnce(): Unit = StreamOps.withStatePartitions(spark) {
      val q = StatefulSessions.sessionsStream(spark, src, glob = "*.parquet")
        .toDF().writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }

    // batch 1: the full corpus
    events.coalesce(1).write.parquet(s"$src/part1")
    // flatten: file source wants files under src
    val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    def promote(sub: String): Unit =
      fs.listStatus(new org.apache.hadoop.fs.Path(s"$src/$sub"))
        .filter(_.getPath.getName.endsWith(".parquet"))
        .foreach(f => fs.rename(f.getPath,
          new org.apache.hadoop.fs.Path(s"$src/$sub.parquet")))
    promote("part1")
    runOnce()
    val after1 = spark.read.parquet(out)
    val counts1 = after1.groupBy("user_id")
      .agg(max("session_id").as("max_sid"), count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(counts1.nonEmpty)

    // batch 2 (after restart): a later burst for some users — 3 days on
    val shifted = events.filter(col("user_id") % 5 === 0)
      .withColumn("ts", col("ts") + expr("INTERVAL 3 DAYS"))
      .withColumn("event_id", col("event_id") + 10000000L)
    shifted.coalesce(1).write.parquet(s"$src/part2")
    promote("part2")
    runOnce()
    val after2 = spark.read.parquet(out)

    // exactly-once: no (user, session, start) appears twice
    assert(after2.groupBy("user_id", "session_id", "start_us").count()
      .filter(col("count") > 1).isEmpty)
    // continuity: users in batch 2 keep counting up, never restart at 1
    val counts2 = after2.groupBy("user_id").agg(max("session_id").as("m"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val touched = counts2.keySet.filter(_ % 5 == 0).filter(counts1.contains)
    assert(touched.nonEmpty)
    touched.foreach { u =>
      assert(counts2(u) > counts1(u)._1,
        s"user $u: max session ${counts2(u)} did not advance past ${counts1(u)._1}")
    }
  }

  test("session counter survives a timeout close (no duplicate session ids)") {
    import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
    import org.apache.spark.api.java.Optional
    import StatefulSessions.{Ev, SessionState, updateUser}
    // user has 3 closed sessions and an open one; the watermark fires
    val s1 = TestGroupState.create[(Long, SessionState)](
      Optional.of((3L, SessionState(0L, 1000L, 2L, 300L))),
      GroupStateTimeout.EventTimeTimeout, 0L, Optional.of(999999L),
      hasTimedOut = true)
    val closed = updateUser(7L, Iterator.empty, s1).toSeq
    assert(closed.map(_.session_id) === Seq(4L))
    assert(closed.head.session_value === 3.0)
    // the counter must persist so a later in-watermark event continues at 5
    assert(!s1.isRemoved)
    assert(s1.get._1 === 4L && s1.get._2 == null)
    val s2 = TestGroupState.create[(Long, SessionState)](
      Optional.of(s1.get), GroupStateTimeout.EventTimeTimeout, 0L,
      Optional.of(999999L), hasTimedOut = false)
    val ev = Ev(7L, 1L, 10000000000L, 100L, new java.sql.Timestamp(10000000L))
    assert(updateUser(7L, Iterator(ev), s2).toSeq.isEmpty)
    assert(s2.get._1 === 4L && s2.get._2.n === 1L)
  }
}
