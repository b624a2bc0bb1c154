package graft.streaming

import graft.SparkSpec
import graft.operators.OlapB
import org.apache.spark.sql.functions._

class StatefulSessionsSpec extends SparkSpec {

  test("stateful streaming sessions equal batch sessions EXACTLY (sentinel flush)") {
    // the far-future sentinel advances the watermark past every session's
    // timeout, so the replay closes ALL sessions — including each user's
    // final one — and the streamed result is the batch result, bit for bit.
    val streamed = StatefulSessions.streamSessions(spark, sfDir)
      .collect().map(_.toString).toSet
    val batch = OlapB.eventsSessionize(spark, sfDir)
      .collect().map(_.toString).toSet
    assert(streamed.nonEmpty)
    assert(streamed === batch,
      s"missing ${(batch -- streamed).take(3)} extra ${(streamed -- batch).take(3)}")
  }

  test("checkpointed restart: exactly-once output under content-derived session keys") {
    import org.apache.spark.sql.streaming.Trigger
    val base = java.nio.file.Files.createTempDirectory("graft_recovery")
    val src = base.resolve("src").toString
    val out = base.resolve("out").toString
    val ckpt = base.resolve("ckpt").toString
    val events = graft.sources.Tables(spark, sfDir).events
      .select("user_id", "event_id", "ts", "value")

    def runOnce(): Unit = {
      val ss = StreamOps.streamingSession(spark)
      val q = StatefulSessions.sessionsStream(ss, src, glob = "*.parquet")
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
    val starts1 = after1.groupBy("user_id")
      .agg(max("start_us").as("max_start"), count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(starts1.nonEmpty)

    // batch 2 (after restart): a later burst for some users — 3 days on
    val shifted = events.filter(col("user_id") % 5 === 0)
      .withColumn("ts", col("ts") + expr("INTERVAL 3 DAYS"))
      .withColumn("event_id", col("event_id") + 10000000L)
    shifted.coalesce(1).write.parquet(s"$src/part2")
    promote("part2")
    runOnce()
    val after2 = spark.read.parquet(out)

    // exactly-once: session identity (user_id, start_us) never duplicates
    // across a restart — the checkpoint replays nothing twice and the
    // content-derived key is stable under recovery
    assert(after2.groupBy("user_id", "start_us").count()
      .filter(col("count") > 1).isEmpty)
    // progress: batch-2 users gained sessions strictly later than batch 1
    val starts2 = after2.groupBy("user_id").agg(max("start_us").as("m"),
        count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val touched = starts2.keySet.filter(_ % 5 == 0).filter(starts1.contains)
    assert(touched.nonEmpty)
    touched.foreach { u =>
      assert(starts2(u)._1 > starts1(u)._1,
        s"user $u: max start ${starts2(u)._1} did not advance past ${starts1(u)._1}")
      assert(starts2(u)._2 > starts1(u)._2,
        s"user $u: session count did not grow across the restart")
    }
  }

  test("streaming SCD2 equals batch scd2_track EXACTLY (sentinel flush)") {
    // same drain discipline as the sessionizer: the sentinel advances the
    // watermark past every open run's timeout, so the replay closes the
    // history exactly as the batch gaps-and-islands compaction does —
    // including the final open interval per user (valid_to null).
    val streamed = StatefulSessions.streamScd2(spark, sfDir)
      .collect().map(_.toString).toSet
    val batch = graft.operators.OlapC.scd2Track(spark, sfDir)
      .collect().map(_.toString).toSet
    assert(streamed.nonEmpty)
    assert(streamed === batch,
      s"missing ${(batch -- streamed).take(3)} extra ${(streamed -- batch).take(3)}")
  }

  test("SCD2 state: version counter survives run closes; timeout flushes open run") {
    import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
    import org.apache.spark.api.java.Optional
    import StatefulSessions.{EvT, Scd2State, updateScd2}
    def ev(id: Long, tsUs: Long, t: String) =
      EvT(7L, id, tsUs, t, new java.sql.Timestamp(tsUs / 1000))
    // one batch, two attribute flips: the closed runs emit immediately and
    // the retained state carries version 3 — closes must NOT reset it
    val s1 = TestGroupState.create[Scd2State](
      Optional.empty[Scd2State](), GroupStateTimeout.EventTimeTimeout, 0L,
      Optional.of(1L), hasTimedOut = false)
    val closed = updateScd2(7L,
      Iterator(ev(1, 1000000L, "view"), ev(2, 2000000L, "view"),
        ev(3, 3000000L, "click"), ev(4, 4000000L, "view")), s1).toSeq
    assert(closed.map(r => (r.version, r.event_type, r.n_events)) ===
      Seq((1, "view", 2L), (2, "click", 1L)))
    assert(closed.map(_.valid_to_us) === Seq(Some(3000000L), Some(4000000L)))
    assert(s1.get === Scd2State(3, "view", 4000000L, 1L))
    // the watermark fires the timeout: the open run emits valid_to = null
    // and the key holds zero state afterwards
    val s2 = TestGroupState.create[Scd2State](
      Optional.of(Scd2State(3, "view", 4000000L, 1L)),
      GroupStateTimeout.EventTimeTimeout, 0L, Optional.of(999999999L),
      hasTimedOut = true)
    val open = updateScd2(7L, Iterator.empty, s2).toSeq
    assert(open.map(r => (r.version, r.valid_to_us, r.n_events)) ===
      Seq((3, None, 1L)))
    assert(s2.isRemoved)
  }

  test("timeout close removes per-user state entirely (bounded state store)") {
    import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
    import org.apache.spark.api.java.Optional
    import StatefulSessions.{Ev, SessionState, updateUser}
    // user has an open session; the watermark fires its timeout
    val s1 = TestGroupState.create[SessionState](
      Optional.of(SessionState(0L, 1000L, 2L, 300L)),
      GroupStateTimeout.EventTimeTimeout, 0L, Optional.of(999999L),
      hasTimedOut = true)
    val closed = updateUser(7L, Iterator.empty, s1).toSeq
    assert(closed.map(_.start_us) === Seq(0L))
    assert(closed.head.session_value === 3.0)
    // no residue: the key holds ZERO state after the close — an idle user
    // costs nothing for the lifetime of the stream
    assert(s1.isRemoved)
    // a later in-watermark event simply opens a fresh session from scratch
    val s2 = TestGroupState.create[SessionState](
      Optional.empty[SessionState](), GroupStateTimeout.EventTimeTimeout, 0L,
      Optional.of(999999L), hasTimedOut = false)
    val ev = Ev(7L, 1L, 10000000000L, 100L, new java.sql.Timestamp(10000000L))
    assert(updateUser(7L, Iterator(ev), s2).toSeq.isEmpty)
    assert(s2.get.n === 1L && s2.get.start_us === 10000000000L)
  }

  test("native session_window drain equals the custom state machine AND " +
      "the batch sessionizer (B73 == B15 == B11)") {
    val native = StatefulSessions.streamSessionsNative(spark, sfDir)
      .collect().map(_.toString)
    val custom = StatefulSessions.streamSessions(spark, sfDir)
      .collect().map(_.toString)
    val batch = graft.operators.OlapB.eventsSessionize(spark, sfDir)
      .collect().map(_.toString)
    assert(native.nonEmpty && native.toSeq === batch.toSeq)
    assert(custom.toSeq === batch.toSeq)
  }

  test("transformWithState drain equals the batch sessionizer — the " +
      "state-v2 processor is the THIRD implementation pinned to one " +
      "oracle (B87 == B15 == B73 == B11)") {
    val tws = StatefulSessions.streamSessionsTws(spark, sfDir)
      .collect().map(_.toString)
    val batch = graft.operators.OlapB.eventsSessionize(spark, sfDir)
      .collect().map(_.toString)
    assert(tws.nonEmpty && tws.toSeq === batch.toSeq)
  }
}
