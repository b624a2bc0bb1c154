package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** B119/B120/B121/B123/B124: the event-analytics streaming twins. All
  * are zero-state recompute-at-read machines over SHRINKING per-batch
  * partials with a named merge algebra — B119's distinct (user, week)
  * set monoid, B120's (user, week) grid sum monoid, B121's
  * interval-union semilattice, B123's bottom-k sketch semilattice,
  * B124's distinct (user, day) set monoid — so an ARBITRARY wave split
  * of the event feed (one that deliberately splits WITHIN users,
  * putting a user's weeks/days/islands in different batches) must
  * drain to exactly the batch board. */
class CohortStreamSpec extends SparkSpec with WaveStaging {

  /** events split by event_id % 3 — cohort-defining first events,
    * purchases, and island fragments land in DIFFERENT batches. */
  private lazy val wavesDir = {
    val ev = graft.sources.Tables(spark, sfDir).events
      .select(col("user_id"), col("ts"), col("event_id"),
        col("event_type"), col("value"))
    val d = java.nio.file.Files.createTempDirectory("cohort_waves")
    val t0 = System.currentTimeMillis() - 100000
    (0 until 3).foreach { i =>
      writeWave(d, ev.filter(col("event_id") % 3 === i),
        s"w$i.parquet", t0 + i * 1000)
    }
    d
  }

  private def waveStream() = {
    val schema = spark.read
      .option("pathGlobFilter", "w*.parquet")
      .parquet(wavesDir.toString).schema
    spark.readStream.schema(schema)
      .option("pathGlobFilter", "w*.parquet")
      .option("maxFilesPerTrigger", 1).parquet(wavesDir.toString)
  }

  test("B119: a within-user 3-way wave split drains to the exact batch " +
      "retention triangle") {
    val got = StreamOps.retentionStreamOn(spark,
      waveStream().select(col("user_id"), col("ts")))
      .collect().map(_.toString)
    val batch = graft.operators.OlapC.retention(spark, sfDir)
      .collect().map(_.toString)
    assert(got.toSeq === batch.toSeq)
  }

  test("B120: a within-user 3-way wave split drains to the exact batch " +
      "LTV triangle (counts, structural distinct buyers, DECIMAL mass)") {
    val got = StreamOps.userLtvStreamOn(spark, waveStream()
      .select(col("user_id"), col("ts"), col("event_type"), col("value")))
      .collect().map(_.toString)
    val batch = graft.operators.OlapC.userLtv(spark, sfDir)
      .collect().map(_.toString)
    assert(got.toSeq === batch.toSeq)
  }

  test("B121: a within-user 3-way wave split drains to the exact batch " +
      "coverage board (islands straddling batches fuse at read)") {
    val got = StreamOps.coverageStreamOn(spark, waveStream()
      .select(col("user_id"), col("ts"), col("event_id")))
      .collect().map(_.toString)
    val batch = graft.operators.OlapC.intervalCoverage(spark, sfDir)
      .collect().map(_.toString)
    assert(got.toSeq === batch.toSeq)
  }

  test("B123: a within-segment wave split of sketch partials folds to " +
      "the exact batch theta board (bottom-k is the merge)") {
    val got = StreamOps.thetaStreamOn(spark, waveStream()
      .select(col("event_type"), col("user_id")))
      .collect().map(_.toString)
    val batch = graft.operators.OlapC.distinctThetaOps(spark, sfDir)
      .collect().map(_.toString)
    assert(got.toSeq === batch.toSeq)
  }

  test("B124: a within-user 3-way wave split drains to the exact batch " +
      "streak board (runs straddling batches fuse at read)") {
    val got = StreamOps.streaksStreamOn(spark,
      waveStream().select(col("user_id"), col("ts")))
      .collect().map(_.toString)
    val batch = graft.operators.OlapD.activityStreaks(spark, sfDir)
      .collect().map(_.toString)
    assert(got.toSeq === batch.toSeq)
  }

  test("B121 semilattice law: re-sweeping pre-merged wave islands == " +
      "sweeping the raw intervals, on seeded overlapping intervals") {
    import spark.implicits._
    // deterministic pseudo-random intervals: dense enough that islands
    // regularly straddle the wave split
    val iv = (0 until 400).map { i =>
      val u = i % 7L
      val s = ((i * 2654435761L) % 10000L) * 100L
      (u, s, s + 300L + (i % 5) * 250L, i.toLong)
    }.toDF("user_id", "s_us", "e_us", "seq")
    val (w1, w2) = (iv.filter($"seq" % 2 === 0), iv.filter($"seq" % 2 === 1))
    import graft.operators.OlapC.{mergedIslandsOn, coverageBoardOn}
    val pre = mergedIslandsOn(w1).unionByName(mergedIslandsOn(w2))
      .withColumn("seq", col("e_us"))
    val got = coverageBoardOn(mergedIslandsOn(pre)).collect().map(_.toString)
    val direct = coverageBoardOn(mergedIslandsOn(iv)).collect().map(_.toString)
    assert(got.toSeq === direct.toSeq,
      "interval union must be associative/commutative/idempotent")
  }
}
