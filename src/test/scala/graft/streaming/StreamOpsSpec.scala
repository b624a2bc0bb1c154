package graft.streaming

import graft.SparkSpec
import graft.operators.OlapB

class StreamOpsSpec extends SparkSpec {

  test("streamed windowed agg equals the batch windowed agg") {
    val streamed = StreamOps.streamEvents(spark, sfDir)
      .collect().map(_.toString).sorted
    val batch = OlapB.eventsWindowed(spark, sfDir)
      .withColumnRenamed("n", "n") // same shape apart from value_sum
      .collect().map(_.toString).sorted
    assert(streamed.length === batch.length)
    assert(streamed.toSeq === batch.toSeq)
  }

  test("stream query restarts cleanly (idempotent memory sink)") {
    val a = StreamOps.streamEvents(spark, sfDir).count()
    val b = StreamOps.streamEvents(spark, sfDir).count()
    assert(a === b)
  }
}
