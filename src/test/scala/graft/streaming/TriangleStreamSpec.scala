package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** B117 `stream_triangle`: canonical-edge-count partials are a pure SUM
  * monoid, so ANY wave split of the lineitem feed must merge to the
  * batch trade graph, and the read-side strong-edge cut + wedge join
  * must land exactly B43's board (the cut is a function of the FINAL
  * weights — arrival order cannot matter). */
class TriangleStreamSpec extends SparkSpec with WaveStaging {

  test("an arbitrary 3-way wave split of lineitem drains to the exact " +
      "batch triangle board") {
    val li = graft.sources.Tables(spark, sfDir).lineitem
      .select(col("l_orderkey"), col("l_suppkey"))
    val srcDir = java.nio.file.Files.createTempDirectory("tri_waves")
    val t0 = System.currentTimeMillis() - 100000
    (0 until 3).foreach { i =>
      writeWave(srcDir, li.filter(col("l_orderkey") % 3 === i),
        s"w$i.parquet", t0 + i * 1000)
    }
    val raw = spark.readStream
      .schema(li.schema)
      .option("pathGlobFilter", "w*.parquet")
      .option("maxFilesPerTrigger", 1).parquet(srcDir.toString)
    val got = StreamOps.triangleStreamOn(spark, sfDir, raw)
      .collect().map(_.toString)
    val batch = graft.operators.OlapD.triangleCount(spark, sfDir)
      .collect().map(_.toString)
    assert(got.toSeq === batch.toSeq,
      "wave-split drain must equal the batch board row for row")
  }
}
