package graft.streaming

import org.apache.spark.sql.DataFrame

/** One parquet file per arrival wave with a pinned mtime — the file
  * source orders batches by modification time, so with
  * `maxFilesPerTrigger=1` each wave is one micro-batch. ONE copy shared
  * by every replay spec (was five near-identical inline copies — r12
  * self-review: a change to the wave-ordering contract must land once).
  */
trait WaveStaging { this: org.scalatest.Assertions =>

  def writeWave(srcDir: java.nio.file.Path, df: DataFrame,
      name: String, mtime: Long): Unit = {
    val stage = new java.io.File(srcDir.toFile, s"_stage_$name")
    df.coalesce(1).write.mode("overwrite").parquet(stage.getPath)
    val part = stage.listFiles()
      .find(f => f.getName.startsWith("part-") &&
        f.getName.endsWith(".parquet")).get
    val dest = new java.io.File(srcDir.toFile, name)
    java.nio.file.Files.move(part.toPath, dest.toPath)
    assert(dest.setLastModified(mtime))
  }
}
