package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {

  test("media table: binary payload with typed metadata columns") {
    val m = Multimodal.mediaTable(spark, sfDir)
    assert(m.schema("media").dataType === org.apache.spark.sql.types.BinaryType)
    val r = m.limit(3).collect()
    r.foreach { row =>
      val bytes = row.getAs[Array[Byte]]("media")
      assert(new String(bytes.take(4), "UTF-8") === Multimodal.Magic)
    }
  }

  test("decode recovers header metadata exactly") {
    val media = Multimodal.mediaTable(spark, sfDir)
      .select("media_id", "fmt", "meta_width", "meta_height")
      .orderBy("media_id").limit(20).collect()
    val decoded = Multimodal.multimodalMeta(spark, sfDir)
      .orderBy("media_id").limit(20).collect()
    media.zip(decoded).foreach { case (m, d) =>
      assert(m.getLong(0) === d.getLong(0))
      assert(m.getString(1) === d.getString(1))
      assert(m.getInt(2) === d.getInt(2))
      assert(m.getInt(3) === d.getInt(3))
    }
  }

  test("decode is deterministic and emits bounded features") {
    val a = Multimodal.multimodalMeta(spark, sfDir).collect()
    val b = Multimodal.multimodalMeta(spark, sfDir).collect()
    assert(a.map(_.toString).toSeq === b.map(_.toString).toSeq)
    a.take(50).foreach { r =>
      (0 until 4).foreach { k =>
        val f = r.getDouble(r.fieldIndex(s"feat$k"))
        assert(f >= 0.0 && f < 1.0)
      }
    }
  }
}
