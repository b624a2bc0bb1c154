package graft

import org.apache.spark.sql.types.{ArrayType, MapType, StructType}

/** Regression guards over the ENTIRE driver surface:
  *
  *  - no query plans a BroadcastNestedLoopJoin / CartesianProduct unless it
  *    is one of the intentional broadcast-small-side scoring cross joins
  *    (ANN / embedding pairs / multimodal features);
  *  - every ORACLE-CHECKED query emits only atomic columns — the driver's
  *    comparator orders rows with pandas, which cannot sort array/struct
  *    cells (the round-1 etl_receipts_nested failure mode).
  */
class PlanGuardSpec extends SparkSpec {

  // stream_* execute their query on construction; the batch plans are what
  // this guard is about
  private def batchQueries = SparkEntry.queries.filterNot(_._1.startsWith("stream"))

  private val crossJoinByDesign = Set(
    "ann_brute_topk", "ann_lsh_topk", "ann_ivf_topk",
    "dedup_embedding", "multimodal_similar", "embed_stats")

  test("no unintended nested-loop or cartesian joins anywhere") {
    val offenders = batchQueries.keys.toSeq.sorted
      .filterNot(crossJoinByDesign)
      .flatMap { name =>
        val plan = SparkEntry.queries(name)(spark, sfDir)
          .queryExecution.executedPlan.toString
        if (plan.contains("BroadcastNestedLoopJoin") ||
          plan.contains("CartesianProduct")) Some(name) else None
      }
    assert(offenders.isEmpty, s"nested-loop plans in: $offenders")
  }

  test("oracle-checked outputs carry only atomic (comparator-safe) columns") {
    val offenders = SparkEntry.oracleSql.keys.toSeq.sorted
      .filterNot(_.startsWith("stream"))
      .flatMap { name =>
        SparkEntry.queries(name)(spark, sfDir).schema.fields.collect {
          case f if f.dataType.isInstanceOf[ArrayType] ||
            f.dataType.isInstanceOf[StructType] ||
            f.dataType.isInstanceOf[MapType] => s"$name.${f.name}"
        }
      }
    assert(offenders.isEmpty, s"non-atomic oracle columns: $offenders")
  }
}
