package graft
import org.apache.spark.sql.SparkSession

/** Dev tool: dump executed-plan summaries for the plan audit docs. */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = "/root/testdata/sf0.01"
    val spark = GraftSession.local(8)
    for (name <- args) {
      val df = SparkEntry.queries(name)(spark, sfDir)
      println(s"==== $name ====")
      val plan = df.queryExecution.executedPlan.toString
      val nEx = plan.linesIterator.count(
        _.replaceAll("^[^A-Za-z]*", "").startsWith("Exchange"))
      println(s"[exchanges] $name = $nEx")
      println(plan.linesIterator.take(40).mkString("\n"))
    }
    spark.stop()
  }
}
