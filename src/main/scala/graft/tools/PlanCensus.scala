package graft.tools
import graft.{Sessions, SparkEntry}
/** Ad-hoc plan census: per query, count wide/physical-op occurrences in
  * the formatted plan — a quick smell test for unexpected shapes. */
object PlanCensus {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local(8)
    val sf = "/root/testdata/sf0.001"
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val p = fn(spark, sf).queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
        def c(re: String) = ("(?m)^\\(\\d+\\) " + re).r.findAllIn(p).size
        val bnl = c("BroadcastNestedLoopJoin")
        val cart = c("CartesianProduct")
        println(f"CENSUS $name%-28s ex=${c("Exchange\\b")} smj=${c("SortMergeJoin")} bhj=${c("BroadcastHashJoin")} bnl=$bnl cart=$cart sort=${c("Sort\\b")} win=${c("Window\\b")}")
      } catch { case e: Throwable => println(s"CENSUS $name ERR ${e.getMessage.take(80)}") }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
