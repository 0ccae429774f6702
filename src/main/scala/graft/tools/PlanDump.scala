package graft.tools

/** Plan-shape iteration aid: print a declared query's physical plan
  * (the initial AQE plan) without running it — `runMain
  * graft.tools.PlanDump <query_name> <sfDir>`. PlanSpec pins the
  * contracts; this is the loupe for finding what to pin. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = graft.Sessions.local(4)
    val df = graft.SparkEntry.queries(args(0))(spark, args(1))
    println(df.queryExecution.executedPlan.toString)
    spark.stop()
  }
}
