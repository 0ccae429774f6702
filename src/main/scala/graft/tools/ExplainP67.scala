package graft.tools
object ExplainP67 {
  def main(args: Array[String]): Unit = {
    val spark = graft.Sessions.local(8)
    val df = graft.SparkEntry.queries("p67_mmr_rerank")(spark, "/root/testdata/sf0.001")
    val plan = df.queryExecution.executedPlan.toString
    println("EXCHANGES=" + "Exchange".r.findAllIn(plan).length)
    println("INMEM=" + "InMemory".r.findAllIn(plan).length)
    println("PLANLINES=" + plan.split("\n").length)
    val t0 = System.nanoTime(); df.count(); println("COUNT1=" + (System.nanoTime()-t0)/1e9)
    val t1 = System.nanoTime(); df.count(); println("COUNT2=" + (System.nanoTime()-t1)/1e9)
    spark.stop()
  }
}
