package graft.tools

/** Post-execution plan probe: run named queries to completion (noop
  * sink) and print the FINAL adaptive plan, so runtime-only effects —
  * ReusedExchange / ReusedSubquery / AQEShuffleRead — are visible
  * (the initial explain cannot show them). Usage:
  * `runMain graft.tools.R13Probe <q1,q2,...>` at SPARK_GRAFT_SF_DIR. */
object R13Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.Sessions.local(32)
    args(0).split(',').map(_.trim).filter(_.nonEmpty).foreach { n =>
      val df = graft.SparkEntry.queries(n)(spark, sfDir)
      // collect(), not a sink write: a write wraps the frame in its own
      // command QueryExecution, leaving df.queryExecution UNEXECUTED —
      // its plan would print in initial (no stages, no reuse) state.
      df.collect()
      val p = df.queryExecution.executedPlan.toString
      println(s"=== $n post-execution plan ===")
      println(p)
      println(s"=== $n reuse summary: ReusedExchange=" +
        "ReusedExchange".r.findAllIn(p).size +
        " ShuffleQueryStage=" + "ShuffleQueryStage".r.findAllIn(p).size +
        " Exchange=" + "Exchange".r.findAllIn(p).size)
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
