package graft.tools

/** Write `.explain("formatted")` output for named queries to files —
  * `runMain graft.tools.PlanFiles <outDir> <suffix> <q1,q2,...>` at
  * SPARK_GRAFT_SF_DIR. Captures the initial AQE plan without running
  * the query (same loupe as PlanDump, but formatted + file-per-query
  * so before/after plan diffs can be committed). */
object PlanFiles {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val outDir = java.nio.file.Paths.get(args(0))
    java.nio.file.Files.createDirectories(outDir)
    val suffix = args(1)
    val names = args(2).split(',').map(_.trim).filter(_.nonEmpty)
    val spark = graft.Sessions.local(32)
    names.foreach { n =>
      val df = graft.SparkEntry.queries(n)(spark, sfDir)
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.write(outDir.resolve(s"${n}_$suffix.txt"),
        txt.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      println(s"PLAN $n -> ${outDir.resolve(s"${n}_$suffix.txt")}")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
