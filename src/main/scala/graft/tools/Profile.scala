package graft.tools

import graft.{Sessions, SparkEntry}

/** Scratch profiler: time named queries (args) at SPARK_GRAFT_SF_DIR,
  * optionally printing the formatted plan with -explain. */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val explain = args.contains("-explain")
    val names = args.filterNot(_.startsWith("-"))
    val spark = Sessions.local(32)
    names.foreach { n =>
      // time construction + execution: iterative operators (CC loops)
      // run eagerly while the DataFrame is being BUILT, so timing only
      // count() would miss them (Bench times both; match it).
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(n)(spark, sfDir)
      val cnt = df.count()
      println(f"PROFILE $n rows=$cnt t=${(System.nanoTime() - t0) / 1e9}%.2fs")
      if (explain) df.explain("formatted")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
