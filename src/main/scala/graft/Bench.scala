package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt
    val spark = Sessions.local(cpus)
    // JIT/classloader warmup at sf0.01 (not the smallest SF): each
    // query's generated code is unique, and 6k-row inputs don't push
    // its hot loops past the C2 compile thresholds — measured at sf0.1,
    // an un-warmed query's first run pays 5-7s of interpreter/C1 time
    // that a sf0.01 warmup (60k rows) eliminates. Warmup failures are
    // non-fatal (the timed run surfaces them) but still logged.
    SparkEntry.queries.foreach { case (name, f) =>
      try {
        f(spark, "/root/testdata/sf0.01").count()
      } catch {
        case e: Throwable =>
          System.err.println(s"warmup failed for $name: $e")
      } finally spark.catalog.clearCache() // operators persist intermediates
    }
    // A failed query is a FAILURE, not a slow query: it records a -1
    // sentinel (never its time-to-crash), is excluded from the total,
    // lands in the failed list, and forces a nonzero exit.
    val failed = scala.collection.mutable.ListBuffer[String]()
    val results = SparkEntry.queries.map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok =
        try { fn(spark, sfDir).count(); true } catch {
          case e: Throwable =>
            failed += name
            System.err.println(s"BENCH FAILURE in $name:")
            e.printStackTrace()
            false
        }
      val t = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache() // isolate queries: no cross-query caches
      name -> (if (ok) t else -1.0)
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.values.filter(_ >= 0).sum
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$failedJson,"sf":"$sfDir"}""")
    spark.stop()
    if (failed.nonEmpty) sys.exit(1)
  }
}
