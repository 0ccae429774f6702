package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: times every SparkEntry query at SPARK_GRAFT_SF_DIR
  * and prints one JSON line {"metric":"total",...,"queries":{...}}.
  *
  * Measurement discipline (numbers are only comparable across rounds if
  * the harness is deterministic):
  *   - queries run in DECLARATION order (SparkEntry.orderedQueries), so
  *     adding a query never reshuffles which predecessors warmed the JIT
  *     for which successors;
  *   - each query is timed as the BETTER OF TWO runs — the first run at
  *     full SF still absorbs whatever C2-tier compilation the small-SF
  *     warmup didn't trigger (measured: cold-vs-warm deltas of 4s on
  *     single-shuffle groupBys), the second run measures the plan;
  *   - the results line is also written to bench_results.json BEFORE
  *     being printed, so a truncated stdout capture (the r5 failure
  *     mode: 7 of 69 timings lost to a tail cut) can't lose data;
  *   - caches are cleared between runs — operators persist() shared
  *     intermediates and a warm cache would measure memory reads.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt
    val spark = Sessions.local(cpus)
    // JIT/classloader warmup at the sf0.01 SIBLING of the target dir
    // (not a hardcoded absolute path — on any other layout that path is
    // absent, every warmup fails and the first timed query silently
    // re-absorbs 5-7s of interpreter/C1 time). Falls back to the target
    // dir itself, which still warms (just slower). 6k-row sf0.001
    // inputs don't push the generated code past C2 thresholds.
    val warmDir = {
      val p = java.nio.file.Paths.get(sfDir)
      Option(p.getParent).map(_.resolve("sf0.01"))
        .filter(java.nio.file.Files.isDirectory(_))
        .map(_.toString).getOrElse(sfDir)
    }
    SparkEntry.orderedQueries.foreach { case (name, f) =>
      try {
        f(spark, warmDir).count()
      } catch {
        case e: Throwable =>
          System.err.println(s"warmup failed for $name: $e")
      } finally spark.catalog.clearCache() // operators persist intermediates
    }
    // A failed query is a FAILURE, not a slow query: it records a -1
    // sentinel (never its time-to-crash), is excluded from the total,
    // lands in the failed list, and forces a nonzero exit.
    val failed = scala.collection.mutable.ListBuffer[String]()
    def timeOnce(name: String,
        fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
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
      if (ok) t else -1.0
    }
    val results = SparkEntry.orderedQueries.map { case (name, fn) =>
      val first = timeOnce(name, fn)
      val best =
        if (first < 0) first // failed: don't re-run, keep the sentinel
        else {
          val second = timeOnce(name, fn)
          if (second < 0) second else math.min(first, second)
        }
      name -> best
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.collect { case (_, v) if v >= 0 => v }.sum
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$failedJson,"sf":"$sfDir"}"""
    java.nio.file.Files.write(java.nio.file.Paths.get("bench_results.json"),
      (line + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    println(line)
    spark.stop()
    if (failed.nonEmpty) sys.exit(1)
  }
}
