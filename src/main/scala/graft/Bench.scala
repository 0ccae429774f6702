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
    // Per-query PROCESS CPU time alongside wall time: on an idle
    // machine a local[32] query's cpu/wall ratio is ≥~1 (parallel
    // sections push it well above); when another process steals cores,
    // wall inflates while our process cpu doesn't — so a run where many
    // queries land below ~0.5 is machine-detectably contaminated (the
    // r6 failure mode: a concurrent driver JVM inflated p05 by 14×).
    // Reported, not enforced: a legitimately I/O- or driver-bound query
    // can sit below the line, so the consumer applies the >10%-of-
    // queries judgment, not this harness.
    val osBean = java.lang.management.ManagementFactory.getOperatingSystemMXBean
      .asInstanceOf[com.sun.management.OperatingSystemMXBean]
    def timeOnce(name: String,
        fn: (SparkSession, String) => org.apache.spark.sql.DataFrame)
        : (Double, Double) = {
      val c0 = osBean.getProcessCpuTime
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
      val c = (osBean.getProcessCpuTime - c0) / 1e9
      spark.catalog.clearCache() // isolate queries: no cross-query caches
      (if (ok) t else -1.0, c)
    }
    val results = SparkEntry.orderedQueries.map { case (name, fn) =>
      val (w1, c1) = timeOnce(name, fn)
      val (best, cpu) =
        if (w1 < 0) (w1, c1) // failed: don't re-run, keep the sentinel
        else {
          val (w2, c2) = timeOnce(name, fn)
          if (w2 < 0) (w2, c2)
          else if (w2 < w1) (w2, c2)
          else (w1, c1) // cpu travels with the run whose wall we report
        }
      (name, best, cpu)
    }
    val qs = results.map { case (k, v, _) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val cpus_ = results.map { case (k, _, c) => s"\"" + k + "\":" + c }
      .mkString("{", ",", "}")
    val suspect = results.collect {
      case (k, w, c) if w > 0.2 && c / w < 0.5 => "\"" + k + "\""
    }.mkString("[", ",", "]")
    val total = results.collect { case (_, v, _) if v >= 0 => v }.sum
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"cpu":$cpus_,"suspect_contended":$suspect,"failed":$failedJson,"sf":"$sfDir"}"""
    java.nio.file.Files.write(java.nio.file.Paths.get("bench_results.json"),
      (line + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    println(line)
    spark.stop()
    if (failed.nonEmpty) sys.exit(1)
  }
}
