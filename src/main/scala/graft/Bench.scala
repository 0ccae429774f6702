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
  *     intermediates and a warm cache would measure memory reads;
  *   - a query whose best-of-two still lands >2x its recorded floor gets
  *     ONE extra attempt after System.gc() + settle. Rationale (r7): the
  *     driver's run showed three phantom >2x entries (p39 4.3x, p40 2.3x,
  *     p12 2.1x) that a clean rerun measured at floor — same-JVM GC/JIT
  *     pressure bleeding across queries from an earlier cold index build.
  *     That mode burns cores inside our own process, so cpu/wall stays
  *     >=1 and suspect_contended can't see it; the gc+retry kills it at
  *     bounded cost (only already-slow queries pay the third run);
  *   - per-query gc_ms (GarbageCollectorMXBean collection-time delta of
  *     the reported run) makes core-BURNING contamination machine-
  *     detectable the way cpu/wall makes core-STEALING detectable: a
  *     query at 2x floor whose gc_ms rivals its wall time is a GC-bleed
  *     artifact, not a plan regression.
  */
object Bench {
  /** Per-query floors, sf0.1 local[32] idle-machine best-of-two. Used
    * ONLY to decide whether a query earned the gc+retry third attempt —
    * never to alter a timing. A query absent never retries; its first
    * recorded floor lands at the next re-record.
    *
    * Loaded from `bench_floors.json` (cwd — the same place the harness
    * writes `bench_results.json`), NOT hard-coded: floors are
    * measurements of a specific machine + data generation, and the r8
    * testdata regeneration showed that baking them into source goes
    * stale silently (three entries misfired the 2× adjudication).
    * Re-recording is now a data-file update — one clean idle run's
    * `queries` object pasted over — with no source edit to drift.
    * A missing/unreadable file degrades to "no floors": every query
    * runs best-of-two, nothing retries — same behavior a new query
    * always had. The parse is a deliberately tiny regex over the flat
    * {"name":sec,...} shape (no JSON dependency for four lines of
    * data). */
  private val floors: Map[String, Double] = {
    val p = java.nio.file.Paths.get("bench_floors.json")
    if (!java.nio.file.Files.isReadable(p)) Map.empty
    else {
      val txt = new String(java.nio.file.Files.readAllBytes(p),
        java.nio.charset.StandardCharsets.UTF_8)
      """"([^"]+)"\s*:\s*([0-9]+(?:\.[0-9]+)?)""".r
        .findAllMatchIn(txt)
        .map(m => m.group(1) -> m.group(2).toDouble).toMap
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt
    // local-iteration filter, Verify's SPARK_GRAFT_ONLY twin (the
    // driver never sets it): time only the named queries — for
    // re-measuring one suspect entry in isolation without the warm-up
    // history of 100 predecessors
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSet)
    def selected = SparkEntry.orderedQueries
      .filter { case (n, _) => only.forall(_.contains(n)) }
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
    selected.foreach { case (name, f) =>
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
    val gcBeans = java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
    def gcMillis(): Long = {
      var t = 0L
      gcBeans.forEach(b => t += math.max(0L, b.getCollectionTime))
      t
    }
    // (wall sec, process-cpu sec, gc ms) for one run of one query.
    def timeOnce(name: String,
        fn: (SparkSession, String) => org.apache.spark.sql.DataFrame)
        : (Double, Double, Long) = {
      val g0 = gcMillis()
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
      val g = gcMillis() - g0
      spark.catalog.clearCache() // isolate queries: no cross-query caches
      (if (ok) t else -1.0, c, g)
    }
    val results = selected.map { case (name, fn) =>
      val r1 = timeOnce(name, fn)
      val best2 =
        if (r1._1 < 0) r1 // failed: don't re-run, keep the sentinel
        else {
          val r2 = timeOnce(name, fn)
          if (r2._1 < 0) r2
          else if (r2._1 < r1._1) r2
          else r1 // cpu/gc travel with the run whose wall we report
        }
      // gc+retry: the third attempt exists to clear same-JVM pressure a
      // predecessor left behind, so it only fires when the query is both
      // slow vs its floor AND had a floor to compare against.
      val bestAll = floors.get(name) match {
        case Some(f) if best2._1 > 2 * f =>
          System.gc()
          Thread.sleep(250)
          val r3 = timeOnce(name, fn)
          if (r3._1 >= 0 && r3._1 < best2._1) r3 else best2
        case _ => best2
      }
      (name, bestAll._1, bestAll._2, bestAll._3)
    }
    // Locale-pinned 2-decimal formatting: raw Double.toString emits up
    // to 17 significant digits per timing (sub-microsecond noise), which
    // bloated the r9 results line to ~10 KB — and the harness that
    // collects this output keeps only the LAST 2000 characters of
    // stdout, so the r9 per-query timings were cut out of the recorded
    // artifact entirely. 10 ms resolution is already below run-to-run
    // noise on every query here.
    def fmt(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.2f", Double.box(v))
    val qs = results.map { case (k, v, _, _) => s"\"" + k + "\":" + fmt(v) }
      .mkString("{", ",", "}")
    val cpus_ = results.map { case (k, _, c, _) => s"\"" + k + "\":" + fmt(c) }
      .mkString("{", ",", "}")
    val gcs = results.map { case (k, _, _, g) => s"\"" + k + "\":" + g }
      .mkString("{", ",", "}")
    val suspect = results.collect {
      case (k, w, c, _) if w > 0.2 && c / w < 0.5 => "\"" + k + "\""
    }.mkString("[", ",", "]")
    // The gc-side twin of suspect_contended: >0.2 s wall with more than
    // half of it inside collections. Reported, not enforced, same as cpu.
    val suspectGc = results.collect {
      case (k, w, _, g) if w > 0.2 && g / 1e3 > 0.5 * w => "\"" + k + "\""
    }.mkString("[", ",", "]")
    val total = results.collect { case (_, v, _, _) if v >= 0 => v }.sum
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val line =
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":$qs,"cpu":$cpus_,"gc_ms":$gcs,"suspect_contended":$suspect,"suspect_gc":$suspectGc,"failed":$failedJson,"sf":"$sfDir"}"""
    java.nio.file.Files.write(java.nio.file.Paths.get("bench_results.json"),
      (line + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    println(line)
    // Compact summary as the LAST stdout line, size-capped so the
    // whole line survives a 2000-character tail capture (the recorded
    // r5-r9 artifacts all have parsed=null and the r9 tail contains no
    // timings at all — the full line above is ~100 queries wide and can
    // never fit). Slowest-first greedy fill: the omitted entries are by
    // construction the fastest, and their count + summed seconds are
    // reported so nothing is silently dropped; the full map is always
    // in bench_results.json (cwd) and in the full line above.
    val budget = 1800
    val ordered = results.sortBy { case (_, v, _, _) => -v }
    val head =
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec","sf":"$sfDir","n_queries":${results.size},"failed":$failedJson,"suspect_contended":$suspect,"suspect_gc":$suspectGc,"detail":"bench_results.json","""
    val tailFixedMax = // worst-case closing: omitted count + seconds
      s""""queries_omitted":${results.size},"omitted_sec":${fmt(total)}}""".length
    val kept = scala.collection.mutable.ListBuffer[String]()
    var used = head.length + """"queries":{},""".length + tailFixedMax
    var keptN = 0
    var full = false // strict prefix: omitted = exactly the fastest tail
    ordered.foreach { case (k, v, _, _) =>
      val piece = "\"" + k + "\":" + fmt(v)
      if (!full && used + piece.length + 1 <= budget) {
        kept += piece; used += piece.length + 1; keptN += 1
      } else full = true
    }
    val omitted = ordered.drop(keptN)
    val omittedSec =
      omitted.collect { case (_, v, _, _) if v >= 0 => v }.sum
    val compact = head + "\"queries\":" + kept.mkString("{", ",", "}") +
      s""","queries_omitted":${omitted.size},"omitted_sec":${fmt(omittedSec)}}"""
    println(compact)
    spark.stop()
    if (failed.nonEmpty) sys.exit(1)
  }
}
