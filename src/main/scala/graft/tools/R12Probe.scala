package graft.tools

import graft.{Sessions, Tables}
import graft.functions.TextFns
import org.apache.spark.sql.functions._

/** Round-12 optimization scratch probe: steady-state phase timing for
  * the bench's most expensive queries (p41 ingest round, p72b DSIR
  * select). Run alone at SPARK_GRAFT_SF_DIR. Unlike TriageProbe this
  * times the MEMOIZED path (index already built) — exactly what the
  * bench's best-of-two reports. */
object R12Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.local(32)
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"R12 $label%-36s ${(System.nanoTime() - t0) / 1e9}%.2fs")
      r
    }
    // warm the whole p41/p72b path once (index build + JIT)
    t("warm p41 (cold: index build)")(
      graft.SparkEntry.queries("p41_ingest_triage")(spark, sfDir).count())
    spark.catalog.clearCache()
    t("warm p72b")(
      graft.SparkEntry.queries("p72b_dsir_select")(spark, sfDir).count())
    spark.catalog.clearCache()

    for (round <- 1 to 2) {
      println(s"--- round $round")
      // ---- p41 phases, steady state ------------------------------------
      val docs = Tables.df(spark, sfDir, "documents")
        .select(col("doc_id"), col("text"))
      val corpus = docs.filter(col("doc_id") % 3 =!= 0)
      val batch = docs.filter(col("doc_id") % 3 === 0)
      val evalDocs = docs.filter(col("doc_id") % 97 === 0).select(col("text"))
      t("p41 fp scan (md5 corpus)")(
        corpus.agg(count(lit(1)).cast("long"),
          sum(TextFns.hash32(concat_ws("|", col("doc_id").cast("string"),
            md5(coalesce(col("text"), lit("")))))).cast("long")).head())
      t("p41 memoized check")(
        (Seq("graft_p41_fp", "graft_p41_meta").forall(
          spark.catalog.tableExists) &&
          spark.table("graft_p41_fp").head(1).nonEmpty).toString)
      val sketch = t("p41 eval sketch")(
        graft.operators.Decontaminate.gramSketch(
          graft.operators.Decontaminate
            .evalGrams(evalDocs, "text", 8).select(col("g")),
          estimatedGrams = 1L << 18))
      t("p41 triage")(graft.operators.Ingest.triage(batch, "doc_id", "text",
        graft.operators.Ingest.Config("graft_p41", Some(sketch),
          bloomN = 8, bloomMinHits = 2, minTokens = 30,
          num = 7, den = 10, maxDocFreq = 20)).count())
      spark.catalog.clearCache()
      t("p41 full")(
        graft.SparkEntry.queries("p41_ingest_triage")(spark, sfDir).count())
      spark.catalog.clearCache()

      // ---- p72/p72b phases ----------------------------------------------
      // dsirWeights eagerly collects both histograms at CONSTRUCTION
      // (collectDsirHist), so construction time = the two histogram
      // passes and count() = the scoring pass.
      val docsAll = Tables.df(spark, sfDir, "documents")
      val B = 512 // Pipeline.DsirBuckets mirror: keep in sync if probed
      val w = t("p72 construct (hist raw + en)")(
        graft.operators.Corpus.dsirWeights(docsAll,
          docsAll.filter(col("lang") === "en"), "doc_id", "text", B))
      t("p72 score pass")(w.count())
      spark.catalog.clearCache()
      t("p72b full")(
        graft.SparkEntry.queries("p72b_dsir_select")(spark, sfDir).count())
      spark.catalog.clearCache()
      t("p72 full")(
        graft.SparkEntry.queries("p72_dsir_weights")(spark, sfDir).count())
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
