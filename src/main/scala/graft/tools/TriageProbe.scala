package graft.tools

import graft.{Sessions, Tables}
import graft.operators.{Decontaminate, Ingest, ShingleIndex}
import org.apache.spark.sql.functions._

/** Stage-level timing for the p41 ingest round: where does the wall
  * time go — sketch build, gate maps, the indexed pair scan, or the
  * fate join? Run at SPARK_GRAFT_SF_DIR (alone on the machine). */
object TriageProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.local(32)
    import spark.implicits._
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"TRIAGE $label%-28s ${(System.nanoTime() - t0) / 1e9}%.2fs")
      r
    }
    val docs = Tables.df(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"))
    val corpus = docs.filter(col("doc_id") % 3 =!= 0)
    val batch = docs.filter(col("doc_id") % 3 === 0)
    val evalDocs = docs.filter(col("doc_id") % 97 === 0).select(col("text"))
    for (round <- 1 to 2) {
      println(s"--- round $round")
      t("index build")(ShingleIndex.build(corpus, "doc_id", "text",
        "graft_probe", buckets = 32, parts = 16))
      val sketch = t("eval sketch")(Decontaminate.gramSketch(
        Decontaminate.evalGrams(evalDocs, "text", 8).select(col("g")),
        estimatedGrams = 1L << 18))
      val cfg = Ingest.Config("graft_probe", Some(sketch),
        minTokens = 30)
      // gates alone (scrub + tokens + bloom probe over the batch)
      t("gate maps x1")(graft.streaming.Streams.bloomDecontaminated(
        batch.select(col("doc_id"),
          graft.operators.Corpus.redactText(col("text")).as("text")),
        sketch, "text", 8, 2).filter(!col("contaminated")).count())
      t("scrub only")(batch.select(col("doc_id"),
        graft.operators.Corpus.redactText(col("text")).as("text"))
        .agg(sum(length(col("text")))).collect())
      t("bloom HOF probe, no scrub")(graft.streaming.Streams
        .bloomDecontaminated(batch, sketch, "text", 8, 2)
        .filter(!col("contaminated")).count())
      t("exploded probe, no scrub") {
        import graft.functions.TextFns._
        val grams = batch.select(col("doc_id"),
          explode(wordShingles(tokens(normText(col("text"))), 8)).as("g"))
        grams.filter(call_function("graft_might_contain", lit(sketch),
            hash60(col("g"))))
          .groupBy(col("doc_id")).agg(count(lit(1)).as("h"))
          .filter(col("h") >= 2).count()
      }
      locally {
        import graft.functions.TextFns._
        val grams = batch.select(col("doc_id"),
          explode(wordShingles(tokens(normText(col("text"))), 8)).as("g"))
        t("gram explode only")(grams.count())
        t("gram explode + hash60")(
          grams.select(col("doc_id"), hash60(col("g")).as("h"))
            .agg(max(col("h"))).collect()) // max, not sum: ANSI overflow
        val smallSketch = Decontaminate.gramSketch(
          Decontaminate.evalGrams(evalDocs, "text", 8).select(col("g")),
          estimatedGrams = 1L << 14)
        t("probe small sketch (16KB)")(
          grams.filter(call_function("graft_might_contain", lit(smallSketch),
            hash60(col("g")))).count())
        t("probe big sketch (328KB)")(
          grams.filter(call_function("graft_might_contain", lit(sketch),
            hash60(col("g")))).count())
        val grams5 = batch.select(col("doc_id"),
          explode(wordShingles(tokens(normText(col("text"))), 5)).as("g"))
        t("5-gram explode only")(grams5.count())
      }
      // the indexed pair stage alone, on pre-gated survivors
      val surv = batch.select(col("doc_id"),
        graft.operators.Corpus.redactText(col("text")).as("text"))
      t("incrementalPairs")(ShingleIndex.incrementalPairs(
        surv, "doc_id", "text", "graft_probe").count())
      spark.catalog.clearCache()
      t("full triage")(Ingest.triage(batch, "doc_id", "text", cfg).count())
      spark.catalog.clearCache()
      // triage's own stages, replicated with timers (mirror Ingest.triage)
      locally {
        import graft.functions.TextFns
        val par = spark.sparkContext.defaultParallelism
        val scrubbed = batch.repartition(par, col("doc_id"))
          .select(col("doc_id"),
            graft.operators.Corpus.redactText(col("text")).as("text"))
        val gated0 = scrubbed.select(col("doc_id"), col("text"),
          coalesce(size(TextFns.tokens(TextFns.normText(col("text"))))
            .cast("long"), lit(0L)).as("n_tokens"))
        val gated = graft.streaming.Streams
          .bloomDecontaminated(gated0, sketch, "text", 8, 2)
          .drop("eval_gram_hits")
        t("gates repartitioned")(gated.count())
        val triaged0 = gated.withColumn("_gate",
          when(col("n_tokens") < 30, lit("low_quality"))
            .when(col("contaminated"), lit("contaminated")))
        val survivors = triaged0.filter(col("_gate").isNull)
          .select(col("doc_id"), col("text"))
        t("pairs on gated survivors")(ShingleIndex.incrementalPairs(
          survivors, "doc_id", "text", "graft_probe").count())
        spark.catalog.clearCache()
      }
    }
    Seq("graft_probe_idx", "graft_probe_sh", "graft_probe_meta")
      .foreach(tb => spark.sql(s"DROP TABLE IF EXISTS $tb"))
    spark.stop()
  }
}
