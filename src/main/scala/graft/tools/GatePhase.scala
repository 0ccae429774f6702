package graft.tools

import graft.{Sessions, Tables}
import graft.functions.TextFns
import graft.operators.{Corpus, Decontaminate}
import org.apache.spark.sql.functions._

/** Micro-variants of p41's gate chain to pinpoint where the 4.2 s of
  * gates→checkpoint goes: tokenize-once vs inline re-evaluation, bloom
  * probe vs shingle build, checkpoint write vs compute. */
object GatePhase {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.local(32)
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"GP $label%-44s ${(System.nanoTime() - t0) / 1e9}%.2fs")
      r
    }
    val docs = Tables.df(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"))
    val batch = docs.filter(col("doc_id") % 3 === 0)
    println("GP batch rows = " + batch.count())
    val evalDocs = docs.filter(col("doc_id") % 97 === 0).select(col("text"))
    val sketch = Decontaminate.gramSketch(
      Decontaminate.evalGrams(evalDocs, "text", 8).select(col("g")),
      estimatedGrams = 1L << 18)
    val par = spark.sparkContext.defaultParallelism
    for (round <- 1 to 2) {
      println(s"--- round $round")
      val scrubbed = batch.repartition(par, col("doc_id"))
        .select(col("doc_id"), Corpus.redactText(col("text")).as("text"))
      // A: scrub + tokens only, checkpointed
      t("A scrub+tokens -> ckpt")(scrubbed
        .select(col("doc_id"), col("text"),
          coalesce(size(TextFns.tokens(TextFns.normText(col("text"))))
            .cast("long"), lit(0L)).as("n_tokens"))
        .localCheckpoint(false).count())
      // B: + shingles built from INLINE tokens expr (bloomDecontaminated
      // shape) but no probe
      t("B + inline 8-gram shingles -> ckpt")(scrubbed
        .select(col("doc_id"), col("text"),
          coalesce(size(TextFns.tokens(TextFns.normText(col("text"))))
            .cast("long"), lit(0L)).as("n_tokens"),
          size(TextFns.wordShingles(
            TextFns.tokens(TextFns.normText(col("text"))), 8))
            .as("n_sh"))
        .localCheckpoint(false).count())
      // C: full gate chain (probe), checkpointed — the production shape
      t("C + bloom probe -> ckpt")(graft.streaming.Streams
        .bloomDecontaminated(scrubbed
          .select(col("doc_id"), col("text"),
            coalesce(size(TextFns.tokens(TextFns.normText(col("text"))))
              .cast("long"), lit(0L)).as("n_tokens")),
          sketch, "text", 8, 2)
        .localCheckpoint(false).count())
      // D: tokenize ONCE into a materialized attribute, shingle+probe
      // from the attribute
      val toksFirst = scrubbed
        .select(col("doc_id"), col("text"),
          TextFns.tokens(TextFns.normText(col("text"))).as("toks"))
        .select(col("doc_id"), col("text"),
          coalesce(size(col("toks")).cast("long"), lit(0L)).as("n_tokens"),
          size(filter(transform(
            TextFns.wordShingles(col("toks"), 8), s => TextFns.hash60(s)),
            g => call_function("graft_might_contain", lit(sketch), g)))
            .cast("long").as("eval_gram_hits"))
      t("D tokens-once attr + probe -> ckpt")(
        toksFirst.localCheckpoint(false).count())
      // E: same as C but WITHOUT checkpoint, forced via agg of all cols
      t("E probe, no ckpt (agg force)")(graft.streaming.Streams
        .bloomDecontaminated(scrubbed
          .select(col("doc_id"), col("text"),
            coalesce(size(TextFns.tokens(TextFns.normText(col("text"))))
              .cast("long"), lit(0L)).as("n_tokens")),
          sketch, "text", 8, 2)
        .agg(sum(col("n_tokens")), sum(col("eval_gram_hits")),
          sum(length(col("text")))).collect())
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
