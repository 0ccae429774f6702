package graft.tools

import graft.{Sessions, Tables}
import graft.functions.TextFns
import graft.operators.Corpus
import org.apache.spark.sql.functions._

/** Does the inline-shingle slowness scale with rows (per-row cost) or
  * stay constant (plan/codegen cost)? */
object GateScale {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.local(32)
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"GS $label%-44s ${(System.nanoTime() - t0) / 1e9}%.2fs")
      r
    }
    val docs = Tables.df(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"))
    val par = spark.sparkContext.defaultParallelism
    def inlineShape(frac: Int) = {
      val batch = docs.filter(col("doc_id") % 3 === 0)
        .filter(col("doc_id") % frac === 0)
      batch.repartition(par, col("doc_id"))
        .select(col("doc_id"), Corpus.redactText(col("text")).as("text"))
        .select(col("doc_id"), col("text"),
          coalesce(size(TextFns.tokens(TextFns.normText(col("text"))))
            .cast("long"), lit(0L)).as("n_tokens"),
          size(TextFns.wordShingles(
            TextFns.tokens(TextFns.normText(col("text"))), 8)).as("n_sh"))
    }
    for (round <- 1 to 2) {
      println(s"--- round $round")
      t("inline 1/10 batch agg")(
        inlineShape(10).agg(sum("n_tokens"), sum("n_sh")).collect())
      t("inline full batch agg")(
        inlineShape(1).agg(sum("n_tokens"), sum("n_sh")).collect())
      // no redact, no repartition, straight over parquet (p11 shape)
      t("inline p11-shape all docs")(docs
        .select(col("doc_id"),
          size(TextFns.wordShingles(
            TextFns.tokens(TextFns.normText(col("text"))), 8)).as("n_sh"))
        .agg(sum("n_sh")).collect())
      // redact but no repartition
      t("inline redact, no repart")(docs
        .select(col("doc_id"), Corpus.redactText(col("text")).as("text"))
        .select(col("doc_id"),
          size(TextFns.wordShingles(
            TextFns.tokens(TextFns.normText(col("text"))), 8)).as("n_sh"))
        .agg(sum("n_sh")).collect())
      // repartition but no redact
      t("inline repart, no redact")(docs
        .repartition(par, col("doc_id"))
        .select(col("doc_id"),
          size(TextFns.wordShingles(
            TextFns.tokens(TextFns.normText(col("text"))), 8)).as("n_sh"))
        .agg(sum("n_sh")).collect())
    }
    spark.stop()
  }
}
