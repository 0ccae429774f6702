package graft.tools

import graft.Tables
import org.apache.spark.sql.functions._

/** Stage decomposition of p41 under the NOOP sink (r13's timed action):
  * which part of the triage pipeline owns the newly visible cost.
  * Run alone at SPARK_GRAFT_SF_DIR. */
object TriageNoop {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.Sessions.local(32)
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def t[A](label: String)(f: => A): Unit = {
      val t0 = System.nanoTime(); f
      println(f"TN $label%-36s ${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    // warm + build the memoized index
    t("p41 full (warm/build)")(noop(
      graft.SparkEntry.queries("p41_ingest_triage")(spark, sfDir)))
    spark.catalog.clearCache()
    for (round <- 1 to 2) {
      println(s"--- round $round")
      t("p41 full noop")(noop(
        graft.SparkEntry.queries("p41_ingest_triage")(spark, sfDir)))
      spark.catalog.clearCache()
      t("p41 full count")(
        graft.SparkEntry.queries("p41_ingest_triage")(spark, sfDir).count())
      spark.catalog.clearCache()
      // the pieces, mirroring Pipeline.p41
      val docs = Tables.df(spark, sfDir, "documents")
        .select(col("doc_id"), col("text"))
      val batch = docs.filter(col("doc_id") % 3 === 0)
      val evalDocs = docs.filter(col("doc_id") % 97 === 0).select(col("text"))
      val sketch = graft.operators.Decontaminate.gramSketch(
        graft.operators.Decontaminate
          .evalGrams(evalDocs, "text", 8).select(col("g")),
        estimatedGrams = 1 << 16)
      t("sketch build only")(())
      val cfg = graft.operators.Ingest.Config("graft_p41", Some(sketch),
        bloomN = 8, bloomMinHits = 2, minTokens = 10,
        num = 7, den = 10, maxDocFreq = 20)
      t("triage construct (gates+ckpt)") {
        val tri = graft.operators.Ingest.triage(batch, "doc_id", "text", cfg)
        t("  triage noop (probe+join)")(noop(tri))
      }
      spark.catalog.clearCache()
      // incrementalPairs alone over the gate survivors
      t("incrementalPairs noop") {
        val survivors = batch // superset of survivors: ballpark only
          .select(col("doc_id"),
            graft.operators.Corpus.redactText(col("text")).as("text"))
        noop(graft.operators.ShingleIndex.incrementalPairs(survivors,
          "doc_id", "text", "graft_p41", 7, 10, 20))
      }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
