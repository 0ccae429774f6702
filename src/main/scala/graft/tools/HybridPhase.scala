package graft.tools

import graft.{Sessions, Tables}
import org.apache.spark.sql.functions._

/** Branch-level timing for the hybrid retrieval family: p66 (raw BM25 +
  * brute dense), p66b (posting-store BM25 + IVF store), p64/p57. Run
  * alone at SPARK_GRAFT_SF_DIR. */
object HybridPhase {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.local(32)
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"HP $label%-38s ${(System.nanoTime() - t0) / 1e9}%.2fs")
      r
    }
    // warm (builds the memoized stores)
    t("p66b full (maybe cold)")(
      graft.SparkEntry.queries("p66b_hybrid_store")(spark, sfDir).count())
    spark.catalog.clearCache()
    val docs = Tables.df(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"))
    val embs = Tables.df(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding"))
    for (round <- 1 to 2) {
      println(s"--- round $round")
      val lex = graft.operators.PostingIndex.topK(
        docs.filter(col("doc_id") % 250 === 0), "doc_id", "text",
        "graft_p64", 8, 10, k1 = 1.2, b = 0.75)
      t("p66b lex branch (PostingIndex.topK)")(lex.count())
      spark.catalog.clearCache()
      val vec = graft.operators.IvfIndex.topK(
        embs.filter(col("vec_id") % 250 === 0), "vec_id", "embedding",
        "graft_p66", 10, nProbe = 3)
      t("p66b vec branch (IvfIndex.topK)")(vec.count())
      spark.catalog.clearCache()
      t("p66b full")(
        graft.SparkEntry.queries("p66b_hybrid_store")(spark, sfDir).count())
      spark.catalog.clearCache()
      t("p64 full (bm25 store)")(
        graft.SparkEntry.queries("p64_bm25_store")(spark, sfDir).count())
      spark.catalog.clearCache()
      t("p57 full (bm25 raw)")(
        graft.SparkEntry.queries("p57_bm25_retrieval")(spark, sfDir).count())
      spark.catalog.clearCache()
      t("p66 full (raw hybrid)")(
        graft.SparkEntry.queries("p66_hybrid_rrf")(spark, sfDir).count())
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
