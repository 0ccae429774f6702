package graft.tools

import graft.{Sessions, Tables}
import graft.functions.TextFns._
import org.apache.spark.sql.functions._

/** Stage timing for the capped near-dup pair pipeline (p02b's shape —
  * shared by p13/p15/p37/p52/p62): shingle build, df groupBy + anti,
  * candidate self-join, exact verify. Run alone at SPARK_GRAFT_SF_DIR. */
object DedupPhase {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.local(32)
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"DP $label%-38s ${(System.nanoTime() - t0) / 1e9}%.2fs")
      r
    }
    val docs = Tables.df(spark, sfDir, "documents")
    // warm
    t("p02b full (warm 1)")(
      graft.SparkEntry.queries("p02b_ngram_jaccard_capped")(spark, sfDir)
        .count())
    spark.catalog.clearCache()
    for (round <- 1 to 2) {
      println(s"--- round $round")
      val sh = graft.operators.Dedup
        .shingleDocs(docs, "doc_id", "text", 5).persist()
      t("shingleDocs materialize")(
        sh.agg(sum(size(col("shingles")))).collect())
      val hinv = sh.select(col("doc_id"),
        explode(transform(col("shingles"), s => hash60(s))).as("s"))
      t("hashed inverted explode count")(hinv.count())
      val common = hinv.groupBy(col("s")).agg(count(lit(1)).as("df"))
        .filter(col("df") > 20).select(col("s"))
      t("over-cap df set")(common.count())
      val invf = hinv.join(common, Seq("s"), "left_anti")
      t("anti join survivors")(invf.count())
      val cand = invf.as("a")
        .join(invf.as("b"),
          col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("ida"), col("b.doc_id").as("idb"))
        .distinct()
      t("candidate self-join distinct")(cand.count())
      val verified = cand
        .join(sh.select(col("doc_id").as("ida"),
          col("shingles").as("sha")), "ida")
        .join(sh.select(col("doc_id").as("idb"),
          col("shingles").as("shb")), "idb")
        .withColumn("inter", size(array_intersect(col("sha"), col("shb"))))
        .withColumn("union_sz",
          size(col("sha")) + size(col("shb")) - col("inter"))
        .filter(col("inter") * 10 >= col("union_sz") * 7)
      t("verify joins + filter")(verified.count())
      spark.catalog.clearCache()
      t("p02b full")(
        graft.SparkEntry.queries("p02b_ngram_jaccard_capped")(spark, sfDir)
          .count())
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
