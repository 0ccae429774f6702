package graft.tools

import graft.operators.{Corpus, Dedup}
import graft.functions.TextFns
import org.apache.spark.sql.functions._

/** Measures what the round-10 sketch/retrieval operators actually save
  * at sf scale — the shuffle-volume claims in SCALE.md come from here,
  * not from assertion.
  *
  *   - p61 (CMS heavy hitters): rows entering the exact groupBy with
  *     the map-side sketch gate vs without; sketch false-positive count
  *     vs the true heavy-hitter set.
  *   - p57 (BM25): postings rows that reach the scoring joins after
  *     the query-vocabulary broadcast restriction vs the full corpus
  *     posting table a naive plan would shuffle.
  *
  * Usage: runMain graft.tools.SketchProbe [sfDir]
  */
object SketchProbe {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.Sessions.local(16)
    val docs = graft.Tables.df(spark, sf, "documents")
    val n = 3; val depth = 4; val width = 512; val minDf = 5L

    val pairs = Dedup.shingleDocs(docs, "doc_id", "text", n)
      .select(explode(col("shingles")).as("ngram")).persist()
    val totalRows = pairs.count()
    val grams = pairs.distinct().persist()
    val distinctGrams = grams.count()

    val matrix = Corpus.cmsNgramMatrix(docs, "doc_id", "text", n, depth, width)
    val est = Corpus.cmsEstimateDf(matrix, grams, "ngram", depth, width)
      .persist()
    val truth = pairs.groupBy(col("ngram")).count().persist()
    // threshold ladder: the gate's value depends on how rare "heavy"
    // is — report selectivity where HH are common AND where rare
    val ladder = Seq(minDf, 50L, 200L, 500L).distinct.map { t =>
      val admitted = est.filter(col("df_est") >= t).count()
      val hh = truth.filter(col("count") >= t).count()
      val gatedRows = pairs.join(
        est.filter(col("df_est") >= t).select("ngram"), Seq("ngram")).count()
      s"""{"min_df":$t,"admitted_grams":$admitted,"true_hh":$hh,""" +
        s""""gated_shuffle_rows":$gatedRows}"""
    }

    // width ladder at a fixed rare-HH threshold: the sizing law is
    // false-positive mass ≈ pair_rows/width per bucket, so the gate
    // only selects once width ≫ pair_rows/minDf
    val widthLadder = Seq(512, 8192, 65536).map { w =>
      val m = Corpus.cmsNgramMatrix(docs, "doc_id", "text", n, depth, w)
      val adm = Corpus.cmsEstimateDf(m, grams, "ngram", depth, w)
        .filter(col("df_est") >= 50L).count()
      s"""{"width":$w,"admitted_at_min_df_50":$adm}"""
    }

    // BM25: corpus posting volume vs query-vocab-restricted volume,
    // at two query-set sizes (the restriction scales with |queries|,
    // not with corpus vocabulary)
    val toks = docs.select(col("doc_id"),
      TextFns.tokens(TextFns.normText(col("text"))).as("toks"))
    val posting = toks
      .select(col("doc_id"), explode(col("toks")).as("term"))
      .groupBy("doc_id", "term").count().persist()
    val fullPostings = posting.count()
    val bmLadder = Seq(250, 2500).map { mod =>
      val qvocab = toks.filter(col("doc_id") % mod === 0)
        .select(explode(slice(col("toks"), 1, 8)).as("term")).distinct()
      val nq = qvocab.count()
      val restricted = posting.join(broadcast(qvocab), Seq("term")).count()
      s"""{"query_mod":$mod,"qvocab_terms":$nq,"posting_rows":$restricted}"""
    }

    println(s"""{"sf":"$sf","cms":{"pair_rows":$totalRows,""" +
      s""""distinct_grams":$distinctGrams,""" +
      s""""ladder":[${ladder.mkString(",")}],""" +
      s""""width_ladder":[${widthLadder.mkString(",")}]},""" +
      s""""bm25":{"full_posting_rows":$fullPostings,""" +
      s""""ladder":[${bmLadder.mkString(",")}]}}""")
    spark.stop()
  }
}
