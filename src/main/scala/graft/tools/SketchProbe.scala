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
    val admitted = est.filter(col("df_est") >= minDf).count()
    val trueHh = pairs.groupBy(col("ngram")).count()
      .filter(col("count") >= minDf).count()
    // rows the exact groupBy actually shuffles under the gate =
    // pair rows whose gram the sketch admitted
    val gatedRows = pairs.join(
      est.filter(col("df_est") >= minDf).select("ngram"), Seq("ngram"))
      .count()

    // BM25: corpus posting volume vs query-vocab-restricted volume
    val toks = docs.select(col("doc_id"),
      TextFns.tokens(TextFns.normText(col("text"))).as("toks"))
    val posting = toks
      .select(col("doc_id"), explode(col("toks")).as("term"))
      .groupBy("doc_id", "term").count().persist()
    val fullPostings = posting.count()
    val qvocab = toks.filter(col("doc_id") % 250 === 0)
      .select(explode(slice(col("toks"), 1, 8)).as("term")).distinct()
    val restricted = posting.join(broadcast(qvocab), Seq("term")).count()

    println(s"""{"sf":"$sf","cms":{"pair_rows":$totalRows,""" +
      s""""distinct_grams":$distinctGrams,"admitted_grams":$admitted,""" +
      s""""true_hh":$trueHh,"gated_shuffle_rows":$gatedRows},""" +
      s""""bm25":{"full_posting_rows":$fullPostings,""" +
      s""""query_vocab_rows":$restricted}}""")
    spark.stop()
  }
}
