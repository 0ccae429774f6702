package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Benchmark decontamination — the training-data hygiene step that flags
  * corpus documents overlapping an evaluation suite, so eval questions
  * don't leak into training. The standard formulation (the n-gram
  * membership test of the GPT-3 and PaLM data cards) is: a document is
  * contaminated when at least `minHits` of its word n-grams also occur
  * anywhere in the eval suite.
  *
  * Scale shape: the EVAL side is small (benchmark suites are thousands
  * of documents) and the CORPUS side is the 100 TB one, so the eval
  * n-gram set — deduplicated, one short string per row — is broadcast
  * and the corpus streams through a map-side semi-join + partial
  * aggregate; the corpus is never shuffled by gram. The per-doc
  * distinct-gram count shuffles only (doc_id, gram-hit) pairs, bounded
  * by hits, not corpus size.
  */
object Decontaminate {

  /** Per-document eval-overlap counts.
    *
    * @param corpus (idCol, textCol, …) — the training-candidate side
    * @param eval   (textCol, …) — the benchmark suite
    * @param n      n-gram width (word shingles; 8 is the GPT-3 choice,
    *               smaller for short synthetic fixtures)
    * @param minHits flag threshold: contaminated ⇔ hits ≥ minHits
    * @return (doc_id, eval_gram_hits, contaminated) — `doc_id` carries
    *         the corpus `idCol` values; docs with zero overlap keep
    *         eval_gram_hits = 0, so the output is a total verdict per
    *         corpus doc, joinable back to the keep/drop plan
    */
  def ngramOverlap(
      corpus: DataFrame, eval: DataFrame, idCol: String, textCol: String,
      n: Int = 8, minHits: Int = 1,
      norm: Column => Column = graft.functions.TextFns.normText)
      : DataFrame = {
    val corpusGrams = Dedup.shingleDocs(corpus, idCol, textCol, n, norm)
      .select(col("doc_id"), explode(col("shingles")).as("s"))
    val hits = corpusGrams
      .join(broadcast(evalGrams(eval, textCol, n, norm).select(col("s"))),
        Seq("s")) // map-side semi vs tiny set
      .groupBy(col("doc_id"))
      .agg(count_distinct(col("s")).as("eval_gram_hits"))
    verdict(corpus, idCol, hits, minHits)
  }

  /** Total per-doc verdict assembly, shared by the exact and Bloom
    * paths — the two must stay bit-identical (PipelineSpec pins it), so
    * the verdict shape lives once. */
  private def verdict(corpus: DataFrame, idCol: String, hits: DataFrame,
      minHits: Int): DataFrame =
    corpus.select(col(idCol).as("doc_id"))
      .join(hits, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("eval_gram_hits"), lit(0L)).as("eval_gram_hits"))
      .withColumn("contaminated", col("eval_gram_hits") >= minHits)

  /** The deduplicated eval gram set: (s = gram string, g = hash60(s)).
    * The hash keys the sketch and the verify join; the string settles
    * hash collisions exactly. Synthetic per-row ids exist only so
    * shingleDocs' keyed repartition spreads the eval suite across cores
    * instead of collapsing it onto one partition; they are discarded
    * right after shingling, so their nondeterminism never reaches the
    * result (grams are id-free). */
  def evalGrams(eval: DataFrame, textCol: String, n: Int,
      norm: Column => Column = graft.functions.TextFns.normText)
      : DataFrame = {
    import graft.functions.TextFns.hash60
    Dedup.shingleDocs(
        eval.select(monotonically_increasing_id().as("doc_id"), col(textCol)),
        "doc_id", textCol, n, norm)
      .select(explode(col("shingles")).as("s"))
      .distinct()
      .select(col("s"), hash60(col("s")).as("g"))
  }

  /** Bloom sketch bytes over a single-column key set — ONE driver
    * action whose traffic is the sketch, never data. Shareable across
    * calls/streams: build once per eval-suite release, probe
    * everywhere. */
  def gramSketch(grams: DataFrame, bitsPerKey: Int = 10,
      estimatedGrams: Long = 1L << 21): Array[Byte] = {
    require(grams.columns.length == 1,
      s"gramSketch takes a single-column key frame, got ${grams.columns.mkString(", ")}")
    grams.agg(call_function("graft_bloom_agg", col(grams.columns.head),
      lit(estimatedGrams), lit(estimatedGrams * bitsPerKey)).as("bf"))
      .collect()(0).getAs[Array[Byte]]("bf")
  }

  /** [[ngramOverlap]] with a Bloom-filter pre-probe — same exact result,
    * built for the regime where even the DEDUPLICATED eval gram set is
    * too wide to broadcast-join comfortably (a full eval-suite library
    * is ~10^7-10^8 grams: a broadcast hash relation of strings is tens
    * of GB; the Bloom sketch of the same set at ~10 bits/key is tens of
    * MB, embedded in the plan as one binary literal).
    *
    * Stages: (1) hash both sides' grams to 60-bit longs; (2) aggregate
    * the eval side into Spark's native Bloom sketch (catalyst
    * BloomFilterAggregate, registered as `graft_bloom_agg`; one
    * collect of the sketch bytes — driver traffic is the sketch, never
    * data); (3) corpus grams stream through the `graft_might_contain`
    * probe — a pure map-side filter, no join, no shuffle — dropping
    * virtually all non-overlapping grams; (4) survivors exact-verify
    * against the true gram set — joined on the compact hash key but
    * SETTLED ON THE GRAM STRING, and hits counted over strings, so both
    * Bloom false positives AND hash60 collisions are removed and the
    * verdicts equal [[ngramOverlap]]'s exactly, not merely
    * modulo-collision. The verify join is NOT hint-broadcast: survivors
    * are few, the eval side shuffles by hash when it is genuinely too
    * big to broadcast, and AQE still broadcasts it when it is small.
    *
    * @param bitsPerKey Bloom sizing (~10 bits/key ≈ 1% fp at the probe;
    *   fp only costs verify work, never correctness)
    * @param estimatedGrams sizing estimate for the sketch — an UPPER
    *   bound on distinct eval grams. Deliberately an estimate, not an
    *   exact `count()`: exactness would cost a second eval-side job,
    *   and over-sizing only pads the sketch (fp rate falls, bytes
    *   grow), never correctness. Sketch size is
    *   estimatedGrams·bitsPerKey/8 bytes — ~2.6 MB for the 2^21
    *   default at 10 bits/key; at the catalyst aggregate's 64Mbit cap
    *   the sketch holds ~6.7M grams at 10 bits/key.
    */
  def bloomNgramOverlap(
      corpus: DataFrame, eval: DataFrame, idCol: String, textCol: String,
      n: Int = 8, minHits: Int = 1, bitsPerKey: Int = 10,
      estimatedGrams: Long = 1L << 21,
      norm: Column => Column = graft.functions.TextFns.normText)
      : DataFrame = {
    import graft.functions.TextFns.hash60
    val evGrams = evalGrams(eval, textCol, n, norm).persist()
    // the persisted gram set is reused by the verify join below
    val sketch = gramSketch(evGrams.select(col("g")), bitsPerKey,
      estimatedGrams)
    val corpusGrams = Dedup.shingleDocs(corpus, idCol, textCol, n, norm)
      .select(col("doc_id"), explode(col("shingles")).as("s"))
      .select(col("doc_id"), col("s"), hash60(col("s")).as("g"))
      .filter(call_function("graft_might_contain", lit(sketch), col("g")))
    val hits = corpusGrams
      .join(evGrams.select(col("g"), col("s").as("_es")), Seq("g"))
      .filter(col("s") === col("_es")) // exact string verify
      .groupBy(col("doc_id"))
      .agg(count_distinct(col("s")).as("eval_gram_hits"))
    verdict(corpus, idCol, hits, minHits)
  }
}
