package graft.operators

import graft.functions.TextFns
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** One ingest round of a production training-data pipeline, composed
  * from the library's tested parts in their production order:
  *
  *   1. PII scrub ([[Corpus.redactText]]) — FIRST, so every later
  *      stage (hashing, shingling, the persisted index) sees uniform
  *      placeholders and raw PII never enters stored state;
  *   2. quality gate (token count ≥ `minTokens` — the p29 rule);
  *   3. lexical decontamination (the Bloom gate — stateless per-row
  *      probe against the eval-suite sketch, reusing
  *      `Streams.bloomDecontaminated`, which is a pure map and applies
  *      to batch frames identically);
  *   4. near-dup triage of the survivors against the PERSISTED corpus
  *      ([[ShingleIndex.incrementalPairs]]): a survivor matching any
  *      indexed doc is a duplicate; of a new×new pair, the smaller id
  *      is kept (deterministic keeper rule, same as Dedup.exact).
  *
  * [[triage]] is a DataFrame → DataFrame with no state mutation: one
  * row per batch doc with its redacted text and FATE — the caller
  * routes rows by fate (accepted → corpus sink +
  * [[ShingleIndex.append]]; duplicate/contaminated → quarantine) and
  * owns when the index mutates. NOT fully lazy: building the frame
  * runs the gate stages once (the localCheckpoint fence below) plus
  * the index probe's batch-keyed partition lookup — bounded by the
  * batch, never the corpus, but real driver-blocking jobs at call
  * time; construct triage when you mean to run it. Fates are assigned
  * in pipeline order:
  * a doc failing multiple gates reports the FIRST (cheapest) one, and
  * dedup runs only among gate-survivors — a low-quality doc is never a
  * duplicate's keeper.
  *
  * Scale: stages 1–3 are per-row maps that pipeline into the scan;
  * stage 4 is the batch-bounded indexed path (see ShingleIndex). The
  * whole triage is one DAG — Spark materializes nothing until the
  * caller acts.
  */
object Ingest {

  /** @param indexName [[ShingleIndex]] table-name prefix for the corpus
    * @param evalSketch Bloom sketch bytes from `Decontaminate.gramSketch`
    *   (None disables the decontamination gate)
    * @param bloomN / bloomMinHits the gate's n-gram width / hit floor
    * @param minTokens quality floor (whitespace tokens after scrub)
    * @param num/den/maxDocFreq near-dup Jaccard threshold + df cap
    * @param norm pluggable canonicalizer for the quality gate's token
    *   count AND the triage probe's shingles — must match the
    *   normalizer the shingle index was built with. The ASCII default
    *   silently fails EVERY non-Latin doc as `low_quality` (its token
    *   count is 0); a multilingual ingest passes
    *   [[graft.functions.TextFns.unicodeNormalizer]] here and at
    *   [[ShingleIndex.build]] */
  final case class Config(
      indexName: String,
      evalSketch: Option[Array[Byte]] = None,
      bloomN: Int = 8, bloomMinHits: Int = 2,
      minTokens: Int = 10,
      num: Int = 7, den: Int = 10, maxDocFreq: Int = 20,
      norm: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
        TextFns.normText)

  /** @return (doc_id, text [redacted], n_tokens, fate, dup_of) — fate ∈
    *         low_quality | contaminated | duplicate | accepted; dup_of
    *         is the matched doc's id for duplicates (min over matches),
    *         NULL otherwise.
    *
    * Dedup is GREEDY-PAIRWISE (every doc with a near-dup partner of
    * smaller id — or any indexed doc — drops): in a chain A~B~C where
    * A≁C, both B and C drop and C's dup_of points at B, itself dropped.
    * Every dropped doc genuinely has a near-dup, but keeper-exactness
    * per connected component is [[Clusters.connectedComponents]]'
    * job (the p15 curation rule) — triage stays pairwise because the
    * indexed path emits only batch-keyed pairs, keeping ingest cost
    * batch-bounded. */
  def triage(batch: DataFrame, idCol: String, textCol: String,
      cfg: Config): DataFrame = {
    // id-keyed repartition FIRST — the gate stages are per-row maps
    // (regex cascade + tokenize + per-gram Bloom probes) that would
    // otherwise inherit the source file layout: a batch read from one
    // parquet file runs its whole scrub/gate chain on one core
    // (measured 8s → 0.3s at sf0.1). Same convention as shingleDocs.
    val scrubbed = batch
      .repartition(batch.sparkSession.sparkContext.defaultParallelism,
        col(idCol))
      .select(col(idCol).as("doc_id"),
        Corpus.redactText(col(textCol)).as("text"))
    // Tokenize ONCE into a materialized attribute shared by the
    // quality gate (n_tokens) and the Bloom probe's shingle window —
    // the wordShingles CSE trap (see bloomDecontaminated): slicing an
    // inline tokenize expression re-runs it per window position,
    // O(tokens²) per row; measured 4.3 s vs 0.5 s for this gate chain
    // at sf0.1. The attribute is dropped before the checkpoint fence so
    // the materialized blocks never carry the token array.
    // NULL text counts as 0 tokens: size(NULL) is NULL, and a NULL
    // n_tokens would sail past the `< minTokens` gate (NULL comparison
    // takes no branch) straight to "accepted" — a contentless doc must
    // fail the quality gate like the empty string does
    val tok = "__graft_triage_toks"
    val gated0 = scrubbed.select(col("doc_id"), col("text"),
      TextFns.tokens(cfg.norm(col("text"))).as(tok))
      .select(col("doc_id"), col("text"), col(tok),
        coalesce(size(col(tok)).cast("long"), lit(0L)).as("n_tokens"))
    val gated = (cfg.evalSketch match {
      case Some(sk) => graft.streaming.Streams
        .bloomDecontaminatedToks(gated0, sk, tok, cfg.bloomN,
          cfg.bloomMinHits)
        .drop("eval_gram_hits")
      case None => gated0.withColumn("contaminated", lit(false))
    }).drop(tok)
    // Lazy localCheckpoint, NOT persist(): it materializes the gate
    // columns once at first action and TRUNCATES LINEAGE, which does
    // two jobs at once. (1) No un-owned pinned cache: checkpoint
    // blocks are released when the frame is garbage-collected, without
    // a caller-side unpersist. (2) It is a pushdown barrier — without
    // it, Catalyst pushes the survivors filter (with the whole gate
    // chain inlined: regex scrub + tokenizer + per-gram Bloom probes)
    // BELOW the id repartition onto the raw file scan, which runs as
    // wide as the source file layout — measured 11s vs 0.5s at sf0.1
    // on a single-parquet batch. Tradeoff: checkpoint blocks are not
    // recomputable after executor loss; an ingest round is a bounded,
    // re-runnable batch, so a lost executor fails-fast and the round
    // reruns (vs. silently serializing every run).
    val triaged0 = gated.withColumn("_gate",
      when(col("n_tokens") < cfg.minTokens, lit("low_quality"))
        .when(col("contaminated"), lit("contaminated")))
      .localCheckpoint(false)
    val survivors = triaged0.filter(col("_gate").isNull)
      .select(col("doc_id"), col("text"))
    val pairs = ShingleIndex.incrementalPairs(survivors, "doc_id", "text",
      cfg.indexName, cfg.num, cfg.den, cfg.maxDocFreq, cfg.norm)
    // drop rule: new×old drops the new doc; new×new (emitted once with
    // new_id < match_id) drops the LARGER id — min(dup_of) makes the
    // report deterministic when a doc matches several keepers
    val dropped = pairs.filter(!col("match_is_new"))
      .select(col("new_id").as("doc_id"), col("match_id").as("_dup"))
      .unionByName(pairs.filter(col("match_is_new"))
        .select(col("match_id").as("doc_id"), col("new_id").as("_dup")))
      .groupBy(col("doc_id")).agg(min(col("_dup")).as("dup_of"))
    triaged0.join(dropped, Seq("doc_id"), "left")
      .select(col("doc_id"), col("text"), col("n_tokens"),
        coalesce(col("_gate"),
          when(col("dup_of").isNotNull, lit("duplicate")),
          lit("accepted")).as("fate"),
        when(col("_gate").isNull, col("dup_of")).as("dup_of"))
  }
}
