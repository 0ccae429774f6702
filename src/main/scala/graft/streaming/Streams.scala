package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import java.sql.Timestamp

/** Structured Streaming operators over the events stream
  * (event_id, ts, user_id, event_type, value, props).
  *
  * The reference is batch-only (SURVEY.md §1.1 — no streams as
  * first-class abstractions), so these are the engine's forward-looking
  * stream surface: the same aggregations the batch side runs (q14/q18
  * shapes), expressed as incremental plans, plus stateful
  * sessionization — the three canonical streaming shapes:
  *
  *   1. watermark + tumbling-window aggregate (late data dropped after
  *      the watermark horizon — bounded state at any scale);
  *   2. watermark + windowed deduplication (dropDuplicates within the
  *      event-time horizon — the streaming face of Dedup.exact);
  *   3. flatMapGroupsWithState sessionization (custom per-key state with
  *      processing/event-time timeouts).
  *
  * All three run identically from a file/Kafka source; tests drive them
  * with MemoryStream. State stores shard by groupBy key — user_id/
  * event_type partition uniformly, so a 1000-executor cluster splits the
  * state linearly.
  */
object Streams {

  /** Tumbling-window per-type counts/sums with a watermark: the
    * incremental form of q14_datetime_bucket. */
  def windowedEventStats(
      events: DataFrame,
      window_ : String = "1 hour",
      watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_).as("win"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value")).as("total_value"))
      .select(col("win.start").as("window_start"), col("event_type"),
        col("n_events"), col("total_value"))

  /** Windowed value quantiles via the native KLL sketch aggregate
    * ([[graft.expressions.KllSketch]]) — the streaming shape exact
    * quantiles cannot take (percentile/median buffer every value per
    * window: unbounded state, and Structured Streaming rejects the
    * sort-based forms outright). The sketch's O(k log(n/k)) mergeable
    * ladder is legal state-store content the same way the KMV buffer
    * is in [[windowedDistinctUsers]]: bounded per window forever,
    * partial aggregation works, and every merge order honors the
    * n·L/k rank-error bound KllSpec pins. The streaming face of
    * corpus-health quantiles (p24 exact histogram / p70 sampled):
    * watch a token-length or quality-score distribution drift
    * window-over-window without ever buffering a window's values. */
  def windowedQuantiles(
      events: DataFrame,
      valueCol: String = "value",
      probs: Seq[Double] = Seq(0.5, 0.9, 0.99),
      window_ : String = "1 hour",
      watermark: String = "2 hours",
      k: Int = 256): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_).as("win"), col("event_type"))
      .agg(
        call_function("graft_kll",
          col(valueCol).cast("double") +: lit(k) +: probs.map(lit): _*)
          .as("quantiles"),
        // n_events counts the SKETCH POPULATION — non-null, non-NaN
        // values, exactly the rows graft_kll ingests — so a window of
        // all-null values reports 0 alongside its NULL quantiles
        // rather than a positive count describing nothing
        count(when(!isnan(col(valueCol).cast("double")),
          col(valueCol))).as("n_events"))
      .select(col("win.start").as("window_start"), col("event_type"),
        col("quantiles"), col("n_events"))

  /** Windowed corpus-COMPOSITION monitor — the streaming face of the
    * script-aware language ID: per (window, predicted language), the
    * doc count and token mass arriving on a document stream. Language
    * prediction is the same pure per-row expression as the batch query
    * (NFC normalize → script codepoint shares → [[graft.functions
    * .TextFns.latinArgmax]] stopword fallback — shared expressions, so
    * the two faces can never drift), and the aggregate is a plain
    * windowed count/sum: bounded state per (window, lang), partial
    * aggregation works. Watch an ingest's language mix drift
    * window-over-window — the upstream early warning for a corpus
    * whose quality gates ([[graft.operators.Ingest]] with a Unicode
    * normalizer) are about to see a distribution they weren't tuned
    * on. */
  def languageMix(
      docs: DataFrame,
      textCol: String = "text",
      tsCol: String = "ts",
      window_ : String = "1 hour",
      watermark: String = "2 hours"): DataFrame =
    graft.functions.TextFns
      .withLangPred(docs.withWatermark(tsCol, watermark), textCol,
        carry = Seq(tsCol))
      .select(col(tsCol), size(col("toks")).cast("long").as("n_toks"),
        col("lang_pred").as("lang"))
      .groupBy(window(col(tsCol), window_).as("win"), col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_toks")).as("n_tokens"))
      .select(col("win.start").as("window_start"), col("lang"),
        col("n_docs"), col("n_tokens"))

  /** Streaming exact dedup on event_id within the watermark horizon —
    * the streaming analog of Dedup.exact: duplicates arriving within
    * `watermark` of the original are dropped; state is bounded by the
    * horizon. */
  def dedupedEvents(events: DataFrame, watermark: String = "1 hour"): DataFrame =
    events.withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("event_id")

  /** Windowed distinct-user cardinality via the native KMV sketch
    * aggregate — the streaming shape exact distinct counting CANNOT
    * take: Structured Streaming rejects count_distinct outright
    * (per-window distinct sets are unbounded state). The sketch's
    * O(k) mergeable buffer is exactly what the state store wants: each
    * window's state is ≤ k longs forever, partial aggregation works,
    * and the estimate is the same deterministic (k−1)/r_k as batch
    * `p26_kmv_distinct` — exact below k distinct users. */
  def windowedDistinctUsers(
      events: DataFrame,
      window_ : String = "1 hour",
      watermark: String = "2 hours",
      k: Int = 64): DataFrame =
    events
      .withWatermark("ts", watermark)
      .select(col("ts"), col("event_type"),
        graft.functions.TextFns.hash60(col("user_id").cast("string")).as("h"))
      .groupBy(window(col("ts"), window_).as("win"), col("event_type"))
      .agg(call_function("graft_kmv", col("h"), lit(k))
        .as("est_distinct_users"))
      .select(col("win.start").as("window_start"), col("event_type"),
        col("est_distinct_users"))

  /** Stream–static enrichment: the event stream joined to a batch
    * dimension (user attributes, domain scores, block lists) — the
    * everyday streaming join. The static side broadcasts per
    * micro-batch (no stream state at all; Spark re-plans the batch
    * side, so a refreshed dimension table is picked up on the next
    * trigger). Left join: events with no dimension row pass through
    * with NULLs rather than being dropped. */
  def enrichedEvents(events: DataFrame, dim: DataFrame,
      keyCol: String): DataFrame =
    events.join(broadcast(dim), Seq(keyCol), "left")

  /** Stream–stream interval join (purchase attribution): every purchase
    * matched to the same user's clicks in the preceding `horizon` — the
    * fourth canonical streaming shape. Both sides carry watermarks and
    * the join condition bounds purchase_ts − click_ts to
    * [0, horizon], so Spark can expire click state once the purchase
    * watermark passes click_ts + horizon and purchase state
    * symmetrically: state is bounded by (horizon + watermark) of
    * traffic per user shard at ANY scale, never the full history.
    * Inner join: unattributed purchases drop (left-outer emits them
    * with nulls at watermark expiry if required). */
  def attributedPurchases(
      clicks: DataFrame, purchases: DataFrame,
      horizon: String = "1 hour",
      watermark: String = "30 minutes"): DataFrame = {
    val c = clicks
      .select(col("user_id").as("click_user"),
        col("event_id").as("click_id"), col("ts").as("click_ts"))
      .withWatermark("click_ts", watermark)
    val p = purchases
      .select(col("user_id"), col("event_id").as("purchase_id"),
        col("ts").as("purchase_ts"), col("value"))
      .withWatermark("purchase_ts", watermark)
    p.join(c,
        col("user_id") === col("click_user")
          && col("click_ts") <= col("purchase_ts")
          && col("click_ts") >= col("purchase_ts") - expr(s"INTERVAL $horizon"))
      .select(col("user_id"), col("purchase_id"), col("purchase_ts"),
        col("value"), col("click_id"), col("click_ts"))
  }

  final case class Event(
      event_id: Long, ts: Timestamp, user_id: Long,
      event_type: String, value: Double)

  final case class SessionState(
      events: Long, totalValue: Double, start: Long, lastSeen: Long)

  final case class Session(
      user_id: Long, n_events: Long, total_value: Double,
      started_at: Timestamp, ended_at: Timestamp, duration_sec: Long)

  /** Gap-based sessionization: a user's events belong to one session
    * until `gap` of inactivity; a closed session emits when a later
    * event exceeds the gap, and (with a timeout configured) the final
    * open session emits on timeout. Custom state via
    * flatMapGroupsWithState; production uses ProcessingTimeTimeout (the
    * default), tests pass NoTimeout for deterministic batch-only runs. */
  def sessionize(events: Dataset[Event], gapMs: Long,
      timeout: GroupStateTimeout = GroupStateTimeout.ProcessingTimeTimeout)
      : Dataset[Session] = {
    // the state function only ARMS ProcessingTimeTimeout; accepting
    // EventTimeTimeout here would silently never time out (no
    // setTimeoutTimestamp call) and withhold every final open session
    // forever — fail loudly instead of losing data
    require(timeout == GroupStateTimeout.ProcessingTimeTimeout
        || timeout == GroupStateTimeout.NoTimeout,
      "sessionize supports ProcessingTimeTimeout (production) or " +
        "NoTimeout (deterministic batch tests); EventTimeTimeout is " +
        "not armed by the state function")
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append, timeout) {
        (userId: Long, batch: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(Session(userId, s.events, s.totalValue,
              new Timestamp(s.start), new Timestamp(s.lastSeen),
              (s.lastSeen - s.start) / 1000L))
          } else {
            val sorted = batch.toSeq.sortBy(_.ts.getTime)
            var cur = state.getOption
            val closed = Seq.newBuilder[Session]
            sorted.foreach { e =>
              val t = e.ts.getTime
              cur match {
                case Some(s) if t - s.lastSeen <= gapMs =>
                  cur = Some(SessionState(s.events + 1, s.totalValue + e.value,
                    s.start, math.max(s.lastSeen, t)))
                case Some(s) => // gap exceeded: close previous, open new
                  closed += Session(userId, s.events, s.totalValue,
                    new Timestamp(s.start), new Timestamp(s.lastSeen),
                    (s.lastSeen - s.start) / 1000L)
                  cur = Some(SessionState(1L, e.value, t, t))
                case None =>
                  cur = Some(SessionState(1L, e.value, t, t))
              }
            }
            cur.foreach { s =>
              state.update(s)
              if (timeout == GroupStateTimeout.ProcessingTimeTimeout)
                state.setTimeoutDuration(gapMs)
            }
            closed.result().iterator
          }
      }
  }

  /** Streaming ingest decontamination: flag documents whose word
    * n-grams overlap a (batch-precomputed) eval-suite Bloom sketch —
    * the in-stream face of `Decontaminate.bloomNgramOverlap`. The
    * probe is completely STATELESS — per row: shingle the doc, count
    * shingles whose hash60 hits the sketch literal — so it runs in any
    * output mode, needs no watermark, no state store, and scales as a
    * pure map over the ingest stream.
    *
    * Counts are probe counts: Bloom false positives can overcount (by
    * the sketch's fp rate, caller-sized), never undercount — flagging
    * is conservative toward quarantine, so contamination cannot slip
    * through; route `contaminated = true` docs to a (tiny) quarantine
    * sink for the batch-side exact verify.
    *
    * @param sketch bytes from `Decontaminate.gramSketch`, built once
    *   per eval-suite release
    * @return input columns + (eval_gram_hits, contaminated)
    */
  def bloomDecontaminated(docs: DataFrame, sketch: Array[Byte],
      textCol: String, n: Int = 8, minHits: Int = 1,
      norm: Column => Column = graft.functions.TextFns.normText)
      : DataFrame = {
    import graft.functions.TextFns.tokens
    // norm must match the normalizer the sketch's grams were built
    // with (Decontaminate.evalGrams) — an ASCII gate over a
    // unicode-normalized sketch (or vice versa) probes disjoint gram
    // spaces and silently flags nothing.
    // The token array is materialized as an ATTRIBUTE before the
    // shingle window slices it — the wordShingles CSE trap: slicing an
    // inline tokenize EXPRESSION re-runs normalize+tokenize once per
    // window position, O(tokens²) per row (measured 4.9 s vs 0.5 s on
    // the sf0.1 p41 gate chain). Multi-reference inside wordShingles
    // keeps CollapseProject from inlining it back after the drop.
    val tok = "__graft_bloom_toks"
    bloomDecontaminatedToks(
      docs.withColumn(tok, tokens(norm(col(textCol)))),
      sketch, tok, n, minHits).drop(tok)
  }

  /** [[bloomDecontaminated]] over a pre-tokenized column — for callers
    * that already materialized the token array ([[graft.operators
    * .Ingest.triage]] shares one tokenize between its quality gate and
    * this probe). Same probe-count semantics. */
  def bloomDecontaminatedToks(docs: DataFrame, sketch: Array[Byte],
      toksCol: String, n: Int = 8, minHits: Int = 1): DataFrame = {
    import graft.functions.TextFns.{hash60, wordShingles}
    val hits = size(filter(
      transform(wordShingles(col(toksCol), n), s => hash60(s)),
      g => call_function("graft_might_contain", lit(sketch), g)))
    docs
      .withColumn("eval_gram_hits", hits.cast("long"))
      .withColumn("contaminated", col("eval_gram_hits") >= minHits)
  }

  /** Stateless streaming SEMANTIC decontamination gate — the
    * embedding-space sibling of [[bloomDecontaminated]]: each incoming
    * vector probes its `nProbe` nearest model centroids and exact-checks
    * cosine against only those cells' eval vectors, all as per-row array
    * HOFs over PLAN LITERALS (`Similarity.semanticGateModel`, the
    * analog of the Bloom sketch bytes). No state store, no watermark,
    * no shuffle — per-row cost is K centroid cosines + ~|eval|·nProbe/K
    * exact cosines, independent of stream length.
    *
    * Recall matches the model's cell geometry (eval multi-assignment +
    * query multi-probe); `nProbe = nCells` degenerates to the exact
    * any-eval-within-threshold check. Zero-norm vectors report clean
    * (cosine undefined — the batch operator EXCLUDES such rows instead;
    * a stream row must still flow, so clean is the conservative verdict
    * for a row that cannot be near anything in cosine space). The norm
    * is NULLed at zero rather than divided by — ANSI mode turns a 0.0
    * divisor into a job-killing error, and one padding row must not
    * stop the stream; NULL cosines fail every comparison, which is
    * exactly the clean verdict.
    *
    * @return input columns + (n_eval_near, contaminated)
    */
  def semanticGate(rows: DataFrame,
      model: graft.operators.Similarity.SemanticGateModel,
      vecCol: String, threshold: Double, nProbe: Int = 3): DataFrame = {
    // nProbe <= 0 would slice an empty probe list and mark EVERY row
    // clean — a config typo must not silently disable a
    // decontamination gate
    require(nProbe >= 1, s"semanticGate: nProbe must be >= 1, got $nProbe")
    import graft.operators.Similarity.dot
    val centLit = typedLit(model.centroids)
    val cellsLit = typedLit(model.cells)
    // negated cosine sorts ascending = best cell first; ties on list_id
    // via the struct's second field, same ordering as the batch side
    val probes = slice(array_sort(transform(centLit, c =>
      struct(
        (lit(0.0) - dot(col("_qv"), c.getField("_2"))
          / (col("_qn") * c.getField("_3"))).as("negcos"),
        c.getField("_1").as("list_id")))), 1, nProbe)
    // union of probed cells' eval vectors (distinct: multi-assignment
    // duplicates an eval vector across cells). try_element_at, NOT
    // element_at: under ANSI (the Spark 4 default this very gate runs
    // with) element_at THROWS on a missing map key, and a centroid's
    // cell CAN be empty — duplicate eval vectors tie at cos=1.0 and the
    // id tie-break can push a centroid's own self-assignment past
    // assignProbe. One empty cell must not kill the stream.
    val cands = array_distinct(flatten(filter(
      transform(probes, p => try_element_at(cellsLit, p.getField("list_id"))),
      a => a.isNotNull)))
    val hitIds = transform(filter(cands, e =>
      dot(col("_qv"), e.getField("_2")) / (col("_qn") * e.getField("_3"))
        > threshold), e => e.getField("_1"))
    rows
      .withColumn("_qv", col(vecCol).cast("array<double>"))
      .withColumn("_qn0", sqrt(dot(col("_qv"), col("_qv"))))
      .withColumn("_qn", when(col("_qn0") > 0, col("_qn0")))
      .withColumn("n_eval_near",
        size(array_distinct(hitIds)).cast("long"))
      .withColumn("contaminated", col("n_eval_near") > 0)
      .drop("_qv", "_qn0", "_qn")
  }

  // ---- streaming ingest round ---------------------------------------------

  /** One micro-batch of the STREAMING ingest round — the body behind
    * [[ingestTriage]], exposed so a spec (or a manual re-drive) can
    * replay a batch id and observe the idempotence guard.
    *
    * Per batch: run [[graft.operators.Ingest.triage]] against the
    * persisted index, hand the fate-annotated frame to `route` (the
    * caller's policy: corpus sink, quarantine, metrics — same contract
    * as the batch operator), then append the ACCEPTED docs to the index
    * so later micro-batches dedup against earlier ones — the
    * cross-batch memory a stateless per-row gate cannot have.
    *
    * Replay guard: foreachBatch RE-EXECUTES a batch after a failure,
    * and an index append is not naturally idempotent (re-appended
    * postings would inflate df counts and re-pair docs with
    * themselves). The batch-id ledger in `{index}_batches` makes a
    * replay of any COMMITTED batch a no-op; for an UNCOMMITTED batch,
    * the append stamps its rows under a `batch_id` partition and the
    * replay first [[graft.operators.ShingleIndex.pruneBatch prunes]]
    * whatever a crashed attempt half-committed (postings without
    * shingles, or both without the ledger row) before redoing the
    * work — so the INDEX converges to exactly-once on restart. Two
    * honest limits remain: between a crash and the restart, index
    * readers can see the half-committed batch (convergence, not
    * isolation); and `route` still fires at-least-once — a
    * non-idempotent route action must key off the batch id on its own
    * sink. */
  def ingestBatch(batch: DataFrame, batchId: Long, idCol: String,
      textCol: String, cfg: graft.operators.Ingest.Config,
      route: (DataFrame, Long) => Unit,
      lease: Option[String] = None): Unit = {
    val spark = batch.sparkSession
    import spark.implicits._
    val ledger = s"${cfg.indexName}_batches"
    val replayed = spark.catalog.tableExists(ledger) &&
      spark.table(ledger).filter(col("batch_id") === batchId)
        .head(1).nonEmpty
    if (!replayed) {
      // single-writer guard, checked BEFORE any mutation: if another
      // writer (second stream, concurrent compaction) took the lease
      // since this loop started, fail loudly instead of interleaving
      lease.foreach(graft.operators.WriterLease.check(spark, cfg.indexName, _))
      // crash repair: drop anything a previous attempt of THIS batch
      // appended before dying short of the ledger row (no-op on the
      // normal first run — the partitions don't exist)
      graft.operators.ShingleIndex.pruneBatch(spark, cfg.indexName, batchId)
      val fates = graft.operators.Ingest.triage(batch, idCol, textCol, cfg)
        // one computation feeds route AND the accepted-side append
        .persist()
      try {
        route(fates, batchId)
        graft.operators.ShingleIndex.append(
          fates.filter(col("fate") === "accepted")
            .select(col("doc_id"), col("text")),
          "doc_id", "text", cfg.indexName, batchId, cfg.norm)
        Seq(batchId).toDF("batch_id").write.mode("append").saveAsTable(ledger)
      } finally {
        // the callees (Ingest.triage → ShingleIndex.incrementalPairs)
        // persist shared subtrees under the caller-clears-cache
        // convention, and THIS loop is the caller: a foreachBatch
        // stream never returns to a clearing scope, so without this
        // the pinned frames accumulate one set per micro-batch for
        // the stream's lifetime (executor storage, then disk). The
        // loop owns its session's cache between batches — run the
        // stream in a dedicated SparkSession if you cache elsewhere.
        spark.catalog.clearCache()
      }
    }
  }

  /** The streaming production ingest loop: a foreachBatch sink driving
    * [[ingestBatch]] — scrub → quality → Bloom gate → near-dup against
    * the PERSISTED, GROWING shingle index, with batch-id idempotence.
    * The index must exist ([[graft.operators.ShingleIndex.build]] it
    * over the seed corpus first); `checkpoint` is the stream's normal
    * recovery location. Stages 1–3 are stateless per-row maps; stage 4
    * is batch-bounded against the index — no unbounded state store
    * anywhere, the same 100 TB story as the batch round.
    *
    * Single writer per index: the ledger read/append and the index
    * append assume one active ingest stream owns `cfg.indexName`
    * (checkpointed streams already enforce one query per checkpoint;
    * running a SECOND stream against the same index would interleave
    * appends outside the ledger's guard). Fan ingest sources into one
    * stream (union) rather than running parallel writers. */
  def ingestTriage(docs: DataFrame, idCol: String, textCol: String,
      cfg: graft.operators.Ingest.Config, checkpoint: String,
      route: (DataFrame, Long) => Unit)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    // claim the writer lease once per stream start (takeover semantics
    // — a restart after a crash just re-takes it); every batch
    // re-checks, so a second writer turns this stream loud within one
    // batch instead of silently interleaving appends
    val lease = graft.operators.WriterLease.take(
      docs.sparkSession, cfg.indexName)
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch((b: DataFrame, id: java.lang.Long) =>
        ingestBatch(b, id, idCol, textCol, cfg, route, Some(lease)))
      .start()
  }

  // ---- streaming embedding ingest -----------------------------------------

  /** Config for the EMBEDDING ingest round — the vector face of
    * [[graft.operators.Ingest.Config]].
    *
    * @param indexName [[graft.operators.IvfIndex]] table-name prefix
    * @param threshold cosine above which a batch vector is a near-dup
    * @param assignProbe batch-side multi-assignment width (recall knob,
    *   same geometry as `Similarity.ivfNearDupPairs`) */
  final case class VectorIngestConfig(
      indexName: String, threshold: Double = 0.95, assignProbe: Int = 3)

  /** One micro-batch of the streaming EMBEDDING ingest round — the
    * vector mirror of [[ingestBatch]], with the identical
    * convergent-exactly-once contract: the `{index}_batches` ledger
    * makes a replay of a committed batch a no-op; an uncommitted
    * replay first [[graft.operators.IvfIndex.pruneBatch prunes]]
    * whatever a crashed attempt half-appended to the cell store before
    * redoing the work. Same honest limits as the text loop: readers
    * may see a torn batch between crash and restart (convergence, not
    * isolation), and `route` fires at-least-once.
    *
    * Per batch: near-dup triage against the stored corpus and earlier
    * rows of the same batch ([[graft.operators.IvfIndex
    * .incrementalNearDups]] — old×old never pairs, batch-bounded),
    * fates routed (`accepted` | `duplicate` with min-id `dup_of` |
    * `zero_norm` for vectors cosine cannot compare), then the accepted
    * vectors append to the index under this batch's partition so later
    * micro-batches dedup against earlier ones. */
  def vectorIngestBatch(batch: DataFrame, batchId: Long, idCol: String,
      vecCol: String, cfg: VectorIngestConfig,
      route: (DataFrame, Long) => Unit,
      lease: Option[String] = None): Unit = {
    val spark = batch.sparkSession
    import spark.implicits._
    val ledger = s"${cfg.indexName}_batches"
    val replayed = spark.catalog.tableExists(ledger) &&
      spark.table(ledger).filter(col("batch_id") === batchId)
        .head(1).nonEmpty
    if (!replayed) {
      lease.foreach(graft.operators.WriterLease.check(spark, cfg.indexName, _))
      graft.operators.IvfIndex.pruneBatch(spark, cfg.indexName, batchId)
      val dups = graft.operators.IvfIndex.incrementalNearDups(
        batch, idCol, vecCol, cfg.indexName, cfg.threshold, cfg.assignProbe)
      // keeper rule lives in ONE place (shared with the p44 gate)
      val dropped = graft.operators.IvfIndex.dupKeeperMap(dups)
      val fates = batch
        .select(col(idCol).as("vec_id"), col(vecCol).as("vec"))
        .withColumn("_n", sqrt(graft.operators.Similarity.dot(
          col("vec"), col("vec"))))
        .join(dropped, Seq("vec_id"), "left")
        .select(col("vec_id"), col("vec"),
          when(coalesce(col("_n"), lit(0.0)) <= 0, lit("zero_norm"))
            .when(col("dup_of").isNotNull, lit("duplicate"))
            .otherwise(lit("accepted")).as("fate"),
          when(coalesce(col("_n"), lit(0.0)) > 0, col("dup_of")).as("dup_of"))
        .persist()
      try {
        route(fates, batchId)
        graft.operators.IvfIndex.append(
          fates.filter(col("fate") === "accepted")
            .select(col("vec_id"), col("vec")),
          "vec_id", "vec", cfg.indexName, batchId)
        Seq(batchId).toDF("batch_id").write.mode("append").saveAsTable(ledger)
      } finally {
        // same cache-ownership rule as [[ingestBatch]]: the callee
        // (IvfIndex.incrementalNearDups) persists its batch frames
        // under the caller-clears-cache convention, and this loop is
        // the caller that never returns to a clearing scope — clear
        // per batch or leak one pinned set per micro-batch forever
        spark.catalog.clearCache()
      }
    }
  }

  /** The streaming embedding ingest loop: a foreachBatch sink driving
    * [[vectorIngestBatch]] — near-dup triage against the PERSISTED,
    * GROWING IVF index with batch-id idempotence. The index must exist
    * ([[graft.operators.IvfIndex.build]] it over the seed corpus
    * first — centroids stay frozen across appends; schedule periodic
    * rebuilds if the ingest distribution drifts). Same single-writer
    * rule and lease guard as [[ingestTriage]]. */
  def vectorIngest(vectors: DataFrame, idCol: String, vecCol: String,
      cfg: VectorIngestConfig, checkpoint: String,
      route: (DataFrame, Long) => Unit)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val lease = graft.operators.WriterLease.take(
      vectors.sparkSession, cfg.indexName)
    vectors.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch((b: DataFrame, id: java.lang.Long) =>
        vectorIngestBatch(b, id, idCol, vecCol, cfg, route, Some(lease)))
      .start()
  }

  /** One micro-batch of the streaming FREQUENCY-STATS ingest — the
    * [[graft.operators.CmsStore]] mirror of [[ingestBatch]], same
    * convergent-exactly-once ledger contract. Unlike the index loops
    * there is no triage/route: the batch contributes ONLY its
    * depth × width counter matrix (bounded rows per append no matter
    * how large the batch), so this is the cheapest member of the
    * family — and the one whose torn-batch window is benign by the
    * sketch's own contract (a half-committed batch can only
    * OVER-estimate, which the CMS read API already promises). */
  def statsIngestBatch(batch: DataFrame, batchId: Long, idCol: String,
      textCol: String, name: String,
      lease: Option[String] = None): Unit =
    ledgeredAppend(batch.sparkSession, name, batchId, lease)(
      graft.operators.CmsStore.pruneBatch(batch.sparkSession, name, batchId),
      graft.operators.CmsStore.append(batch, idCol, textCol, name, batchId))

  /** THE ledger-replay wrapper every accumulation-only store loop
    * shares (CMS stats, BM25 postings, drift reports, the DSIR model):
    * skip a ledger-committed batch, check the writer lease, prune a
    * torn attempt, run the store's append, then commit the ledger row
    * — the convergent-exactly-once contract stated exactly once, so a
    * fix to the replay/lease ordering cannot desync across families.
    * `prune` and `append` are by-name: neither runs for a replayed
    * batch. */
  private def ledgeredAppend(spark: SparkSession, name: String,
      batchId: Long, lease: Option[String])(
      prune: => Unit, append: => Unit): Unit = {
    import spark.implicits._
    val ledger = s"${name}_batches"
    val replayed = spark.catalog.tableExists(ledger) &&
      spark.table(ledger).filter(col("batch_id") === batchId)
        .head(1).nonEmpty
    if (!replayed) {
      lease.foreach(graft.operators.WriterLease.check(spark, name, _))
      prune
      append
      Seq(batchId).toDF("batch_id").write.mode("append").saveAsTable(ledger)
    }
  }

  /** The streaming frequency-stats loop: a foreachBatch sink driving
    * [[statsIngestBatch]] against a [[graft.operators.CmsStore]] built
    * over the seed corpus. Same single-writer lease rule as the other
    * ingest loops; compact between restarts via [[compactIndex]]. */
  def statsIngest(docs: DataFrame, idCol: String, textCol: String,
      name: String, checkpoint: String)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val lease = graft.operators.WriterLease.take(docs.sparkSession, name)
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch((b: DataFrame, id: java.lang.Long) =>
        statsIngestBatch(b, id, idCol, textCol, name, Some(lease)))
      .start()
  }

  /** One micro-batch of the streaming RETRIEVAL-INDEX ingest — the
    * [[graft.operators.PostingIndex]] member of the family, same
    * ledger contract. Postings and the per-batch stats row land under
    * one `batch_id`, so the torn window prunes as one unit; like the
    * CMS loop there is no triage, only accumulation. */
  def postingIngestBatch(batch: DataFrame, batchId: Long, idCol: String,
      textCol: String, name: String,
      lease: Option[String] = None): Unit =
    ledgeredAppend(batch.sparkSession, name, batchId, lease)(
      graft.operators.PostingIndex.pruneBatch(batch.sparkSession, name,
        batchId),
      graft.operators.PostingIndex.append(batch, idCol, textCol, name,
        batchId))

  /** The streaming retrieval-index loop: foreachBatch driving
    * [[postingIngestBatch]] against a [[graft.operators.PostingIndex]]
    * built over the seed corpus. Queries served mid-stream see every
    * committed batch (df and corpus stats grow together — both live
    * under the same batch partitions). */
  def postingIngest(docs: DataFrame, idCol: String, textCol: String,
      name: String, checkpoint: String)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val lease = graft.operators.WriterLease.take(docs.sparkSession, name)
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch((b: DataFrame, id: java.lang.Long) =>
        postingIngestBatch(b, id, idCol, textCol, name, Some(lease)))
      .start()
  }

  /** One micro-batch of the streaming DRIFT monitor — the
    * [[graft.operators.DriftStore]] member of the family, same
    * convergent-exactly-once ledger contract as [[statsIngestBatch]]:
    * replayed batches are skipped via the ledger, torn batches are
    * pruned before re-reporting. The batch contributes one report row
    * per group (histogram-scale work against the FROZEN reference
    * histogram — the reference corpus is never rescanned), so like the
    * CMS loop this is accumulation only, no triage/route. */
  def driftIngestBatch(batch: DataFrame, batchId: Long, groupCol: String,
      valueCol: String, name: String,
      lease: Option[String] = None): Unit =
    ledgeredAppend(batch.sparkSession, name, batchId, lease)(
      graft.operators.DriftStore.pruneBatch(batch.sparkSession, name,
        batchId),
      graft.operators.DriftStore.appendReport(batch, groupCol, valueCol,
        name, batchId))

  /** The streaming drift-monitor loop: foreachBatch driving
    * [[driftIngestBatch]] against a [[graft.operators.DriftStore]]
    * built over the reference corpus — per-micro-batch chi-square
    * health reports with the same single-writer lease rule as the
    * other loops. The monitor only APPENDS reports; acting on them
    * (alerting, re-baselining via DriftStore.build) is the consumer's
    * policy. */
  def driftIngest(rows: DataFrame, groupCol: String, valueCol: String,
      name: String, checkpoint: String)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val lease = graft.operators.WriterLease.take(rows.sparkSession, name)
    rows.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch((b: DataFrame, id: java.lang.Long) =>
        driftIngestBatch(b, id, groupCol, valueCol, name, Some(lease)))
      .start()
  }

  /** One micro-batch of the streaming DSIR model — the
    * [[graft.operators.DsirStore]] member of the family, same
    * convergent-exactly-once ledger contract as [[statsIngestBatch]]:
    * replayed batches are skipped via the ledger, torn batches are
    * pruned before re-appending. Each batch contributes one ≤ buckets-
    * row source histogram (counter addition on read — the accumulated
    * model is bit-identical to a from-scratch fit over everything
    * ingested), so this is accumulation only; scoring is the
    * consumer's call ([[graft.operators.DsirStore.weights]]). */
  def dsirIngestBatch(batch: DataFrame, batchId: Long, idCol: String,
      textCol: String, name: String,
      lease: Option[String] = None): Unit =
    ledgeredAppend(batch.sparkSession, name, batchId, lease)(
      graft.operators.DsirStore.pruneBatch(batch.sparkSession, name,
        batchId),
      graft.operators.DsirStore.append(batch, idCol, textCol, name, batchId))

  /** The streaming DSIR-model loop: foreachBatch driving
    * [[dsirIngestBatch]] against a [[graft.operators.DsirStore]] built
    * over the base corpus + frozen target — the source distribution
    * the importance weights are computed against grows with every
    * micro-batch, at ≤ buckets rows per batch, without the stream ever
    * re-reading old data. Same single-writer lease rule as the other
    * loops. */
  def dsirIngest(docs: DataFrame, idCol: String, textCol: String,
      name: String, checkpoint: String)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val lease = graft.operators.WriterLease.take(docs.sparkSession, name)
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch((b: DataFrame, id: java.lang.Long) =>
        dsirIngestBatch(b, id, idCol, textCol, name, Some(lease)))
      .start()
  }

  /** One micro-batch of the streaming cluster-balanced SAMPLE — the
    * [[graft.operators.SampleStore]] member of the family, same
    * convergent-exactly-once ledger contract: the batch pays its own
    * assignment against the FROZEN cells and appends ≤ cells·k local
    * quota winners; min-k associativity makes the served sample ≡ the
    * one-shot operator over everything ingested. */
  def sampleIngestBatch(batch: DataFrame, batchId: Long, idCol: String,
      vecCol: String, name: String,
      lease: Option[String] = None): Unit =
    ledgeredAppend(batch.sparkSession, name, batchId, lease)(
      graft.operators.SampleStore.pruneBatch(batch.sparkSession, name,
        batchId),
      graft.operators.SampleStore.append(batch, idCol, vecCol, name,
        batchId))

  /** The streaming sample-maintenance loop: foreachBatch driving
    * [[sampleIngestBatch]] against a [[graft.operators.SampleStore]]
    * built over the base corpus — an always-fresh topic-balanced
    * eval/probe set over an endless stream at ≤ cells·k rows per
    * batch, never re-reading old data. Same single-writer lease rule
    * as the other loops. */
  def sampleIngest(vectors: DataFrame, idCol: String, vecCol: String,
      name: String, checkpoint: String)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val lease = graft.operators.WriterLease.take(vectors.sparkSession, name)
    vectors.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch((b: DataFrame, id: java.lang.Long) =>
        sampleIngestBatch(b, id, idCol, vecCol, name, Some(lease)))
      .start()
  }

  /** Ledger-aware index compaction for a STOPPED ingest stream: folds
    * every ledger-committed batch partition into the index's base
    * corpus while leaving any appended-but-uncommitted batch (a crash
    * the stream has not replayed yet) prunable in place. Handles BOTH
    * index families — the table layout names the family: a shingle
    * index has `{name}_idx` ([[graft.operators.ShingleIndex.compact]]),
    * an IVF index has `{name}_cells`
    * ([[graft.operators.IvfIndex.compact]]) — so one maintenance
    * entry point serves text and embedding ingest alike. The
    * uncommitted set is computed, not assumed: batch ids stamped in the
    * index's REGISTERED partitions (SHOW PARTITIONS — catalog metadata
    * only; a `select(batch_id).distinct()` would scan the postings,
    * Spark's metadata-only rewrite being off by default) minus the
    * ledger's committed ids. Run between stream restarts — compaction
    * is a writer, and it TAKES the writer lease, so an ingest stream
    * mistakenly left running fails loudly at its next batch instead of
    * interleaving with the rewrite. (A third family dispatches the
    * same way: a CMS stats store has `{name}_cms` —
    * [[graft.operators.CmsStore.compact]] additionally MERGES folded
    * counters so the base partition shrinks back to one matrix.) */
  def compactIndex(spark: SparkSession, indexName: String): Unit = {
    val ledger = s"${indexName}_batches"
    val (partTable, runCompact) =
      if (spark.catalog.tableExists(s"${indexName}_idx"))
        (s"${indexName}_idx",
          (u: Set[Long]) => graft.operators.ShingleIndex.compact(
            spark, indexName, u))
      else if (spark.catalog.tableExists(s"${indexName}_cells"))
        (s"${indexName}_cells",
          (u: Set[Long]) => graft.operators.IvfIndex.compact(
            spark, indexName, u))
      else if (spark.catalog.tableExists(s"${indexName}_cms"))
        (s"${indexName}_cms",
          (u: Set[Long]) => graft.operators.CmsStore.compact(
            spark, indexName, u))
      else if (spark.catalog.tableExists(s"${indexName}_post"))
        (s"${indexName}_post",
          (u: Set[Long]) => graft.operators.PostingIndex.compact(
            spark, indexName, u))
      else if (spark.catalog.tableExists(s"${indexName}_dsir"))
        (s"${indexName}_dsir",
          (u: Set[Long]) => graft.operators.DsirStore.compact(
            spark, indexName, u))
      else if (spark.catalog.tableExists(s"${indexName}_smpl"))
        (s"${indexName}_smpl",
          (u: Set[Long]) => graft.operators.SampleStore.compact(
            spark, indexName, u))
      else if (spark.catalog.tableExists(s"${indexName}_drift"))
        (s"${indexName}_drift",
          (u: Set[Long]) => graft.operators.DriftStore.compact(
            spark, indexName, u))
      else throw new IllegalArgumentException(
        s"no persisted index named '$indexName' — none of " +
          s"${indexName}_idx (shingle), ${indexName}_cells (IVF), " +
          s"${indexName}_cms (CMS stats), ${indexName}_post (BM25), " +
          s"${indexName}_dsir (DSIR model), ${indexName}_smpl " +
          s"(balanced sample), or ${indexName}_drift (drift reports) " +
          "exists")
    graft.operators.WriterLease.take(spark, indexName)
    val appended = spark.sql(s"SHOW PARTITIONS $partTable")
      .collect()
      .flatMap(_.getString(0).split('/').find(_.startsWith("batch_id=")))
      .map(_.stripPrefix("batch_id=").toLong).toSet
    val committed =
      if (spark.catalog.tableExists(ledger))
        spark.table(ledger).select(col("batch_id")).collect()
          .map(_.getLong(0)).toSet
      else Set.empty[Long]
    runCompact(
      appended -- committed - graft.operators.ShingleIndex.BaseBatch)
  }

  def compactIndex(spark: SparkSession,
      cfg: graft.operators.Ingest.Config): Unit =
    compactIndex(spark, cfg.indexName)

  // ---- cross-family atomic ingest ----------------------------------------

  /** One persisted-store family's lifecycle hooks AS DATA, for the
    * cross-family loop [[multiIngestBatch]]: `prune` undoes whatever a
    * crashed attempt of a batch half-appended (partition surgery,
    * idempotent, no-op if the batch never landed) and `append` stamps
    * the batch under its `batch_id` partition — exactly the pair every
    * family already exposes; the constructors below just close over
    * the column names. The hooks are the SAME functions the
    * single-family loops call, so a family behaves identically whether
    * it is ingested alone or inside a group. */
  final case class StoreFamily(
      name: String,
      prune: (SparkSession, Long) => Unit,
      append: (DataFrame, Long) => Unit,
      /** The text normalizer the family's append closes over (None for
        * non-tokenizing families — drift/vectors/sample). Carried so
        * [[triageMultiIngestBatch]] can ASSERT it matches `cfg.norm`
        * instead of trusting a comment: a group whose triage
        * normalizes Unicode but whose posting family defaults to ASCII
        * would commit divergent tokenizations under one manifest row
        * (empty postings but counted stats for a non-Latin batch). */
      norm: Option[Column => Column] = None)

  object StoreFamily {
    // Text families take the SAME pluggable normalizer their stores
    // were built with (ASCII default) — a group ingest with a Unicode
    // triage (Ingest.Config.norm) must pass the matching normalizer
    // here too, or one commit would write divergent tokenizations
    // (empty postings but counted stats rows, for a CJK batch).
    def shingle(name: String, idCol: String, textCol: String,
        norm: Column => Column = graft.functions.TextFns.normText)
        : StoreFamily =
      StoreFamily(name,
        (s, id) => graft.operators.ShingleIndex.pruneBatch(s, name, id),
        (b, id) => graft.operators.ShingleIndex.append(b, idCol, textCol,
          name, id, norm), norm = Some(norm))
    def posting(name: String, idCol: String, textCol: String,
        norm: Column => Column = graft.functions.TextFns.normText)
        : StoreFamily =
      StoreFamily(name,
        (s, id) => graft.operators.PostingIndex.pruneBatch(s, name, id),
        (b, id) => graft.operators.PostingIndex.append(b, idCol, textCol,
          name, id, norm), norm = Some(norm))
    def cms(name: String, idCol: String, textCol: String,
        norm: Column => Column = graft.functions.TextFns.normText)
        : StoreFamily =
      StoreFamily(name,
        (s, id) => graft.operators.CmsStore.pruneBatch(s, name, id),
        (b, id) => graft.operators.CmsStore.append(b, idCol, textCol,
          name, id, norm), norm = Some(norm))
    def dsir(name: String, idCol: String, textCol: String,
        norm: Column => Column = graft.functions.TextFns.normText)
        : StoreFamily =
      StoreFamily(name,
        (s, id) => graft.operators.DsirStore.pruneBatch(s, name, id),
        (b, id) => graft.operators.DsirStore.append(b, idCol, textCol,
          name, id, norm), norm = Some(norm))
    def drift(name: String, groupCol: String, valueCol: String): StoreFamily =
      StoreFamily(name,
        (s, id) => graft.operators.DriftStore.pruneBatch(s, name, id),
        (b, id) => graft.operators.DriftStore.appendReport(b, groupCol,
          valueCol, name, id))
    /** Plain accumulation into the IVF cell store (vs frozen
      * centroids) — the near-dup TRIAGE of [[vectorIngestBatch]] is an
      * upstream policy, not a store append: pre-filter the stream if
      * only novel vectors should land. */
    def vectors(name: String, idCol: String, vecCol: String): StoreFamily =
      StoreFamily(name,
        (s, id) => graft.operators.IvfIndex.pruneBatch(s, name, id),
        (b, id) => graft.operators.IvfIndex.append(b, idCol, vecCol,
          name, id))
    def sample(name: String, idCol: String, vecCol: String): StoreFamily =
      StoreFamily(name,
        (s, id) => graft.operators.SampleStore.pruneBatch(s, name, id),
        (b, id) => graft.operators.SampleStore.append(b, idCol, vecCol,
          name, id))
  }

  /** One micro-batch of the CROSS-FAMILY atomic ingest: N store
    * families updated from ONE stream under ONE commit point, so a
    * crash can never leave two families at different batch horizons
    * unrepaired — the gap the per-family ledgers cannot see (family A
    * appended batch 7, family B didn't; A's own ledger says nothing
    * wrong, B's says batch 7 never happened, and nobody knows A must
    * be pruned).
    *
    * The commit point is one row in `{group}_manifest`, written after
    * EVERY family's append. Crash anywhere before it — mid-append,
    * between families, after the last append — and the replay finds no
    * manifest row, prunes the batch's partitions in ALL families
    * (idempotent surgery; a family that never appended is a no-op) and
    * redoes every append. Crash after it and the replay skips the
    * batch entirely. Either way every family converges to exactly the
    * manifest's horizon.
    *
    * Per-family `{name}_batches` ledgers are BACKFILLED after the
    * manifest commit (idempotently, on the replay path too, closing
    * the crash-between-manifest-and-backfill window), so the
    * single-family maintenance surface — [[compactIndex]], whose
    * committed set is the family ledger — keeps working unchanged on a
    * group member. Family-committed is always a subset of
    * manifest-committed, so per-family compaction can never fold a
    * batch the group would still need to prune; a manifest-committed
    * batch whose backfill was interrupted merely stays un-folded until
    * the next batch (or stream restart) backfills it.
    *
    * Scale: the batch is persisted once and feeds all N appends (each
    * family pays its own batch-scale reduce — tokenize, assign,
    * histogram — exactly as it would alone); nothing stored is read.
    * Same convergence-not-isolation caveat as every loop here: between
    * a crash and the replay, readers may see a torn batch.
    *
    * Single-writer: the group loop owns every member family —
    * [[multiIngest]] takes the group lease AND each family lease, and
    * each batch re-checks all of them, so a stray single-family stream
    * or a concurrent compaction turns loud within one batch. */
  def multiIngestBatch(batch: DataFrame, batchId: Long, group: String,
      families: Seq[StoreFamily],
      leases: Map[String, String] = Map.empty): Unit = {
    val spark = batch.sparkSession
    import spark.implicits._
    require(families.nonEmpty, "multiIngestBatch: need at least one family")
    require(families.map(_.name).distinct.size == families.size,
      "multiIngestBatch: family names must be unique, got " +
        families.map(_.name).mkString(", "))
    val manifest = s"${group}_manifest"
    val committed = spark.catalog.tableExists(manifest) &&
      spark.table(manifest).filter(col("batch_id") === batchId)
        .head(1).nonEmpty
    if (!committed) {
      leases.foreach { case (n, t) =>
        graft.operators.WriterLease.check(spark, n, t)
      }
      families.foreach(_.prune(spark, batchId))
      val pinned = batch.persist()
      try families.foreach(_.append(pinned, batchId))
      finally { pinned.unpersist(); () }
      Seq(batchId).toDF("batch_id").write.mode("append").saveAsTable(manifest)
    }
    // family-ledger backfill — AFTER the manifest commit, never before:
    // a family row ahead of the manifest would let that family's
    // compaction fold a batch the group replay still needs to prune
    families.foreach { f =>
      val ledger = s"${f.name}_batches"
      val has = spark.catalog.tableExists(ledger) &&
        spark.table(ledger).filter(col("batch_id") === batchId)
          .head(1).nonEmpty
      if (!has)
        Seq(batchId).toDF("batch_id").write.mode("append")
          .saveAsTable(ledger)
    }
  }

  /** One micro-batch of the TRIAGE-DRIVEN group ingest — the full
    * production pipeline under one commit point: the batch triages
    * against the persisted shingle index ([[graft.operators.Ingest]]),
    * `route` observes every fate (at-least-once, as in [[ingestBatch]]),
    * and then the ACCEPTED docs — not the raw batch — feed the shingle
    * index AND every derived family. This closes the last two-commit-
    * domain gap: with [[ingestTriage]] for dedup and a separate
    * [[multiIngest]] for the derived stores, a crash between the two
    * streams' commits could leave the index holding a batch the
    * posting/CMS/DSIR stores never saw (or vice versa); here one
    * `{group}_manifest` row covers them all, and the replay contract
    * is [[multiIngestBatch]]'s verbatim — prune everywhere, redo
    * everything, or skip everywhere.
    *
    * Triage normalizes its output to (doc_id, text, …) whatever the
    * input column names, so member families must close over
    * ("doc_id", "text") — e.g. `StoreFamily.posting(name, "doc_id",
    * "text")` — regardless of `idCol`/`textCol`.
    *
    * The derived families see exactly the docs the index accepted, so
    * the doc-disjointness contract every append family states is
    * enforced by construction: a near-dup re-submission is triaged
    * into `duplicate` and never reaches an append.
    *
    * The triage result is computed ONCE and feeds route, the index
    * append, and all family appends; the session cache is cleared in
    * `finally` ([[ingestBatch]]'s convention — triage persists shared
    * subtrees and a foreachBatch loop never returns to a clearing
    * scope). */
  def triageMultiIngestBatch(batch: DataFrame, batchId: Long,
      idCol: String, textCol: String,
      cfg: graft.operators.Ingest.Config, group: String,
      families: Seq[StoreFamily],
      route: (DataFrame, Long) => Unit = (_, _) => (),
      leases: Map[String, String] = Map.empty): Unit = {
    val spark = batch.sparkSession
    import spark.implicits._
    require(!families.exists(_.name == cfg.indexName),
      s"triageMultiIngestBatch: the triage index '${cfg.indexName}' is " +
        "a group member implicitly — do not list it as a family too")
    require(families.map(_.name).distinct.size == families.size,
      "triageMultiIngestBatch: family names must be unique, got " +
        families.map(_.name).mkString(", ") +
        " — a repeated family would append the batch twice into one " +
        "store under one batch_id, which prune/replay cannot repair")
    // the same-normalizer invariant is ASSERTED, not commented: every
    // tokenizing family must normalize exactly as the triage does
    // (Column.equals compares the normalized expression trees the two
    // functions build over a probe column — identical normalizers
    // build identical trees)
    locally {
      val probe = col("__graft_norm_probe__")
      val want = cfg.norm(probe)
      families.foreach(f => f.norm.foreach(n =>
        require(n(probe) == want,
          s"triageMultiIngestBatch: family '${f.name}' was constructed " +
            "with a text normalizer different from cfg.norm — one " +
            "manifest commit would write divergent tokenizations " +
            "(empty postings but counted stats rows for a non-Latin " +
            "batch); pass the SAME normalizer to the StoreFamily " +
            "constructor and Ingest.Config")))
    }
    val manifest = s"${group}_manifest"
    val committed = spark.catalog.tableExists(manifest) &&
      spark.table(manifest).filter(col("batch_id") === batchId)
        .head(1).nonEmpty
    if (!committed) {
      leases.foreach { case (n, t) =>
        graft.operators.WriterLease.check(spark, n, t)
      }
      graft.operators.ShingleIndex.pruneBatch(spark, cfg.indexName, batchId)
      families.foreach(_.prune(spark, batchId))
      val fates = graft.operators.Ingest
        .triage(batch, idCol, textCol, cfg).persist()
      try {
        route(fates, batchId)
        val accepted = fates.filter(col("fate") === "accepted")
          .select(col("doc_id"), col("text"))
        graft.operators.ShingleIndex.append(accepted, "doc_id", "text",
          cfg.indexName, batchId, cfg.norm)
        families.foreach(_.append(accepted, batchId))
        Seq(batchId).toDF("batch_id").write.mode("append")
          .saveAsTable(manifest)
      } finally spark.catalog.clearCache()
    }
    (cfg.indexName +: families.map(_.name)).foreach { n =>
      val ledger = s"${n}_batches"
      val has = spark.catalog.tableExists(ledger) &&
        spark.table(ledger).filter(col("batch_id") === batchId)
          .head(1).nonEmpty
      if (!has)
        Seq(batchId).toDF("batch_id").write.mode("append")
          .saveAsTable(ledger)
    }
  }

  /** The triage-driven group loop: foreachBatch driving
    * [[triageMultiIngestBatch]] — scrub → quality → Bloom gate →
    * near-dup triage against the growing shingle index, then every
    * derived store ingests the accepted docs, all under one manifest
    * commit per micro-batch. The index and every family must be built
    * first; compact via [[compactGroup]]/[[compactIndex]] between
    * restarts. */
  def triageMultiIngest(docs: DataFrame, idCol: String, textCol: String,
      cfg: graft.operators.Ingest.Config, group: String,
      families: Seq[StoreFamily], checkpoint: String,
      route: (DataFrame, Long) => Unit = (_, _) => ())
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val spark = docs.sparkSession
    val leases = (group +: cfg.indexName +: families.map(_.name))
      .map(n => n -> graft.operators.WriterLease.take(spark, n)).toMap
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch((b: DataFrame, id: java.lang.Long) =>
        triageMultiIngestBatch(b, id, idCol, textCol, cfg, group,
          families, route, leases))
      .start()
  }

  /** Compact every member family of a STOPPED group ingest — the
    * group face of [[compactIndex]], one call per maintenance window.
    * Valid precisely because the ledger backfill keeps
    * family-committed ⊆ manifest-committed: each family's own ledger
    * already names every batch safe to fold, so per-family compaction
    * needs no group awareness (a manifest-committed batch whose
    * backfill was interrupted simply stays un-folded until the next
    * backfill — safe, bounded by one batch). */
  def compactGroup(spark: SparkSession,
      families: Seq[StoreFamily]): Unit =
    families.foreach(f => compactIndex(spark, f.name))

  /** The cross-family atomic ingest loop: foreachBatch driving
    * [[multiIngestBatch]] — one stream feeding shingle + posting + CMS
    * + DSIR (+ any other family) with ONE commit point per batch. All
    * member stores must be built over the seed corpus first; compact
    * members between restarts via [[compactGroup]] (or per family via
    * [[compactIndex]]). */
  def multiIngest(docs: DataFrame, group: String,
      families: Seq[StoreFamily], checkpoint: String)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val spark = docs.sparkSession
    val leases = (group +: families.map(_.name))
      .map(n => n -> graft.operators.WriterLease.take(spark, n)).toMap
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch((b: DataFrame, id: java.lang.Long) =>
        multiIngestBatch(b, id, group, families, leases))
      .start()
  }
}
