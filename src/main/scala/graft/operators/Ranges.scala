package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal / range join operators Spark lacks natively, built as
  * linear-cost compositions of the operators it has.
  *
  * - [[asofJoin]]: "most recent right row at-or-before each left row"
  *   (the time-series enrichment join). NOT implemented as a
  *   point-in-interval join — that explodes candidates quadratically on
  *   hot keys. Instead both sides are unioned and a single running
  *   window per key carries the latest right-hand payload forward: one
  *   shuffle on the key, one sort, zero candidate blowup. The same plan
  *   holds at 100 TB because cost is O(|L|+|R|) rows shuffled once.
  *
  * - [[bandPairs]]: all ordered pairs whose numeric values differ by at
  *   most `eps`, with NO equi key. The classic scale trap is the
  *   theta-join |a.v − b.v| ≤ eps, which Spark can only plan as a
  *   broadcast-nested-loop. Bucketing by `floor(v/eps)` turns it into an
  *   equi join: a pair within `eps` differs by at most one bucket
  *   (|a−b| ≤ eps ⇒ |⌊a/eps⌋−⌊b/eps⌋| ≤ 1), so probing the build side
  *   exploded to its three neighboring buckets finds every qualifying
  *   pair exactly once. Cost is the true candidate count (pairs within
  *   ~3·eps), not |L|·|R|; value-skew concentrates buckets, which AQE
  *   skew-join splitting absorbs.
  */
object Ranges {

  /** As-of join: for each `left` row, attach the `right` row with the
    * greatest `tsCol` ≤ the left row's `tsCol` within the same `keyCol`
    * group (at-or-before semantics — a right row at the exact same
    * instant matches); `forward = true` flips to the SMALLEST ts ≥ the
    * left row's ("next event at-or-after" — conversion-latency
    * analytics). Left rows with no matching right row keep NULLs.
    *
    * `right` must expose `keyCol`, `tsCol`, and `valCols`; its payload
    * is attached as `<prefix><tsCol>` and `<prefix><valCol>` columns.
    * Precondition: `right` is unique per (key, ts) — with duplicates the
    * surviving payload among same-instant rows is unspecified (matching
    * DuckDB ASOF, which is similarly tie-arbitrary).
    *
    * Plan: union-tag both sides (right `_side=0` sorts before left
    * `_side=1` at equal ts), one window per key ordered by (ts, side)
    * with a running `last(payload, ignoreNulls)` — a single hash
    * exchange on `keyCol` and a per-partition sort; no join node at all.
    *
    * @param toleranceSec pandas merge_asof-style max match gap: a
    *   carried payload further than this many seconds from the left
    *   row's ts is nulled (post-window mask — plan shape unchanged).
    *   Timestamp ts columns compare at seconds granularity; numeric ts
    *   columns compare in their own units. Constraint: a TIMESTAMP_NTZ
    *   ts column is zone-less, so its seconds come from interpreting
    *   the wall-clock in the SESSION time zone — wall-clock-faithful
    *   only under the UTC session [[graft.Sessions]] pins (asserted
    *   below; under a non-UTC session an NTZ side mixed with a TZ side
    *   would skew by the zone offset).
    */
  def asofJoin(left: DataFrame, right: DataFrame, keyCol: String,
      tsCol: String, valCols: Seq[String],
      prefix: String = "asof_", forward: Boolean = false,
      toleranceSec: Option[Long] = None): DataFrame = {
    require(toleranceSec.forall(_ >= 0),
      s"asofJoin tolerance must be non-negative, got $toleranceSec")
    val reserved = Set("_rv", "_side", "_m")
    require(!left.columns.exists(reserved), s"asofJoin: left side uses " +
      s"reserved internal column names ${left.columns.filter(reserved).mkString(", ")}")
    // output-name collisions (e.g. chaining two asofJoins with the same
    // tsCol and default prefix) would emit duplicate columns that only
    // fail far downstream with AMBIGUOUS_REFERENCE — reject up front
    val outNames = (tsCol +: valCols).map(v => s"$prefix$v")
    require(!left.columns.exists(outNames.contains),
      s"asofJoin: output name(s) ${outNames.filter(left.columns.contains)
        .mkString(", ")} already exist on the left side — pass a distinct prefix")
    val payload = struct(col(tsCol).as("_ts") +: valCols.map(col): _*)
    // NULL-ts right rows can never satisfy the ts comparison in SQL —
    // drop them, or the NULLS-edge sort position would carry their
    // payload into neighboring left rows
    val r = right.filter(col(tsCol).isNotNull)
      .select(col(keyCol), col(tsCol), payload.as("_rv"), lit(0).as("_side"))
    val leftCols = left.columns.toSeq
    val l = left
      .withColumn("_rv", lit(null).cast(r.schema("_rv").dataType))
      .withColumn("_side", lit(1))
    // forward=true flips the scan direction: descending ts with the
    // right side still ordered first at ties gives each left row the
    // EARLIEST right row at-or-after it ("next event" semantics,
    // DuckDB ASOF with l.ts <= r.ts) — same single-shuffle plan.
    val tsOrder = if (forward) col(tsCol).desc else col(tsCol).asc
    val w = Window.partitionBy(col(keyCol))
      .orderBy(tsOrder, col("_side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // SQL join semantics for NULLs: a NULL key never equals a NULL key
    // and a NULL left ts satisfies no ts comparison, so rows with
    // either stay unmatched — but partitionBy groups all NULL keys
    // together and NULLS-FIRST ordering would hand them payloads.
    // Masking keeps parity with ASOF JOIN's ON k = k AND l.ts >= r.ts
    // (q22's oracle).
    val m = when(col(keyCol).isNotNull && col(tsCol).isNotNull,
      last(col("_rv"), ignoreNulls = true).over(w))
    // tolerance (merge_asof semantics): a carried payload further than
    // toleranceSec from the left row is nulled AFTER the window — a
    // post-mask, not a window change, so the plan shape (one exchange,
    // one sort) is untouched. Seconds granularity via unix_timestamp
    // works for timestamp ts columns; numeric ts columns compare
    // directly when the caller's unit is seconds.
    def withinTol(matched: org.apache.spark.sql.Column) =
      toleranceSec match {
        case None => matched
        case Some(tol) =>
          import org.apache.spark.sql.types.{NumericType, TimestampNTZType, TimestampType}
          val (a, b) = (col(tsCol), col("_m._ts"))
          def secs(c: org.apache.spark.sql.Column) =
            left.schema(tsCol).dataType match {
              // NTZ reads the same wall-clock through unix_timestamp
              // under the session's UTC default — tz-less parquet
              // sources (the regenerated testdata) surface ts as NTZ.
              // Zone-dependence makes that faithful ONLY under UTC, so
              // assert the session rather than silently skewing.
              case TimestampNTZType if {
                    // any zero-offset zone is wall-clock-identical to
                    // UTC ("Etc/UTC", "GMT", "+00:00" all normalize to
                    // Z) — reject only zones that would actually skew
                    val tz = left.sparkSession.conf
                      .get("spark.sql.session.timeZone")
                    java.time.ZoneId
                      .of(tz, java.time.ZoneId.SHORT_IDS)
                      .normalized() != java.time.ZoneOffset.UTC
                  } =>
                throw new IllegalArgumentException(
                  "asofJoin tolerance over a TIMESTAMP_NTZ ts column " +
                    "requires spark.sql.session.timeZone=UTC (NTZ has no " +
                    "zone; unix_timestamp would interpret it in the " +
                    "session zone and skew vs zoned timestamps)")
              case TimestampType | TimestampNTZType => unix_timestamp(c)
              // numeric ts: compare IN ORIGINAL UNITS, no cast — a
              // long-cast would truncate fractional ts and mis-decide
              // gaps by up to ~2 units around the tolerance boundary
              case _: NumericType => c
              case other => throw new IllegalArgumentException(
                s"asofJoin tolerance unsupported for ts type $other " +
                  "(timestamp or numeric required)")
            }
          when(abs(secs(a) - secs(b)) <= tol, matched)
      }
    l.unionByName(r, allowMissingColumns = true)
      .withColumn("_m", m)
      .filter(col("_side") === 1)
      .withColumn("_m", withinTol(col("_m")))
      .select(leftCols.map(col) ++
        (col("_m._ts").as(s"$prefix$tsCol") +:
          valCols.map(v => col(s"_m.$v").as(s"$prefix$v"))): _*)
  }

  /** Per-row band-partner statistics — the aggregate consumers usually
    * want from [[bandPairs]], computed WITHOUT materializing the pairs:
    * rows collapse to a value histogram, the band join runs over
    * DISTINCT values (cost O(V·band-width) for V distinct values, not
    * O(candidate pairs)), and per-row stats come from one final
    * histogram lookup join. For integer-valued columns (cents, token
    * counts) V is bounded by the value domain, so the expensive step is
    * histogram-sized at ANY corpus size — this is the 100 TB shape;
    * [[bandPairs]] stays for consumers that need the pair list itself.
    *
    * The min-partner column needs the band's two smallest ids (the
    * second covers rows that ARE the band minimum); both come from the
    * bounded native `graft_kmin` aggregate, never a collected id set.
    *
    * Exactness: same integer-value guidance as [[bandPairs]]; the
    * partner-value sum is value·count per histogram cell, so it is
    * exact for integral columns at any size.
    *
    * @return (ida, n_close, sum_partner_vals, min_partner_id) for rows
    *         with ≥ 1 partner — exactly what
    *         `bandPairs(...).groupBy("ida")` would aggregate to.
    */
  def bandStats(df: DataFrame, idCol: String, valCol: String,
      eps: Double): DataFrame = {
    require(eps > 0, s"bandStats eps must be positive, got $eps")
    // graft_kmin's bounded buffer is long-typed (no implicit casts in a
    // native aggregate) — accept any integral id by casting through
    // long and casting the reported partner id back, and reject
    // non-integral ids with a contract error instead of the aggregate's
    // opaque AnalysisException. bandPairs itself has no id-type limit;
    // this keeps the documented bandStats ≡ grouped-bandPairs
    // equivalence true for every id type bandStats can serve at all.
    import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
    val idType = df.schema(idCol).dataType
    require(Seq(ByteType, ShortType, IntegerType, LongType).contains(idType),
      s"bandStats needs an integral id column for its bounded k-min " +
        s"state; $idCol is $idType (use bandPairs + groupBy for other id types)")
    val rows = df.select(col(idCol).as("_id"), col(valCol).as("_v"))
    // value histogram: count, value·count, the cell's two smallest ids
    // (bounded graft_kmin state — never a collected id set)
    val hist = rows.groupBy(col("_v"))
      .agg(count(lit(1)).as("_cnt"),
        (col("_v") * count(lit(1))).as("_vsum"),
        call_function("graft_kmin", col("_id").cast("long"), lit(2))
          .as("_mins"))
      .persist()
    // band join over distinct values only (directed, INCLUDING v'==v —
    // same-value rows are partners; self is excluded arithmetically in
    // the final projection)
    val joined = hist.select(col("_v").as("va"),
        floor(col("_v") / eps).as("_bk"))
      .join(hist.select(col("_v").as("vb"), col("_cnt"), col("_vsum"),
        col("_mins"), explode(array(
          floor(col("_v") / eps) - 1,
          floor(col("_v") / eps),
          floor(col("_v") / eps) + 1)).as("_bk")), "_bk")
      .filter(abs(col("va") - col("vb")) <= eps)
    // two histogram-sized rollups (numeric + band two-smallest-ids —
    // any band id smaller than the band's 2nd smallest is some cell's
    // 1st or 2nd, so k-min over the exploded cell mins is exact)
    val numeric = joined.groupBy(col("va"))
      .agg(sum(col("_cnt")).as("_bandN"), sum(col("_vsum")).as("_bandSum"))
    val mins = joined.select(col("va"), explode(col("_mins")).as("_cand"))
      .groupBy(col("va"))
      .agg(call_function("graft_kmin", col("_cand"), lit(2)).as("_bmins"))
    rows.join(numeric.join(mins, "va"), col("_v") === col("va"))
      .filter(col("_bandN") > 1)
      .select(col("_id").as("ida"),
        (col("_bandN") - 1).as("n_close"),
        (col("_bandSum") - col("_v")).as("sum_partner_vals"),
        when(element_at(col("_bmins"), 1) =!= col("_id"),
            element_at(col("_bmins"), 1))
          .otherwise(element_at(col("_bmins"), 2))
          .cast(idType).as("min_partner_id"))
  }

  /** Band self-join: every DIRECTED pair (a, b), a ≠ b, with
    * |a.valCol − b.valCol| ≤ eps. Emitted directed so per-row partner
    * aggregates need no mirroring; halve downstream with ida < idb for
    * unordered pairs.
    *
    * Exactness note: the bucket assignment `floor(v/eps)` is only
    * candidate generation — membership is decided by the exact
    * `abs(a−b) ≤ eps` filter, so callers wanting bit-reproducible
    * results across engines should pass integer-valued columns (e.g.
    * cents) where the comparison is exact.
    *
    * @return (ida, va, idb, vb) — `va`/`vb` carry valCol for the two
    *         sides so callers can aggregate without re-joining.
    */
  def bandPairs(df: DataFrame, idCol: String, valCol: String,
      eps: Double): DataFrame = {
    require(eps > 0, s"bandPairs eps must be positive, got $eps")
    val probe = df.select(col(idCol).as("ida"), col(valCol).as("va"),
      floor(col(valCol) / eps).as("_bk"))
    val build = df.select(col(idCol).as("idb"), col(valCol).as("vb"),
      explode(array(
        floor(col(valCol) / eps) - 1,
        floor(col(valCol) / eps),
        floor(col(valCol) / eps) + 1)).as("_bk"))
    probe.join(build, "_bk")
      .filter(col("ida") =!= col("idb")
        && abs(col("va") - col("vb")) <= eps)
      .select(col("ida"), col("va"), col("idb"), col("vb"))
  }

  /** Regular-grid resample with last-observation-carried-forward — the
    * time-series densification step (sensor rollups, daily feature
    * snapshots from event streams). Per key: epoch-aligned slots every
    * `stepSec` seconds spanning that key's own [min ts, max ts], each
    * slot carrying the payload of the key's latest observation
    * at-or-before it.
    *
    * Plan shape: one aggregate for the per-key bounds, `sequence()` +
    * `explode` to generate slots ON EXECUTORS (grid size never touches
    * the driver — no driver-side date loop, the classic scale trap
    * here), then [[asofJoin]] attaches payloads — so the whole operator
    * is two shuffles on the key (bounds agg + as-of window), zero
    * joins, zero candidate blowup, and grid cost proportional to
    * slots-per-key which the caller controls via `stepSec`.
    *
    * Slots are UTC epoch multiples of `stepSec` (cross-engine
    * reproducible; slot instants are data-independent), so a key whose
    * span contains no aligned instant yields no rows.
    *
    * @return (keyCol, tsCol = slot instant, <prefix><tsCol> = observed
    *         ts carried forward, <prefix><valCol>…) — LOCF payload is
    *         never NULL because every slot is ≥ the key's first
    *         observation.
    */
  def resampleLocf(obs: DataFrame, keyCol: String, tsCol: String,
      valCols: Seq[String], stepSec: Long,
      prefix: String = "locf_"): DataFrame = {
    require(stepSec > 0, s"resampleLocf stepSec must be positive, got $stepSec")
    // integer slot arithmetic in doubles is exact here: epoch seconds
    // (< 2^35) stay far under the 2^53 double-integer limit
    def slotCeil(c: org.apache.spark.sql.Column) =
      floor((c + (stepSec - 1)).cast("double") / stepSec).cast("long") * stepSec
    def slotFloor(c: org.apache.spark.sql.Column) =
      floor(c.cast("double") / stepSec).cast("long") * stepSec
    // per-row CEIL to whole epoch seconds (unix_timestamp truncates):
    // without it a first observation at hh:mm:00.5 would admit the
    // hh:mm:00 slot, which precedes every observation and would carry a
    // NULL payload — ceil keeps the first slot at-or-after the first
    // observation, so LOCF payloads are total
    val ceilSec = when(
      timestamp_seconds(unix_timestamp(col(tsCol))) === col(tsCol),
      unix_timestamp(col(tsCol))).otherwise(unix_timestamp(col(tsCol)) + 1)
    // NULL-key observations build no grid: SQL join/window semantics
    // would attach no payload to a NULL-key slot (asofJoin masks NULL
    // keys), which would break the payload-totality contract below
    val grid = obs.filter(col(tsCol).isNotNull && col(keyCol).isNotNull)
      .groupBy(col(keyCol))
      .agg(min(ceilSec).as("_lo"),
        max(unix_timestamp(col(tsCol))).as("_hi"))
      .select(col(keyCol), slotCeil(col("_lo")).as("_s0"),
        slotFloor(col("_hi")).as("_s1"))
      .filter(col("_s0") <= col("_s1")) // span may straddle no slot
      .select(col(keyCol),
        explode(sequence(col("_s0"), col("_s1"), lit(stepSec))).as("_slot"))
      .select(col(keyCol), timestamp_seconds(col("_slot")).as(tsCol))
    asofJoin(grid, obs.select(col(keyCol) +: col(tsCol) +: valCols.map(col): _*),
      keyCol, tsCol, valCols, prefix)
  }
}
