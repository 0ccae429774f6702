package graft.queries

import graft.{QueryDef, Tables}
import graft.Tables.{countIf, dec2}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Second wave of the SURVEY.md §2 operator inventory, re-expressed over
  * the driver's tables. Covers: theta/array-membership joins (J5/J6),
  * min-max-normalized scoring (A2-A4/J7, the reference's
  * master_data_entity_candidates, sql/V000001__init.sql:209-253), the
  * one-row status rollup with filtered + tuple-distinct counts (A5,
  * sql/V000012__more_concepts.sql:149-171), set ops (O3/O4), regex
  * predicates (P5), exists-over-packed-arrays (P8/A1), window top-k (O2),
  * the scalar-function surface (§2.6), semi/anti joins (P1), and JSON
  * field access.
  */
object Extended {

  // band join half-width for q23, in exact integer cents
  private val BandCents = 5.0
  // anomaly threshold for q24 (|z| above this flags the day)
  private val ZThresh = 2.0

  /** J5/J6: array-membership join — the reference joins columns to
    * constraints on (schema, table) AND attnum = any(conkey)
    * (sql/V000009…sql:130). An `array_contains` join condition alone
    * has no equi key and would plan as BroadcastNestedLoopJoin
    * (|orders| × |suppliers| comparisons); exploding the packed array
    * back to rows turns membership into an EQUI key, so Catalyst plans
    * a broadcast *hash* join — same result, |memberships| probes.
    * (When an equi key exists alongside the membership test, keep the
    * array packed and let it ride as a residual — SmoBuilder does
    * that; explode is the right shape only when membership IS the
    * join key.) */
  private def q5(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.df(spark, dir, "lineitem")
    val sup = Tables.df(spark, dir, "supplier")
    val ordSupp = li.groupBy(col("l_orderkey"))
      .agg(collect_set(col("l_suppkey")).as("supps"))
    ordSupp
      .select(col("l_orderkey"), explode(col("supps")).as("s_suppkey"))
      .join(broadcast(sup), Seq("s_suppkey"))
      .groupBy(col("s_suppkey"), col("s_name"))
      .agg(count(lit(1)).as("n_orders"))
      .orderBy(col("s_suppkey"))
  }

  private val q5Sql =
    """WITH ordsupp AS (
      |  SELECT l_orderkey, list(DISTINCT l_suppkey) AS supps
      |  FROM lineitem GROUP BY l_orderkey)
      |SELECT s_suppkey, s_name, COUNT(*) AS n_orders
      |FROM ordsupp JOIN supplier ON list_contains(supps, s_suppkey)
      |GROUP BY s_suppkey, s_name ORDER BY s_suppkey""".stripMargin

  /** A2-A4 + J7 + O2: the reference's master-data-entity scoring —
    * per-entity stats, a broadcast 1-row min/max cross join, min-max
    * normalization with nullif div-guards and coalesce, ranked desc
    * (sql/V000001__init.sql:209-253). Note the rows term rewards FEWER
    * rows (master data = small reference tables). */
  private def q6(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.df(spark, dir, "customer")
    val sup = Tables.df(spark, dir, "supplier")
    val nat = Tables.df(spark, dir, "nation")
    val custPer = cust.groupBy(col("c_nationkey")).agg(count(lit(1)).as("approx_rows"))
    val supPer = sup.groupBy(col("s_nationkey")).agg(count(lit(1)).as("fk_count"))
    val stats = nat
      .join(custPer, col("n_nationkey") === col("c_nationkey"), "left")
      .join(supPer, col("n_nationkey") === col("s_nationkey"), "left")
      .select(col("n_name"),
        coalesce(col("approx_rows"), lit(0L)).as("approx_rows"),
        coalesce(col("fk_count"), lit(0L)).as("fk_count"))
    val minmax = stats.agg(
      min(col("approx_rows")).as("min_rows"), max(col("approx_rows")).as("max_rows"),
      min(col("fk_count")).as("min_fk"), max(col("fk_count")).as("max_fk"))
    stats.crossJoin(broadcast(minmax))
      .select(col("n_name"), col("approx_rows"), col("fk_count"),
        (coalesce((lit(0.5) * (col("max_rows") - col("approx_rows")).cast("double"))
            / nullif((col("max_rows") - col("min_rows")).cast("double"), lit(0.0)), lit(0.0))
          + coalesce((lit(0.5) * (col("fk_count") - col("min_fk")).cast("double"))
            / nullif((col("max_fk") - col("min_fk")).cast("double"), lit(0.0)), lit(0.0)))
          .as("score"))
      .orderBy(col("score").desc, col("n_name"))
      .limit(10)
  }

  private val q6Sql =
    """WITH stats AS (
      |  SELECT n_name,
      |    COALESCE(c.approx_rows, 0) AS approx_rows,
      |    COALESCE(s.fk_count, 0) AS fk_count
      |  FROM nation
      |  LEFT JOIN (SELECT c_nationkey, COUNT(*) AS approx_rows FROM customer GROUP BY 1) c
      |    ON n_nationkey = c.c_nationkey
      |  LEFT JOIN (SELECT s_nationkey, COUNT(*) AS fk_count FROM supplier GROUP BY 1) s
      |    ON n_nationkey = s.s_nationkey),
      |minmax AS (
      |  SELECT MIN(approx_rows) AS min_rows, MAX(approx_rows) AS max_rows,
      |         MIN(fk_count) AS min_fk, MAX(fk_count) AS max_fk FROM stats)
      |SELECT n_name, approx_rows, fk_count,
      |  COALESCE(0.5 * CAST(max_rows - approx_rows AS DOUBLE)
      |      / NULLIF(CAST(max_rows - min_rows AS DOUBLE), 0.0), 0.0)
      |  + COALESCE(0.5 * CAST(fk_count - min_fk AS DOUBLE)
      |      / NULLIF(CAST(max_fk - min_fk AS DOUBLE), 0.0), 0.0) AS score
      |FROM stats CROSS JOIN minmax
      |ORDER BY score DESC, n_name LIMIT 10""".stripMargin

  /** A5: one-row status rollup — plain, distinct, tuple-distinct and
    * FILTERed counts in a single aggregate, like the reference's status()
    * (sql/V000012__more_concepts.sql:149-171). */
  private def q7(spark: SparkSession, dir: String): DataFrame = {
    val ord = Tables.df(spark, dir, "orders")
    ord.agg(
      count(lit(1)).as("n_orders"),
      countDistinct(col("o_custkey")).as("n_customers"),
      countDistinct(col("o_custkey"), col("o_orderstatus")).as("n_cust_status"),
      countIf(col("o_orderstatus") === "O").as("n_open"),
      countIf(col("o_orderpriority").isin("1-URGENT", "2-HIGH")).as("n_high_prio"),
      countIf(col("o_totalprice") > 200000.0).as("n_big"))
  }

  private val q7Sql =
    """SELECT COUNT(*) AS n_orders,
      |  COUNT(DISTINCT o_custkey) AS n_customers,
      |  COUNT(DISTINCT (o_custkey, o_orderstatus)) AS n_cust_status,
      |  COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS n_open,
      |  COUNT(*) FILTER (WHERE o_orderpriority IN ('1-URGENT','2-HIGH')) AS n_high_prio,
      |  COUNT(*) FILTER (WHERE o_totalprice > 200000.0) AS n_big
      |FROM orders""".stripMargin

  /** O3: deduplicating UNION (the reference's privilege-filtered +
    * static ignored-schemas union, sql/V000006…sql:3-10). */
  private def q8(spark: SparkSession, dir: String): DataFrame = {
    val nat = Tables.df(spark, dir, "nation")
    val cust = Tables.df(spark, dir, "customer")
    val sup = Tables.df(spark, dir, "supplier")
    val withCust = nat.join(cust, col("n_nationkey") === col("c_nationkey"))
      .select(col("n_name"))
    val withSup = nat.join(sup, col("n_nationkey") === col("s_nationkey"))
      .select(col("n_name"))
    withCust.union(withSup).distinct().orderBy(col("n_name"))
  }

  private val q8Sql =
    """SELECT n_name FROM nation JOIN customer ON n_nationkey = c_nationkey
      |UNION
      |SELECT n_name FROM nation JOIN supplier ON n_nationkey = s_nationkey
      |ORDER BY n_name""".stripMargin

  /** O4/S4: UNION ALL of real rows with synthesized pseudo-rows (the
    * generated-columns-as-pseudo-constraints union, sql/V000006…sql:59-77)
    * — here, per-table row counts plus a literal synthetic row. */
  private def q9(spark: SparkSession, dir: String): DataFrame = {
    def cnt(name: String) =
      Tables.df(spark, dir, name).agg(count(lit(1)).as("n_rows"))
        .select(lit(name).as("table_name"), col("n_rows"))
    val synthetic = spark.range(1)
      .select(lit("generated_pseudo").as("table_name"), lit(0L).as("n_rows"))
    Seq("customer", "orders", "lineitem", "supplier", "part")
      .map(cnt).reduce(_.unionByName(_))
      .unionByName(synthetic)
      .orderBy(col("table_name"))
  }

  private val q9Sql =
    """SELECT * FROM (
      |  SELECT 'customer' AS table_name, COUNT(*) AS n_rows FROM customer
      |  UNION ALL SELECT 'orders', COUNT(*) FROM orders
      |  UNION ALL SELECT 'lineitem', COUNT(*) FROM lineitem
      |  UNION ALL SELECT 'supplier', COUNT(*) FROM supplier
      |  UNION ALL SELECT 'part', COUNT(*) FROM part
      |  UNION ALL SELECT 'generated_pseudo', 0
      |) ORDER BY table_name""".stripMargin

  /** P5: anchored case-insensitive alternation regex — the reference's
    * 60-alternative PII column-name matcher
    * (sql/V000010__schema_concepts.sql:51-55). */
  private def q10(spark: SparkSession, dir: String): DataFrame = {
    val part = Tables.df(spark, dir, "part")
    part.filter(lower(col("p_name")).rlike("^(red|blue|small|hot)\\b"))
      .groupBy(col("p_brand"))
      .agg(count(lit(1)).as("n_matching"))
      .orderBy(col("p_brand"))
  }

  private val q10Sql =
    """SELECT p_brand, COUNT(*) AS n_matching
      |FROM part
      |WHERE regexp_matches(lower(p_name), '^(red|blue|small|hot)\b')
      |GROUP BY p_brand ORDER BY p_brand""".stripMargin

  /** A1 + P8: pack detail rows into an array of structs per key
    * (jsonb_agg in sql/V000009…sql:113-127), then probe it with an
    * exists() higher-order function (the constraint-existence concepts,
    * sql/V000012__more_concepts.sql:33-98). No UDF, stays in codegen. */
  private def q11(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.df(spark, dir, "lineitem")
    li.groupBy(col("l_orderkey"))
      .agg(collect_list(struct(col("l_discount").as("disc"),
        col("l_quantity").as("qty"))).as("items"))
      .filter(exists(col("items"),
        x => x.getField("disc") > 0.07 && x.getField("qty") > 40))
      .select(col("l_orderkey").as("o_orderkey"))
      .orderBy(col("o_orderkey"))
  }

  private val q11Sql =
    """SELECT DISTINCT l_orderkey AS o_orderkey FROM lineitem
      |WHERE l_discount > 0.07 AND l_quantity > 40
      |ORDER BY o_orderkey""".stripMargin

  /** O2: ranked top-k per group via window (the reference's ranked
    * MDE candidates, consumers limit 10 — core_test.clj:132). Tie-broken
    * on the key for determinism. */
  private def q12(spark: SparkSession, dir: String): DataFrame = {
    val ord = Tables.df(spark, dir, "orders")
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    ord.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("o_orderpriority"), col("rn"), col("o_orderkey"), col("o_totalprice"))
      .orderBy(col("o_orderpriority"), col("rn"))
  }

  private val q12Sql =
    """SELECT o_orderpriority, CAST(rn AS INT) AS rn, o_orderkey, o_totalprice FROM (
      |  SELECT o_orderpriority, o_orderkey, o_totalprice,
      |    ROW_NUMBER() OVER (PARTITION BY o_orderpriority
      |      ORDER BY o_totalprice DESC, o_orderkey) AS rn
      |  FROM orders)
      |WHERE rn <= 3 ORDER BY o_orderpriority, rn""".stripMargin

  /** §2.6 scalar-function surface: trim/lower/substring/replace/length/
    * regexp_replace/split_part — the string functions the reference uses
    * across sql/V000009…sql:89, V000010…sql:8,54. */
  private def q13(spark: SparkSession, dir: String): DataFrame = {
    val part = Tables.df(spark, dir, "part")
    part.select(
      col("p_partkey"),
      lower(col("p_type")).as("type_lower"),
      substring(col("p_name"), 1, 3).as("name_prefix"),
      regexp_replace(col("p_name"), "[aeiou]", "_").as("devoweled"),
      length(col("p_name")).as("name_len"),
      element_at(split(col("p_brand"), "#"), 2).as("brand_num"),
      trim(concat(lit("  "), col("p_name"), lit("  "))).as("trimmed"),
      regexp_replace(col("p_name"), "^(red|blue) ", "color ").as("recolored"))
      .orderBy(col("p_partkey"))
  }

  private val q13Sql =
    """SELECT p_partkey,
      |  lower(p_type) AS type_lower,
      |  substring(p_name, 1, 3) AS name_prefix,
      |  regexp_replace(p_name, '[aeiou]', '_', 'g') AS devoweled,
      |  CAST(length(p_name) AS INT) AS name_len,
      |  split_part(p_brand, '#', 2) AS brand_num,
      |  trim('  ' || p_name || '  ') AS trimmed,
      |  regexp_replace(p_name, '^(red|blue) ', 'color ') AS recolored
      |FROM part ORDER BY p_partkey""".stripMargin

  /** §2.6 date/time surface: date_trunc bucketing + exact-decimal sums
    * over the events stream table. */
  private def q14(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.df(spark, dir, "events")
    ev.groupBy(to_date(date_trunc("DAY", col("ts"))).as("day"),
        col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(dec2(col("value"))).cast("double").as("total_value"))
      .orderBy(col("day"), col("event_type"))
  }

  private val q14Sql =
    """SELECT CAST(date_trunc('day', ts) AS DATE) AS day, event_type,
      |  COUNT(*) AS n_events,
      |  CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value
      |FROM events GROUP BY 1, 2 ORDER BY day, event_type""".stripMargin

  /** §2.6 conditional surface: case/when bands, nullif, coalesce
    * (the score expression guards, sql/V000001__init.sql:241-252). */
  private def q15(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.df(spark, dir, "customer")
    cust.select(
      when(col("c_acctbal") < 0, "negative")
        .when(col("c_acctbal") < 5000, "low")
        .otherwise("high").as("band"),
      coalesce(nullif(col("c_mktsegment"), lit("MACHINERY")), lit("(other)"))
        .as("segment"))
      .groupBy(col("band"), col("segment"))
      .agg(count(lit(1)).as("n_customers"))
      .orderBy(col("band"), col("segment"))
  }

  private val q15Sql =
    """SELECT
      |  CASE WHEN c_acctbal < 0 THEN 'negative'
      |       WHEN c_acctbal < 5000 THEN 'low'
      |       ELSE 'high' END AS band,
      |  COALESCE(NULLIF(c_mktsegment, 'MACHINERY'), '(other)') AS segment,
      |  COUNT(*) AS n_customers
      |FROM customer GROUP BY 1, 2 ORDER BY band, segment""".stripMargin

  /** P1: anti-join (the ignored-schemas NOT IN filter applied in every
    * CTE, sql/V000009…sql:21,42,57). Left-anti avoids a shuffle of the
    * big side when the exclusion list broadcasts. */
  private def q16(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.df(spark, dir, "customer")
    val bigOrders = Tables.df(spark, dir, "orders")
      .filter(col("o_totalprice") > 150000.0)
    cust.join(bigOrders, col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"))
      .orderBy(col("c_custkey"))
  }

  private val q16Sql =
    """SELECT c_custkey, c_name FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders
      |                  WHERE o_custkey = c_custkey AND o_totalprice > 150000.0)
      |ORDER BY c_custkey""".stripMargin

  /** A9: per-group count ranking — the reference's per-schema column
    * counts test query (core_test.clj:225). */
  private def q17(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.df(spark, dir, "documents")
    docs.groupBy(col("lang"), col("source"))
      .agg(count(lit(1)).as("n_docs"))
      .orderBy(col("n_docs").desc, col("lang"), col("source"))
  }

  private val q17Sql =
    """SELECT lang, source, COUNT(*) AS n_docs FROM documents
      |GROUP BY lang, source ORDER BY n_docs DESC, lang, source""".stripMargin

  /** §2.6 JSON surface: field extraction from an open-shaped JSON column
    * (the reference's ->> access, sql/V000008…sql:7). */
  private def q18(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.df(spark, dir, "events")
    ev.select(get_json_object(col("props"), "$.k").cast("int").as("k"),
        col("event_type"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("k")).as("sum_k"),
        min(col("k")).as("min_k"), max(col("k")).as("max_k"))
      .orderBy(col("event_type"))
  }

  private val q18Sql =
    """SELECT event_type, COUNT(*) AS n,
      |  CAST(SUM(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS sum_k,
      |  MIN(CAST(json_extract_string(props, '$.k') AS INT)) AS min_k,
      |  MAX(CAST(json_extract_string(props, '$.k') AS INT)) AS max_k
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  /** Batch sessionization via window lag + running gap count — the batch
    * twin of streaming.Streams.sessionize: a session breaks after >30min
    * inactivity per user; per-session rollup. Exercises lag(), windowed
    * running sums, and event-time bucketing in one plan. */
  private def q19(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.df(spark, dir, "events")
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"))
    ev.select(col("user_id"), col("ts"), dec2(col("value")).as("value"))
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("new_session",
        (col("prev_ts").isNull ||
          unix_timestamp(col("ts")) - unix_timestamp(col("prev_ts")) > 1800)
          .cast("int"))
      .withColumn("session_no", sum(col("new_session")).over(byUser))
      .groupBy(col("user_id"), col("session_no"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value")).cast("double").as("total_value"),
        min(col("ts")).as("started_at"), max(col("ts")).as("ended_at"))
      .select(col("user_id"), col("session_no").cast("long").as("session_no"),
        col("n_events"), col("total_value"), col("started_at"), col("ended_at"))
  }

  private val q19Sql =
    """WITH g AS (
      |  SELECT user_id, ts, CAST(value AS DECIMAL(12,2)) AS value,
      |    CASE WHEN lag(ts) OVER w IS NULL
      |           OR epoch(ts) - epoch(lag(ts) OVER w) > 1800
      |         THEN 1 ELSE 0 END AS new_session
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
      |s AS (
      |  SELECT user_id, ts, value,
      |    SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
      |      ROWS UNBOUNDED PRECEDING) AS session_no
      |  FROM g)
      |SELECT user_id, CAST(session_no AS BIGINT) AS session_no,
      |  COUNT(*) AS n_events,
      |  CAST(SUM(value) AS DOUBLE) AS total_value,
      |  MIN(ts) AS started_at, MAX(ts) AS ended_at
      |FROM s GROUP BY user_id, session_no""".stripMargin

  /** Multi-level rollup totals (grouping-sets surface): per
    * (priority, status), per priority, and grand total, with grouping
    * flags for unambiguous NULLs. */
  private def q20(spark: SparkSession, dir: String): DataFrame = {
    val ord = Tables.df(spark, dir, "orders")
    ord.rollup(col("o_orderpriority"), col("o_orderstatus"))
      .agg(grouping(col("o_orderpriority")).cast("int").as("g_prio"),
        grouping(col("o_orderstatus")).cast("int").as("g_status"),
        count(lit(1)).as("n"),
        sum(dec2(col("o_totalprice"))).cast("double").as("total"))
      .select(
        coalesce(col("o_orderpriority"), lit("(all)")).as("priority"),
        coalesce(col("o_orderstatus"), lit("(all)")).as("status"),
        col("g_prio"), col("g_status"), col("n"), col("total"))
  }

  private val q20Sql =
    """SELECT
      |  COALESCE(o_orderpriority, '(all)') AS priority,
      |  COALESCE(o_orderstatus, '(all)') AS status,
      |  CAST(GROUPING(o_orderpriority) AS INT) AS g_prio,
      |  CAST(GROUPING(o_orderstatus) AS INT) AS g_status,
      |  COUNT(*) AS n,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total
      |FROM orders
      |GROUP BY ROLLUP (o_orderpriority, o_orderstatus)""".stripMargin

  /** Ordered-funnel analysis: per user, the earliest time of each step
    * event; a user converts at step k if the steps' first occurrences
    * are time-ordered. Single pass: conditional min aggregation, then
    * ordering predicates — no joins, no explode. */
  private def q21(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.df(spark, dir, "events")
    def firstTs(t: String) = min(when(col("event_type") === t, col("ts")))
    val steps = ev.groupBy(col("user_id"))
      .agg(firstTs("view").as("t_view"), firstTs("click").as("t_click"),
        firstTs("purchase").as("t_purchase"))
    val s1 = col("t_view").isNotNull
    val s2 = s1 && col("t_click").isNotNull && col("t_click") >= col("t_view")
    val s3 = s2 && col("t_purchase").isNotNull && col("t_purchase") >= col("t_click")
    steps.agg(
      count(when(s1, 1)).as("n_view"),
      count(when(s2, 1)).as("n_view_click"),
      count(when(s3, 1)).as("n_full_funnel"),
      count(lit(1)).as("n_users"))
  }

  private val q21Sql =
    """WITH steps AS (
      |  SELECT user_id,
      |    MIN(ts) FILTER (WHERE event_type = 'view') AS t_view,
      |    MIN(ts) FILTER (WHERE event_type = 'click') AS t_click,
      |    MIN(ts) FILTER (WHERE event_type = 'purchase') AS t_purchase
      |  FROM events GROUP BY user_id)
      |SELECT
      |  COUNT(*) FILTER (WHERE t_view IS NOT NULL) AS n_view,
      |  COUNT(*) FILTER (WHERE t_view IS NOT NULL AND t_click IS NOT NULL
      |    AND t_click >= t_view) AS n_view_click,
      |  COUNT(*) FILTER (WHERE t_view IS NOT NULL AND t_click IS NOT NULL
      |    AND t_click >= t_view AND t_purchase IS NOT NULL
      |    AND t_purchase >= t_click) AS n_full_funnel,
      |  COUNT(*) AS n_users
      |FROM steps""".stripMargin

  /** As-of join (operators/Ranges.asofJoin): each event enriched with
    * the same user's most recent purchase at-or-before it — one shuffle
    * on user_id, no candidate explosion. Oracle is DuckDB's native
    * ASOF LEFT JOIN, an independent implementation of the semantics. */
  private def q22(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.df(spark, dir, "events")
    graft.operators.Ranges.asofJoin(
      ev.select(col("event_id"), col("user_id"), col("ts"), col("event_type")),
      ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("value")),
      "user_id", "ts", Seq("value"), "last_purchase_")
      .withColumnRenamed("last_purchase_ts", "last_purchase_at")
  }

  private val q22Sql =
    """SELECT e.event_id, e.user_id, e.ts, e.event_type,
      |  p.ts AS last_purchase_at, p.value AS last_purchase_value
      |FROM events e ASOF LEFT JOIN (
      |  SELECT user_id, ts, value FROM events
      |  WHERE event_type = 'purchase') p
      |ON e.user_id = p.user_id AND e.ts >= p.ts""".stripMargin

  /** Forward as-of join (operators/Ranges.asofJoin forward=true): each
    * event enriched with the same user's NEXT purchase at-or-after it —
    * conversion-latency analytics, same single-shuffle no-join plan.
    * Oracle is DuckDB ASOF with l.ts <= r.ts. */
  private def q25(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.df(spark, dir, "events")
    graft.operators.Ranges.asofJoin(
      ev.select(col("event_id"), col("user_id"), col("ts"), col("event_type")),
      ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("value")),
      "user_id", "ts", Seq("value"), "next_purchase_", forward = true)
      .withColumnRenamed("next_purchase_ts", "next_purchase_at")
  }

  private val q25Sql =
    """SELECT e.event_id, e.user_id, e.ts, e.event_type,
      |  p.ts AS next_purchase_at, p.value AS next_purchase_value
      |FROM events e ASOF LEFT JOIN (
      |  SELECT user_id, ts, value FROM events
      |  WHERE event_type = 'purchase') p
      |ON e.user_id = p.user_id AND e.ts <= p.ts""".stripMargin

  /** Band self-join with no equi key (operators/Ranges.bandStats):
    * partner count/sum/min-id within 5 cents of each event's value,
    * computed from the value HISTOGRAM — the band join runs over
    * distinct cents values (domain-bounded), per-row stats come from
    * one lookup join, and the band's two smallest ids ride the bounded
    * native graft_kmin aggregate. Values go through exact integer
    * cents so the band predicate is bit-reproducible across engines.
    * Oracle is DuckDB's inequality join (IEJoin) — feasible there at
    * oracle SF, quadratic at scale, which is exactly why the Spark
    * side buckets and collapses to the histogram. QueriesSpec pins
    * bandStats ≡ aggregated bandPairs. */
  private def q23(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.df(spark, dir, "events")
      .select(col("event_id"),
        round(col("value") * 100).cast("long").as("cents"))
    graft.operators.Ranges.bandStats(ev, "event_id", "cents", BandCents)
      .select(col("ida").as("event_id"), col("n_close"),
        col("sum_partner_vals").as("sum_partner_cents"),
        col("min_partner_id"))
  }

  private val q23Sql =
    s"""WITH e AS (SELECT event_id, CAST(round(value*100) AS BIGINT) AS cents
       |           FROM events)
       |SELECT a.event_id, COUNT(*) AS n_close,
       |  CAST(SUM(b.cents) AS BIGINT) AS sum_partner_cents,
       |  MIN(b.event_id) AS min_partner_id
       |FROM e a JOIN e b
       |  ON b.event_id <> a.event_id
       |  AND abs(a.cents - b.cents) <= ${BandCents.toInt}
       |GROUP BY a.event_id""".stripMargin

  /** Per-type daily anomaly z-scores with EXACT second moments: daily
    * counts are integers, so Σn and Σn² aggregate exactly at any
    * partitioning and variance = (Σn² − (Σn)²/d)/(d−1) is one fixed
    * IEEE op sequence — unlike stddev_samp, whose Welford merge order
    * (and thus last-ulp result) depends on partition layout. The same
    * plan is deterministic on 1 core or 1000 executors, which is what
    * lets the oracle hash-match it. sd_n > 0 guards the NaN divergence
    * (DuckDB orders NaN above all values; Spark follows IEEE). */
  private def q24(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.df(spark, dir, "events")
    // persisted: daily feeds both the stats rollup and the final join
    val daily = ev.groupBy(
        to_date(date_trunc("DAY", col("ts"))).as("day"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .persist()
    val stats = daily.groupBy(col("event_type"))
      .agg(count(lit(1)).as("d"), sum(col("n_events")).as("sn"),
        sum(col("n_events") * col("n_events")).as("sn2"))
      .filter(col("d") > 1)
      .select(col("event_type"),
        (col("sn").cast("double") / col("d")).as("mean_n"),
        sqrt((col("sn2").cast("double")
          - col("sn").cast("double") * col("sn").cast("double") / col("d"))
          / (col("d") - 1)).as("sd_n"))
    daily.join(broadcast(stats), "event_type")
      .select(col("day"), col("event_type"), col("n_events"),
        ((col("n_events") - col("mean_n")) / col("sd_n")).as("z"),
        col("sd_n"))
      .filter(col("sd_n") > 0 && abs(col("z")) > ZThresh)
      .drop("sd_n")
  }

  private val q24Sql =
    s"""WITH daily AS (
       |  SELECT CAST(date_trunc('day', ts) AS DATE) AS day, event_type,
       |    COUNT(*) AS n_events
       |  FROM events GROUP BY 1, 2),
       |st AS (
       |  SELECT event_type, COUNT(*) AS d,
       |    CAST(SUM(n_events) AS BIGINT) AS sn,
       |    CAST(SUM(n_events * n_events) AS BIGINT) AS sn2
       |  FROM daily GROUP BY 1),
       |sd AS (
       |  SELECT event_type, CAST(sn AS DOUBLE) / d AS mean_n,
       |    sqrt((CAST(sn2 AS DOUBLE)
       |      - CAST(sn AS DOUBLE) * CAST(sn AS DOUBLE) / d) / (d - 1)) AS sd_n
       |  FROM st WHERE d > 1)
       |SELECT daily.day, daily.event_type, daily.n_events,
       |  (daily.n_events - sd.mean_n) / sd.sd_n AS z
       |FROM daily JOIN sd USING (event_type)
       |WHERE sd.sd_n > 0
       |  AND abs((daily.n_events - sd.mean_n) / sd.sd_n) > $ZThresh""".stripMargin

  // the documents.lang domain, pinned so the pivot's output schema is
  // static (Spark's value-less pivot would run a distinct scan AND make
  // the schema data-dependent — wrong for a library surface)
  private val PivotLangs = Seq("de", "en", "es", "fr", "zh")

  /** Pivot (cross-tab): per-source character mass by language, one
    * column per pinned lang value, lowered to a SINGLE hash aggregate
    * of sum(CASE WHEN lang = v) cells. Deliberately NOT
    * `Dataset.pivot(values)`: Spark plans that as TWO aggregate+
    * exchange rounds (groupBy(source,lang) then pivot_first by source);
    * the conditional-aggregate form produces identical results with
    * half the shuffles and no distinct-values pre-scan (PlanSpec pins
    * one Exchange). Empty cells stay NULL (sum over no rows) in both
    * engines. */
  private def q26(spark: SparkSession, dir: String): DataFrame = {
    val cells = PivotLangs.map(l =>
      sum(when(col("lang") === l, col("n_chars"))).as(l))
    Tables.df(spark, dir, "documents")
      .groupBy(col("source"))
      .agg(cells.head, cells.tail: _*)
  }

  private val q26Sql = {
    // ::BIGINT: DuckDB's SUM(BIGINT) returns HUGEINT, which lands in
    // the compare harness as float64 even when null-free; the cast puts
    // both engines on int64-with-nulls semantics
    val cells = PivotLangs.map(l =>
      s"CAST(SUM(CASE WHEN lang = '$l' THEN n_chars END) AS BIGINT) AS $l")
      .mkString(",\n  ")
    s"""SELECT source,
       |  $cells
       |FROM documents GROUP BY source""".stripMargin
  }

  // resample grid step: 6-hour epoch-aligned slots
  private val ResampleStepSec = 21600L

  /** Regular-grid LOCF resample (operators/Ranges.resampleLocf): per
    * user, 6-hour epoch-aligned slots spanning that user's event range,
    * each slot carrying the latest observation at-or-before it. Grid
    * generation is sequence()+explode on executors; enrichment is the
    * as-of window — two key shuffles total, no join node, no driver
    * loop. Oracle: DuckDB generate_series + native ASOF JOIN. */
  private def q27(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Ranges.resampleLocf(
      Tables.df(spark, dir, "events"), "user_id", "ts", Seq("value"),
      ResampleStepSec)

  private val q27Sql = {
    val st = ResampleStepSec
    s"""WITH b AS (
       |  SELECT user_id,
       |    CAST(ceil(epoch(min(ts))) AS BIGINT) AS lo,
       |    CAST(floor(epoch(max(ts))) AS BIGINT) AS hi
       |  FROM events GROUP BY 1),
       |s AS (SELECT user_id,
       |        ((lo + ${st - 1}) // $st) * $st AS s0,
       |        (hi // $st) * $st AS s1 FROM b),
       |grid AS (
       |  SELECT user_id,
       |    make_timestamp(unnest(generate_series(s0, s1, $st)) * 1000000)
       |      AS ts
       |  FROM s WHERE s0 <= s1)
       |SELECT g.user_id, g.ts, e.ts AS locf_ts, e.value AS locf_value
       |FROM grid g ASOF LEFT JOIN events e
       |ON g.user_id = e.user_id AND g.ts >= e.ts""".stripMargin
  }

  /** Correlated scalar subquery — exercised through the SQL entry point
    * (the DataFrame API cannot express correlation): each customer's
    * max order price, NULL for order-less customers. Catalyst
    * decorrelates (RewriteCorrelatedScalarSubquery) into an aggregate +
    * left outer join — the same plan a hand-written join would give, so
    * the declarative form costs nothing at scale. */
  private def q28(spark: SparkSession, dir: String): DataFrame = {
    // query-scoped view names, dropped after analysis: spark.sql
    // resolves views eagerly into the returned plan, so no session
    // state leaks (a view named "customer"/"orders" would shadow real
    // tables for everything else in a long-lived session)
    Tables.df(spark, dir, "customer").createOrReplaceTempView("q28_customer")
    Tables.df(spark, dir, "orders").createOrReplaceTempView("q28_orders")
    try spark.sql(
      """SELECT c_custkey, c_name,
        |  (SELECT max(o_totalprice) FROM q28_orders o
        |   WHERE o.o_custkey = c.c_custkey) AS max_order
        |FROM q28_customer c""".stripMargin)
    finally {
      spark.catalog.dropTempView("q28_customer")
      spark.catalog.dropTempView("q28_orders")
    }
  }

  private val q28Sql =
    """SELECT c_custkey, c_name,
      |  (SELECT max(o_totalprice) FROM orders o
      |   WHERE o.o_custkey = c.c_custkey) AS max_order
      |FROM customer c""".stripMargin

  /** RANGE-frame sliding window: per user, each event's count/sum over
    * the preceding hour BY VALUE RANGE on epoch seconds (peers at equal
    * instants are all included — no tie-order ambiguity, unlike a ROWS
    * frame). The summed quantity is integer cents, so the moving sum is
    * exact in both engines regardless of their sliding-sum evaluation
    * strategy (DuckDB's segment tree vs Spark's frame re-scan would
    * disagree in the last ulp on doubles). */
  private def q29(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.df(spark, dir, "events")
    val w = Window.partitionBy(col("user_id")).orderBy(col("es"))
      .rangeBetween(-3600, Window.currentRow)
    // unix_timestamp, not cast-to-double: it floors to whole epoch
    // seconds like the oracle's floor(epoch(ts)) AND resolves for both
    // TIMESTAMP and TIMESTAMP_NTZ — a tz-less parquet writer (the
    // regenerated testdata) surfaces ts as NTZ, which no double cast
    // accepts
    ev.select(col("event_id"), col("user_id"),
        unix_timestamp(col("ts")).as("es"),
        round(col("value") * 100).cast("long").as("cents"))
      .select(col("event_id"), col("user_id"), col("es"),
        count(lit(1)).over(w).as("n_1h"),
        sum(col("cents")).over(w).as("cents_1h"))
  }

  private val q29Sql =
    """WITH e AS (
      |  SELECT event_id, user_id,
      |    CAST(floor(epoch(ts)) AS BIGINT) AS es,
      |    CAST(round(value * 100) AS BIGINT) AS cents
      |  FROM events)
      |SELECT event_id, user_id, es,
      |  COUNT(*) OVER w AS n_1h,
      |  CAST(SUM(cents) OVER w AS BIGINT) AS cents_1h
      |FROM e
      |WINDOW w AS (PARTITION BY user_id ORDER BY es
      |  RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)""".stripMargin

  /** CUBE grouping: all four (source, lang) grouping combinations in
    * one aggregate — the full-lattice sibling of q20's ROLLUP;
    * grouping() flags disambiguate data NULLs from subtotal rows. */
  private def q30(spark: SparkSession, dir: String): DataFrame =
    Tables.df(spark, dir, "documents")
      .cube(col("source"), col("lang"))
      .agg(grouping(col("source")).cast("int").as("g_src"),
        grouping(col("lang")).cast("int").as("g_lang"),
        count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("total_chars"))
      .select(coalesce(col("source"), lit("(all)")).as("source"),
        coalesce(col("lang"), lit("(all)")).as("lang"),
        col("g_src"), col("g_lang"), col("n_docs"), col("total_chars"))

  private val q30Sql =
    """SELECT COALESCE(source, '(all)') AS source,
      |  COALESCE(lang, '(all)') AS lang,
      |  CAST(GROUPING(source) AS INT) AS g_src,
      |  CAST(GROUPING(lang) AS INT) AS g_lang,
      |  COUNT(*) AS n_docs,
      |  CAST(SUM(n_chars) AS BIGINT) AS total_chars
      |FROM documents
      |GROUP BY CUBE (source, lang)""".stripMargin

  /** INTERSECT / EXCEPT set ops (planned as left-semi / left-anti
    * aggregated joins): customers who ordered in 1995 AND 1996, minus
    * anyone with an urgent order — both distinct-set operators in one
    * query shape. */
  private def q31(spark: SparkSession, dir: String): DataFrame = {
    val ord = Tables.df(spark, dir, "orders")
    def buyersIn(year: Int) =
      ord.filter(org.apache.spark.sql.functions.year(col("o_orderdate")) === year)
        .select(col("o_custkey"))
    val urgent = ord.filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_custkey"))
    buyersIn(1995).intersect(buyersIn(1996)).except(urgent)
  }

  private val q31Sql =
    """SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995
      |INTERSECT
      |SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996
      |EXCEPT
      |SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q5_theta_array_join", q5, Some(q5Sql)),
    QueryDef("q6_minmax_score", q6, Some(q6Sql)),
    QueryDef("q7_status_rollup", q7, Some(q7Sql)),
    QueryDef("q8_union_distinct", q8, Some(q8Sql)),
    QueryDef("q9_unionall_counts", q9, Some(q9Sql)),
    QueryDef("q10_regex_predicate", q10, Some(q10Sql)),
    QueryDef("q11_exists_packed", q11, Some(q11Sql)),
    QueryDef("q12_window_topk", q12, Some(q12Sql)),
    QueryDef("q13_string_fns", q13, Some(q13Sql)),
    QueryDef("q14_datetime_bucket", q14, Some(q14Sql)),
    QueryDef("q15_case_coalesce", q15, Some(q15Sql)),
    QueryDef("q16_anti_join", q16, Some(q16Sql)),
    QueryDef("q17_group_ranking", q17, Some(q17Sql)),
    QueryDef("q18_json_extract", q18, Some(q18Sql)),
    QueryDef("q19_sessionize", q19, Some(q19Sql)),
    QueryDef("q20_rollup", q20, Some(q20Sql)),
    QueryDef("q21_funnel", q21, Some(q21Sql)),
    QueryDef("q22_asof_join", q22, Some(q22Sql)),
    QueryDef("q23_band_join", q23, Some(q23Sql)),
    QueryDef("q24_daily_anomaly", q24, Some(q24Sql)),
    QueryDef("q25_asof_next", q25, Some(q25Sql)),
    QueryDef("q26_pivot", q26, Some(q26Sql)),
    QueryDef("q27_resample", q27, Some(q27Sql)),
    QueryDef("q28_correlated_subquery", q28, Some(q28Sql)),
    QueryDef("q29_range_frame", q29, Some(q29Sql)),
    QueryDef("q30_cube", q30, Some(q30Sql)),
    QueryDef("q31_intersect_except", q31, Some(q31Sql)))
}
