package graft

import org.scalatest.funsuite.AnyFunSuite

/** Structural checks for every driver-gated query at sf0.001. Value-level
  * correctness is enforced by the DuckDB oracle gate (tools/check.py /
  * driver CORRECTNESS); these specs pin schema shape and invariants so a
  * regression is caught at `sbt test` speed.
  */
class QueriesSpec extends AnyFunSuite {
  private lazy val spark = Sessions.local(8)
  private val sf = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query has distinct name and runs at sf0.001") {
    val names = SparkEntry.queries.keys.toSeq
    assert(names.distinct.size == names.size)
    // execute each one: catches runtime breakage (analysis errors,
    // overflow, bad casts) at sbt-test speed, independent of the
    // DuckDB oracle gate
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try { fn(spark, sf).count(); spark.catalog.clearCache(); None }
        catch { case e: Throwable => Some(s"$name: ${e.getMessage}") }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  test("every oracle key exists in queries") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle entries without query: $missing")
  }

  test("q1 pricing summary: 6 flag/status groups, counts positive") {
    val rows = run("q1_agg_pricing").collect()
    assert(rows.length > 0 && rows.length <= 9)
    assert(rows.forall(_.getAs[Long]("count_order") > 0))
    assert(rows.forall(_.getAs[Double]("sum_qty") > 0))
  }

  test("q2 pushdown filter hits the 1996 ship-year") {
    val r = run("q2_filter_pushdown").collect()(0)
    assert(r.getAs[Long]("n_rows") > 0)
  }

  test("q3 join revenue covers all nations with customers") {
    val rows = run("q3_join_revenue").collect()
    assert(rows.length > 0 && rows.length <= 25)
    assert(rows.forall(_.getAs[Double]("revenue") > 0))
  }

  test("q4 left-join count preserves all customers") {
    val df = run("q4_leftjoin_fkcount")
    val nCust = Tables.df(spark, sf, "customer").count()
    assert(df.count() == nCust)
  }

  test("q5 theta array join: order participation per supplier") {
    val rows = run("q5_theta_array_join").collect()
    val nOrders = Tables.df(spark, sf, "orders").count()
    assert(rows.forall(r => r.getAs[Long]("n_orders") <= nOrders))
    assert(rows.nonEmpty)
  }

  test("q6 minmax score is in [0,1] and sorted desc") {
    val scores = run("q6_minmax_score").collect().map(_.getAs[Double]("score"))
    assert(scores.forall(s => s >= 0.0 && s <= 1.0))
    assert(scores.sameElements(scores.sorted.reverse))
  }

  test("q7 status rollup: one row, filtered counts bounded by total") {
    val r = run("q7_status_rollup").collect()(0)
    val total = r.getAs[Long]("n_orders")
    assert(r.getAs[Long]("n_open") <= total)
    assert(r.getAs[Long]("n_customers") <= r.getAs[Long]("n_cust_status"))
  }

  test("q12 window topk: at most 3 per priority, rank starts at 1") {
    val rows = run("q12_window_topk").collect()
    val byPrio = rows.groupBy(_.getAs[String]("o_orderpriority"))
    assert(byPrio.values.forall(_.length <= 3))
    assert(byPrio.values.forall(_.map(_.getAs[Int]("rn")).min == 1))
  }

  test("q14 datetime bucket: day grain, nonempty") {
    val df = run("q14_datetime_bucket")
    assert(df.schema("day").dataType == org.apache.spark.sql.types.DateType)
    assert(df.count() > 0)
  }

  test("q16 anti join: result customers have no qualifying orders") {
    import org.apache.spark.sql.functions.col
    val anti = run("q16_anti_join")
    val big = Tables.df(spark, sf, "orders").filter(col("o_totalprice") > 150000.0)
    val overlap = anti.join(big, anti("c_custkey") === big("o_custkey")).count()
    assert(overlap == 0)
  }

  test("q18 json extract: k parses for every event") {
    val rows = run("q18_json_extract").collect()
    val total = rows.map(_.getAs[Long]("n")).sum
    assert(total == Tables.df(spark, sf, "events").count())
    assert(rows.forall(_.getAs[Long]("sum_k") > 0))
  }

  test("asof join: at-or-before semantics, same-instant match, leading nulls") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val left = Seq((1L, "u", 5L), (2L, "u", 10L), (3L, "u", 20L),
      (4L, "v", 7L), (5L, "w", 9L))
      .toDF("id", "k", "ts")
    val right = Seq(("u", 10L, "a"), ("u", 15L, "b"), ("v", 1L, "c"))
      .toDF("k", "ts", "pay")
    val out = graft.operators.Ranges
      .asofJoin(left, right, "k", "ts", Seq("pay"))
      .collect().map(r => r.getAs[Long]("id") ->
        (Option(r.getAs[java.lang.Long]("asof_ts")).map(_.toLong),
          Option(r.getAs[String]("asof_pay")))).toMap
    assert(out(1L) == (None, None))              // before any right row
    assert(out(2L) == (Some(10L), Some("a")))    // same-instant matches
    assert(out(3L) == (Some(15L), Some("b")))    // most recent, not first
    assert(out(4L) == (Some(1L), Some("c")))     // per-key isolation
    assert(out(5L) == (None, None))              // key with no right rows
    // SQL join semantics: NULL keys never match (even NULL-key right
    // rows), NULL-ts right rows match nothing, NULL-ts left rows stay
    // unmatched (mirrors ASOF JOIN's ON k = k AND l.ts >= r.ts)
    val nl = Seq((Some("u"), Some(1L), "x"), (None, Some(2L), "y"),
      (Some("v"), None, "z")).toDF("k", "ts", "pay")
    val nres = graft.operators.Ranges
      .asofJoin(Seq((Option.empty[String], Some(9L), 10L),
          (Some("v"), Some(9L), 11L), (Some("u"), Option.empty[Long], 12L))
        .toDF("k", "ts", "id"), nl, "k", "ts", Seq("pay"))
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[String]("asof_pay"))
      .toMap
    assert(nres == Map(10L -> null, 11L -> null, 12L -> null))
    // forward=true: earliest right row at-or-after, same-instant matches
    val fwd = graft.operators.Ranges
      .asofJoin(left, right, "k", "ts", Seq("pay"), forward = true)
      .collect().map(r => r.getAs[Long]("id") ->
        Option(r.getAs[String]("asof_pay"))).toMap
    assert(fwd(1L) == Some("a"))   // next at-or-after ts=5 is ts=10
    assert(fwd(2L) == Some("a"))   // same-instant matches forward too
    assert(fwd(3L) == None)        // nothing after ts=20
    assert(fwd(4L) == None)        // v's only right row is in the past
    assert(fwd(5L) == None)
    // the plan must contain no join node — the whole point of the shape
    val plan = graft.operators.Ranges
      .asofJoin(left, right, "k", "ts", Seq("pay"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"asofJoin planned a join:\n$plan")
  }

  test("asof join tolerance: distant matches null out, near ones survive") {
    import spark.implicits._
    val left = Seq((1L, "u", 20L), (2L, "u", 16L)).toDF("id", "k", "ts")
    val right = Seq(("u", 15L, "a")).toDF("k", "ts", "pay")
    def run(tol: Long) = graft.operators.Ranges
      .asofJoin(left, right, "k", "ts", Seq("pay"), toleranceSec = Some(tol))
      .collect().map(r => r.getAs[Long]("id") ->
        Option(r.getAs[String]("asof_pay"))).toMap
    // gap 5 for id=1, gap 1 for id=2
    assert(run(4L) == Map(1L -> None, 2L -> Some("a")))
    assert(run(5L) == Map(1L -> Some("a"), 2L -> Some("a")))
    intercept[IllegalArgumentException] {
      graft.operators.Ranges.asofJoin(left, right, "k", "ts", Seq("pay"),
        toleranceSec = Some(-1L))
    }
  }

  test("asof join tolerance on TIMESTAMP_NTZ ts (tz-less parquet shape)") {
    // a tz-less parquet writer (the regenerated testdata) surfaces ts
    // as TIMESTAMP_NTZ — the tolerance path must resolve it like
    // TIMESTAMP, not throw the unsupported-type error
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, timestamp_seconds}
    def ntz(df: org.apache.spark.sql.DataFrame) = df.withColumn("ts",
      timestamp_seconds(col("ts")).cast("timestamp_ntz"))
    val left = ntz(Seq((1L, "u", 20L), (2L, "u", 16L)).toDF("id", "k", "ts"))
    val right = ntz(Seq(("u", 15L, "a")).toDF("k", "ts", "pay"))
    assert(left.schema("ts").dataType ==
      org.apache.spark.sql.types.TimestampNTZType)
    val got = graft.operators.Ranges
      .asofJoin(left, right, "k", "ts", Seq("pay"), toleranceSec = Some(4L))
      .collect().map(r => r.getAs[Long]("id") ->
        Option(r.getAs[String]("asof_pay"))).toMap
    assert(got == Map(1L -> None, 2L -> Some("a"))) // gaps 5 and 1
  }

  test("resample LOCF: slot alignment, carried payloads total, slotless span empty") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val obs = Seq(
      ("u", "2024-01-01 00:30:00.5", 1.0), // sub-second: 00:00 slot must NOT appear
      ("u", "2024-01-01 05:59:59", 2.0),
      ("u", "2024-01-01 13:00:00", 3.0),
      ("v", "2024-01-01 03:00:00", 4.0),   // span contains no 6h slot
      ("w", "2024-01-01 06:00:00", 5.0))   // exactly ON a slot: matches itself
      .toDF("k", "s", "value")
      .select(col("k"), col("s").cast("timestamp").as("ts"), col("value"))
    val out = graft.operators.Ranges
      .resampleLocf(obs, "k", "ts", Seq("value"), 21600L)
      .collect()
      .map(r => (r.getAs[String]("k"), r.getAs[java.sql.Timestamp]("ts").toString)
        -> r.getAs[Double]("locf_value")).toMap
    assert(out == Map(
      ("u", "2024-01-01 06:00:00.0") -> 2.0,  // latest at-or-before 06:00
      ("u", "2024-01-01 12:00:00.0") -> 2.0,  // 13:00 obs is in the future
      ("w", "2024-01-01 06:00:00.0") -> 5.0)) // same-instant inclusive
    // no v rows (no aligned slot in its span), no NULL payloads ever
    assert(!out.keySet.exists(_._1 == "v"))
  }

  test("band stats ≡ aggregated band pairs on scattered values") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, count, lit, min, sum}
    // duplicate values, band minima with/without same-value runner-ups,
    // isolated rows — every branch of the min-partner selection
    val d = Seq((1L, 4L), (2L, 4L), (3L, 7L), (4L, 15L), (5L, 16L),
      (6L, 16L), (7L, 100L), (8L, 103L), (9L, 200L))
      .toDF("id", "v")
    val viaPairs = graft.operators.Ranges.bandPairs(d, "id", "v", 5.0)
      .groupBy(col("ida"))
      .agg(count(lit(1)).as("n_close"), sum(col("vb")).as("sum_partner_vals"),
        min(col("idb")).as("min_partner_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    val viaStats = graft.operators.Ranges.bandStats(d, "id", "v", 5.0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    assert(viaStats == viaPairs)
  }

  test("band pairs: complete + sound vs brute force, incl. bucket boundaries") {
    import spark.implicits._
    // values straddle bucket edges: 10/5=2.0 exactly, 14&15 adjacent
    // buckets within eps, 4&10 diff 6 > eps rejected
    val d = Seq((1L, 4L), (2L, 10L), (3L, 14L), (4L, 15L), (5L, 100L))
      .toDF("id", "v")
    val got = graft.operators.Ranges.bandPairs(d, "id", "v", 5.0)
      .collect().map(r => (r.getAs[Long]("ida"), r.getAs[Long]("idb"))).toSet
    val vals = Map(1L -> 4L, 2L -> 10L, 3L -> 14L, 4L -> 15L, 5L -> 100L)
    val truth = (for {
      a <- vals.keys; b <- vals.keys
      if a != b && math.abs(vals(a) - vals(b)) <= 5
    } yield (a, b)).toSet
    assert(got == truth)
  }
}
