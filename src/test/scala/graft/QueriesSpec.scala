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
}
