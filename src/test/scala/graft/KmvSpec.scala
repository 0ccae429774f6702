package graft

import graft.functions.TextFns
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** KMV distinct-count sketch (expressions/KmvSketch) invariants:
  * exactness below k, partition-layout invariance (merge correctness),
  * deterministic accuracy on a known cardinality, SQL surface.
  */
class KmvSpec extends AnyFunSuite {
  private lazy val spark = Sessions.local(8)

  private def hashed(n: Int) = {
    import spark.implicits._
    (1 to n).map(_.toString).toDF("v")
      .select(TextFns.hash60(col("v")).as("h"))
  }

  private def estimate(df: org.apache.spark.sql.DataFrame, k: Int): Double =
    df.agg(call_function("graft_kmv", col("h"), lit(k)).as("e"))
      .collect().head.getDouble(0)

  test("below k the sketch is the exact distinct count") {
    // 40 distinct values, each duplicated — k=64 never fills
    val df = hashed(40).union(hashed(40))
    assert(estimate(df, 64) == 40.0)
  }

  test("estimate is invariant to partition layout (merge path)") {
    val one = estimate(hashed(5000).coalesce(1), 64)
    val many = estimate(hashed(5000).repartition(7), 64)
    assert(one == many)
  }

  test("deterministic accuracy on 5000 distinct values") {
    val est = estimate(hashed(5000), 64)
    assert(math.abs(est - 5000) / 5000.0 < 0.3,
      s"KMV estimate $est too far from 5000")
  }

  test("rejects non-bigint input, k < 2, and non-literal k") {
    import spark.implicits._
    val strs = Seq("a", "b").toDF("v")
    intercept[org.apache.spark.sql.AnalysisException] {
      strs.agg(call_function("graft_kmv", col("v"), lit(64))).collect()
    }
    intercept[Exception] {
      hashed(5).agg(call_function("graft_kmv", col("h"), lit(1))).collect()
    }
    intercept[Exception] {
      hashed(5).agg(call_function("graft_kmin", col("h"), col("h"))).collect()
    }
  }

  test("callable from SQL and groups independently") {
    hashed(100).withColumn("g", (col("h") % 2 === 0).cast("int"))
      .createOrReplaceTempView("kmv_in")
    val rows = spark.sql(
      "SELECT g, graft_kmv(h, 64) AS e FROM kmv_in GROUP BY g").collect()
    assert(rows.length == 2)
    // both groups are below k, so estimates are exact partition counts
    assert(rows.map(_.getDouble(1)).sum == 100.0)
  }
}
