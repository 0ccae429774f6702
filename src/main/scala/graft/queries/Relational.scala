package graft.queries

import graft.{QueryDef, Tables}
import graft.Tables.{countIf, dec2, decAvg, decSum}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Relational operator suite over the driver's TPC-H-ish tables.
  *
  * Each query re-expresses one operator family from SURVEY.md §2 (the
  * reference's catalog-analytics pipeline,
  * /root/reference/sql/V000009__track_index_definitions_in_smo.sql and
  * V000001__init.sql) as an idiomatic Spark plan over the test tables,
  * paired with a DuckDB oracle. Dimension joins are broadcast; filters are
  * written to push into the parquet scan.
  */
object Relational {

  /** A1/A-class filtered aggregation (TPC-H Q1 shape): map-side partial
    * aggregation, exact-decimal sums for oracle parity. */
  private def q1(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.df(spark, dir, "lineitem")
    li.groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        decSum(col("l_quantity")).as("sum_qty"),
        decSum(col("l_extendedprice")).as("sum_base_price"),
        sum(dec2(col("l_extendedprice")) * dec2(lit(1.0) - col("l_discount")))
          .cast("double").as("sum_disc_price"),
        sum(dec2(col("l_extendedprice")) * dec2(lit(1.0) - col("l_discount"))
          * dec2(lit(1.0) + col("l_tax"))).cast("double").as("sum_charge"),
        decAvg(col("l_quantity")).as("avg_qty"),
        decAvg(col("l_extendedprice")).as("avg_price"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  private val q1Sql =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(38,4))) AS DOUBLE) AS sum_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,4))) AS DOUBLE) AS sum_base_price,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))*CAST(1.0-l_discount AS DECIMAL(12,2))) AS DOUBLE) AS sum_disc_price,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))*CAST(1.0-l_discount AS DECIMAL(12,2))*CAST(1.0+l_tax AS DECIMAL(12,2))) AS DOUBLE) AS sum_charge,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(38,4))) AS DOUBLE)/COUNT(l_quantity) AS avg_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,4))) AS DOUBLE)/COUNT(l_extendedprice) AS avg_price,
      |  COUNT(*) AS count_order
      |FROM lineitem GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** P2/P3-class conjunctive filter fully pushed to the parquet scan
    * (TPC-H Q6 shape). */
  private def q2(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.df(spark, dir, "lineitem")
    li.filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp")
        && col("l_shipdate") < lit("1997-01-01").cast("timestamp")
        && col("l_discount") >= 0.05 && col("l_discount") <= 0.07
        && col("l_quantity") < 24)
      .agg(
        sum(dec2(col("l_extendedprice")) * dec2(col("l_discount")))
          .cast("double").as("revenue"),
        count(lit(1)).as("n_rows"))
  }

  private val q2Sql =
    """SELECT
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))*CAST(l_discount AS DECIMAL(12,2))) AS DOUBLE) AS revenue,
      |  COUNT(*) AS n_rows
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      |  AND l_shipdate < TIMESTAMP '1997-01-01'
      |  AND l_discount >= 0.05 AND l_discount <= 0.07 AND l_quantity < 24""".stripMargin

  /** J1/J2-class equi-join chain with broadcast dimensions (TPC-H Q5
    * shape): fact tables shuffle on the join key once; nation/region are
    * broadcast so no shuffle is added per dimension. */
  private def q3(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.df(spark, dir, "customer")
    val ord = Tables.df(spark, dir, "orders")
    val li = Tables.df(spark, dir, "lineitem")
    val nat = Tables.df(spark, dir, "nation")
    val reg = Tables.df(spark, dir, "region")
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(reg), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(
        sum(dec2(col("l_extendedprice")) * dec2(lit(1.0) - col("l_discount")))
          .cast("double").as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy(col("r_name"), col("n_name"))
  }

  private val q3Sql =
    """SELECT r_name, n_name,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))*CAST(1.0-l_discount AS DECIMAL(12,2))) AS DOUBLE) AS revenue,
      |  COUNT(*) AS n_items
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin

  /** J8/A2-class: left-outer join + count of matches per driving row
    * (the reference's "FKs referencing each table" count,
    * sql/V000001__init.sql:223-227). count(col) counts only non-null,
    * so customers with no orders report 0. */
  private def q4(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.df(spark, dir, "customer")
    val ord = Tables.df(spark, dir, "orders")
    cust.join(ord, col("o_custkey") === col("c_custkey"), "left")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("n_orders"),
        decSum(col("o_totalprice")).as("total_spend"))
      .orderBy(col("c_custkey"))
  }

  private val q4Sql =
    """SELECT c_custkey,
      |  COUNT(o_orderkey) AS n_orders,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(38,4))) AS DOUBLE) AS total_spend
      |FROM customer LEFT JOIN orders ON o_custkey = c_custkey
      |GROUP BY c_custkey ORDER BY c_custkey""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q1_agg_pricing", q1, Some(q1Sql)),
    QueryDef("q2_filter_pushdown", q2, Some(q2Sql)),
    QueryDef("q3_join_revenue", q3, Some(q3Sql)),
    QueryDef("q4_leftjoin_fkcount", q4, Some(q4Sql)))
}
