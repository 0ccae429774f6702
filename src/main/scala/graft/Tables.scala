package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types
import org.apache.spark.sql.types.DecimalType

/** Loaders for the driver-provided parquet tables (TESTDATA.md) plus
  * shared helpers for oracle-parity arithmetic.
  *
  * Oracle-parity rule: the driver hash-compares our parquet output against
  * DuckDB running the `oracleSql` text on the same files. Floating-point
  * SUMs are order-dependent, so every money/quantity aggregate goes through
  * an exact decimal representation first (`decSum`) and is only converted
  * back to double at the output edge — both engines then produce
  * bit-identical doubles.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def df(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val raw = spark.read.parquet(s"$sfDir/$name.parquet")
    // events.ts is parquet TIMESTAMP(NANOS), which Spark's vectorized
    // reader rejects; sessions must set
    // spark.sql.legacy.parquet.nanosAsLong=true (see Sessions.config),
    // and we rebuild a micros TimestampType column here. Floor-division
    // truncation matches DuckDB's ns->micros behavior.
    if (name == "events" && raw.schema("ts").dataType == types.LongType)
      raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else raw
  }

  /** Exact-decimal sum of a column whose values carry at most `scale`
    * fractional decimal digits; returned as double for a stable schema. */
  def decSum(c: Column, precision: Int = 38, scale: Int = 4): Column =
    sum(c.cast(DecimalType(precision, scale))).cast("double")

  /** Deterministic average: exact decimal sum divided (in double) by count. */
  def decAvg(c: Column, scale: Int = 4): Column =
    sum(c.cast(DecimalType(38, scale))).cast("double") / count(c)

  /** count(*) FILTER (WHERE cond) without a join — matches DuckDB FILTER. */
  def countIf(cond: Column): Column = count(when(cond, 1))

  /** Cast a 2-decimal-valued double column to an exact decimal. Safe:
    * the intended value has 2 fractional digits, the double error is
    * ~1e-16, so the rounding never lands on a half boundary. Products of
    * doubles must NOT be cast directly (their true binary value can sit
    * within a half-ulp of a decimal boundary and Java/DuckDB round it
    * differently); cast the factors with this and multiply in decimal —
    * decimal multiplication is exact in both engines. */
  def dec2(c: Column): Column = c.cast(DecimalType(12, 2))
}

/** One driver-gated query: the Spark implementation plus (optionally) the
  * equivalent DuckDB SQL oracle. `oracle == None` → the driver records a
  * weaker rows-only check (used for ops whose exact output is not
  * expressible in portable SQL, e.g. MinHash dedup).
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])
