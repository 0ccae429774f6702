package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is assembled from per-domain modules; every entry that is
  * expressible in portable SQL also appears in `oracleSql` (DuckDB
  * equivalent over the same parquet tables). Column names/aliases match
  * exactly between the two — the driver sorts columns by name before
  * hashing values.
  */
object SparkEntry {
  private def allDefs: Seq[QueryDef] =
    queries0

  private lazy val queries0: Seq[QueryDef] =
    graft.queries.Relational.defs ++ graft.queries.Extended.defs ++
      graft.queries.Pipeline.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q3_join_revenue")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allDefs.map(d => d.name -> d.fn).toMap

  /** Declaration-ordered (name, fn) pairs. Bench iterates THESE, not
    * `queries`: Map hash order reshuffles the run order every time a
    * query is added, which moves JIT/allocation warm-up costs between
    * queries and makes per-query timings incomparable across rounds. */
  def orderedQueries: Seq[(String, (SparkSession, String) => DataFrame)] =
    allDefs.map(d => d.name -> d.fn)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    allDefs.collect { case QueryDef(n, _, Some(sql)) => n -> sql }.toMap
}
