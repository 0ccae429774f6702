package graft.registry

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.analysis.UnresolvedRelation
import org.apache.spark.sql.types.StructType

/** The redefinable-SQL surface: the reference lets host applications
  * re-define hook-point functions (list_tenants, ignored_schemas, mde_*)
  * with their own SQL while enforcing the original signature and
  * rejecting volatile bodies (/root/reference/sql/V000001__init.sql:
  * 146-207, V000003…sql:5-32). Here each hook is a named SQL fragment
  * with a declared result schema; redefinition re-parses, re-analyzes and
  * schema-checks before replacing.
  */
object Volatility extends Enumeration {
  val Immutable, Stable, Volatile = Value
}

final case class FragmentDef(
    name: String,
    sql: String,
    declaredSchema: StructType,
    volatility: Volatility.Value,
    reserved: Boolean = false)

final class FragmentRegistry(spark: SparkSession) {
  // synchronized: the engine facade is shared; registration races with
  // reads otherwise (the reference gets this for free from Postgres DDL
  // transactionality)
  private val defs = scala.collection.mutable.LinkedHashMap[String, FragmentDef]()

  def register(d: FragmentDef): Unit = synchronized { defs(d.name) = d }

  def list: Seq[String] = synchronized { defs.keys.toSeq.sorted }

  /** update_function_definition() 0-arity: the redefinable set — non
    * volatile, non reserved (sql/V000003…sql:5-26). */
  def listRedefinable: Seq[String] =
    synchronized {
      defs.values.filter(d => !d.reserved && d.volatility != Volatility.Volatile)
        .map(_.name).toSeq.sorted
    }

  /** update_function_definition(name) 1-arity: current definition text. */
  def definition(name: String): Option[String] = synchronized { defs.get(name).map(_.sql) }

  /** update_function_definition(name, body): replace the SQL while
    * preserving the declared signature. Mirrors the reference's guards:
    * unknown name, volatile target, and (our analog of "same returns")
    * an output schema mismatch all throw. Parsing goes through Spark's
    * own parser; any side-effecting statement — Command subclasses AND
    * the DML nodes that are NOT Commands (InsertIntoStatement, UPDATE /
    * DELETE / MERGE) — is rejected BEFORE anything executes, and the
    * schema check analyzes the parsed plan directly (executePlan(...)
    * .analyzed) rather than constructing a Dataset, which for command
    * plans would eagerly execute the mutation during validation. */
  def update(name: String, newSql: String): Unit = {
    import org.apache.spark.sql.catalyst.plans.logical._
    val d = synchronized { defs.getOrElse(name,
      throw new IllegalArgumentException(s"unknown fragment: $name")) }
    if (d.volatility == Volatility.Volatile)
      throw new IllegalStateException(s"fragment $name is volatile. update not allowed.")
    val plan = spark.sessionState.sqlParser.parsePlan(newSql)
    val sideEffecting = plan.exists {
      case _: Command => true
      case _: InsertIntoStatement => true
      case _: UpdateTable => true
      case _: DeleteFromTable => true
      case _: MergeIntoTable => true
      case _ => false
    }
    if (sideEffecting)
      throw new IllegalArgumentException(s"fragment $name must be a query, not a command")
    val actual = spark.sessionState.executePlan(plan).analyzed.schema
    val want = d.declaredSchema
    require(actual.fields.map(f => (f.name, f.dataType)).sameElements(
      want.fields.map(f => (f.name, f.dataType))),
      s"fragment $name signature mismatch: got ${actual.simpleString}, want ${want.simpleString}")
    synchronized { defs(name) = d.copy(sql = newSql) }
  }

  /** Evaluate a fragment. Callers treat the result as a table function. */
  def df(name: String): DataFrame = spark.sql(synchronized { defs(name).sql })

  /** Tables a fragment's SQL references (the reference cloud service
    * "analyzes your SELECT"; rust/src/doctor.rs:252-264 documents MDEs
    * written with deliberately-false join conditions just to declare
    * related tables — plan analysis picks those up too). */
  def referencedTables(name: String): Seq[String] = {
    val plan = spark.sessionState.sqlParser.parsePlan(synchronized { defs(name).sql })
    plan.collect { case r: UnresolvedRelation => r.multipartIdentifier.mkString(".") }
      .distinct.sorted
  }
}

object FragmentRegistry {
  import org.apache.spark.sql.types._

  val TenantsSchema: StructType = StructType(Seq(
    StructField("tenant_id", StringType),
    StructField("tenant_short_name", StringType),
    StructField("tenant_display_name", StringType),
    StructField("tenant_locale", StringType),
    StructField("tenant_data", StringType))) // open-shaped JSON as text

  /** Default ignore list (sql/V000010__schema_concepts.sql:87-100):
    * engine-internal namespaces of Postgres/Citus/CockroachDB/PostGIS,
    * plus the engine's own namespace. */
  val DefaultIgnoredSchemas: Seq[String] = Seq(
    "pg_catalog", "information_schema", "columnar", "columnar_internal",
    "crdb_internal", "tiger", "schemamap")

  /** Seed registry with the reference's stubs: list_tenants returns an
    * empty correctly-typed relation until the host app redefines it
    * (sql/V000001__init.sql:3-17). */
  def withDefaults(spark: SparkSession): FragmentRegistry = {
    val r = new FragmentRegistry(spark)
    r.register(FragmentDef(
      "list_tenants",
      """SELECT CAST(null AS STRING) AS tenant_id,
        |       CAST(null AS STRING) AS tenant_short_name,
        |       CAST(null AS STRING) AS tenant_display_name,
        |       CAST(null AS STRING) AS tenant_locale,
        |       CAST(null AS STRING) AS tenant_data
        |WHERE 1 = 0""".stripMargin,
      TenantsSchema, Volatility.Stable))
    r.register(FragmentDef(
      "ignored_schemas",
      DefaultIgnoredSchemas.map(s => s"('$s')")
        .mkString("SELECT col1 AS nspname FROM VALUES ", ", ", ""),
      StructType(Seq(StructField("nspname", StringType, nullable = false))),
      Volatility.Stable))
    r
  }
}
