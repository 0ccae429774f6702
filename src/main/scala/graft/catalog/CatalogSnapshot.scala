package graft.catalog

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Immutable snapshot of a source database's catalog — the engine's
  * primary input (SURVEY.md §2.1 S1-S6). Columns mirror what the
  * reference's SMO pipeline consumes from pg_catalog
  * (/root/reference/sql/V000009__track_index_definitions_in_smo.sql:12-99),
  * with Postgres-only formatting functions (format_type, pg_get_expr,
  * pg_get_constraintdef, pg_get_indexdef, pg_get_serial_sequence,
  * has_schema_privilege) evaluated AT SNAPSHOT TIME — by the JDBC pushdown
  * query against a live database, or pre-baked in fixture files. The
  * engine itself never re-implements them.
  *
  * Everything downstream (SMO, concepts, status, scoring) is a pure
  * function of this snapshot, which is what makes what-if simulation a
  * DataFrame transformation instead of transactional DDL (SURVEY.md §3.3).
  */
final case class CatalogSnapshot(
    relations: DataFrame,
    attributes: DataFrame,
    constraints: DataFrame,
    indexes: DataFrame,
    schemaPrivs: DataFrame,
    dependencies: DataFrame,
    roles: DataFrame,
    roleMembers: DataFrame,
    grants: DataFrame)

object CatalogSnapshot {

  /** relkind ∈ 'r' (table) | 'v' (view) | 'm' (matview), as in pg_class. */
  val relationsSchema: StructType = StructType(Seq(
    StructField("schema_name", StringType, nullable = false),
    StructField("table_name", StringType, nullable = false),
    StructField("relkind", StringType, nullable = false),
    StructField("description", StringType, nullable = true),
    StructField("approx_rows", LongType, nullable = false)))

  val attributesSchema: StructType = StructType(Seq(
    StructField("schema_name", StringType, nullable = false),
    StructField("table_name", StringType, nullable = false),
    StructField("column_name", StringType, nullable = false),
    StructField("attnum", IntegerType, nullable = false),
    StructField("data_type", StringType, nullable = false),
    StructField("not_null", BooleanType, nullable = false),
    StructField("default_value", StringType, nullable = true),
    StructField("column_description", StringType, nullable = true),
    StructField("is_dropped", BooleanType, nullable = false),
    // null | 's' (stored) | 'v' (virtual), as in pg_attribute.attgenerated
    StructField("generated", StringType, nullable = true)))

  /** constraint_type ∈ p|f|u|c|x as in pg_constraint.contype ('g' rows are
    * synthesized by SmoBuilder from generated columns, not stored here).
    * references_schema/table identify the target of 'f' constraints
    * (pg_constraint.confrelid resolved at snapshot time) — scoring counts
    * inbound FKs per table with it. */
  val constraintsSchema: StructType = StructType(Seq(
    StructField("schema_name", StringType, nullable = false),
    StructField("table_name", StringType, nullable = false),
    StructField("constraint_name", StringType, nullable = false),
    StructField("constraint_type", StringType, nullable = false),
    StructField("definition", StringType, nullable = false),
    StructField("constraint_keys", ArrayType(IntegerType), nullable = false),
    StructField("foreign_keys", ArrayType(IntegerType), nullable = true),
    StructField("sequence_name", StringType, nullable = true),
    StructField("references_schema", StringType, nullable = true),
    StructField("references_table", StringType, nullable = true)))

  val indexesSchema: StructType = StructType(Seq(
    StructField("schema_name", StringType, nullable = false),
    StructField("table_name", StringType, nullable = false),
    StructField("index_name", StringType, nullable = false),
    StructField("is_unique", BooleanType, nullable = false),
    StructField("is_exclusion", BooleanType, nullable = false),
    StructField("is_primary", BooleanType, nullable = false),
    StructField("is_valid", BooleanType, nullable = false),
    StructField("immediate", BooleanType, nullable = false),
    StructField("definition", StringType, nullable = false),
    StructField("index_keys", ArrayType(IntegerType), nullable = false)))

  /** Schemas the snapshotting user lacks USAGE on — unioned into the
    * ignore list (sql/V000006__ignore_all_schemas_without_usage.sql:3-10). */
  val schemaPrivsSchema: StructType = StructType(Seq(
    StructField("schema_name", StringType, nullable = false),
    StructField("has_usage", BooleanType, nullable = false)))

  /** View→relation dependency edges — the pg_depend/pg_rewrite analog.
    * The reference never queries these directly: Postgres applies them
    * implicitly when core_test.clj:236-248 runs `drop table … cascade`.
    * Re-expressing what-if as a snapshot transformation (Engine
    * .whatIfDropTable) needs them explicit: a dropped relation takes its
    * dependent views down transitively, which is what shrinks the
    * abbreviation-view schemas in the reference's what-if golden. */
  val dependenciesSchema: StructType = StructType(Seq(
    StructField("dependent_schema", StringType, nullable = false),
    StructField("dependent_table", StringType, nullable = false),
    StructField("referenced_schema", StringType, nullable = false),
    StructField("referenced_table", StringType, nullable = false)))

  /** Role catalog — pg_roles (doctor's role-hierarchy walk,
    * rust/src/doctor.rs:59-83). */
  val rolesSchema: StructType = StructType(Seq(
    StructField("role_name", StringType, nullable = false)))

  /** Direct role memberships — pg_auth_members resolved to names:
    * `member` IS a member of `role` (inherits its grants). */
  val roleMembersSchema: StructType = StructType(Seq(
    StructField("role", StringType, nullable = false),
    StructField("member", StringType, nullable = false)))

  /** Table grants — information_schema.role_table_grants projection
    * consumed by the doctor's privilege rollup (doctor.rs:84-126). */
  val grantsSchema: StructType = StructType(Seq(
    StructField("grantee", StringType, nullable = false),
    StructField("table_schema", StringType, nullable = false),
    StructField("table_name", StringType, nullable = false),
    StructField("privilege_type", StringType, nullable = false)))

  private val files = Seq("relations", "attributes", "constraints",
    "indexes", "schema_privs", "dependencies", "roles", "role_members",
    "grants")
  private val optionalFiles: Map[String, StructType] = Map(
    "dependencies" -> dependenciesSchema, "roles" -> rolesSchema,
    "role_members" -> roleMembersSchema, "grants" -> grantsSchema)

  def emptyDf(spark: SparkSession, schema: StructType): DataFrame =
    spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema)

  /** Load a snapshot persisted as one parquet per dataset under `dir`.
    * Snapshots written before the newer datasets existed (dependencies,
    * roles, role_members, grants) load them empty — what-if then prunes
    * no views and doctor reports no roles, as before. */
  def fromDir(spark: SparkSession, dir: String): CatalogSnapshot = {
    val dfs = files.map { f =>
      optionalFiles.get(f) match {
        case Some(schema) if !new java.io.File(s"$dir/$f.parquet").exists() =>
          emptyDf(spark, schema)
        case _ => spark.read.parquet(s"$dir/$f.parquet")
      }
    }
    val Seq(r, a, c, i, p, d, ro, rm, g) = dfs
    CatalogSnapshot(r, a, c, i, p, d, ro, rm, g)
  }

  /** Persist, one parquet per dataset (the refresh()-materialized form). */
  def write(snap: CatalogSnapshot, dir: String): Unit =
    files.zip(Seq(snap.relations, snap.attributes, snap.constraints,
      snap.indexes, snap.schemaPrivs, snap.dependencies, snap.roles,
      snap.roleMembers, snap.grants)).foreach { case (f, df) =>
      df.write.mode("overwrite").parquet(s"$dir/$f.parquet")
    }

  /** In-memory snapshot from rows — fixture/test construction. */
  def fromRows(
      spark: SparkSession,
      relations: Seq[Row],
      attributes: Seq[Row],
      constraints: Seq[Row],
      indexes: Seq[Row] = Seq.empty,
      schemaPrivs: Seq[Row] = Seq.empty,
      dependencies: Seq[Row] = Seq.empty,
      roles: Seq[Row] = Seq.empty,
      roleMembers: Seq[Row] = Seq.empty,
      grants: Seq[Row] = Seq.empty): CatalogSnapshot = {
    def mk(rows: Seq[Row], schema: StructType) =
      spark.createDataFrame(
        spark.sparkContext.parallelize(rows, math.max(1, rows.size min 4)), schema)
    CatalogSnapshot(
      mk(relations, relationsSchema),
      mk(attributes, attributesSchema),
      mk(constraints, constraintsSchema),
      mk(indexes, indexesSchema),
      mk(schemaPrivs, schemaPrivsSchema),
      mk(dependencies, dependenciesSchema),
      mk(roles, rolesSchema),
      mk(roleMembers, roleMembersSchema),
      mk(grants, grantsSchema))
  }
}
