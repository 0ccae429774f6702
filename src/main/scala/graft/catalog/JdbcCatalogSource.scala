package graft.catalog

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Live-database catalog snapshotting over Spark JDBC (SURVEY.md §2.1
  * S1-S6). Each dataset is ONE pushdown query: Postgres-only formatting
  * functions (format_type, pg_get_expr, pg_get_constraintdef,
  * pg_get_indexdef, pg_get_serial_sequence, obj_description,
  * col_description, has_schema_privilege) evaluate inside the source
  * database — the engine never re-implements them (SURVEY.md §2.6), it
  * just receives their results as plain columns shaped exactly like
  * [[CatalogSnapshot]]'s schemas.
  *
  * The SQL re-expresses the reference's SMO CTEs
  * (/root/reference/sql/V000009__track_index_definitions_in_smo.sql:12-99,
  * V000006…sql:3-10,59-77) as snapshot queries; filtering/packing happens
  * afterwards in Spark (SmoBuilder), so these stay simple scans the PG
  * planner handles with catalog indexes.
  *
  * Catalog tables are small (≤10^5 rows for thousand-table databases) —
  * a single-partition JDBC read per dataset is the right plan; there is
  * nothing to parallelize against a hot production catalog, and one
  * connection per dataset respects the reference's connection-budget
  * ethos (rust/create_schemamap_users.sql:11-17).
  */
object JdbcCatalogSource {

  val relationsQuery: String =
    """select n.nspname  as schema_name,
      |       c.relname  as table_name,
      |       c.relkind::text as relkind,
      |       obj_description(c.oid, 'pg_class') as description,
      |       greatest(c.reltuples::bigint, 0) as approx_rows
      |from pg_catalog.pg_class c
      |join pg_catalog.pg_namespace n on n.oid = c.relnamespace
      |where c.relkind in ('r','v','m')""".stripMargin

  val attributesQuery: String =
    """select n.nspname as schema_name,
      |       c.relname as table_name,
      |       a.attname as column_name,
      |       a.attnum::int as attnum,
      |       format_type(a.atttypid, a.atttypmod) as data_type,
      |       a.attnotnull as not_null,
      |       pg_get_expr(d.adbin, d.adrelid) as default_value,
      |       col_description(c.oid, a.attnum) as column_description,
      |       a.attisdropped as is_dropped,
      |       nullif(a.attgenerated::text, '') as generated
      |from pg_catalog.pg_attribute a
      |join pg_catalog.pg_class c on c.oid = a.attrelid
      |join pg_catalog.pg_namespace n on n.oid = c.relnamespace
      |left join pg_catalog.pg_attrdef d
      |  on d.adrelid = a.attrelid and d.adnum = a.attnum
      |where c.relkind in ('r','v','m')""".stripMargin

  val constraintsQuery: String =
    """select n.nspname as schema_name,
      |       c.relname as table_name,
      |       con.conname as constraint_name,
      |       con.contype::text as constraint_type,
      |       pg_get_constraintdef(con.oid) as definition,
      |       con.conkey::int[] as constraint_keys,
      |       con.confkey::int[] as foreign_keys,
      |       case when con.contype = 'p' then
      |         pg_get_serial_sequence(quote_ident(n.nspname) || '.' ||
      |           quote_ident(c.relname),
      |           (select attname from pg_attribute
      |            where attrelid = c.oid and attnum = con.conkey[1]))
      |       end as sequence_name,
      |       fn.nspname as references_schema,
      |       fc.relname as references_table
      |from pg_catalog.pg_constraint con
      |join pg_catalog.pg_class c on c.oid = con.conrelid
      |join pg_catalog.pg_namespace n on n.oid = c.relnamespace
      |left join pg_catalog.pg_class fc on fc.oid = con.confrelid
      |left join pg_catalog.pg_namespace fn on fn.oid = fc.relnamespace""".stripMargin

  val indexesQuery: String =
    """select n.nspname as schema_name,
      |       tc.relname as table_name,
      |       ic.relname as index_name,
      |       i.indisunique as is_unique,
      |       i.indisexclusion as is_exclusion,
      |       i.indisprimary as is_primary,
      |       i.indisvalid as is_valid,
      |       i.indimmediate as immediate,
      |       regexp_replace(pg_get_indexdef(i.indexrelid),
      |                      '(^.*USING )', '') as definition,
      |       -- indkey is int2vector, which has NO registered cast to
      |       -- int[]; its text form is space-separated, so go via text
      |       string_to_array(i.indkey::text, ' ')::int[] as index_keys
      |from pg_catalog.pg_index i
      |join pg_catalog.pg_class tc on tc.oid = i.indrelid
      |join pg_catalog.pg_class ic on ic.oid = i.indexrelid
      |join pg_catalog.pg_namespace n on n.oid = tc.relnamespace""".stripMargin

  val schemaPrivsQuery: String =
    """select nspname as schema_name,
      |       has_schema_privilege(nspname, 'usage') as has_usage
      |from pg_catalog.pg_namespace""".stripMargin

  /** View→relation edges via pg_rewrite/pg_depend — what `drop table …
    * cascade` consults implicitly in the reference's what-if test
    * (core_test.clj:236-248). A view's rewrite rule depends on every
    * relation it selects from; resolving rule → view (ev_class) and
    * dependency target (refobjid) yields the edge list. */
  val dependenciesQuery: String =
    """select distinct
      |       vn.nspname as dependent_schema,
      |       v.relname  as dependent_table,
      |       tn.nspname as referenced_schema,
      |       t.relname  as referenced_table
      |from pg_catalog.pg_rewrite r
      |join pg_catalog.pg_depend d
      |  on d.objid = r.oid and d.classid = 'pg_rewrite'::regclass
      | and d.refclassid = 'pg_class'::regclass and d.deptype = 'n'
      |join pg_catalog.pg_class v on v.oid = r.ev_class
      |join pg_catalog.pg_namespace vn on vn.oid = v.relnamespace
      |join pg_catalog.pg_class t on t.oid = d.refobjid
      |join pg_catalog.pg_namespace tn on tn.oid = t.relnamespace
      |where v.oid <> d.refobjid""".stripMargin

  /** Role catalog for the doctor walk (rust/src/doctor.rs:59-83). */
  val rolesQuery: String =
    """select r.rolname as role_name
      |from pg_catalog.pg_roles r""".stripMargin

  /** pg_auth_members resolved to names: member → role it belongs to. */
  val roleMembersQuery: String =
    """select r2.rolname as role, r.rolname as member
      |from pg_catalog.pg_auth_members m
      |join pg_catalog.pg_roles r on r.oid = m.member
      |join pg_catalog.pg_roles r2 on r2.oid = m.roleid""".stripMargin

  /** Table-grant projection the doctor's privilege rollup consumes
    * (rust/src/doctor.rs:91-99). */
  val grantsQuery: String =
    """select grantee, table_schema, table_name, privilege_type
      |from information_schema.role_table_grants""".stripMargin

  val allQueries: Map[String, String] = Map(
    "relations" -> relationsQuery,
    "attributes" -> attributesQuery,
    "constraints" -> constraintsQuery,
    "indexes" -> indexesQuery,
    "schema_privs" -> schemaPrivsQuery,
    "dependencies" -> dependenciesQuery,
    "roles" -> rolesQuery,
    "role_members" -> roleMembersQuery,
    "grants" -> grantsQuery)

  private def read(spark: SparkSession, url: String,
      props: Map[String, String], query: String): DataFrame =
    props.foldLeft(
      spark.read.format("jdbc").option("url", url).option("query", query)
    ) { case (r, (k, v)) => r.option(k, v) }.load()

  /** Snapshot a live database's catalog. `props` carries user/password/
    * driver options for the Spark JDBC source. */
  def snapshot(spark: SparkSession, url: String,
      props: Map[String, String] = Map.empty): CatalogSnapshot =
    CatalogSnapshot(
      read(spark, url, props, relationsQuery),
      read(spark, url, props, attributesQuery),
      read(spark, url, props, constraintsQuery),
      read(spark, url, props, indexesQuery),
      read(spark, url, props, schemaPrivsQuery),
      read(spark, url, props, dependenciesQuery),
      read(spark, url, props, rolesQuery),
      read(spark, url, props, roleMembersQuery),
      read(spark, url, props, grantsQuery))
}
