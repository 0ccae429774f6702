package graft.registry

import graft.util.PgFormat.quoteIdent

/** Grants-plan generator (SURVEY.md §2.9): the engine does not enforce
  * database ACLs itself — for JDBC targets it emits the same staged SQL
  * the reference installs (/root/reference/rust/create_schemamap_users.sql,
  * grant_schemamap_usage.sql, clojure/src/io/schemamap/core.clj:40-54),
  * with the reference's two safety behaviors preserved:
  *
  *   - role names validate against ^[a-zA-Z_][a-zA-Z0-9_]*$ before any
  *     interpolation (core.clj:35-38 — the injection guard);
  *   - Supabase usernames normalize `user.dbid` → `user`
  *     (rust/src/init.rs:123-140).
  */
object Grants {

  private val RoleNameRe = "^[a-zA-Z_][a-zA-Z0-9_]*$".r

  def validRoleName(name: String): Boolean =
    RoleNameRe.matches(name)

  /** `postgres.abcdefghij` (Supabase pooled user) → `postgres`. */
  def normalizeUsername(user: String): String = user.split('.') match {
    case Array(base, dbid) if dbid.matches("[a-z0-9]{10,}") => base
    case _ => user
  }

  /** The role ladder with connection limits
    * (rust/create_schemamap_users.sql:11-22). */
  def createRolesSql: Seq[String] = Seq(
    "schemamap_schema_read", "schemamap_readonly", "schemamap_readwrite")
    .map(r => s"""create role ${quoteIdent(r)} nologin connection limit 5""") :+
    "create role schemamap login connection limit 5 in role " +
      "schemamap_schema_read, schemamap_readonly, schemamap_readwrite"

  /** Per-schema usage grants for an application role. Role names are
    * validated; schema names go through quote_ident. */
  def grantUsageSql(role: String, schemas: Seq[String]): Seq[String] = {
    val r = normalizeUsername(role)
    require(validRoleName(r), s"invalid role name: $role")
    schemas.flatMap { s =>
      Seq(
        s"grant usage on schema ${quoteIdent(s)} to ${quoteIdent(r)}",
        s"grant select on all tables in schema ${quoteIdent(s)} to ${quoteIdent(r)}",
        s"alter default privileges in schema ${quoteIdent(s)} " +
          s"grant select on tables to ${quoteIdent(r)}")
    }
  }

  /** Staging-table read-write grants for the import flow (the dm_*
    * pattern, rust/grant_schemamap_usage.sql:59-66). */
  def grantStagingSql(role: String, schema: String): Seq[String] = {
    val r = normalizeUsername(role)
    require(validRoleName(r), s"invalid role name: $role")
    Seq(
      s"grant create on schema ${quoteIdent(schema)} to ${quoteIdent(r)}",
      s"grant select, insert, update, delete on all tables in schema " +
        s"${quoteIdent(schema)} to ${quoteIdent(r)}")
  }
}
