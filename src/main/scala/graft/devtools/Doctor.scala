package graft.devtools

import graft.catalog.CatalogSnapshot
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** `schemamap doctor`'s role-hierarchy walk and privilege rollup,
  * re-expressing /root/reference/rust/src/doctor.rs:57-126.
  *
  * The reference issues one recursive-CTE query; we split it into
  * (1) a membership closure and (2) a two-level grant aggregation.
  *
  * Fidelity note on the closure: the reference's `WITH RECURSIVE
  * role_hierarchy` (doctor.rs:59-83) has a recursive term that never
  * references role_hierarchy itself — as written it expands exactly one
  * membership hop, so a grant reaching schemamap_readonly only via
  * schemamap_readonly → intermediate → granted_role would be invisible
  * to it. Postgres, however, DOES inherit privileges transitively, and
  * the doctor's purpose is to report effective privileges — so the
  * default computes the true transitive closure with an iterative
  * DataFrame fixpoint (the Spark re-expression of a working recursive
  * CTE) and treats the reference's single-hop expansion as a bug, not a
  * spec. With chains of depth ≤1 the two are identical, which is every
  * configuration the reference's own installer creates
  * (rust/create_schemamap_users.sql:11-22 — a flat 4-role ladder).
  * For byte-faithful parity against the reference on DEEP hierarchies,
  * `singleHopQuirk = true` reproduces its one-hop expansion verbatim —
  * the same selectable-quirk pattern as the concepts'
  * `indexedSpaceQuirk` (P9).
  *
  * Scale: role graphs are catalog-sized (≤10^4 edges even on busy
  * clusters), so each iteration is a broadcast join; rounds are bounded
  * by the hierarchy depth, not the row count.
  */
object Doctor {

  /** The roles `schemamap init` creates (doctor.rs:49-55). */
  val MustHaveRoles: Seq[String] = Seq(
    "schemamap_schema_read", "schemamap_readonly", "schemamap_readwrite",
    "schemamap")

  /** (role_name, member_of) pairs: every role the prefix-matched role is
    * a member of, transitively, plus itself (the CTE's base case).
    *
    * @param singleHopQuirk true reproduces the reference CTE's
    *   one-membership-hop expansion (object scaladoc) for golden parity;
    *   false (default) computes the true transitive closure. */
  def roleHierarchy(snap: CatalogSnapshot, prefix: String = "schemamap",
      singleHopQuirk: Boolean = false): DataFrame = {
    val base = snap.roles.filter(col("role_name").startsWith(prefix))
      .select(col("role_name"), col("role_name").as("member_of"))
    val edges = snap.roleMembers // member -> role containing it
    if (singleHopQuirk) {
      // the reference's expansion verbatim: base ∪ (base ⋈ edges), no
      // recursion — exactly what its self-referencing-in-name-only
      // recursive term produces
      val oneHop = base
        .join(edges, base("member_of") === edges("member"))
        .select(base("role_name"), edges("role"))
        .toDF("role_name", "member_of")
      return base.unionByName(oneHop).distinct()
    }
    // grow-and-distinct fixpoint: closure ∪ (closure ⋈ edges) until the
    // row count stops growing. localCheckpoint each round truncates the
    // self-referential lineage (same discipline as operators/Clusters);
    // convergence is bounded by hierarchy depth, and cycles are safe
    // because distinct() makes the closure a set.
    var closure = base.localCheckpoint(eager = true)
    var iter = 0
    var prev = -1L
    var n = closure.count()
    while (iter < 64 && n != prev) {
      val expanded = closure
        .join(edges, closure("member_of") === edges("member"))
        .select(closure("role_name"), edges("role"))
        .toDF("role_name", "member_of")
      closure = closure.unionByName(expanded).distinct()
        .localCheckpoint(eager = true)
      prev = n
      n = closure.count()
      iter += 1
    }
    if (n != prev)
      throw new IllegalStateException(
        "role hierarchy did not converge in 64 rounds")
    closure
  }

  /** Per-role nested privilege rollup (doctor.rs:84-126):
    *   role_name -> map(table_schema -> map(privilege_type, table_count))
    * Grants attach through ANY role in the member_of closure; counts are
    * per-table non-distinct like the reference's COUNT(g.table_name);
    * the engine's own namespace is excluded; roles with no grants keep a
    * NULL privileges map (the jsonb_object_agg FILTER semantics). */
  def rolePrivileges(snap: CatalogSnapshot, prefix: String = "schemamap",
      singleHopQuirk: Boolean = false): DataFrame = {
    val hierarchy = roleHierarchy(snap, prefix, singleHopQuirk)
    val grants = snap.grants.filter(col("table_schema") =!= "schemamap")
    val counted = hierarchy.alias("h")
      .join(grants.alias("g"), col("h.member_of") === col("g.grantee"), "left")
      .groupBy(col("h.role_name"), col("g.table_schema"), col("g.privilege_type"))
      .agg(count(col("g.table_name")).as("table_count"))
    val perSchema = counted
      .groupBy(col("role_name"), col("table_schema"))
      .agg(collect_list(when(col("privilege_type").isNotNull,
        struct(col("privilege_type"), col("table_count")))).as("entries"))
      .select(col("role_name"), col("table_schema"),
        when(size(col("entries")) > 0,
          map_from_entries(array_sort(col("entries"))))
          .as("privileges_per_schema"))
    perSchema
      .groupBy(col("role_name"))
      .agg(collect_list(when(
        col("table_schema").isNotNull && col("privileges_per_schema").isNotNull,
        struct(col("table_schema"), col("privileges_per_schema"))))
        .as("entries"))
      .select(col("role_name"),
        // no array_sort here: structs containing MapType are unorderable;
        // map key order carries no meaning
        when(size(col("entries")) > 0,
          map_from_entries(col("entries"))).as("privileges"))
      .orderBy(col("role_name"))
  }

  /** Roles `init` should have created but the catalog lacks
    * (doctor.rs:140-160's seen-roles check). */
  def missingRoles(snap: CatalogSnapshot): Seq[String] = {
    val present = snap.roles.filter(col("role_name").startsWith("schemamap"))
      .collect().map(_.getString(0)).toSet
    MustHaveRoles.filterNot(present)
  }
}
