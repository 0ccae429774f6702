package graft.status

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The one-row status rollup over the concept-widened columns view —
  * re-expression of the reference's status view
  * (/root/reference/sql/V000012__more_concepts.sql:148-171).
  *
  * Plain counts, FILTERed counts (count(when(cond,1))), tuple-distinct
  * counts (countDistinct over a struct), and tuple-distinct FILTERed
  * counts (countDistinct over when(cond, struct)) all evaluate in a single
  * partial-aggregate pass — one shuffle of pre-aggregated partials, which
  * is the plan shape that survives a 100× wider SMO.
  */
object Status {

  private def countIf(cond: Column): Column = count(when(cond, 1))

  private def countDistinctTableIf(cond: Column): Column =
    count_distinct(when(cond, struct(col("schema_name"), col("table_name"))))

  /** @param columns the SMO widened by ConceptRegistry.applyAll — must
    *   contain every is_* referenced below.
    * @param tenants list_tenants() rows (tenant_id, tenant_short_name,
    *   tenant_display_name, tenant_locale, tenant_data)
    * @param mdes list_mdes() rows (mde_name)
    */
  def status(columns: DataFrame, tenants: DataFrame, mdes: DataFrame): DataFrame = {
    val counts = columns.agg(
      count_distinct(col("schema_name")).as("schema_count"),
      count_distinct(struct(col("schema_name"), col("table_name"))).as("table_count"),
      count(lit(1)).as("column_count"),
      countDistinctTableIf(col("is_schema_migration_table"))
        .as("schema_migration_table_count"),
      countDistinctTableIf(col("is_ignored_table")).as("ignored_table_count"),
      countIf(col("is_pii")).as("pii_count"),
      countIf(col("is_metadata")).as("metadata_count"),
      countIf(col("is_primary_key")).as("primary_key_count"),
      countIf(col("is_foreign_key")).as("foreign_key_count"),
      countIf(col("is_unique_key")).as("unique_key_count"),
      countIf(col("is_check_constrained")).as("check_constrained_count"),
      countIf(col("is_exclusion_constrained")).as("exclusion_constrained_count"),
      countIf(col("is_indexed")).as("indexed_count"),
      countIf(col("is_generated")).as("generated_count"),
      countIf(col("is_natural_key")).as("natural_key_count"),
      countIf(col("is_surrogate_key")).as("surrogate_key_count"),
      countIf(col("is_self_reference")).as("self_reference_count"),
      countIf(col("is_external_reference")).as("external_reference_count"))

    // the two scalar subqueries (jsonb_agg ... order by) become 1-row DFs
    // cross-joined in — registry data is tiny, both sides broadcast.
    // array_sort on the struct orders by its first field, matching the
    // reference's ORDER BY tenant_id / mde_name; empty → NULL like
    // jsonb_agg over an empty set.
    def packedJson(df: DataFrame, name: String): DataFrame = {
      val arr = array_sort(collect_list(struct(df.columns.map(col): _*)))
      df.agg(when(size(arr) > 0, to_json(arr)).as(name))
    }

    counts
      .crossJoin(broadcast(packedJson(tenants, "tenants")))
      .crossJoin(broadcast(packedJson(mdes, "master_data_entities")))
  }

  /** verify_installation() (sql/V000001__init.sql:388-393). */
  def verifyInstallation(tenants: DataFrame, mdes: DataFrame): DataFrame = {
    val t = tenants.filter(col("tenant_id").isNotNull).limit(1).count() > 0
    val m = mdes.filter(col("mde_name").isNotNull).limit(1).count() > 0
    tenants.sparkSession.range(1)
      .select(lit(t).as("tenants_defined"), lit(m).as("mdes_defined"))
  }
}
