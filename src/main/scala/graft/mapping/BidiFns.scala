package graft.mapping

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Bidirectional value-mapping registry used by the import flow — the
  * reference's bidi_mapping_fns table + seed functions
  * (/root/reference/sql/V000001__init.sql:83-134). Forward/backward are
  * plain Column transforms over built-ins — no UDFs (SURVEY.md §2.10).
  *
  * `exact` marks mappings whose backward∘forward is the identity
  * (trim is lossy → exact = false).
  */
final case class BidiFn(
    name: String,
    i18nName: Map[String, String],
    forward: Column => Column,
    backward: Column => Column,
    inputType: String,
    exact: Boolean)

final class BidiRegistry private (private val defs: Map[String, BidiFn]) {
  def apply(name: String): BidiFn = defs(name)
  def get(name: String): Option[BidiFn] = defs.get(name)
  def names: Seq[String] = defs.keys.toSeq.sorted
  /** insert … on conflict do update (sql/V000001__init.sql:129-134). */
  def upsert(fn: BidiFn): BidiRegistry = new BidiRegistry(defs.updated(fn.name, fn))
}

object BidiRegistry {
  /** The three seed mappings (sql/V000001__init.sql:123-128). */
  def withDefaults: BidiRegistry = new BidiRegistry(Map(
    "trim_str" -> BidiFn("trim_str", Map("en" -> "Trim"),
      c => trim(c), identity, "text", exact = false),
    "identity" -> BidiFn("identity", Map("en" -> "Identity"),
      identity, identity, "anyelement", exact = true),
    "split_comma_array" -> BidiFn("split_comma_array",
      Map("en" -> "Split Commas To Array"),
      c => split(c, ","), c => array_join(c, ","), "text", exact = true)))
}
