package graft.registry

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

import scala.jdk.CollectionConverters._

/** Locale-keyed view over the engine's single-row i18n store.
  *
  * The reference stores one JSONB document
  * (/root/reference/sql/V000001__init.sql:255-274, written through
  * update_i18n and read back verbatim by i18n()); its SHAPE is the SDK
  * convention exercised by fixtures/adventureworks_i18n.json and loaded
  * by clojure/src/io/schemamap/core.clj:18-33:
  *
  * {{{
  *   { "<locale>": {
  *       "models":     { "<model>": "display name" },
  *       "attributes": { "<model>": {
  *           "<attr>": "display name"          // plain attribute
  *         | "<attr>": {"S": "Standard", ...}  // enum value labels
  *       } } } }
  * }}}
  *
  * The raw document stays the storage format (update_i18n/i18n parity);
  * this class adds the locale→model→attribute resolution the host app
  * performs on top. Jackson is Spark's own JSON machinery — no new
  * dependency.
  */
final class I18n(json: String) {
  private val root: JsonNode = new ObjectMapper().readTree(json)

  private def path(parts: String*): Option[JsonNode] =
    parts.foldLeft(Option(root)) { (n, p) => n.flatMap(x => Option(x.get(p))) }

  def locales: Seq[String] =
    if (root != null && root.isObject) root.fieldNames().asScala.toSeq else Seq.empty

  /** Localized display name of a model (table). */
  def model(locale: String, model: String): Option[String] =
    path(locale, "models", model).filter(_.isTextual).map(_.asText)

  /** Localized display name of a plain attribute (column). */
  def attribute(locale: String, model: String, attr: String): Option[String] =
    path(locale, "attributes", model, attr).filter(_.isTextual).map(_.asText)

  /** Enum-valued attribute: map of stored value → localized label
    * (e.g. productline S/T/M/R in the AdventureWorks fixture). */
  def enumLabels(locale: String, model: String, attr: String): Map[String, String] =
    path(locale, "attributes", model, attr).filter(_.isObject)
      .map(n => n.properties().asScala.map(e => e.getKey -> e.getValue.asText).toMap)
      .getOrElse(Map.empty)

  /** All models that have any localization under a locale. */
  def models(locale: String): Seq[String] =
    path(locale, "models").filter(_.isObject)
      .map(_.fieldNames().asScala.toSeq).getOrElse(Seq.empty)
}
