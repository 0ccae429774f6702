package graft

import graft.catalog.CatalogSnapshot
import graft.concepts.ConceptRegistry
import org.apache.spark.sql.{Row, SparkSession}

import scala.collection.mutable

/** AdventureWorks-shaped golden CatalogSnapshot (FIXTURES.md §2).
  *
  * The reference's correctness authority is an integration test against
  * the AdventureWorks sample database
  * (/root/reference/clojure/test/io/schemamap/core_test.clj:19-254); the
  * dump blob is absent from the snapshot (.MISSING_LARGE_BLOBS:1), so
  * this generator rebuilds a catalog with the SAME golden-constrained
  * shape: 10 schemas / 157 relations / 1236 columns with the reference's
  * per-schema distribution (core_test.clj:213-226), its status concept
  * counts (:178-208), the MDE-scoring inputs that reproduce the top-10
  * rounded probabilities (:77-132), the production.document.rowguid SMO
  * row (:133-162), and the pr.document→production.document dependency
  * edge that drives the what-if cascade golden (:236-248).
  *
  * Independence: every concept count is re-derived here with PLAIN-SCALA
  * string/set predicates (no Catalyst), and build() refuses to produce a
  * snapshot unless those independent counts hit the goldens — so
  * AwGoldenSpec's engine-vs-golden comparison is a genuine two-sided
  * check (Catalyst expression semantics vs plain string semantics), not
  * the engine grading its own homework.
  */
object AwFixture {

  // ---- golden targets (core_test.clj) -------------------------------------
  /** Per-schema column counts, core_test.clj:213-226. */
  val PerSchemaColumns: Map[String, Long] = Map(
    "sales" -> 233L, "production" -> 208L, "pr" -> 188L, "sa" -> 150L,
    "humanresources" -> 118L, "person" -> 94L, "pe" -> 82L,
    "purchasing" -> 67L, "pu" -> 51L, "hr" -> 45L)

  /** Status golden, core_test.clj:178-208. */
  val Golden: Map[String, Long] = Map(
    "schema_count" -> 10, "table_count" -> 157, "column_count" -> 1236,
    "pii_count" -> 108, "metadata_count" -> 0,
    "schema_migration_table_count" -> 0, "ignored_table_count" -> 0,
    "primary_key_count" -> 99, "foreign_key_count" -> 91,
    "unique_key_count" -> 5, "check_constrained_count" -> 101,
    "exclusion_constrained_count" -> 0, "indexed_count" -> 99,
    "generated_count" -> 0, "natural_key_count" -> 61,
    "surrogate_key_count" -> 38, "self_reference_count" -> 0,
    "external_reference_count" -> 296)

  /** MDE top-10 golden, core_test.clj:77-132:
    * (schema, table, approx_rows, inbound fk count, round(prob, 2)). */
  val GoldenMde: Seq[(String, String, Long, Long, String)] = Seq(
    ("production", "product", 504L, 14L, "1.00"),
    ("humanresources", "employee", 290L, 6L, "0.71"),
    ("sales", "salesterritory", 10L, 5L, "0.68"),
    ("person", "person", 19972L, 7L, "0.67"),
    ("sales", "salesperson", 17L, 4L, "0.64"),
    ("production", "unitmeasure", 38L, 4L, "0.64"),
    ("sales", "currency", 105L, 3L, "0.61"),
    ("production", "productmodel", 128L, 3L, "0.61"),
    ("person", "countryregion", 238L, 3L, "0.61"),
    ("person", "businessentity", 20777L, 5L, "0.59"))

  // ---- name pools ----------------------------------------------------------
  // PII names: verbatim alternatives of the reference's anchored matcher
  // (sql/V000010__schema_concepts.sql:51-55) chosen to NOT also match the
  // external-reference LIKE patterns (no *id suffix, no url/uri/ref/code/
  // uuid/guid/external_ substrings) so the two quotas stay independent.
  private val piiPool = Vector(
    "email", "first_name", "last_name", "full_name", "middle_name", "phone",
    "telephone", "mobile", "address", "street", "city", "state", "zip",
    "postal", "ssn", "dob", "birthdate", "passport", "iban", "bic", "swift",
    "medicare", "date_of_birth", "login", "password", "secret", "auth",
    "credit_card", "card_number", "routing_number", "bank_account",
    "account_number", "policy_number", "insurance_number", "username", "token")

  private sealed trait PkKind
  private case object Surr extends PkKind // single serial pk → surrogate key
  private case object Nat2 extends PkKind // 2-col natural pk
  private case object Nat3 extends PkKind // 3-col natural pk

  private final case class ColSpec(
      name: String, dataType: String = "text", notNull: Boolean = false,
      default: Option[String] = None, descr: Option[String] = None)

  // ---- independent plain-Scala concept predicates --------------------------
  private val piiRe = java.util.regex.Pattern.compile(ConceptRegistry.PiiRegex)
  private def isPiiName(n: String): Boolean = piiRe.matcher(n.toLowerCase).find()
  /** PG LIKE semantics for the external-reference patterns
    * (sql/V000012__more_concepts.sql:123-135), '_' = any one char. */
  private def isExtRefName(nRaw: String): Boolean = {
    val n = nRaw.toLowerCase
    (n.length >= 3 && n.endsWith("id")) || n.contains("url") ||
    n.contains("uri") || n.indexOf("ref") >= 1 || n.indexOf("code") >= 1 ||
    n.contains("uuid") || n.contains("guid") || n.contains("external_")
  }

  /** Build the snapshot (deterministic; no RNG). */
  def build(spark: SparkSession): CatalogSnapshot = {
    // ---- relation inventory ----------------------------------------------
    // filler approx_rows: deterministic, well inside (0, 121317), with
    // production.proditem1 pinned to 0 so min_rows = 0 as the MDE golden
    // probabilities require (max_rows = salesorderdetail's 121317).
    def rows(seed: Int): Long = 40L + 97L * seed
    val named: Map[String, Long] =
      GoldenMde.map(m => (m._2, m._3)).toMap + ("salesorderdetail" -> 121317L,
        "document" -> 13L, "proditem1" -> 0L)

    // (schema, ordered tables (name, pkKind)); surrogate/natural split
    // yields 38 surrogate pk columns and 61 natural ones (30 natural-pk
    // tables: 29×2 + 1×3), matching core_test.clj:196-197.
    val baseTables: Seq[(String, Seq[(String, PkKind)])] = Seq(
      "sales" -> (Seq("salesterritory", "salesperson", "currency",
        "salesorderdetail").map((_, Surr: PkKind)) ++
        (1 to 7).map(i => (s"salesitem$i", Surr: PkKind)) ++
        (8 to 15).map(i => (s"salesitem$i", Nat2: PkKind))),
      "production" -> (Seq("product", "unitmeasure", "productmodel",
        "document").map((_, Surr: PkKind)) ++
        (1 to 13).map(i => (s"proditem$i", Surr: PkKind)) ++
        (14 to 21).map(i => (s"proditem$i", Nat2: PkKind))),
      "humanresources" -> (Seq(("employee", Surr: PkKind)) ++
        (1 to 3).map(i => (s"hritem$i", Surr: PkKind)) ++
        (4 to 5).map(i => (s"hritem$i", Nat2: PkKind))),
      "person" -> (Seq("person", "countryregion", "businessentity")
        .map((_, Surr: PkKind)) ++
        (1 to 3).map(i => (s"persitem$i", Surr: PkKind)) ++
        (4 to 10).map(i => (s"persitem$i", Nat2: PkKind))),
      "purchasing" -> (Seq(("purchitem1", Nat3: PkKind)) ++
        (2 to 5).map(i => (s"purchitem$i", Nat2: PkKind))))

    val viewSchemas: Seq[(String, Int)] = // (abbreviation schema, #views)
      Seq("sa" -> 22, "pr" -> 24, "hr" -> 13, "pe" -> 19, "pu" -> 11)

    val cols = mutable.LinkedHashMap[(String, String), mutable.ArrayBuffer[ColSpec]]()
    // pending constraints, resolved to attnums at emit time
    val pks = mutable.ArrayBuffer[(String, String, Seq[String], Option[String])]()
    val fks = mutable.ArrayBuffer[(String, String, String, String, String)]()
    val uniques = mutable.ArrayBuffer[(String, String, String, String)]() // s,t,col,cname
    val checks = mutable.ArrayBuffer[(String, String, String)]()

    def table(s: String, t: String): mutable.ArrayBuffer[ColSpec] =
      cols.getOrElseUpdate((s, t), mutable.ArrayBuffer.empty)

    // ---- the fixed production.document table (core_test.clj:133-162) ------
    // 13 columns so the cascade drop shrinks production by exactly 13
    // (208→195) and its pr.document mirror by 13 (188→175), rowguid at
    // attnum 11 with the golden type/default/descriptions/constraint/index.
    val documentCols = Vector(
      ColSpec("documentid", "integer", notNull = true,
        default = Some("nextval('production.document_documentid_seq'::regclass)")),
      ColSpec("title", notNull = true), ColSpec("owner", "integer", notNull = true),
      ColSpec("folderflag", "boolean", notNull = true), ColSpec("filename"),
      ColSpec("fileextension"), ColSpec("revision", notNull = true),
      ColSpec("changenumber", "integer", notNull = true), ColSpec("status"),
      ColSpec("documentsummary"),
      ColSpec("rowguid", "uuid", notNull = true,
        default = Some("uuid_generate_v1()"),
        descr = Some("ROWGUIDCOL number uniquely identifying the record. Required for FileStream.")),
      ColSpec("modifieddate", "timestamp with time zone", notNull = true),
      ColSpec("docnotes"))
    table("production", "document") ++= documentCols
    pks += (("production", "document", Seq("documentid"),
      Some("production.document_documentid_seq")))
    fks += (("production", "document", "owner", "humanresources", "employee"))
    uniques += (("production", "document", "rowguid", "document_rowguid_key"))

    // ---- pk columns for every other base table ----------------------------
    for ((schema, tables) <- baseTables; (t, kind) <- tables if t != "document") {
      kind match {
        case Surr =>
          val c = s"${t}id"
          table(schema, t) += ColSpec(c, "integer", notNull = true,
            default = Some(s"nextval('$schema.${t}_${c}_seq'::regclass)"))
          pks += ((schema, t, Seq(c), Some(s"$schema.${t}_${c}_seq")))
        case Nat2 =>
          table(schema, t) += ColSpec(s"${t}natid", "integer", notNull = true)
          table(schema, t) += ColSpec(s"${t}keyid", "integer", notNull = true)
          pks += ((schema, t, Seq(s"${t}natid", s"${t}keyid"), None))
        case Nat3 =>
          val cs = Seq(s"${t}natid", s"${t}keyid", s"${t}trdid")
          cs.foreach(c => table(schema, t) += ColSpec(c, "integer", notNull = true))
          pks += ((schema, t, cs, None))
      }
    }

    // ---- foreign keys ------------------------------------------------------
    // 91 single-column FKs (core_test.clj:195). Inbound counts per target
    // reproduce the MDE golden fk terms: the ten named tables receive
    // 14+6+5+7+4+4+3+3+3+5 = 54 (document.owner→employee above is one of
    // employee's 6); filler targets receive ≤2 each so nothing else can
    // out-score businessentity's 0.59 (fk≤2 caps a score at 0.571).
    val namedTargets: Seq[((String, String), Int)] = Seq(
      (("production", "product"), 14), (("humanresources", "employee"), 5),
      (("sales", "salesterritory"), 5), (("person", "person"), 7),
      (("sales", "salesperson"), 4), (("production", "unitmeasure"), 4),
      (("sales", "currency"), 3), (("production", "productmodel"), 3),
      (("person", "countryregion"), 3), (("person", "businessentity"), 5))
    val fillerTargets: Seq[((String, String), Int)] =
      ((1 to 5).map(i => (("sales", s"salesitem$i"), 2)) ++
        (1 to 5).map(i => (("production", s"proditem$i"), 2)) ++
        (1 to 2).map(i => (("humanresources", s"hritem$i"), 2)) ++
        (1 to 3).map(i => (("person", s"persitem$i"), 2)) ++
        (1 to 3).map(i => (("purchasing", s"purchitem$i"), 2))) :+
        ((("purchasing", "purchitem4"), 1))
    val targetList: Seq[(String, String)] =
      (namedTargets ++ fillerTargets).flatMap { case (t, n) => Seq.fill(n)(t) }
    require(targetList.size == 90, s"fk targets ${targetList.size}")

    // source slots per schema (sales 25, production 23 + document.owner,
    // humanresources 10, person 20, purchasing 12 ⇒ 91 total)
    val srcSlots = Seq("sales" -> 25, "production" -> 23,
      "humanresources" -> 10, "person" -> 20, "purchasing" -> 12)
    var fkSeq = 0
    var cursor = 0
    for ((schema, nSlots) <- srcSlots) {
      val hosts = baseTables.toMap.apply(schema).map(_._1).filterNot(_ == "document")
      for (j <- 0 until nSlots) {
        val target = targetList(cursor); cursor += 1
        var host = hosts(j % hosts.size)
        if ((schema, host) == target) host = hosts((j + 1) % hosts.size)
        val c = s"fk${target._2}${fkSeq}id"; fkSeq += 1
        table(schema, host) += ColSpec(c, "integer")
        fks += ((schema, host, c, target._1, target._2))
      }
    }

    // ---- unique / check / pii / extref / filler columns -------------------
    // per-schema quotas; document is fixed above and excluded everywhere.
    for ((schema, t, c) <- Seq(
        ("sales", "salesorderdetail", "serialnum"),
        ("production", "product", "tagvalue"),
        ("humanresources", "employee", "shelfmark"),
        ("person", "person", "slotname"))) {
      table(schema, t) += ColSpec(c)
      uniques += ((schema, t, c, s"${t}_${c}_key"))
    }

    var chkSeq, piiSeq, extSeq, fillSeq = 0
    def spread(schema: String, quota: Int)(add: (String, Int) => Unit): Unit = {
      val hosts = baseTables.toMap.apply(schema).map(_._1).filterNot(_ == "document")
      (0 until quota).foreach(i => add(hosts(i % hosts.size), i))
    }
    val chkQuota = Seq("sales" -> 30, "production" -> 25,
      "humanresources" -> 15, "person" -> 20, "purchasing" -> 11)
    for ((schema, q) <- chkQuota) spread(schema, q) { (t, _) =>
      val c = s"chkfield$chkSeq"; chkSeq += 1
      table(schema, t) += ColSpec(c, "integer")
      checks += ((schema, t, c))
    }
    val piiBaseQuota = Seq("sales" -> 18, "production" -> 12,
      "humanresources" -> 15, "person" -> 12, "purchasing" -> 3)
    for ((schema, q) <- piiBaseQuota) spread(schema, q) { (t, _) =>
      table(schema, t) += ColSpec(piiPool(piiSeq % piiPool.size)); piiSeq += 1
    }
    val extBaseQuota = Seq("sales" -> 30, "production" -> 30,
      "humanresources" -> 10, "person" -> 15, "purchasing" -> 25)
    for ((schema, q) <- extBaseQuota) spread(schema, q) { (t, _) =>
      table(schema, t) += ColSpec(s"ext${extSeq}id"); extSeq += 1
    }
    // pad base schemas to the golden per-schema totals
    for ((schema, tables) <- baseTables) {
      val hosts = tables.map(_._1).filterNot(_ == "document")
      var i = 0
      while (tables.map(t => table(schema, t._1).size).sum <
          PerSchemaColumns(schema)) {
        table(schema, hosts(i % hosts.size)) += ColSpec(s"fillcol$fillSeq")
        fillSeq += 1; i += 1
      }
    }

    // ---- abbreviation-schema views ----------------------------------------
    // pr.document mirrors the base table's 13 column names (it is the view
    // the what-if cascade drops); other views carry pii/extref/filler
    // names against per-schema quotas that land the global pii = 108 and
    // external_reference = 296 goldens.
    table("pr", "document") ++= documentCols.map(c => ColSpec(c.name))
    val viewQuotas: Map[String, (Int, Int)] = // schema -> (pii, extref)
      Map("sa" -> (12, 25), "pr" -> (10, 24), "hr" -> (8, 6),
        "pe" -> (14, 17), "pu" -> (4, 12))
    for ((schema, nViews) <- viewSchemas) {
      val names = (1 to (if (schema == "pr") nViews - 1 else nViews))
        .map(i => s"${schema}view$i")
      names.foreach(v => table(schema, v)) // materialize, keeps ≥0 order
      val (piiQ, extQ) = viewQuotas(schema)
      (0 until piiQ).foreach { i =>
        table(schema, names(i % names.size)) +=
          ColSpec(piiPool(piiSeq % piiPool.size)); piiSeq += 1
      }
      (0 until extQ).foreach { i =>
        table(schema, names(i % names.size)) += ColSpec(s"ext${extSeq}id")
        extSeq += 1
      }
      var i = 0
      while (table("pr", "document").size * (if (schema == "pr") 1 else 0) +
          names.map(v => table(schema, v).size).sum < PerSchemaColumns(schema)) {
        table(schema, names(i % names.size)) += ColSpec(s"fillcol$fillSeq")
        fillSeq += 1; i += 1
      }
    }

    // ---- independent golden verification (plain Scala, no Catalyst) -------
    val baseSet = baseTables.map(_._1).toSet
    val fkCols = fks.map(f => (f._1, f._2, f._3)).toSet
    val pkCols = pks.flatMap(p => p._3.map(c => (p._1, p._2, c))).toSet
    val allCols = cols.toSeq.flatMap { case ((s, t), cs) => cs.map(c => (s, t, c)) }
    require(allCols.size == 1236, s"total columns ${allCols.size}")
    for ((s, n) <- PerSchemaColumns) {
      val actual = cols.collect { case ((`s`, _), cs) => cs.size }.sum
      require(actual == n, s"schema $s columns $actual != $n")
    }
    require(cols.size == 157, s"relations ${cols.size}")
    val piiCount = allCols.count(c => isPiiName(c._3.name))
    require(piiCount == 108, s"pii $piiCount")
    val extCount = allCols.count { case (s, t, c) =>
      !fkCols((s, t, c.name)) && isExtRefName(c.name) }
    require(extCount == 296, s"external_reference $extCount")
    require(pkCols.size == 99, s"pk ${pkCols.size}")
    require(fkCols.size == 91, s"fk ${fkCols.size}")
    val naturalCount = pks.filter(_._4.isEmpty).map(_._3.size).sum
    require(naturalCount == 61, s"natural ${naturalCount}")
    require(pkCols.size - naturalCount == 38, "surrogate")
    require(uniques.size == 5, s"unique ${uniques.size}")
    require(checks.size == 101, s"check ${checks.size}")
    val metaCount = allCols.count(c =>
      Set("created_at", "updated_at", "version")(c._3.name))
    require(metaCount == 0, "metadata")

    // ---- emit --------------------------------------------------------------
    def attnum(s: String, t: String, c: String): Int =
      cols((s, t)).indexWhere(_.name == c) + 1

    val relations = cols.keys.toSeq.map { case (s, t) =>
      Row(s, t,
        if (baseSet(s)) "r" else "v",
        if ((s, t) == (("production", "document"))) "Product maintenance documents."
        else null,
        if (baseSet(s)) named.getOrElse(t,
          rows(math.abs((s + t).hashCode) % 1000 + 1)) else 0L)
    }
    val attributes = cols.toSeq.flatMap { case ((s, t), cs) =>
      cs.zipWithIndex.map { case (c, i) =>
        Row(s, t, c.name, i + 1, c.dataType, c.notNull,
          c.default.orNull, c.descr.orNull, false, null)
      }
    }
    val constraintRows =
      pks.toSeq.map { case (s, t, pcols, seq) =>
        Row(s, t, s"${t}_pkey", "p",
          s"PRIMARY KEY (${pcols.mkString(", ")})",
          pcols.map(attnum(s, t, _)), null, seq.orNull, null, null)
      } ++ fks.toSeq.map { case (s, t, c, rs, rt) =>
        Row(s, t, s"${t}_${c}_fkey", "f",
          s"FOREIGN KEY ($c) REFERENCES $rs.$rt(${rt}id)",
          Seq(attnum(s, t, c)), Seq(1), null, rs, rt)
      } ++ uniques.toSeq.map { case (s, t, c, cname) =>
        Row(s, t, cname, "u", s"UNIQUE ($c)",
          Seq(attnum(s, t, c)), null, null, null, null)
      } ++ checks.toSeq.map { case (s, t, c) =>
        Row(s, t, s"${t}_${c}_check", "c", s"CHECK (($c IS NOT NULL))",
          Seq(attnum(s, t, c)), null, null, null, null)
      }
    val indexRows = Seq(Row("production", "document", "document_rowguid_key",
      true, false, false, true, true,
      "CREATE UNIQUE INDEX document_rowguid_key ON production.document USING btree (rowguid)",
      Seq(attnum("production", "document", "rowguid"))))
    val privRows = PerSchemaColumns.keys.toSeq.sorted.map(Row(_, true))
    val depRows = Seq(Row("pr", "document", "production", "document"))

    CatalogSnapshot.fromRows(spark, relations, attributes, constraintRows,
      indexRows, privRows, depRows)
  }
}
