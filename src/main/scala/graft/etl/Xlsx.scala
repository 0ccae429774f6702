package graft.etl

import java.io.ByteArrayInputStream
import java.util.zip.ZipInputStream
import javax.xml.parsers.DocumentBuilderFactory
import org.w3c.dom.{Document => XmlDoc, Element}

/** Dependency-free XLSX (SpreadsheetML) reader backing
  * [[Import.stageXlsx]] — the reference product's headline staging
  * source (sources enum `sql/V000002__data_migrations.sql:21-28`,
  * `rust/src/common.rs:11-13`; its own load logic is closed-source
  * cloud, so this is our realization, not a port).
  *
  * An .xlsx file is a zip of XML parts. This reads exactly the parts a
  * staging import needs: `xl/workbook.xml` (sheet directory),
  * `xl/_rels/workbook.xml.rels` (sheet-name → worksheet part),
  * `xl/sharedStrings.xml`, and one worksheet. Cell coverage: shared
  * strings (plain and rich-text runs), inline strings, cached formula
  * string results (`t="str"`), booleans, numbers, sparse/out-of-order
  * cell references, missing-`r` cells. Deliberately NOT covered —
  * behavior documented rather than guessed: number/date FORMATTING
  * (xlsx stores dates as numeric serials; they surface as their raw
  * number text, and typing them is the mapping stage's job, same as
  * CSV), 1904-epoch workbooks, and encrypted workbooks.
  *
  * Everything surfaces as nullable strings: staging is schema-on-read,
  * and the import flow's bidi-mapping stage owns typing — identical to
  * [[Import.stageCsv]] with inference off.
  *
  * The parser is a pure `bytes → Sheet` function (no filesystem, no
  * SparkSession), so it runs EITHER driver-side or inside executor
  * tasks — `stageXlsx` fans it out over `binaryFiles`, one task per
  * workbook (a zip is not splittable; the format's 1,048,576-row sheet
  * cap bounds per-task memory by construction).
  */
object Xlsx extends Serializable {

  /** One parsed worksheet: `header` from the first row (empty header
    * cells become `_c<i>`, duplicate names get a positional suffix),
    * `rows` as the remaining rows padded to header width. */
  final case class Sheet(header: Vector[String], rows: Vector[Vector[String]])

  /** Per-entry and whole-workbook decompressed-size caps. The row cap
    * bounds CELLS, not bytes: a crafted workbook (zip bomb) can expand
    * a small file to arbitrary XML, so the reader refuses past these
    * limits rather than buffering unbounded bytes in an executor. 256
    * MiB/part × 1 GiB/workbook is far above any real 1,048,576-row
    * sheet and far below task-memory harm. */
  val MaxPartBytes: Int = 256 << 20
  val MaxTotalBytes: Long = 1L << 30

  /** Parse one workbook. `sheetName` picks a sheet by workbook name;
    * None takes the workbook's first sheet. */
  def parse(bytes: Array[Byte], sheetName: Option[String] = None): Sheet = {
    val parts = readParts(bytes)
    val shared = parts.get("xl/sharedStrings.xml")
      .map(sharedStrings).getOrElse(Vector.empty)
    val sheetXml = locateSheet(parts, sheetName).getOrElse(
      throw new IllegalArgumentException(
        sheetName.fold("workbook has no worksheets")(n =>
          s"workbook has no sheet named '$n'")))
    worksheet(sheetXml, shared)
  }

  // ---- zip + xml plumbing ---------------------------------------------------

  /** One pass over the zip stream, keeping only the parts we read.
    * (ZipInputStream over the in-memory bytes — not ZipFile — so the
    * same code path serves executor tasks fed by binaryFiles.) */
  private def readParts(bytes: Array[Byte]): Map[String, Array[Byte]] = {
    val wanted = Set("xl/workbook.xml", "xl/_rels/workbook.xml.rels",
      "xl/sharedStrings.xml")
    val out = Map.newBuilder[String, Array[Byte]]
    val zin = new ZipInputStream(new ByteArrayInputStream(bytes))
    var total = 0L
    try {
      var e = zin.getNextEntry
      while (e != null) {
        val name = e.getName.stripPrefix("/")
        if (wanted(name) || name.startsWith("xl/worksheets/")) {
          // readNBytes stops at the cap; one byte past it proves the
          // entry lies about (or simply exceeds) a sane decompressed
          // size — refuse, don't buffer
          val part = zin.readNBytes(MaxPartBytes + 1)
          if (part.length > MaxPartBytes) throw new IllegalArgumentException(
            s"xlsx part '$name' exceeds $MaxPartBytes decompressed bytes " +
              "(zip-bomb guard)")
          total += part.length
          if (total > MaxTotalBytes) throw new IllegalArgumentException(
            s"xlsx workbook exceeds $MaxTotalBytes total decompressed bytes " +
              "(zip-bomb guard)")
          out += name -> part
        }
        e = zin.getNextEntry
      }
    } finally zin.close()
    out.result()
  }

  /** Secure DOM parse: doctype declarations refused outright (an .xlsx
    * from an untrusted sender must not be an XXE vector), entity
    * expansion off. Namespace-UNaware, matching on local names, so
    * producers that prefix SpreadsheetML elements still parse. */
  private def dom(bytes: Array[Byte]): XmlDoc = {
    val f = DocumentBuilderFactory.newInstance()
    f.setNamespaceAware(false)
    f.setFeature("http://apache.org/xml/features/disallow-doctype-decl", true)
    f.setExpandEntityReferences(false)
    f.newDocumentBuilder().parse(new ByteArrayInputStream(bytes))
  }

  private def localName(e: Element): String = {
    val n = e.getTagName
    n.substring(n.indexOf(':') + 1)
  }

  /** Direct + nested descendants of `root` whose local tag name is
    * `local`, in document order. */
  private def descendants(root: Element, local: String): Vector[Element] = {
    val nl = root.getElementsByTagName("*")
    (0 until nl.getLength).iterator.map(nl.item(_).asInstanceOf[Element])
      .filter(localName(_) == local).toVector
  }

  private def textOf(e: Element): String = Option(e.getTextContent).getOrElse("")

  /** Concatenated visible cell text under `root`: every descendant `t`
    * EXCEPT those inside a phonetic-guide run (`rPh`) — Excel stores
    * East Asian furigana alongside the text, and naive descendant
    * flattening silently duplicates a value with its phonetic reading.
    * (`phoneticPr` is attributes-only per ECMA-376 and can never hold
    * a `t`, so `rPh` is the only subtree to exclude.) */
  private def visibleText(root: Element): String = {
    def inPhoneticRun(t: Element): Boolean = {
      var p = t.getParentNode
      while (p != null && (p ne root)) {
        p match {
          case e: Element if localName(e) == "rPh" => return true
          case _ =>
        }
        p = p.getParentNode
      }
      false
    }
    descendants(root, "t").filterNot(inPhoneticRun).map(textOf).mkString
  }

  // ---- workbook parts -------------------------------------------------------

  /** sharedStrings.xml: one entry per `si`, rich-text runs flattened by
    * concatenating the visible `t` descendants (Excel splits a styled
    * cell into `r` runs each holding a `t`; phonetic runs excluded —
    * see [[visibleText]]). */
  private def sharedStrings(bytes: Array[Byte]): Vector[String] =
    descendants(dom(bytes).getDocumentElement, "si").map(visibleText)

  /** Resolve the requested sheet to its worksheet-part XML via
    * workbook.xml (name + r:id, in tab order) joined to the workbook
    * rels (r:id → target). Workbooks written by minimal producers may
    * lack rels; fall back to the lexicographically first
    * `xl/worksheets/` entry when the directory can't be resolved. */
  private def locateSheet(parts: Map[String, Array[Byte]],
      sheetName: Option[String]): Option[Array[Byte]] = {
    val viaDirectory = for {
      wb <- parts.get("xl/workbook.xml")
      rels <- parts.get("xl/_rels/workbook.xml.rels")
      sheets = descendants(dom(wb).getDocumentElement, "sheet")
      chosen <- sheetName.fold(sheets.headOption)(n =>
        sheets.find(_.getAttribute("name") == n))
      // the relationship id lives in the `r` namespace, but this parse
      // is namespace-unaware. Prefer the exact node names every
      // mainstream producer writes ("r:id"; bare "id" for a default-
      // namespace producer) and only then fall back to a local-name
      // scan for odd prefixes (ns0:id) — exact-first stops an
      // unrelated attribute whose local name happens to be "id"
      // (xmlns:id, foo:id) from winning on attribute-map order and
      // mis-resolving the sheet. The fallback skips xmlns declarations
      // for the same reason.
      rid <- {
        val attrs = chosen.getAttributes
        val exact: Option[org.w3c.dom.Node] =
          Option(chosen.getAttributeNode("r:id"))
            .orElse(Option(chosen.getAttributeNode("id")))
        exact.orElse {
          (0 until attrs.getLength).iterator.map(attrs.item)
            .find { a =>
              val n = a.getNodeName
              n.substring(n.indexOf(':') + 1) == "id" &&
                !n.startsWith("xmlns")
            }
        }.map(_.getNodeValue).filter(_.nonEmpty)
      }
      rel <- descendants(dom(rels).getDocumentElement, "Relationship")
        .find(_.getAttribute("Id") == rid)
      target = rel.getAttribute("Target").stripPrefix("/") match {
        case t if t.startsWith("xl/") => t
        case t => s"xl/${t.stripPrefix("./")}"
      }
      part <- parts.get(target)
    } yield part
    viaDirectory.orElse {
      // no directory (or no rels): only honor "first sheet" requests.
      // Only parts DIRECTLY under xl/worksheets/ ending in .xml count —
      // xl/worksheets/_rels/sheet1.xml.rels is relationship XML, not a
      // sheet, and must never win the fallback. Order NUMERICALLY on
      // the digits in the part name (lexicographic order picks
      // sheet10.xml over sheet2.xml in ≥10-sheet workbooks); a
      // digitless name (a lone sheet.xml) sorts first, not last.
      if (sheetName.isDefined) None
      else parts.view.filterKeys { k =>
        k.startsWith("xl/worksheets/") && k.endsWith(".xml") &&
          !k.stripPrefix("xl/worksheets/").contains('/')
      }
        .toSeq
        .sortBy { case (name, _) =>
          val digits = name.filter(_.isDigit)
          (if (digits.isEmpty) 0L else digits.take(18).toLong, name)
        }
        .headOption.map(_._2)
    }
  }

  /** `"B3"` → 1. Column letters are bijective base-26. */
  private[graft] def colIndex(ref: String): Int = {
    var i = 0; var acc = 0
    while (i < ref.length && ref.charAt(i).isLetter) {
      acc = acc * 26 + (ref.charAt(i).toUpper - 'A' + 1); i += 1
    }
    acc - 1
  }

  private def worksheet(bytes: Array[Byte],
      shared: Vector[String]): Sheet = {
    val rows: Vector[Array[(Int, String)]] =
      descendants(dom(bytes).getDocumentElement, "row").map { row =>
        var nextCol = 0
        descendants(row, "c").map { c =>
          val col = c.getAttribute("r") match {
            case "" => nextCol
            case ref => colIndex(ref)
          }
          nextCol = col + 1
          col -> cellValue(c, shared)
        }.collect { case (col, v) if v != null => (col, v) }.toArray
      }
    val width = rows.iterator.flatMap(_.iterator.map(_._1 + 1))
      .foldLeft(0)(math.max)
    def densify(cells: Array[(Int, String)]): Vector[String] = {
      val a = Array.fill[String](width)(null)
      cells.foreach { case (i, v) => if (i < width) a(i) = v }
      a.toVector
    }
    rows match {
      case head +: data =>
        val seen = scala.collection.mutable.Set[String]()
        val header = densify(head).zipWithIndex.map { case (h, i) =>
          val base = Option(h).map(_.trim).filter(_.nonEmpty).getOrElse(s"_c$i")
          val name = if (seen(base)) s"${base}_$i" else base
          seen += name
          name
        }
        Sheet(header, data.map(densify))
      case _ => Sheet(Vector.empty, Vector.empty)
    }
  }

  /** Cell → string value, or null for a valueless cell. `t` dispatch
    * per ECMA-376: s=shared-string index, inlineStr=nested `is`/`t`,
    * b=boolean, str=cached formula string, n/absent/e=raw `v` text. */
  private def cellValue(c: Element, shared: Vector[String]): String = {
    def v: Option[String] = descendants(c, "v").headOption.map(textOf)
    c.getAttribute("t") match {
      case "inlineStr" => descendants(c, "is").headOption
        .map(visibleText).orNull
      case "s" => v.map(i => shared(i.trim.toInt)).orNull
      case "b" => v.map(b => if (b.trim == "1") "true" else "false").orNull
      case _ => v.orNull
    }
  }
}
