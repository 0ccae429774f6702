package graft

import java.nio.file.{Files, Path}
import scala.jdk.CollectionConverters._

/** Durable engine state — the dynamic layer the host application adds at
  * runtime (SQL-defined concepts, redefined fragments, MDEs, i18n),
  * persisted to the metastore dir so CLI invocations and restarts see
  * the same installed surface the reference keeps in its schemamap
  * schema. Stored as one flat key\tvalue file per kind (values are
  * SQL/JSON text, newline-escaped).
  *
  * Only SQL-defined state round-trips: concepts registered with raw
  * `Column` predicates (library embedding) are API-session state by
  * design — the reference has the same split (SQL concepts persist in
  * pg_proc; app-side query builders do not).
  */
object EngineState {

  private def esc(s: String) = s.replace("\\", "\\\\").replace("\n", "\\n")
    .replace("\t", "\\t")
  private def unesc(s: String): String = {
    val b = new StringBuilder
    var i = 0
    while (i < s.length) {
      if (s(i) == '\\' && i + 1 < s.length) {
        s(i + 1) match {
          case 'n' => b += '\n'
          case 't' => b += '\t'
          case c => b += c
        }
        i += 2
      } else { b += s(i); i += 1 }
    }
    b.result()
  }

  private def writeKv(file: Path, kvs: Seq[(String, String)]): Unit =
    Files.writeString(file,
      kvs.map { case (k, v) => s"${esc(k)}\t${esc(v)}" }.mkString("\n"))

  private def readKv(file: Path): Seq[(String, String)] =
    if (!Files.exists(file)) Seq.empty
    else Files.readAllLines(file).asScala.toSeq.filter(_.nonEmpty).map { l =>
      val Array(k, v) = l.split("\t", 2)
      (unesc(k), unesc(v))
    }

  def save(engine: Engine, dir: Path): Unit = {
    Files.createDirectories(dir)
    writeKv(dir.resolve("concepts.tsv"), engine.concepts.sqlDefs.toSeq.sorted)
    writeKv(dir.resolve("fragments.tsv"),
      engine.fragments.list.flatMap(n =>
        engine.fragments.definition(n).map(n -> _)))
    writeKv(dir.resolve("mdes.tsv"), engine.mdeSqlDefs)
    Files.writeString(dir.resolve("i18n.json"), engine.i18n)
  }

  def load(engine: Engine, dir: Path): Engine = {
    readKv(dir.resolve("concepts.tsv")).foreach { case (n, sql) =>
      engine.defineConcept(n, sql)
    }
    readKv(dir.resolve("fragments.tsv")).foreach { case (n, sql) =>
      // only apply fragments that exist and changed; unknown names are
      // MDE fragments handled below
      if (engine.fragments.definition(n).exists(_ != sql))
        engine.fragments.update(n, sql)
    }
    readKv(dir.resolve("mdes.tsv")).foreach { case (n, sql) =>
      engine.defineMasterDataEntity(n, sql)
    }
    val i18nFile = dir.resolve("i18n.json")
    if (Files.exists(i18nFile)) engine.updateI18n(Files.readString(i18nFile))
    engine
  }
}
