package graft.cli

import graft.{Engine, Sessions}
import graft.catalog.{CatalogSnapshot, JdbcCatalogSource}
import graft.config.ConnConfig
import graft.devtools.Snapshots
import graft.util.PgFormat
import org.apache.spark.sql.SparkSession

import java.nio.file.{Files, Path}

/** CLI mirroring the reference driver's subcommands
  * (/root/reference/rust/src/common.rs:71-90, main.rs:53-62):
  * init | status | refresh | snapshot | restore | list | doctor.
  * `up` (rathole tunneling) is out of analytic scope (SURVEY.md §7.5) —
  * it prints connection instructions instead.
  *
  * Contract preserved from the reference: JSON on stdout (jq-able),
  * all logs on stderr (rust/src/main.rs:31-33).
  *
  * The working state lives in a metastore directory:
  *   <dir>/snapshot/    persisted CatalogSnapshot parquet
  *   <dir>/snapshots/   dev snapshots (Snapshots)
  * Source of the catalog: --jdbc-url (live DB via JdbcCatalogSource) or
  * an existing fixture snapshot dir.
  */
object Main {

  private def log(msg: String): Unit = System.err.println(s"[graft] $msg")

  def main(args: Array[String]): Unit = sys.exit(run(args, println))

  /** Testable entry: returns exit code, stdout lines go through `out`. */
  def run(args: Array[String], out: String => Unit): Int = {
    val (flags, positional) = args.partition(_.startsWith("-"))
    def flag(name: String): Option[String] =
      flags.collectFirst { case f if f.startsWith(s"--$name=") =>
        f.drop(name.length + 3) }
    def has(name: String) = flags.contains(s"--$name") || flags.contains(s"-$name")
    val dir = Path.of(flag("dir").getOrElse(".graft"))

    positional.headOption match {
      case Some("init") =>
        Files.createDirectories(dir.resolve("snapshot"))
        Files.createDirectories(dir.resolve("snapshots"))
        log(s"initialized metastore at $dir")
        flag("jdbc-url") match {
          case Some(url) => withSpark { spark => refreshFromJdbc(spark, dir, url) }
          case None => log("no --jdbc-url: load a fixture snapshot into " +
            s"${dir.resolve("snapshot")} or run refresh with --jdbc-url")
        }
        0

      case Some("refresh") =>
        withSpark { spark =>
          flag("jdbc-url") match {
            case Some(url) => refreshFromJdbc(spark, dir, url)
            case None =>
              // rebuild the SMO from the stored snapshot (matview refresh)
              val e = engine(spark, dir)
              e.refresh()
              log(s"SMO refreshed: ${e.smo.count()} columns")
          }
        }
        0

      case Some("status") =>
        withSpark { spark =>
          val e = engine(spark, dir)
          val df = if (has("a") || has("all")) e.columns else e.status
          df.toJSON.collect().foreach(j => out(PgFormat.jsonPretty(j)))
        }
        0

      case Some("snapshot") =>
        val name = positional.lift(1).getOrElse(s"snap_${System.currentTimeMillis()}")
        val info = new Snapshots(dir.resolve("snapshots"))
          .create(name, dir.resolve("snapshot"))
        log(s"snapshot ${info.name} created in ${info.elapsedMs} ms " +
          s"(${PgFormat.pgSizePretty(info.sizeBytes)})")
        0

      case Some("restore") =>
        positional.lift(1) match {
          case Some(name) =>
            new Snapshots(dir.resolve("snapshots")).restore(name, dir.resolve("snapshot"))
            log(s"restored $name"); 0
          case None => log("usage: restore <name>"); 2
        }

      case Some("list") =>
        val snaps = new Snapshots(dir.resolve("snapshots")).list
        val rows = snaps.map { s =>
          s"""{"name":"${s.name}","created_at_ms":${s.createdAtMs},""" +
            s""""elapsed_ms":${s.elapsedMs},"size":"${PgFormat.pgSizePretty(s.sizeBytes)}"}"""
        }
        out(PgFormat.jsonPretty(rows.mkString("[", ",", "]")))
        0

      case Some("doctor") => doctor(dir, flag("jdbc-url"), out)

      case Some("up") =>
        log("tunneling is not part of this engine; connect Spark directly " +
          "with --jdbc-url or spark.read.jdbc")
        0

      case _ =>
        out("usage: graft <init|status|refresh|snapshot|restore|list|doctor> " +
          "[--dir=PATH] [--jdbc-url=URL] [-a]")
        2
    }
  }

  private def withSpark[A](f: SparkSession => A): A = {
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt)
    f(spark)
  }

  private def refreshFromJdbc(spark: SparkSession, dir: Path, url: String): Unit = {
    val cfg = ConnConfig.fromUrl(url).getOrElse(ConnConfig.resolve())
    log(s"snapshotting catalog of ${cfg.database}@${cfg.host}")
    val snap = JdbcCatalogSource.snapshot(spark, cfg.jdbcUrl, cfg.jdbcProps)
    CatalogSnapshot.write(snap, dir.resolve("snapshot").toString)
    log("catalog snapshot written")
  }

  private def engine(spark: SparkSession, dir: Path): Engine = {
    val snapDir = dir.resolve("snapshot")
    require(Files.exists(snapDir.resolve("relations.parquet")),
      s"no catalog snapshot at $snapDir — run init/refresh with --jdbc-url " +
        "or place fixture parquet there")
    val e = new Engine(spark, CatalogSnapshot.fromDir(spark, snapDir.toString))
    // pick up host-app-installed state (SQL concepts, fragments, MDEs)
    val state = dir.resolve("state")
    if (Files.exists(state)) graft.EngineState.load(e, state) else e
  }

  /** doctor: the reference checks schema existence, role grants and MDE
    * definitions over a live DB (rust/src/doctor.rs:28-99); ours checks
    * the metastore + snapshot integrity + SMO buildability, and config
    * resolvability when a URL is given. */
  private def doctor(dir: Path, jdbcUrl: Option[String], out: String => Unit): Int = {
    val checks = Seq.newBuilder[(String, Boolean, String)]
    val meta = Files.exists(dir)
    checks += (("metastore_dir", meta, dir.toString))
    val snapOk = Files.exists(dir.resolve("snapshot").resolve("relations.parquet"))
    checks += (("catalog_snapshot", snapOk, dir.resolve("snapshot").toString))
    if (snapOk) {
      val smoOk =
        try withSpark { spark =>
          val e = engine(spark, dir)
          val n = e.smo.count()
          checks += (("smo_builds", n >= 0, s"$n columns"))
          // role ladder + effective privileges (doctor.rs:57-160) — only
          // meaningful when the snapshot carries role datasets
          val snap = e.currentSnapshot
          if (!snap.roles.isEmpty) {
            val missing = graft.devtools.Doctor.missingRoles(snap)
            checks += (("schemamap_roles", missing.isEmpty,
              if (missing.isEmpty) "all present" else s"missing: ${missing.mkString(", ")}"))
            val privs = graft.devtools.Doctor.rolePrivileges(snap)
              .select(org.apache.spark.sql.functions.to_json(
                org.apache.spark.sql.functions.struct(
                  org.apache.spark.sql.functions.col("role_name"),
                  org.apache.spark.sql.functions.col("privileges"))))
              .collect().map(_.getString(0)).mkString("; ")
            checks += (("role_privileges", true, privs))
          }
          true
        } catch { case ex: Exception =>
          checks += (("smo_builds", false, ex.getMessage)); false
        }
      val _ = smoOk
    }
    jdbcUrl.foreach { u =>
      checks += (("jdbc_url_parses", ConnConfig.fromUrl(u).isDefined, u))
    }
    val all = checks.result()
    val json = all.map { case (name, ok, detail) =>
      s"""{"check":"$name","ok":$ok,"detail":${quote(detail)}}"""
    }.mkString("[", ",", "]")
    out(PgFormat.jsonPretty(json))
    if (all.forall(_._2)) 0 else 1
  }

  private def quote(s: String): String =
    "\"" + Option(s).getOrElse("").flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
}
