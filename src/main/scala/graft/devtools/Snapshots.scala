package graft.devtools

import java.nio.file.{Files, Path, StandardCopyOption}
import java.util.Comparator
import scala.jdk.CollectionConverters._

/** Dev-mode warehouse snapshot/restore — the Spark-native form of the
  * reference's template-database cloning
  * (/root/reference/rust/schemamap_dev.sql:102-162, SURVEY.md §2.8
  * D1-D4). A "database" here is a directory of parquet datasets (e.g. a
  * persisted CatalogSnapshot or a warehouse namespace); snapshotting is
  * a recursive file copy of immutable files — no connection freezing, no
  * lock evasion (D5/D6 intentionally dropped: immutable snapshots make
  * them meaningless).
  *
  * Bookkeeping mirrors the reference's `snapshots` table (name, source,
  * git branch/revision, elapsed ms — rust/src/porcelain.rs:147-204).
  */
final case class SnapshotInfo(
    name: String,
    sourceDir: String,
    gitBranch: Option[String],
    gitRevision: Option[String],
    createdAtMs: Long,
    elapsedMs: Long,
    sizeBytes: Long)

final class Snapshots(root: Path) {
  Files.createDirectories(root)

  private def snapDir(name: String): Path = {
    require(name.matches("[A-Za-z0-9_.-]+"), s"invalid snapshot name: $name")
    root.resolve(name)
  }

  private def copyTree(from: Path, to: Path): Long = {
    var bytes = 0L
    Files.walk(from).iterator().asScala.foreach { p =>
      val dest = to.resolve(from.relativize(p))
      if (Files.isDirectory(p)) Files.createDirectories(dest)
      else {
        Files.createDirectories(dest.getParent)
        Files.copy(p, dest, StandardCopyOption.REPLACE_EXISTING)
        bytes += Files.size(p)
      }
    }
    bytes
  }

  private def deleteTree(p: Path): Unit =
    if (Files.exists(p))
      Files.walk(p).sorted(Comparator.reverseOrder[Path]())
        .iterator().asScala.foreach(Files.delete)

  private def writeInfo(i: SnapshotInfo): Unit = {
    def q(s: String) = "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
    val json =
      s"""{"name":${q(i.name)},"source_dir":${q(i.sourceDir)},
         |"git_branch":${i.gitBranch.map(q).getOrElse("null")},
         |"git_revision":${i.gitRevision.map(q).getOrElse("null")},
         |"created_at_ms":${i.createdAtMs},"elapsed_ms":${i.elapsedMs},
         |"size_bytes":${i.sizeBytes}}""".stripMargin
    Files.writeString(snapDir(i.name).resolve("_snapshot.json"), json)
  }

  private def readInfo(dir: Path): Option[SnapshotInfo] = {
    val f = dir.resolve("_snapshot.json")
    if (!Files.exists(f)) None
    else {
      val s = Files.readString(f)
      def str(k: String) =
        s"""\"$k\":\"((?:[^"\\\\]|\\\\.)*)\"""".r.findFirstMatchIn(s)
          .map(_.group(1).replace("\\\"", "\"").replace("\\\\", "\\"))
      def num(k: String) =
        s"""\"$k\":(\\d+)""".r.findFirstMatchIn(s).map(_.group(1).toLong)
      Some(SnapshotInfo(dir.getFileName.toString,
        str("source_dir").getOrElse(""), str("git_branch"),
        str("git_revision"), num("created_at_ms").getOrElse(0L),
        num("elapsed_ms").getOrElse(0L), num("size_bytes").getOrElse(0L)))
    }
  }

  private def git(args: String*): Option[String] =
    try {
      val p = new ProcessBuilder(("git" +: args).asJava)
        .redirectErrorStream(true).start()
      val out = new String(p.getInputStream.readAllBytes()).trim
      if (p.waitFor() == 0 && out.nonEmpty) Some(out) else None
    } catch { case _: Exception => None }

  /** create_snapshot: drop-if-exists + copy + bookkeeping row, elapsed
    * ms logged like rust/schemamap_dev.sql:108-122. */
  def create(name: String, sourceDir: Path): SnapshotInfo = {
    val t0 = System.currentTimeMillis()
    val dir = snapDir(name)
    deleteTree(dir)
    Files.createDirectories(dir)
    val bytes = copyTree(sourceDir, dir.resolve("data"))
    val info = SnapshotInfo(name, sourceDir.toString,
      git("rev-parse", "--abbrev-ref", "HEAD"),
      git("rev-parse", "--short", "HEAD"),
      t0, System.currentTimeMillis() - t0, bytes)
    writeInfo(info)
    info
  }

  /** restore_snapshot: copy back over the target (dropped first,
    * rust/src/porcelain.rs:247-260). */
  def restore(name: String, targetDir: Path): Unit = {
    val data = snapDir(name).resolve("data")
    require(Files.exists(data), s"snapshot $name does not exist")
    deleteTree(targetDir)
    Files.createDirectories(targetDir)
    copyTree(data, targetDir)
  }

  /** Listing, newest first (jsonb_agg(... order by created_at desc),
    * rust/src/porcelain.rs:277-281). */
  def list: Seq[SnapshotInfo] =
    if (!Files.exists(root)) Seq.empty
    else Files.list(root).iterator().asScala.toSeq
      .filter(Files.isDirectory(_))
      .flatMap(readInfo)
      .sortBy(-_.createdAtMs)

  def drop(name: String): Boolean = {
    val dir = snapDir(name)
    val existed = Files.exists(dir)
    deleteTree(dir)
    existed
  }

  /** gc_snapshots: remove bookkeeping whose data vanished
    * (rust/schemamap_dev.sql:152-162). */
  def gc(): Seq[String] =
    if (!Files.exists(root)) Seq.empty
    else Files.list(root).iterator().asScala.toSeq
      .filter(d => Files.isDirectory(d) && !Files.exists(d.resolve("data")))
      .map { d => deleteTree(d); d.getFileName.toString }
}
