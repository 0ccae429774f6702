package graft.etl

import java.sql.Timestamp
import java.util.concurrent.atomic.AtomicLong

/** Data-migration bookkeeping — the import state machine of
  * /root/reference/sql/V000002__data_migrations.sql:1-57, plus the
  * optimistic-locking trigger semantics of
  * /root/reference/sql/V000001__init.sql:19-66 re-expressed as a
  * check-and-set on the metastore write path (no row triggers in Spark;
  * SURVEY.md §2.7 M7).
  */
sealed abstract class MigrationState(val value: String) {
  /** Legal next states (LOADING→LOADED|LOAD_FAILED→IMPORTING→…). */
  def next: Set[MigrationState]
  def terminal: Boolean = next.isEmpty
}

object MigrationState {
  case object Loading extends MigrationState("LOADING") {
    def next: Set[MigrationState] = Set(Loaded, LoadFailed)
  }
  case object Loaded extends MigrationState("LOADED") {
    def next: Set[MigrationState] = Set(Importing)
  }
  case object LoadFailed extends MigrationState("LOAD_FAILED") {
    def next: Set[MigrationState] = Set.empty
  }
  case object Importing extends MigrationState("IMPORTING") {
    def next: Set[MigrationState] = Set(Imported, ImportFailed)
  }
  case object Imported extends MigrationState("IMPORTED") {
    def next: Set[MigrationState] = Set.empty
  }
  case object ImportFailed extends MigrationState("IMPORT_FAILED") {
    def next: Set[MigrationState] = Set.empty
  }
  val all: Seq[MigrationState] =
    Seq(Loading, Loaded, LoadFailed, Importing, Imported, ImportFailed)
  def of(value: String): MigrationState =
    all.find(_.value == value).getOrElse(
      throw new IllegalArgumentException(s"unknown migration state: $value"))
}

/** Import sources (data_migration_sources). */
sealed abstract class MigrationSource(val value: String)
object MigrationSource {
  case object Postgres extends MigrationSource("POSTGRES")
  case object GoogleSpreadsheet extends MigrationSource("GOOGLE_SPREADSHEET")
  case object Xlsx extends MigrationSource("XLSX")
  case object Csv extends MigrationSource("CSV")
  case object Salesforce extends MigrationSource("SALESFORCE")
  val all: Seq[MigrationSource] =
    Seq(Postgres, GoogleSpreadsheet, Xlsx, Csv, Salesforce)
}

/** One data_migrations row. */
final case class DataMigration(
    id: Long,
    state: String,
    source: String,
    mdeName: String,
    tenantId: Option[String] = None,
    comment: Option[String] = None,
    importStartedAt: Option[Timestamp] = None,
    importedAt: Option[Timestamp] = None,
    summary: Option[String] = None, // open-shaped JSON as text
    createdAt: Timestamp = new Timestamp(0L),
    updatedAt: Timestamp = new Timestamp(0L),
    version: Long = 0L)

/** In-memory migration store with the reference's optimistic-lock
  * contract: an update must carry `expectedVersion == current.version`;
  * the stored row then gets `version + 1` and a fresh `updated_at`
  * (V000001__init.sql:22-42 — "version must be incremented by exactly
  * 1"). Illegal state transitions are rejected against the state
  * machine. Thread-safe; a JDBC/Delta-backed store implements the same
  * trait with a conditional UPDATE / MERGE. */
final class MigrationStore {
  private val seq = new AtomicLong(0L)
  private val rows = scala.collection.concurrent.TrieMap[Long, DataMigration]()

  private def now() = new Timestamp(System.currentTimeMillis())

  def create(source: MigrationSource, mdeName: String,
      tenantId: Option[String] = None): DataMigration = {
    val m = DataMigration(seq.incrementAndGet(), MigrationState.Loading.value,
      source.value, mdeName, tenantId,
      createdAt = now(), updatedAt = now())
    rows(m.id) = m
    m
  }

  def get(id: Long): Option[DataMigration] = rows.get(id)
  def list: Seq[DataMigration] = rows.values.toSeq.sortBy(_.id)

  /** Check-and-set transition. Throws on unknown id, version conflict
    * (concurrent writer), or illegal state transition. */
  def transition(id: Long, to: MigrationState, expectedVersion: Long,
      summary: Option[String] = None): DataMigration = synchronized {
    val cur = rows.getOrElse(id,
      throw new NoSuchElementException(s"migration $id"))
    if (cur.version != expectedVersion)
      throw new IllegalStateException(
        s"version conflict on migration $id: expected $expectedVersion, " +
          s"stored ${cur.version}")
    val from = MigrationState.of(cur.state)
    if (!from.next.contains(to))
      throw new IllegalStateException(
        s"illegal transition ${from.value} -> ${to.value}")
    val ts = now()
    val upd = cur.copy(state = to.value, version = cur.version + 1,
      updatedAt = ts,
      importStartedAt =
        if (to == MigrationState.Importing) Some(ts) else cur.importStartedAt,
      importedAt =
        if (to == MigrationState.Imported) Some(ts) else cur.importedAt,
      summary = summary.orElse(cur.summary))
    rows(id) = upd
    upd
  }
}
