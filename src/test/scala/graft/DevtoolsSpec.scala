package graft

import graft.config.ConnConfig
import graft.devtools.Snapshots
import graft.util.PgFormat
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.{Files, Path}

/** Config-resolver chain, snapshot/restore lifecycle, and formatting
  * helpers — the CLI-support surface (SURVEY.md §2.1 S12, §2.8, §7.3). */
class DevtoolsSpec extends AnyFunSuite {

  // ---- ConnConfig ---------------------------------------------------------

  test("DATABASE_URL parsing incl. passwordless and port-less forms") {
    assert(ConnConfig.fromUrl("postgres://u:p@h:5433/db") ==
      Some(ConnConfig("h", 5433, "db", "u", Some("p"))))
    assert(ConnConfig.fromUrl("postgresql://h/db") ==
      Some(ConnConfig("h", 5432, "db", "postgres", None)))
    assert(ConnConfig.fromUrl("not-a-url").isEmpty)
  }

  test("env chain: DATABASE_URL wins over PG*, PG* over defaults") {
    val both = Map("DATABASE_URL" -> "postgres://a@urlhost/d1",
      "PGHOST" -> "pghost")
    assert(ConnConfig.fromEnv(both).get.host == "urlhost")
    val pgOnly = Map("PGHOST" -> "pghost", "PGPORT" -> "5444", "PGUSER" -> "me")
    val c = ConnConfig.fromEnv(pgOnly).get
    assert(c.host == "pghost" && c.port == 5444 && c.user == "me")
    assert(ConnConfig.fromEnv(Map.empty).isEmpty)
  }

  test("pgpass: wildcards, escapes, first-match (reference parser parity)") {
    val lines = Seq(
      "# comment",
      "otherhost:5432:*:u:nope",
      "h:5432:d\\:b:u:pw\\\\1", // escaped colon in dbname, backslash in pw
      "*:*:*:*:fallback")
    assert(ConnConfig.pgpassLookup(lines, "h", 5432, "d:b", "u") == Some("pw\\1"))
    assert(ConnConfig.pgpassLookup(lines, "x", 1, "y", "z") == Some("fallback"))
    assert(ConnConfig.pgpassLookup(lines.init, "x", 1, "y", "z").isEmpty)
  }

  test("resolve: explicit beats env; pgpass fills missing password") {
    val pgpass = Files.createTempFile("pgpass", "")
    Files.writeString(pgpass, "h:5432:db:u:secret\n")
    val r = ConnConfig.resolve(
      explicit = Some(ConnConfig("h", 5432, "db", "u", None)),
      env = Map("DATABASE_URL" -> "postgres://x@elsewhere/other"),
      pgpassPath = Some(pgpass))
    assert(r.host == "h" && r.password == Some("secret"))
    assert(r.jdbcUrl == "jdbc:postgresql://h:5432/db")
  }

  // ---- Snapshots ----------------------------------------------------------

  test("snapshot/restore/list/drop/gc lifecycle") {
    val root = Files.createTempDirectory("snaps")
    val src = Files.createTempDirectory("src")
    Files.writeString(src.resolve("a.parquet"), "AAA")
    Files.createDirectories(src.resolve("nested"))
    Files.writeString(src.resolve("nested/b.parquet"), "BBBB")

    val s = new Snapshots(root)
    val info = s.create("base", src)
    assert(info.sizeBytes == 7)
    assert(s.list.map(_.name) == Seq("base"))

    // mutate source, restore, verify rollback
    Files.writeString(src.resolve("a.parquet"), "CHANGED")
    Files.delete(src.resolve("nested/b.parquet"))
    s.restore("base", src)
    assert(Files.readString(src.resolve("a.parquet")) == "AAA")
    assert(Files.readString(src.resolve("nested/b.parquet")) == "BBBB")

    // gc removes orphaned bookkeeping
    val orphan = root.resolve("broken")
    Files.createDirectories(orphan)
    Files.writeString(orphan.resolve("_snapshot.json"), """{"name":"broken"}""")
    assert(s.gc() == Seq("broken"))

    assert(s.drop("base"))
    assert(!s.drop("base"))
    assert(s.list.isEmpty)
    intercept[IllegalArgumentException](s.create("../evil", src))
  }

  // ---- PgFormat -----------------------------------------------------------

  test("pg_size_pretty thresholds match Postgres") {
    assert(PgFormat.pgSizePretty(0) == "0 bytes")
    assert(PgFormat.pgSizePretty(10239) == "10239 bytes")
    assert(PgFormat.pgSizePretty(10240) == "10 kB")
    assert(PgFormat.pgSizePretty(10485760) == "10 MB")
    assert(PgFormat.pgSizePretty(5L * 1024 * 1024 * 1024) == "5120 MB")
    assert(PgFormat.pgSizePretty(11L * 1024 * 1024 * 1024) == "11 GB")
  }

  test("quote_ident quotes exactly when needed") {
    assert(PgFormat.quoteIdent("simple_name1") == "simple_name1")
    assert(PgFormat.quoteIdent("CamelCase") == "\"CamelCase\"")
    assert(PgFormat.quoteIdent("has space") == "\"has space\"")
    assert(PgFormat.quoteIdent("quo\"te") == "\"quo\"\"te\"")
  }

  test("jsonPretty indents and preserves strings verbatim") {
    val pretty = PgFormat.jsonPretty("""{"a":1,"b":["x,y","{z}"],"c":{"d":null}}""")
    assert(pretty.contains("\"a\": 1"))
    assert(pretty.contains("\"x,y\"")) // comma inside string untouched
    assert(pretty.contains("\"{z}\"")) // brace inside string untouched
    assert(pretty.linesIterator.size > 5)
  }

  // ---- docker-compose / supabase parsers (S12) ----------------------------

  private def write(dir: Path, name: String, text: String): Path = {
    val p = dir.resolve(name)
    Files.createDirectories(p.getParent)
    Files.writeString(p, text)
    p
  }

  test("docker-compose: map-form environment, short ports, non-postgres services skipped") {
    val dir = Files.createTempDirectory("compose")
    write(dir, "docker-compose.yml",
      """version: "3"
        |services:
        |  web:
        |    image: nginx:latest
        |    ports:
        |      - "80:80"
        |  db:
        |    image: postgres:16
        |    environment:
        |      POSTGRES_USER: app
        |      POSTGRES_PASSWORD: s3cret
        |      POSTGRES_DB: appdb
        |    ports:
        |      - "8432:5432"
        |""".stripMargin)
    assert(ConnConfig.fromDockerCompose(dir) ==
      Some(ConnConfig("localhost", 8432, "appdb", "app", Some("s3cret"))))
  }

  test("docker-compose: list-form environment, ip:host:container ports, long form, defaults") {
    val dir = Files.createTempDirectory("compose")
    write(dir, "compose.yaml",
      """services:
        |  pg:
        |    image: postgres
        |    environment:
        |      - POSTGRES_PASSWORD=pw
        |      - PGPORT=7777
        |    ports:
        |      - "127.0.0.1:9432:5432"
        |""".stripMargin)
    assert(ConnConfig.fromDockerCompose(dir) ==
      Some(ConnConfig("localhost", 9432, "postgres", "postgres", Some("pw"))))

    val dir2 = Files.createTempDirectory("compose")
    write(dir2, "compose.yaml",
      """services:
        |  pg:
        |    image: postgres:15-alpine
        |    environment:
        |      - POSTGRES_PASSWORD=pw
        |    ports:
        |      - target: 5432
        |        published: 6543
        |""".stripMargin)
    assert(ConnConfig.fromDockerCompose(dir2).map(_.port) == Some(6543))

    // container-only port → PGPORT env entry → libpq default
    val dir3 = Files.createTempDirectory("compose")
    write(dir3, "compose.yaml",
      """services:
        |  pg:
        |    image: postgres
        |    environment:
        |      - PGPORT=7777
        |    ports:
        |      - "5432"
        |""".stripMargin)
    assert(ConnConfig.fromDockerCompose(dir3).map(_.port) == Some(7777))
  }

  test("docker-compose: compose.yaml preferred over docker-compose.yml (spec order)") {
    val dir = Files.createTempDirectory("compose")
    write(dir, "docker-compose.yml",
      "services:\n  db:\n    image: postgres\n    environment:\n      POSTGRES_DB: fromdc\n")
    write(dir, "compose.yaml",
      "services:\n  db:\n    image: postgres\n    environment:\n      POSTGRES_DB: fromcompose\n")
    assert(ConnConfig.fromDockerCompose(dir).map(_.database) == Some("fromcompose"))
  }

  test("supabase: full [db] section parses; stock partial config rejected like the reference") {
    val dir = Files.createTempDirectory("supa")
    write(dir, "supabase/config.toml",
      """project_id = "demo"
        |[db]
        |host = "127.0.0.1"
        |port = 54322 # local stack port
        |user = "postgres"
        |password = "postgres"
        |dbname = "postgres"
        |[db.pooler]
        |port = 54329
        |""".stripMargin)
    assert(ConnConfig.fromSupabase(dir) ==
      Some(ConnConfig("127.0.0.1", 54322, "postgres", "postgres", Some("postgres"))))

    // a stock supabase config omits db credentials → required-field parse
    // failure in the reference → chain continues (None here)
    val dir2 = Files.createTempDirectory("supa")
    write(dir2, "supabase/config.toml", "[db]\nport = 54322\n")
    assert(ConnConfig.fromSupabase(dir2).isEmpty)
  }

  test("resolve: env beats docker-compose beats supabase (reference chain order)") {
    val dir = Files.createTempDirectory("chain")
    write(dir, "compose.yaml",
      "services:\n  db:\n    image: postgres\n    environment:\n      POSTGRES_DB: dcdb\n")
    write(dir, "supabase/config.toml",
      "[db]\nhost = \"h\"\nport = 1\nuser = \"u\"\npassword = \"p\"\ndbname = \"supadb\"\n")
    assert(ConnConfig.resolve(env = Map("PGDATABASE" -> "envdb"), cwd = dir)
      .database == "envdb")
    assert(ConnConfig.resolve(env = Map.empty, cwd = dir).database == "dcdb")
    Files.delete(dir.resolve("compose.yaml"))
    assert(ConnConfig.resolve(env = Map.empty, cwd = dir).database == "supadb")
  }

  // ---- Doctor role walk (rust/src/doctor.rs:57-160) -----------------------

  test("doctor: multi-hop role hierarchy closure and nested privilege rollup") {
    import org.apache.spark.sql.Row
    val spark = Sessions.local(4)
    // chain: schemamap_readonly ∈ intermediate_grp ∈ reporting ∈ top_grp
    // — grants attached to `reporting` (2 hops) and `top_grp` (3 hops)
    // must surface on schemamap_readonly (the reference's single-hop
    // CTE quirk misses both; scaladoc cites it)
    val snap = graft.catalog.CatalogSnapshot.fromRows(spark,
      relations = Seq.empty, attributes = Seq.empty, constraints = Seq.empty,
      roles = Seq("schemamap", "schemamap_readwrite", "schemamap_readonly",
        "schemamap_schema_read", "intermediate_grp", "reporting", "top_grp",
        "app_user")
        .map(Row(_)),
      roleMembers = Seq(
        Row("intermediate_grp", "schemamap_readonly"),
        Row("reporting", "intermediate_grp"),
        Row("top_grp", "reporting"),
        Row("reporting", "app_user")),
      grants = Seq(
        Row("reporting", "public", "t1", "SELECT"),
        Row("reporting", "public", "t2", "SELECT"),
        Row("top_grp", "public", "t3", "SELECT"),
        Row("schemamap_readwrite", "app", "orders", "SELECT"),
        Row("schemamap_readwrite", "app", "orders", "INSERT"),
        // engine-namespace grants are excluded from the rollup
        Row("schemamap", "schemamap", "table_metadata", "SELECT")))

    val h = graft.devtools.Doctor.roleHierarchy(snap).collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(h(("schemamap_readonly", "schemamap_readonly"))) // CTE base case
    assert(h(("schemamap_readonly", "intermediate_grp")))   // 1 hop
    assert(h(("schemamap_readonly", "reporting")))          // 2 hops
    assert(h(("schemamap_readonly", "top_grp")))            // 3 hops
    assert(!h.exists(_._1 == "app_user")) // only schemamap% roles walk

    val privs = graft.devtools.Doctor.rolePrivileges(snap).collect()
      .map(r => (r.getString(0),
        Option(r.getMap[String, Map[String, Long]](1)).map(_.toMap))).toMap
    assert(privs("schemamap_readonly").get ==
      Map("public" -> Map("SELECT" -> 3L)))
    assert(privs("schemamap_readwrite").get ==
      Map("app" -> Map("SELECT" -> 1L, "INSERT" -> 1L)))
    // schemamap's only grant is in the excluded engine namespace → NULL
    assert(privs("schemamap").isEmpty)
    assert(privs("schemamap_schema_read").isEmpty)
    assert(graft.devtools.Doctor.missingRoles(snap).isEmpty)

    // singleHopQuirk = true reproduces the reference CTE verbatim: the
    // walk stops one membership hop out, so reporting/top_grp (and
    // every grant attached there) vanish from schemamap_readonly
    val hq = graft.devtools.Doctor
      .roleHierarchy(snap, singleHopQuirk = true).collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(hq(("schemamap_readonly", "schemamap_readonly")))
    assert(hq(("schemamap_readonly", "intermediate_grp")))
    assert(!hq(("schemamap_readonly", "reporting")))
    assert(!hq(("schemamap_readonly", "top_grp")))
    val privsQ = graft.devtools.Doctor
      .rolePrivileges(snap, singleHopQuirk = true).collect()
      .map(r => (r.getString(0),
        Option(r.getMap[String, Map[String, Long]](1)).map(_.toMap))).toMap
    assert(privsQ("schemamap_readonly").isEmpty,
      "quirk mode must miss the 2- and 3-hop grants, like the reference")
    // direct grants agree across modes — the flat-ladder configs the
    // reference installer creates see no behavior difference
    assert(privsQ("schemamap_readwrite") == privs("schemamap_readwrite"))

    val partial = graft.catalog.CatalogSnapshot.fromRows(spark,
      Seq.empty, Seq.empty, Seq.empty,
      roles = Seq(Row("schemamap"), Row("schemamap_readonly")))
    assert(graft.devtools.Doctor.missingRoles(partial) ==
      Seq("schemamap_schema_read", "schemamap_readwrite"))
  }

  // ---- JdbcCatalogSource query surface ------------------------------------

  test("catalog pushdown queries cover every snapshot dataset and only use snapshot-time PG functions") {
    val qs = graft.catalog.JdbcCatalogSource.allQueries
    assert(qs.keySet == Set("relations", "attributes", "constraints",
      "indexes", "schema_privs", "dependencies", "roles", "role_members",
      "grants"))
    // the PG-only formatting functions stay server-side (SURVEY.md §2.6)
    assert(qs("attributes").contains("format_type"))
    assert(qs("attributes").contains("pg_get_expr"))
    assert(qs("constraints").contains("pg_get_constraintdef"))
    assert(qs("constraints").contains("pg_get_serial_sequence"))
    assert(qs("indexes").contains("pg_get_indexdef"))
    assert(qs("schema_privs").contains("has_schema_privilege"))
    // column lists line up with CatalogSnapshot's schemas
    graft.catalog.CatalogSnapshot.relationsSchema.fieldNames.foreach(f =>
      assert(qs("relations").contains(f), s"relations query missing $f"))
    graft.catalog.CatalogSnapshot.attributesSchema.fieldNames.foreach(f =>
      assert(qs("attributes").contains(f), s"attributes query missing $f"))
    graft.catalog.CatalogSnapshot.dependenciesSchema.fieldNames.foreach(f =>
      assert(qs("dependencies").contains(f), s"dependencies query missing $f"))
  }

  // ---- CLI ----------------------------------------------------------------

  test("cli: init + doctor on empty metastore fails snapshot check cleanly") {
    val dir = Files.createTempDirectory("graftcli")
    val outs = Seq.newBuilder[String]
    assert(graft.cli.Main.run(
      Array("init", s"--dir=$dir"), outs += _) == 0)
    assert(Files.exists(dir.resolve("snapshots")))
    val code = graft.cli.Main.run(Array("doctor", s"--dir=$dir"), outs += _)
    assert(code == 1) // no snapshot yet → doctor reports it
    val doctorOut = outs.result().mkString("\n")
    assert(doctorOut.contains("\"check\": \"catalog_snapshot\""))
    assert(doctorOut.contains("false"))
  }

  test("cli: status over a persisted fixture snapshot emits pretty JSON") {
    import org.apache.spark.sql.Row
    val spark = Sessions.local(4)
    val dir = Files.createTempDirectory("graftcli2")
    val snap = graft.catalog.CatalogSnapshot.fromRows(spark,
      relations = Seq(Row("s", "t", "r", null, 10L)),
      attributes = Seq(
        Row("s", "t", "id", 1, "bigint", true, null, null, false, null),
        Row("s", "t", "email", 2, "text", true, null, null, false, null)),
      constraints = Seq(Row("s", "t", "t_pkey", "p", "PRIMARY KEY (id)",
        Seq(1), null, null, null, null)),
      schemaPrivs = Seq(Row("s", true)))
    graft.catalog.CatalogSnapshot.write(snap, dir.resolve("snapshot").toString)
    val outs = Seq.newBuilder[String]
    assert(graft.cli.Main.run(Array("status", s"--dir=$dir"), outs += _) == 0)
    val json = outs.result().mkString("\n")
    assert(json.contains("\"column_count\": 2"))
    assert(json.contains("\"pii_count\": 1"))
    // doctor now passes end-to-end (SMO builds from the stored snapshot)
    assert(graft.cli.Main.run(Array("doctor", s"--dir=$dir"), _ => ()) == 0)
    // snapshot/restore round-trip through the CLI
    assert(graft.cli.Main.run(Array("snapshot", "base", s"--dir=$dir"), _ => ()) == 0)
    assert(graft.cli.Main.run(Array("restore", "base", s"--dir=$dir"), _ => ()) == 0)
    val listOut = Seq.newBuilder[String]
    assert(graft.cli.Main.run(Array("list", s"--dir=$dir"), listOut += _) == 0)
    assert(listOut.result().mkString.contains("\"base\""))
  }

  test("cli: usage on unknown command") {
    val outs = Seq.newBuilder[String]
    assert(graft.cli.Main.run(Array("wat"), outs += _) == 2)
    assert(outs.result().head.startsWith("usage:"))
  }
}
