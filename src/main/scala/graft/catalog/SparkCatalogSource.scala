package graft.catalog

import org.apache.spark.sql.{Row, SparkSession}

/** Snapshot Spark's own catalog — the engine introspecting the warehouse
  * it runs in, the way the reference introspects pg_catalog. Relations
  * come from the session catalog (tables + views per database),
  * attributes from each table's resolved schema, approx_rows from
  * Catalyst statistics (`LogicalPlan.stats` — the reltuples analog;
  * never a count(*), matching SURVEY.md §2.1 S11).
  *
  * Spark tables carry no PK/FK/index metadata, so those datasets are
  * empty — concepts degrade gracefully (key concepts false, pii/
  * metadata/external-reference still meaningful) and scoring runs on
  * rows + (zero) inbound FKs.
  */
object SparkCatalogSource {

  def snapshot(spark: SparkSession, databases: Seq[String] = Seq.empty): CatalogSnapshot = {
    import scala.jdk.CollectionConverters._
    val dbs =
      if (databases.nonEmpty) databases
      else spark.catalog.listDatabases().collect().map(_.name).toSeq

    val tables = dbs.flatMap { db =>
      spark.catalog.listTables(db).collect().toSeq
    } ++ spark.catalog.listTables().collect().filter(_.isTemporary).toSeq

    val seen = scala.collection.mutable.Set[(String, String)]()
    val rel = Seq.newBuilder[Row]
    val att = Seq.newBuilder[Row]

    tables.foreach { t =>
      val schemaName = Option(t.namespace).filter(_.nonEmpty)
        .map(_.mkString(".")).getOrElse("default")
      if (seen.add((schemaName, t.name))) {
        val qualified =
          if (t.isTemporary) t.name else s"$schemaName.${t.name}"
        val df =
          try Some(spark.table(qualified))
          catch { case _: Exception => None }
        df.foreach { d =>
          val relkind = if (t.tableType == "VIEW" || t.isTemporary) "v" else "r"
          val approxRows = d.queryExecution.optimizedPlan.stats.rowCount
            .map(_.longValue)
            .getOrElse {
              // fall back to size-based estimate: bytes / (8 per field)
              val bytes = d.queryExecution.optimizedPlan.stats.sizeInBytes
              (bytes / math.max(1, d.schema.fields.length * 8)).longValue
            }
          rel += Row(schemaName, t.name, relkind,
            Option(t.description).filter(_.nonEmpty).orNull, approxRows)
          d.schema.fields.zipWithIndex.foreach { case (f, i) =>
            att += Row(schemaName, t.name, f.name, i + 1,
              f.dataType.simpleString, !f.nullable,
              null, f.getComment().orNull, false, null)
          }
        }
      }
    }

    val sc = spark.sparkContext
    def mk(rows: Seq[Row], schema: org.apache.spark.sql.types.StructType) =
      spark.createDataFrame(sc.parallelize(rows, math.max(1, rows.size min 8)), schema)
    CatalogSnapshot(
      mk(rel.result(), CatalogSnapshot.relationsSchema),
      mk(att.result(), CatalogSnapshot.attributesSchema),
      mk(Seq.empty, CatalogSnapshot.constraintsSchema),
      mk(Seq.empty, CatalogSnapshot.indexesSchema),
      mk(dbs.map(Row(_, true)), CatalogSnapshot.schemaPrivsSchema),
      // Spark's catalog exposes no view→table dependency edges cheaply;
      // what-if over a Spark-introspected snapshot prunes no views.
      mk(Seq.empty, CatalogSnapshot.dependenciesSchema),
      // nor roles/grants — doctor over a Spark snapshot reports none
      mk(Seq.empty, CatalogSnapshot.rolesSchema),
      mk(Seq.empty, CatalogSnapshot.roleMembersSchema),
      mk(Seq.empty, CatalogSnapshot.grantsSchema))
  }
}
