package graft

import graft.operators.{IvfIndex, Similarity}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The persisted IVF cell store must be a pure storage optimization:
  * [[IvfIndex.topK]] returns row-for-row what [[Similarity.ivfTopK]]
  * returns for the same corpus and cell count, while the query-time
  * plan reads the bucketed cell store (precomputed norms, assignment
  * already paid) instead of re-deriving the corpus side. */
class IvfIndexSpec extends AnyFunSuite {
  private lazy val spark = Sessions.local(8)
  private val sf = "/root/testdata/sf0.001"
  private def embs = Tables.df(spark, sf, "embeddings")

  private def resultSet(df: DataFrame) = df.collect().map(r =>
    (r.getAs[Long]("query_id"), r.getAs[Int]("rank"),
      r.getAs[Long]("neighbor_id"))).toSet

  test("indexed IVF topK == in-memory ivfTopK; plan reads the bucketed store only") {
    val queries = embs.filter(col("vec_id") % 50 === 0)
    try {
      IvfIndex.build(embs, "vec_id", "embedding", "graft_ivf", nCells = 8)
      val viaIndex = IvfIndex.topK(
        queries, "vec_id", "embedding", "graft_ivf", k = 5, nProbe = 3)
      val inMemory = Similarity.ivfTopK(
        queries, embs, "vec_id", "embedding", 5, nCells = 8, nProbe = 3)
      val got = resultSet(viaIndex)
      assert(got == resultSet(inMemory))
      assert(got.nonEmpty)
      // query-time plan properties: the cell store is read bucketed (no
      // corpus-side exchange) and the corpus parquet is never rescanned
      // (the query batch comes from it legitimately — so pin that the
      // CELLS side has no Exchange, via the formatted plan's scan info)
      val plan = viaIndex.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      assert(plan.contains("graft_ivf_cells"), plan.take(600))
      assert(plan.contains("Bucketed: true"),
        s"cell store must be read bucketed:\n${plan.take(1200)}")
      // full probe over the stored cells degenerates to exact search —
      // same invariant the in-memory operator proves, through the store
      val full = resultSet(IvfIndex.topK(
        queries, "vec_id", "embedding", "graft_ivf", k = 5, nProbe = 8))
      val exact = resultSet(Similarity.bruteForceTopK(
        queries, embs, "vec_id", "embedding", 5))
      assert(full == exact)
    } finally Seq("graft_ivf_cells", "graft_ivf_cent")
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
  }

  test("small query batches prune cell-store BUCKETS, results unchanged") {
    // one query probing 2 of 16 cells: the probed-list_id filter must
    // surface as bucket pruning on the stored scan (SelectedBucketsCount
    // below the total), the single-lookup latency path at 100 TB
    val one = embs.filter(col("vec_id") === 0)
    try {
      IvfIndex.build(embs, "vec_id", "embedding", "graft_ivf2",
        nCells = 16, buckets = 16)
      val viaIndex = IvfIndex.topK(
        one, "vec_id", "embedding", "graft_ivf2", k = 5, nProbe = 2)
      val got = resultSet(viaIndex)
      assert(got == resultSet(Similarity.ivfTopK(
        one, embs, "vec_id", "embedding", 5, nCells = 16, nProbe = 2)))
      assert(got.nonEmpty)
      val plan = viaIndex.queryExecution.executedPlan.toString
      val sel = "SelectedBucketsCount: (\\d+) out of (\\d+)".r
        .findFirstMatchIn(plan)
      assert(sel.isDefined,
        s"expected bucket pruning on the cell store:\n${plan.take(1500)}")
      assert(sel.get.group(1).toInt < sel.get.group(2).toInt, sel.get.matched)
      // a batch probing EVERY cell self-disables the filter: the
      // bucketed scan reports no bucket ruled out (Spark prints the
      // count on bucketed scans unconditionally, so assert equality,
      // not absence)
      val all = IvfIndex.topK(embs.limit(40), "vec_id", "embedding",
        "graft_ivf2", k = 3, nProbe = 16)
      val allSel = "SelectedBucketsCount: (\\d+) out of (\\d+)".r
        .findFirstMatchIn(all.queryExecution.executedPlan.toString)
      allSel.foreach(m => assert(m.group(1) == m.group(2),
        s"full-probe batches must not prune buckets: ${m.matched}"))
    } finally Seq("graft_ivf2_cells", "graft_ivf2_cent")
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
  }

  test("learned-centroid build: store topK == ivfTopK with the kmeans centroid set") {
    val queries = embs.filter(col("vec_id") % 50 === 0)
    try {
      val km = Similarity.kmeansCentroids(embs, "embedding", nCells = 8)
      IvfIndex.build(embs, "vec_id", "embedding", "graft_ivfkm",
        centroids = Some(km))
      // the store must answer row-for-row what the in-memory operator
      // answers with the SAME learned centroids — the storage layer
      // stays a pure optimization under the centroids override too
      val got = resultSet(IvfIndex.topK(
        queries, "vec_id", "embedding", "graft_ivfkm", k = 5, nProbe = 3))
      val inMemory = resultSet(Similarity.ivfTopK(
        queries, embs, "vec_id", "embedding", 5, nProbe = 3,
        centroidsOverride = Some(spark.table("graft_ivfkm_cent"))))
      assert(got == inMemory)
      assert(got.nonEmpty)
      // the stored centroid table IS the learned set (cast to the
      // canonical types), not a hash-sampled substitute
      assert(spark.table("graft_ivfkm_cent").count() == 8)
      val storedIds = spark.table("graft_ivfkm_cent")
        .select("list_id").collect().map(_.getLong(0)).toSet
      assert(storedIds == km.select("list_id").collect()
        .map(_.getLong(0)).toSet)
      // full probe through the learned store degenerates to exact
      val full = resultSet(IvfIndex.topK(
        queries, "vec_id", "embedding", "graft_ivfkm", k = 5, nProbe = 8))
      assert(full == resultSet(Similarity.bruteForceTopK(
        queries, embs, "vec_id", "embedding", 5)))
    } finally {
      Seq("graft_ivfkm_cells", "graft_ivfkm_cent")
        .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
      spark.catalog.clearCache()
    }
  }

  test("compact folds committed batches into base, keeps uncommitted prunable, answers unchanged") {
    val seed = embs.filter(col("vec_id") % 3 === 0)
    val b1 = embs.filter(col("vec_id") % 3 === 1)
    val b2 = embs.filter(col("vec_id") % 3 === 2)
    val queries = embs.filter(col("vec_id") % 50 === 0)
    def batchDirs: Set[String] = {
      val warehouse = spark.conf.get("spark.sql.warehouse.dir")
        .stripPrefix("file:")
      val s = java.nio.file.Files.walk(
        java.nio.file.Paths.get(warehouse, "graft_ivfc_cells"))
      try {
        import scala.jdk.CollectionConverters._
        s.iterator().asScala.map(_.getFileName.toString)
          .filter(_.startsWith("batch_id=")).toSet
      } finally s.close()
    }
    try {
      IvfIndex.build(seed, "vec_id", "embedding", "graft_ivfc", nCells = 8)
      IvfIndex.append(b1, "vec_id", "embedding", "graft_ivfc", batchId = 1L)
      IvfIndex.append(b2, "vec_id", "embedding", "graft_ivfc", batchId = 2L)
      assert(batchDirs == Set("batch_id=-1", "batch_id=1", "batch_id=2"))
      val before = resultSet(IvfIndex.topK(
        queries, "vec_id", "embedding", "graft_ivfc", k = 5, nProbe = 3))
      spark.catalog.clearCache() // caller-clears-cache before compacting
      // batch 2 is "appended but never ledger-committed": it must keep
      // its partition verbatim so replay repair can still prune it
      IvfIndex.compact(spark, "graft_ivfc", uncommitted = Set(2L))
      assert(batchDirs == Set("batch_id=-1", "batch_id=2"))
      assert(resultSet(IvfIndex.topK(
        queries, "vec_id", "embedding", "graft_ivfc", k = 5, nProbe = 3))
        == before, "compaction must not change any answer")
      // the swapped-in store keeps the bucketed layout (bucket pruning
      // still works after the rename dance)
      val one = embs.filter(col("vec_id") === 0)
      val plan = IvfIndex.topK(one, "vec_id", "embedding", "graft_ivfc",
        k = 5, nProbe = 2).queryExecution.executedPlan.toString
      assert("SelectedBucketsCount: (\\d+) out of (\\d+)".r
        .findFirstMatchIn(plan).exists(m =>
          m.group(1).toInt < m.group(2).toInt),
        s"compacted cell store must still bucket-prune:\n${plan.take(1200)}")
      // the torn batch is still undoable after compaction
      spark.catalog.clearCache()
      IvfIndex.pruneBatch(spark, "graft_ivfc", 2L)
      assert(batchDirs == Set("batch_id=-1"))
      // and a second compact with nothing uncommitted is a no-op fold
      spark.catalog.clearCache()
      IvfIndex.compact(spark, "graft_ivfc")
      assert(batchDirs == Set("batch_id=-1"))
      val afterPrune = resultSet(IvfIndex.topK(
        queries, "vec_id", "embedding", "graft_ivfc", k = 5, nProbe = 3))
      assert(afterPrune == resultSet(Similarity.ivfTopK(
        queries, seed.unionByName(b1), "vec_id", "embedding", 5, nProbe = 3,
        centroidsOverride = Some(spark.table("graft_ivfc_cent")))))
    } finally {
      Seq("graft_ivfc_cells", "graft_ivfc_cent")
        .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
      spark.catalog.clearCache()
    }
  }

  test("driftReport: base mean == assignmentDrift over the store; drifted append flags low") {
    val seed = embs.filter(col("vec_id") % 3 =!= 0)
    // an append that left the build-time geometry entirely: negated
    // vectors score cos(-v, c) = -cos(v, c) against every frozen cell
    val drifted = embs.filter(col("vec_id") % 3 === 0)
      .select((col("vec_id") + 1000000L).as("vec_id"),
        transform(col("embedding"), x => -x).as("embedding"))
    try {
      IvfIndex.build(seed, "vec_id", "embedding", "graft_ivfdr", nCells = 8)
      IvfIndex.append(drifted, "vec_id", "embedding", "graft_ivfdr",
        batchId = 7L)
      val rep = IvfIndex.driftReport(spark, "graft_ivfdr")
        .collect().map(r => r.getAs[Long]("batch_id") ->
          ((r.getAs[Long]("n_vecs"), r.getAs[Double]("mean_cos")))).toMap
      assert(rep.keySet == Set(-1L, 7L))
      assert(rep(-1L)._1 == seed.count() && rep(7L)._1 == drifted.count())
      // the monitoring signal: the drifted batch's mean assignment
      // cosine falls below the base partition's
      assert(rep(7L)._2 < rep(-1L)._2,
        s"drifted ${rep(7L)._2} should score below base ${rep(-1L)._2}")
      // and the store-side report is the SAME measurement as the
      // generic operator run over the raw frames with the stored
      // centroids — bit-for-bit, since both means are exact-decimal
      val cent = spark.table("graft_ivfdr_cent")
      val generic = Similarity.assignmentDrift(
          seed.select(col("vec_id"), col("embedding"), lit(-1L).as("b"))
            .unionByName(drifted.select(col("vec_id"), col("embedding"),
              lit(7L).as("b"))),
          "b", "vec_id", "embedding", cent)
        .collect().map(r => r.getAs[Long]("grp") ->
          ((r.getAs[Long]("n_vecs"), r.getAs[Double]("mean_cos")))).toMap
      assert(rep == generic)
    } finally {
      Seq("graft_ivfdr_cells", "graft_ivfdr_cent")
        .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
      spark.catalog.clearCache()
    }
  }

  test("incrementalNearDups: batch pairs against store and smaller-id batch rows only") {
    import spark.implicits._
    // store: two orthogonal unit vectors; batch: a near-dup of stored 1,
    // a new×new near-dup pair (20 ~ 21), an orthogonal novel vector,
    // and nothing pairing old×old
    val store = Seq(
      (1L, Seq(1f, 0f, 0f, 0f)), (2L, Seq(0f, 1f, 0f, 0f)))
      .toDF("vec_id", "embedding")
    val batch = Seq(
      (10L, Seq(0.99f, 0.1f, 0f, 0f)),  // ~stored 1
      (20L, Seq(0f, 0f, 0.7f, 0.7f)),   // ~21 (new×new)
      (21L, Seq(0f, 0f, 0.71f, 0.69f)),
      (30L, Seq(0f, 0f, 0f, 1f)))       // novel... cos(30, 20/21) ≈ 0.7
      .toDF("vec_id", "embedding")
    try {
      IvfIndex.build(store, "vec_id", "embedding", "graft_ivfd", nCells = 2)
      val pairs = IvfIndex.incrementalNearDups(
        batch, "vec_id", "embedding", "graft_ivfd", threshold = 0.9,
        assignProbe = 2)
        .collect()
        .map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("match_id"),
          r.getAs[Boolean]("match_is_new"))).toSet
      assert(pairs == Set((10L, 1L, false), (20L, 21L, true)))
    } finally {
      Seq("graft_ivfd_cells", "graft_ivfd_cent")
        .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
      spark.catalog.clearCache()
    }
  }

  test("PQ store: topKAdc == ivfPqTopK; codes-only scan; rerank degenerates to topK; append encodes") {
    val queries = embs.filter(col("vec_id") % 50 === 0)
    val seed = embs.filter(col("vec_id") % 3 =!= 0)
    val batch = embs.filter(col("vec_id") % 3 === 0)
    try {
      IvfIndex.build(embs, "vec_id", "embedding", "graft_ivfpq",
        nCells = 8, pq = Some(IvfIndex.PqSpec(m = 8, nCodes = 16)))
      // the store is a pure storage optimization of the in-memory
      // operator: same hash-sampled centroids AND residual books, same
      // assignment/encode/ADC arithmetic — row-for-row equal
      val viaStore = IvfIndex.topKAdc(
        queries, "vec_id", "embedding", "graft_ivfpq", k = 5, nProbe = 3)
      val inMemory = Similarity.ivfPqTopK(
        queries, embs, "vec_id", "embedding", 5, nCells = 8, nProbe = 3,
        m = 8, nCodes = 16)
      val got = resultSet(viaStore)
      assert(got == resultSet(inMemory))
      assert(got.nonEmpty)
      // the decisive memory property of the ADC serve path: the cells
      // scan projects codes, never the raw cv embedding column
      val plan = viaStore.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      val detail = plan.substring(plan.lastIndexOf("graft_ivfpq_cells"))
      val readSchema = detail.linesIterator
        .find(_.trim.startsWith("ReadSchema:"))
        .getOrElse(fail(s"no ReadSchema after cells scan:\n$detail"))
      assert(readSchema.contains("codes"), readSchema)
      assert(!readSchema.contains("cv"), s"ADC scan must not read cv: $readSchema")
      spark.catalog.clearCache()
      // IVFADC-R degeneracy: exact re-rank over the WHOLE candidate set
      // (R >= corpus) is exact ranking inside the probed cells == topK
      val n = embs.count().toInt
      assert(resultSet(IvfIndex.topKAdc(queries, "vec_id", "embedding",
          "graft_ivfpq", k = 5, nProbe = 3, rerank = n))
        == resultSet(IvfIndex.topK(queries, "vec_id", "embedding",
          "graft_ivfpq", k = 5, nProbe = 3)))
      spark.catalog.clearCache()
      // append against a PQ-built index encodes with the FROZEN books:
      // the new rows carry codes and are findable through pure ADC
      IvfIndex.build(seed, "vec_id", "embedding", "graft_ivfpq2",
        nCells = 8, pq = Some(IvfIndex.PqSpec(m = 8, nCodes = 16)))
      val pre = resultSet(IvfIndex.topKAdc(
        queries, "vec_id", "embedding", "graft_ivfpq2", k = 5, nProbe = 3))
      spark.catalog.clearCache()
      IvfIndex.append(batch, "vec_id", "embedding", "graft_ivfpq2",
        batchId = 7L)
      val appended = spark.table("graft_ivfpq2_cells")
        .filter(col("batch_id") === 7L)
      assert(appended.count() > 0)
      assert(appended.filter(col("codes").isNull).count() == 0,
        "appended rows must carry frozen-book codes")
      val post = resultSet(IvfIndex.topKAdc(
        queries, "vec_id", "embedding", "graft_ivfpq2", k = 5, nProbe = 3))
      assert(post != pre,
        "appended vectors must become findable through ADC")
      // and the rerank degeneracy still holds over the grown store
      assert(resultSet(IvfIndex.topKAdc(queries, "vec_id", "embedding",
          "graft_ivfpq2", k = 5, nProbe = 3, rerank = n))
        == resultSet(IvfIndex.topK(queries, "vec_id", "embedding",
          "graft_ivfpq2", k = 5, nProbe = 3)))
    } finally {
      Seq("graft_ivfpq_cells", "graft_ivfpq_cent", "graft_ivfpq_books",
        "graft_ivfpq2_cells", "graft_ivfpq2_cent", "graft_ivfpq2_books")
        .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
      spark.catalog.clearCache()
    }
  }

  test("quantizationDrift: OOD append flags high mean_qerr; base mean exact; requires a PQ build") {
    val seed = embs.filter(col("vec_id") % 3 =!= 0)
    try {
      IvfIndex.build(seed, "vec_id", "embedding", "graft_qd", nCells = 8,
        pq = Some(IvfIndex.PqSpec(m = 8, nCodes = 16)))
      // an ingest batch from a DIFFERENT residual geometry: scrambled
      // dimension order keeps norms (so assignment still "works") but
      // the frozen books were never trained on these residuals
      val ood = embs.filter(col("vec_id") % 3 === 0)
        .select((col("vec_id") + 1000000L).as("vec_id"),
          reverse(col("embedding")).as("embedding"))
      spark.catalog.clearCache()
      IvfIndex.append(ood, "vec_id", "embedding", "graft_qd", batchId = 3L)
      val out = IvfIndex.quantizationDrift(spark, "graft_qd")
        .collect().map(r => r.getAs[Long]("batch_id") ->
          ((r.getAs[Long]("n_vecs"), r.getAs[Double]("mean_qerr")))).toMap
      assert(out.keySet == Set(-1L, 3L))
      assert(out(3L)._2 > out(-1L)._2,
        s"OOD batch ${out(3L)._2} must flag above base ${out(-1L)._2}")
      // base mean is the exact decimal mean of per-row reconstruction
      // error — recompute one row group independently via the books
      assert(out(-1L)._2 > 0 && out(-1L)._2.isFinite)
      // a flat (non-PQ) store has no books to drift against
      IvfIndex.build(seed, "vec_id", "embedding", "graft_qd2", nCells = 8)
      intercept[IllegalArgumentException] {
        IvfIndex.quantizationDrift(spark, "graft_qd2")
      }
    } finally {
      Seq("graft_qd_cells", "graft_qd_cent", "graft_qd_books",
        "graft_qd2_cells", "graft_qd2_cent")
        .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
      spark.catalog.clearCache()
    }
  }

  test("append: frozen-centroid ingest == ivfTopK over the grown corpus; batch prunable") {
    val seed = embs.filter(col("vec_id") % 3 =!= 0)
    val batch = embs.filter(col("vec_id") % 3 === 0)
    val queries = embs.filter(col("vec_id") % 50 === 0)
    try {
      IvfIndex.build(seed, "vec_id", "embedding", "graft_ivf3", nCells = 8)
      val preAppend = resultSet(IvfIndex.topK(
        queries, "vec_id", "embedding", "graft_ivf3", k = 5, nProbe = 3))
      spark.catalog.clearCache() // caller-clears-cache before mutating
      IvfIndex.append(batch, "vec_id", "embedding", "graft_ivf3",
        batchId = 5L)
      // the semantic contract: topK over the grown store is row-for-row
      // the in-memory operator over the FULL corpus with the STORED
      // (frozen, seed-derived) centroid set
      val got = resultSet(IvfIndex.topK(
        queries, "vec_id", "embedding", "graft_ivf3", k = 5, nProbe = 3))
      val expected = resultSet(Similarity.ivfTopK(
        queries, embs, "vec_id", "embedding", 5, nCells = 8, nProbe = 3,
        centroidsOverride = Some(spark.table("graft_ivf3_cent"))))
      assert(got == expected)
      assert(got != preAppend,
        "appended vectors must actually become findable neighbors")
      // the append landed in its own partition, so a crashed caller's
      // replay can undo it: pruning restores the pre-append answers
      spark.catalog.clearCache()
      IvfIndex.pruneBatch(spark, "graft_ivf3", 5L)
      assert(resultSet(IvfIndex.topK(
        queries, "vec_id", "embedding", "graft_ivf3", k = 5, nProbe = 3))
        == preAppend)
    } finally {
      Seq("graft_ivf3_cells", "graft_ivf3_cent")
        .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
      spark.catalog.clearCache()
    }
  }

  test("binary store: topKBinary == ivfBinaryTopK; pack-only shortlist scan; append packs") {
    val queries = embs.filter(col("vec_id") % 50 === 0)
    val seed = embs.filter(col("vec_id") % 3 =!= 0)
    val batch = embs.filter(col("vec_id") % 3 === 0)
    try {
      IvfIndex.build(embs, "vec_id", "embedding", "graft_ivfbin",
        nCells = 8, binary = true)
      // storage optimization of the in-memory operator: same hash
      // centroids, same raw-residual sign packs, same shortlist and
      // re-rank order — row-for-row equal
      val viaStore = IvfIndex.topKBinary(
        queries, "vec_id", "embedding", "graft_ivfbin", k = 5,
        nProbe = 3, oversample = 4)
      val inMemory = Similarity.ivfBinaryTopK(
        queries, embs, "vec_id", "embedding", 5, nCells = 8, nProbe = 3,
        oversample = 4)
      val got = resultSet(viaStore)
      assert(got == resultSet(inMemory))
      assert(got.nonEmpty)
      // the memory property: the shortlist's cells scan projects the
      // 1-long-per-64-dims pack, never the raw cv column (cv reappears
      // only in the bounded rerank read)
      val plan = viaStore.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      val packScan = plan.linesIterator
        .filter(_.trim.startsWith("ReadSchema:"))
        .filter(_.contains("cb")).toList
      assert(packScan.nonEmpty, s"no pack-projecting cells scan:\n$plan")
      packScan.foreach(rs =>
        assert(!rs.contains("cv"), s"pack scan must not read cv: $rs"))
      spark.catalog.clearCache()
      // append against a binary-built store packs with the FROZEN
      // centroids; appended vectors become findable and the store
      // still equals the in-memory operator over the grown corpus
      // (stored centroid set passed through, frozen on the seed)
      IvfIndex.build(seed, "vec_id", "embedding", "graft_ivfbin2",
        nCells = 8, binary = true)
      IvfIndex.append(batch, "vec_id", "embedding", "graft_ivfbin2",
        batchId = 7L)
      val appended = spark.table("graft_ivfbin2_cells")
        .filter(col("batch_id") === 7L)
      assert(appended.count() > 0)
      assert(appended.filter(col("cb").isNull).count() == 0,
        "appended rows must carry frozen-centroid sign packs")
      val grownStore = resultSet(IvfIndex.topKBinary(
        queries, "vec_id", "embedding", "graft_ivfbin2", k = 5,
        nProbe = 3, oversample = 4))
      val grownInMem = resultSet(Similarity.ivfBinaryTopK(
        queries, embs, "vec_id", "embedding", 5, nProbe = 3,
        oversample = 4,
        centroidsOverride = Some(spark.table("graft_ivfbin2_cent"))))
      assert(grownStore == grownInMem)
    } finally {
      Seq("graft_ivfbin_cells", "graft_ivfbin_cent",
        "graft_ivfbin2_cells", "graft_ivfbin2_cent")
        .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
      spark.catalog.clearCache()
    }
  }
}
