package graft.tools

import graft.Sessions
import graft.operators.{Dedup, IvfIndex, ShingleIndex, Similarity}
import org.apache.spark.sql.functions._

/** Profiling main for the persisted-index paths vs their in-memory
  * twins: per-ingest cost of ShingleIndex.incrementalPairs vs
  * re-shingling the corpus, and per-query-batch cost of IvfIndex.topK
  * vs re-assigning the corpus. Not driver-gated; numbers land in
  * SCALE.md. */
object IndexProbe {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local(32)
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    // optional corpus replication factor: the crossover experiment —
    // the batch stays fixed while the corpus grows, which is exactly
    // the regime the persisted index exists for (per-copy texts are
    // perturbed with a unique suffix token so shingle df distributions
    // stay copy-local instead of multiplying under the df cap)
    val replicas = args.lift(1).map(_.toInt).getOrElse(1)
    val docs = graft.Tables.df(spark, dir, "documents")
    val embs = graft.Tables.df(spark, dir, "embeddings")
    val base = docs.filter(col("doc_id") % 10 =!= 0)
    val old = (0 until replicas).map { k =>
      base.select((col("doc_id") + lit(k.toLong * 1000000000L)).as("doc_id"),
        concat(col("text"), lit(s" zcopy$k marker$k")).as("text"))
    }.reduce(_ unionByName _)
    val batch = docs.filter(col("doc_id") % 10 === 0)
      .select(col("doc_id"), col("text"))
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"PROBE $name n=$n t=${(System.nanoTime() - t0) / 1e9}%.2fs")
      spark.catalog.clearCache()
    }
    try {
      time("shingle_index_build") {
        ShingleIndex.build(old, "doc_id", "text", "graft_probe"); 0L
      }
      for (i <- 1 to 2) time(s"ingest_indexed_$i") {
        ShingleIndex.incrementalPairs(batch, "doc_id", "text",
          "graft_probe").count()
      }
      for (i <- 1 to 2) time(s"ingest_inmemory_$i") {
        Dedup.incrementalNearDupPairs(old, batch, "doc_id", "text").count()
      }
      // optional 3rd arg: replace the (post-regeneration: 2000-row)
      // embeddings table with a synthetic clustered corpus of this
      // size, so the store-vs-recompute gap is measurable at a scale
      // where there is a corpus-side term to amortize. Queries stay a
      // fixed 200 either way — the per-batch shape under test.
      val ivfCorpus = args.lift(2).map(_.toInt).filter(_ > 0)
        .map(n => SyntheticVectors.clustered(spark, n)
          .persist())
        .getOrElse(embs)
      val qMod = math.max(1L, ivfCorpus.count() / 200L)
      val queries = ivfCorpus.filter(col("vec_id") % qMod === 0)
      time("ivf_index_build") {
        IvfIndex.build(ivfCorpus, "vec_id", "embedding", "graft_probe_ivf"); 0L
      }
      for (i <- 1 to 2) time(s"ann_indexed_$i") {
        IvfIndex.topK(queries, "vec_id", "embedding", "graft_probe_ivf",
          k = 5).count()
      }
      for (i <- 1 to 2) time(s"ann_inmemory_$i") {
        Similarity.ivfTopK(queries, ivfCorpus, "vec_id", "embedding", 5)
          .count()
      }
      // the ADC serve path vs the flat store at the same scale: same
      // probed cells, but the scan reads m ints per candidate instead
      // of the d-double vector + norm (plus IVFADC-R's bounded exact
      // fetch on top)
      time("ivfpq_store_build") {
        IvfIndex.build(ivfCorpus, "vec_id", "embedding", "graft_probe_adc",
          pq = Some(IvfIndex.PqSpec())); 0L
      }
      for (i <- 1 to 2) time(s"ann_store_adc_$i") {
        IvfIndex.topKAdc(queries, "vec_id", "embedding", "graft_probe_adc",
          k = 5).count()
      }
      for (i <- 1 to 2) time(s"ann_store_adc_rerank50_$i") {
        IvfIndex.topKAdc(queries, "vec_id", "embedding", "graft_probe_adc",
          k = 5, rerank = 50).count()
      }
      // the 1-bit serve path: the shortlist scan reads ONE long per 64
      // dims (vs m ints for ADC, d doubles for flat) + the bounded
      // exact rerank — the cheapest candidate bytes of any tier
      time("binary_store_build") {
        IvfIndex.build(ivfCorpus, "vec_id", "embedding", "graft_probe_bin",
          binary = true); 0L
      }
      for (i <- 1 to 2) time(s"ann_store_binary_$i") {
        IvfIndex.topKBinary(queries, "vec_id", "embedding",
          "graft_probe_bin", k = 5).count()
      }
    } finally Seq("graft_probe_idx", "graft_probe_sh", "graft_probe_meta",
      "graft_probe_ivf_cells", "graft_probe_ivf_cent",
      "graft_probe_adc_cells", "graft_probe_adc_cent",
      "graft_probe_adc_books",
      "graft_probe_bin_cells", "graft_probe_bin_cent")
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    spark.stop()
  }
}
