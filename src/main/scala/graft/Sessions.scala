package graft

import org.apache.spark.sql.SparkSession

/** Shared SparkSession construction so every entry point (Verify, Bench,
  * tests, library users) gets the same scale-oriented defaults. */
object Sessions {
  def builder(master: String, shufflePartitions: Int): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      // explode()-inferred size(...)>0 filters get pushed below the
      // repartition WITH the generator expression fully inlined — for
      // array-building lambdas over tokenized text that re-evaluates the
      // tokenizer per element on the pre-shuffle (single-file = single
      // core) side (30s vs 2s on the bigram pipeline). The filter is
      // redundant for our generators: explode of an empty array yields
      // no rows anyway.
      .config("spark.sql.optimizer.excludedRules",
        "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate")
      .config("spark.ui.enabled", "false")
      // the driver's events table carries parquet TIMESTAMP(NANOS);
      // read it as long and normalize in Tables.df.
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")

  def local(cpus: Int): SparkSession = {
    val s = builder(s"local[$cpus]", math.max(cpus, 4)).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
