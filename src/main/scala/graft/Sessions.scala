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
