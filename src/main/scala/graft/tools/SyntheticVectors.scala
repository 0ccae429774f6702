package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic CLUSTERED embedding corpus shared by the probes:
  * `n` 64-dim vectors around `centers` hash-derived anchor points with
  * hash-derived per-vector noise — a Gaussian-mixture stand-in with
  * zero RNG (same hash-everything discipline as the operators, so
  * probe runs reproduce exactly). The driver's synthetic embeddings
  * are uniform random — IVF's worst case — and (post-regeneration)
  * only 2000 rows; this corpus gives the probes cluster structure AND
  * a controllable size, the two axes the real table can't move on.
  * `spread` scales noise relative to the anchor grid: small spread =
  * tight clusters. */
object SyntheticVectors {
  def clustered(spark: SparkSession, n: Int, centers: Int = 20,
      spread: Double = 0.25): DataFrame = {
    import graft.functions.TextFns.hash32
    val u = (s: org.apache.spark.sql.Column) =>
      hash32(s).cast("double") / lit(4294967296.0) - lit(0.5) // [-0.5,0.5)
    spark.range(n.toLong).select(col("id").as("vec_id"),
      transform(sequence(lit(0), lit(63)), d =>
        (u(concat(lit("c"), pmod(col("id"), lit(centers)), lit("_"), d))
          + u(concat(lit("v"), col("id"), lit("_"), d)) * lit(spread))
          .cast("float")).as("embedding"))
  }
}
