package graft.tools

import graft.Sessions
import graft.operators.Dedup
import org.apache.spark.sql.functions._

/** Measured MinHash-LSH recall vs the exact-Jaccard baseline — the
  * text-dedup twin of [[RecallProbe]]. Precision is 1.0 by
  * construction (minhashLshPairs exact-verifies every candidate), so
  * the only quality dimension the banding parameters trade is RECALL:
  * a true pair whose signatures never collide in any band is lost
  * before the verify stage. The banding S-curve says near-threshold
  * pairs are exactly where the loss concentrates, so recall is
  * reported per true-Jaccard bucket, not just overall. Not
  * driver-gated; numbers land in SCALE.md. */
object MinhashRecallProbe {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local(32)
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val docs = graft.Tables.df(spark, dir, "documents")
    val n = 5; val num = 7; val den = 10 // the p02/p03 threshold: 0.7
    def key(ida: Long, idb: Long) = (ida, idb)
    val exact = Dedup.ngramJaccardPairs(docs, "doc_id", "text", n, num, den)
      .collect()
      .map(r => key(r.getAs[Long]("ida"), r.getAs[Long]("idb")) ->
        (r.getAs[Number]("inter").doubleValue
          / r.getAs[Number]("union_sz").doubleValue))
      .toMap
    // RecallProbe's discipline: an empty baseline would make every
    // recall below 0/0 = NaN — a meaningless measurement that could be
    // pasted into SCALE.md. Fail loudly instead.
    require(exact.nonEmpty,
      s"no exact-Jaccard pairs at tau=$num/$den in $dir — wrong dir/SF?")
    println(s"PROBE exact_pairs n=${exact.size}")
    val buckets = Seq((0.7, 0.8), (0.8, 0.9), (0.9, 1.01))
    for ((k, bands) <- Seq((32, 4), (32, 8), (32, 16), (64, 8), (64, 16))) {
      val got = Dedup.minhashLshPairs(docs, "doc_id", "text", n, k, bands,
          num, den)
        .collect()
        .map(r => key(r.getAs[Long]("ida"), r.getAs[Long]("idb"))).toSet
      val miss = exact.keySet -- got
      val perBucket = buckets.map { case (lo, hi) =>
        val in = exact.filter { case (_, j) => j >= lo && j < hi }.keySet
        val r = if (in.isEmpty) Double.NaN
          else (in & got).size.toDouble / in.size
        f"[$lo%.1f,${math.min(hi, 1.0)}%.1f${if (hi > 1.0) "]" else ")"}=" +
          (if (r.isNaN) "n/a" else f"$r%.2f") + s"(${in.size})"
      }.mkString(" ")
      println(f"PROBE lsh_k${k}_bands$bands recall=" +
        f"${(exact.size - miss.size).toDouble / exact.size}%.3f " +
        s"missed=${miss.size} byJaccard: $perBucket")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
