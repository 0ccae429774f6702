package graft.tools

import graft.Sessions
import org.apache.spark.sql.functions._

/** Accuracy/size ladder for the graft_kll quantile sketch: observed
  * max rank error and serialized-state size across k, on 1M values in
  * benign and adversarial insertion orders, under a multi-partition
  * merge tree — the empirical companion to KllSpec's hard n·L/k bound.
  * Usage: runMain graft.tools.KllProbe [n]
  */
object KllProbe {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local(32)
    import spark.implicits._
    val n = args.headOption.map(_.toInt).getOrElse(1000000)
    val probs = Seq(0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99)
    val dists: Seq[(String, org.apache.spark.sql.DataFrame)] = Seq(
      ("hashed", spark.range(n)
        .select(pmod(xxhash64(col("id")), lit(16777213L))
          .cast("double").as("x"))),
      ("ascending", spark.range(n).select(col("id").cast("double").as("x"))))
    for ((dname, df0) <- dists; k <- Seq(64, 256, 1024, 4096)) {
      val df = df0.repartition(32).persist()
      df.count()
      val t0 = System.nanoTime()
      val got = df.agg(call_function("graft_kll",
          col("x") +: lit(k) +: probs.map(lit): _*).as("q"))
        .collect().head.getSeq[Double](0)
      val dt = (System.nanoTime() - t0) / 1e9
      val sorted = df.orderBy(col("x")).select(col("x"))
        .collect().map(_.getDouble(0))
      val errs = probs.zip(got).map { case (p, v) =>
        val lo = sorted.count(_ < v)
        val hi = sorted.count(_ <= v)
        val target = math.max(1L, math.ceil(p * n).toLong)
        val e = if (target < lo) lo - target
                else if (target > hi) target - hi else 0L
        e.toDouble / n
      }
      // serialized state: ~k doubles per level, L levels
      val levels = math.ceil(math.log(n.toDouble / k) / math.log(2.0)).toInt
      println(f"PROBE kll d=$dname k=$k t=$dt%.2fs maxRelErr=${errs.max}%.5f " +
        f"hardBound=${levels.toDouble / k}%.5f stateBytes<=${8 * k * (levels + 1)}")
      df.unpersist()
    }
    spark.stop()
  }
}
