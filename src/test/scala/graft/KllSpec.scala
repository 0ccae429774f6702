package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** KLL quantile sketch (expressions/KllSketch) invariants: exactness
  * below k, the hard n·L/k rank-error bound under every partition
  * layout (merge path) on benign AND adversarial input orders, repeat
  * determinism (no RNG), null/NaN handling, the SQL surface, and the
  * streaming windowed operator.
  */
class KllSpec extends AnyFunSuite {
  private lazy val spark = Sessions.local(8)

  private def sketch(df: org.apache.spark.sql.DataFrame,
      k: Int, probs: Seq[Double]): Seq[Double] =
    df.agg(call_function("graft_kll",
        col("x").cast("double") +: lit(k) +: probs.map(lit): _*).as("q"))
      .collect().head.getSeq[Double](0)

  test("below k the sketch is exact: quantiles are true order statistics") {
    import spark.implicits._
    // 50 values into k=64: level 0 never compacts
    val vals = (1 to 50).map(_.toDouble)
    val df = vals.toDF("x").repartition(7)
    val got = sketch(df, 64, Seq(0.0, 0.5, 0.9, 1.0))
    // rank rule: smallest value with cumWeight >= ceil(p*50)
    assert(got == Seq(1.0, 25.0, 45.0, 50.0))
  }

  test("rank-error bound holds on every distribution and partition layout; repeats are deterministic") {
    import spark.implicits._
    val n = 50000
    val k = 256
    val levels = math.ceil(math.log(n.toDouble / k) / math.log(2.0))
    val hardBound = n * levels / k // the documented worst case
    val probs = Seq(0.01, 0.25, 0.5, 0.75, 0.9, 0.99)
    // benign, adversarial-sorted, reverse-sorted, heavy-tied
    val dists: Seq[(String, Seq[Double])] = Seq(
      ("hashed", (1 to n).map(i =>
        (i * 0x9e3779b97f4a7c15L % 1000003L).toDouble)),
      ("ascending", (1 to n).map(_.toDouble)),
      ("descending", (n to 1 by -1).map(_.toDouble)),
      ("tied", (1 to n).map(i => (i % 17).toDouble)))
    for ((dname, vals) <- dists; parts <- Seq(1, 13)) {
      val sorted = vals.sorted
      val got = sketch(vals.toDF("x").repartition(parts), k, probs)
      probs.zip(got).foreach { case (p, v) =>
        // exact rank window of the returned value in the input
        val lo = sorted.count(_ < v) // rank of first occurrence
        val hi = sorted.count(_ <= v) // rank of last occurrence
        val target = math.max(1, math.ceil(p * n).toInt)
        val err =
          if (target < lo) lo - target
          else if (target > hi) target - hi
          else 0
        assert(err <= hardBound,
          s"$dname parts=$parts p=$p v=$v rank window [$lo,$hi] " +
            s"target $target err $err > bound $hardBound")
        // empirical: alternating parity keeps real error far tighter
        assert(err <= 0.03 * n,
          s"$dname parts=$parts p=$p err $err > 3% of n")
      }
      // determinism: same data, same layout, same bits — no RNG
      val again = sketch(vals.toDF("x").repartition(parts), k, probs)
      assert(got == again)
    }
  }

  test("nulls and NaNs are skipped; an all-null group evaluates to null") {
    import spark.implicits._
    val df = Seq[Option[Double]](Some(1.0), None, Some(Double.NaN),
      Some(3.0), Some(2.0)).toDF("x")
    assert(sketch(df, 64, Seq(0.5)) == Seq(2.0))
    val allNull = Seq[Option[Double]](None, None).toDF("x")
    val r = allNull.agg(call_function("graft_kll",
      col("x").cast("double"), lit(64), lit(0.5)).as("q")).collect().head
    assert(r.isNullAt(0))
  }

  test("SQL surface with grouped partial aggregation") {
    import spark.implicits._
    (1 to 1000).map(i => (i % 2, i.toDouble)).toDF("g", "x")
      .createOrReplaceTempView("kll_in")
    // natural SQL literals: bare 0.5 parses as DECIMAL and 1 as an
    // integer — the builder must accept every numeric spelling
    val rows = spark.sql(
      "SELECT g, graft_kll(x, 64, 0.5, 1) AS q " +
        "FROM kll_in GROUP BY g ORDER BY g").collect()
    // group 0: evens 2..1000 (500 values), group 1: odds 1..999
    val q0 = rows(0).getSeq[Double](1)
    val q1 = rows(1).getSeq[Double](1)
    assert(q0.last == 1000.0 && q1.last == 999.0) // p=1 is the exact max
    assert(math.abs(q0.head - 500.0) <= 100 && math.abs(q1.head - 499.0) <= 100)
  }

  test("streaming windowed quantiles: bounded sketch state in the store, exact below k per window") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    def ts(minute: Int) =
      new java.sql.Timestamp(3600L * 1000 * 24 + minute * 60000L)
    val in = MemoryStream[(Long, java.sql.Timestamp, String, String, Double)]
    val events = in.toDF()
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val q = graft.streaming.Streams
      .windowedQuantiles(events, "value", Seq(0.5, 1.0),
        window_ = "10 minutes", watermark = "20 minutes", k = 64)
      .writeStream.format("memory").queryName("kll_win")
      .outputMode("update").start()
    try {
      // window [0,10): values 1..9; window [10,20): values 10,20,30
      // plus one NaN row the sketch skips — n_events reports the SKETCH
      // POPULATION (3), not the raw row count (4): a count that
      // includes rows the quantiles never saw would overstate the
      // population the quantiles describe
      in.addData((1 to 9).map(i =>
        (i.toLong, ts(i), s"u$i", "click", i.toDouble)): _*)
      in.addData(Seq((10L, ts(11), "u1", "click", 10.0),
        (11L, ts(12), "u2", "click", 20.0),
        (12L, ts(13), "u3", "click", 30.0),
        (13L, ts(14), "u4", "click", Double.NaN)): _*)
      q.processAllAvailable()
      val out = spark.table("kll_win")
        .select(col("window_start"), col("quantiles"), col("n_events"))
        .collect()
        .map(r => (r.getTimestamp(0), r.getSeq[Double](1), r.getLong(2)))
        .sortBy(_._1.getTime)
      assert(out.map(_._3).toSeq == Seq(9L, 3L))
      assert(out(0)._2 == Seq(5.0, 9.0)) // exact below k
      assert(out(1)._2 == Seq(20.0, 30.0))
    } finally { q.stop() }
  }
}
