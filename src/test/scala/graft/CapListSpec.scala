package graft

import graft.operators.Dedup
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** CapList (expressions/CapList) invariants and the fused
  * Dedup.cappedCandidates path built on it: bounded-buffer semantics
  * (complete multiset under the cap, saturation at cap+1 over it),
  * partition-layout invariance of the kept/dropped decision, and
  * end-to-end pair-set equality between the fused long-id path and the
  * legacy generic-id self-join path it replaced.
  */
class CapListSpec extends AnyFunSuite {
  private lazy val spark = Sessions.local(8)

  private def grouped(rows: Seq[(Int, Long)], cap: Int, parts: Int) = {
    import spark.implicits._
    rows.toDF("g", "v").repartition(parts)
      .groupBy(col("g"))
      .agg(call_function("graft_caplist", col("v"), lit(cap)).as("ids"))
      .collect().map(r => r.getInt(0) -> r.getSeq[Long](1)).toMap
  }

  test("under the cap: the complete multiset survives (duplicates kept)") {
    val rows = Seq(1 -> 10L, 1 -> 20L, 1 -> 10L, 2 -> 7L)
    for (parts <- Seq(1, 5)) {
      val out = grouped(rows, cap = 4, parts)
      assert(out(1).sorted == Seq(10L, 10L, 20L))
      assert(out(2) == Seq(7L))
    }
  }

  test("over the cap: saturates at exactly cap+1 in any partition layout") {
    val rows = (1 to 50).map(i => 1 -> i.toLong)
    for (parts <- Seq(1, 3, 16)) {
      val out = grouped(rows, cap = 5, parts)
      assert(out(1).size == 6, s"expected cap+1=6, got ${out(1).size}")
    }
  }

  test("size(ids) <= cap is exactly the df-cap keep predicate") {
    val rows = (1 to 6).map(i => 1 -> i.toLong) ++  // df 6 > cap 5: drop
      (1 to 5).map(i => 2 -> i.toLong)              // df 5 <= cap 5: keep
    val out = grouped(rows, cap = 5, parts = 4)
    assert(out(1).size > 5 && out(2).size <= 5)
    assert(out(2).sorted == (1 to 5).map(_.toLong))
  }

  test("rejects non-bigint input and cap < 1") {
    import spark.implicits._
    val strs = Seq("a", "b").toDF("v")
    intercept[org.apache.spark.sql.AnalysisException] {
      strs.agg(call_function("graft_caplist", col("v"), lit(4))).collect()
    }
    intercept[Exception] {
      Seq(1L).toDF("v")
        .agg(call_function("graft_caplist", col("v"), lit(0))).collect()
    }
  }

  test("fused long-id candidates == legacy generic-id self-join, pairs and scores") {
    import spark.implicits._
    // boilerplate header shared by MOST docs pushes its shingles over
    // the cap; each near-dup pair shares rare doc-specific shingles
    val boiler = "the quick brown fox jumps over the lazy dog again"
    val docs = ((1 to 12).map { i =>
      (i.toLong, s"$boiler unique passage number $i alpha beta gamma delta run $i")
    } ++ Seq(
      (21L, "completely distinct text body one two three four five six seven"),
      (22L, "completely distinct text body one two three four five six eight")
    )).toDF("doc_id", "text")
    val cap = 3
    def pairSet(df: org.apache.spark.sql.DataFrame) =
      df.collect().map { r =>
        val a = r.get(0).toString.toLong
        val b = r.get(1).toString.toLong
        (Set(a, b), r.getAs[Int]("inter"), r.getAs[Int]("union_sz"))
      }.toSet
    val fused = pairSet(Dedup.ngramJaccardPairs(docs, "doc_id", "text",
      n = 3, num = 1, den = 10, maxDocFreq = Some(cap)))
    // string ids route through the legacy self-join fallback; pair
    // orientation may differ (string vs long ordering), so compare
    // unordered pairs
    val legacy = pairSet(Dedup.ngramJaccardPairs(
      docs.select(col("doc_id").cast("string").as("doc_id"), col("text")),
      "doc_id", "text", n = 3, num = 1, den = 10, maxDocFreq = Some(cap)))
    assert(fused.nonEmpty, "fixture should produce capped candidates")
    assert(fused == legacy)
    spark.catalog.clearCache()
  }
}
