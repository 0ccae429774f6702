package graft

import graft.operators.Dedup
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** [[Dedup.repeatedSpanDedup]] vs an independent brute-force substring
  * model: enumerate every w-gram BY STRING (no hashing), count global
  * occurrences, mark covered token positions, and read maximal runs
  * straight off the coverage bitmap. The operator's seed-merge window
  * must reproduce exactly that — including self-repeats inside one
  * doc, adjacent-span merging, and the kept-text reassembly hash. */
class RepeatedSpansSpec extends AnyFunSuite {
  private lazy val spark = Sessions.local(4)
  private val W = 5

  private def norm(s: String): Vector[String] =
    s.toLowerCase.replaceAll("[^a-z0-9 ]", " ").replaceAll(" +", " ")
      .trim.split("\\s+").filter(_.nonEmpty).toVector

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** (n_tokens, covered, n_runs, max_run_len, kept_hash) per doc. */
  private def brute(docs: Seq[(Long, String)], w: Int)
      : Map[Long, (Long, Long, Long, Int, String)] = {
    val toks = docs.map { case (id, t) => id -> norm(t) }
    val counts = scala.collection.mutable.Map[Seq[String], Int]()
      .withDefaultValue(0)
    for ((_, tk) <- toks; i <- 0 to tk.length - w if tk.length >= w)
      counts(tk.slice(i, i + w)) += 1
    toks.map { case (id, tk) =>
      val covered = Array.fill(tk.length)(false)
      for (i <- 0 to tk.length - w if tk.length >= w
          if counts(tk.slice(i, i + w)) >= 2; j <- i until i + w)
        covered(j) = true
      // maximal intervals straight off the bitmap
      val runs = scala.collection.mutable.ListBuffer[(Int, Int)]()
      var i = 0
      while (i < covered.length) {
        if (covered(i)) {
          var j = i
          while (j + 1 < covered.length && covered(j + 1)) j += 1
          runs += ((i, j)); i = j + 1
        } else i += 1
      }
      val kept = tk.indices.filterNot(covered).map(tk).mkString(" ")
      id -> ((tk.length.toLong, covered.count(identity).toLong,
        runs.length.toLong,
        if (runs.isEmpty) 0 else runs.map(r => r._2 - r._1 + 1).max,
        md5hex(kept)))
    }.toMap
  }

  private def viaOperator(docs: Seq[(Long, String)], w: Int)
      : Map[Long, (Long, Long, Long, Int, String)] = {
    import spark.implicits._
    Dedup.repeatedSpanDedup(docs.toDF("doc_id", "text"), "doc_id", "text", w)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_tokens"), r.getAs[Long]("covered_tokens"),
          r.getAs[Long]("n_runs"), r.getAs[Int]("max_run_len"),
          r.getAs[String]("kept_text_hash")))).toMap
  }

  test("operator == brute-force substring model on planted fixtures") {
    val shared = "the quick brown fox jumps over the lazy sleeping dog today"
    val inner = "one two three four five six"
    val docs = Seq(
      // cross-doc repeat: an 11-token sentence inside different contexts
      1L -> s"alpha beta $shared gamma delta epsilon zeta",
      2L -> s"unrelated words precede here $shared and trail afterwards",
      // self-repeat INSIDE one doc (suffix-array semantics: total
      // occurrences, not distinct docs)
      3L -> s"start $inner middle padding words $inner finish",
      // shorter than w: untouchable
      4L -> "tiny doc",
      // empty after normalization
      5L -> "!!! ???",
      // two shared spans ADJACENT in this doc must merge into one run
      6L -> s"$shared $inner",
      7L -> s"prefix $shared suffix",
      8L -> s"$inner tail words here")
    val expect = brute(docs, W)
    val got = viaOperator(docs, W)
    assert(got == expect)
    // the fixtures actually exercise the machinery
    assert(expect(1L)._2 > 0, "cross-doc repeat must be found")
    assert(expect(3L)._2 > 0, "self-repeat must be found")
    assert(expect(4L)._2 == 0)
    assert(expect(6L)._3 == 1L, "adjacent spans must merge into one run")
  }

  test("variable length: longer shared spans merge into longer runs, not more runs") {
    // doc 2 shares 3 overlapping w-grams with doc 1 => one run of w+2
    val span = "a1 a2 a3 a4 a5 a6 a7" // 7 tokens, w=5 => 3 seed positions
    val docs = Seq(1L -> s"x y $span z", 2L -> s"p q r $span s t")
    val got = viaOperator(docs, W)
    assert(got(1L)._4 == 7, got(1L))
    assert(got(1L)._3 == 1L)
    assert(got == brute(docs, W))
  }

  test("property: operator == brute force on random small-vocab corpora") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    // a 12-word vocabulary makes repeated trigrams arise NATURALLY in
    // random text (cross-doc, self-repeats, overlapping merges) rather
    // than only where a fixture planted them; seeded so CI reproduces
    def sample[A](g: Gen[A], seed: Long): A =
      g.apply(Gen.Parameters.default, Seed(seed)).get
    val vocab = Vector("ash", "birch", "cedar", "dusk", "elm", "fern",
      "glade", "heath", "iris", "juniper", "kelp", "larch")
    val doc = Gen.chooseNum(0, 30)
      .flatMap(n => Gen.listOfN(n, Gen.oneOf(vocab)).map(_.mkString(" ")))
    for (round <- 1 to 4) {
      val docs = sample(Gen.listOfN(12, doc), 100L + round)
        .zipWithIndex.map { case (t, i) => (i.toLong, t) }
      val got = viaOperator(docs, w = 3)
      val expect = brute(docs, w = 3)
      assert(got == expect, s"round $round diverged on corpus: $docs")
      assert(expect.values.exists(_._2 > 0),
        s"round $round generated no repeats — vocabulary too wide for the property to bite")
    }
  }

  test("NULL text hashes like the empty doc, matching the SQL oracle") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(StructField("doc_id", LongType, false),
      StructField("text", StringType, true)))
    val df = spark.createDataFrame(java.util.Arrays.asList(
      Row(1L, null), Row(2L, ""), Row(3L, "real words here")), schema)
    val out = Dedup.repeatedSpanDedup(df, "doc_id", "text", W)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        r.getAs[String]("kept_text_hash")).toMap
    // the oracle's md5(COALESCE(kept, '')) yields md5('') for both the
    // NULL and the empty doc — Spark must agree, not produce NULL
    assert(out(1L) == md5hex(""), out(1L))
    assert(out(2L) == md5hex(""))
    assert(out(3L) == md5hex("real words here"))
  }

  test("fixture corpus: planted near-dups yield real spans at default width") {
    val docs = Tables.df(spark, "/root/testdata/sf0.001", "documents")
    val out = Dedup.repeatedSpanDedup(docs, "doc_id", "text")
    val n = out.filter(col("covered_tokens") > 0).count()
    assert(n > 0, "sf0.001 planted near-dups should share 10-token spans")
    // untouched docs hash to their normalized text (reassembly sanity)
    val clean = out.filter(col("covered_tokens") === 0).limit(1)
      .join(docs.select(col("doc_id"),
        md5(concat_ws(" ", graft.functions.TextFns.tokens(
          graft.functions.TextFns.normText(col("text"))))).as("expect")),
        "doc_id")
      .collect()
    clean.foreach(r =>
      assert(r.getAs[String]("kept_text_hash") == r.getAs[String]("expect")))
  }
}
