package graft

import graft.functions.TextFns
import graft.operators.{Clusters, Ranges}
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property-based invariants over the text/hash primitives and the
  * operators whose correctness arguments are algebraic (idempotence,
  * path-independence, brute-force equivalence) rather than
  * fixture-specific. Spark round-trips are batched per property (one
  * job over a generated table, not one per sample) to keep the suite
  * fast.
  */
class PropertySpec extends AnyFunSuite {
  private lazy val spark = Sessions.local(8)

  /** seeded sampling — the suite is a CI gate, so generated inputs are
    * deterministic run-to-run (and .get never sees a None) */
  private def sample[A](g: Gen[A], seed: Long): A =
    g.apply(Gen.Parameters.default, Seed(seed)).get

  private val rawText: Gen[String] =
    Gen.listOf(Gen.frequency(
      8 -> Gen.alphaNumChar, 3 -> Gen.const(' '), 1 -> Gen.oneOf("!?.,;:@#$%\t\n")
    )).map(_.mkString)

  test("normText is idempotent and emits only [a-z0-9 ] singly-spaced") {
    import spark.implicits._
    val samples = sample(Gen.listOfN(200, rawText), 1L)
    val df = samples.toDF("t")
      .select(TextFns.normText(col("t")).as("n1"))
      .select(col("n1"), TextFns.normText(col("n1")).as("n2"))
      .collect()
    df.foreach { r =>
      val (n1, n2) = (r.getString(0), r.getString(1))
      assert(n1 == n2, s"not idempotent: '$n1' -> '$n2'")
      assert(n1.matches("|[a-z0-9]+( [a-z0-9]+)*"), s"bad alphabet: '$n1'")
    }
  }

  test("hardNegatives: margin is monotone (larger margin ⊆ smaller), never returns self/positives, rank contiguous") {
    import graft.operators.Similarity
    import spark.implicits._
    // seeded random geometry: any fixture-independent violation of the
    // gate algebra shows up here, not just on hand-planted vectors
    val vecs = sample(Gen.listOfN(40,
      Gen.listOfN(6, Gen.choose(-5, 5))), 7L)
      .zipWithIndex.map { case (v, i) =>
        (i.toLong, v.map(_.toDouble).toArray) }
      .filter(_._2.exists(_ != 0.0))
    val corpus = vecs.toDF("vec_id", "embedding")
    val ids = vecs.map(_._1)
    val pairs = ids.filter(_ % 7 == 0).flatMap(q =>
      ids.find(p => p != q).map(p => (q, p))).toDF("query_id", "pos_id")
    // k larger than the corpus: margin-monotonicity (tight ⊆ loose) is
    // a PRE-truncation property — under a small k the gate removing a
    // high-cos candidate legitimately pulls a new lower-cos one into
    // the top-k, so the subset claim is only algebra when k doesn't cut
    def run(m: Double) = Similarity.hardNegatives(pairs, corpus,
      "vec_id", "embedding", k = 1000, margin = m).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    val loose = run(0.0)
    val tight = run(0.3)
    val posByQ = pairs.collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    for (out <- Seq(loose, tight); (q, rows) <- out.groupBy(_._1)) {
      // never self, never a positive of that query
      assert(rows.forall(_._3 != q))
      assert(rows.forall(r => !posByQ(q).contains(r._3)))
      // ranks are 1..n with no holes
      assert(rows.map(_._2).sorted.sameElements(1 to rows.length))
    }
    // a larger margin can only REMOVE candidates, and a survivor's
    // rank can only improve (the ordering above it is a subsequence)
    val looseSet = loose.map(r => (r._1, r._3)).toSet
    assert(tight.forall(r => looseSet.contains((r._1, r._3))))
    val looseRank = loose.map(r => (r._1, r._3) -> r._2).toMap
    assert(tight.forall(r => r._2 <= looseRank((r._1, r._3))))
  }

  test("clusterBalancedSample: output is a per-cluster prefix — raising k only extends, never reorders") {
    import graft.operators.Similarity
    import spark.implicits._
    val vecs = sample(Gen.listOfN(60,
      Gen.listOfN(5, Gen.choose(-4, 4))), 11L)
      .zipWithIndex.map { case (v, i) =>
        (i.toLong, v.map(_.toDouble).toArray) }
      .filter(_._2.exists(_ != 0.0))
    val corpus = vecs.toDF("vec_id", "embedding")
    def run(k: Int) = Similarity.clusterBalancedSample(corpus, "vec_id",
      "embedding", nCells = 6, k = k).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val k3 = run(3); val k6 = run(6)
    // quota respected, and the k=3 sample is EXACTLY the rnk<=3 prefix
    // of the k=6 sample (hash-order determinism: no reshuffling as the
    // quota grows — eval sets stay stable under re-curation)
    assert(k3.groupBy(_._1).values.forall(_.size <= 3))
    assert(k3 == k6.filter(_._3 <= 3))
  }

  test("dsirWeights: every target-vocabulary doc outranks every source-only doc on random balanced corpora") {
    import graft.operators.Corpus
    import spark.implicits._
    // the semantic contract: weights ORDER docs by target-likeness.
    // (Exact replication-invariance is NOT a property — the +1
    // smoothing shifts by different amounts per bucket when counts
    // scale, so near-tied docs may swap; what must hold is the
    // separation between clearly-target and clearly-source docs.)
    val tvocab = Seq("alpha", "beta", "gamma", "delta")
    val svocab = Seq("zulu", "yankee", "xray", "whiskey")
    def gen(vocab: Seq[String], seed: Long) =
      sample(Gen.listOfN(15, Gen.listOfN(8, Gen.oneOf(vocab))
        .map(_.mkString(" "))), seed)
    val tDocs = gen(tvocab, 13L)
    val sDocs = gen(svocab, 17L)
    val docs = (tDocs ++ sDocs).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val target = gen(tvocab, 19L).zipWithIndex
      .map { case (t, i) => (100L + i, t) }.toDF("doc_id", "text")
    val w = Corpus.dsirWeights(docs, target, "doc_id", "text", 128)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val tW = tDocs.indices.map(i => w(i.toLong))
    val sW = sDocs.indices.map(i => w((tDocs.size + i).toLong))
    assert(tW.min > sW.max,
      s"target-vocab min ${tW.min} must exceed source-only max ${sW.max}")
  }

  test("NULL-text docs shingle to empty, never pair: LSH and exact paths both clean") {
    import graft.operators.Dedup
    import spark.implicits._
    // regression: NULL text used to shingle to [NULL] (size(NULL)=NULL,
    // greatest SKIPS the null to 0, the window emits one NULL slot) and
    // every NULL-text doc LSH-paired with every other at inter=1/union=1
    // because concat_ws skips NULLs in the band keys
    // 4 and 5 are verbatim copies: Jaccard 1 ⇒ identical signatures ⇒
    // the pair is GUARANTEED through every band, so the positive case
    // can't flake on band-collision luck
    val d = Seq[(Long, String)](
      (1L, null), (2L, null), (3L, null),
      (4L, "one real document with enough words to form shingles here"),
      (5L, "one real document with enough words to form shingles here"))
      .toDF("doc_id", "text")
    val sh = Dedup.shingleDocs(d, "doc_id", "text", 5).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        r.getAs[scala.collection.Seq[String]]("shingles")).toMap
    assert(sh(1L).isEmpty && sh(2L).isEmpty, "NULL text must have no shingles")
    assert(sh(4L).nonEmpty)
    val lsh = Dedup.minhashLshPairs(d, "doc_id", "text")
      .select("ida", "idb").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(!lsh.exists { case (a, b) => a <= 3 || b <= 3 },
      s"NULL-text docs must never pair: $lsh")
    assert(lsh == Set((4L, 5L)), s"the real near-dup pair must survive: $lsh")
    val exact = Dedup.ngramJaccardPairs(d, "doc_id", "text",
        maxDocFreq = Some(20))
      .select("ida", "idb").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact == Set((4L, 5L)))
  }

  test("wordShingles: distinct, each shingle has exactly n tokens") {
    import spark.implicits._
    val n = 3
    val samples = sample(Gen.listOfN(100, rawText), 2L)
    val rows = samples.toDF("t")
      .select(TextFns.tokens(TextFns.normText(col("t"))).as("toks"))
      .select(col("toks"), TextFns.wordShingles(col("toks"), n).as("sh"))
      .collect()
    rows.foreach { r =>
      val toks = r.getSeq[String](0)
      val sh = r.getSeq[String](1)
      assert(sh.distinct.size == sh.size)
      if (toks.size >= n)
        sh.foreach(s => assert(s.split(" ").length == n, s"'$s'"))
    }
  }

  test("hash60 stays in [0, 2^60) and agrees with a JVM reimplementation") {
    import spark.implicits._
    val samples = sample(Gen.listOfN(200, rawText), 3L).distinct
    val rows = samples.toDF("t")
      .select(col("t"), TextFns.hash60(col("t")).as("h")).collect()
    val md = java.security.MessageDigest.getInstance("MD5")
    rows.foreach { r =>
      val h = r.getLong(1)
      assert(h >= 0 && h < (1L << 60))
      val hex = md.digest(r.getString(0).getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(15)
      assert(h == java.lang.Long.parseLong(hex, 16))
    }
  }

  test("connected components: both paths equal brute force on random graphs") {
    import spark.implicits._
    // brute-force closure via repeated relabeling over the edge list
    def bruteCC(edges: Seq[(Long, Long)]): Map[Long, Long] = {
      val label = scala.collection.mutable.Map[Long, Long]()
      edges.foreach { case (a, b) =>
        label.getOrElseUpdate(a, a); label.getOrElseUpdate(b, b)
      }
      var changed = true
      while (changed) {
        changed = false
        edges.foreach { case (a, b) =>
          val m = math.min(label(a), label(b))
          if (label(a) != m) { label(a) = m; changed = true }
          if (label(b) != m) { label(b) = m; changed = true }
        }
      }
      label.toMap
    }
    val genEdges = Gen.listOfN(60,
      Gen.zip(Gen.choose(0L, 40L), Gen.choose(0L, 40L))).map(_.filter(e => e._1 != e._2))
    // a handful of generated graphs, each checked against brute force on
    // both the union-find and the distributed path
    (1 to 4).foreach { i =>
      val edges = sample(genEdges, 100L + i)
      if (edges.nonEmpty) {
        val expected = bruteCC(edges)
        val df = edges.toDF("ida", "idb")
        val small = Clusters.connectedComponents(df)
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        val dist = Clusters.connectedComponents(df, smallGraphEdges = 0L)
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        assert(small == expected)
        assert(dist == expected)
      }
    }
  }

  test("bandStats equals aggregated bandPairs on random integer values") {
    import spark.implicits._
    val genVals = Gen.listOfN(50, Gen.choose(0L, 60L))
    (1 to 3).foreach { i =>
      val vals = sample(genVals, 200L + i).zipWithIndex
        .map { case (v, i) => (i.toLong, v) }
      val df = vals.toDF("id", "v")
      val viaPairs = Ranges.bandPairs(df, "id", "v", 7.0)
        .groupBy(col("ida"))
        .agg(count(lit(1)).as("n"), sum(col("vb")).as("s"),
          min(col("idb")).as("m"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3))).toSet
      val viaStats = Ranges.bandStats(df, "id", "v", 7.0)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3))).toSet
      assert(viaStats == viaPairs)
    }
  }

  test("resampleLocf equals brute-force LOCF on random event series") {
    import spark.implicits._
    val gen = Gen.listOfN(60,
      Gen.zip(Gen.choose(0, 3), Gen.choose(0L, 500000L), Gen.choose(0, 999)))
    (1 to 3).foreach { i =>
      // distinct (key, ts): the operator's documented uniqueness
      // precondition (tie payloads are otherwise arbitrary both ways)
      val rows = sample(gen, 300L + i)
        .map { case (k, s, v) => (s"k$k", s, v.toDouble) }
        .distinctBy(r => (r._1, r._2))
      val df = rows.toDF("k", "es", "v")
        .select(col("k"), timestamp_seconds(col("es")).as("ts"), col("v"))
      val step = 50000L
      val got = Ranges.resampleLocf(df, "k", "ts", Seq("v"), step)
        .collect().map(r => (r.getString(0),
          r.getAs[java.sql.Timestamp](1).getTime / 1000,
          r.getAs[Double]("locf_v"))).toSet
      // brute force: per key, slots ceil(min)..floor(max) aligned to
      // step; LOCF = value of the max ts <= slot
      val expected = rows.groupBy(_._1).flatMap { case (k, rs) =>
        val lo = rs.map(_._2).min; val hi = rs.map(_._2).max
        val s0 = (lo + step - 1) / step * step
        val s1 = hi / step * step
        (s0 to s1 by step).map { slot =>
          val (_, ts, v) = rs.filter(_._2 <= slot).maxBy(_._2)
          (k, slot, v)
        }
      }.toSet
      assert(got == expected, s"seed ${300 + i}")
    }
  }

  test("piiRedact is idempotent on arbitrary text (placeholders never re-match)") {
    import graft.operators.Corpus
    import spark.implicits._
    // random text salted with real PII shapes so the property isn't
    // vacuous on alphanumeric noise
    val pii = Gen.oneOf("a@b.io", "ops@example.com", "10.0.0.1",
      "+1 555 123 4567", "<EMAIL>", "")
    val salted = for { t <- rawText; x <- pii; u <- pii }
      yield s"$t $x middle $u"
    val samples = sample(Gen.listOfN(200, salted), 7L)
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }
    val once = Corpus.piiRedact(samples.toDF("doc_id", "text"),
      "doc_id", "text")
    // redact the REDACTED text: counts must be zero and the hash stable
    // (placeholders contain no digits or @, so no pattern can re-fire —
    // the property that makes the scrub safe to re-run over a partially
    // scrubbed corpus)
    val redactedTexts = samples.toDF("doc_id", "text")
      .select(col("doc_id"),
        regexp_replace(regexp_replace(regexp_replace(col("text"),
          Corpus.EmailPat, "<EMAIL>"), Corpus.Ipv4Pat, "<IP>"),
          Corpus.PhonePat, "<PHONE>").as("text"))
    val twice = Corpus.piiRedact(redactedTexts, "doc_id", "text")
    val h1 = once.select("doc_id", "redacted_hash").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val again = twice.collect()
    again.foreach { r =>
      assert(r.getAs[Long]("n_emails") == 0
        && r.getAs[Long]("n_ips") == 0 && r.getAs[Long]("n_phones") == 0,
        s"re-scrub found PII in already-redacted doc ${r.getAs[Long]("doc_id")}")
      assert(r.getAs[String]("redacted_hash") == h1(r.getAs[Long]("doc_id")),
        "re-scrub changed already-redacted text")
    }
  }

  test("lmBigramScore: probabilities in (0,1], repetitive text scores higher") {
    import graft.operators.Corpus
    import spark.implicits._
    val docs = (1L to 40L).map { i =>
      if (i <= 20) (i, "spam ham " * 10 + "spam") // pure repetition
      else (i, s"doc$i unique tokens ${i * 7} zx$i qq${i % 13} end$i")
    } :+ (99L, "solo") :+ (100L, "") // 1-token and 0-token edge docs
    val out = Corpus.lmBigramScore(docs.toDF("doc_id", "text"),
        "doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_bigrams"),
          Option(r.getAs[java.lang.Double]("avg_p")).map(_.toDouble))))
      .toMap
    // every doc accounted for; short docs have no bigrams and NULL avg
    assert(out.size == docs.size)
    assert(out(99L) == ((0L, None)) && out(100L) == ((0L, None)))
    // self-scoring: every probability is a ratio of positive counts
    out.values.foreach { case (_, avg) =>
      avg.foreach(a => assert(a > 0.0 && a <= 1.0, s"avg_p out of range: $a"))
    }
    // the repeated-template docs must outscore every unique-prose doc —
    // the ordering that makes this usable as a repetitiveness filter
    val rep = (1L to 20L).map(out(_)._2.get).min
    val prose = (21L to 40L).map(out(_)._2.get).max
    assert(rep > prose, s"repetitive $rep !> prose $prose")
  }

  test("bpeEncode preserves characters: concat(tokens) == concat(normalized words), any corpus, any depth") {
    import graft.operators.Corpus
    import spark.implicits._
    (1 to 3).foreach { i =>
      val texts = sample(Gen.listOfN(60, rawText), 600L + i)
      val docs = texts.zipWithIndex
        .map { case (t, j) => (j.toLong, t) }.toDF("doc_id", "text")
      val merges = Corpus.bpeLearn(docs, "doc_id", "text", 5 * i)
      val streams = Corpus.bpeEncode(docs, "doc_id", "text", merges)
        .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
      val norm = docs
        .select(col("doc_id"), TextFns.normText(col("text")).as("n"))
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      norm.foreach { case (id, n) =>
        val expect = n.replace(" ", "")
        val got = streams.get(id).map(_.mkString).getOrElse("")
        // merging fuses symbols; it can never create or lose a char
        assert(got == expect, s"doc $id: '$got' != '$expect'")
      }
    }
  }

  test("quantileTrim survivors are a subset; widening the band is monotone; [0,1] keeps every scored row") {
    import graft.operators.Corpus
    import spark.implicits._
    (1 to 3).foreach { i =>
      val vals = sample(Gen.listOfN(80,
        Gen.choose(-1000, 1000)), 700L + i)
      val rows = vals.zipWithIndex.map { case (v, j) =>
        (j.toLong, s"g${j % 3}", v.toDouble) }.toDF("id", "src", "v")
      def kept(lo: Double, hi: Double) =
        Corpus.quantileTrim(rows, "src", "id", "v", 1, lo, hi)
          .collect().map(_.getLong(0)).toSet
      val narrow = kept(0.25, 0.75)
      val wide = kept(0.1, 0.9)
      val all = kept(0.0, 1.0)
      assert(narrow.subsetOf(wide) && wide.subsetOf(all))
      assert(all.size == vals.length,
        "the full band with sampleMod=1 must keep every scored row")
    }
  }

  test("hammingNearDupPairs: capped results are a subset of uncapped at every cap") {
    import graft.operators.Dedup
    import spark.implicits._
    (1 to 3).foreach { i =>
      val hs = sample(Gen.listOfN(60,
        Gen.choose(Long.MinValue, Long.MaxValue)), 800L + i)
      val df = hs.zipWithIndex.map { case (h, j) => (j.toLong, h) }
        .toDF("id", "h")
      def pairs(cap: Long) =
        Dedup.hammingNearDupPairs(df, "id", "h", maxHamming = 8,
          maxKeyFreq = cap)
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val un = pairs(0L)
      Seq(1L, 3L, 10L).foreach { c =>
        assert(pairs(c).subsetOf(un), s"cap $c added pairs")
      }
      assert(pairs(60L) == un,
        "a cap above every key frequency must change nothing")
    }
  }

  test("splitStats partitions any corpus for any strictly-increasing cuts") {
    import spark.implicits._
    val genIds = Gen.listOfN(120, Gen.choose(Long.MinValue, Long.MaxValue))
    val genCuts = Gen.chooseNum(1, 3).flatMap(n =>
      Gen.pick(n, 1 to 99).map(_.sorted.toList))
    (1 to 3).foreach { i =>
      val ids = sample(genIds, 400L + i).distinct
      val cutUbs = sample(genCuts, 500L + i) :+ 100
      val cuts = cutUbs.zipWithIndex.map { case (ub, j) => s"s$j" -> ub }
      val df = ids.map(id => (id, s"doc $id")).toDF("doc_id", "text")
      val out = graft.operators.Corpus.splitStats(df, "doc_id", "text", cuts)
        .collect().map(r => r.getAs[String]("split") -> r.getAs[Long]("n_docs"))
      // a partition: every doc in exactly one split, only known names
      assert(out.map(_._2).sum == ids.length)
      assert(out.map(_._1).toSet.subsetOf(cuts.map(_._1).toSet))
      // determinism: assignment is a pure function of the id
      val again = graft.operators.Corpus.splitStats(df, "doc_id", "text", cuts)
        .collect().map(r => r.getAs[String]("split") -> r.getAs[Long]("n_docs"))
      assert(out.toMap == again.toMap)
    }
  }
}
