package graft

import graft.operators.Corpus
import graft.operators.Corpus.BpeMerge
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantics tests for BPE merge learning and encoding on planted
  * vocabularies where every round's winning pair and every fold result
  * is hand-checkable. Value parity at corpus scale is the oracle gate's
  * job (p68/p68b); these pin the algorithmic contract: frequency-
  * weighted pair counts, lexicographic tie-breaks, greedy left-to-right
  * non-overlapping merge application, early stop, and the
  * vocabulary-scale encode join.
  */
class BpeSpec extends AnyFunSuite {
  private lazy val spark = Sessions.local(4)
  import spark.implicits._

  private def docsOf(texts: String*) =
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")

  test("learned merges: frequency-weighted argmax per round, early stop when no pair remains") {
    // vocab: "ab" x3 (two docs), "cd" x1 → round 1 fuses (a,b) w=3,
    // round 2 fuses (c,d) w=1, round 3 finds nothing and stops early
    val docs = docsOf("ab ab cd", "ab")
    val merges = Corpus.bpeLearn(docs, "doc_id", "text", rounds = 3)
    assert(merges == Seq(BpeMerge(1, "a", "b", 3L), BpeMerge(2, "c", "d", 1L)))
  }

  test("greedy left-to-right application: aaaa -> (aa)(aa), aaa -> (aa)(a)") {
    // "aaaa": pairs (a,a) x3 → merge (a,a). Greedy non-overlapping
    // application leaves [aa, aa]; round 2's best pair is then (aa,aa).
    val m1 = Corpus.bpeLearn(docsOf("aaaa"), "doc_id", "text", 2)
    assert(m1 == Seq(BpeMerge(1, "a", "a", 3L), BpeMerge(2, "aa", "aa", 1L)))
    // "aaa": [aa, a] after round 1 → round 2 fuses (aa, a)
    val m2 = Corpus.bpeLearn(docsOf("aaa"), "doc_id", "text", 2)
    assert(m2 == Seq(BpeMerge(1, "a", "a", 2L), BpeMerge(2, "aa", "a", 1L)))
  }

  test("tie-break: equal counts resolve lexicographically on (lft, rgt)") {
    // "ba" and "ab" each once: pairs (a,b) x1 and (b,a) x1 → (a,b) wins
    val merges = Corpus.bpeLearn(docsOf("ba ab"), "doc_id", "text", 1)
    assert(merges == Seq(BpeMerge(1, "a", "b", 1L)))
  }

  test("single-character vocabulary learns nothing") {
    assert(Corpus.bpeLearn(docsOf("a b a", "c"), "doc_id", "text", 3).isEmpty)
  }

  test("encode: per-doc word/token counts under the learned merges; fold runs per distinct word") {
    val docs = docsOf("abab abab cd", "ab q")
    // round 1: (a,b) w=5 [abab x2 contributes 2 each? no: abab has
    // pairs (a,b),(b,a),(a,b) → (a,b) x2 per occurrence, x2 occurrences
    // = 4, plus "ab" x1 = 5]; round 2: (ab,ab) w=2
    val merges = Corpus.bpeLearn(docs, "doc_id", "text", 2)
    assert(merges == Seq(BpeMerge(1, "a", "b", 5L), BpeMerge(2, "ab", "ab", 2L)))
    val counts = Corpus.bpeTokenCounts(docs, "doc_id", "text", merges)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // doc 0: abab→[abab](1) x2, cd→[c,d](2): 3 words, 4 tokens
    // doc 1: ab→[ab](1), q→[q](1): 2 words, 2 tokens
    assert(counts == Map(0L -> ((3L, 4L)), 1L -> ((2L, 2L))))
  }

  test("encode stream: tokens in word order, per-word fold order, layout invariant") {
    val docs = docsOf("abab cd ab", "xy")
    val merges = Corpus.bpeLearn(docs, "doc_id", "text", 2)
    // round 1 fuses (a,b) w=3; round 2: remaining pairs (ab,ab) w=1,
    // (c,d) w=1, (x,y) w=1 → tie-break lex → (ab,ab)
    assert(merges.map(m => (m.lft, m.rgt)) == Seq(("a", "b"), ("ab", "ab")))
    def streams(df: org.apache.spark.sql.DataFrame) =
      Corpus.bpeEncode(df, "doc_id", "text", merges)
        .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toList).toMap
    val got = streams(docs)
    assert(got == Map(
      0L -> List("abab", "c", "d", "ab"),
      1L -> List("x", "y")))
    // token STREAM length ≡ the count operator's n_tokens
    val counts = Corpus.bpeTokenCounts(docs, "doc_id", "text", merges)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got.map { case (k, v) => k -> v.size.toLong } == counts)
    assert(streams(docs.repartition(7)) == got)
  }

  test("no merges: token count equals character count per word") {
    val counts = Corpus.bpeTokenCounts(docsOf("abc de"), "doc_id", "text", Nil)
      .collect().map(r => (r.getLong(1), r.getLong(2))).head
    assert(counts == ((2L, 5L)))
  }

  test("determinism: merges are partition-layout invariant") {
    val docs = docsOf("abab abab cd", "ab q", "zz zz yx")
    val a = Corpus.bpeLearn(docs.repartition(1), "doc_id", "text", 3)
    val b = Corpus.bpeLearn(docs.repartition(7), "doc_id", "text", 3)
    assert(a.nonEmpty && a == b)
  }

  test("single-task and distributed loops learn identical merges, deep into the tail") {
    // a corpus rich enough that the merge sequence exercises ties,
    // multi-char winners, overlapping repeats, and early exhaustion —
    // the two paths must agree merge-for-merge including counts
    val docs = docsOf(
      "the theme thermometer then there anthem",
      "banana bandana ban bananas and sandbars in the sand",
      "aaa aaaa aaaaa abab ababab ba ab",
      "mississippi missive misfit kiss hiss missed",
      "zz zzz yx yx yx qq")
    val vocab = Corpus.bpeVocab(docs, "text").persist()
    try {
      vocab.count()
      // deep enough that both loops hit the no-pair-left early stop;
      // a checkpoint dir routes the distributed loop through its
      // RELIABLE per-round checkpoint branch (the cluster path)
      val ckptBase = java.nio.file.Files.createTempDirectory("graft_bpe_ckpt")
      spark.sparkContext.setCheckpointDir(ckptBase.toString)
      val local = Corpus.bpeLearnLocal(vocab, 200)
      val dist = Corpus.bpeLearnRounds(vocab, 200)
      assert(local.nonEmpty && local.size < 200,
        s"expected early exhaustion, got ${local.size} merges")
      assert(local == dist)
      // housekeeping contract: each round deletes its predecessor's
      // reliable checkpoint once the successor materializes, and the
      // final one dies with the loop — no vocabulary-scale rdd-* dirs
      // may survive the call (cleanCheckpoints is off by default, so
      // nothing else would ever collect them)
      val leftover = java.nio.file.Files.walk(ckptBase).iterator()
      val rdds = scala.jdk.CollectionConverters.IteratorHasAsScala(leftover)
        .asScala.filter(_.getFileName.toString.startsWith("rdd-")).toList
      assert(rdds.isEmpty, s"leaked checkpoints: $rdds")
    } finally { vocab.unpersist(); () }
  }

  test("single-task gates: word count and symbol MASS each force the distributed path") {
    // 3 distinct words but huge total symbol mass relative to a tiny
    // injected mass gate → must refuse >256 rounds (the distributed
    // loop's cap), proving the routing looked at Σ|syms|, not just the
    // distinct count; same corpus under real gates runs single-task
    val docs = docsOf("abcdefghij abcdefghij klmnopqrst uvwxyzabcd")
    val norm = graft.functions.TextFns.normText _
    val byMass = intercept[IllegalArgumentException] {
      Corpus.bpeLearnGated(docs, "text", rounds = 300, norm,
        maxWords = 1000000L, maxMass = 5L)
    }
    assert(byMass.getMessage.contains("single-task gate"))
    val byWords = intercept[IllegalArgumentException] {
      Corpus.bpeLearnGated(docs, "text", rounds = 300, norm,
        maxWords = 2L, maxMass = 1000000L)
    }
    assert(byWords.getMessage.contains("single-task gate"))
    // inside both gates: the 300-round ask is legal single-task work
    val m = Corpus.bpeLearnGated(docs, "text", rounds = 300, norm,
      maxWords = 1000000L, maxMass = 1000000L)
    assert(m.nonEmpty)
    // and the small gates still learn the SAME merges when the round
    // count is distributed-legal — routing must never change semantics
    val dist = Corpus.bpeLearnGated(docs, "text", rounds = 20, norm,
      maxWords = 2L, maxMass = 1000000L)
    assert(dist == m.take(dist.size))
  }

  test("unicode normalizer: CJK corpus learns real merges, local and distributed agree") {
    import graft.functions.TextFns
    // unsegmented CJK under the Unicode normalizer becomes char-unigram
    // words; BPE then re-fuses frequent adjacencies... of single-char
    // words there are none, so ALSO give it katakana-free Cyrillic words
    // whose multi-char tokens carry pairs — and pin that the ASCII
    // normalizer would have destroyed all of it (zero vocab, no merges)
    val docs = docsOf("это тест это тест это", "причёска причём причём")
    val norm: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
      TextFns.unicodeNormalizer()
    val vocab = Corpus.bpeVocab(docs, "text", norm).persist()
    try {
      vocab.count()
      val local = Corpus.bpeLearnLocal(vocab, 50)
      val dist = Corpus.bpeLearnRounds(vocab, 50)
      assert(local == dist)
      assert(local.nonEmpty)
      // round 1 must fuse the dominant Cyrillic pair: "причём" x2 +
      // "причёска" x1 share п-р-и-ч-ё prefix pairs (weight 3 each);
      // "это" x3 + "тест" x2 give (э,т)=3, (т,о)=3, (т,е)=2, (е,с)=2,
      // (с,т)=2 — so the top count is 3 with a lexicographic tie-break
      assert(local.head.cnt == 3L)
    } finally { vocab.unpersist(); () }
    // the ASCII normalizer on the same corpus: every doc normalizes to
    // empty → empty vocabulary → zero merges (the exact silent-death
    // mode the Unicode path exists to prevent)
    assert(Corpus.bpeLearn(docs, "doc_id", "text", 5).isEmpty)
  }

  test("CJK BPE: cjkSpace=false keeps ideograph runs as words so merges can grow multi-char tokens") {
    import graft.functions.TextFns
    // 测试 appears 3x inside longer runs; under the DEFAULT char
    // spacing every ideograph is a one-symbol word and NOTHING can
    // merge — the no-spacing normalizer keeps runs intact, so round 1
    // fuses the dominant adjacent pair
    val docs = docsOf("这是测试文档", "测试内容", "进行测试")
    val spacedNorm = TextFns.unicodeNormalizer()
    val runNorm = TextFns.unicodeNormalizer(cjkSpace = false)
    assert(Corpus.bpeLearn(docs, "doc_id", "text", 5, spacedNorm).isEmpty,
      "char-spaced CJK words are single symbols — no merges expected")
    val merges = Corpus.bpeLearn(docs, "doc_id", "text", 5, runNorm)
    assert(merges.nonEmpty)
    assert(merges.head == Corpus.BpeMerge(1, "测", "试", 3L),
      s"got ${merges.head}")
    // and the encode side tokenizes with the learned subwords: 测试
    // becomes ONE token inside each run
    val enc = Corpus.bpeEncode(docs, "doc_id", "text",
        merges.take(1), runNorm)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        r.getSeq[String](1)).toMap
    assert(enc(1L).contains("测试"), s"got ${enc(1L)}")
  }

  test("rounds beyond the old per-round-job cap run through the single-task loop") {
    // 300 rounds was a hard require before; under the gate it is one
    // executor task — exhaustion stops it long before 300
    val m = Corpus.bpeLearn(docsOf("abcd abcd xy"), "doc_id", "text", 300)
    assert(m.map(_.rnd) == (1 to m.size) && m.size < 300 && m.nonEmpty)
  }
}
