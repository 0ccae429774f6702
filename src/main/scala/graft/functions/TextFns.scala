package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level text/hash primitives shared by the training-data pipeline
  * operators (dedup, similarity, text analysis). Everything here is a
  * composition of codegen'd built-ins — no UDFs — and every hash is
  * derived from md5 so the DuckDB oracle can reproduce values exactly
  * (`('0x' || substr(md5(s),1,8))::BIGINT` ≡ `conv(substring(md5(s),1,8),
  * 16, 10)`), keeping the whole pipeline engine-portable and
  * deterministic (no JVM hashCode, no seed drift).
  */
object TextFns {

  /** A pluggable canonical-text normalizer: every tokenizing operator
    * (shingles/dedup, BM25, BPE) threads one of these with
    * [[normText]] as the default, so an ASCII corpus keeps today's
    * exact bytes (and floors) while a multilingual corpus opts into
    * [[normTextUnicode]] at the call site — one parameter, no parallel
    * operator family. */
  type Normalizer = Column => Column

  /** Canonical text form for exact dedup: lowercase, collapse whitespace,
    * strip non [a-z0-9 ]. ASCII-only BY DESIGN — on non-Latin text every
    * char strips and the doc tokenizes to EMPTY (then fails quality
    * gates, grows no shingles, no BM25 terms). Multilingual corpora must
    * pass [[normTextUnicode]] instead; this stays the default because
    * its output (and therefore every md5-derived hash, floor, and oracle
    * in the ASCII pipeline) is byte-frozen. */
  def normText(c: Column): Column =
    trim(regexp_replace(regexp_replace(lower(c), "[^a-z0-9 ]", " "), " +", " "))

  /** Unicode canonical text form — the multilingual [[Normalizer]]:
    * Unicode-normalize (NFC by default: composed and decomposed forms of
    * the same text become the same bytes, so every md5-keyed operator
    * compares CONTENT not encoding history), lowercase, space-delimit
    * each CJK ideograph/kana (whitespace tokenization is meaningless on
    * unsegmented scripts — character unigrams are the standard fallback,
    * giving CJK text real shingles/BM25 terms/BPE words), strip
    * everything outside letters/combining marks/digits (marks KEPT:
    * stripping them shreds Devanagari/Arabic/Hebrew words, and NFC
    * cannot compose every mark), collapse whitespace.
    *
    * On pure-ASCII input this is byte-identical to [[normText]]
    * (PipelineSpec pins it over the sf0.001 corpus): ASCII letters are
    * \p{L}, digits \p{N}, NFC and lower are identity/ASCII-stable, no
    * CJK to space — so threading it through an ASCII corpus changes
    * nothing.
    *
    * Cross-engine: every step has an exact DuckDB twin
    * (nfc_normalize + lower + RE2 \p classes — p79 hash-gates the whole
    * chain). NFC rather than NFKC is the ORACLE-GATED default because
    * DuckDB exposes only NFC; NFKC (width/ligature/compatibility
    * folding) is available via `form = "NFKC"` and spec-gated on golden
    * codepoints in [[graft.expressions.UnicodeNormalize]]. Avoid relying
    * on lower() for the few LOCALE-SENSITIVE codepoints (U+0130, final
    * sigma): Java full case mapping and utf8proc's per-codepoint
    * mapping disagree there.
    */
  def normTextUnicode(c: Column, form: String = "NFC",
      cjkSpace: Boolean = true): Column =
    postNormChain(unicodeNorm(c, form), cjkSpace)

  /** The [[normTextUnicode]] steps AFTER Unicode normalization (lower →
    * optional CJK spacing → class strip → collapse) — for callers that
    * already materialized `graft_normalize` output as a column
    * ([[withLangPred]]): re-normalizing is idempotent but costs a full
    * native normalization pass per row for nothing. */
  private def postNormChain(normalized: Column, cjkSpace: Boolean): Column = {
    val low = lower(normalized)
    val spaced =
      if (cjkSpace)
        regexp_replace(low,
          "([\\p{IsHan}\\p{IsHiragana}\\p{IsKatakana}])", " $1 ")
      else low
    trim(regexp_replace(
      regexp_replace(spaced, "[^\\p{L}\\p{M}\\p{N}]", " "), " +", " "))
  }

  /** The [[normTextUnicode]] chain as a [[Normalizer]] value.
    *
    * `cjkSpace = false` keeps each unsegmented CJK run as ONE
    * whitespace token instead of char unigrams — the right input for
    * BPE training, where the char-spaced form makes every ideograph a
    * single-symbol word that no merge can ever grow (SentencePiece-
    * style subword learning needs the sequence intact); everything
    * else (shingles, BM25, langid) wants the default spacing, where a
    * token is a comparable unit across scripts. */
  def unicodeNormalizer(form: String = "NFC",
      cjkSpace: Boolean = true): Normalizer =
    c => normTextUnicode(c, form, cjkSpace)

  /** Unicode normalization via the native [[graft.expressions
    * .UnicodeNormalize]] expression (ASCII rows pass through without
    * decoding). Run BEFORE any hash-keyed operator on multilingual
    * text — composed and decomposed forms of the same text are
    * different md5 inputs otherwise. NFKC is the usual pre-hash choice
    * (also folds ligatures/width/compatibility digits). */
  def unicodeNorm(c: Column, form: String = "NFKC"): Column =
    call_function("graft_normalize", c, lit(form))

  /** Whitespace tokens, empties removed. */
  def tokens(c: Column): Column =
    filter(split(c, "\\s+"), t => length(t) > 0)

  /** Distinct word n-gram shingles over the token array. A document
    * shorter than n (but non-empty) contributes its whole token
    * sequence as one shingle; a ZERO-token document has NO shingles —
    * the unguarded window expression emits a single "" shingle for it,
    * which would make every empty/whitespace/punctuation-only doc a
    * 100%-Jaccard near-dup of every other one (and the DuckDB mirror
    * diverges: its array_to_string([]) is NULL, which list_distinct
    * silently drops). A NULL token array (NULL text) is just as
    * poisonous via a different path: size(NULL) is NULL, greatest SKIPS
    * the NULL to 0, and the window emits one NULL shingle — whose band
    * keys all hash to md5("") because concat_ws skips NULLs, pairing
    * every NULL-text doc with every other (the pre-r6 normText filter
    * masked this; the capped index was safe only because NULL join
    * keys never match). The guard is one HOF `filter` dropping both ""
    * and NULL elements, NOT a when/otherwise branch: a real shingle is
    * never "" or NULL (tokens are non-empty strings), and conditional
    * branches are excluded from codegen subexpression elimination —
    * the branched form re-evaluated the whole tokenize+shingle
    * pipeline at every downstream reference (measured 4× on the
    * minhash bench query at sf0.1). */
  def wordShingles(toks: Column, n: Int): Column =
    filter(array_distinct(
      transform(sequence(lit(0), greatest(size(toks) - n, lit(0))),
        i => array_join(slice(toks, i + 1, lit(n)), " "))),
      s => s.isNotNull && s =!= "")

  /** 32-bit deterministic hash of a string: first 8 hex digits of md5,
    * as a non-negative long in [0, 2^32). */
  def hash32(c: Column): Column =
    conv(substring(md5(c), 1, 8), 16, 10).cast("long")

  /** 60-bit deterministic hash (15 hex digits of md5) — for fingerprints
    * where 32 bits would collide at 100 TB scale. */
  def hash60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  // ---- MinHash ------------------------------------------------------------

  /** Mersenne prime 2^61 - 1. a*h+b stays < 2^62 + 2^30 (a,b < 2^30,
    * h < 2^32), so the multiply never overflows a signed 64-bit long in
    * either engine (DuckDB errors on overflow rather than wrapping). */
  val MinhashPrime: Long = 2305843009213693951L

  /** Fixed (a, b) parameters for the k MinHash permutations, generated by
    * a seeded LCG so Spark and the SQL oracle share literal constants. */
  def minhashParams(k: Int): Seq[(Long, Long)] = {
    var state = 0x5DEECE66DL
    def next(): Long = {
      state = state * 6364136223846793005L + 1442695040888963407L
      (state >>> 34) & ((1L << 30) - 1) // 30 bits
    }
    Seq.fill(k)((next() | 1L, next())) // a odd and nonzero
  }

  /** MinHash signature from PRE-HASHED shingles (`hashes` =
    * transform(shingles, hash32) materialized as its own column so md5
    * runs once per shingle, not once per permutation): element i =
    * min over hashes of (a_i * h + b_i) mod P. */
  def minhashSignature(hashes: Column, params: Seq[(Long, Long)]): Column =
    array(params.map { case (a, b) =>
      array_min(transform(hashes,
        h => (lit(a) * h + lit(b)) % lit(MinhashPrime)))
    }: _*)

  /** LSH band keys: the signature split into `bands` rows of
    * `k / bands` values each, every band md5-keyed. Equal band key ⇒
    * candidate pair. */
  def lshBandKeys(sig: Column, k: Int, bands: Int): Column = {
    val r = k / bands
    array((0 until bands).map { b =>
      struct(lit(b).as("band"),
        md5(concat_ws(",", slice(sig, b * r + 1, r))).as("key"))
    }: _*)
  }

  // ---- SimHash ------------------------------------------------------------

  /** 60-bit SimHash over PRE-HASHED tokens (`hashes` =
    * transform(tokens, hash60) materialized as its own column — the 60
    * bit-probes below reference it 120×, so it must be an attribute, not
    * an inlined expression): bit b of the result is 1 iff at least half
    * the tokens have bit b set. Near-duplicate docs differ in few bits
    * (small Hamming distance). 60 bits is the widest md5-prefix hash
    * that stays overflow-safe as a signed long in BOTH engines (DuckDB
    * errors on 1::BIGINT << 63 rather than wrapping); at corpus scale
    * the 60-bit fingerprint blocks into 4 disjoint 15-bit keys, ~2^7
    * fewer false same-block candidates per block than the 32-bit/8-bit
    * scheme. */
  def simhash60(hashes: Column): Column = {
    val nTok = size(hashes)
    (0 until 60).map { b =>
      val ones = size(filter(hashes, h => shiftright(h, b).bitwiseAND(1) === 1))
      when(ones * 2 >= nTok, lit(1L << b)).otherwise(lit(0L))
    }.reduce(_ + _)
  }

  /** Hamming distance between two simhash longs. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  // ---- language ID / quality ----------------------------------------------

  /** Tiny per-language stopword lists for the n-gram/stopword heuristic
    * language classifier. Word-boundary regex counts per language; argmax
    * wins. (Replaceable by real profiles; the operator shape — score
    * columns + greatest/argmax — is what matters.) */
  val LangProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "is", "in", "that", "for"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "zu"),
    "fr" -> Seq("le", "la", "les", "et", "est", "une", "que", "pour"),
    "es" -> Seq("el", "los", "las", "es", "una", "que", "por", "para"),
    "zh" -> Seq("de", "shi", "bu", "le", "wo", "zai", "you", "he"))

  /** Count of tokens ∈ `words` (exact matches over the token array —
    * identical semantics to the oracle's list_filter count). */
  def stopwordHits(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => t.isin(words.map(lit(_)): _*)))

  // ---- script-aware language ID ---------------------------------------

  /** The stopword profiles usable as the LATIN-script fallback of
    * [[scriptLangId]]: [[LangProfiles]] minus the romanized-pinyin "zh"
    * entry (script evidence decides CJK long before stopwords run). */
  val LatinProfiles: Seq[(String, Seq[String])] =
    LangProfiles.filterNot(_._1 == "zh")

  /** (lang, Unicode scripts) for script-aware language ID, with the
    * decision THRESHOLD num/den of the text's letter+mark chars that
    * must belong to the script. Order is the decision order: kana → ja
    * FIRST (Japanese is kanji+kana, so any kana share decides before
    * the Han rule can call it Chinese; Chinese has no kana), then the
    * single-script languages at 30%. Integer cross-multiplication keeps
    * every comparison exact in both engines. */
  val ScriptLangs: Seq[(String, Seq[String], Int, Int)] = Seq(
    ("ja", Seq("Hiragana", "Katakana"), 1, 10),
    ("zh", Seq("Han"), 3, 10),
    ("ko", Seq("Hangul"), 3, 10),
    ("ru", Seq("Cyrillic"), 3, 10),
    ("ar", Seq("Arabic"), 3, 10),
    ("hi", Seq("Devanagari"), 3, 10),
    ("el", Seq("Greek"), 3, 10))

  /** Stopword profiles for the SCRIPT languages, in the token space
    * [[normTextUnicode]] produces (CJK entries are single chars —
    * that IS the token unit after ideograph/kana spacing). Together
    * with [[LatinProfiles]] these drive language-aware quality
    * scoring: a doc's stopword ratio is only meaningful against ITS
    * language's function words — the p09 English list scores every
    * non-English doc as garbage. Languages absent here (ko/hi/el/…)
    * get the stopword gate WAIVED, not failed — no profile is not
    * evidence of low quality (the low-resource-language rule). */
  val ScriptProfiles: Seq[(String, Seq[String])] = Seq(
    "ru" -> Seq("и", "в", "не", "на", "что", "это", "с", "как"),
    "zh" -> Seq("的", "是", "不", "了", "在", "有", "我", "这"),
    "ja" -> Seq("の", "に", "は", "を", "が", "た", "で", "て"),
    "ar" -> Seq("في", "من", "على", "أن", "إلى", "عن", "مع", "هذا"))

  /** The [[LatinProfiles]] stopword argmax over PRE-MATERIALIZED
    * `s_<lang>` hit columns (materialize them in their own projection
    * first — each is referenced |langs|−1 times by the comparisons):
    * first profile whose hits are ≥ every other's wins, last profile
    * is the unconditional fallback. Shared by the batch langid queries
    * and the streaming [[graft.streaming.Streams.languageMix]]
    * monitor, so the decision can never drift between faces. */
  def latinArgmax: Column = {
    val langs = LatinProfiles.map(_._1)
    langs.init.foldRight(lit(langs.last)) { (l, rest) =>
      val beats = langs.filter(_ != l)
        .map(o => col(s"s_$l") >= col(s"s_$o")).reduce(_ && _)
      when(beats, lit(l)).otherwise(rest)
    }
  }

  /** The language-ID projection scaffold shared by the batch queries
    * (p80/p81's multiBase) and the streaming monitor
    * ([[graft.streaming.Streams.languageMix]]): carry columns + the
    * Unicode token array + the predicted language. The THREE-stage
    * projection is load-bearing, not style — `nfc`, `toks`, and each
    * `s_<lang>` hit count are materialized as attributes in their own
    * select because every one is referenced multiple times downstream
    * (the argmax reads each s_ column |langs|−1 times; scriptLangId
    * scans nfc once per script class), and an inlined copy would
    * re-run the normalizer per reference under CollapseProject — the
    * CSE trap measured on the minhash/DSIR paths. One shared builder,
    * so the batch and streaming language decisions cannot drift.
    *
    * @return df's `carry` columns + (toks: array<string>, lang_pred) */
  def withLangPred(df: org.apache.spark.sql.DataFrame, textCol: String,
      carry: Seq[String]): org.apache.spark.sql.DataFrame = {
    val keep = carry.map(col)
    val base = df
      .select(keep :+ unicodeNorm(col(textCol), "NFC").as("nfc"): _*)
      .select(keep ++ Seq(col("nfc"),
        // nfc is already normalized — run only the post-NFC steps
        tokens(postNormChain(col("nfc"), cjkSpace = true)).as("toks")): _*)
    val scored = base.select(keep ++ Seq(col("nfc"), col("toks"),
      charClassCount(col("nfc"), "\\p{L}\\p{M}").as("n_lm")) ++
      ScriptLangs.map { case (lang, scripts, _, _) =>
        charClassCount(col("nfc"),
          scripts.map(s => s"\\p{Is$s}").mkString).as(s"c_$lang")
      } ++
      LatinProfiles.map { case (l, words) =>
        stopwordHits(col("toks"), words).as(s"s_$l")
      }: _*)
    scored.select(keep ++ Seq(col("toks"),
      scriptLangIdFromCounts(latinArgmax).as("lang_pred")): _*)
  }

  /** Chars of `c` inside the Java regex character class `clsBody`
    * (codepoint count, same arithmetic as DuckDB's length − length
    * after removal — both engines count codepoints). */
  def charClassCount(c: Column, clsBody: String): Column =
    length(c) - length(regexp_replace(c, s"[$clsBody]", ""))

  /** Script-aware language ID over NFC-normalized raw text (`nfc` —
    * counts run BEFORE tokenization; punctuation never enters any
    * count): each [[ScriptLangs]] rule fires when its script's char
    * share of the letter+mark population clears the threshold, a text
    * with NO letters/marks — including NULL text, which is as
    * contentless as empty — is "und", and anything left (Latin-script
    * text) falls through to `fallback` — typically the
    * [[LatinProfiles]] stopword argmax. The whole decision is one
    * codegen'd when-chain over length-diff counts: no UDF, no explode,
    * linear scans per script class. NOTE each count expression is
    * inlined into its comparison here (conditional branches are
    * excluded from codegen CSE, so a document is re-scanned per
    * branch); the production path is [[withLangPred]], which
    * MATERIALIZES the counts as attributes first and decides via
    * [[scriptLangIdFromCounts]] — use this direct form only for
    * one-off column expressions. */
  def scriptLangId(nfc: Column, fallback: Column): Column = {
    val nLm = charClassCount(nfc, "\\p{L}\\p{M}")
    val chain = ScriptLangs.foldRight(fallback) {
      case ((lang, scripts, num, den), rest) =>
        val cnt = charClassCount(nfc,
          scripts.map(s => s"\\p{Is$s}").mkString)
        when(cnt * den >= nLm * num, lit(lang)).otherwise(rest)
    }
    when(nLm.isNull || nLm === 0, lit("und")).otherwise(chain)
  }

  /** The [[scriptLangId]] decision over PRE-MATERIALIZED count columns
    * `n_lm` and `c_<lang>` (see [[withLangPred]] — each count is an
    * attribute, so every branch compares two ints instead of
    * re-scanning the document). */
  def scriptLangIdFromCounts(fallback: Column): Column = {
    val chain = ScriptLangs.foldRight(fallback) {
      case ((lang, _, num, den), rest) =>
        when(col(s"c_$lang") * den >= col("n_lm") * num, lit(lang))
          .otherwise(rest)
    }
    when(col("n_lm").isNull || col("n_lm") === 0, lit("und"))
      .otherwise(chain)
  }
}
