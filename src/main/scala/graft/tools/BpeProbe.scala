package graft.tools

import graft.Sessions
import graft.operators.Corpus
import org.apache.spark.sql.functions._

/** Rounds-vs-wall ladder for BPE merge learning: the single-task loop
  * (Corpus.bpeLearnLocal — delta counts + lazy heap in one executor
  * task) against the per-round distributed loop (bpeLearnRounds — one
  * Spark job per merge round), over the same persisted word-frequency
  * table. Not driver-gated; numbers land in SCALE.md.
  *
  * Usage: runMain graft.tools.BpeProbe [sfDir] [replicas]
  * `replicas` multiplies the corpus (suffix-perturbed copies, the
  * IndexProbe convention) so the vocab table grows toward the
  * single-task gate while the text distribution stays realistic.
  */
object BpeProbe {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local(32)
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val replicas = args.lift(1).map(_.toInt).getOrElse(1)
    // optional 3rd arg: synthesize an n-word vocabulary directly
    // (md5-hex words, Zipf-ish counts) — the sf0.1 documents table
    // draws from a ~30-word pool, far below a real corpus's
    // vocabulary, so the ladder needs its own scale knob (the
    // SyntheticVectors convention)
    val synthWords = args.lift(2).map(_.toLong).getOrElse(0L)
    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"PROBE $name t=${(System.nanoTime() - t0) / 1e9}%.2fs")
      r
    }
    val vocab = (if (synthWords > 0) {
      spark.range(synthWords)
        .select(
          substring(md5(col("id").cast("string")), 1,
            4 /* + 0..8 */).as("w4"),
          col("id"))
        .select(
          concat(col("w4"), substring(md5(concat(col("id"), lit("x"))),
            lit(1), pmod(col("id"), lit(9)).cast("int"))).as("word"),
          (lit(synthWords) / (col("id") + 1) + 1).cast("long").as("cnt"))
        .groupBy(col("word")).agg(sum(col("cnt")).as("cnt"))
        .select(col("word"), col("cnt"),
          filter(split(col("word"), ""), s => s =!= "").as("syms"))
    } else {
      val docs0 = graft.Tables.df(spark, dir, "documents")
      val docs = (0 until replicas).map { k =>
        docs0.select(
          (col("doc_id") + lit(k.toLong * 1000000000L)).as("doc_id"),
          concat(col("text"), lit(s" zcopy$k marker$k")).as("text"))
      }.reduce(_ unionByName _)
      Corpus.bpeVocab(docs, "text")
    }).persist()
    val nWords = time("vocab_build")(vocab.count())
    println(s"PROBE vocab_words n=$nWords")
    try {
      // the ladder: single-task loop at growing round counts — cost
      // should be vocab-load-dominated, near-flat in rounds
      for (r <- Seq(16, 64, 256, 1024, 4096)) {
        val m = time(s"local_rounds_$r")(Corpus.bpeLearnLocal(vocab, r))
        println(s"PROBE local_rounds_$r merges=${m.size}")
      }
      // the old shape for contrast: one Spark job per round (capped —
      // the point is the per-round scheduling overhead slope)
      for (r <- Seq(16, 64, 256)) {
        val m = time(s"dist_rounds_$r")(Corpus.bpeLearnRounds(vocab, r))
        println(s"PROBE dist_rounds_$r merges=${m.size}")
        // bpeLearnRounds unpersists the frame it was handed (it
        // generation-swaps); re-pin for the next rung
        vocab.persist(); vocab.count()
      }
      // equality spot-check at the deepest shared rung
      val a = Corpus.bpeLearnLocal(vocab, 256)
      vocab.persist(); vocab.count()
      val b = Corpus.bpeLearnRounds(vocab, 256)
      println(s"PROBE paths_equal_256 ${a == b}")
    } finally {
      vocab.unpersist()
      spark.stop()
    }
  }
}
