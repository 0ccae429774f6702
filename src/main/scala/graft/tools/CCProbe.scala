package graft.tools
import graft.Sessions
import graft.functions.TextFns
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scratch profiling main for the dedup pipelines (not driver-gated). */
object CCProbe {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local(32)
    val dir = "/root/testdata/sf0.1"
    val docs = graft.Tables.df(spark, dir, "documents")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"PROBE $name n=$n t=${(System.nanoTime() - t0) / 1e9}%.2fs")
      spark.catalog.clearCache()
    }
    def current(): Long =
      graft.operators.Dedup.ngramJaccardPairs(docs, "doc_id", "text",
        maxDocFreq = Some(20)).count()
    def windowdf(): Long = {
      val sh = graft.operators.Dedup.shingleDocs(docs, "doc_id", "text", 5).persist()
      val hinv = sh.select(col("doc_id"),
        explode(transform(col("shingles"), s => TextFns.hash60(s))).as("s"))
      val invf = hinv
        .withColumn("df", count(lit(1)).over(Window.partitionBy(col("s"))))
        .filter(col("df") <= 20)
        .select(col("doc_id"), col("s"))
      val cand = invf.as("a")
        .join(invf.as("b"),
          col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("ida"), col("b.doc_id").as("idb"))
        .distinct()
      cand
        .join(sh.select(col("doc_id").as("ida"), col("shingles").as("sha")), "ida")
        .join(sh.select(col("doc_id").as("idb"), col("shingles").as("shb")), "idb")
        .withColumn("inter", size(array_intersect(col("sha"), col("shb"))))
        .withColumn("union_sz", size(col("sha")) + size(col("shb")) - col("inter"))
        .filter(col("inter") * 10 >= col("union_sz") * 7)
        .count()
    }

    def antidf(): Long = {
      val sh = graft.operators.Dedup.shingleDocs(docs, "doc_id", "text", 5).persist()
      val hinv = sh.select(col("doc_id"),
        explode(transform(col("shingles"), s => TextFns.hash60(s))).as("s"))
      val common = hinv.groupBy(col("s")).agg(count(lit(1)).as("df"))
        .filter(col("df") > 20).select(col("s"))
      val invf = hinv.join(common, Seq("s"), "left_anti")
      val cand = invf.as("a")
        .join(invf.as("b"),
          col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("ida"), col("b.doc_id").as("idb"))
        .distinct()
      cand
        .join(sh.select(col("doc_id").as("ida"), col("shingles").as("sha")), "ida")
        .join(sh.select(col("doc_id").as("idb"), col("shingles").as("shb")), "idb")
        .withColumn("inter", size(array_intersect(col("sha"), col("shb"))))
        .withColumn("union_sz", size(col("sha")) + size(col("shb")) - col("inter"))
        .filter(col("inter") * 10 >= col("union_sz") * 7)
        .count()
    }
    time("warmup") { docs.count() }
    time("current_a") { current() }
    time("window_a") { windowdf() }
    time("current_b") { current() }
    time("window_b") { windowdf() }
    time("anti_a") { antidf() }
    time("current_c") { current() }
    time("anti_b") { antidf() }
    time("window_c") { windowdf() }
    time("anti_c") { antidf() }
    spark.stop()
  }
}
