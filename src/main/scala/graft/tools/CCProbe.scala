package graft.tools
import graft.Sessions
import org.apache.spark.sql.functions._

/** Profiling main for the dedup pair pipeline + connected components
  * in isolation (Profile.scala times whole gated queries; this splits
  * pair generation from clustering). Not driver-gated. */
object CCProbe {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local(32)
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val docs = graft.Tables.df(spark, dir, "documents")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"PROBE $name n=$n t=${(System.nanoTime() - t0) / 1e9}%.2fs")
      spark.catalog.clearCache()
    }
    time("warmup") { docs.count() }
    time("pairs") {
      graft.operators.Dedup.ngramJaccardPairs(docs, "doc_id", "text",
        maxDocFreq = Some(20)).count()
    }
    time("pairs_plus_cc") {
      graft.operators.Clusters.connectedComponents(
        graft.operators.Dedup.ngramJaccardPairs(docs, "doc_id", "text",
          maxDocFreq = Some(20))).count()
    }
    spark.stop()
  }
}
