package graft.tools
import graft.Sessions
import org.apache.spark.sql.functions._

object CCProbe {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local(32)
    val dir = "/root/testdata/sf0.1"
    val t0 = System.nanoTime()
    val docs = graft.Tables.df(spark, dir, "documents")
    val pairs = graft.operators.Dedup.ngramJaccardPairs(
      docs, "doc_id", "text", maxDocFreq = Some(20))
    val n = pairs.count()
    val t1 = System.nanoTime()
    println(f"PAIRS n=$n t=${(t1-t0)/1e9}%.2fs")
    val cc = graft.operators.Clusters.connectedComponents(pairs)
    val m = cc.count()
    val t2 = System.nanoTime()
    println(f"CC n=$m t=${(t2-t1)/1e9}%.2fs")
    spark.stop()
  }
}
