package graft.tools
import graft.Sessions
object ShingleProbe {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local(4)
    val df = graft.SparkEntry.queries("p02_ngram_jaccard")(spark, "/tmp/fuzz/d1")
    val rows = df.collect()
    println(s"P02 rows=${rows.length}")
    rows.take(8).foreach(r => println(s"P02 $r"))
    spark.stop()
  }
}
