package graft.tools

import graft.{Sessions, Tables}
import graft.operators.Similarity
import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Row-level diff of the incremental mmrRerank vs the previous
  * groupBy-over-all-picks form, at sf0.01. */
object MmrDiff {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.01")
    val spark = Sessions.local(8)
    import spark.implicits._
    val emb = Tables.df(spark, sfDir, "embeddings")
    val queries = emb.filter(col("vec_id") % 50 === 0)
    val poolK = 15; val k = 10; val lambda = 0.5

    def dot(a: Column, b: Column): Column =
      call_function("graft_dot", a.cast("array<double>"),
        b.cast("array<double>"))
    def withNorm(df: DataFrame, idCol: String, vecCol: String,
        id: String, vec: String): DataFrame =
      df.select(col(idCol).as(id), col(vecCol).cast("array<double>").as(vec),
        sqrt(dot(col(vecCol), col(vecCol))).as(s"${vec}_n"))
        .filter(col(s"${vec}_n") > 0)

    // ---- OLD algorithm, verbatim -------------------------------------
    val q = withNorm(queries, "vec_id", "embedding", "query_id", "qv")
    val c = withNorm(emb, "vec_id", "embedding", "item_id", "cv")
      .repartition(8, col("item_id"))
    val wRel = Window.partitionBy(col("query_id"))
      .orderBy(col("rel").desc, col("item_id"))
    val short = c.join(broadcast(q), col("query_id") =!= col("item_id"))
      .select(col("query_id"), col("item_id"),
        (dot(col("qv"), col("cv")) / (col("qv_n") * col("cv_n"))).as("rel"),
        col("cv"), col("cv_n"))
      .withColumn("r0", row_number().over(wRel))
      .filter(col("r0") <= poolK).drop("r0").persist()
    val lam = lit(lambda); val oneMinusLam = lit(1.0 - lambda)
    def pickTop(cands: DataFrame, rnk: Int): DataFrame = {
      val w = Window.partitionBy(col("query_id"))
        .orderBy(col("mmr").desc, col("item_id"))
      cands.select(col("query_id"), col("item_id"),
          (lam * col("rel") - oneMinusLam * col("msim")).as("mmr"),
          col("cv"), col("cv_n"))
        .withColumn("r", row_number().over(w)).filter(col("r") === 1)
        .select(col("query_id"), lit(rnk).as("rnk"), col("item_id"),
          col("mmr"), col("cv"), col("cv_n"))
    }
    val firstPick = pickTop(short.withColumn("msim", lit(0.0)), 1)
    val selected = (2 to k).foldLeft(firstPick) { (sel, i) =>
      val rem = short.join(sel.select(col("query_id"), col("item_id")),
        Seq("query_id", "item_id"), "left_anti")
      val ms = rem
        .join(sel.select(col("query_id"), col("cv").as("sv"),
          col("cv_n").as("sv_n")), Seq("query_id"))
        .groupBy(col("query_id"), col("item_id"))
        .agg(max(col("rel")).as("rel"),
          max(dot(col("cv"), col("sv")) / (col("cv_n") * col("sv_n")))
            .as("msim"),
          first(col("cv")).as("cv"), max(col("cv_n")).as("cv_n"))
      sel.unionByName(pickTop(ms, i)).localCheckpoint()
    }
    val oldOut = selected
      .select(col("query_id"), col("rnk"), col("item_id"), col("mmr"))
      .collect().map(r =>
        (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet

    val newOut = Similarity.mmrRerank(queries, emb, "vec_id", "embedding",
        poolK, k, lambda)
      .collect().map(r =>
        (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet

    println("OLD n=" + oldOut.size + " NEW n=" + newOut.size)
    val onlyOld = (oldOut -- newOut).toSeq.sorted
    val onlyNew = (newOut -- oldOut).toSeq.sorted
    println("only-old (up to 12): " + onlyOld.take(12).mkString(" "))
    println("only-new (up to 12): " + onlyNew.take(12).mkString(" "))
    spark.stop()
  }
}
