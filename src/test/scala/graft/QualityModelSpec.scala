package graft

import graft.operators.Similarity
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The learned quality classifier's contract: the lowered scorer (pure
  * codegen projection) is FAITHFUL to spark.ml's own transform,
  * training is deterministic, and inference carries no ml stage, no
  * shuffle, and the codegen dot product. */
class QualityModelSpec extends AnyFunSuite {
  private lazy val spark = Sessions.local(8)
  private val sf = "/root/testdata/sf0.001"
  private def embs = Tables.df(spark, sf, "embeddings")

  test("lowered scorer ≡ spark.ml transform; deterministic; separable data classify perfectly") {
    import org.apache.spark.ml.classification.LogisticRegression
    import org.apache.spark.ml.functions.{array_to_vector, vector_to_array}
    // realistic inputs: the fixture embeddings, binary target label<5
    val labeled = embs.select(col("vec_id"),
      col("embedding"), (col("label") < 5).cast("int").as("y"))
    val model = Similarity.trainLogistic(labeled, "embedding", "y")
    assert(model.coefficients.size == 64)
    // faithfulness: our projection reproduces spark.ml's probability
    // column on the same rows (same L-BFGS fit: same data, same params)
    val feats = labeled.select(col("vec_id"),
      array_to_vector(col("embedding").cast("array<double>")).as("features"),
      col("y").cast("double").as("label"))
    val mlModel = new LogisticRegression().setMaxIter(50).setRegParam(0.0)
      .fit(feats)
    val mlProbs = mlModel.transform(feats)
      .select(col("vec_id"),
        element_at(vector_to_array(col("probability")), 2).as("p_ml"))
    val ours = labeled.select(col("vec_id"),
      Similarity.logisticScore(model, col("embedding")).as("p"))
    val joined = ours.join(mlProbs, "vec_id")
      .select(abs(col("p") - col("p_ml")).as("d")).agg(max(col("d")))
      .head().getDouble(0)
    assert(joined < 1e-9, s"lowered scorer drifts from spark.ml by $joined")
    // determinism: L-BFGS has no RNG — refit yields identical weights
    val again = Similarity.trainLogistic(labeled, "embedding", "y")
    assert(again == model)
    // scorer plan: pure projection — graft_dot present, no Exchange, no
    // ml stage anywhere
    val plan = ours.queryExecution.executedPlan.toString
    assert(plan.contains("graft_dot"), plan.take(400))
    assert(!plan.contains("Exchange"),
      s"inference must be shuffle-free:\n${plan.take(800)}")
    // sanity on separable planted data: perfect split
    import spark.implicits._
    val sep = (1 to 40).map { i =>
      if (i % 2 == 0) (i.toLong, Seq(1f, 0f, 0f, 0f), 1)
      else (i.toLong, Seq(0f, 1f, 0f, 0f), 0)
    }.toDF("vec_id", "embedding", "y")
    val m2 = Similarity.trainLogistic(sep, "embedding", "y")
    val acc = sep.select(col("y"),
        (Similarity.logisticScore(m2, col("embedding")) > 0.5)
          .cast("int").as("pred"))
      .filter(col("pred") === col("y")).count()
    assert(acc == 40L)
  }
}
