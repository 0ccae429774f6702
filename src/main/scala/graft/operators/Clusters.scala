package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over near-duplicate pair edges — the step that
  * turns `Dedup.*Pairs` output into keep/drop decisions (one keeper per
  * duplicate cluster).
  *
  * Algorithm: distributed min-label propagation. Every node starts
  * labeled with itself; each round every node takes the minimum label
  * among itself and its neighbors; converged when no label changes.
  * Each round is ONE shuffle (neighbor-min aggregation) plus one cheap
  * change-count action, and rounds equal the cluster diameter — for
  * dedup graphs (shallow, star-like clusters of mutually-similar docs)
  * that is 2-4 rounds. For adversarial high-diameter graphs (long
  * chains) an O(log n)-round star-contraction variant (Kiveris et al.,
  * SoCC'14) is the fallback; dedup similarity graphs do not produce
  * those shapes, so the simpler round structure wins on real wall-clock.
  *
  * 100 TB note: state is always (node, label) + the static adjacency
  * list, both sharded by node id across executors; nothing collects to
  * the driver. Adjacency persists once; labels persist per round with
  * the previous round unpersisted — peak footprint is adjacency + two
  * label sets.
  */
object Clusters {

  /** @param pairs edges (ida, idb) — the output shape of Dedup.*Pairs.
    * @return (doc_id, cluster_id) for every node appearing in an edge;
    *   cluster_id is the minimum doc_id of the component (so the
    *   cluster_id row itself is the natural keeper).
    */
  def connectedComponents(pairs: DataFrame, maxIter: Int = 30): DataFrame = {
    // adjacency in both directions, deduplicated once
    val adj = pairs.select(col("ida").as("n"), col("idb").as("x"))
      .union(pairs.select(col("idb").as("n"), col("ida").as("x")))
      .filter(col("n") =!= col("x"))
      .distinct()
      .persist()

    // seed labels with min(self, direct neighbors) — one propagation
    // round folded into initialization for free
    var labels = adj.groupBy(col("n"))
      .agg(least(min(col("x")), first(col("n"))).as("label"))
      .persist()
    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      // each node pulls its neighbors' labels and keeps the minimum
      val nbrMin = adj
        .join(labels.select(col("n").as("x"), col("label").as("xlabel")), "x")
        .groupBy(col("n")).agg(min(col("xlabel")).as("nbr_min"))
      val next = labels.join(nbrMin, Seq("n"), "left")
        .select(col("n"),
          least(col("label"), coalesce(col("nbr_min"), col("label")))
            .as("label"))
        .persist()
      val changed = next.join(labels.withColumnRenamed("label", "old"), "n")
        .filter(col("label") =!= col("old")).limit(1).count()
      labels.unpersist(blocking = false)
      labels = next
      converged = changed == 0
      iter += 1
    }
    adj.unpersist(blocking = false)
    labels.select(col("n").as("doc_id"), col("label").as("cluster_id"))
  }

  /** keep/drop plan: one row per clustered doc with its keeper; docs in
    * no pair are implicitly kept (absent here). */
  def dedupPlan(pairs: DataFrame): DataFrame =
    connectedComponents(pairs)
      .withColumn("keep", col("doc_id") === col("cluster_id"))
}
