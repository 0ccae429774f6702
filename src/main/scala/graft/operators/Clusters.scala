package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over near-duplicate pair edges — the step that
  * turns `Dedup.*Pairs` output into keep/drop decisions (one keeper per
  * duplicate cluster).
  *
  * Algorithm: distributed min-label propagation with pointer-doubling
  * compression. Every node starts labeled min(self, neighbors); each
  * round every node (1) takes the minimum label among itself and its
  * neighbors, then (2) jumps to its label's label (path compression —
  * the classic pointer-doubling trick). Step 1 alone needs O(diameter)
  * rounds on a chain; with step 2 label distance to the component
  * minimum roughly squares each round, so convergence is O(log d)
  * rounds — a 1000-node chain closes in ~10 rounds (ClustersSpec pins
  * this on a 200-node path). Converged when a full round changes no
  * label; if `maxIter` rounds pass without convergence the operator
  * THROWS rather than silently returning partial labels.
  *
  * Iteration hygiene (the part naive Spark loops get wrong): every
  * round's label frame is `localCheckpoint`ed, which MATERIALIZES it
  * and truncates lineage — without this the logical plan grows by two
  * joins per round and both Catalyst analysis time and recovery cost
  * blow up quadratically with rounds. The edge list is checkpointed
  * once up front so the (possibly expensive) upstream pair-generation
  * plan — a shingle self-join in the p13/p15 pipelines — executes
  * exactly once, not once per round.
  *
  * 100 TB note: state is always (node, label) + the static adjacency
  * list, both sharded by node id across executors; nothing collects to
  * the driver. Peak footprint is adjacency + two label sets; old
  * checkpoint blocks are dropped by the ContextCleaner as references
  * expire.
  */
object Clusters {

  /** @param pairs edges (ida, idb) — the output shape of Dedup.*Pairs.
    * @return (doc_id, cluster_id) for every node appearing in an edge;
    *   cluster_id is the minimum doc_id of the component (so the
    *   cluster_id row itself is the natural keeper).
    */
  def connectedComponents(pairs: DataFrame, maxIter: Int = 30): DataFrame = {
    // adjacency in both directions, deduplicated, materialized ONCE —
    // truncates the upstream pair-generation lineage
    val adj = pairs.select(col("ida").as("n"), col("idb").as("x"))
      .union(pairs.select(col("idb").as("n"), col("ida").as("x")))
      .filter(col("n") =!= col("x"))
      .distinct()
      .localCheckpoint()

    // seed labels with min(self, direct neighbors) — one propagation
    // round folded into initialization for free
    var labels = adj.groupBy(col("n"))
      .agg(least(min(col("x")), first(col("n"))).as("label"))
      .localCheckpoint()
    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      // (1) each node pulls its neighbors' labels and keeps the minimum
      val nbrMin = adj
        .join(labels.select(col("n").as("x"), col("label").as("xlabel")), "x")
        .groupBy(col("n")).agg(min(col("xlabel")).as("nbr_min"))
      // persisted (not checkpointed): both sides of the pointer-doubling
      // self-join read it, and the cache fills inside `next`'s single
      // checkpoint job — one materialization job per round, not two.
      // `old` rides along so convergence detection below is a plain scan
      // of the checkpointed frame, not an extra join job per round.
      val propagated = labels.join(nbrMin, Seq("n"), "left")
        .select(col("n"), col("label").as("old"),
          least(col("label"), coalesce(col("nbr_min"), col("label")))
            .as("label"))
        .persist()
      // (2) pointer doubling: label <- label(label). Every label is a
      // node id of the same component, so the lookup always hits.
      val doubled = least(col("label"), coalesce(col("ll"), col("label")))
      val next = propagated
        .join(propagated.select(col("n").as("label"), col("label").as("ll")),
          Seq("label"), "left")
        .select(col("n"), doubled.as("label"), (doubled =!= col("old")).as("chg"))
        .localCheckpoint()
      propagated.unpersist(blocking = false)
      val changed = next.filter(col("chg")).limit(1).count()
      labels = next.select(col("n"), col("label"))
      converged = changed == 0
      iter += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"connectedComponents did not converge in $maxIter rounds " +
          "(component diameter exceeds 2^maxIter) — raise maxIter")
    labels.select(col("n").as("doc_id"), col("label").as("cluster_id"))
  }

  /** keep/drop plan: one row per clustered doc with its keeper; docs in
    * no pair are implicitly kept (absent here). */
  def dedupPlan(pairs: DataFrame): DataFrame =
    connectedComponents(pairs)
      .withColumn("keep", col("doc_id") === col("cluster_id"))
}
