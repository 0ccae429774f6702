package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over near-duplicate pair edges — the step that
  * turns `Dedup.*Pairs` output into keep/drop decisions (one keeper per
  * duplicate cluster).
  *
  * Scale-adaptive: edge lists small enough for one task's memory run
  * path-compressed union-find in a single executor task (one job);
  * larger graphs run the distributed loop below. Both label every node
  * with its component minimum, so the paths are interchangeable
  * (ClustersSpec pins equality).
  *
  * Algorithm (large path): distributed min-label propagation with
  * pointer-doubling compression. Every node starts labeled min(self, neighbors); each
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
    * @param smallGraphEdges edge-count threshold below which the
    *   single-task union-find path runs instead of the distributed
    *   loop (see below); 0 forces the loop.
    * @return (doc_id, cluster_id) for every node appearing in an edge;
    *   cluster_id is the minimum doc_id of the component (so the
    *   cluster_id row itself is the natural keeper).
    */
  def connectedComponents(pairs: DataFrame, maxIter: Int = 30,
      smallGraphEdges: Long = 4000000L): DataFrame = {
    // adjacency in both directions, deduplicated, materialized ONCE —
    // truncates the upstream pair-generation lineage. Both directions
    // come from a single explode over each edge row, NOT
    // pairs.union(pairs.swapped): a union of two selects over the same
    // source executes the (possibly expensive) upstream pair pipeline
    // twice — ReuseExchange does not reliably dedupe it — while the
    // explode reads every edge exactly once.
    val adj = pairs.select(explode(array(
        struct(col("ida").as("n"), col("idb").as("x")),
        struct(col("idb").as("n"), col("ida").as("x")))).as("e"))
      .select(col("e.n").as("n"), col("e.x").as("x"))
      .filter(col("n") =!= col("x"))
      .distinct()
      .localCheckpoint()

    // Scale-adaptive dispatch. A df-capped dedup edge list is SMALL
    // relative to its corpus (near-dup pairs, not documents) — often a
    // few thousand edges even when the corpus is millions of docs. For
    // those graphs the distributed loop is pure overhead: ~6 shuffle
    // stages per round against hundreds of rows. Below the threshold
    // (64 MB of (long,long) edges — comfortably one task's memory) run
    // path-compressed union-find in a SINGLE EXECUTOR TASK — one job,
    // O(E·α) — and re-shard the labels for downstream parallelism. The
    // count is a cheap scan of the already-checkpointed adjacency.
    // Above it, the O(log d)-round pointer-doubling loop below is the
    // only shape that survives 100 TB. Integral id types only — other
    // key types take the loop path.
    val integralIds = {
      import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
      Seq(adj.schema("n").dataType, adj.schema("x").dataType)
        .forall(Set[org.apache.spark.sql.types.DataType](
          ByteType, ShortType, IntegerType, LongType))
    }
    if (integralIds && adj.count() <= smallGraphEdges)
      return singleTaskCC(adj)

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

  /** Union-find with path compression + union-by-min on one executor
    * task. Semantics identical to the loop: every node labeled with its
    * component's minimum id. Output re-sharded by doc_id so downstream
    * joins parallelize. */
  private def singleTaskCC(adj: DataFrame): DataFrame = {
    val sess = adj.sparkSession
    import sess.implicits._
    adj.select(col("n").cast("long"), col("x").cast("long"))
      .as[(Long, Long)]
      .coalesce(1)
      .mapPartitions { it =>
        val parent = scala.collection.mutable.LongMap.empty[Long]
        def find(a: Long): Long = {
          var r = a
          while (parent.getOrElse(r, r) != r) r = parent(r)
          var c = a
          while (parent.getOrElse(c, c) != c) {
            val nx = parent(c); parent(c) = r; c = nx
          }
          r
        }
        it.foreach { case (a, b) =>
          parent.getOrElseUpdate(a, a)
          parent.getOrElseUpdate(b, b)
          val ra = find(a); val rb = find(b)
          if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
        }
        parent.keys.toArray.iterator.map(k => (k, find(k)))
      }
      .toDF("doc_id", "cluster_id")
      // both paths present the same schema: labels go back to the
      // caller's id type (union-find ran in widened longs)
      .select(col("doc_id").cast(adj.schema("n").dataType),
        col("cluster_id").cast(adj.schema("n").dataType))
      .repartition(sess.sparkContext.defaultParallelism, col("doc_id"))
  }

  /** keep/drop plan: one row per clustered doc with its keeper; docs in
    * no pair are implicitly kept (absent here). */
  def dedupPlan(pairs: DataFrame): DataFrame =
    connectedComponents(pairs)
      .withColumn("keep", col("doc_id") === col("cluster_id"))
}
