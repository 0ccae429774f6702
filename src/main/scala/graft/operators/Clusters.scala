package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over near-duplicate pair edges — the step that
  * turns `Dedup.*Pairs` output into keep/drop decisions (one keeper per
  * duplicate cluster).
  *
  * Algorithm: alternating large-star / small-star (Kiveris et al.,
  * "Connected Components in MapReduce and Beyond", SoCC'14) expressed as
  * DataFrame self-joins:
  *
  *   large-star: every node connects its larger neighbors to its current
  *     minimum neighbor; small-star: every node connects its smaller-or-
  *     equal neighbors to the minimum. Each round is two shuffles on the
  *     node id; converged when the edge multiset stops changing (checked
  *     via a count+min aggregate). Rounds are O(log n) in the worst
  *     case, 2-4 in practice for dedup graphs (small, star-like
  *     clusters).
  *
  * 100 TB note: this never materializes components on the driver; state
  * is always an edge DataFrame keyed by node, so 10^9-edge graphs shard
  * across executors. Each iteration persists and the previous iteration
  * unpersists — peak footprint is two edge sets.
  */
object Clusters {

  /** @param pairs edges (ida, idb) — the output shape of Dedup.*Pairs.
    * @return (doc_id, cluster_id) for every node appearing in an edge;
    *   cluster_id is the minimum doc_id of the component (so the
    *   cluster_id row itself is the natural keeper).
    */
  def connectedComponents(pairs: DataFrame, maxIter: Int = 20): DataFrame = {
    // canonical undirected edges u < v
    var edges = pairs.select(
        least(col("ida"), col("idb")).as("u"),
        greatest(col("ida"), col("idb")).as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
      .persist()
    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      // large-star: for each node n with neighbors N(n) (both directions),
      // m = min(N(n) ∪ {n}); emit (x, m) for x in N(n) where x > n.
      val nbrs = edges.select(col("u").as("n"), col("v").as("x"))
        .union(edges.select(col("v").as("n"), col("u").as("x")))
      val mins = nbrs.groupBy("n")
        .agg(least(min(col("x")), first(col("n"))).as("m"))
      // no distinct here: small-star dedups at round end, and the
      // duplicate factor is bounded by node degree — one less shuffle.
      val large = nbrs.join(mins, "n")
        .filter(col("x") > col("n"))
        .select(least(col("x"), col("m")).as("u"),
          greatest(col("x"), col("m")).as("v"))
        .filter(col("u") =!= col("v"))

      // small-star on the large-star output: for each node n, connect all
      // smaller-or-equal neighbors to the minimum.
      val nbrs2 = large.select(col("v").as("n"), col("u").as("x")) // x <= n
      val mins2 = nbrs2.groupBy("n").agg(min(col("x")).as("m"))
      val small = nbrs2.join(mins2, "n")
        .select(least(col("x"), col("m")).as("u"),
          greatest(col("x"), col("m")).as("v"))
        .filter(col("u") =!= col("v"))
        .union(mins2.select(col("m").as("u"), col("n").as("v")))
        .distinct()
        .persist()

      // convergence: canonical edge-set fingerprint (count + order-free
      // hash sum) unchanged — one cheap aggregate instead of two
      // exceptAll shuffles per round.
      def fp(df: DataFrame) =
        df.agg(count(lit(1)), expr("bit_xor(xxhash64(u, v))")).collect()(0)
      val (before, after) = (fp(edges), fp(small))
      edges.unpersist(blocking = false)
      edges = small
      converged = before == after
      iter += 1
    }
    // after convergence every edge is (root, member)
    val members = edges.select(col("v").as("doc_id"), col("u").as("cluster_id"))
    val roots = edges.select(col("u")).distinct()
      .select(col("u").as("doc_id"), col("u").as("cluster_id"))
    members.unionByName(roots).distinct()
  }

  /** keep/drop plan: one row per clustered doc with its keeper; docs in
    * no pair are implicitly kept (absent here). */
  def dedupPlan(pairs: DataFrame): DataFrame =
    connectedComponents(pairs)
      .withColumn("keep", col("doc_id") === col("cluster_id"))
}
