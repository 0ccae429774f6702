package graft

import graft.operators.{Clusters, Dedup}
import org.scalatest.funsuite.AnyFunSuite

/** Connected-components correctness: synthetic graphs with known
  * components (chain, star, triangle+bridge, singletons-absent), plus
  * the real pipeline composition pairs→clusters on the fixture docs. */
class ClustersSpec extends AnyFunSuite {
  private lazy val spark = Sessions.local(8)

  private def cc(edges: (Long, Long)*): Map[Long, Long] = {
    import spark.implicits._
    Clusters.connectedComponents(edges.toDF("ida", "idb"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("chain collapses to its minimum") {
    val m = cc((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
    assert(m == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L))
  }

  test("two components stay separate; reversed/duplicate edges are fine") {
    val m = cc((10L, 7L), (7L, 10L), (10L, 7L), (20L, 30L), (30L, 25L))
    assert(m(7L) == 7L && m(10L) == 7L)
    assert(m(20L) == 20L && m(30L) == 20L && m(25L) == 20L)
  }

  test("star + bridge merges through the hub") {
    val m = cc((100L, 1L), (100L, 2L), (100L, 3L), (3L, 50L), (60L, 61L))
    assert(Seq(1L, 2L, 3L, 50L, 100L).forall(m(_) == 1L))
    assert(m(60L) == 60L && m(61L) == 60L)
  }

  test("200-node path converges within the pointer-doubling bound") {
    // worst case for min-label propagation: a single path of diameter
    // 199. Plain propagation needs ~200 rounds; with pointer doubling
    // label distance to the minimum roughly squares per round, so ~12
    // rounds must suffice — maxIter = 12 both pins convergence SPEED
    // (a regression in the doubling step throws here) and correctness.
    import spark.implicits._
    val edges = (1L until 200L).map(i => (i, i + 1)).toDF("ida", "idb")
    // smallGraphEdges = 0 forces the distributed loop — the default
    // would route this graph to the single-task union-find path
    val m = Clusters.connectedComponents(edges, maxIter = 12,
        smallGraphEdges = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(m.size == 200)
    assert(m.values.forall(_ == 1L))
  }

  test("single-task and distributed paths agree on a random graph") {
    import spark.implicits._
    // deterministic pseudo-random graph: mixed chains, stars, cliques,
    // isolated pairs — ids scattered so component minima are nontrivial
    val rnd = new scala.util.Random(42)
    val edges = Seq.tabulate(400) { _ =>
      (rnd.nextInt(300).toLong, rnd.nextInt(300).toLong)
    }.filter(e => e._1 != e._2).toDF("ida", "idb")
    val small = Clusters.connectedComponents(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val dist = Clusters.connectedComponents(edges, smallGraphEdges = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(small == dist)
  }

  test("distributed loop throws rather than returning partial labels") {
    import spark.implicits._
    // a 200-node path needs ~8 pointer-doubling rounds; maxIter=2 with
    // the loop forced must fail LOUDLY, never converge silently wrong
    val edges = (1L until 200L).map(i => (i, i + 1)).toDF("ida", "idb")
    val e = intercept[IllegalStateException] {
      Clusters.connectedComponents(edges, maxIter = 2, smallGraphEdges = 0L)
        .count()
    }
    assert(e.getMessage.contains("did not converge"))
  }

  test("dedup plan marks exactly one keeper per cluster") {
    import spark.implicits._
    val plan = Clusters.dedupPlan(
        Seq((1L, 2L), (2L, 3L), (9L, 8L)).toDF("ida", "idb"))
      .collect()
    val byCluster = plan.groupBy(_.getAs[Long]("cluster_id"))
    assert(byCluster.size == 2)
    byCluster.foreach { case (cid, rows) =>
      assert(rows.count(_.getAs[Boolean]("keep")) == 1)
      assert(rows.find(_.getAs[Boolean]("keep")).get.getAs[Long]("doc_id") == cid)
    }
  }

  test("composition: minhash pairs -> clusters on fixture docs") {
    val docs = Tables.df(spark, "/root/testdata/sf0.001", "documents")
    val pairs = Dedup.minhashLshPairs(docs, "doc_id", "text")
    val clusters = Clusters.connectedComponents(pairs).collect()
    val nPairNodes = pairs.select("ida").union(pairs.select("idb"))
      .distinct().count()
    assert(clusters.length == nPairNodes)
    // every cluster id is a member of its own cluster
    val ids = clusters.map(_.getLong(0)).toSet
    assert(clusters.map(_.getLong(1)).forall(ids.contains))
  }
}
