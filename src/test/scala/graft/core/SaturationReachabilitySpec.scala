package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Enforced saturation-exactness (GraphIndex.searchSaturationChecked): a
 *  saturating beam (k >= size) is provably exact ONLY over nodes reachable
 *  from the entry points — delete/append churn before a vacuum can orphan
 *  a node that plain beam search then silently excludes. The checked
 *  variants detect the short saturated answer and linear-scan the missing
 *  labels, so the `*_exact` saturation oracles stay exact under churn;
 *  fully-connected graphs (every fresh build) pass through bit-identically. */
class SaturationReachabilitySpec extends AnyFunSuite {

  private val dim = 4
  private def vec(seed: Int): Array[Float] =
    Array.tabulate(dim)(j => ((seed * 31 + j * 17) % 97) / 97.0f)

  /** A vamana graph with `orphans` nodes severed: every adjacency edge into
   *  them is cut (they keep their own out-edges = the churn shape where a
   *  re-pruned neighborhood dropped the only back-references). */
  private def severed(n: Int, orphans: Set[Int]): (VamanaIndex, VamanaIndex) = {
    val ix = new VamanaIndex(dim, Metric.L2, maxDegree = 4, buildComplexity = 8)
    (0 until n).foreach(i => ix.add(vec(i)))
    val adjacency = Array.tabulate(n)(i => ix.neighbors(i).filterNot(orphans))
    val cut = new VamanaIndex(dim, Metric.L2, maxDegree = 4, buildComplexity = 8)
    cut.load(n, java.util.Arrays.copyOf(ix.rawVectors, n * dim), adjacency,
      ix.entryPoints.filterNot(orphans))
    (ix, cut)
  }

  test("plain saturated search silently drops a churn-orphaned node") {
    val (_, cut) = severed(12, Set(7))
    val (labels, _) = cut.search(vec(100), 12, 64)
    assert(!labels.contains(7), "fixture failed to orphan node 7")
    assert(labels.length == 11)
  }

  test("searchSaturationChecked recovers the orphan with exact distances") {
    val (_, cut) = severed(12, Set(7))
    val q = vec(100)
    val (labels, dists) = cut.searchSaturationChecked(q, 12, 64)
    assert(labels.length == 12 && labels.contains(7))
    // exact contract: same set and ascending (distance, label) order as a
    // brute-force scan under the index metric
    val brute = (0 until 12)
      .map(i => (Metric.L2.distance(q, cut.vector(i)), i))
      .sortBy(identity)
    assert(dists.zip(labels).map { case (d, l) => (d, l) }.toSeq == brute.toSeq)
  }

  test("top-k cut still sees the orphan when it ranks inside k") {
    val (_, cut) = severed(12, Set(7))
    // query AT the orphan: it must rank first despite being unreachable
    val q = vec(7)
    val (labels, dists) = cut.searchSaturationChecked(q, 12, 64)
    assert(labels.head == 7 && dists.head == 0.0f)
  }

  test("connected graph: checked == plain, bit-identical (saturating and not)") {
    val (ix, _) = severed(16, Set.empty)
    val q = vec(55)
    for (k <- Seq(4, 16, 32)) {
      val plain = ix.search(q, k, 64)
      val checked = ix.searchSaturationChecked(q, k, 64)
      assert(plain._1.sameElements(checked._1) && plain._2.sameElements(checked._2),
        s"k=$k diverged on a fully reachable graph")
    }
  }

  test("batch variant recovers orphans per query") {
    val (_, cut) = severed(12, Set(3, 9))
    val qs = Array(vec(3), vec(200))
    val rs = cut.searchBatchSaturationChecked(qs, 12, 64)
    assert(rs.forall(_._1.length == 12))
    assert(rs(0)._1.head == 3, "orphan 3 must rank first for its own vector")
    assert(rs.forall(r => r._1.contains(3) && r._1.contains(9)))
  }

  test("hnsw engine: same enforced contract through the shared trait") {
    val ix = new HnswIndex(dim, Metric.L2)
    (0 until 12).foreach(i => ix.add(vec(i)))
    val q = vec(77)
    val plain = ix.search(q, 12, 64)
    val checked = ix.searchSaturationChecked(q, 12, 64)
    // fresh hnsw builds are connected: passthrough must be bit-identical
    assert(plain._1.sameElements(checked._1) && plain._2.sameElements(checked._2))
    assert(checked._1.length == 12)
  }
}
