package graft.core

import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

/**
 * The multithreaded per-shard Vamana build (VamanaIndex.addAllParallel —
 * the Spark-side analog of native DiskANN's OpenMP parallel insert loop).
 * Parallel builds are racy by design (edge sets vary run-to-run), so the
 * contract under test is: graph INVARIANTS hold, search QUALITY matches the
 * serial build, and the id↔label mapping stays deterministic.
 */
class ParallelBuildSpec extends AnyFunSuite {

  private def randVecs(n: Int, dim: Int, seed: Long): Array[Array[Float]] = {
    val r = new Random(seed)
    Array.fill(n)(Array.fill(dim)(r.nextFloat() * 2 - 1))
  }

  private def bruteTopK(vecs: Array[Array[Float]], q: Array[Float], k: Int,
      metric: Metric): Array[Int] =
    vecs.indices.sortBy(i => (metric.distance(vecs(i), q), i)).take(k).toArray

  private def buildParallel(vecs: Array[Array[Float]], threads: Int,
      maxDegree: Int = 32, bc: Int = 64): VamanaIndex = {
    val ix = new VamanaIndex(16, Metric.L2, maxDegree, bc)
    // serial pilot block (as the shard builder does), parallel tail
    val pilot = math.max(math.sqrt(vecs.length.toDouble).toInt, 64)
    vecs.take(pilot).foreach(ix.add)
    ix.addAllParallel(vecs.drop(pilot), threads)
    ix
  }

  test("parallel build: graph invariants hold (bounds, no self-edges, no dup edges)") {
    val n = 6000
    val vecs = randVecs(n, 16, seed = 31)
    val ix = buildParallel(vecs, threads = 4)
    assert(ix.size == n)
    var node = 0
    while (node < n) {
      val nbrs = ix.neighbors(node)
      assert(nbrs.length <= ix.degreeBound, s"node $node degree ${nbrs.length}")
      assert(!nbrs.contains(node), s"node $node has a self-edge")
      assert(nbrs.forall(b => b >= 0 && b < n), s"node $node out-of-range edge")
      assert(nbrs.toSet.size == nbrs.length, s"node $node duplicate edges")
      node += 1
    }
    ix.finalizePruning()
    node = 0
    while (node < n) {
      assert(ix.neighbors(node).length <= 32, s"node $node over maxDegree after finalize")
      node += 1
    }
  }

  test("parallel build recall matches the serial build (>= 0.9, within 0.05)") {
    val n = 6000
    val vecs = randVecs(n, 16, seed = 17)
    val serial = new VamanaIndex(16, Metric.L2, 32, 64)
    vecs.foreach(serial.add)
    val par = buildParallel(vecs, threads = 4)
    val queries = randVecs(50, 16, seed = 91)
    def meanRecall(ix: VamanaIndex): Double = {
      val rs = queries.map { q =>
        val truth = bruteTopK(vecs, q, 10, Metric.L2).toSet
        val (got, _) = ix.search(q, 10, 100)
        got.count(truth) / 10.0
      }
      rs.sum / rs.length
    }
    val (rs, rp) = (meanRecall(serial), meanRecall(par))
    assert(rp >= 0.9, s"parallel recall $rp")
    assert(rp >= rs - 0.05, s"parallel recall $rp far below serial $rs")
  }

  test("threads=1 and small batches fall back to the serial deterministic path") {
    val vecs = randVecs(500, 16, seed = 3) // < MinParallelBatch
    val a = new VamanaIndex(16, Metric.L2, 16, 32)
    vecs.foreach(a.add)
    val b = new VamanaIndex(16, Metric.L2, 16, 32)
    b.addAllParallel(vecs, threads = 8) // falls back below MinParallelBatch
    val c = new VamanaIndex(16, Metric.L2, 16, 32)
    c.addAllParallel(vecs, threads = 1)
    for (ix <- Seq(b, c); node <- 0 until 500)
      assert(ix.neighbors(node).sameElements(a.neighbors(node)),
        s"serial-fallback graph diverged at node $node")
  }

  test("parallel finalizePruning is bit-deterministic (same graph as serial finalize)") {
    // per-node prune reads only other nodes' VECTORS, so thread count cannot
    // change the result — the property DiskannFormat.writeFile relies on
    val vecs = randVecs(4000, 16, seed = 77)
    def built(): VamanaIndex = {
      val ix = new VamanaIndex(16, Metric.L2, 16, 48)
      vecs.foreach(ix.add)
      ix
    }
    val a = built(); a.finalizePruning(1)
    val b = built(); b.finalizePruning(4)
    for (node <- 0 until 4000)
      assert(a.neighbors(node).sameElements(b.neighbors(node)),
        s"finalize diverged at node $node")
  }

  test("parallel results searchable bit-identically across batch and single-query routes") {
    val n = 4000
    val vecs = randVecs(n, 16, seed = 57)
    val ix = buildParallel(vecs, threads = 4)
    val queries = randVecs(16, 16, seed = 5)
    val single = queries.map(q => ix.search(q, 10, 80))
    val batch = ix.searchBatch(queries, 10, 80)
    for (i <- queries.indices) {
      assert(single(i)._1.sameElements(batch(i)._1))
      assert(single(i)._2.sameElements(batch(i)._2))
    }
  }
}
