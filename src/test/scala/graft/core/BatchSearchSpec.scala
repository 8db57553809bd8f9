package graft.core

import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

/**
 * Lock-step multi-query batch search must be BIT-IDENTICAL to searching each
 * query alone — same traversal primitives, same per-row distance kernels
 * (reference rust_lib/src/provider.rs:248-440 has the same contract: the
 * batch path only changes when distances are computed, never which).
 */
class BatchSearchSpec extends AnyFunSuite {

  // force the lock-step path: test indexes are far below the auto-route
  // threshold that would otherwise silently fall back to per-query search
  // (read per-call, so setting it here covers every test in this suite)
  sys.props("graft.ann.lockstepMinBytes") = "0"

  private def randVecs(n: Int, dim: Int, seed: Long): Array[Array[Float]] = {
    val rnd = new Random(seed)
    Array.fill(n)(Array.fill(dim)(rnd.nextFloat()))
  }

  private def randQueries(nq: Int, dim: Int, seed: Long): Array[Array[Float]] = {
    val rnd = new Random(seed)
    Array.fill(nq)(Array.fill(dim)(rnd.nextFloat()))
  }

  private def assertBatchMatchesSingle(ix: GraphIndex, queries: Array[Array[Float]],
      k: Int, sc: Int, label: String): Unit = {
    val batch = ix.searchBatch(queries, k, sc)
    queries.zipWithIndex.foreach { case (q, qi) =>
      val (sIds, sDists) = ix.search(q, k, sc)
      val (bIds, bDists) = batch(qi)
      assert(bIds.toSeq == sIds.toSeq, s"$label: ids differ for query $qi")
      // bit-exact: compare raw float bits, not approximate equality
      assert(bDists.map(java.lang.Float.floatToIntBits).toSeq ==
             sDists.map(java.lang.Float.floatToIntBits).toSeq,
        s"$label: distances differ for query $qi")
    }
  }

  test("heap vamana L2: batch == per-query, bit-exact") {
    val vecs = randVecs(1500, 24, seed = 11)
    val ix = VamanaIndex.build(vecs.iterator, 24, Metric.L2, 32, 64)
    assertBatchMatchesSingle(ix, randQueries(37, 24, seed = 5), k = 10, sc = 80, "heap-l2")
  }

  test("heap vamana IP + cosine: batch == per-query, bit-exact") {
    val vecs = randVecs(800, 16, seed = 23)
    val ip = VamanaIndex.build(vecs.iterator, 16, Metric.InnerProduct, 24, 48)
    assertBatchMatchesSingle(ip, randQueries(19, 16, seed = 6), k = 8, sc = 0, "heap-ip")
    val cos = VamanaIndex.build(vecs.iterator, 16, Metric.Cosine, 24, 48)
    // cosine queries must be pre-normalized like the serving path does
    val qs = randQueries(19, 16, seed = 7).map(q => VectorOps.normalize(q.clone()))
    assertBatchMatchesSingle(cos, qs, k = 8, sc = 0, "heap-cos")
  }

  test("sq8 quantized: gemm lock-step == per-query, bit-exact (L2 + IP)") {
    // the SQ8 cursor is gatherable: copyVector dequantizes into the gather
    // block and both routes use the same float kernels, so forced lock-step
    // (lockstepMinBytes=0 above) must stay bit-identical to per-query
    val vecs = randVecs(600, 16, seed = 31)
    val ix = VamanaIndex.build(vecs.iterator, 16, Metric.L2, 24, 48)
    ix.quantize()
    assert(ix.newCursor().gatherable, "SQ8 cursor must take the gemm path")
    assertBatchMatchesSingle(ix, randQueries(13, 16, seed = 8), k = 6, sc = 0, "sq8")
    assertBatchMatchesSingle(ix, randQueries(64, 16, seed = 15), k = 6, sc = 48, "sq8-wide")
    val ip = VamanaIndex.build(vecs.iterator, 16, Metric.InnerProduct, 24, 48)
    ip.quantize()
    assertBatchMatchesSingle(ip, randQueries(13, 16, seed = 16), k = 6, sc = 0, "sq8-ip")
  }

  test("mmap-served shard: batch == per-query == heap, bit-exact") {
    val vecs = randVecs(1200, 20, seed = 47)
    val heap = VamanaIndex.build(vecs.iterator, 20, Metric.L2, 32, 64)
    heap.finalizePruning()
    val tmp = java.io.File.createTempFile("batchspec", ".diskann")
    tmp.deleteOnExit()
    DiskannFormat.writeFile(heap, tmp.getAbsolutePath)
    val mm = DiskannMmapIndex.open(tmp.getAbsolutePath)
    assert(mm != null)
    val qs = randQueries(29, 20, seed = 9)
    assertBatchMatchesSingle(mm, qs, k = 10, sc = 70, "mmap")
    // cross-mode: mmap batch == heap batch on the same bytes
    val hb = heap.searchBatch(qs, 10, 70)
    val mb = mm.searchBatch(qs, 10, 70)
    qs.indices.foreach { qi =>
      assert(hb(qi)._1.toSeq == mb(qi)._1.toSeq, s"heap/mmap batch ids differ q$qi")
      assert(hb(qi)._2.toSeq == mb(qi)._2.toSeq, s"heap/mmap batch dists differ q$qi")
    }
  }

  test("hnsw L2 + IP(mips) + cosine: batch == per-query, bit-exact") {
    val vecs = randVecs(900, 16, seed = 53)
    def build(metric: Metric): HnswIndex = {
      val ix = new HnswIndex(16, metric, 16, 64)
      vecs.foreach(v => ix.add(
        if (metric eq Metric.Cosine) VectorOps.normalize(v.clone()) else v))
      ix
    }
    val l2 = build(Metric.L2)
    assertBatchMatchesSingle(l2, randQueries(23, 16, seed = 12), k = 8, sc = 48, "hnsw-l2")
    val ip = build(Metric.InnerProduct)
    assertBatchMatchesSingle(ip, randQueries(23, 16, seed = 13), k = 8, sc = 48, "hnsw-ip")
    val cos = build(Metric.Cosine)
    val qs = randQueries(23, 16, seed = 14).map(q => VectorOps.normalize(q.clone()))
    assertBatchMatchesSingle(cos, qs, k = 8, sc = 48, "hnsw-cos")
  }

  test("edge cases: empty query set, single query, k > n, empty index") {
    val vecs = randVecs(50, 8, seed = 3)
    val ix = VamanaIndex.build(vecs.iterator, 8, Metric.L2, 16, 32)
    assert(ix.searchBatch(Array.empty[Array[Float]], 5).isEmpty)
    val one = ix.searchBatch(randQueries(1, 8, seed = 1), 5)
    assert(one.length == 1 && one(0)._1.length == 5)
    val big = ix.searchBatch(randQueries(3, 8, seed = 2), 100)
    assert(big.forall(_._1.length == 50))
    val empty = new VamanaIndex(8, Metric.L2)
    assert(empty.searchBatch(randQueries(2, 8, seed = 4), 5).forall(_._1.isEmpty))
  }
}
