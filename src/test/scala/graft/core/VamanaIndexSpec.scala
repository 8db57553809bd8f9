package graft.core

import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

class VamanaIndexSpec extends AnyFunSuite {

  private def bruteForce(vecs: Array[Array[Float]], q: Array[Float], k: Int,
      metric: Metric): Array[Int] =
    vecs.zipWithIndex.map { case (v, i) => (metric.distance(v, q), i) }
      .sortBy { case (d, i) => (d, i) }.take(k).map(_._2)

  private def randVecs(n: Int, dim: Int, seed: Long): Array[Array[Float]] = {
    val rnd = new Random(seed)
    Array.fill(n)(Array.fill(dim)(rnd.nextFloat()))
  }

  test("tiny orthogonal fixture: exact distances (FIXTURES.md F1)") {
    val vecs = Array(
      Array(1f, 0f, 0f), Array(0f, 1f, 0f), Array(0f, 0f, 1f),
      Array(0.5f, 0.5f, 0f), Array(0f, 0.5f, 0.5f))
    val ix = VamanaIndex.build(vecs.iterator, 3, Metric.L2, 8, 16)
    val (ids, dists) = ix.search(Array(1f, 0f, 0f), 2)
    assert(ids(0) == 0 && dists(0) == 0.0f)
    assert(ids(1) == 3 && math.abs(dists(1) - 0.5f) < 1e-6)
    // orthogonal pair: squared-L2 = 2.0 (reference diskann_basic.test:33-36)
    val (_, d2) = ix.search(Array(0f, 1f, 0f), 5)
    assert(d2.contains(2.0f))
  }

  test("recall >= 0.9 vs brute force on 200 random vecs dim=4 (reference bar is 0.7)") {
    val vecs = randVecs(200, 4, seed = 42)
    val ix = VamanaIndex.build(vecs.iterator, 4, Metric.L2)
    val queries = Seq(
      Array(0.5f, 0.5f, 0.5f, 0.5f), Array(1f, 0f, 0f, 0f),
      Array(0f, 0f, 1f, 1f), Array(0.2f, 0.8f, 0.3f, 0.7f))
    for (q <- queries) {
      val truth = bruteForce(vecs, q, 10, Metric.L2).toSet
      val (got, _) = ix.search(q, 10)
      val overlap = got.count(truth)
      assert(overlap >= 9, s"recall $overlap/10 for ${q.mkString(",")}")
    }
  }

  test("recall on larger corpus dim=32, n=2000, k=10") {
    val vecs = randVecs(2000, 32, seed = 7)
    val ix = VamanaIndex.build(vecs.iterator, 32, Metric.L2, 32, 64)
    val rnd = new Random(99)
    var totalOverlap = 0
    val nQ = 20
    for (_ <- 0 until nQ) {
      val q = Array.fill(32)(rnd.nextFloat())
      val truth = bruteForce(vecs, q, 10, Metric.L2).toSet
      val (got, _) = ix.search(q, 10, searchComplexity = 100)
      totalOverlap += got.count(truth)
    }
    assert(totalOverlap >= (nQ * 10 * 0.9).toInt, s"mean recall ${totalOverlap / (nQ * 10.0)}")
  }

  test("inner-product metric ordering") {
    val vecs = randVecs(500, 8, seed = 3)
    val ix = VamanaIndex.build(vecs.iterator, 8, Metric.InnerProduct)
    val q = Array.fill(8)(0.9f)
    val truth = bruteForce(vecs, q, 5, Metric.InnerProduct).toSet
    val (got, dists) = ix.search(q, 5, searchComplexity = 128)
    assert(got.count(truth) >= 4)
    assert(dists.toSeq == dists.sorted.toSeq)
    assert(dists.forall(_ < 0f)) // negated dot of positive vectors
  }

  test("k > N returns all rows (edge_cases.test semantics)") {
    val vecs = randVecs(2, 3, seed = 1)
    val ix = VamanaIndex.build(vecs.iterator, 3, Metric.L2)
    val (ids, _) = ix.search(Array(0f, 0f, 0f), 100)
    assert(ids.length == 2)
  }

  test("duplicate vectors all at distance 0") {
    val v = Array(0.3f, 0.4f, 0.5f)
    val vecs = Array(v, v.clone(), v.clone(), Array(9f, 9f, 9f))
    val ix = VamanaIndex.build(vecs.iterator, 3, Metric.L2)
    val (ids, dists) = ix.search(v, 3)
    assert(ids.toSet == Set(0, 1, 2))
    assert(dists.forall(_ == 0f))
  }

  test("dim=1 vectors") {
    val vecs = Array(Array(1.0f), Array(5.0f), Array(3.0f))
    val ix = VamanaIndex.build(vecs.iterator, 1, Metric.L2)
    val (ids, _) = ix.search(Array(2.9f), 1)
    assert(ids(0) == 2)
  }

  test(".diskann round-trip: identical search results") {
    val vecs = randVecs(300, 16, seed = 11)
    val ix = VamanaIndex.build(vecs.iterator, 16, Metric.L2, 24, 48)
    val q = Array.fill(16)(0.5f)
    val (ids1, d1) = ix.search(q, 10)
    val tmp = java.io.File.createTempFile("graft", ".diskann")
    try {
      DiskannFormat.writeFile(ix, tmp.getAbsolutePath)
      val ix2 = DiskannFormat.readFile(tmp.getAbsolutePath)
      assert(ix2.size == 300 && ix2.dim == 16 && ix2.maxDegree == 24)
      val (ids2, d2) = ix2.search(q, 10)
      assert(ids1.toSeq == ids2.toSeq)
      assert(d1.toSeq == d2.toSeq)
    } finally tmp.delete()
  }

  test(".diskann rejects corrupt input") {
    intercept[java.io.IOException](DiskannFormat.read(Array[Byte](1, 2, 3)))
    intercept[java.io.IOException](DiskannFormat.read(Array.fill[Byte](64)(7)))
  }

  test("SQ8 quantization: exact-match queries survive; round-trips") {
    // FIXTURES.md F4 shape: coarse values survive SQ8
    val vecs = Array(
      Array(1f, 0f, 0f, 0f), Array(0f, 1f, 0f, 0f), Array(0f, 0f, 1f, 0f),
      Array(0f, 0f, 0f, 1f), Array(0.5f, 0.5f, 0f, 0f), Array(0f, 0.5f, 0.5f, 0f),
      Array(0.25f, 0.25f, 0.25f, 0.25f), Array(1f, 1f, 0f, 0f),
      Array(0f, 0f, 0.5f, 0.5f), Array(0.75f, 0.25f, 0f, 0f))
    val ix = VamanaIndex.build(vecs.iterator, 4, Metric.L2, 8, 32)
    ix.quantize()
    assert(ix.isQuantized)
    assert(ix.search(Array(1f, 0f, 0f, 0f), 1)._1(0) == 0)
    assert(ix.search(Array(0.5f, 0.5f, 0f, 0f), 1)._1(0) == 4)
    assert(ix.search(Array(0.25f, 0.25f, 0.25f, 0.25f), 1)._1(0) == 6)

    val tmp = java.io.File.createTempFile("graft", ".diskann")
    try {
      DiskannFormat.writeFile(ix, tmp.getAbsolutePath)
      val ix2 = DiskannFormat.readFile(tmp.getAbsolutePath)
      assert(ix2.isQuantized)
      assert(ix2.search(Array(0.5f, 0.5f, 0f, 0f), 1)._1(0) == 4)
    } finally tmp.delete()
  }

  test("SQ8 quantization error bounded by scale/255") {
    val vecs = randVecs(100, 8, seed = 5)
    val flat = new Array[Float](100 * 8)
    for (i <- 0 until 100; d <- 0 until 8) flat(i * 8 + d) = vecs(i)(d)
    val sq = Sq8Codec.quantize(flat, 100, 8)
    for (i <- 0 until 100; d <- 0 until 8) {
      val err = math.abs(sq.dequantize(i, d) - vecs(i)(d))
      assert(err <= sq.scale(d) / 255.0f / 2.0f + 1e-6)
    }
  }

  test("cosine metric via normalization") {
    val vecs = Array(
      Array(10f, 0f, 0f), Array(1f, 0.1f, 0f), Array(0f, 5f, 0f), Array(0f, 0f, 2f))
    val ix = VamanaIndex.build(vecs.iterator, 3, Metric.Cosine, 8, 16)
    val q = VectorOps.normalize(Array(1f, 0f, 0f))
    val (ids, dists) = ix.search(q, 2)
    // both [10,0,0] and [1,0.1,0] point ~same direction; cosine ignores magnitude
    assert(ids.take(1)(0) == 0) // exact same direction, -cos = -1
    assert(math.abs(dists(0) + 1.0f) < 1e-5)
  }
}
