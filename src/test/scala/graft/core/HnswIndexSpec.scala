package graft.core

import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

class HnswIndexSpec extends AnyFunSuite {

  private def randVecs(n: Int, dim: Int, seed: Long): Array[Array[Float]] = {
    val r = new Random(seed)
    Array.fill(n)(Array.fill(dim)(r.nextFloat() * 2 - 1))
  }

  private def bruteTopK(vecs: Array[Array[Float]], q: Array[Float], k: Int,
      metric: Metric): Array[Int] =
    vecs.indices.sortBy(i => (metric.distance(vecs(i), q), i)).take(k).toArray

  test("exact match returned first; squared-L2 distances") {
    val ix = new HnswIndex(4, Metric.L2, m = 8, efConstruction = 50)
    val vs = Array(
      Array(1f, 0f, 0f, 0f), Array(0f, 1f, 0f, 0f),
      Array(0f, 0f, 1f, 0f), Array(0f, 0f, 0f, 1f))
    vs.foreach(ix.add)
    val (ids, ds) = ix.search(Array(1f, 0f, 0f, 0f), 2, 0)
    assert(ids(0) == 0 && ds(0) == 0.0f)
    assert(ds(1) == 2.0f) // orthogonal unit vectors, squared L2
  }

  test("recall >= 0.9 vs brute force on 1000 random vectors (L2, cosine, IP)") {
    def normalize(v: Array[Float]): Array[Float] = VectorOps.normalize(v.clone())
    for ((metric, prep) <- Seq[(Metric, Array[Float] => Array[Float])](
        (Metric.L2, identity _), (Metric.Cosine, normalize _),
        (Metric.InnerProduct, identity _))) {
      val vecs = randVecs(1000, 16, seed = 7).map(prep)
      val ix = new HnswIndex(16, metric, m = 16, efConstruction = 100)
      vecs.foreach(ix.add)
      val queries = randVecs(20, 16, seed = 99).map(prep)
      val recalls = queries.map { q =>
        val truth = bruteTopK(vecs, q, 10, metric).toSet
        val (got, _) = ix.search(q, 10, 100)
        got.count(truth) / 10.0
      }
      val mean = recalls.sum / recalls.length
      assert(mean >= 0.9, s"$metric mean recall $mean")
    }
  }

  test("vamana recall >= 0.9 with mixed-sign IP distances") {
    // regression for the signed-packing heap-key bug: negated-dot distances
    // straddle zero, which used to invert beam ordering
    val vecs = randVecs(1000, 16, seed = 21)
    val ix = new VamanaIndex(16, Metric.InnerProduct, 32, 64)
    vecs.foreach(ix.add)
    val queries = randVecs(20, 16, seed = 5)
    val recalls = queries.map { q =>
      val truth = bruteTopK(vecs, q, 10, Metric.InnerProduct).toSet
      val (got, _) = ix.search(q, 10, 100)
      got.count(truth) / 10.0
    }
    val mean = recalls.sum / recalls.length
    assert(mean >= 0.9, s"vamana IP mean recall $mean")
  }

  test("deterministic build: same input → same graph → same results") {
    val vecs = randVecs(300, 8, seed = 3)
    def build() = {
      val ix = new HnswIndex(8, Metric.L2, m = 8, efConstruction = 60)
      vecs.foreach(ix.add); ix
    }
    val q = Array.fill(8)(0.25f)
    val (a1, d1) = build().search(q, 10, 80)
    val (a2, d2) = build().search(q, 10, 80)
    assert(a1.toSeq == a2.toSeq && d1.toSeq == d2.toSeq)
  }

  test("serialization round-trip preserves search results") {
    val vecs = randVecs(500, 12, seed = 11)
    val ix = new HnswIndex(12, Metric.L2, m = 12, efConstruction = 80)
    vecs.foreach(ix.add)
    val path = s"/tmp/graft-hnsw-test-${System.nanoTime()}.hnsw"
    HnswFormat.writeFile(ix, path)
    val loaded = HnswFormat.readFile(path)
    assert(loaded.size == ix.size && loaded.dim == ix.dim)
    val q = vecs(123)
    val (a1, d1) = ix.search(q, 10, 100)
    val (a2, d2) = loaded.search(q, 10, 100)
    assert(a1.toSeq == a2.toSeq && d1.toSeq == d2.toSeq)
    assert(loaded.vector(42).toSeq == vecs(42).toSeq)
    new java.io.File(path).delete()
  }

  test("IP via MIPS reduction: distances are exact negated dots; round-trips") {
    val vecs = randVecs(400, 12, seed = 31)
    val ix = new HnswIndex(12, Metric.InnerProduct, m = 12, efConstruction = 80)
    vecs.foreach(ix.add)
    val q = randVecs(1, 12, seed = 77).head
    val (ids, ds) = ix.search(q, 5, 200)
    // surfaced distance must equal -q·v (within float rounding of the
    // reduction round-trip)
    ids.zip(ds).foreach { case (id, d) =>
      val expect = -vecs(id).zip(q).map { case (a, b) => a.toDouble * b }.sum
      assert(math.abs(d - expect) < 1e-3, s"id=$id d=$d expect=$expect")
    }
    // frozen: further inserts rejected
    intercept[IllegalArgumentException](ix.add(vecs(0)))
    // serialization round-trip preserves results and reconstructed vectors
    val path = s"/tmp/graft-hnsw-ip-${System.nanoTime()}.hnsw"
    HnswFormat.writeFile(ix, path)
    val loaded = HnswFormat.readFile(path)
    assert(loaded.metric eq Metric.InnerProduct)
    assert(loaded.dim == 12 && loaded.size == 400)
    val (ids2, ds2) = loaded.search(q, 5, 200)
    assert(ids2.toSeq == ids.toSeq && ds2.toSeq == ds.toSeq)
    assert(loaded.vector(42).toSeq == vecs(42).toSeq)
    new java.io.File(path).delete()
  }

  test("addAll: deterministic across runs, recall parity with sequential add") {
    val vecs = randVecs(6000, 16, seed = 5)
    def bulk(): HnswIndex = {
      val ix = new HnswIndex(16, Metric.L2, m = 16, efConstruction = 100)
      ix.addAll(vecs)
      ix
    }
    val b1 = bulk(); val b2 = bulk()
    val queries = randVecs(32, 16, seed = 99)
    // determinism: two builds answer identically on every query (the graph
    // is a function of (vectors, seed) alone — parallel scheduling must not
    // leak into link structure)
    queries.foreach { q =>
      val (i1, d1) = b1.search(q, 10, 200)
      val (i2, d2) = b2.search(q, 10, 200)
      assert(i1.toSeq == i2.toSeq && d1.toSeq == d2.toSeq)
    }
    // quality parity: bulk recall vs brute force within 3 points of the
    // sequential build's recall on the same corpus/queries
    val seq = new HnswIndex(16, Metric.L2, m = 16, efConstruction = 100)
    vecs.foreach(seq.add)
    def recall(ix: HnswIndex): Double = {
      val per = queries.map { q =>
        val want = bruteTopK(vecs, q, 10, Metric.L2).toSet
        (ix.search(q, 10, 200)._1.toSet intersect want).size / 10.0
      }
      per.sum / per.length
    }
    val (rb, rs) = (recall(b1), recall(seq))
    assert(rb >= rs - 0.03, s"bulk recall $rb vs sequential $rs")
    // size/vector integrity
    assert(b1.size == vecs.length)
    assert(b1.vector(4321).toSeq == vecs(4321).toSeq)
  }

  test("k > N returns all; empty index returns none") {
    val ix = new HnswIndex(3, Metric.L2)
    assert(ix.search(Array(0f, 0f, 0f), 5, 0)._1.isEmpty)
    ix.add(Array(1f, 2f, 3f))
    ix.add(Array(4f, 5f, 6f))
    val (ids, _) = ix.search(Array(0f, 0f, 0f), 10, 0)
    assert(ids.length == 2)
  }
}
