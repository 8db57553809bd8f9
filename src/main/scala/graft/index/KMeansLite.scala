package graft.index

import graft.core.VectorOps

/**
 * Deterministic sample-based Lloyd's k-means for IVF centroid training.
 * Mirrors the reference's FAISS IVF training: deterministic stride sampling
 * of at most `maxTrain` points, then a bounded number of Lloyd iterations
 * (reference src/faiss_index.cpp:287-414, sampling at 304-319).
 *
 * Runs on a driver-side sample only — at 100 TB the sample stays bounded
 * (FAISS trains IVF the same way); assignment of the full dataset to
 * centroids is the distributed part (Ann.buildIvf).
 */
object KMeansLite {

  def train(samples: Array[Array[Float]], k: Int, iters: Int = 10): Array[Array[Float]] = {
    require(samples.nonEmpty, "k-means requires a non-empty sample")
    val dim = samples(0).length
    val kk = math.min(k, samples.length)
    // deterministic init: evenly strided sample points
    val stride = math.max(1, samples.length / kk)
    val cents = Array.tabulate(kk)(i => samples(math.min(i * stride, samples.length - 1)).clone())

    val assign = new Array[Int](samples.length)
    var it = 0
    while (it < iters) {
      // assignment
      var i = 0
      while (i < samples.length) {
        var best = 0; var bestD = Float.MaxValue
        var c = 0
        while (c < kk) {
          val d = VectorOps.l2Sq(samples(i), cents(c))
          if (d < bestD) { bestD = d; best = c }
          c += 1
        }
        assign(i) = best
        i += 1
      }
      // update
      val sums = Array.fill(kk)(new Array[Double](dim))
      val counts = new Array[Int](kk)
      i = 0
      while (i < samples.length) {
        val c = assign(i); counts(c) += 1
        val s = sums(c); val v = samples(i)
        var d = 0
        while (d < dim) { s(d) += v(d); d += 1 }
        i += 1
      }
      var c = 0
      var emptySeed = 0
      while (c < kk) {
        if (counts(c) > 0) {
          var d = 0
          while (d < dim) { cents(c)(d) = (sums(c)(d) / counts(c)).toFloat; d += 1 }
        } else {
          // re-seed empty cluster deterministically from a strided point
          cents(c) = samples((emptySeed * 31 + c) % samples.length).clone()
          emptySeed += 1
        }
        c += 1
      }
      it += 1
    }
    cents
  }

  def nearest(cents: Array[Array[Float]], v: Array[Float]): Int = {
    var best = 0; var bestD = Float.MaxValue
    var c = 0
    while (c < cents.length) {
      val d = VectorOps.l2Sq(v, cents(c))
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    best
  }

  /** Indices of the `p` nearest centroids to `v` (for nprobe routing). */
  def nearestP(cents: Array[Array[Float]], v: Array[Float], p: Int): Array[Int] =
    cents.indices.map(c => (VectorOps.l2Sq(v, cents(c)), c))
      .sortBy(x => (x._1, x._2)).take(math.min(p, cents.length)).map(_._2).toArray
}
