package graft.core

/**
 * Binary LSH (sign-random-projection) codec — the FAISS `IndexLSH` analog
 * (factory form `LSH` / `LSH<nbits>`): each vector becomes an `nbits`-bit
 * code whose bit b is the SIGN of its projection onto hyperplane b, and
 * search ranks by Hamming distance between codes. Like FAISS's IndexLSH,
 * encoding ignores the declared metric (sign codes approximate angular
 * similarity regardless; cosine normalization cannot change a sign).
 *
 * Codes are capped at 64 bits so one parquet BIGINT column holds a code and
 * the Hamming distance is a single codegen'd `bit_count(code XOR qcode)` —
 * no UDF on the scan hot path, and the 100 TB table is 8 bytes/row of codes
 * instead of 4·dim bytes of floats.
 *
 * Projections accumulate in DOUBLE so the sign decision is replayable
 * bit-for-bit by the DuckDB oracle (both sides promote the same floats to
 * double and sum left-to-right — identical IEEE results, so the boundary
 * case dot == 0 cannot desync).
 */
object LshCodec {
  /** Max bits per code (one long word). */
  val MaxBits = 64

  /** Deterministic Gaussian hyperplanes for trained (non-seeded) builds:
   *  fixed PRNG seed derived from (nbits, dim), so rebuilding the same
   *  index yields the same codes on any host. */
  def randomHyperplanes(nbits: Int, dim: Int): Array[Array[Float]] = {
    val rnd = new java.util.Random(0x9E3779B97F4A7C15L ^ (nbits.toLong * 1000003L + dim))
    Array.fill(nbits, dim)(rnd.nextGaussian().toFloat)
  }

  /** Encode one vector: bit b set iff dot(hyps(b), v) >= threshold_b
   *  (double acc; thresholds null/absent = 0, the plain sign code). FAISS
   *  IndexLSH applies trained thresholds identically to database vectors
   *  and queries, so one encode serves both sides. */
  def encode(hyps: Array[Array[Float]], v: Array[Float],
      thresholds: Array[Double] = null): Long = {
    var code = 0L
    var b = 0
    while (b < hyps.length) {
      val h = hyps(b)
      var s = 0.0
      var i = 0
      while (i < h.length) { s += h(i).toDouble * v(i).toDouble; i += 1 }
      val t = if (thresholds == null) 0.0 else thresholds(b)
      if (s >= t) code |= (1L << b)
      b += 1
    }
    code
  }

  /** Per-bit thresholds = MEAN projection over `sample` (FAISS
   *  IndexLSH::train semantics), accumulated in double in the given sample
   *  order — with an id-ordered sample this is exactly replayable by the
   *  DuckDB oracle (`list_sum(list(proj ORDER BY id)) / n`). */
  def trainThresholds(hyps: Array[Array[Float]],
      sample: Array[Array[Float]]): Array[Double] = {
    require(sample.nonEmpty, "LSH threshold training needs a non-empty sample")
    val out = new Array[Double](hyps.length)
    var b = 0
    while (b < hyps.length) {
      val h = hyps(b)
      var sum = 0.0
      var r = 0
      while (r < sample.length) {
        val v = sample(r)
        var s = 0.0
        var i = 0
        while (i < h.length) { s += h(i).toDouble * v(i).toDouble; i += 1 }
        sum += s
        r += 1
      }
      out(b) = sum / sample.length
      b += 1
    }
    out
  }

  /** Hamming distance between two codes. */
  @inline def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
}
