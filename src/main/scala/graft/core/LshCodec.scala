package graft.core

/**
 * Binary LSH (sign-random-projection) codec — the FAISS `IndexLSH` analog
 * (factory form `LSH` / `LSH<nbits>`): each vector becomes an `nbits`-bit
 * code whose bit b is the SIGN of its projection onto hyperplane b, and
 * search ranks by Hamming distance between codes. Like FAISS's IndexLSH,
 * encoding ignores the declared metric (sign codes approximate angular
 * similarity regardless; cosine normalization cannot change a sign).
 *
 * Codes up to 64 bits land in one parquet BIGINT column and rank by a
 * single codegen'd `bit_count(code XOR qcode)`; wider codes (FAISS IndexLSH
 * takes arbitrary nbits — 256-bit codes are what make binary LSH a usable
 * candidate generator at the compression extreme) store as `array<bigint>`
 * of ⌈nbits/64⌉ words and rank by the SUM of per-word XOR popcounts — still
 * builtin expressions, no UDF on the scan hot path, and the 100 TB table is
 * 8·words bytes/row of codes instead of 4·dim bytes of floats.
 *
 * Projections accumulate in DOUBLE so the sign decision is replayable
 * bit-for-bit by the DuckDB oracle (both sides promote the same floats to
 * double and sum left-to-right — identical IEEE results, so the boundary
 * case dot == 0 cannot desync).
 */
object LshCodec {
  /** Max bits for the single-BIGINT code column (one long word); wider
   *  codes switch to the `array<bigint>` multi-word layout. */
  val MaxBits = 64

  /** Hard cap on code width — bounds the hyperplane table (nbits·dim
   *  floats) and the per-row code payload; far above any useful binary
   *  code (FAISS recipes top out around 512–1024 bits). */
  val MaxBitsWide = 1024

  /** 64-bit words an nbits code occupies. */
  def words(nbits: Int): Int = (nbits + 63) / 64

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

  /** Multi-word encode for nbits > 64: bit b lands in word b/64 at position
   *  b%64, so word 0's layout is identical to the single-long [[encode]]
   *  (a ≤64-bit code's word(0) == encode(...)). Same double-accumulated
   *  sign decision per bit. */
  def encodeWords(hyps: Array[Array[Float]], v: Array[Float],
      thresholds: Array[Double] = null): Array[Long] = {
    val out = new Array[Long](words(hyps.length))
    var b = 0
    while (b < hyps.length) {
      val h = hyps(b)
      var s = 0.0
      var i = 0
      while (i < h.length) { s += h(i).toDouble * v(i).toDouble; i += 1 }
      val t = if (thresholds == null) 0.0 else thresholds(b)
      if (s >= t) out(b >>> 6) |= (1L << (b & 63))
      b += 1
    }
    out
  }

  /** Padded random rotation for `r`-suffix builds with nbits > dim (FAISS
   *  IndexLSH rotate_data via RandomRotationMatrix(d, nbits)): the input
   *  conceptually zero-pads to nbits dims and rotates by a seeded
   *  orthonormal nbits×nbits matrix, so hyperplane row b is the first `dim`
   *  entries of rotation row b — the zero-padded tail contributes nothing
   *  to the projection. Returned rows are NOT orthonormal in R^dim (rank is
   *  at most dim), but the induced map v ↦ R·[v;0] IS norm-preserving,
   *  which is what rotate_data buys; at nbits ≤ dim use
   *  [[VectorOps.orthonormalizeRows]] on the raw hyperplanes instead. The
   *  rotation is data-independent (like FAISS's), so seed mode does not
   *  apply to it. Deterministic seed from (nbits, dim). */
  def paddedRotationRows(nbits: Int, dim: Int): Array[Array[Float]] = {
    require(nbits > dim,
      s"padded rotation is for nbits > dim (got nbits=$nbits, dim=$dim)")
    val rnd = new java.util.Random(
      0xC2B2AE3D27D4EB4FL ^ (nbits.toLong * 1000003L + dim))
    val g = Array.fill(nbits, nbits)(rnd.nextGaussian())
    VectorOps.orthonormalizeRows(g).map(_.take(dim).map(_.toFloat))
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
