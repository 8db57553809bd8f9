package graft.index

/**
 * OPQ — Optimized Product Quantization (Ge, He, Ke, Sun; CVPR 2013), the
 * FAISS `OPQ<m>` pre-transform analog. Goes beyond the reference's factory
 * grammar: a learned orthogonal rotation R is applied before PQ encoding so
 * the subspace split aligns with the data's principal structure, recovering
 * most of plain PQ's recall loss at the same byte budget.
 *
 * Non-parametric alternation (the paper's OPQ-NP):
 *   1. train a PQ codebook on the rotated sample Y = {R·x},
 *   2. with reconstructions x̂ = decode(encode(R·x)) fixed, update R by
 *      orthogonal Procrustes: R = polar(M), M = Σ x̂·xᵀ — the closed-form
 *      minimizer of Σ‖R·x − x̂‖² over orthogonal matrices.
 * The polar factor is computed with an inverse-free Newton–Schulz iteration
 * in double precision (d×d, d ≤ a few hundred — driver-local cost is
 * negligible next to the k-means training it wraps).
 *
 * Distances are rotation-invariant (‖Rq − ŷ‖ = ‖q − Rᵀŷ‖, q·Rᵀŷ = Rq·ŷ), so
 * search rotates the QUERY once and runs the standard ADC machinery in
 * rotated space; RFlat refine re-ranks against the stored UNROTATED vectors
 * with the unrotated query.
 */
object OpqCodec {

  final case class Trained(rotation: Array[Array[Float]], codebook: PqCodec.Codebook)

  /** y = R·x. Accumulates in double for stability; deterministic. */
  def rotate(r: Array[Array[Float]], v: Array[Float]): Array[Float] = {
    val d = v.length
    val out = new Array[Float](d)
    var a = 0
    while (a < d) {
      val row = r(a)
      var s = 0.0
      var b = 0
      while (b < d) { s += row(b) * v(b); b += 1 }
      out(a) = s.toFloat
      a += 1
    }
    out
  }

  def identity(d: Int): Array[Array[Float]] =
    Array.tabulate(d)(i => Array.tabulate(d)(j => if (i == j) 1.0f else 0.0f))

  /** Alternating OPQ training. Falls back to the identity rotation (= plain
   *  PQ) when the Procrustes update degenerates (near-singular M, e.g. a
   *  sample smaller than the dimensionality). */
  def train(sample: Array[Array[Float]], m: Int, iters: Int = 8,
      k: Int = PqCodec.DefaultK): Trained = {
    require(sample.nonEmpty, "OPQ training requires a non-empty sample")
    val d = sample(0).length
    var r = identity(d)
    // codebook trained on the CURRENT r, or null once r has moved past it —
    // lets the degenerate-stop path return the loop's codebook instead of
    // re-running the dominant k-means cost on identical inputs
    var cbForR: PqCodec.Codebook = null
    var it = 0
    var stop = false
    val nChunks = graft.core.ParChunks.numChunks(sample.length)
    while (it < iters && !stop) {
      val rotated = new Array[Array[Float]](sample.length)
      graft.core.ParChunks.foreach(sample.length) { (_, s0, e0) =>
        var i = s0
        while (i < e0) { rotated(i) = rotate(r, sample(i)); i += 1 }
      }
      val cb = PqCodec.train(rotated, m, k)
      cbForR = cb
      // M = Σ x̂ xᵀ in double: per-chunk partials, serially reduced in fixed
      // chunk order so the double sums stay thread-schedule independent
      val chunkMm = new Array[Array[Double]](nChunks)
      graft.core.ParChunks.foreach(sample.length) { (ci, s0, e0) =>
        val part = new Array[Double](d * d)
        var i = s0
        while (i < e0) {
          val xh = PqCodec.decode(cb, PqCodec.encode(cb, rotated(i)))
          val x = sample(i)
          var a = 0
          while (a < d) {
            val va = xh(a).toDouble
            val rowOff = a * d
            var b = 0
            while (b < d) { part(rowOff + b) += va * x(b); b += 1 }
            a += 1
          }
          i += 1
        }
        chunkMm(ci) = part
      }
      val mm = new Array[Double](d * d)
      var ci = 0
      while (ci < nChunks) {
        val part = chunkMm(ci)
        var j = 0
        while (j < mm.length) { mm(j) += part(j); j += 1 }
        ci += 1
      }
      polar(mm, d) match {
        case null => stop = true // keep the last good rotation (cbForR matches it)
        case rNew => r = rNew; cbForR = null
      }
      it += 1
    }
    if (cbForR == null) {
      val rotated = sample.map(rotate(r, _))
      cbForR = PqCodec.train(rotated, m, k)
    }
    Trained(r, cbForR)
  }

  /** Orthogonal polar factor of a d×d matrix (row-major) via Newton–Schulz:
   *  X ← ½·X·(3I − XᵀX) after Frobenius normalization (σmax ≤ 1 < √3, the
   *  iteration's convergence region). Returns null when the result fails the
   *  orthogonality check (singular input). */
  private[graft] def polar(m: Array[Double], d: Int): Array[Array[Float]] = {
    var fro = 0.0
    var i = 0
    while (i < m.length) { fro += m(i) * m(i); i += 1 }
    fro = math.sqrt(fro)
    if (fro == 0.0 || java.lang.Double.isNaN(fro)) return null
    var x = new Array[Double](d * d)
    i = 0
    while (i < m.length) { x(i) = m(i) / fro; i += 1 }
    val iters = 100
    var it = 0
    var converged = false
    while (it < iters && !converged) {
      val xtx = mulT(x, x, d)     // XᵀX
      // y = 3I − XᵀX
      var j = 0
      while (j < xtx.length) { xtx(j) = -xtx(j); j += 1 }
      j = 0
      while (j < d) { xtx(j * d + j) += 3.0; j += 1 }
      val next = mul(x, xtx, d)
      var delta = 0.0
      j = 0
      while (j < next.length) {
        next(j) *= 0.5
        val dd = next(j) - x(j)
        delta += dd * dd
        j += 1
      }
      x = next
      if (delta < 1e-24) converged = true
      it += 1
    }
    // orthogonality check: ‖XᵀX − I‖∞ small, else degenerate input
    val chk = mulT(x, x, d)
    var worst = 0.0
    i = 0
    while (i < d) {
      var j = 0
      while (j < d) {
        val expect = if (i == j) 1.0 else 0.0
        worst = math.max(worst, math.abs(chk(i * d + j) - expect))
        j += 1
      }
      i += 1
    }
    if (worst > 1e-3) return null
    Array.tabulate(d)(a => Array.tabulate(d)(b => x(a * d + b).toFloat))
  }

  /** C = A·B, row-major d×d. */
  private def mul(a: Array[Double], b: Array[Double], d: Int): Array[Double] = {
    val c = new Array[Double](d * d)
    var i = 0
    while (i < d) {
      var kk = 0
      while (kk < d) {
        val av = a(i * d + kk)
        if (av != 0.0) {
          val bOff = kk * d
          val cOff = i * d
          var j = 0
          while (j < d) { c(cOff + j) += av * b(bOff + j); j += 1 }
        }
        kk += 1
      }
      i += 1
    }
    c
  }

  /** C = Aᵀ·B, row-major d×d. */
  private def mulT(a: Array[Double], b: Array[Double], d: Int): Array[Double] = {
    val c = new Array[Double](d * d)
    var kk = 0
    while (kk < d) {
      var i = 0
      while (i < d) {
        val av = a(kk * d + i)
        if (av != 0.0) {
          val bOff = kk * d
          val cOff = i * d
          var j = 0
          while (j < d) { c(cOff + j) += av * b(bOff + j); j += 1 }
        }
        i += 1
      }
      kk += 1
    }
    c
  }
}
