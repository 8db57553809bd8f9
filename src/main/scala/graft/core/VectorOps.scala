package graft.core

/**
 * Scalar distance kernels over `Array[Float]`.
 *
 * Semantics mirror the reference engine (rust_lib/src/distance.rs:15-25):
 *  - `l2Sq` is the *squared* Euclidean distance (the index-internal metric).
 *  - `ipDistance` is the *negated* dot product, so lower = more similar.
 *  - `cosineSimilarity` is the raw cosine (higher = more similar).
 *
 * Double variants are provided for the SQL-facing expressions where the
 * oracle (DuckDB `list_distance` on DOUBLE[]) computes in f64; using the
 * same sequential summation order keeps results bit-comparable.
 *
 * Float kernels route through [[Simd]] (explicit jdk.incubator.vector lanes
 * when the module is enabled, HotSpot-auto-vectorized scalar loops
 * otherwise) — the JVM replacement for the reference's AVX2/NEON kernels.
 * The double variants stay scalar-sequential ON PURPOSE: SIMD lane
 * reduction reassociates the sum, which would break bit-parity with the
 * DuckDB oracle.
 */
object VectorOps {

  @inline def l2Sq(a: Array[Float], b: Array[Float]): Float =
    Simd.l2Sq(a, 0, b, 0, a.length)

  @inline def dot(a: Array[Float], b: Array[Float]): Float =
    Simd.dot(a, 0, b, 0, a.length)

  /** Squared L2 over float inputs accumulated in DOUBLE: relative error
   *  ≤ ~dim·2⁻⁵², for geometric bounds that must provably dominate rounding
   *  (range-search cluster pruning) — the float SIMD kernel's ~dim·2⁻²⁴
   *  worst case is NOT safely below a 1e-6 slack at high dims. */
  def l2SqDoubleAcc(a: Array[Float], b: Array[Float]): Double = {
    var s = 0.0
    var i = 0
    while (i < a.length) {
      val d = a(i).toDouble - b(i).toDouble
      s += d * d
      i += 1
    }
    s
  }

  /** Negated inner product: lower = closer (reference distance.rs:21-24). */
  @inline def ipDistance(a: Array[Float], b: Array[Float]): Float = -dot(a, b)

  @inline def norm(a: Array[Float]): Float = math.sqrt(dot(a, a).toDouble).toFloat

  def cosineSimilarity(a: Array[Float], b: Array[Float]): Float =
    Simd.cosine(a, 0, b, 0, a.length)

  /** L2-normalize in place; returns the same array. Zero vectors unchanged. */
  def normalize(a: Array[Float]): Array[Float] = {
    val n = norm(a)
    if (n > 0f) { var i = 0; while (i < a.length) { a(i) /= n; i += 1 } }
    a
  }

  // ---- double-precision variants (SQL expression surface) ----

  def l2SqD(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0; var i = 0; val n = a.length
    while (i < n) { val d = a(i) - b(i); s += d * d; i += 1 }
    s
  }

  def l2D(a: Array[Double], b: Array[Double]): Double = math.sqrt(l2SqD(a, b))

  def dotD(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0; var i = 0; val n = a.length
    while (i < n) { s += a(i) * b(i); i += 1 }
    s
  }

  def cosineD(a: Array[Double], b: Array[Double]): Double = {
    var ab = 0.0; var aa = 0.0; var bb = 0.0; var i = 0; val n = a.length
    while (i < n) { ab += a(i) * b(i); aa += a(i) * a(i); bb += b(i) * b(i); i += 1 }
    val den = math.sqrt(aa) * math.sqrt(bb)
    if (den == 0.0) 0.0 else ab / den
  }

  /** CLASSICAL Gram-Schmidt orthonormalization of `rows` (double, in
   *  row-index order): for each row k, first compute ALL projections
   *  d_j = dot(h_k, e_j) (each a left-to-right accumulation), then
   *  w_k[i] = h_k[i] − d_0·e_0[i] − … − d_{k−1}·e_{k−1}[i] sequentially,
   *  then e_k = w_k / ‖w_k‖. Classical (not modified) GS is chosen
   *  DELIBERATELY: the exact operation order is simple enough to replay
   *  bit-for-bit in the DuckDB oracle's generated SQL (the `LSH<n>r`
   *  rotation oracle); at the ≤64 vectors an LSH code or PCA post-rotation
   *  needs, its weaker numerical stability is irrelevant. Requires rows to
   *  be linearly independent (throws on a zero residual). */
  def orthonormalizeRows(rows: Array[Array[Double]]): Array[Array[Double]] = {
    val n = rows.length
    val out = new Array[Array[Double]](n)
    var k = 0
    while (k < n) {
      val h = rows(k)
      val dim = h.length
      val dots = new Array[Double](k)
      var j = 0
      while (j < k) { dots(j) = dotD(h, out(j)); j += 1 }
      val w = h.clone()
      j = 0
      while (j < k) {
        val e = out(j)
        val d = dots(j)
        var i = 0
        while (i < dim) { w(i) -= d * e(i); i += 1 }
        j += 1
      }
      val nrm = math.sqrt(dotD(w, w))
      require(nrm > 1e-12,
        s"Gram-Schmidt: row $k is (numerically) dependent on rows 0..${k - 1}")
      var i = 0
      while (i < dim) { w(i) /= nrm; i += 1 }
      out(k) = w
      k += 1
    }
    out
  }
}

/** Index metric. Matches the reference's on-disk codes (file_format.rs: 0=L2, 1=IP).
 *  Cosine is realized as IP over L2-normalized vectors (stored code = IP) but kept
 *  distinct in catalog metadata so optimizer metric-compatibility checks work. */
sealed abstract class Metric(val code: Int, val name: String) extends Serializable {
  /** Distance where lower = closer. */
  def distance(a: Array[Float], b: Array[Float]): Float
}
object Metric {
  case object L2 extends Metric(0, "l2") {
    def distance(a: Array[Float], b: Array[Float]): Float = VectorOps.l2Sq(a, b)
  }
  case object InnerProduct extends Metric(1, "ip") {
    def distance(a: Array[Float], b: Array[Float]): Float = VectorOps.ipDistance(a, b)
  }
  /** Cosine: vectors are normalized at build/query time; distance = -dot = -cos. */
  case object Cosine extends Metric(1, "cosine") {
    def distance(a: Array[Float], b: Array[Float]): Float = VectorOps.ipDistance(a, b)
  }
  def fromName(s: String): Metric = s.toLowerCase match {
    case "l2" | "euclidean"            => L2
    case "ip" | "innerproduct" | "dot" => InnerProduct
    case "cosine" | "cos"              => Cosine
    case other => throw new IllegalArgumentException(s"unknown metric: $other")
  }
  def fromCode(code: Int, cosine: Boolean = false): Metric =
    if (cosine) Cosine else if (code == 1) InnerProduct else L2
}
