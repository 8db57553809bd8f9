package graft.core

/**
 * Common contract of the per-shard graph ANN engines (Vamana/DiskANN and
 * HNSW). One instance is built/searched inside one Spark task; distances
 * follow the reference engine: squared L2, negated IP, cosine = negated IP
 * over pre-normalized vectors (reference rust_lib/src/distance.rs:15-25).
 */
trait GraphIndex extends Serializable {
  def dim: Int
  def metric: Metric
  def size: Int

  /** Insert one vector; returns its dense label 0..N-1. */
  def add(v: Array[Float]): Int

  /** Top-k search → (labels, distances) ascending.
   *  `searchComplexity <= 0` = use the build-time default. */
  def search(query: Array[Float], k: Int, searchComplexity: Int = 0): (Array[Int], Array[Float])

  /** Multi-query top-k search, results per query in input order. Default =
   *  independent per-query searches; the diskann engines override with the
   *  lock-step batch traversal (reference rust_lib/src/provider.rs:248-440)
   *  which returns bit-identical results while computing each hop's
   *  distances as one gemm-shaped SIMD block. */
  def searchBatch(queries: Array[Array[Float]], k: Int,
      searchComplexity: Int = 0): Array[(Array[Int], Array[Float])] =
    queries.map(q => search(q, k, searchComplexity))

  /** Reconstructed full-precision vector for a label (for vacuum/merge). */
  def vector(id: Int): Array[Float]

  def memoryBytes: Long

  /**
   * [[search]] with the saturation-exactness precondition ENFORCED instead
   * of assumed: a saturating request (k >= [[size]] — what the `*_exact`
   * saturation oracles and the filtered route's escalation issue to obtain
   * provably exact answers) visits every node REACHABLE from the entry
   * points, so on a connected graph it returns all `size` labels. Heavy
   * delete/append churn before a vacuum can orphan a node; a plain beam
   * search silently excludes it even at saturation (the documented
   * precondition in docs/ORACLES.md §3; the reference's over-request has
   * the same blind spot, src/diskann_index.cpp:558-561). Here, when a
   * saturating search comes back short, the missing labels are
   * linear-scanned (distance under the index [[metric]] over [[vector]])
   * and merged by (distance, label), restoring the exact contract at
   * O(orphans·dim) extra cost. Non-saturating requests (k < size) and
   * fully-covered saturating ones (every fresh build — connected by
   * construction) pass through bit-identically.
   *
   * SQ8-quantized shards reconstruct [[vector]] by dequantization, so an
   * orphan's merged distance is the dequantized-exact one — consistent
   * with the engine's own codes up to the quantizer's resolution.
   */
  final def searchSaturationChecked(query: Array[Float], k: Int,
      searchComplexity: Int = 0): (Array[Int], Array[Float]) = {
    val r = search(query, k, searchComplexity)
    if (k < size || r._1.length >= size) r
    else augmentUnreached(query, r, k)
  }

  /** [[searchBatch]] under the same enforced saturation contract. */
  final def searchBatchSaturationChecked(queries: Array[Array[Float]], k: Int,
      searchComplexity: Int = 0): Array[(Array[Int], Array[Float])] = {
    val rs = searchBatch(queries, k, searchComplexity)
    if (k < size) rs
    else {
      var i = 0
      while (i < rs.length) {
        if (rs(i)._1.length < size) rs(i) = augmentUnreached(queries(i), rs(i), k)
        i += 1
      }
      rs
    }
  }

  private def augmentUnreached(query: Array[Float],
      r: (Array[Int], Array[Float]), k: Int): (Array[Int], Array[Float]) = {
    val (labels, dists) = r
    val seen = new java.util.BitSet(size)
    var i = 0
    while (i < labels.length) { seen.set(labels(i)); i += 1 }
    val n = size
    val outL = new Array[Int](n)
    val outD = new Array[Float](n)
    System.arraycopy(labels, 0, outL, 0, labels.length)
    System.arraycopy(dists, 0, outD, 0, labels.length)
    var w = labels.length
    i = 0
    while (i < n) {
      if (!seen.get(i)) {
        outL(w) = i
        outD(w) = metric.distance(query, vector(i))
        w += 1
      }
      i += 1
    }
    // merged order: (distance, label) — deterministic, and identical to the
    // traversal's own ascending order wherever distances are distinct
    val idx = Array.range(0, n).sortBy(j => (outD(j), outL(j)))
    val take = math.min(k, n)
    (idx.take(take).map(outL), idx.take(take).map(outD))
  }
}
