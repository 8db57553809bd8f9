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
}
