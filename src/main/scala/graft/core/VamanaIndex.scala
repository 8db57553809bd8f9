package graft.core

import java.util.Arrays

/**
 * In-memory Vamana (DiskANN) graph index over `Array[Float]` vectors.
 *
 * Semantics follow the reference engine's build/search contract:
 *  - incremental build: each insert = greedy search for candidates, then
 *    alpha-RNG robust prune, then bidirectional edge repair with overflow
 *    pruning (reference rust_lib/src/index_manager.rs:263-313, which
 *    delegates to the public `diskann` crate; algorithm per the DiskANN /
 *    Vamana paper, Subramanya et al., NeurIPS'19).
 *  - greedy best-first beam search with a bounded sorted result list
 *    (reference rust_lib/src/disk_provider.rs:339-462, insert_result
 *    :656-678); `L = max(k, searchComplexity else buildComplexity)`
 *    (index_manager.rs:344-350).
 *  - L2 distances are *squared* L2; IP distances are negated dot products
 *    (distance.rs:15-25). Cosine = IP over pre-normalized vectors.
 *
 * Single-threaded per instance by design — one shard is built/searched inside
 * one Spark task; cluster parallelism comes from shard-per-partition layout.
 */
final class VamanaIndex(
    val dim: Int,
    val metric: Metric,
    val maxDegree: Int = VamanaIndex.DefaultMaxDegree,
    val buildComplexity: Int = VamanaIndex.DefaultBuildComplexity,
    val alpha: Float = VamanaIndex.DefaultAlpha,
    initialCapacity: Int = 1024) extends GraphIndex with NodeStore with NodeCursor {

  require(dim > 0, "dimension must be positive")
  require(maxDegree > 0 && buildComplexity > 0)

  // Flat row-major vector storage, grown by doubling (reference provider.rs:42-43).
  private var vecs: Array[Float] = new Array[Float](math.max(initialCapacity, 4) * dim)
  // Per-node adjacency: ids in adj(i)(0 until degree(i)); slot arrays sized with
  // slack so back-edge inserts rarely reallocate before the overflow prune fires.
  private var adj: Array[Array[Int]] = new Array[Array[Int]](math.max(initialCapacity, 4))
  private var degree: Array[Int] = new Array[Int](math.max(initialCapacity, 4))
  private var count = 0

  /** Overflow slack before a node's neighbor list is re-pruned (diskann crate
   *  `MaxDegree::default_slack`). */
  private val slackDegree: Int = math.max(maxDegree + 1, (maxDegree * 1.3).toInt)

  var entryPoints: Array[Int] = Array.emptyIntArray

  // Optional scalar-quantized storage (quantize() swaps search reads to
  // dequantized codes: u8 for SQ8, packed for SQ4/SQ6).
  private var sq8: ScalarQuant = null

  // Build is single-threaded per shard; reuse one searcher's scratch buffers
  // across inserts (reference uses thread-local scratch, index_manager.rs:197-224).
  @transient private lazy val buildBeam = new BeamSearcher(this)

  def size: Int = count
  def isQuantized: Boolean = sq8 != null
  def sq8Data: ScalarQuant = sq8

  def vector(id: Int): Array[Float] = {
    val out = new Array[Float](dim)
    if (sq8 != null) sq8.dequantizeInto(id, out)
    else System.arraycopy(vecs, id * dim, out, 0, dim)
    out
  }

  /** Raw full-precision storage (valid for ids < size); for serialization. */
  def rawVectors: Array[Float] = vecs
  def neighbors(id: Int): Array[Int] = Arrays.copyOf(adj(id), degree(id))

  private def ensureCapacity(n: Int): Unit = {
    // Long math: n*dim overflows Int at ~33M vectors × dim 64, which would
    // silently skip the grow and corrupt offsets. Oversized shards fail loud.
    if (n.toLong * dim > vecs.length) {
      require(n.toLong * dim <= (Int.MaxValue - 8).toLong,
        s"Vamana shard too large: $n vectors x dim $dim exceeds a single " +
        "float[]; raise numShards so each shard holds fewer vectors")
      var cap = math.max(vecs.length / dim, 4).toLong
      while (cap < n) cap *= 2
      val capI = math.min(cap, ((Int.MaxValue - 8) / dim).toLong).toInt
      vecs = Arrays.copyOf(vecs, capI * dim)
      adj = Arrays.copyOf(adj, capI)
      degree = Arrays.copyOf(degree, capI)
    }
  }

  // distance kernels route through Simd (jdk.incubator.vector when enabled).
  // NOTE: search paths go through newCursor() — when quantized, the cursor
  // dequantizes into scratch and uses the same Simd kernels as the batch
  // gather, NOT this fused scalar variant (kept for non-search callers).
  @inline def dist(a: Int, q: Array[Float]): Float = {
    if (sq8 != null) sq8.distance(metric, a, q)
    else if (metric eq Metric.L2) Simd.l2Sq(vecs, a * dim, q, 0, dim)
    else -Simd.dot(vecs, a * dim, q, 0, dim)
  }

  @inline private def distNodes(a: Int, b: Int): Float =
    if (metric eq Metric.L2) Simd.l2Sq(vecs, a * dim, vecs, b * dim, dim)
    else -Simd.dot(vecs, a * dim, vecs, b * dim, dim)

  // ---- NodeStore / NodeCursor (shared BeamSearcher contract). The index
  // itself is the cursor: its accessors are stateless, and one instance is
  // only ever built/searched single-threaded per task.
  def nodeCount: Int = count
  def entryPointIds: Array[Int] = entryPoints
  def degreeBound: Int = slackDegree
  // SQ8 gets a dedicated cursor whose per-pair dist dequantizes into a
  // private scratch row and runs the SAME array kernel the gemm batch path
  // uses — so per-query and lock-step accumulate in the same order and stay
  // bit-identical (the old fused dequantize+distance loop summed in scalar
  // order, which forced batch hops down to per-pair distances). The scratch
  // lives in the cursor, keeping concurrent searches over a shared cached
  // shard race-free.
  def newCursor(): NodeCursor = if (sq8 == null) this else new NodeCursor {
    private val q8 = sq8
    private val scratch = new Array[Float](dim)
    def dist(id: Int, q: Array[Float]): Float = {
      q8.dequantizeInto(id, scratch)
      if (metric eq Metric.L2) Simd.l2Sq(scratch, 0, q, 0, dim)
      else -Simd.dot(scratch, 0, q, 0, dim)
    }
    def neighborsInto(id: Int, buf: Array[Int]): Int =
      VamanaIndex.this.neighborsInto(id, buf)
    override def gatherable: Boolean = true
    override def copyVector(id: Int, dst: Array[Float], dstOff: Int): Unit =
      q8.dequantizeInto(id, dst, dstOff)
  }
  // gemm gather over raw full-precision rows matches the array-kernel dist
  // path bit-exactly
  override def gatherable: Boolean = sq8 == null
  override def copyVector(id: Int, dst: Array[Float], dstOff: Int): Unit =
    System.arraycopy(vecs, id * dim, dst, dstOff, dim)
  def neighborsInto(id: Int, buf: Array[Int]): Int = {
    val d = degree(id)
    System.arraycopy(adj(id), 0, buf, 0, d)
    d
  }

  /** Insert one vector; returns its label (dense 0..N-1). */
  def add(v: Array[Float]): Int = {
    require(v.length == dim, s"expected dimension $dim, got ${v.length}")
    require(sq8 == null, "cannot insert into a quantized index")
    val label = count
    ensureCapacity(count + 1)
    System.arraycopy(v, 0, vecs, label * dim, dim)
    adj(label) = new Array[Int](slackDegree)
    degree(label) = 0
    count += 1

    if (label == 0) {
      entryPoints = Array(0)
      return label
    }

    // 1. Greedy search from entry points with L=buildComplexity; the visited
    //    (expanded) set with distances is the prune candidate pool.
    val beam = buildBeam
    beam.search(v, buildComplexity, buildComplexity, excludeSelf = label)
    val candIds = beam.visitedIds
    val candDists = beam.visitedDists
    val nCand = beam.visitedCount

    // 2. Robust prune to choose this node's out-neighbors.
    val chosen = robustPrune(label, candIds, candDists, nCand, maxDegree)
    var i = 0
    while (i < chosen.length) {
      adj(label)(i) = chosen(i); i += 1
    }
    degree(label) = chosen.length

    // 3. Bidirectional edge repair: add back-edges; re-prune only when a
    //    node's slack buffer fills (pruning on every overflow past maxDegree
    //    made back-edge maintenance the dominant build cost — the slack
    //    exists precisely to amortize it, diskann crate MaxDegree slack).
    //    finalizePruning() restores the maxDegree bound before serialization.
    i = 0
    while (i < chosen.length) {
      val q = chosen(i)
      if (!containsNeighbor(q, label)) {
        if (degree(q) < adj(q).length) {
          adj(q)(degree(q)) = label
          degree(q) += 1
        }
        if (degree(q) >= adj(q).length) pruneNode(q)
      }
      i += 1
    }
    label
  }

  /**
   * Parallel graph construction for the tail of a bulk build (native DiskANN
   * builds its graph with an OpenMP parallel insert loop over per-node
   * locks; this is the same shape for one shard built inside one Spark task
   * that has `spark.task.cpus` > 1 — locally, idle cores of a small-task
   * stage). `threads <= 1` falls back to the serial, deterministic [[add]]
   * loop; with more threads the vectors/ids/labels are still assigned in
   * input order (the id↔label mapping is deterministic), but edge sets vary
   * run-to-run like any racy approximate-graph build.
   *
   * Safety: all vectors and adjacency rows are pre-stored serially before
   * workers start, so the backing arrays never reallocate mid-build and a
   * racy reader can only ever observe valid (possibly stale) labels;
   * adjacency writes happen under striped per-node locks. Unprocessed nodes
   * have no in-edges, so greedy searches cannot reach them — matching the
   * serial build's "only previously inserted nodes are candidates"
   * semantics.
   */
  def addAllParallel(vs: Array[Array[Float]], threads: Int): Unit = {
    require(sq8 == null, "cannot insert into a quantized index")
    if (vs.isEmpty) return
    if (threads <= 1 || vs.length < VamanaIndex.MinParallelBatch) {
      vs.foreach(add); return
    }
    var skip = 0
    if (count == 0) { add(vs(0)); skip = 1 } // anchor entry point serially
    val base = count
    val m = vs.length - skip
    ensureCapacity(base + m)
    var j = 0
    while (j < m) {
      val v = vs(skip + j)
      require(v.length == dim, s"expected dimension $dim, got ${v.length}")
      System.arraycopy(v, 0, vecs, (base + j) * dim, dim)
      adj(base + j) = new Array[Int](slackDegree)
      degree(base + j) = 0
      j += 1
    }
    count = base + m
    val next = new java.util.concurrent.atomic.AtomicInteger(base)
    val failure = new java.util.concurrent.atomic.AtomicReference[Throwable]()
    val workers = Array.tabulate(threads) { _ =>
      val t = new Thread(() => {
        try {
          val beam = new BeamSearcher(this)
          val q = new Array[Float](dim)
          var label = next.getAndIncrement()
          while (label < base + m && failure.get == null) {
            System.arraycopy(vecs, label * dim, q, 0, dim)
            insertEdges(label, q, beam)
            label = next.getAndIncrement()
          }
        } catch { case e: Throwable => failure.compareAndSet(null, e) }
      })
      t.setDaemon(true); t.start(); t
    }
    workers.foreach(_.join())
    if (failure.get != null) throw failure.get
    lastBuildThreads = threads
  }

  /** Worker count of the last parallel build; finalizePruning reuses it so
   *  an explicitly-parallel build also finalizes in parallel, while serial
   *  builds keep the single-threaded path. */
  @volatile private var lastBuildThreads = 1

  // striped per-node write locks for the parallel build (reads stay lock-free)
  @transient private lazy val buildLocks: Array[AnyRef] = Array.fill(1024)(new AnyRef)
  @inline private def lockFor(node: Int): AnyRef = buildLocks(node & 1023)

  /** One node's edge construction — the parallel-build worker body: greedy
   *  search + robust prune (lock-free reads), then locked adjacency write
   *  (merging back-edges that landed concurrently) and back-edge repair. */
  private def insertEdges(label: Int, v: Array[Float], beam: BeamSearcher): Unit = {
    beam.search(v, buildComplexity, buildComplexity, excludeSelf = label)
    val chosen = robustPrune(label, beam.visitedIds, beam.visitedDists,
      beam.visitedCount, maxDegree)
    lockFor(label).synchronized {
      val d0 = degree(label)
      val existing = Arrays.copyOf(adj(label), d0)
      var i = 0
      while (i < chosen.length) { adj(label)(i) = chosen(i); i += 1 }
      var dl = chosen.length
      var e = 0
      while (e < d0 && dl < adj(label).length) {
        val b = existing(e)
        var dup = false; var c = 0
        while (c < chosen.length && !dup) { if (chosen(c) == b) dup = true; c += 1 }
        if (!dup) { adj(label)(dl) = b; dl += 1 }
        e += 1
      }
      degree(label) = dl
      if (dl >= adj(label).length) pruneNode(label)
    }
    var i = 0
    while (i < chosen.length) {
      val q = chosen(i)
      lockFor(q).synchronized {
        if (!containsNeighbor(q, label)) {
          if (degree(q) < adj(q).length) {
            adj(q)(degree(q)) = label
            degree(q) += 1
          }
          if (degree(q) >= adj(q).length) pruneNode(q)
        }
      }
      i += 1
    }
  }

  /** Prune every node back to ≤ maxDegree (slack buffers may be overfull
   *  after a build); call before serialization or when a strict degree
   *  bound is needed. */
  def finalizePruning(): Unit = finalizePruning(lastBuildThreads)

  /** Per-node pruning is independent (each prune writes only its own node's
   *  adjacency and reads only other nodes' VECTORS), so the parallel variant
   *  is lock-free AND bit-deterministic — same result for any thread count. */
  def finalizePruning(threads: Int): Unit = {
    if (threads <= 1 || count < VamanaIndex.MinParallelBatch) {
      var i = 0
      while (i < count) {
        if (degree(i) > maxDegree) pruneNode(i)
        i += 1
      }
      return
    }
    val next = new java.util.concurrent.atomic.AtomicInteger(0)
    val chunk = 1024
    val failure = new java.util.concurrent.atomic.AtomicReference[Throwable]()
    val workers = Array.tabulate(threads) { _ =>
      val t = new Thread(() => {
        try {
          var lo = next.getAndAdd(chunk)
          while (lo < count && failure.get == null) {
            val hi = math.min(lo + chunk, count)
            var i = lo
            while (i < hi) {
              if (degree(i) > maxDegree) pruneNode(i)
              i += 1
            }
            lo = next.getAndAdd(chunk)
          }
        } catch { case e: Throwable => failure.compareAndSet(null, e) }
      })
      t.setDaemon(true); t.start(); t
    }
    workers.foreach(_.join())
    if (failure.get != null) throw failure.get
  }

  @inline private def containsNeighbor(node: Int, target: Int): Boolean = {
    val a = adj(node); val d = degree(node)
    var i = 0
    while (i < d) { if (a(i) == target) return true; i += 1 }
    false
  }

  /** Re-prune node's neighbor list down to maxDegree with the alpha-RNG rule. */
  private def pruneNode(node: Int): Unit = {
    val d = degree(node)
    val ids = new Array[Int](d)
    val ds = new Array[Float](d)
    var i = 0
    while (i < d) { ids(i) = adj(node)(i); ds(i) = distNodes(node, adj(node)(i)); i += 1 }
    val chosen = robustPrune(node, ids, ds, d, maxDegree)
    i = 0
    while (i < chosen.length) { adj(node)(i) = chosen(i); i += 1 }
    degree(node) = chosen.length
  }

  /**
   * Alpha-RNG robust prune (Vamana paper Algorithm 2): repeatedly take the
   * closest remaining candidate p*, then drop every candidate v with
   * `alpha * d(p*, v) <= d(p, v)` — i.e. v is better reached through p*.
   */
  private def robustPrune(p: Int, candIds: Array[Int], candDists: Array[Float],
      n: Int, limit: Int): Array[Int] = {
    // pack (dist, candidate-slot) and sort — primitive, no boxing
    val packed = new Array[Long](n)
    var m = 0
    var i = 0
    while (i < n) {
      if (candIds(i) != p) { packed(m) = SortableF32.pack(candDists(i), i); m += 1 }
      i += 1
    }
    java.util.Arrays.sort(packed, 0, m)
    // cap the occlusion pool to the closest candidates: the diskann crate
    // prunes from the L-bounded search pool, not every visited node —
    // bounds build cost at O(limit · pool · dim) instead of O(limit ·
    // |visited| · dim), which dominated large builds
    val poolCap = math.max(buildComplexity, 2 * limit)
    if (m > poolCap) m = poolCap
    val chosen = new Array[Int](math.min(limit, m))
    var nChosen = 0
    val killed = new Array[Boolean](m)
    // dedup by id (keep first = closest)
    val seen = new IntSet(m * 2)
    var oi = 0
    while (oi < m && nChosen < limit) {
      if (!killed(oi)) {
        val star = candIds(SortableF32.idOf(packed(oi)))
        if (seen.add(star)) {
          chosen(nChosen) = star
          nChosen += 1
          // occlude candidates dominated by star
          var oj = oi + 1
          while (oj < m) {
            if (!killed(oj)) {
              val cj = SortableF32.idOf(packed(oj))
              val dStarV = distNodes(star, candIds(cj))
              if (alpha * dStarV <= candDists(cj)) killed(oj) = true
            }
            oj += 1
          }
        }
      }
      oi += 1
    }
    Arrays.copyOf(chosen, nChosen)
  }

  /**
   * Top-k beam search. Returns (labels, distances) sorted by distance asc.
   * `searchComplexity <= 0` means "use buildComplexity" (index_manager.rs:344-350).
   */
  def search(query: Array[Float], k: Int, searchComplexity: Int): (Array[Int], Array[Float]) = {
    if (count == 0 || k <= 0) return (Array.emptyIntArray, Array.emptyFloatArray)
    require(query.length == dim, s"query dimension ${query.length} != index dimension $dim")
    val kk = math.min(k, count)
    val baseL = if (searchComplexity > 0) searchComplexity else buildComplexity
    val l = math.max(kk, baseL)
    val beam = new BeamSearcher(this)
    beam.search(query, kk, l, excludeSelf = -1)
    beam.topK(kk)
  }

  /** Lock-step multi-query batch search — bit-identical to per-query
   *  [[search]] (same traversal primitives, same per-row kernels), but the
   *  per-hop candidate distances of all queries are computed as one SIMD
   *  block (reference rust_lib/src/provider.rs:248-440). */
  override def searchBatch(queries: Array[Array[Float]], k: Int,
      searchComplexity: Int = 0): Array[(Array[Int], Array[Float])] = {
    if (count == 0 || k <= 0)
      return queries.map(_ => (Array.emptyIntArray, Array.emptyFloatArray))
    if (queries.length == 1)
      return queries.map(q => search(q, k, searchComplexity))
    queries.foreach(q => require(q.length == dim,
      s"query dimension ${q.length} != index dimension $dim"))
    val kk = math.min(k, count)
    val baseL = if (searchComplexity > 0) searchComplexity else buildComplexity
    val l = math.max(kk, baseL)
    BeamSearcher.searchBatch(this, metric, queries, kk, l)
  }

  /** Bulk-load deserialized state (DiskannFormat.read). */
  private[core] def load(n: Int, vectors: Array[Float],
      adjacency: Array[Array[Int]], eps: Array[Int]): Unit = {
    require(vectors.length >= n * dim)
    ensureCapacity(math.max(n, 1))
    System.arraycopy(vectors, 0, vecs, 0, n * dim)
    var i = 0
    while (i < n) {
      val nbrs = adjacency(i)
      adj(i) = if (nbrs.length >= slackDegree) nbrs
               else Arrays.copyOf(nbrs, slackDegree)
      degree(i) = nbrs.length
      i += 1
    }
    count = n
    entryPoints = eps
  }

  /** Scalar-quantize all stored vectors (reference provider.rs:161-210 for
   *  the u8 scheme; SQ4/SQ6 pack sub-byte codes — SqPackedCodec). Search
   *  afterwards reads dequantized values; inserts are frozen. */
  def quantize(bits: Int = 8): Unit = {
    if (count == 0) return
    sq8 = if (bits == 8) Sq8Codec.quantize(vecs, count, dim)
      else SqPackedCodec.quantize(vecs, count, dim, bits)
  }

  def loadSq8(data: ScalarQuant): Unit = { sq8 = data }

  /** Approximate resident bytes (vectors + adjacency [+ SQ8]). */
  def memoryBytes: Long = {
    var b = count.toLong * dim * 4 + count.toLong * slackDegree * 4
    if (sq8 != null) b += sq8.data.length.toLong + sq8.min.length.toLong * 8
    b
  }

  // ---------------------------------------------------------------- internal

}

object VamanaIndex {
  // Reference defaults: src/include/diskann_index.hpp:21-25.
  val DefaultMaxDegree = 64
  val DefaultBuildComplexity = 128
  val DefaultAlpha = 1.2f
  /** Below this batch size thread spin-up outweighs the parallel win. */
  val MinParallelBatch = 2048

  /** Build from an iterator (per-shard build inside a Spark task). */
  def build(vectors: Iterator[Array[Float]], dim: Int, metric: Metric,
      maxDegree: Int = DefaultMaxDegree,
      buildComplexity: Int = DefaultBuildComplexity,
      alpha: Float = DefaultAlpha): VamanaIndex = {
    val ix = new VamanaIndex(dim, metric, maxDegree, buildComplexity, alpha)
    val normalize = metric eq Metric.Cosine
    vectors.foreach { v =>
      ix.add(if (normalize) VectorOps.normalize(v.clone()) else v)
    }
    ix
  }
}
