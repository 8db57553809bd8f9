package graft.core

import java.util.Arrays

/**
 * Minimal storage contract the greedy beam search needs — implemented by the
 * heap-resident [[VamanaIndex]] and the disk-resident [[DiskannMmapIndex]],
 * so BOTH serve through the exact same search code path (identical visit
 * order, identical results for the same bytes).
 *
 * A cursor bundles the per-search scratch state (buffer views, copy
 * buffers): one cursor per [[BeamSearcher]], single-threaded, so a shared
 * store instance (e.g. one mmap) can be searched concurrently.
 */
private[core] trait NodeCursor {
  /** Distance (lower = closer) from node `id` to `q`. */
  def dist(id: Int, q: Array[Float]): Float
  /** Fill `buf` with the neighbor ids of `id`; returns the count. */
  def neighborsInto(id: Int, buf: Array[Int]): Int
}

private[core] trait NodeStore {
  def nodeCount: Int
  def entryPointIds: Array[Int]
  /** Upper bound on any node's degree (buffer sizing). */
  def degreeBound: Int
  def newCursor(): NodeCursor
}

/**
 * Reusable greedy best-first search over a [[NodeStore]]; exposes the
 * visited pool for Vamana's robustPrune (reference
 * rust_lib/src/disk_provider.rs:339-462, insert_result :656-678).
 */
private[core] final class BeamSearcher(store: NodeStore) {
  private val cursor = store.newCursor()
  private val nbrBuf = new Array[Int](math.max(store.degreeBound, 1))
  // bounded sorted result list (parallel arrays), mirrors insert_result
  private var resDist: Array[Float] = null
  private var resId: Array[Int] = null
  private var resLen = 0
  // candidate min-heap packed as long: sortableFloatBits(dist) << 32 | id
  private var heap: Array[Long] = new Array[Long](256)
  private var heapLen = 0
  private val visited = new IntSet(1024)
  // visited pool (every node whose distance was computed) for robustPrune
  var visitedIds: Array[Int] = new Array[Int](1024)
  var visitedDists: Array[Float] = new Array[Float](1024)
  var visitedCount = 0

  @inline private def heapPush(v: Long): Unit = {
    if (heapLen == heap.length) heap = Arrays.copyOf(heap, heapLen * 2)
    var i = heapLen; heap(i) = v; heapLen += 1
    while (i > 0 && heap((i - 1) / 2) > heap(i)) {
      val p = (i - 1) / 2
      val t = heap(p); heap(p) = heap(i); heap(i) = t
      i = p
    }
  }

  @inline private def heapPop(): Long = {
    val top = heap(0)
    heapLen -= 1
    heap(0) = heap(heapLen)
    var i = 0
    var done = false
    while (!done) {
      val l = 2 * i + 1; val r = l + 1
      var m = i
      if (l < heapLen && heap(l) < heap(m)) m = l
      if (r < heapLen && heap(r) < heap(m)) m = r
      if (m == i) done = true
      else { val t = heap(m); heap(m) = heap(i); heap(i) = t; i = m }
    }
    top
  }

  @inline private def recordVisited(id: Int, d: Float): Unit = {
    if (visitedCount == visitedIds.length) {
      visitedIds = Arrays.copyOf(visitedIds, visitedCount * 2)
      visitedDists = Arrays.copyOf(visitedDists, visitedCount * 2)
    }
    visitedIds(visitedCount) = id
    visitedDists(visitedCount) = d
    visitedCount += 1
  }

  /** Binary-search insert into the bounded result list (disk_provider.rs:656-678). */
  @inline private def insertResult(l: Int, d: Float, id: Int): Unit = {
    if (resLen < l || d < resDist(resLen - 1)) {
      var lo = 0; var hi = resLen
      while (lo < hi) {
        val mid = (lo + hi) >>> 1
        if (resDist(mid) < d) lo = mid + 1 else hi = mid
      }
      val insertAt = lo
      val newLen = math.min(resLen + 1, l)
      var i = newLen - 1
      while (i > insertAt) { resDist(i) = resDist(i - 1); resId(i) = resId(i - 1); i -= 1 }
      if (insertAt < l) { resDist(insertAt) = d; resId(insertAt) = id }
      resLen = newLen
      heapPush(SortableF32.pack(d, id))
    }
  }

  def search(query: Array[Float], k: Int, l: Int, excludeSelf: Int): Unit = {
    resDist = new Array[Float](l)
    resId = new Array[Int](l)
    resLen = 0; heapLen = 0; visitedCount = 0; visited.clear()
    val n = store.nodeCount
    val eps = store.entryPointIds
    var i = 0
    while (i < eps.length) {
      val ep = eps(i)
      if (ep < n && ep != excludeSelf && visited.add(ep)) {
        val d = cursor.dist(ep, query)
        recordVisited(ep, d)
        insertResultSeed(l, d, ep)
      }
      i += 1
    }
    while (heapLen > 0) {
      val top = heapPop()
      val cDist = SortableF32.distOf(top)
      if (resLen >= l && cDist > resDist(resLen - 1)) {
        heapLen = 0 // converged
      } else {
        val cId = SortableF32.idOf(top)
        val nd = cursor.neighborsInto(cId, nbrBuf)
        var j = 0
        while (j < nd) {
          val nb = nbrBuf(j)
          if (nb != excludeSelf && nb < n && visited.add(nb)) {
            val d = cursor.dist(nb, query)
            recordVisited(nb, d)
            insertResult(l, d, nb)
          }
          j += 1
        }
      }
    }
  }

  @inline private def insertResultSeed(l: Int, d: Float, id: Int): Unit = {
    // same as insertResult but always pushes the seed on the heap
    var lo = 0; var hi = resLen
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (resDist(mid) < d) lo = mid + 1 else hi = mid
    }
    if (lo < l) {
      val newLen = math.min(resLen + 1, l)
      var i = newLen - 1
      while (i > lo) { resDist(i) = resDist(i - 1); resId(i) = resId(i - 1); i -= 1 }
      resDist(lo) = d; resId(lo) = id
      resLen = newLen
    }
    heapPush(SortableF32.pack(d, id))
  }

  def topK(k: Int): (Array[Int], Array[Float]) = {
    val n = math.min(k, resLen)
    (Arrays.copyOf(resId, n), Arrays.copyOf(resDist, n))
  }
}
