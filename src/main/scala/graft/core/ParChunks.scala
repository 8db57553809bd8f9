package graft.core

/**
 * Deterministic chunk-parallel loops for driver-side training kernels
 * (k-means, OPQ). The input range splits into FIXED chunks; the parallel
 * phase writes only per-chunk state, and callers reduce chunk results in
 * chunk order — so floating-point accumulation order is identical on every
 * run regardless of thread scheduling, and identical to a machine with a
 * different core count. (Plain `.par`-style reductions would make double
 * sums scheduling-dependent.)
 */
object ParChunks {

  /** Fixed chunk size — small enough to load-balance 25k-sample training
   *  across 32 threads, large enough that per-chunk state dominates the
   *  fork/join overhead. */
  val ChunkSize = 2048

  def numChunks(n: Int): Int = (n + ChunkSize - 1) / ChunkSize

  /** Run `body(chunkIndex, start, endExclusive)` for every chunk, in
   *  parallel when there is more than one chunk. `body` must only write
   *  state owned by its chunk index. */
  def foreach(n: Int)(body: (Int, Int, Int) => Unit): Unit = {
    val nc = numChunks(n)
    if (nc <= 1) { if (n > 0) body(0, 0, n) }
    else java.util.stream.IntStream.range(0, nc).parallel().forEach { ci =>
      body(ci, ci * ChunkSize, math.min(n, (ci + 1) * ChunkSize))
    }
  }

  /** Parallel independent tasks (e.g. one per PQ subspace), each writing its
   *  own output slot. */
  def tasks(n: Int)(body: Int => Unit): Unit =
    if (n <= 1) { if (n == 1) body(0) }
    else java.util.stream.IntStream.range(0, n).parallel().forEach(i => body(i))
}
