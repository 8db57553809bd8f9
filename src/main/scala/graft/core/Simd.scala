package graft.core

/**
 * Availability probe + dispatch for [[SimdKernels]] (jdk.incubator.vector).
 *
 * The kernels class only links if the JVM was started with
 * `--add-modules=jdk.incubator.vector` (wired in build.sbt for all forked
 * runs; a cluster deploy adds it via `spark.executor.extraJavaOptions` AND
 * the driver's extraJavaOptions — mixed driver/executor enablement would
 * mean the two compute float sums in different association orders, which
 * changes last-ulp distances and can flip near-ties). Without the module,
 * class-load throws and every call routes to the scalar loops — same
 * semantics, HotSpot auto-vectorized, float results differing from the
 * lane kernels only by summation order.
 *
 * The buffer kernels probe separately: `FloatVector.fromByteBuffer` exists
 * on JDK 17/18 but was replaced by fromMemorySegment in JDK 19+, so a jar
 * built here may link the array kernels yet fail the buffer ones.
 */
object Simd {

  /** Probe length. Must exceed 2× the widest SPECIES_PREFERRED lane count
   *  (16 floats on AVX-512) so the vectorized loop body — not just the
   *  scalar tail — executes at least once. The JVM links method refs
   *  lazily at first execution: a 2-element probe would "pass" on JDK 19+
   *  and only hit the removed `FloatVector.fromByteBuffer` at query time. */
  private val ProbeLen = 64

  val enabled: Boolean =
    try {
      val ones = Array.fill(ProbeLen)(1f)
      SimdKernels.dot(ones, 0, ones, 0, ProbeLen) == ProbeLen.toFloat &&
        SimdKernels.l2Sq(ones, 0, ones, 0, ProbeLen) == 0f
    } catch { case _: Throwable => false }

  /** Buffer-kernel availability (probed independently: see scaladoc). */
  val bbEnabled: Boolean = enabled && {
    try {
      val bb = java.nio.ByteBuffer.allocate(ProbeLen * 4).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      var i = 0
      while (i < ProbeLen) { bb.putFloat(i * 4, 2f); i += 1 }
      val ones = Array.fill(ProbeLen)(1f)
      val twos = Array.fill(ProbeLen)(2f)
      // all-equal inputs make both results exact under any summation order
      SimdKernels.dotBB(bb, 0, ones) == 2f * ProbeLen &&
        SimdKernels.l2SqBB(bb, 0, twos) == 0f
    } catch { case _: Throwable => false }
  }

  @inline def dot(a: Array[Float], ao: Int, b: Array[Float], bo: Int, len: Int): Float =
    if (enabled) SimdKernels.dot(a, ao, b, bo, len)
    else {
      var s = 0.0f; var i = 0
      while (i < len) { s += a(ao + i) * b(bo + i); i += 1 }
      s
    }

  @inline def l2Sq(a: Array[Float], ao: Int, b: Array[Float], bo: Int, len: Int): Float =
    if (enabled) SimdKernels.l2Sq(a, ao, b, bo, len)
    else {
      var s = 0.0f; var i = 0
      while (i < len) { val d = a(ao + i) - b(bo + i); s += d * d; i += 1 }
      s
    }

  /** Zero-copy squared L2 against `dim` little-endian floats at `byteOff`
   *  in a (mapped) buffer. Absolute reads — safe on a shared buffer.
   *  Callers needing bit-parity with the array kernels must check
   *  [[bbEnabled]] and route through a copy + [[l2Sq]] when false (the
   *  DiskannMmapIndex cursor does); this scalar fallback alone sums in a
   *  different order than the lane kernels. */
  @inline def l2SqBB(bb: java.nio.ByteBuffer, byteOff: Int, q: Array[Float]): Float =
    if (bbEnabled) SimdKernels.l2SqBB(bb, byteOff, q)
    else {
      var s = 0.0f; var i = 0
      while (i < q.length) { val d = bb.getFloat(byteOff + i * 4) - q(i); s += d * d; i += 1 }
      s
    }

  /** Zero-copy dot product against `dim` little-endian floats at `byteOff`;
   *  same bit-parity caveat as [[l2SqBB]]. */
  @inline def dotBB(bb: java.nio.ByteBuffer, byteOff: Int, q: Array[Float]): Float =
    if (bbEnabled) SimdKernels.dotBB(bb, byteOff, q)
    else {
      var s = 0.0f; var i = 0
      while (i < q.length) { s += bb.getFloat(byteOff + i * 4) * q(i); i += 1 }
      s
    }

  /** Gemm-shaped hop kernel: out(i) = l2Sq(block row i, query qmap(i)).
   *  Per-row math identical to [[l2Sq]] → batch == per-pair bit-exactly. */
  def l2SqBatch(block: Array[Float], queriesFlat: Array[Float], qmap: Array[Int],
      n: Int, dim: Int, out: Array[Float]): Unit =
    if (enabled) SimdKernels.l2SqBatch(block, queriesFlat, qmap, n, dim, out)
    else {
      var i = 0
      while (i < n) { out(i) = l2Sq(block, i * dim, queriesFlat, qmap(i) * dim, dim); i += 1 }
    }

  /** Gemm-shaped hop kernel: out(i) = -dot(block row i, query qmap(i)). */
  def negDotBatch(block: Array[Float], queriesFlat: Array[Float], qmap: Array[Int],
      n: Int, dim: Int, out: Array[Float]): Unit =
    if (enabled) SimdKernels.negDotBatch(block, queriesFlat, qmap, n, dim, out)
    else {
      var i = 0
      while (i < n) { out(i) = -dot(block, i * dim, queriesFlat, qmap(i) * dim, dim); i += 1 }
    }

  @inline def cosine(a: Array[Float], ao: Int, b: Array[Float], bo: Int, len: Int): Float =
    if (enabled) SimdKernels.cosine(a, ao, b, bo, len)
    else {
      var ab = 0.0f; var aa = 0.0f; var bb = 0.0f; var i = 0
      while (i < len) {
        ab += a(ao + i) * b(bo + i); aa += a(ao + i) * a(ao + i)
        bb += b(bo + i) * b(bo + i); i += 1
      }
      val den = math.sqrt(aa.toDouble) * math.sqrt(bb.toDouble)
      if (den == 0.0) 0.0f else (ab / den).toFloat
    }
}
