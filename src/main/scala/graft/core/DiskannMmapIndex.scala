package graft.core

import java.io.{File, IOException, RandomAccessFile}
import java.nio.{ByteBuffer, ByteOrder}
import java.nio.channels.FileChannel

/**
 * Disk-resident `.diskann` shard served zero-copy from an mmap — the Spark
 * analog of the reference's DiskProvider (rust_lib/src/disk_provider.rs:
 * 182-279 maps the file once per process; :303-332 does offset arithmetic
 * into the image). Nothing is decoded up front: vectors and adjacency are
 * read straight out of the mapped region during the beam search, so serving
 * an N-GB shard costs ~0 heap and no deserialization latency, and the OS
 * page cache holds exactly the hot part of the graph.
 *
 * Search goes through the same [[BeamSearcher]] as the heap-resident
 * [[VamanaIndex]], so for identical bytes the two serving modes visit the
 * same nodes and return bit-identical results (asserted in
 * PersistenceSpec).
 *
 * Read-only by design: appends go to new delta shards (Ann.append), never
 * into a served image.
 *
 * SQ8-quantized shards serve from the mapped SQ8 APPENDIX (round-9): the
 * cursor dequantizes the u8 codes straight out of the mapped region into a
 * scratch row and runs the SAME Simd array kernels as the heap SQ8 cursor
 * (VamanaIndex.newCursor), so quantized mmap and quantized heap serving are
 * bit-identical — and the full-precision vector region's pages are never
 * touched during search, which is where the reference's ~4x vector-memory
 * reduction (rust_lib/src/provider.rs:161-241) materializes at serve time:
 * resident set = quantized codes + adjacency, not raw floats.
 */
final class DiskannMmapIndex private (
    buf: ByteBuffer, // mapped image, little-endian, position 0
    val dim: Int,
    n: Int,
    val maxDegree: Int,
    val buildComplexity: Int,
    val metric: Metric,
    val entryPoints: Array[Int],
    vecOff: Int,
    adjOff: Int,
    // SQ appendix (quantized serving); sq8DataOff < 0 = full-precision shard
    sq8Min: Array[Float],
    sq8Scale: Array[Float],
    sq8DataOff: Long,
    sqBits: Int) extends GraphIndex with NodeStore {

  def isQuantized: Boolean = sq8DataOff >= 0
  // packed-code geometry (SQ4/SQ6); for SQ8 rowStride == dim and the
  // extractor degenerates to the plain byte read
  private val sqRowStride: Int = if (sqBits == 8) dim else (dim * sqBits + 7) / 8
  private val sqLevels: Float = ((1 << sqBits) - 1).toFloat
  private val sqMask: Int = (1 << sqBits) - 1

  def size: Int = n

  def add(v: Array[Float]): Int =
    throw new UnsupportedOperationException(
      "mmap-served shard is read-only; appends create delta shards")

  /** Dequantize node `id` from the mapped SQ codes — same arithmetic as
   *  Sq8Data.dequantizeInto / SqPackedData.dequantizeInto, so values match
   *  the heap reader bit-exactly. */
  private def dequantizeInto(bb: ByteBuffer, id: Int, out: Array[Float],
      outOff: Int): Unit = {
    val off = sq8DataOff + id.toLong * sqRowStride
    var d = 0
    if (sqBits == 8) {
      while (d < dim) {
        out(outOff + d) =
          sq8Min(d) + ((bb.get((off + d).toInt) & 0xff) / 255.0f) * sq8Scale(d)
        d += 1
      }
    } else {
      while (d < dim) {
        val bitOff = d * sqBits
        val byteOff = (off + (bitOff >> 3)).toInt
        val shift = bitOff & 7
        val lo = bb.get(byteOff) & 0xff
        val hi = if (shift + sqBits > 8) (bb.get(byteOff + 1) & 0xff) << 8 else 0
        val code = ((lo | hi) >> shift) & sqMask
        out(outOff + d) = sq8Min(d) + (code / sqLevels) * sq8Scale(d)
        d += 1
      }
    }
  }

  def vector(id: Int): Array[Float] = {
    require(id >= 0 && id < n, s"label $id out of range [0, $n)")
    val out = new Array[Float](dim)
    if (isQuantized) {
      // quantized semantics: reads return dequantized values (heap parity —
      // VamanaIndex.vector dequantizes when quantized)
      dequantizeInto(buf.duplicate().order(ByteOrder.LITTLE_ENDIAN), id, out, 0)
    } else {
      val fb = buf.duplicate().order(ByteOrder.LITTLE_ENDIAN).asFloatBuffer()
      fb.get(vecOff / 4 + id * dim, out, 0, dim)
    }
    out
  }

  /** Heap cost of serving is ~0 (entry points + header); report the mapped
   *  extent so catalog diagnostics still reflect shard weight. */
  def memoryBytes: Long = buf.capacity().toLong

  def search(query: Array[Float], k: Int, searchComplexity: Int = 0): (Array[Int], Array[Float]) = {
    if (n == 0 || k <= 0) return (Array.emptyIntArray, Array.emptyFloatArray)
    require(query.length == dim, s"query dimension ${query.length} != index dimension $dim")
    val kk = math.min(k, n)
    val baseL = if (searchComplexity > 0) searchComplexity else buildComplexity
    val l = math.max(kk, baseL)
    val beam = new BeamSearcher(this)
    beam.search(query, kk, l, excludeSelf = -1)
    beam.topK(kk)
  }

  /** Lock-step multi-query batch search over the mapped image — bit-identical
   *  to per-query [[search]] (gathered copies scored with the array kernels,
   *  whose lane structure mirrors the zero-copy buffer kernels — the same
   *  equivalence PersistenceSpec asserts for mmap vs heap serving). */
  override def searchBatch(queries: Array[Array[Float]], k: Int,
      searchComplexity: Int = 0): Array[(Array[Int], Array[Float])] = {
    if (n == 0 || k <= 0)
      return queries.map(_ => (Array.emptyIntArray, Array.emptyFloatArray))
    if (queries.length == 1)
      return queries.map(q => search(q, k, searchComplexity))
    queries.foreach(q => require(q.length == dim,
      s"query dimension ${q.length} != index dimension $dim"))
    val kk = math.min(k, n)
    val baseL = if (searchComplexity > 0) searchComplexity else buildComplexity
    val l = math.max(kk, baseL)
    BeamSearcher.searchBatch(this, metric, queries, kk, l)
  }

  // ---- NodeStore
  def nodeCount: Int = n
  def entryPointIds: Array[Int] = entryPoints
  def degreeBound: Int = maxDegree

  /** One cursor per searcher: owns its buffer views (absolute indexed reads
   *  only), so concurrent searches share the map safely. Distances read
   *  ZERO-COPY out of the mapped image (SimdKernels.l2SqBB/dotBB — lane
   *  structure mirrors the array kernels, keeping mmap and heap serving
   *  bit-identical). */
  def newCursor(): NodeCursor = if (isQuantized) new NodeCursor {
    // quantized serving: dequantize mapped u8 codes into a private scratch
    // row, then the SAME array kernels as the heap SQ8 cursor
    // (VamanaIndex.newCursor) — bit-identical distances; the raw float
    // region is never read, so its pages stay non-resident
    private val qb = buf.duplicate().order(ByteOrder.LITTLE_ENDIAN)
    private val ib = buf.duplicate().order(ByteOrder.LITTLE_ENDIAN).asIntBuffer()
    private val adjIntBase = adjOff / 4
    private val scratch = new Array[Float](dim)
    def dist(id: Int, q: Array[Float]): Float = {
      dequantizeInto(qb, id, scratch, 0)
      if (metric eq Metric.L2) Simd.l2Sq(scratch, 0, q, 0, dim)
      else -Simd.dot(scratch, 0, q, 0, dim)
    }
    override def gatherable: Boolean = true
    override def copyVector(id: Int, dst: Array[Float], dstOff: Int): Unit =
      dequantizeInto(qb, id, dst, dstOff)
    def neighborsInto(id: Int, out: Array[Int]): Int =
      readNeighbors(ib, adjIntBase, id, out)
  } else new NodeCursor {
    private val vb = buf.duplicate().order(ByteOrder.LITTLE_ENDIAN)
    private val ib = buf.duplicate().order(ByteOrder.LITTLE_ENDIAN).asIntBuffer()
    private val adjIntBase = adjOff / 4
    // fallback when the buffer kernels don't link (e.g. JDK 19+ removed
    // FloatVector.fromByteBuffer): copy into scratch and use the SAME array
    // kernels as the heap path, preserving mmap/heap bit-identity
    private val fb =
      if (Simd.bbEnabled) null
      else buf.duplicate().order(ByteOrder.LITTLE_ENDIAN).asFloatBuffer()
    private val scratch = if (Simd.bbEnabled) null else new Array[Float](dim)

    def dist(id: Int, q: Array[Float]): Float = {
      val byteOff = vecOff + id * dim * 4
      if (Simd.bbEnabled) {
        if (metric eq Metric.L2) Simd.l2SqBB(vb, byteOff, q)
        else -Simd.dotBB(vb, byteOff, q)
      } else {
        fb.get(byteOff / 4, scratch, 0, dim)
        if (metric eq Metric.L2) Simd.l2Sq(scratch, 0, q, 0, dim)
        else -Simd.dot(scratch, 0, q, 0, dim)
      }
    }

    // gemm gather for the lock-step batch path: copied rows scored with the
    // array kernels equal the zero-copy buffer kernels bit-exactly (mirrored
    // lane structure — the same mmap/heap parity PersistenceSpec asserts)
    override def gatherable: Boolean = true
    private lazy val gatherFb = buf.duplicate().order(ByteOrder.LITTLE_ENDIAN).asFloatBuffer()
    override def copyVector(id: Int, dst: Array[Float], dstOff: Int): Unit =
      gatherFb.get(vecOff / 4 + id * dim, dst, dstOff, dim)

    def neighborsInto(id: Int, out: Array[Int]): Int =
      readNeighbors(ib, adjIntBase, id, out)
  }

  private def readNeighbors(ib: java.nio.IntBuffer, adjIntBase: Int, id: Int,
      out: Array[Int]): Int = {
    val base = adjIntBase + id * maxDegree
    var j = 0
    var done = false
    while (j < maxDegree && !done) {
      val nb = ib.get(base + j)
      if (nb == DiskannFormat.PadSentinel) done = true
      else if (nb < 0 || nb >= n)
        // mapped bytes are untrusted: any id outside [0, n) that isn't the
        // pad sentinel is corruption — fail like a parse error, not an
        // IndexOutOfBounds from a negative buffer offset later
        throw new IOException(
          s".diskann mmap: corrupt adjacency for node $id: neighbor $nb outside [0, $n)")
      else { out(j) = nb; j += 1 }
    }
    j
  }
}

object DiskannMmapIndex {

  /**
   * Map `path` and parse its header. Shards with an SQ8 appendix are served
   * QUANTIZED from the mapped codes (round-9; previously they fell back to
   * the heap reader). Returns null only when the appendix is structurally
   * present but unparseable — callers fall back to the heap reader, whose
   * own parse raises the descriptive error.
   */
  def open(path: String, cosineMetadata: Boolean = false): DiskannMmapIndex = {
    val f = new File(path)
    val len = f.length()
    if (len > Int.MaxValue)
      throw new IOException(s".diskann mmap: file exceeds a single map: $len")
    val raf = new RandomAccessFile(f, "r")
    try {
      // Probe the header and SQ8 appendix with small bounded reads BEFORE
      // mapping: a quantized shard (→ null, heap reader takes over) must not
      // leave a throwaway whole-file mapping lingering until GC.
      if (len < DiskannFormat.HeaderSize) fail(path, "file too small for header")
      val hdr = new Array[Byte](DiskannFormat.HeaderSize)
      raf.readFully(hdr)
      val hb = ByteBuffer.wrap(hdr).order(ByteOrder.LITTLE_ENDIAN)
      val magic = new Array[Byte](4)
      hb.get(0, magic)
      if (!java.util.Arrays.equals(magic, DiskannFormat.Magic)) fail(path, "invalid magic bytes")
      if (hb.getInt(4) != DiskannFormat.Version) fail(path, s"unsupported version ${hb.getInt(4)}")
      val n = hb.getInt(8)
      val dim = hb.getInt(12)
      val maxDeg = hb.getInt(16)
      val nEp = hb.getInt(20)
      val metricCode = hb.get(24) & 0xff
      val buildComplexity = hb.getInt(28)
      if (n < 0 || dim <= 0 || maxDeg <= 0 || nEp < 0) fail(path, "corrupt header")
      val epOff = DiskannFormat.HeaderSize.toLong
      val vecOff = epOff + nEp.toLong * 4
      val adjOff = vecOff + n.toLong * dim * 4
      val end = adjOff + n.toLong * maxDeg * 4
      if (end > len) fail(path, s"file truncated: need $end bytes, have $len")
      // optional SQ appendix ("SQ8" u8 / "SQ4"/"SQ6" packed): small bounded
      // reads (tag + header + params) BEFORE mapping; the bulk qdata region
      // is only ever touched lazily through the map during search
      var sq8Min: Array[Float] = null
      var sq8Scale: Array[Float] = null
      var sq8DataOff = -1L
      var sqBits = 8
      if (len > end + 4) {
        val tag = new Array[Byte](4)
        raf.seek(end)
        raf.readFully(tag)
        if (tag(0) == 'S' && tag(1) == 'Q' &&
            (tag(2) == '8' || tag(2) == '4' || tag(2) == '6') && tag(3) == 0) {
          sqBits = tag(2) - '0'
          val rowStride = if (sqBits == 8) dim else (dim * sqBits + 7) / 8
          val hdr2 = new Array[Byte](12)
          raf.readFully(hdr2)
          val h2 = ByteBuffer.wrap(hdr2).order(ByteOrder.LITTLE_ENDIAN)
          val sqDim = h2.getInt(0)
          val qlen = h2.getLong(4)
          val dataOff = end + 4 + 12 + sqDim.toLong * 8
          if (sqDim != dim || qlen != n.toLong * rowStride || dataOff + qlen > len)
            return null // malformed appendix: heap reader raises the real error
          val params = new Array[Byte](sqDim * 8)
          raf.readFully(params)
          val pb = ByteBuffer.wrap(params).order(ByteOrder.LITTLE_ENDIAN)
          sq8Min = new Array[Float](sqDim)
          sq8Scale = new Array[Float](sqDim)
          var d = 0
          while (d < sqDim) { sq8Min(d) = pb.getFloat(d * 4); d += 1 }
          d = 0
          while (d < sqDim) { sq8Scale(d) = pb.getFloat((sqDim + d) * 4); d += 1 }
          sq8DataOff = dataOff
        }
      }
      val buf = raf.getChannel.map(FileChannel.MapMode.READ_ONLY, 0, len)
      buf.order(ByteOrder.LITTLE_ENDIAN)
      val eps = new Array[Int](nEp)
      var i = 0
      while (i < nEp) { eps(i) = buf.getInt(epOff.toInt + i * 4); i += 1 }
      val metric = Metric.fromCode(metricCode, cosine = cosineMetadata)
      new DiskannMmapIndex(buf, dim, n, maxDeg,
        if (buildComplexity > 0) buildComplexity else VamanaIndex.DefaultBuildComplexity,
        metric, eps, vecOff.toInt, adjOff.toInt, sq8Min, sq8Scale, sq8DataOff,
        sqBits)
    } finally raf.close()
  }

  private def fail(path: String, msg: String): Nothing =
    throw new IOException(s".diskann mmap $path: $msg")
}
