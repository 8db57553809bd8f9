package graft.core

import java.io.{DataOutputStream, BufferedOutputStream, OutputStream, InputStream,
  FileOutputStream, FileInputStream, File, IOException, EOFException}
import java.nio.{ByteBuffer, ByteOrder}

/**
 * Byte-compatible reader/writer for the reference's `.diskann` v2 file format
 * (rust_lib/src/file_format.rs:1-120), including the optional trailing `SQ8\0`
 * quantization section (rust_lib/src/index_manager.rs:508-536, parse 631-668).
 *
 * Layout (all little-endian):
 *   [32-byte header] magic "DANN" | version u32=2 | num_vectors u32 | dimension
 *   u32 | max_degree u32 | num_entry_points u32 | metric u8 (0=L2, 1=IP) |
 *   pad[3] | build_complexity u32
 *   [entry point ids: num_entry_points x u32]
 *   [vectors: num_vectors x dimension x f32, flat row-major]
 *   [adjacency: num_vectors x max_degree x u32, unused slots = u32::MAX]
 *   [optional: "SQ8\0" | dim u32 | qlen u64 | min f32[dim] | scale f32[dim] |
 *    u8 data[qlen]]
 *
 * Parsing is bounds-checked throughout — shard files may come from untrusted
 * storage (reference index_manager.rs:24-56 does the same).
 */
object DiskannFormat {
  val Magic: Array[Byte] = "DANN".getBytes("US-ASCII")
  val Version = 2
  val HeaderSize = 32
  val PadSentinel: Int = -1 // u32::MAX

  def write(ix: VamanaIndex, out: OutputStream, cosine: Boolean = false): Unit = {
    ix.finalizePruning() // build leaves slack-buffer overflow; rows are fixed-width
    val n = ix.size
    val dim = ix.dim
    val maxDeg = ix.maxDegree
    val eps = ix.entryPoints
    val bos = new BufferedOutputStream(out, 1 << 20)
    val header = ByteBuffer.allocate(HeaderSize).order(ByteOrder.LITTLE_ENDIAN)
    header.put(Magic)
    header.putInt(Version)
    header.putInt(n)
    header.putInt(dim)
    header.putInt(maxDeg)
    header.putInt(eps.length)
    header.put(ix.metric.code.toByte)
    header.put(0.toByte); header.put(0.toByte); header.put(0.toByte)
    header.putInt(ix.buildComplexity)
    bos.write(header.array())

    val epBuf = ByteBuffer.allocate(eps.length * 4).order(ByteOrder.LITTLE_ENDIAN)
    eps.foreach(epBuf.putInt)
    bos.write(epBuf.array())

    // vectors — chunked to bound allocation
    val raw = ix.rawVectors
    val chunkRows = math.max(1, (1 << 20) / math.max(dim * 4, 1))
    var row = 0
    while (row < n) {
      val rows = math.min(chunkRows, n - row)
      val buf = ByteBuffer.allocate(rows * dim * 4).order(ByteOrder.LITTLE_ENDIAN)
      val fb = buf.asFloatBuffer()
      fb.put(raw, row * dim, rows * dim)
      bos.write(buf.array())
      row += rows
    }

    // adjacency — fixed-width rows padded with u32::MAX
    row = 0
    while (row < n) {
      val buf = ByteBuffer.allocate(maxDeg * 4).order(ByteOrder.LITTLE_ENDIAN)
      val nbrs = ix.neighbors(row)
      var i = 0
      while (i < maxDeg) {
        buf.putInt(if (i < nbrs.length) nbrs(i) else PadSentinel)
        i += 1
      }
      bos.write(buf.array())
      row += 1
    }

    if (ix.isQuantized) {
      // appendix tag carries the code width: "SQ8" is byte-compatible with
      // the reference's section; "SQ4"/"SQ6" are this library's packed
      // extensions (same header/params layout, packed data region)
      val sq = ix.sq8Data
      bos.write(s"SQ${sq.bits}".getBytes("US-ASCII")); bos.write(0)
      val head = ByteBuffer.allocate(12).order(ByteOrder.LITTLE_ENDIAN)
      head.putInt(sq.dim)
      head.putLong(sq.data.length.toLong)
      bos.write(head.array())
      val params = ByteBuffer.allocate(sq.dim * 8).order(ByteOrder.LITTLE_ENDIAN)
      sq.min.foreach(params.putFloat)
      sq.scale.foreach(params.putFloat)
      bos.write(params.array())
      bos.write(sq.data)
    }
    bos.flush()
  }

  def writeFile(ix: VamanaIndex, path: String): Unit = {
    val f = new File(path)
    Option(f.getParentFile).foreach(_.mkdirs())
    val out = new FileOutputStream(f)
    try write(ix, out) finally out.close()
  }

  /** Read a `.diskann` byte image into an in-memory index.
   *  `cosineMetadata` restores the Cosine metric (stored on disk as IP). */
  def read(bytes: Array[Byte], alpha: Float = VamanaIndex.DefaultAlpha,
      cosineMetadata: Boolean = false): VamanaIndex = {
    if (bytes.length < HeaderSize) fail(s"data too small for header (${bytes.length} bytes)")
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val magic = new Array[Byte](4); bb.get(magic)
    if (!java.util.Arrays.equals(magic, Magic)) fail("invalid magic bytes")
    val version = bb.getInt
    if (version != Version) fail(s"unsupported version $version")
    val n = bb.getInt
    val dim = bb.getInt
    val maxDeg = bb.getInt
    val nEp = bb.getInt
    val metricCode = bb.get() & 0xff
    bb.get(); bb.get(); bb.get()
    val buildComplexity = bb.getInt
    if (n < 0 || dim <= 0 || maxDeg <= 0 || nEp < 0) fail("corrupt header")

    val epOff = HeaderSize.toLong
    val vecOff = epOff + nEp.toLong * 4
    val adjOff = vecOff + n.toLong * dim * 4
    val end = adjOff + n.toLong * maxDeg * 4
    if (end > bytes.length) fail(s"file truncated: need $end bytes, have ${bytes.length}")

    val metric = Metric.fromCode(metricCode, cosine = cosineMetadata)
    val ix = new VamanaIndex(dim, metric, maxDeg,
      if (buildComplexity > 0) buildComplexity else VamanaIndex.DefaultBuildComplexity,
      alpha, initialCapacity = math.max(n, 4))
    val eps = new Array[Int](nEp)
    bb.position(epOff.toInt)
    var i = 0
    while (i < nEp) { eps(i) = bb.getInt; i += 1 }

    val vecs = new Array[Float](n * dim)
    bb.position(vecOff.toInt)
    bb.asFloatBuffer().get(vecs)

    val adjacency = new Array[Array[Int]](n)
    bb.position(adjOff.toInt)
    val adjRow = new Array[Int](maxDeg)
    i = 0
    while (i < n) {
      var d = 0
      while (d < maxDeg) { adjRow(d) = bb.getInt; d += 1 }
      var len = 0
      while (len < maxDeg && adjRow(len) != PadSentinel) len += 1
      adjacency(i) = java.util.Arrays.copyOf(adjRow, len)
      i += 1
    }
    ix.load(n, vecs, adjacency, eps)

    // optional scalar-quantization appendix: "SQ8" (reference-compatible)
    // or this library's packed "SQ4"/"SQ6" extensions
    val stdEnd = end.toInt
    if (bytes.length > stdEnd + 4 && bytes(stdEnd) == 'S' && bytes(stdEnd + 1) == 'Q' &&
        (bytes(stdEnd + 2) == '8' || bytes(stdEnd + 2) == '4' || bytes(stdEnd + 2) == '6') &&
        bytes(stdEnd + 3) == 0) {
      val sqBits = bytes(stdEnd + 2) - '0'
      bb.position(stdEnd + 4)
      val sqDim = bb.getInt
      val qlen = bb.getLong
      if (sqDim != dim) fail(s"SQ$sqBits dim $sqDim != index dim $dim")
      val need = stdEnd + 4 + 12 + sqDim.toLong * 8 + qlen
      if (qlen < 0 || need > bytes.length) fail(s"SQ$sqBits section truncated")
      // mirror the mmap reader's geometry check: a short-but-present data
      // region would otherwise surface as an ArrayIndexOutOfBounds mid-search
      val rowStride = if (sqBits == 8) sqDim else (sqDim * sqBits + 7) / 8
      if (qlen != n.toLong * rowStride)
        fail(s"SQ$sqBits data length $qlen != n($n) * rowStride($rowStride)")
      val mins = new Array[Float](sqDim)
      val scales = new Array[Float](sqDim)
      var d = 0
      while (d < sqDim) { mins(d) = bb.getFloat; d += 1 }
      d = 0
      while (d < sqDim) { scales(d) = bb.getFloat; d += 1 }
      val qdata = new Array[Byte](qlen.toInt)
      bb.get(qdata)
      ix.loadSq8(
        if (sqBits == 8) Sq8Data(sqDim, n, mins, scales, qdata)
        else SqPackedData(sqBits, sqDim, n, mins, scales, qdata))
    }
    ix
  }

  def readFile(path: String, alpha: Float = VamanaIndex.DefaultAlpha,
      cosineMetadata: Boolean = false): VamanaIndex = {
    val f = new File(path)
    val len = f.length()
    if (len > Int.MaxValue) fail(s"shard file too large for a single byte image: $len")
    val bytes = new Array[Byte](len.toInt)
    val in = new FileInputStream(f)
    try {
      var off = 0
      while (off < bytes.length) {
        val r = in.read(bytes, off, bytes.length - off)
        if (r < 0) throw new EOFException(path)
        off += r
      }
    } finally in.close()
    read(bytes, alpha, cosineMetadata)
  }

  private def fail(msg: String): Nothing = throw new IOException(s".diskann parse: $msg")
}
