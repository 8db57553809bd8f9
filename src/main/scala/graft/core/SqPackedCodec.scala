package graft.core

/**
 * Sub-byte scalar quantization (SQ4 / SQ6) — the FAISS
 * `ScalarQuantizer.QT_4bit` / `QT_6bit` analog, extending the reference's
 * SQ8-only scheme (rust_lib/src/provider.rs:161-241) to smaller codes:
 * `code = round((v - min[d]) / scale[d] * levels)` clamped to [0, levels]
 * with `levels = 2^bits - 1`, packed little-endian-bit-order into
 * `ceil(dim·bits/8)` bytes per row. SQ4 stores vectors at 8× compression
 * (vs SQ8's 4×) — at 100 TB the serve-time resident set halves again, at
 * the cost of 15 quantization levels per dimension.
 *
 * Extraction reads a 16-bit window (two bytes) around the code's bit
 * offset, so any bits ≤ 8 unpacks with one branch-free mask — the
 * dequantize arithmetic then matches Sq8Data's shape exactly
 * (`min + code/levels · scale`).
 */
final case class SqPackedData(
    bits: Int,
    dim: Int,
    count: Int,
    min: Array[Float],
    scale: Array[Float],
    data: Array[Byte]) extends ScalarQuant {

  require(bits >= 1 && bits <= 8, s"SqPackedData supports 1..8 bits (got $bits)")

  /** Bytes per packed row. */
  val rowStride: Int = (dim * bits + 7) / 8
  private val levels: Float = ((1 << bits) - 1).toFloat
  private val mask: Int = (1 << bits) - 1

  @inline private def code(rowOff: Int, d: Int): Int = {
    val bitOff = d * bits
    val byteOff = rowOff + (bitOff >> 3)
    val shift = bitOff & 7
    // 16-bit window: a ≤8-bit code spans at most two bytes
    val lo = data(byteOff) & 0xff
    val hi = if (shift + bits > 8) (data(byteOff + 1) & 0xff) << 8 else 0
    ((lo | hi) >> shift) & mask
  }

  def dequantizeInto(id: Int, out: Array[Float]): Unit =
    dequantizeInto(id, out, 0)

  def dequantizeInto(id: Int, out: Array[Float], outOff: Int): Unit = {
    val off = id * rowStride
    var d = 0
    while (d < dim) {
      out(outOff + d) = min(d) + (code(off, d) / levels) * scale(d)
      d += 1
    }
  }

  def distance(metric: Metric, id: Int, q: Array[Float]): Float = {
    val off = id * rowStride
    var s = 0.0f
    var d = 0
    if (metric eq Metric.L2) {
      while (d < dim) {
        val v = min(d) + (code(off, d) / levels) * scale(d)
        val diff = v - q(d); s += diff * diff; d += 1
      }
      s
    } else {
      while (d < dim) {
        val v = min(d) + (code(off, d) / levels) * scale(d)
        s += v * q(d); d += 1
      }
      -s
    }
  }
}

object SqPackedCodec {

  /** Encode ONE vector against frozen per-dim ranges into a packed row —
   *  float-for-float the arithmetic of [[quantize]]'s inner loop (and the
   *  DuckDB oracle's `least(levels, greatest(0, round((v−mn)/sc·levels)))`
   *  replay), split out for engines that quantize distributedly against
   *  driver-trained ranges (the `IVF<n>,SQ4/SQ6` build UDF + append). */
  def encodeRow(v: Array[Float], mins: Array[Float], scales: Array[Float],
      bits: Int): Array[Byte] = {
    val levels = (1 << bits) - 1
    val out = new Array[Byte]((v.length * bits + 7) / 8)
    var d = 0
    while (d < v.length) {
      val norm = (v(d) - mins(d)) / scales(d)
      val code = math.max(0, math.min(levels, math.round(norm * levels)))
      val bitOff = d * bits
      val byteOff = bitOff >> 3
      val shift = bitOff & 7
      out(byteOff) = (out(byteOff) | ((code << shift) & 0xff)).toByte
      if (shift + bits > 8)
        out(byteOff + 1) = (out(byteOff + 1) | (code >> (8 - shift))).toByte
      d += 1
    }
    out
  }

  /** Level index of dimension `d` in one packed row (the 16-bit-window
   *  extraction of [[SqPackedData.code]], over a standalone row). */
  @inline def codeAt(packed: Array[Byte], d: Int, bits: Int): Int = {
    val bitOff = d * bits
    val byteOff = bitOff >> 3
    val shift = bitOff & 7
    val lo = packed(byteOff) & 0xff
    val hi = if (shift + bits > 8) (packed(byteOff + 1) & 0xff) << 8 else 0
    ((lo | hi) >> shift) & ((1 << bits) - 1)
  }

  /** ADC over one packed row against a flattened [d·k + level] lookup table
   *  (the PqCodec.lut layout with m = dim, k = 2^bits) — the packed analog
   *  of PqCodec.adc: one extract + one table add per dimension, float
   *  accumulation in dimension order. */
  def adc(table: Array[Float], bits: Int, dim: Int, packed: Array[Byte]): Float = {
    val k = 1 << bits
    var s = 0.0f
    var d = 0
    while (d < dim) {
      s += table(d * k + codeAt(packed, d, bits))
      d += 1
    }
    s
  }

  /** Quantize `count` vectors stored flat row-major in `vecs` to `bits`-bit
   *  packed codes (same per-dimension min/scale scheme as Sq8Codec). */
  def quantize(vecs: Array[Float], count: Int, dim: Int, bits: Int): SqPackedData = {
    require(bits >= 1 && bits <= 8, s"bits must be 1..8 (got $bits)")
    val mins = Array.fill(dim)(Float.MaxValue)
    val maxs = Array.fill(dim)(Float.MinValue)
    var i = 0
    while (i < count) {
      val off = i * dim
      var d = 0
      while (d < dim) {
        val v = vecs(off + d)
        if (v < mins(d)) mins(d) = v
        if (v > maxs(d)) maxs(d) = v
        d += 1
      }
      i += 1
    }
    val scale = new Array[Float](dim)
    var d = 0
    while (d < dim) {
      val r = maxs(d) - mins(d)
      scale(d) = if (r > 0f) r else 1.0f
      d += 1
    }
    val levels = (1 << bits) - 1
    val rowStride = (dim * bits + 7) / 8
    val out = new Array[Byte](count * rowStride)
    i = 0
    while (i < count) {
      val off = i * dim
      val rowOff = i * rowStride
      d = 0
      while (d < dim) {
        val norm = (vecs(off + d) - mins(d)) / scale(d)
        val code = math.max(0, math.min(levels, math.round(norm * levels)))
        val bitOff = d * bits
        val byteOff = rowOff + (bitOff >> 3)
        val shift = bitOff & 7
        out(byteOff) = (out(byteOff) | ((code << shift) & 0xff)).toByte
        if (shift + bits > 8)
          out(byteOff + 1) = (out(byteOff + 1) | (code >> (8 - shift))).toByte
        d += 1
      }
      i += 1
    }
    SqPackedData(bits, dim, count, mins, scale, out)
  }
}
