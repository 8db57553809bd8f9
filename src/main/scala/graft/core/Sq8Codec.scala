package graft.core

/**
 * Scalar-quantized vector storage contract shared by the u8 codec
 * ([[Sq8Data]], the reference's byte-compatible scheme) and the packed
 * sub-byte codecs ([[SqPackedData]], SQ4/SQ6 — a FAISS
 * `ScalarQuantizer.QT_4bit/QT_6bit` analog this library adds beyond the
 * reference's SQ8). Search code (VamanaIndex cursor, DiskannFormat,
 * memory accounting) depends only on this trait.
 */
trait ScalarQuant extends Serializable {
  def bits: Int
  def dim: Int
  def count: Int
  def min: Array[Float]
  def scale: Array[Float]
  /** Raw code bytes (u8: one per dim; packed: ceil(dim·bits/8) per row). */
  def data: Array[Byte]
  def dequantizeInto(id: Int, out: Array[Float]): Unit
  def dequantizeInto(id: Int, out: Array[Float], outOff: Int): Unit
  /** Fused distance of stored vector `id` vs a full-precision query. */
  def distance(metric: Metric, id: Int, q: Array[Float]): Float
}

/**
 * SQ8 scalar quantization: per-dimension min/scale → u8 codes, ~4x memory
 * reduction on vector storage. Mirrors the reference's scheme
 * (rust_lib/src/provider.rs:161-241): `code = round((v - min[d]) / scale[d] * 255)`
 * clamped to [0,255]; `scale[d] = max[d]-min[d]` or 1.0 when the range is zero.
 */
final case class Sq8Data(
    dim: Int,
    count: Int,
    min: Array[Float],
    scale: Array[Float],
    data: Array[Byte]) extends ScalarQuant {

  def bits: Int = 8

  @inline def dequantize(id: Int, d: Int): Float = {
    val code = data(id * dim + d) & 0xff
    min(d) + (code / 255.0f) * scale(d)
  }

  def dequantizeInto(id: Int, out: Array[Float]): Unit =
    dequantizeInto(id, out, 0)

  def dequantizeInto(id: Int, out: Array[Float], outOff: Int): Unit = {
    var d = 0
    val off = id * dim
    while (d < dim) {
      out(outOff + d) = min(d) + ((data(off + d) & 0xff) / 255.0f) * scale(d)
      d += 1
    }
  }

  /** Distance of stored (quantized) vector `id` against a full-precision query. */
  def distance(metric: Metric, id: Int, q: Array[Float]): Float = {
    val off = id * dim
    var s = 0.0f
    var d = 0
    if (metric eq Metric.L2) {
      while (d < dim) {
        val v = min(d) + ((data(off + d) & 0xff) / 255.0f) * scale(d)
        val diff = v - q(d); s += diff * diff; d += 1
      }
      s
    } else {
      while (d < dim) {
        val v = min(d) + ((data(off + d) & 0xff) / 255.0f) * scale(d)
        s += v * q(d); d += 1
      }
      -s
    }
  }
}

object Sq8Codec {

  /** Encode ONE vector against frozen per-dim ranges — float-for-float the
   *  same arithmetic as [[quantize]]'s inner loop (and the DuckDB oracle's
   *  `least(255, greatest(0, round((v − mn)/sc · 255)))` replay), split out
   *  for engines that quantize distributedly against driver-trained ranges
   *  (the `IVF<n>,SQ8` build UDF and its append path). */
  def encodeRow(v: Array[Float], mins: Array[Float], scales: Array[Float]): Array[Byte] = {
    val out = new Array[Byte](v.length)
    var d = 0
    while (d < v.length) {
      val norm = (v(d) - mins(d)) / scales(d)
      val code = math.round(norm * 255.0f)
      out(d) = math.max(0, math.min(255, code)).toByte
      d += 1
    }
    out
  }

  /** Quantize `count` vectors stored flat row-major in `vecs`. */
  def quantize(vecs: Array[Float], count: Int, dim: Int): Sq8Data = {
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
    val out = new Array[Byte](count * dim)
    i = 0
    while (i < count) {
      val off = i * dim
      d = 0
      while (d < dim) {
        val norm = (vecs(off + d) - mins(d)) / scale(d)
        val code = math.round(norm * 255.0f)
        out(off + d) = math.max(0, math.min(255, code)).toByte
        d += 1
      }
      i += 1
    }
    Sq8Data(dim, count, mins, scale, out)
  }
}
