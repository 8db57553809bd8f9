package graft.core

/**
 * Packs a (float distance, int id) pair into one Long whose SIGNED ordering
 * equals (distance, id) ordering — the candidate-heap key for the graph
 * searchers.
 *
 * The classic unsigned sortable-float transform (flip all bits for
 * negatives, flip sign bit for positives) orders correctly only under
 * UNSIGNED comparison; shifted into a long's high word, positive distances
 * set the long's sign bit, so signed comparisons invert them relative to
 * negative distances. That is invisible for all-positive L2 distances but
 * breaks beam ordering for IP/cosine, whose negated-dot distances straddle
 * zero. XORing the sign bit yields a SIGNED-monotone 32-bit key:
 * raw >= 0 → raw; raw < 0 → ~raw ^ 0x80000000 (negative, increasing).
 */
object SortableF32 {
  @inline def pack(d: Float, id: Int): Long = {
    val raw = java.lang.Float.floatToRawIntBits(d)
    val s = if (raw < 0) ~raw ^ 0x80000000 else raw
    (s.toLong << 32) | (id.toLong & 0xffffffffL)
  }

  @inline def distOf(packed: Long): Float = {
    val s = (packed >> 32).toInt
    java.lang.Float.intBitsToFloat(if (s >= 0) s else ~(s ^ 0x80000000))
  }

  @inline def idOf(packed: Long): Int = packed.toInt
}
