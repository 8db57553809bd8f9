package graft.index

import org.scalatest.funsuite.AnyFunSuite

import graft.index.Ann.AdcLutCache

/**
 * Pins the retry/speculation semantics of [[Ann.AdcLutCache]] — the
 * executor-side ADC lookup-table cache behind the TABLE-path quantized
 * scores (reference analog: the per-query ADC tables FAISS IndexPQ/IndexIVFPQ
 * compute once per search, faiss/IndexPQ.cpp search_core). The qid is only a
 * cache locator; the query bytes are the authority:
 *
 *  - a task retry / stage re-attempt / speculative duplicate that re-enters
 *    with the SAME (token, qid) but DIFFERENT query content must never be
 *    served the stale table — it recomputes from the bytes it carries;
 *  - 4-token LRU eviction mid-query is only a performance event: the evicted
 *    entry recomputes bit-exactly, never answers wrong;
 *  - cached and uncached ADC scores are bit-identical.
 */
class AdcLutCacheSpec extends AnyFunSuite {

  private val rnd = new scala.util.Random(7)
  private def vec(d: Int): Array[Float] = Array.fill(d)(rnd.nextFloat() - 0.5f)

  // small real codebook so the cached payloads are genuine ADC tables
  private lazy val cb: PqCodec.Codebook =
    PqCodec.train(Array.fill(64)(vec(16)), m = 4, k = 16)

  private def freshToken(): Long = rnd.nextLong() // unit tests own their tokens

  test("same (token,qid,probe) + same query bytes → single compute, shared entry") {
    val token = freshToken()
    val q = vec(16)
    val before = AdcLutCache.computes.get()
    val e1 = AdcLutCache.get(token, 1L, 0, q)((PqCodec.lut(cb, q, l2 = true), 0f))
    val e2 = AdcLutCache.get(token, 1L, 0, q.clone())((PqCodec.lut(cb, q, l2 = true), 0f))
    assert(AdcLutCache.computes.get() - before == 1L, "second get must be a hit")
    assert(e2.lut eq e1.lut, "hit must return the cached table, not a copy")
  }

  test("retry with same qid but different query bytes recomputes — stale table never served") {
    val token = freshToken()
    val qA = vec(16)
    val qB = vec(16) // the re-executed stage mapped this qid to other content
    val eA = AdcLutCache.get(token, 42L, 3, qA)((PqCodec.lut(cb, qA, l2 = true), 0f))
    val before = AdcLutCache.computes.get()
    val eB = AdcLutCache.get(token, 42L, 3, qB)((PqCodec.lut(cb, qB, l2 = true), 0f))
    assert(AdcLutCache.computes.get() - before == 1L, "mismatched bytes must recompute")
    assert(!(eB.lut eq eA.lut))
    assert(java.util.Arrays.equals(eB.lut, PqCodec.lut(cb, qB, l2 = true)),
      "recomputed table must come from the bytes the task carries")
    // the new content now owns the slot; the old query recomputes again
    val beforeA = AdcLutCache.computes.get()
    AdcLutCache.get(token, 42L, 3, qA)((PqCodec.lut(cb, qA, l2 = true), 0f))
    assert(AdcLutCache.computes.get() - beforeA == 1L)
  }

  test("cached vs uncached ADC scores are bit-identical (incl. ivfpq offset)") {
    val token = freshToken()
    val q = vec(16)
    val off = -1.234567f
    val e = AdcLutCache.get(token, 7L, 11, q)((PqCodec.lut(cb, q, l2 = false), off))
    val cachedAgain = AdcLutCache.get(token, 7L, 11, q)(fail("must not recompute"))
    val freshLut = PqCodec.lut(cb, q, l2 = false)
    val codes = Array.fill(32)(PqCodec.encode(cb, vec(16)))
    codes.foreach { code =>
      val cached = PqCodec.adc(cachedAgain.lut, cb.k, code) + cachedAgain.off
      val fresh = PqCodec.adc(freshLut, cb.k, code) + off
      assert(java.lang.Float.floatToIntBits(cached) ==
        java.lang.Float.floatToIntBits(fresh))
    }
    assert(cachedAgain.off == e.off && cachedAgain.off == off)
  }

  test("4-token LRU eviction mid-query recomputes bit-exactly") {
    val base = freshToken()
    val q = vec(16)
    val expect = PqCodec.lut(cb, q, l2 = true)
    AdcLutCache.get(base, 1L, 0, q)((expect, 0f))
    // four newer plans arrive while this plan's tasks are still running
    (1 to 4).foreach { i =>
      val qi = vec(16)
      AdcLutCache.get(base + i, 1L, 0, qi)((PqCodec.lut(cb, qi, l2 = true), 0f))
    }
    assert(AdcLutCache.residentTokens <= 4)
    val before = AdcLutCache.computes.get()
    val e = AdcLutCache.get(base, 1L, 0, q)((PqCodec.lut(cb, q, l2 = true), 0f))
    assert(AdcLutCache.computes.get() - before == 1L, "evicted token must recompute")
    assert(java.util.Arrays.equals(e.lut, expect))
  }

  test("soft-referenced entries survive normal use (no spurious recomputes in a tight loop)") {
    val token = freshToken()
    val q = vec(16)
    AdcLutCache.get(token, 9L, 2, q)((PqCodec.lut(cb, q, l2 = true), 0f))
    val before = AdcLutCache.computes.get()
    var i = 0
    while (i < 1000) {
      AdcLutCache.get(token, 9L, 2, q)((PqCodec.lut(cb, q, l2 = true), 0f))
      i += 1
    }
    // soft refs are only collected under heap pressure; a healthy heap must
    // not thrash the cache
    assert(AdcLutCache.computes.get() == before)
  }

  test("packed (qid, probe) keys never collide: distinct probes, and pq's -1") {
    val token = freshToken()
    val q = vec(16)
    // same qid across probe -1 (pq), 0 and 1 (ivfpq): three distinct entries
    val lm1 = AdcLutCache.get(token, 7L, -1, q)((PqCodec.lut(cb, q, l2 = true), 0f))
    val l0 = AdcLutCache.get(token, 7L, 0, q)((PqCodec.lut(cb, q, l2 = false), 1f))
    val l1 = AdcLutCache.get(token, 7L, 1, q)((PqCodec.lut(cb, q, l2 = false), 2f))
    assert(lm1.off == 0f && l0.off == 1f && l1.off == 2f)
    // and each key still HITS its own entry
    val before = AdcLutCache.computes.get()
    assert(AdcLutCache.get(token, 7L, -1, q)(sys.error("must hit")).off == 0f)
    assert(AdcLutCache.get(token, 7L, 0, q)(sys.error("must hit")).off == 1f)
    assert(AdcLutCache.get(token, 7L, 1, q)(sys.error("must hit")).off == 2f)
    assert(AdcLutCache.computes.get() == before)
  }

  test("getIn on a resolved sub-map behaves like get (the lock-free hot path)") {
    val token = freshToken()
    val q = vec(16)
    val sub = AdcLutCache.subFor(token)
    val e1 = AdcLutCache.getIn(sub, 3L, 5, q)((PqCodec.lut(cb, q, l2 = true), 0f))
    val before = AdcLutCache.computes.get()
    // hit through BOTH surfaces; the content verify takes the reference
    // fast-path when the very same array instance returns
    val e2 = AdcLutCache.getIn(sub, 3L, 5, q)(sys.error("must hit"))
    val e3 = AdcLutCache.get(token, 3L, 5, q)(sys.error("must hit"))
    assert((e2 eq e1) && (e3 eq e1))
    assert(AdcLutCache.computes.get() == before)
    // different content under the same key still recomputes (stale guard)
    val qB = vec(16) // same dim, different content
    val e4 = AdcLutCache.getIn(sub, 3L, 5, qB)((PqCodec.lut(cb, qB, l2 = true), 9f))
    assert(e4.off == 9f)
  }
}
