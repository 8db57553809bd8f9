package graft.core

import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

/** Pins the SQ4/SQ6 packed scalar quantization (FAISS QT_4bit/QT_6bit
 *  analog): packed encode→extract round-trip, value parity of the packed
 *  codec at 8 bits with the u8 Sq8Codec, .diskann appendix round-trip for
 *  the SQ4/SQ6 tags, mmap == heap serving on the packed appendix, and
 *  saturating-beam exactness over dequantized values. */
class SqPackedSpec extends AnyFunSuite {

  private def randVecs(n: Int, dim: Int, seed: Long): Array[Array[Float]] = {
    val rnd = new Random(seed)
    Array.fill(n)(Array.fill(dim)(rnd.nextFloat() * 2f - 1f))
  }

  private def flat(vs: Array[Array[Float]]): Array[Float] = vs.flatten

  test("packed codes round-trip: extract(encode(code)) == code for 4 and 6 bits") {
    val dim = 13 // odd dim so 4-bit rows end mid-byte and 6-bit codes straddle bytes
    val vecs = randVecs(200, dim, seed = 3)
    for (bits <- Seq(4, 6)) {
      val sq = SqPackedCodec.quantize(flat(vecs), vecs.length, dim, bits)
      val levels = (1 << bits) - 1
      val out = new Array[Float](dim)
      vecs.indices.foreach { i =>
        sq.dequantizeInto(i, out)
        out.indices.foreach { d =>
          // dequantized value must be one of the representable levels
          val norm = (out(d) - sq.min(d)) / sq.scale(d) * levels
          assert(math.abs(norm - math.round(norm)) < 1e-3,
            s"bits=$bits row=$i dim=$d not on a level grid: ${out(d)}")
          // and within half a level of the original
          val orig = vecs(i)(d)
          assert(math.abs(out(d) - orig) <= sq.scale(d) / levels * 0.5f + 1e-6f,
            s"bits=$bits quantization error too large at ($i,$d)")
        }
      }
    }
  }

  test("packed codec at 8 bits == Sq8Codec values exactly") {
    val dim = 16
    val vecs = randVecs(150, dim, seed = 5)
    val a = Sq8Codec.quantize(flat(vecs), vecs.length, dim)
    val b = SqPackedCodec.quantize(flat(vecs), vecs.length, dim, 8)
    val oa = new Array[Float](dim); val ob = new Array[Float](dim)
    vecs.indices.foreach { i =>
      a.dequantizeInto(i, oa); b.dequantizeInto(i, ob)
      assert(oa.toSeq == ob.toSeq, s"row $i differs between u8 and packed-8")
    }
  }

  test(".diskann SQ4/SQ6 appendix round-trips through write/read") {
    for (bits <- Seq(4, 6)) {
      val vecs = randVecs(300, 12, seed = 7 + bits)
      val ix = VamanaIndex.build(vecs.iterator, 12, Metric.L2, 16, 32)
      ix.quantize(bits)
      val f = java.io.File.createTempFile(s"sq$bits", ".diskann")
      f.deleteOnExit()
      DiskannFormat.writeFile(ix, f.getAbsolutePath)
      val back = DiskannFormat.readFile(f.getAbsolutePath)
      assert(back.isQuantized && back.sq8Data.bits == bits)
      val q = randVecs(1, 12, seed = 99)(0)
      val (ids, dists) = ix.search(q, 10, 64)
      val (ids2, dists2) = back.search(q, 10, 64)
      assert(ids.toSeq == ids2.toSeq)
      assert(dists.map(java.lang.Float.floatToIntBits).toSeq ==
        dists2.map(java.lang.Float.floatToIntBits).toSeq)
    }
  }

  test("mmap-served SQ4 shard == heap serving, bit-exact") {
    val vecs = randVecs(500, 20, seed = 21)
    val ix = VamanaIndex.build(vecs.iterator, 20, Metric.L2, 24, 48)
    ix.quantize(4)
    val f = java.io.File.createTempFile("sq4mm", ".diskann")
    f.deleteOnExit()
    DiskannFormat.writeFile(ix, f.getAbsolutePath)
    val mm = DiskannMmapIndex.open(f.getAbsolutePath)
    assert(mm != null, "mmap open failed on SQ4 appendix")
    assert(mm.isQuantized)
    randVecs(17, 20, seed = 33).foreach { q =>
      val (hIds, hDists) = ix.search(q, 8, 64)
      val (mIds, mDists) = mm.search(q, 8, 64)
      assert(hIds.toSeq == mIds.toSeq)
      assert(hDists.map(java.lang.Float.floatToIntBits).toSeq ==
        mDists.map(java.lang.Float.floatToIntBits).toSeq)
    }
  }

  test("saturating beam over SQ4 == brute force over dequantized values") {
    val vecs = randVecs(400, 10, seed = 41)
    val ix = VamanaIndex.build(vecs.iterator, 10, Metric.L2, 16, 32)
    ix.quantize(4)
    val q = randVecs(1, 10, seed = 55)(0)
    val (ids, _) = ix.search(q, 10, 1024) // beam >= corpus: saturating
    val sq = SqPackedCodec.quantize(flat(vecs), vecs.length, 10, 4)
    val out = new Array[Float](10)
    val brute = vecs.indices.map { i =>
      sq.dequantizeInto(i, out)
      var s = 0.0; var d = 0
      while (d < 10) { val x = out(d) - q(d); s += x * x; d += 1 }
      (s, i)
    }.sortBy(t => (t._1, t._2)).take(10).map(_._2)
    assert(ids.toSeq == brute)
  }

  test("heap reader rejects a packed appendix whose data region is short") {
    // qlen fits in the file but != n*rowStride: the old reader accepted it
    // and SqPackedData.code threw ArrayIndexOutOfBounds mid-search; now both
    // the heap and mmap readers fail the geometry check at open time
    val vecs = randVecs(64, 12, seed = 61)
    val ix = VamanaIndex.build(vecs.iterator, 12, Metric.L2, 16, 32)
    ix.quantize(4)
    val f = java.io.File.createTempFile("sq4short", ".diskann")
    f.deleteOnExit()
    DiskannFormat.writeFile(ix, f.getAbsolutePath)
    val bytes = java.nio.file.Files.readAllBytes(f.toPath)
    // locate the appendix: "SQ4\0" after the standard section
    var tag = -1
    var i = 0
    while (tag < 0 && i < bytes.length - 3) {
      if (bytes(i) == 'S' && bytes(i + 1) == 'Q' && bytes(i + 2) == '4' &&
          bytes(i + 3) == 0) tag = i
      i += 1
    }
    assert(tag > 0, "SQ4 tag not found")
    val bb = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val qlenOff = tag + 4 + 4
    val qlen = bb.getLong(qlenOff)
    bb.putLong(qlenOff, qlen - 6) // still >= 0, still fits in the file
    val ex = intercept[java.io.IOException] { DiskannFormat.read(bytes) }
    assert(ex.getMessage.contains("rowStride"), ex.getMessage)
  }
}
