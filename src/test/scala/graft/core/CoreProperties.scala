package graft.core

import org.scalacheck.{Gen, Properties, Arbitrary}
import org.scalacheck.Prop.{forAll, propBoolean}

/** Property tests for the engine kernels (SURVEY §5 test plan): distance
 *  semantics, the sortable packed key (whose signed-ordering property a
 *  unit test missed and a real bug exploited), SQ8 error bounds, and text
 *  hash stability. */
object CoreProperties extends Properties("graft.core") {

  private val dimGen = Gen.choose(1, 64)
  private def vecGen(dim: Int): Gen[Array[Float]] =
    Gen.containerOfN[Array, Float](dim, Gen.choose(-8.0f, 8.0f))
  private val pairGen = for {
    d <- dimGen; a <- vecGen(d); b <- vecGen(d)
  } yield (a, b)

  property("l2Sq: symmetric, non-negative, zero on self") = forAll(pairGen) {
    case (a, b) =>
      VectorOps.l2Sq(a, b) == VectorOps.l2Sq(b, a) &&
      VectorOps.l2Sq(a, b) >= 0f &&
      VectorOps.l2Sq(a, a) == 0f
  }

  property("dot: symmetric; ipDistance = -dot") = forAll(pairGen) {
    case (a, b) =>
      VectorOps.dot(a, b) == VectorOps.dot(b, a) &&
      VectorOps.ipDistance(a, b) == -VectorOps.dot(a, b)
  }

  property("cosineSimilarity bounded in [-1-eps, 1+eps]") = forAll(pairGen) {
    case (a, b) =>
      val c = VectorOps.cosineSimilarity(a, b)
      c >= -1.0001f && c <= 1.0001f
  }

  property("l2 (sqrt) triangle inequality within float tolerance") =
    forAll(for { d <- dimGen; a <- vecGen(d); b <- vecGen(d); c <- vecGen(d) }
        yield (a, b, c)) { case (a, b, c) =>
      val ab = math.sqrt(VectorOps.l2Sq(a, b).toDouble)
      val bc = math.sqrt(VectorOps.l2Sq(b, c).toDouble)
      val ac = math.sqrt(VectorOps.l2Sq(a, c).toDouble)
      ac <= ab + bc + 1e-3
    }

  property("normalize: unit norm (or untouched zero vector)") =
    forAll(dimGen.flatMap(vecGen)) { v =>
      val n0 = VectorOps.norm(v)
      val u = VectorOps.normalize(v.clone())
      if (n0 == 0f) u.toSeq == v.toSeq
      else math.abs(VectorOps.norm(u) - 1f) < 1e-4
    }

  property("SortableF32.pack: signed ordering == (dist, id) ordering") =
    forAll(Gen.zip(Gen.choose(-1e6f, 1e6f), Gen.choose(0, Int.MaxValue),
                   Gen.choose(-1e6f, 1e6f), Gen.choose(0, Int.MaxValue))) {
      case (d1, i1, d2, i2) =>
        val cmpKey = java.lang.Long.compare(SortableF32.pack(d1, i1), SortableF32.pack(d2, i2))
        val cmpVal = if (d1 != d2) java.lang.Float.compare(d1, d2)
                     else Integer.compare(i1, i2)
        math.signum(cmpKey) == math.signum(cmpVal)
    }

  property("SortableF32: pack/distOf/idOf round-trip") =
    forAll(Gen.zip(Gen.choose(-1e6f, 1e6f), Gen.choose(0, Int.MaxValue))) {
      case (d, i) =>
        SortableF32.distOf(SortableF32.pack(d, i)) == d &&
        SortableF32.idOf(SortableF32.pack(d, i)) == i
    }

  property("SQ8: per-dimension reconstruction error <= scale (range/255)") =
    forAll(for { d <- Gen.choose(1, 32); n <- Gen.choose(2, 40)
                 vs <- Gen.listOfN(n, vecGen(d)) } yield (d, vs)) {
      case (dim, vs) =>
        val flat = vs.flatten.toArray
        val sq8 = Sq8Codec.quantize(flat, vs.length, dim)
        val out = new Array[Float](dim)
        vs.indices.forall { i =>
          sq8.dequantizeInto(i, out)
          (0 until dim).forall { d0 =>
            val step = sq8.scale(d0) / 255.0f // one quantization step
            math.abs(out(d0) - vs(i)(d0)) <= step * 1.001f + 1e-5f
          }
        }
    }

  property("rollingHash: in [0, mod), deterministic, order-sensitive") =
    forAll(Gen.alphaNumStr, Gen.alphaNumStr) { (s1, s2) =>
      val h1 = graft.expressions.TextHash.rollingHashString(s1)
      (h1 >= 0 && h1 < graft.expressions.TextHash.Mod) &&
      h1 == graft.expressions.TextHash.rollingHashString(s1) &&
      // appending is not prepending (order sensitivity): when the two
      // concatenation orders yield different strings the hashes must differ
      // (mod-1e9+7 collision odds ~1e-9 per case — negligible)
      (s1 + s2 == s2 + s1 ||
        graft.expressions.TextHash.rollingHashString(s1 + s2) !=
          graft.expressions.TextHash.rollingHashString(s2 + s1))
    }

  property("simd: dot and l2Sq match scalar loops across random dims/offsets") =
    forAll(for { dim <- Gen.choose(1, 200)
                 pad <- Gen.choose(0, 8)
                 seed <- Gen.choose(0L, Long.MaxValue) } yield (dim, pad, seed)) {
      case (dim, pad, seed) =>
        val rnd = new scala.util.Random(seed)
        val flat = Array.fill(pad + dim)(rnd.nextFloat() * 2 - 1)
        val q = Array.fill(dim)(rnd.nextFloat() * 2 - 1)
        var sDot = 0.0f; var sL2 = 0.0f; var i = 0
        while (i < dim) {
          sDot += flat(pad + i) * q(i)
          val d = flat(pad + i) - q(i); sL2 += d * d
          i += 1
        }
        val tol = 1e-4f * (dim + 1)
        math.abs(graft.core.Simd.dot(flat, pad, q, 0, dim) - sDot) <= tol &&
        math.abs(graft.core.Simd.l2Sq(flat, pad, q, 0, dim) - sL2) <= tol
    }

  property("shingleHashes: nonempty output; <= max(1, n-k+1) distinct hashes; sorted") =
    forAll(for { n <- Gen.choose(0, 12)
                 toks <- Gen.listOfN(n, Gen.identifier.map(_.take(6))) }
        yield toks.toArray) { toks =>
      val hs = graft.expressions.TextHash.shingleHashes(toks, 3)
      hs.nonEmpty && hs.length <= math.max(1, toks.length - 2) &&
        hs.toSet.size == hs.length &&
        hs.toSeq == hs.sorted.toSeq // SortedIntersectCount relies on this
    }

  property("sortedIntersectCount == set-intersection size on sorted arrays") =
    forAll(for { a <- Gen.listOf(Gen.choose(0L, 50L))
                 b <- Gen.listOf(Gen.choose(0L, 50L)) } yield (a, b)) {
      case (a, b) =>
        val sa = a.distinct.sorted.toArray
        val sb = b.distinct.sorted.toArray
        import org.apache.spark.sql.catalyst.util.GenericArrayData
        graft.expressions.TextHash.sortedIntersectCount(
          new GenericArrayData(sa), new GenericArrayData(sb)) ==
          sa.toSet.intersect(sb.toSet).size.toLong
    }

  property("vamana search returns <= k results sorted ascending") =
    forAll(for { n <- Gen.choose(1, 60); vs <- Gen.listOfN(n, vecGen(8))
                 q <- vecGen(8); k <- Gen.choose(1, 12) } yield (vs, q, k)) {
      case (vs, q, k) =>
        val ix = new VamanaIndex(8, Metric.L2, 16, 32)
        vs.foreach(ix.add)
        val (ids, ds) = ix.search(q, k, 32)
        ids.length == math.min(k, vs.length) &&
        ds.toSeq == ds.sorted.toSeq &&
        ids.toSet.size == ids.length
    }
}
