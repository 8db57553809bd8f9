package graft.index

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** ScalaCheck properties for the quantization kernels. */
object IndexProperties extends Properties("graft.index") {

  private val genPq: Gen[(PqCodec.Codebook, Array[Array[Float]])] = for {
    m <- Gen.oneOf(2, 4)
    dsub <- Gen.choose(2, 6)
    n <- Gen.choose(20, 60)
    seed <- Gen.choose(0L, Long.MaxValue)
  } yield {
    val rnd = new scala.util.Random(seed)
    val dim = m * dsub
    val data = Array.fill(n)(Array.fill(dim)(rnd.nextFloat() * 4 - 2))
    (PqCodec.train(data, m, k = 16), data)
  }

  property("pq: encode is deterministic; decode has codebook dim") =
    forAll(genPq) { case (cb, data) =>
      val v = data(0)
      val c1 = PqCodec.encode(cb, v)
      val c2 = PqCodec.encode(cb, v)
      c1.toSeq == c2.toSeq && PqCodec.decode(cb, c1).length == cb.dim
    }

  property("pq: adc(lut(q), code) == l2Sq(q, decode(code)) within float assoc") =
    forAll(genPq) { case (cb, data) =>
      val q = data(data.length / 2)
      data.take(10).forall { v =>
        val code = PqCodec.encode(cb, v)
        val adc = PqCodec.adc(PqCodec.lut(cb, q, l2 = true), cb.k, code)
        val direct = graft.core.VectorOps.l2Sq(q, PqCodec.decode(cb, code))
        math.abs(adc - direct) <= 1e-3f * math.max(1f, direct)
      }
    }

  property("pq: quantizing a vector never beats its own cell (encode is argmin)") =
    forAll(genPq) { case (cb, data) =>
      val v = data(1)
      val code = PqCodec.encode(cb, v)
      // per subspace, the chosen centroid minimizes the sub-distance
      (0 until cb.m).forall { s =>
        val chosen = cb.centroids(s)(code(s) & 0xff)
        val dChosen = graft.core.Simd.l2Sq(v, s * cb.dsub, chosen, 0, cb.dsub)
        cb.centroids(s).forall { c =>
          dChosen <= graft.core.Simd.l2Sq(v, s * cb.dsub, c, 0, cb.dsub) + 1e-5f
        }
      }
    }
}
