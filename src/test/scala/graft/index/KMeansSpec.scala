package graft.index

import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

class KMeansSpec extends AnyFunSuite {

  test("balance pass: skewed corpus respects the cluster-size cap") {
    val rnd = new Random(5)
    val dim = 16
    // 90% of points in one tight blob, 10% spread out — unbalanced Lloyd
    // leaves most of the data in one or two blob clusters
    val blob = Array.fill(900)(Array.tabulate(dim)(d =>
      1.0f + rnd.nextFloat() * 0.01f + d * 0f))
    val spread = Array.fill(100)(Array.fill(dim)(rnd.nextFloat() * 20f))
    val samples = blob ++ spread
    val k = 8
    val cents = KMeansLite.train(samples, k)
    assert(cents.length == k, "nlist must stay fixed")
    val counts = new Array[Int](k)
    samples.foreach(s => counts(KMeansLite.nearest(cents, s)) += 1)
    val cap = math.ceil(KMeansLite.DefaultCapFactor * samples.length / k).toInt
    assert(counts.max <= cap,
      s"largest cluster ${counts.max} exceeds cap $cap (counts: ${counts.mkString(",")})")
  }

  test("balance pass: identical points cannot split and do not loop forever") {
    val samples = Array.fill(500)(Array.fill(8)(1.0f)) ++
      Array.fill(10)(Array.fill(8)(5.0f))
    val cents = KMeansLite.train(samples, 4)
    assert(cents.length == 4) // degenerate blob stays whole; no hang, no crash
  }

  test("uniform data: balance pass is a no-op shape-wise") {
    val rnd = new Random(11)
    val samples = Array.fill(800)(Array.fill(8)(rnd.nextFloat()))
    val cents = KMeansLite.train(samples, 8)
    val counts = new Array[Int](8)
    samples.foreach(s => counts(KMeansLite.nearest(cents, s)) += 1)
    assert(counts.count(_ > 0) >= 6, "uniform data should use most clusters")
  }
}
