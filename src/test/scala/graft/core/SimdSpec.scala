package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** SIMD kernel correctness: lane-reduced results must agree with the scalar
  * loops to float tolerance, and the module must actually be enabled in this
  * build (the forked JVM carries --add-modules=jdk.incubator.vector — if
  * this assertion fails the wiring broke and every bench silently fell back
  * to scalar). */
class SimdSpec extends AnyFunSuite {

  private def scalarDot(a: Array[Float], b: Array[Float]): Float = {
    var s = 0.0f; var i = 0
    while (i < a.length) { s += a(i) * b(i); i += 1 }; s
  }
  private def scalarL2(a: Array[Float], b: Array[Float]): Float = {
    var s = 0.0f; var i = 0
    while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }; s
  }

  test("jdk.incubator.vector module is enabled in the test JVM") {
    assert(Simd.enabled, "--add-modules=jdk.incubator.vector missing: SIMD " +
      "kernels silently degraded to scalar fallback")
  }

  test("dot/l2Sq/cosine agree with scalar loops across dims incl. tails") {
    val rnd = new scala.util.Random(7)
    for (dim <- Seq(1, 3, 7, 15, 16, 17, 31, 33, 64, 100, 129)) {
      val a = Array.fill(dim)(rnd.nextFloat() * 2 - 1)
      val b = Array.fill(dim)(rnd.nextFloat() * 2 - 1)
      val tol = 1e-4f * dim
      assert(math.abs(Simd.dot(a, 0, b, 0, dim) - scalarDot(a, b)) <= tol)
      assert(math.abs(Simd.l2Sq(a, 0, b, 0, dim) - scalarL2(a, b)) <= tol)
      assert(math.abs(Simd.cosine(a, 0, b, 0, dim) -
        VectorOps.cosineSimilarity(a, b)) <= 1e-4f)
    }
  }

  test("offset variants read the right slices of flat storage") {
    val rnd = new scala.util.Random(11)
    val dim = 64
    val flat = Array.fill(dim * 5)(rnd.nextFloat())
    val q = Array.fill(dim)(rnd.nextFloat())
    for (node <- 0 until 5) {
      val v = java.util.Arrays.copyOfRange(flat, node * dim, (node + 1) * dim)
      assert(math.abs(Simd.l2Sq(flat, node * dim, q, 0, dim) - scalarL2(v, q)) <= 1e-3f)
      assert(math.abs(Simd.dot(flat, node * dim, q, 0, dim) - scalarDot(v, q)) <= 1e-3f)
    }
  }

  test("l2Sq self-distance is exactly zero; kernels are symmetric") {
    val rnd = new scala.util.Random(13)
    val a = Array.fill(64)(rnd.nextFloat())
    val b = Array.fill(64)(rnd.nextFloat())
    assert(Simd.l2Sq(a, 0, a, 0, 64) == 0.0f)
    assert(Simd.l2Sq(a, 0, b, 0, 64) == Simd.l2Sq(b, 0, a, 0, 64))
    assert(Simd.dot(a, 0, b, 0, 64) == Simd.dot(b, 0, a, 0, 64))
  }
}
