// Lives in graft.core for access to the package-private load() used to wire
// a synthetic graph (building 400k nodes for real takes minutes; traversal
// cost over a random regular graph is representative for timing).
package graft.core

import scala.util.Random

/** A/B: lock-step gemm batch traversal vs independent per-query searches on
 *  one shard (heap and mmap serving). Both paths must return identical
 *  results (asserted); the timing delta is the lock-step effect. Run with
 *  `sbt "runMain graft.core.ProfileBatch [n] [nq] [groupSize]"`. */
object ProfileBatch {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toInt else 400000
    val nq = if (args.length > 1) args(1).toInt else 256
    val dim = 64; val deg = 32; val k = 10; val sc = 100
    val rnd = new Random(42)
    var t0 = System.nanoTime()
    val flat = new Array[Float](n * dim)
    var i = 0
    while (i < flat.length) { flat(i) = rnd.nextFloat(); i += 1 }
    val adj = Array.fill(n)(Array.fill(deg)(rnd.nextInt(n)))
    val ix = new VamanaIndex(dim, Metric.L2, deg, sc)
    ix.load(n, flat, adj, Array(0))
    println(f"synthetic graph wired: ${(System.nanoTime() - t0) / 1e9}%.2f s " +
      f"($n x $dim, deg $deg, ${n.toLong * dim * 4 / 1024 / 1024} MB vectors)")
    val queries = Array.fill(nq)(Array.fill(dim)(rnd.nextFloat()))

    def time[T](label: String)(f: => T): T = {
      val s = System.nanoTime(); val r = f
      println(f"$label: ${(System.nanoTime() - s) / 1e3 / nq}%.1f us/query " +
        f"(${(System.nanoTime() - s) / 1e6}%.1f ms total)")
      r
    }

    def ab(label: String, g: GraphIndex): Unit = {
      var bestS = Double.MaxValue; var bestB = Double.MaxValue
      for (round <- 1 to 6) {
        val s0 = System.nanoTime()
        val single = queries.map(q => g.search(q, k, sc))
        val sT = (System.nanoTime() - s0) / 1e3 / nq
        val b0 = System.nanoTime()
        val batch = g.searchBatch(queries, k, sc)
        val bT = (System.nanoTime() - b0) / 1e3 / nq
        queries.indices.foreach { i =>
          require(single(i)._1.sameElements(batch(i)._1) &&
                  single(i)._2.sameElements(batch(i)._2), s"mismatch at query $i")
        }
        if (round > 1) { bestS = math.min(bestS, sT); bestB = math.min(bestB, bT) }
      }
      println(f"$label: per-query min $bestS%.1f us/q, lock-step min $bestB%.1f us/q " +
        f"(${(1 - bestB / bestS) * 100}%.1f%% faster)")
    }

    ab("heap", ix)
    val tmp = java.io.File.createTempFile("profbatch", ".diskann")
    tmp.deleteOnExit()
    ix.finalizePruning()
    DiskannFormat.writeFile(ix, tmp.getAbsolutePath)
    val mm = DiskannMmapIndex.open(tmp.getAbsolutePath)
    ab("mmap", mm)
    // SQ8 (quantized in place): the dequantize-into-gather cursor keeps the
    // gemm hop available; A/B shows what lock-step buys on a DRAM-resident
    // quantized shard
    ix.quantize()
    ab("sq8", ix)
  }
}
