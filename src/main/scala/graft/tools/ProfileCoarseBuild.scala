package graft.tools

import graft.core.{HnswIndex, Metric}

/** Times the IVF_HNSW coarse-quantizer graph build at a given cell count
 *  (default the 65,536 of the 1.5M scale smoke): sequential `add` loop vs
 *  the batch-parallel `addAll`, plus a probe-recall parity check between
 *  the two graphs (recall@nprobe vs exact centroid ranking on held-out
 *  queries). Run: `sbt "runMain graft.tools.ProfileCoarseBuild [nCells]"`. */
object ProfileCoarseBuild {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 65536
    val dim = 64
    val rnd = new java.util.Random(7)
    val cents = Array.fill(n)(Array.fill(dim)(rnd.nextGaussian().toFloat))
    val queries = Array.fill(64)(Array.fill(dim)(rnd.nextGaussian().toFloat))
    val nprobe = 64
    def exactTop(q: Array[Float]): Set[Int] =
      graft.index.KMeansLite.nearestP(cents, q, nprobe).toSet
    def recall(ix: HnswIndex): Double = {
      val r = queries.map { q =>
        val got = ix.search(q, nprobe, math.max(64, 2 * nprobe))._1.toSet
        (got intersect exactTop(q)).size.toDouble / nprobe
      }
      r.sum / r.length
    }
    def time[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val out = f
      println(f"$tag: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      out
    }
    val bulk = time("addAll (batch-parallel)") {
      val ix = new HnswIndex(dim, Metric.L2, 32)
      ix.addAll(cents)
      ix
    }
    println(f"bulk probe recall@$nprobe: ${recall(bulk)}%.4f")
    val seq = time("add loop (sequential)") {
      val ix = new HnswIndex(dim, Metric.L2, 32)
      cents.foreach(ix.add)
      ix
    }
    println(f"seq  probe recall@$nprobe: ${recall(seq)}%.4f")
  }
}
