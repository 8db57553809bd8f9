package graft.tools

import graft.core.{VamanaIndex, HnswIndex, Metric}
import scala.util.Random

/** Single-thread engine microbench: insert rate + query rate per engine. */
object ProfileBuild {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(5000)
    val dim = 64
    val r = new Random(42)
    val vecs = Array.fill(n)(Array.fill(dim)(r.nextFloat() * 2 - 1))
    val queries = Array.fill(100)(Array.fill(dim)(r.nextFloat() * 2 - 1))

    for (round <- 0 until 3) {
      var t0 = System.nanoTime()
      val vx = new VamanaIndex(dim, Metric.L2, 64, 128, 1.2f)
      vecs.foreach(vx.add)
      val tBuildV = (System.nanoTime() - t0) / 1e9
      t0 = System.nanoTime()
      var acc = 0L
      for (_ <- 0 until 10; q <- queries) acc += vx.search(q, 10, 128)._1.length
      val tSearchV = (System.nanoTime() - t0) / 1e9

      t0 = System.nanoTime()
      val hx = new HnswIndex(dim, Metric.L2, 32, 200)
      vecs.foreach(hx.add)
      val tBuildH = (System.nanoTime() - t0) / 1e9
      t0 = System.nanoTime()
      for (_ <- 0 until 10; q <- queries) acc += hx.search(q, 10, 128)._1.length
      val tSearchH = (System.nanoTime() - t0) / 1e9
      if (round == 2)
        println(f"n=$n vamana: build ${n / tBuildV}%.0f ins/s, search ${1000 / tSearchV}%.0f q/s | " +
          f"hnsw: build ${n / tBuildH}%.0f ins/s, search ${1000 / tSearchH}%.0f q/s ($acc)")
    }
  }
}
