package graft.tools

import org.apache.spark.sql.SparkSession
import graft.index.Ann

/** Wall-clock of index BUILDS (the training-dominated bench entries) —
 *  backs the chunk-parallel k-means/OPQ kernels. */
object ProfileTrain {
  def main(args: Array[String]): Unit = {
    val sf = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.graft.ann.root", s"/tmp/graft-proftrain-${System.nanoTime()}")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    def time(tag: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"$tag%-14s ${(System.nanoTime() - t0) / 1e9}%8.2fs")
    }
    for (r <- 1 to 2) {
      time("build OPQ8,PQ8")(Ann.buildIndexFactory(emb, "embedding", "vec_id", "pt_opq", "OPQ8,PQ8"))
      time("build PQ8")(Ann.buildIndexFactory(emb, "embedding", "vec_id", "pt_pq", "PQ8"))
      time("build IVF64")(Ann.buildIndexFactory(emb, "embedding", "vec_id", "pt_ivf", "IVF64"))
      time("build IVF64,PQ8")(Ann.buildIndexFactory(emb, "embedding", "vec_id", "pt_ivfpq", "IVF64,PQ8"))
    }
    spark.stop()
  }
}
