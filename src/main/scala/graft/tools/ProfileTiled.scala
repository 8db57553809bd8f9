package graft.tools

import org.apache.spark.sql.SparkSession
import graft.text.TextOps

/** Sanity: tiled exact-pairs route on an input above the broadcast
 *  threshold — correctness vs broadcast route + timing. */
object ProfileTiled {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toInt else 20000
    val dim = 64
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    // clustered so pairs exist
    val centers = Array.fill(n / 10)(Array.fill(dim)(rnd.nextFloat()))
    val df = (0 until n).map { i =>
      val c = centers(i % centers.length)
      (i.toLong, c.map(x => x + rnd.nextFloat() * 0.2f).toSeq)
    }.toDF("id", "vec").repartition(16).cache()
    df.count()

    def run(label: String, maxBytes: String): (Long, Double) = {
      spark.conf.set("spark.graft.neardup.broadcastMaxBytes", maxBytes)
      val t0 = System.nanoTime()
      val cnt = TextOps.cosineExactPairs(df, "vec", "id", 0.995).count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"$label: $cnt pairs in $sec%.1f s")
      (cnt, sec)
    }
    val (cb, _) = run("broadcast", (1L << 40).toString)
    val (ct, _) = run("tiled    ", "1")
    require(cb == ct, s"pair counts differ: $cb vs $ct")
    spark.stop()
  }
}
