package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.text.TextOps

/** Piecewise attribution for the LSH dedup pipeline: times each layer
 *  (signatures → candidatePairs → jaccardPairs → dedup) so octave-over-
 *  octave growth can be pinned to a stage instead of argued from the plan.
 *  Arg 1: a dir with documents.parquet (testdata sf dir or a replicated
 *  target/scaleN dir); arg 2 optional iteration count (default 2). */
object ProfileMinhash {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val iters = if (args.length > 1) args(1).toInt else 2
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.graft.neardup.broadcastMaxBytes", "0")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    def time(tag: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$tag%-26s ${(System.nanoTime() - t0) / 1e9}%6.2fs rows=$n")
    }
    for (_ <- 1 to iters) {
      val sigs = TextOps.signatures(docs, "text", "doc_id")
      time("signatures")(
        sigs.select(sum(element_at(col("sig"), 1)), sum(element_at(col("bands"), 1)))
          .collect().length.toLong)
      time("bandTable")(TextOps.bandTable(sigs).count())
      time("candidatePairs")(TextOps.candidatePairs(sigs).count())
      time("jaccardPairs")(
        TextOps.jaccardPairs(docs, "text", "doc_id", minJaccard = 0.6).count())
      time("dedupByMinhash")(
        TextOps.dedupByMinhash(docs, "text", "doc_id", minJaccard = 0.6).count())
      println()
    }
    spark.stop()
  }
}
