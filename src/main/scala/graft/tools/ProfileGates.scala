package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.text.TextOps

/** Per-signal attribution for the curation gate projection: times each
 *  row-local signal (tokenize, langId, quality, repetition) in isolation
 *  over the same corpus, so a slow gate is pinned to its kernel. */
object ProfileGates {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val iters = if (args.length > 1) args(1).toInt else 1
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    def time(tag: String)(c: org.apache.spark.sql.Column): Unit = {
      val t0 = System.nanoTime()
      val n = docs.select(c.as("x")).agg(count(col("x"))).collect()(0).getLong(0)
      println(f"$tag%-24s ${(System.nanoTime() - t0) / 1e9}%6.2fs rows=$n")
    }
    val toks = TextOps.tokens(col("text"))
    for (_ <- 1 to iters) {
      time("tokens(size)")(size(toks))
      time("shingleHashes(size)")(size(TextOps.shingleHashes(toks, 3)))
      time("langId")(TextOps.langId(toks))
      time("quality")(TextOps.qualityColumns(col("text"))
        .find(_._1 == "quality").get._2)
      time("rep_bigram")(TextOps.repetitionColumns(col("text"))
        .find(_._1 == "dup_bigram_frac").get._2)
      time("rep_5gram")(TextOps.repetitionColumns(col("text"))
        .find(_._1 == "dup_5gram_frac").get._2)
      val quality = TextOps.qualityColumns(col("text"))
        .find(_._1 == "quality").get._2
      val rep = TextOps.repetitionColumns(col("text"))
        .find(_._1 == "dup_bigram_frac").get._2
      time("full gate")(
        when(!TextOps.langId(toks).isin("en", "de"), "lang")
          .when(quality < 0.3, "quality").when(rep > 0.5, "repetitive"))
      println()
    }
    spark.stop()
  }
}
