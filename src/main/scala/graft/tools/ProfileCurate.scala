package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.text.{Curate, TextOps}

/** Stage timing for the curation composition. */
object ProfileCurate {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val iters = if (args.length > 1) args(1).toInt else 3
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val cfg = Curate.Config(langs = Set("en", "de"), minQuality = 0.3,
      maxDupBigramFrac = 0.5, minJaccard = 0.6,
      evalPred = id => id % 5 === 0, samplePermille = lit(700))
    def time(tag: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$tag%-26s ${(System.nanoTime() - t0) / 1e9}%6.2fs rows=$n")
    }
    for (_ <- 1 to iters) {
      val quality = TextOps.qualityColumns(col("text")).find(_._1 == "quality").get._2
      val rep = TextOps.repetitionColumns(col("text")).find(_._1 == "dup_bigram_frac").get._2
      val gated = docs.withColumn("__r",
        when(!TextOps.langId(TextOps.tokens(col("text"))).isin("en", "de"), "lang")
          .when(quality < 0.3, "quality").when(rep > 0.5, "repetitive"))
      time("gates only")(gated.where(col("__r").isNull).count())
      val pass1 = gated.where(col("__r").isNull).select(col("doc_id"), col("text"))
      time("jaccardPairs(pass1)")(TextOps.jaccardPairs(pass1, "text", "doc_id",
        minJaccard = 0.6).count())
      val nd = TextOps.jaccardPairs(pass1, "text", "doc_id", minJaccard = 0.6)
        .select(col("id_b").as("__nd")).distinct()
      val pass2 = pass1.join(nd, col("doc_id") === col("__nd"), "left_anti")
      time("contamination(pass2)")(TextOps.contaminationCounts(pass2, "text",
        "doc_id", id => id % 5 === 0).count())
      time("full report")(Curate.report(docs, "text", "doc_id", cfg).count())
    }
    spark.stop()
  }
}
