package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.text.TextOps

/** End-to-end streaming ingest composition: the stateless quality /
 *  repetition gates (pure codegen'd expressions) chain directly into the
 *  stateful exact dedup inside ONE streaming query — the shape of a
 *  continuous training-data ingest pipeline. */
class StreamingPipelineSpec extends AnyFunSuite {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  test("quality gate then exact dedup in one streaming query") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[(Long, String)]

    val spam = ("buy now " * 30).trim            // dup_bigram_frac ≈ 1 → gated
    val good1 = "a perfectly reasonable document about spark aggregation"
    val good2 = "another quite different document describing minhash bands"

    val gated = ms.toDF().toDF("doc_id", "text")
      .withColumn("__rep", TextOps.repetitionColumns(col("text"))
        .find(_._1 == "dup_bigram_frac").get._2)
      .where(col("__rep") < 0.5).drop("__rep")
    val deduped = StreamingDedup.dedup(gated, "text", "doc_id")

    val q = deduped.writeStream.outputMode("append")
      .format("memory").queryName("ingest").start()
    try {
      ms.addData((1L, good1), (2L, spam), (3L, good2))
      q.processAllAvailable()
      ms.addData((4L, good1), (5L, spam)) // dup of 1 + more spam: both dropped
      q.processAllAvailable()
      val kept = spark.table("ingest").select("doc_id")
        .collect().map(_.getLong(0)).toSet
      assert(kept == Set(1L, 3L), s"got $kept")
    } finally q.stop()
  }
}
