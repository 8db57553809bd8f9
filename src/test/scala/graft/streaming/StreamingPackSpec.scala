package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.text.TextOps

/** Streaming sequence packing: open-sequence state carries across
 *  micro-batches, and an id-ordered stream packs identically to the batch
 *  operator on the same rows. */
class StreamingPackSpec extends AnyFunSuite {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  test("stream fed in id order == batch packSequences; state spans batches") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val rows = Seq(
      (1L, "g", "a b c"), (2L, "g", "d e f"),          // batch 1
      (3L, "g", "g h i"),                              // batch 2: overflows seq 0
      (4L, "g", "one two three four five six seven eight nine"), // oversize
      (5L, "g", "x y"), (6L, "h", "p q r"))            // batch 3 + new group
    val ms = MemoryStream[(Long, String, String)]
    val packed = StreamingPack.pack(
      ms.toDF().toDF("doc_id", "lang", "text"), "text", "doc_id", "lang", 7L)
    val q = packed.writeStream.outputMode("append")
      .format("memory").queryName("packed").start()
    try {
      ms.addData(rows(0), rows(1)); q.processAllAvailable()
      ms.addData(rows(2)); q.processAllAvailable()
      ms.addData(rows(3), rows(4), rows(5)); q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("packed")
      .orderBy("lang", "doc_id")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    val batch = TextOps.packSequences(
        rows.toDF("doc_id", "lang", "text"), "text", "doc_id", "lang", 7L)
      .orderBy("lang", "doc_id")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    assert(streamed == batch, s"streamed $streamed\nbatch    $batch")
    // spot-check the cross-batch continuation: doc 3 overflowed into seq 1
    assert(streamed.find(_._2 == 3L).get._4 == 1L)
  }
}
