package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** Streaming exact dedup: per-fingerprint flatMapGroupsWithState must pass
 *  each distinct text through exactly once across ALL batches, and the
 *  stats view must count the drops. */
class StreamingDedupSpec extends AnyFunSuite {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  test("first occurrence passes, cross-batch duplicates drop") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[(Long, String)]
    val out = StreamingDedup.dedup(ms.toDF().toDF("doc_id", "text"), "text", "doc_id")
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("dedup_out").start()
    try {
      ms.addData((1L, "alpha doc"), (2L, "beta doc"), (3L, "alpha doc"))
      q.processAllAvailable()
      ms.addData((4L, "alpha doc"), (5L, "gamma doc")) // dup arrives in a LATER batch
      q.processAllAvailable()
      val rows = spark.sql("SELECT doc_id, text FROM dedup_out")
        .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1).toSeq
      assert(rows == Seq((1L, "alpha doc"), (2L, "beta doc"), (5L, "gamma doc")),
        s"got $rows")
    } finally q.stop()
  }

  test("dupStats counts drops per fingerprint") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[(Long, String)]
    val out = StreamingDedup.dupStats(ms.toDF().toDF("doc_id", "text"), "text", "doc_id")
    val q = out.writeStream.outputMode("update")
      .format("memory").queryName("dedup_stats").start()
    try {
      ms.addData((10L, "x"), (11L, "x"), (12L, "x"), (13L, "y"))
      q.processAllAvailable()
      ms.addData((14L, "x"))
      q.processAllAvailable()
      // update mode: take the LAST emitted row per fingerprint
      val last = spark.sql("SELECT fp, keep_id, dups FROM dedup_stats")
        .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2))))
        .groupBy(_._1).map { case (fp, rows) =>
          fp -> rows.map(_._2).maxBy(_._2)
        }
      val byKeep = last.values.toMap
      assert(byKeep(10L) == 3L, s"x: expected 3 dups, got $byKeep") // 11,12,14
      assert(byKeep(13L) == 0L, s"y: expected 0 dups, got $byKeep")
    } finally q.stop()
  }

  test("negative ids: established groups are not re-admitted") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[(Long, String)]
    val out = StreamingDedup.dedup(ms.toDF().toDF("doc_id", "text"), "text", "doc_id")
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("dedup_neg").start()
    try {
      ms.addData((-5L, "neg doc")); q.processAllAvailable()
      ms.addData((7L, "neg doc")); q.processAllAvailable()
      val rows = spark.sql("SELECT doc_id FROM dedup_neg")
        .collect().map(_.getLong(0)).toSeq
      assert(rows == Seq(-5L), s"negative-id group re-admitted: $rows")
    } finally q.stop()
  }

  test("batch parity: stream dedup keep-set == batch dedup_exact keep-set") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import org.apache.spark.sql.functions._
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id").cast("long"), col("text"))
    // batch truth: min doc_id per text
    val expect = docs.groupBy("text").agg(min("doc_id").as("keep"))
      .collect().map(_.getLong(1)).sorted.toSeq
    val rows = docs.orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    val ms = MemoryStream[(Long, String)]
    val out = StreamingDedup.dedup(ms.toDF().toDF("doc_id", "text"), "text", "doc_id")
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("dedup_parity").start()
    try {
      val (a, b) = rows.splitAt(rows.length / 2)
      ms.addData(a: _*); q.processAllAvailable()
      ms.addData(b: _*); q.processAllAvailable()
      val got = spark.sql("SELECT doc_id FROM dedup_parity")
        .collect().map(_.getLong(0)).sorted.toSeq
      assert(got == expect, s"stream kept ${got.length}, batch kept ${expect.length}")
    } finally q.stop()
  }
}
