package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.text.TextOps

/**
 * Checkpoint crash-recovery: stop a streaming query mid-stream, restart it
 * from the SAME checkpoint directory, and assert exactly-once semantics —
 * no fingerprint lost or re-admitted (dedup), packing state intact across
 * the restart (pack). State-store recovery is the whole 100 TB streaming
 * story: an ingest pipeline that forgets its seen-set (or re-emits) on a
 * restart corrupts the training corpus. The sink is a real parquet file
 * sink (the memory sink refuses checkpoint recovery), so the assertion
 * covers the exactly-once contract end to end: state store + sink commit
 * log together.
 */
class CrashRecoverySpec extends AnyFunSuite {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  private def tmp(tag: String): String = {
    val d = java.nio.file.Files.createTempDirectory(s"graft-crash-$tag").toFile
    d.deleteOnExit()
    d.getAbsolutePath
  }

  test("dedup: state survives a restart — cross-restart duplicates drop, " +
      "nothing is lost or re-emitted") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[(Long, String)]
    val deduped = StreamingDedup.dedup(
      ms.toDF().toDF("doc_id", "text"), "text", "doc_id")
    val ckpt = tmp("dedup-ckpt"); val out = tmp("dedup-out")
    def start() = deduped.writeStream.outputMode("append")
      .format("parquet").option("path", out)
      .option("checkpointLocation", ckpt).start()

    // run 1: two batches, one in-batch duplicate
    val q1 = start()
    try {
      ms.addData((1L, "alpha"), (2L, "beta"), (3L, "alpha"))
      q1.processAllAvailable()
      ms.addData((4L, "gamma"))
      q1.processAllAvailable()
    } finally q1.stop()
    val run1 = spark.read.parquet(out).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(run1 == Set(1L, 2L, 4L), s"run-1 keep-set wrong: $run1")

    // data arrives while the query is DOWN; includes duplicates of texts the
    // OLD run admitted — only recovered state can know to drop them
    ms.addData((5L, "beta"), (6L, "delta"), (7L, "gamma"), (8L, "epsilon"))

    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()
    val all = spark.read.parquet(out).select("doc_id")
      .collect().map(_.getLong(0)).toSeq
    // exactly-once: new texts pass exactly once, recovered fingerprints
    // drop, nothing from run 1 is re-emitted or lost
    assert(all.sorted == Seq(1L, 2L, 4L, 6L, 8L),
      s"post-restart corpus wrong: ${all.sorted}")
  }

  test("pack: running sequence state survives a restart — packing equals " +
      "the batch result over the full corpus") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val rows = Seq(
      (1L, "g", "a b c"), (2L, "g", "d e f"),     // run 1: seq 0 fills to 6/7
      (3L, "g", "g h i"),                         // run 2: must overflow to seq 1
      (4L, "g", "x y"), (5L, "h", "p q"))         // run 2: continues seq 1 + new group
    val ms = MemoryStream[(Long, String, String)]
    val packed = StreamingPack.pack(
      ms.toDF().toDF("doc_id", "lang", "text"), "text", "doc_id", "lang", 7L)
    val ckpt = tmp("pack-ckpt"); val out = tmp("pack-out")
    def start() = packed.writeStream.outputMode("append")
      .format("parquet").option("path", out)
      .option("checkpointLocation", ckpt).start()

    val q1 = start()
    try {
      ms.addData(rows(0), rows(1))
      q1.processAllAvailable()
    } finally q1.stop()

    ms.addData(rows(2), rows(3), rows(4)) // while down

    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()

    val streamed = spark.read.parquet(out)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
      .sortBy(t => (t._1, t._2)).toSeq
    val batch = TextOps.packSequences(
        rows.toDF("doc_id", "lang", "text"), "text", "doc_id", "lang", 7L)
      .orderBy("lang", "doc_id")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    assert(streamed == batch, s"streamed $streamed\nbatch    $batch")
    // the restart boundary is exactly where the overflow happens: doc 3's
    // seq_id=1 proves the (seq, running) state crossed the checkpoint
    assert(streamed.find(_._2 == 3L).get._4 == 1L)
    // exactly-once: every doc appears exactly once across both runs
    assert(streamed.map(_._2) == streamed.map(_._2).distinct)
  }
}
