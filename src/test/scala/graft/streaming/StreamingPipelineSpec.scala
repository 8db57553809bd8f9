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

  test("ingest → gate → dedup → micro-shard index append → serve == batch build") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import graft.index.Ann
    spark.conf.set("spark.graft.ann.root",
      s"/tmp/graft-pipe-idx-${System.nanoTime()}")
    val ckpt = s"/tmp/graft-pipe-ckpt-${System.nanoTime()}"

    // deterministic per-doc embeddings; the serving query targets doc 1
    def vec(i: Long): Seq[Float] =
      Seq(i.toFloat, (i % 3).toFloat, (7 - i).toFloat, 1f)
    val allIds = 1L to 9L
    val vecDf = allIds.map(i => (i, vec(i))).toDF("doc_id", "vec")
      .withColumn("vec", col("vec").cast("array<float>"))

    val spam = ("buy now " * 30).trim
    def text(i: Long): String = s"document number $i about topic ${i % 4}"

    val ms = MemoryStream[(Long, String)]
    val gated = ms.toDF().toDF("doc_id", "text")
      .withColumn("__rep", TextOps.repetitionColumns(col("text"))
        .find(_._1 == "dup_bigram_frac").get._2)
      .where(col("__rep") < 0.5).drop("__rep")
    val deduped = StreamingDedup.dedup(gated, "text", "doc_id")
    val params = Ann.BuildParams(engine = "diskann", maxDegree = 16,
      buildComplexity = 32, numShards = 1)
    // each micro-batch of surviving docs fetches its vectors (post-dedup
    // embedding lookup) and appends a delta shard to the served index
    val q = deduped.writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        StreamingIndex.appendBatch(batch.join(vecDf, "doc_id"),
          "vec", "doc_id", "pipe_stream_idx", params, compactAt = 16)
      }.start()
    try {
      ms.addData((1L, text(1)), (2L, text(2)), (3L, spam))
      q.processAllAvailable()
      ms.addData((4L, text(4)), (5L, text(1)), (6L, spam)) // 5 dups 1
      q.processAllAvailable()
      ms.addData((7L, text(7)), (8L, text(8)), (9L, text(4))) // 9 dups 4
      q.processAllAvailable()
    } finally q.stop()

    val survivors = Set(1L, 2L, 4L, 7L, 8L)
    val keptDf = vecDf.where(col("doc_id").isin(survivors.toSeq: _*))
    // the streamed index holds exactly the gated+deduped docs, as micro
    // delta shards; a batch build over the same survivors is the oracle
    Ann.buildIndex(keptDf, "vec", "doc_id", "pipe_batch_idx", params)
    val qv = vec(1L).toArray
    def top(ix: String): Seq[(Long, Float)] =
      Ann.search(keptDf, "doc_id", ix, qv, 3, searchComplexity = 200)
        .select("doc_id", "_distance").collect()
        .map(r => (r.getLong(0), r.getFloat(1))).toSeq
    val served = top("pipe_stream_idx")
    val batchTop = top("pipe_batch_idx")
    assert(served.map(_._1).toSet.subsetOf(survivors))
    assert(served == batchTop,
      s"streamed index serves $served, batch build serves $batchTop")
  }
}
