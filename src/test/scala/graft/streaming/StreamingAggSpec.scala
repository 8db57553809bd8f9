package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.sql.Timestamp

/** Streaming analytics surface (SURVEY §2.2): watermarked event-time window
 *  aggregation over an events-shaped stream — readStream → window agg →
 *  memory sink, late rows beyond the watermark dropped. */
class StreamingAggSpec extends AnyFunSuite {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  test("watermarked tumbling-window aggregation over an event stream") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[(Timestamp, String, Double)]
    val agg = ms.toDF().toDF("ts", "event_type", "value")
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "5 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum("value").as("sv"))
    val q = agg.writeStream.outputMode("update")
      .format("memory").queryName("ev_agg").start()
    try {
      def t(min: Int) = Timestamp.valueOf(f"2024-01-01 10:$min%02d:00")
      ms.addData((t(0), "click", 1.0), (t(1), "click", 2.0), (t(6), "view", 5.0))
      q.processAllAvailable()
      ms.addData((t(30), "click", 1.0)) // advances watermark to 10:20
      q.processAllAvailable()
      ms.addData((t(2), "click", 100.0)) // late beyond watermark → dropped
      q.processAllAvailable()
      val rows = spark.sql(
        """SELECT event_type, n, sv FROM ev_agg
          |WHERE window.start = timestamp'2024-01-01 10:00:00'""".stripMargin)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
      assert(rows.contains(("click", 2L, 3.0)), s"got $rows")
      assert(!rows.exists { case (_, _, sv) => sv > 50 }, "late row must be dropped")
    } finally q.stop()
  }
}
