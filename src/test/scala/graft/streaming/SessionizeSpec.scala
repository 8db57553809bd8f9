package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.sql.Timestamp

/** Streaming sessionization: session_window state merges in-gap events,
 *  the watermark closes sessions exactly once, and closed sessions match
 *  the batch gaps-and-islands formulation on the same data. */
class SessionizeSpec extends AnyFunSuite {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  private def t(h: Int, min: Int) = Timestamp.valueOf(f"2024-01-01 $h%02d:$min%02d:00")

  test("sessions close once past the watermark and match batch semantics") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[(Long, Timestamp)]
    val sess = Sessionize.sessionize(ms.toDF().toDF("user_id", "ts"),
      "ts", Seq("user_id"), gap = "30 minutes", watermark = "10 minutes")
    val q = sess.writeStream.outputMode("append")
      .format("memory").queryName("sessions").start()
    try {
      // user 1: two events 20 min apart (one session), then a 40-min gap
      // (new session); user 2: one event. Events arrive across batches and
      // OUT of order within the gap — session_window must still merge.
      ms.addData((1L, t(10, 0)), (2L, t(10, 5)))
      q.processAllAvailable()
      ms.addData((1L, t(10, 20))) // merges into user 1's open session
      q.processAllAvailable()
      ms.addData((1L, t(11, 0))) // 40-min gap → second session
      q.processAllAvailable()
      // advance the watermark far enough (13:00 − 10 min) that every
      // session above is closed and emitted exactly once
      ms.addData((3L, t(12, 0)))
      q.processAllAvailable()
      ms.addData((3L, t(13, 0)))
      q.processAllAvailable()
      val closed = spark.table("sessions")
        .select("user_id", "session_start", "session_end", "n_events")
        .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2),
          r.getLong(3))).toSet
      val expect = Set(
        (1L, t(10, 0), t(10, 20), 2L),
        (1L, t(11, 0), t(11, 0), 1L),
        (2L, t(10, 5), t(10, 5), 1L),
        (3L, t(12, 0), t(12, 0), 1L)) // first watermark-advance sentinel closes too
      assert(closed == expect, s"got $closed")

      // batch parity: the same rows through the batch gaps-and-islands shape
      val rows = Seq((1L, t(10, 0)), (1L, t(10, 20)), (1L, t(11, 0)),
        (2L, t(10, 5)), (3L, t(12, 0))).toDF("user_id", "ts")
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy("ts")
      val prev = lag(col("ts"), 1).over(w)
      val batch = rows
        .withColumn("__new", when(prev.isNull ||
          col("ts").cast("long") - prev.cast("long") > 1800L, 1L).otherwise(0L))
        .withColumn("sid", sum(col("__new")).over(
          w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
        .groupBy("user_id", "sid")
        .agg(min("ts").as("session_start"), max("ts").as("session_end"),
          count(lit(1)).as("n_events"))
        .select("user_id", "session_start", "session_end", "n_events")
        .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2),
          r.getLong(3))).toSet
      assert(batch == expect, s"batch shape diverged: $batch")
    } finally q.stop()
  }

  test("a gap of EXACTLY the session gap merges in both modes") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // Boundary contract, pinned empirically: session_window MERGES a window
    // whose start equals the previous window's end, so an event exactly
    // 30 min after the previous one joins the session — hence the batch
    // shape's STRICT > on the gap. (A half-open [t, t+gap) reading would
    // predict a split; Spark's merge condition is inclusive.)
    val ms = MemoryStream[(Long, Timestamp)]
    val sess = Sessionize.sessionize(ms.toDF().toDF("user_id", "ts"),
      "ts", Seq("user_id"), gap = "30 minutes", watermark = "10 minutes")
    val q = sess.writeStream.outputMode("append")
      .format("memory").queryName("sessions_boundary").start()
    try {
      ms.addData((1L, t(10, 0)), (1L, t(10, 30))) // exactly 30 min apart
      q.processAllAvailable()
      ms.addData((9L, t(13, 0))) // watermark sentinel: closes user 1
      q.processAllAvailable()
      val closed = spark.table("sessions_boundary")
        .where(col("user_id") === 1L)
        .select("session_start", "session_end", "n_events")
        .collect().map(r => (r.getTimestamp(0), r.getTimestamp(1), r.getLong(2))).toSet
      val expect = Set((t(10, 0), t(10, 30), 2L)) // one merged session
      assert(closed == expect, s"streaming boundary diverged: $closed")

      // batch shape on the same rows must agree
      val rows = Seq((1L, t(10, 0)), (1L, t(10, 30))).toDF("user_id", "ts")
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy("ts")
      val prev = lag(col("ts"), 1).over(w)
      val batch = rows
        .withColumn("__new", when(prev.isNull ||
          col("ts").cast("long") - prev.cast("long") > 1800L, 1L).otherwise(0L))
        .withColumn("sid", sum(col("__new")).over(
          w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
        .groupBy("user_id", "sid")
        .agg(min("ts").as("session_start"), max("ts").as("session_end"),
          count(lit(1)).as("n_events"))
        .select("session_start", "session_end", "n_events")
        .collect().map(r => (r.getTimestamp(0), r.getTimestamp(1), r.getLong(2))).toSet
      assert(batch == expect, s"batch boundary diverged: $batch")
    } finally q.stop()
  }

  test("sessionizeBatch scan == windowed lag/cumsum formulation on real events") {
    val ev = graft.SparkEntry.readEvents(spark, "/root/testdata/sf0.01")
      .select(col("user_id"), col("tus"), col("event_id"))
    val gapUs = 30L * 60 * 1000000L
    val scan = Sessionize.sessionizeBatch(ev, "user_id", "tus", "event_id", gapUs)
      .orderBy("user_id", "session_seq")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("tus"), col("event_id"))
    val prev = lag(col("tus"), 1).over(w)
    val windowed = ev.withColumn("__new",
        when(prev.isNull || col("tus") - prev > gapUs, 1L).otherwise(0L))
      .withColumn("session_seq", sum(col("__new")).over(
        w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
      .groupBy(col("user_id"), col("session_seq"))
      .agg(min(col("tus")).as("session_start"), max(col("tus")).as("session_end"),
        count(lit(1)).as("n_events"))
      .orderBy("user_id", "session_seq")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    assert(scan.nonEmpty && scan == windowed)
  }

  test("sessionizeBatch: NULL users form their own group; NULL times drop") {
    import spark.implicits._
    val gapUs = 100L
    val ev = Seq[(Option[Long], Option[Long], Long)](
      (Some(1L), Some(1000L), 1L),   // user 1, one session of two events
      (Some(1L), Some(1050L), 2L),
      (Some(0L), Some(1000L), 3L),   // user 0 must NOT absorb the NULL user
      (None, Some(1000L), 4L),       // NULL user: own group...
      (None, Some(1050L), 5L),       //   ...same session
      (None, Some(5000L), 6L),       //   ...second session after the gap
      (Some(1L), None, 7L)           // NULL time: dropped
    ).toDF("user_id", "tus", "event_id")
    val out = Sessionize.sessionizeBatch(ev, "user_id", "tus", "event_id", gapUs)
      .orderBy(col("user_id").asc_nulls_last, col("session_seq"))
      .collect()
      .map(r => (if (r.isNullAt(0)) None else Some(r.getLong(0)),
        r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSeq
    assert(out == Seq(
      (Some(0L), 1L, 1000L, 1000L, 1L),
      (Some(1L), 1L, 1000L, 1050L, 2L),
      (None, 1L, 1000L, 1050L, 2L),
      (None, 2L, 5000L, 5000L, 1L)))
  }
}
