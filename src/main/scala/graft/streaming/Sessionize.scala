package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Streaming sessionization — the continuous counterpart of the batch
 * `events_sessionize` operator (gaps-and-islands over `lag`): a session is
 * a run of a user's events where consecutive gaps stay within `gap`.
 *
 * Built on Spark's native `session_window`, which keeps engine-managed
 * per-(user, open-session) state and MERGES overlapping windows as events
 * arrive — the exact semantics the batch window computes in one pass over
 * sorted history. The watermark closes sessions: once event time passes
 * `session end + watermark`, the session is final and emits exactly once
 * (Append mode), which is what an ingest pipeline wants for writing
 * immutable session logs.
 *
 * State scales horizontally: grouping shuffles by user, each group holds
 * only its OPEN sessions (closed ones are evicted by the watermark), so
 * state size is bounded by concurrently-active users — not history. At
 * 100 TB/day of events this is the only shape that survives: the batch
 * formulation's per-user sort sees all history; this sees a watermark-deep
 * suffix.
 */
object Sessionize {

  /**
   * Sessionize `stream` (must carry a TIMESTAMP `tsCol`). Returns one row
   * per CLOSED session: key columns + `session_start`, `session_end`,
   * `n_events`. Append mode; attach any sink.
   *
   * Boundary contract (pinned by SessionizeSpec): an event arriving EXACTLY
   * `gap` after the previous one MERGES into the session — session_window
   * merges a window whose start equals the previous window's end, which is
   * why the batch gaps-and-islands shape uses a STRICT `>` gap comparison.
   *
   * @param gap       max in-session gap, e.g. "30 minutes"
   * @param watermark how long to admit late events before a session closes
   */
  def sessionize(stream: DataFrame, tsCol: String, keyCols: Seq[String],
      gap: String = "30 minutes", watermark: String = "1 hour"): DataFrame = {
    val keys: Seq[Column] = keyCols.map(col)
    stream
      .withWatermark(tsCol, watermark)
      .groupBy(keys :+ session_window(col(tsCol), gap): _*)
      .agg(min(col(tsCol)).as("session_start"), max(col(tsCol)).as("session_end"),
        count(lit(1)).as("n_events"))
      .select(keys ++ Seq(col("session_start"), col("session_end"),
        col("n_events")): _*)
  }

  /**
   * Batch sessionization over integer event times (epoch micros) as ONE
   * shuffle: repartition by user + sortWithinPartitions + a constant-memory
   * `mapPartitions` scan that emits a session row whenever the gap is
   * exceeded or the user changes. Replaces the two-window + aggregate
   * formulation (lag → cumulative-sum session ids → groupBy), which carried
   * the same exchange but paid two WindowExec passes and a hash aggregate
   * over every event. Output: `(user, session_seq, session_start,
   * session_end, n_events)` — identical rows to the windowed shape (the
   * events_sessionize oracle), with the SAME strict-> gap boundary the
   * streaming [[sessionize]] has (an event exactly `gapUs` later merges).
   * Scale: no per-user state beyond the open session; a user's events never
   * materialize as a group.
   *
   * NULL handling (the return contract): a NULL user sessionizes as its OWN
   * group — matching `Window.partitionBy`, where NULL keys form one
   * partition — and emits sessions with a NULL `user` column. A NULL event
   * time is DROPPED: an event with no time cannot be placed on the session
   * timeline (the windowed formulation would sort it first and fold it into
   * the earliest session via null-comparison artifacts, which is an
   * accident of `lag`, not a semantics). Pinned by SessionizeSpec.
   */
  def sessionizeBatch(df: DataFrame, userCol: String, tsUsCol: String,
      tieBreakCol: String, gapUs: Long): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val sorted = df
      .where(col(tsUsCol).isNotNull)
      .select(
        col(userCol).isNull.as("un"),
        coalesce(col(userCol).cast("long"), lit(0L)).as("u"),
        col(tsUsCol).cast("long").as("t"),
        coalesce(col(tieBreakCol).cast("long"), lit(Long.MaxValue)).as("e"))
      .repartition(col("un"), col("u"))
      .sortWithinPartitions(col("un"), col("u"), col("t"), col("e"))
      .as[(Boolean, Long, Long, Long)]
    val sessions = sorted.mapPartitions { it =>
      new Iterator[(Option[Long], Long, Long, Long, Long)] {
        private var open = false
        private var un = false
        private var u = 0L
        private var sq = 0L
        private var start = 0L
        private var end = 0L
        private var n = 0L
        private var pending: (Option[Long], Long, Long, Long, Long) = null

        private def close(): (Option[Long], Long, Long, Long, Long) = {
          open = false
          (if (un) None else Some(u), sq, start, end, n)
        }
        private def advance(): Unit = {
          while (pending == null && it.hasNext) {
            val (nun, nu, t, _) = it.next()
            if (!open) {
              un = nun; u = nu; sq = 1L; start = t; end = t; n = 1L; open = true
            } else if (nun != un || nu != u) {
              pending = close()
              un = nun; u = nu; sq = 1L; start = t; end = t; n = 1L; open = true
            } else if (t - end > gapUs) {
              pending = close()
              sq += 1; start = t; end = t; n = 1L; open = true
            } else {
              end = t; n += 1L
            }
          }
          if (pending == null && open) pending = close()
        }
        override def hasNext: Boolean = { advance(); pending != null }
        override def next(): (Option[Long], Long, Long, Long, Long) = {
          advance()
          val out = pending; pending = null; out
        }
      }
    }
    sessions.toDF(userCol, "session_seq", "session_start", "session_end",
      "n_events")
  }
}
