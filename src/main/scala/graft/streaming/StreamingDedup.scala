package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types.LongType

import graft.text.TextOps

/**
 * Streaming exact deduplication over a document stream — the continuous
 * counterpart of the batch `dedup_exact` operator (a training-data ingest
 * pipeline dedups against everything it has EVER ingested, not just the
 * current batch, so the seen-set must be engine-managed state).
 *
 * Shape: fingerprint the text (same rolling hash as `TextOps.fingerprint`,
 * so batch and stream agree on what is a duplicate), group by fingerprint,
 * and keep per-group state via `flatMapGroupsWithState`:
 *
 *  - first arrival of a fingerprint → row passes through (with `keep_id`);
 *  - later arrivals → dropped, a per-group duplicate counter accumulates.
 *
 * State per group is (first id, dup count) — 16 bytes — partitioned by
 * fingerprint across the cluster by the groupByKey shuffle, so the seen-set
 * scales horizontally; an optional `stateTtl` expires fingerprints not seen
 * for the given duration (bounds state for unbounded streams, at the cost of
 * re-admitting duplicates that recur after the TTL).
 */
object StreamingDedup {

  /** (fingerprint, first id seen, duplicates dropped so far). */
  final case class GroupStats(fp: Long, keepId: Long, dups: Long)

  /** Internal row and state shapes — public because Catalyst codegen
   *  instantiates them from generated Java. */
  final case class InRow(fp: Long, id: Long, text: String)
  final case class St(keepId: Long, dups: Long)

  /**
   * Deduplicate `stream` on exact text content. Returns the pass-through
   * rows `(doc_id, text, fp)` — first occurrence of each fingerprint only.
   * Append output mode; use with any sink.
   */
  def dedup(stream: DataFrame, textCol: String, idCol: String,
      stateTtl: Option[String] = None): DataFrame = {
    val spark = stream.sparkSession
    import spark.implicits._
    val timeout =
      if (stateTtl.isDefined) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    val ttl = stateTtl
    val typed = stream.select(
        TextOps.rollingHash(col(textCol)).as("fp"),
        col(idCol).cast(LongType).as("id"),
        col(textCol).cast("string").as("text"))
      .as[InRow]
    typed.groupByKey(_.fp)
      .flatMapGroupsWithState(OutputMode.Append(), timeout) {
        (fp: Long, rows: Iterator[InRow], state: GroupState[St]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            // a group's within-batch iterator order is shuffle-dependent, so
            // "first" is defined as MIN id among the batch's arrivals —
            // deterministic, and it matches batch dedup_exact's min(doc_id)
            // keep rule when streams are fed in id order
            val batch = rows.toArray
            // state PRESENCE (not a keepId sentinel — ids may be negative)
            // distinguishes an established group from a new one
            val (keep, st) = state.getOption match {
              case Some(st0) => (None, st0.copy(dups = st0.dups + batch.length))
              case None =>
                val k = batch.minBy(_.id)
                (Some(k), St(k.id, (batch.length - 1).toLong))
            }
            state.update(st)
            ttl.foreach(state.setTimeoutDuration)
            keep.iterator
          }
      }(Encoders.product[St], Encoders.product[InRow])
      .toDF("fp", "doc_id", "text")
      .select("doc_id", "text", "fp")
  }

  /**
   * Running duplicate statistics per fingerprint (update mode): emits
   * `(fp, keep_id, dups)` whenever a group changes — the monitoring view of
   * the same state machine ([[dedup]] is the data path).
   */
  def dupStats(stream: DataFrame, textCol: String, idCol: String): DataFrame = {
    val spark = stream.sparkSession
    import spark.implicits._
    val typed = stream.select(
        TextOps.rollingHash(col(textCol)).as("fp"),
        col(idCol).cast(LongType).as("id"),
        col(textCol).cast("string").as("text"))
      .as[InRow]
    typed.groupByKey(_.fp)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout()) {
        (fp: Long, rows: Iterator[InRow], state: GroupState[St]) =>
          val batch = rows.toArray
          val st = state.getOption match {
            case Some(st0) => st0.copy(dups = st0.dups + batch.length)
            case None => St(batch.minBy(_.id).id, (batch.length - 1).toLong)
          }
          state.update(st)
          GroupStats(fp, st.keepId, st.dups)
      }(Encoders.product[St], Encoders.product[GroupStats])
      .toDF("fp", "keep_id", "dups")
  }
}
