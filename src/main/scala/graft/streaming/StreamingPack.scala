package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types.LongType

import graft.text.TextOps

/**
 * Streaming sequence packing — the continuous counterpart of the batch
 * `TextOps.packSequences` operator: as documents arrive, each group
 * (language/source) keeps ONE open sequence as engine-managed state
 * `(seq_id, running_tokens)` and every document is assigned its sequence
 * id and token offset on arrival; a document that would overflow the
 * budget starts the next sequence.
 *
 * Continuity contract: within a micro-batch a group's arrivals are packed
 * in id order; across batches, packing continues from the open-sequence
 * state, so the assignment equals the batch operator's when the stream is
 * fed in id order (the same caveat as [[StreamingDedup]]'s min-id keep
 * rule — StreamingPackSpec pins the parity). State per group is 16 bytes,
 * partitioned by the groupByKey shuffle: scales with group count, not
 * history.
 */
object StreamingPack {

  /** Row and state shapes — public for Catalyst codegen. */
  final case class InRow(g: String, id: Long, n: Long)
  final case class St(seq: Long, running: Long)

  /**
   * Pack `stream` into token-budget sequences per `groupCol`. Emits one
   * row per document: `(group, id, n_tokens, seq_id, seq_offset)`.
   * Append output mode; attach any sink.
   */
  def pack(stream: DataFrame, textCol: String, idCol: String,
      groupCol: String, budget: Long): DataFrame = {
    require(budget > 0, "token budget must be positive")
    val spark = stream.sparkSession
    import spark.implicits._
    // NULL text packs as a zero-token document; rows without an id are
    // dropped (cannot be assigned a sequence) — same contract as the batch
    // packSequences
    val typed = stream
      .where(col(idCol).isNotNull)
      .select(
        col(groupCol).cast("string").as("g"),
        col(idCol).cast(LongType).as("id"),
        coalesce(size(TextOps.tokens(col(textCol))).cast(LongType), lit(0L))
          .as("n"))
      .as[InRow]
    typed.groupByKey(_.g)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.NoTimeout()) {
        (g: String, rows: Iterator[InRow], state: GroupState[St]) =>
          // within-batch iterator order is shuffle-dependent → pack the
          // batch's arrivals in id order (deterministic, matches the batch
          // operator when ids arrive monotonically)
          val batch = rows.toArray.sortBy(_.id)
          var seq = state.getOption.map(_.seq).getOrElse(-1L)
          var running = state.getOption.map(_.running).getOrElse(0L)
          val out = new Array[(String, Long, Long, Long, Long)](batch.length)
          var i = 0
          while (i < batch.length) {
            val r = batch(i)
            if (seq < 0L) {
              seq = 0L; running = r.n
              out(i) = (g, r.id, r.n, 0L, 0L)
            } else if (running + r.n > budget) {
              seq += 1L; running = r.n
              out(i) = (g, r.id, r.n, seq, 0L)
            } else {
              out(i) = (g, r.id, r.n, seq, running)
              running += r.n
            }
            i += 1
          }
          state.update(St(seq, running))
          out.iterator
      }(Encoders.product[St],
        Encoders.product[(String, Long, Long, Long, Long)])
      .toDF(groupCol, idCol, "n_tokens", "seq_id", "seq_offset")
  }
}
