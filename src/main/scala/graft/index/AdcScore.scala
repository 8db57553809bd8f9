package graft.index

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, FloatType, IntegerType, LongType}

/**
 * Per-plan executor state for codegen'd ADC scoring: the PQ codebook,
 * centroids (IVF only), and the driver-frozen (qid → ADC query) map, all as
 * broadcasts, plus the [[Ann.AdcLutCache]] plan token. `score` is the body
 * the generated code calls per joined row — LUTs come from the executor
 * cache keyed (qid, probe), so per-row work is m byte-lookups.
 */
final class AdcScoreState(
    val cbB: Broadcast[PqCodec.Codebook],
    val centsB: Broadcast[Array[Array[Float]]], // null for plain pq
    val qArrB: Broadcast[Array[Array[Float]]], // indexed by driver-frozen qid
    val l2: Boolean,
    val token: Long,
    // scalar code width for packed ivfsq rows (4/6); 8 = byte-per-entry
    // codes (pq/ivfpq/ivfsq-u8), the PqCodec.adc fast path
    val bits: Int = 8) extends Serializable {

  @transient private lazy val cb: PqCodec.Codebook = cbB.value
  @transient private lazy val cbK: Int = cb.k
  // resolved ONCE per executor per plan: the per-row path must not touch
  // the cache registry's global lock (32 threads × ~100M rows serialized
  // on it measured slower than the ivfflat distance join it replaces)
  @transient private lazy val sub: Ann.AdcLutCache.Sub =
    Ann.AdcLutCache.subFor(token)

  def score(qid: Long, probe: Int, code: Array[Byte]): Float = {
    val q = qArrB.value(qid.toInt)
    val e = Ann.AdcLutCache.getIn(sub, qid, probe, q) {
      if (centsB == null || probe < 0) (PqCodec.lut(cb, q, l2), 0.0f)
      else {
        val c = centsB.value(probe)
        if (l2) {
          val qr = new Array[Float](q.length)
          var i = 0
          while (i < q.length) { qr(i) = q(i) - c(i); i += 1 }
          (PqCodec.lut(cb, qr, l2 = true), 0.0f)
        } else (PqCodec.lut(cb, q, l2 = false),
          -graft.core.VectorOps.dot(q, c))
      }
    }
    (if (bits == 8) PqCodec.adc(e.lut, cbK, code)
     else graft.core.SqPackedCodec.adc(e.lut, bits, cb.m, code)) + e.off
  }
}

/**
 * `pq_adc_score(qid, probe, code)` — the TABLE-path quantized ranking score
 * as a NATIVE expression: the Scala-UDF formulation converted three
 * arguments per joined row and, worse, broke whole-stage codegen for the
 * entire ~100M-row probe-join stage (measured 30 s vs ivfflat's 5.6 s
 * codegen join of the same shape at 1.5M × 512q). This keeps the stage in
 * one codegen span; the generated code calls [[AdcScoreState.score]]
 * directly with primitive args (`byte[]` codes need no conversion).
 */
case class PqAdcScore(qid: Expression, probe: Expression, code: Expression,
    state: AdcScoreState) extends TernaryExpression {

  override def first: Expression = qid
  override def second: Expression = probe
  override def third: Expression = code

  override def checkInputDataTypes(): TypeCheckResult =
    (qid.dataType, probe.dataType, code.dataType) match {
      case (LongType, IntegerType, BinaryType) => TypeCheckResult.TypeCheckSuccess
      case (a, b, c) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (BIGINT, INT, BINARY), got " +
          s"${a.catalogString}, ${b.catalogString}, ${c.catalogString}")
    }

  override def dataType: DataType = FloatType
  override def prettyName: String = "pq_adc_score"

  override protected def nullSafeEval(q: Any, p: Any, c: Any): Any =
    state.score(q.asInstanceOf[Long], p.asInstanceOf[Int],
      c.asInstanceOf[Array[Byte]])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val st = ctx.addReferenceObj("adcScoreState", state,
      classOf[AdcScoreState].getName)
    defineCodeGen(ctx, ev, (q, p, c) => s"$st.score($q, $p, $c)")
  }

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): Expression =
    copy(qid = newFirst, probe = newSecond, code = newThird)
}

/**
 * Per-plan executor state for codegen'd quantized RANGE distances: the full
 * reconstruction's DOUBLE-fold metric distance (range compares the double
 * fold of the decoded vector against the radius — the float ADC LUT cannot
 * provide that, so range scoring gets its own kernel instead of
 * [[AdcScoreState]]). `centsB` is null except for ivfpq (residual codes);
 * `bits` < 8 marks packed ivfsq rows.
 */
final class QuantRangeState(
    val cbB: Broadcast[PqCodec.Codebook],
    val centsB: Broadcast[Array[Array[Float]]], // ivfpq only, else null
    val l2: Boolean,
    val bits: Int = 8) extends Serializable {

  @transient private lazy val cb: PqCodec.Codebook = cbB.value

  def dist(code: Array[Byte], cluster: Int,
      q: org.apache.spark.sql.catalyst.util.ArrayData): Double = {
    val vhat =
      if (bits < 8) Ann.sqDecode(cb, bits, code)
      else {
        val r = PqCodec.decode(cb, code)
        if (centsB != null && cluster >= 0) {
          val c = centsB.value(cluster)
          var i = 0
          while (i < r.length) { r(i) += c(i); i += 1 }
        }
        r
      }
    Ann.doubleFoldDist(vhat, q.toFloatArray(), l2)
  }
}

/**
 * `quant_range_dist(code, cluster, query)` — the quantized range filter's
 * per-row distance as a NATIVE expression: decode (+ centroid for ivfpq),
 * then the sequential double fold against the query column. The Scala-UDF
 * formulation broke whole-stage codegen for the probe-pruned scan stage —
 * this keeps the scan → score → radius-filter span in one generated loop
 * (the PqAdcScore lesson applied to range search). `cluster` is -1 for
 * engines whose codes reconstruct without a centroid (pq, ivfsq).
 */
case class QuantRangeDist(code: Expression, cluster: Expression,
    query: Expression, state: QuantRangeState) extends TernaryExpression {

  override def first: Expression = code
  override def second: Expression = cluster
  override def third: Expression = query

  override def checkInputDataTypes(): TypeCheckResult =
    (code.dataType, cluster.dataType, query.dataType) match {
      case (BinaryType, IntegerType,
          org.apache.spark.sql.types.ArrayType(FloatType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (a, b, c) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (BINARY, INT, ARRAY<FLOAT>), got " +
          s"${a.catalogString}, ${b.catalogString}, ${c.catalogString}")
    }

  override def dataType: DataType = org.apache.spark.sql.types.DoubleType
  override def prettyName: String = "quant_range_dist"

  override protected def nullSafeEval(c: Any, cl: Any, q: Any): Any =
    state.dist(c.asInstanceOf[Array[Byte]], cl.asInstanceOf[Int],
      q.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val st = ctx.addReferenceObj("quantRangeState", state,
      classOf[QuantRangeState].getName)
    defineCodeGen(ctx, ev, (c, cl, q) => s"$st.dist($c, $cl, $q)")
  }

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): Expression =
    copy(code = newFirst, cluster = newSecond, query = newThird)
}
