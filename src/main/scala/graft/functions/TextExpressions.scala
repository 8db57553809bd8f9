package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, CodegenFallback}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Compiled text-hashing kernels. The pure-`functions._` formulations of
 * these (aggregate ∘ transform ∘ split) are semantically identical but run
 * interpreted — Spark's higher-order array functions are CodegenFallback,
 * and per-element Expression.eval dispatch made shingle hashing the
 * dominant cost of the dedup pipeline (~10s at sf0.1). These expressions
 * compute the same modular integer hashes (same constants as
 * graft.text.TextOps / TextSql, so DuckDB oracle parity is unchanged) in
 * one compiled pass per row.
 */
object TextHash {
  val Mod = 1000000007L
  val Base = 31L

  /** Char-level polynomial rolling hash over codepoints: h ← (h·B + cp) % P.
   *  Matches aggregate(transform(split(s,''), ascii), ...) and DuckDB
   *  list_reduce over unicode(ch). */
  def rollingHash(s: UTF8String): Long = rollingHashString(s.toString)

  def rollingHashString(str: String): Long = {
    var h = 0L
    var i = 0
    val n = str.length
    while (i < n) {
      val cp = str.codePointAt(i)
      h = (h * Base + cp) % Mod
      i += Character.charCount(cp)
    }
    h
  }

  /** Continue a rolling hash across a string (for shingle windows). */
  @inline private def extend(h0: Long, str: String): Long = {
    var h = h0
    var i = 0
    val n = str.length
    while (i < n) {
      val cp = str.codePointAt(i)
      h = (h * Base + cp) % Mod
      i += Character.charCount(cp)
    }
    h
  }

  /** Distinct rolling hashes of the k-token shingle strings (space-joined),
   *  value-equal (as a set) to hash(array_join(slice(toks,i,k),' ')) +
   *  distinct, returned SORTED ascending — the sorted contract lets the
   *  Jaccard verify stage count intersections with a linear merge instead of
   *  a hash build per pair ([[SortedIntersectCount]]). */
  def shingleHashes(toks: Array[String], k: Int): Array[Long] = {
    val n = toks.length
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    if (n < k) {
      // single shingle = all tokens joined (empty token list hashes "")
      var h = 0L
      var i = 0
      while (i < n) {
        if (i > 0) h = (h * Base + ' '.toInt) % Mod
        h = extend(h, toks(i))
        i += 1
      }
      seen.add(h)
    } else {
      var start = 0
      while (start + k <= n) {
        var h = 0L
        var j = start
        while (j < start + k) {
          if (j > start) h = (h * Base + ' '.toInt) % Mod
          h = extend(h, toks(j))
          j += 1
        }
        seen.add(h)
        start += 1
      }
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    java.util.Arrays.sort(out)
    out
  }

  /** |a ∩ b| for two sorted long arrays (ascending, distinct) — one linear
   *  merge, zero allocation. */
  def sortedIntersectCount(a: ArrayData, b: ArrayData): Long = {
    val na = a.numElements(); val nb = b.numElements()
    var i = 0; var j = 0; var n = 0L
    while (i < na && j < nb) {
      val x = a.getLong(i); val y = b.getLong(j)
      if (x == y) { n += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    n
  }
}

/** `rolling_hash(str)` — codegen'd document fingerprint. */
case class RollingHash(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a STRING argument, got ${other.catalogString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "rolling_hash"

  override protected def nullSafeEval(s: Any): Any =
    TextHash.rollingHash(s.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.TextHash.rollingHash($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(newChild)
}

/**
 * `simhash(tokens, bits)` — SimHash over token rolling-hashes in one
 * compiled pass: per bit b, sum ±1 across tokens (with multiplicity) by bit
 * b of the token's hash; bit set iff sum > 0. Value-identical to the
 * per-bit aggregate formulation (TextOps.simhash's former shape), which
 * recomputed the token-hash array once per bit when inlined.
 */
case class SimHash(child: Expression, bits: Int)
    extends UnaryExpression with CodegenFallback {
  require(bits > 0 && bits < 63)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<STRING>, got ${other.catalogString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash"

  override protected def nullSafeEval(arr: Any): Any = {
    val a = arr.asInstanceOf[ArrayData]
    val n = a.numElements()
    val sums = new Array[Long](bits)
    var i = 0
    while (i < n) {
      val tok = if (a.isNullAt(i)) "" else a.getUTF8String(i).toString
      val h = TextHash.rollingHashString(tok)
      var b = 0
      while (b < bits) {
        sums(b) += (if (((h >> b) & 1L) == 1L) 1L else -1L)
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < bits) {
      if (sums(b) > 0) out |= 1L << b
      b += 1
    }
    out
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/**
 * `shingle_hashes(tokens, k)` — distinct rolling hashes of k-token shingles
 * in one compiled pass (the eval body is compiled Scala; the expression
 * itself is CodegenFallback, which costs one virtual call per row instead
 * of per character).
 */
case class ShingleHashes(child: Expression, k: Int)
    extends UnaryExpression with CodegenFallback {
  require(k > 0, "shingle size must be positive")
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<STRING>, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = s"shingle_hashes"

  override protected def nullSafeEval(arr: Any): Any = {
    val a = arr.asInstanceOf[ArrayData]
    val n = a.numElements()
    val toks = new Array[String](n)
    var i = 0
    while (i < n) {
      toks(i) = if (a.isNullAt(i)) "" else a.getUTF8String(i).toString
      i += 1
    }
    new GenericArrayData(TextHash.shingleHashes(toks, k))
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/**
 * `sorted_intersect_count(a, b)` — |a ∩ b| for two SORTED-ascending distinct
 * LONG arrays via a linear merge, fully codegen'd. The Jaccard verify stage
 * calls this once per candidate pair; the generic `array_intersect` built a
 * hash set and an output array per pair, which dominated
 * dedup_minhash_keep/neardup_jaccard. Callers must uphold the sorted
 * contract ([[TextHash.shingleHashes]] emits sorted arrays).
 */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two ARRAY<BIGINT> arguments, got ${l.catalogString}, ${r.catalogString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "sorted_intersect_count"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    TextHash.sortedIntersectCount(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.expressions.TextHash.sortedIntersectCount($a, $b)")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(newLeft, newRight)
}

/**
 * All random-hyperplane LSH bucket keys of a float vector in ONE pass —
 * replaces nTables×bitsPerTable separate `array_inner_product(vec,
 * literal-plane) > 0` expressions (a multi-thousand-node tree whose codegen
 * compile dominated the query). Output: one LONG per table,
 * `(table << 48) | bucket` (bucket < 2^bitsPerTable ≤ 2^30), usable
 * directly as an equality join key.
 *
 * Hyperplane components derive deterministically from (seed, table, bit,
 * dim-index) via SplitMix64 → uniform in [-1, 1); planes materialize once
 * per expression instance per JVM (transient lazy).
 */
case class LshBuckets(child: Expression, dim: Int, nTables: Int,
    bitsPerTable: Int, seed: Long)
    extends UnaryExpression with CodegenFallback {
  require(dim > 0 && nTables > 0 && bitsPerTable > 0 && bitsPerTable <= 30)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<FLOAT|DOUBLE>, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "lsh_buckets"

  private def isFloat = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  // planes(t*bitsPerTable + b)(d): built once per instance per JVM
  @transient private lazy val planes: Array[Array[Float]] = {
    Array.tabulate(nTables * bitsPerTable) { pb =>
      val p = new Array[Float](dim)
      var d = 0
      while (d < dim) {
        var z = seed + (pb.toLong * dim + d) * 0x9E3779B97F4A7C15L + 0x9E3779B97F4A7C15L
        z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
        z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
        z = z ^ (z >>> 31)
        // top 24 bits → uniform [0,1) → [-1,1)
        p(d) = ((z >>> 40).toFloat / (1L << 24).toFloat) * 2f - 1f
        d += 1
      }
      p
    }
  }

  override protected def nullSafeEval(arr: Any): Any = {
    val a = arr.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), dim)
    val v = new Array[Float](dim)
    val f = isFloat
    var i = 0
    while (i < n) {
      v(i) = if (a.isNullAt(i)) 0f else if (f) a.getFloat(i) else a.getDouble(i).toFloat
      i += 1
    }
    val out = new Array[Long](nTables)
    var t = 0
    while (t < nTables) {
      var bucket = 0L
      var b = 0
      while (b < bitsPerTable) {
        if (graft.core.Simd.dot(planes(t * bitsPerTable + b), 0, v, 0, dim) > 0f)
          bucket |= 1L << b
        b += 1
      }
      out(t) = (t.toLong << 48) | bucket
      t += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
