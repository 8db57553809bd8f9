package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, BinaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/**
 * Native Catalyst expressions for vector distances over `ARRAY<FLOAT>` /
 * `ARRAY<DOUBLE>` columns, with whole-stage codegen.
 *
 * Semantics mirror the scalar functions the reference engine piggybacks on
 * (DuckDB built-ins; see reference src/ann_optimizer.cpp:385-391 for the
 * accepted function set and src/ann_search.cpp:702-720 for the CPU kernels):
 *
 *  - `array_distance`           : sqrt(Σ (aᵢ-bᵢ)²)        (lower = closer)
 *  - `array_distance_sq`        : Σ (aᵢ-bᵢ)²              (the index-internal
 *                                 metric; reference rust_lib/src/distance.rs:15-19)
 *  - `array_inner_product`      : Σ aᵢ·bᵢ                 (higher = closer)
 *  - `array_negative_inner_product`: -Σ aᵢ·bᵢ             (lower = closer)
 *  - `array_cosine_similarity`  : dot/(|a||b|)            (higher = closer)
 *  - `array_cosine_distance`    : 1 - cosine_similarity   (lower = closer)
 *
 * All accumulate in double precision regardless of input element type, so
 * results are bit-comparable with a DOUBLE[]-cast DuckDB oracle. Element
 * access stays unboxed (`getFloat`/`getDouble` on `ArrayData`) and the
 * generated code is a tight scalar loop inside whole-stage codegen.
 *
 * Mismatched lengths raise (DuckDB `list_distance` does the same); any null
 * input or null element yields null.
 */
abstract class VectorBinaryExpression extends BinaryExpression {
  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(lt, _), ArrayType(rt, _))
        if (lt == FloatType || lt == DoubleType) && (rt == FloatType || rt == DoubleType) =>
      TypeCheckResult.TypeCheckSuccess
    case _ =>
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two ARRAY<FLOAT>/ARRAY<DOUBLE> arguments, " +
        s"got ${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }

  @inline protected final def elemIsFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType
  @inline protected final def containsNull(e: Expression): Boolean =
    e.dataType match {
      case ArrayType(_, cn) => cn
      case _ => true // unresolved: be conservative
    }

  /** Nullable when an input can be null OR an element can be null (a null
    * element makes the whole result null — see nullSafeEval). Without this
    * override, two non-nullable inputs would make `ev.isNull` the literal
    * `false` in codegen, and emitting `false = true;` breaks janino. */
  override def nullable: Boolean =
    left.nullable || right.nullable || containsNull(left) || containsNull(right)

  @inline protected final def get(a: ArrayData, i: Int, isFloat: Boolean): Double =
    if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)

  protected def checkLengths(n1: Int, n2: Int): Unit =
    if (n1 != n2) throw new IllegalArgumentException(
      s"$prettyName: array lengths differ ($n1 vs $n2)")

  /** True when any element of either input is null (→ expression is null). */
  protected final def hasNullElement(a: ArrayData, b: ArrayData, n: Int): Boolean = {
    if (containsNull(left) || containsNull(right)) {
      var i = 0
      while (i < n) {
        if (a.isNullAt(i) || b.isNullAt(i)) return true
        i += 1
      }
    }
    false
  }

  // ---- interpreted path ----

  /** Fold step returning the accumulated sums; impls override combine/finish. */
  protected def evalVectors(a: ArrayData, b: ArrayData, n: Int): Double

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    checkLengths(a.numElements(), b.numElements())
    val n = a.numElements()
    if (hasNullElement(a, b, n)) null else evalVectors(a, b, n)
  }

  // ---- codegen ----

  /** Loop body contributions: (accumulator decls, per-element statement, result expr). */
  protected def genLoop(av: String, bv: String): (String, String, String)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lf = elemIsFloat(left); val rf = elemIsFloat(right)
    // all locals fresh-named: sort/join codegen may inline this expression
    // several times into one generated method
    val a = ctx.freshName("arrA"); val b = ctx.freshName("arrB")
    val n = ctx.freshName("n"); val i = ctx.freshName("i")
    val anyNull = ctx.freshName("anyNull")
    val av = ctx.freshName("av"); val bv = ctx.freshName("bv")
    val getA = if (lf) s"(double) $a.getFloat($i)" else s"$a.getDouble($i)"
    val getB = if (rf) s"(double) $b.getFloat($i)" else s"$b.getDouble($i)"
    val nullElemCheck =
      if (containsNull(left) || containsNull(right))
        s"if ($a.isNullAt($i) || $b.isNullAt($i)) { $anyNull = true; break; }"
      else ""
    nullSafeCodeGen(ctx, ev, (leftCode, rightCode) => {
      val (decls, step, result) = genLoop(av, bv)
      // only reference ev.isNull when the expression is nullable — otherwise
      // nullSafeCodeGen makes it the literal `false` and assignment is invalid
      val assignOut =
        if (containsNull(left) || containsNull(right))
          s"""if ($anyNull) {
                ${ev.isNull} = true;
              } else {
                ${ev.value} = $result;
              }"""
        else s"${ev.value} = $result;"
      // the outer `{ }` block scopes the fixed-name accumulators from genLoop
      // (s/ab/aa/bb), so repeated inlining into one method can't collide
      s"""
      {
        org.apache.spark.sql.catalyst.util.ArrayData $a = $leftCode;
        org.apache.spark.sql.catalyst.util.ArrayData $b = $rightCode;
        int $n = $a.numElements();
        if ($n != $b.numElements()) {
          throw new IllegalArgumentException(
            "$prettyName: array lengths differ (" + $n + " vs " + $b.numElements() + ")");
        }
        boolean $anyNull = false;
        $decls
        for (int $i = 0; $i < $n; $i++) {
          $nullElemCheck
          double $av = $getA;
          double $bv = $getB;
          $step
        }
        $assignOut
      }
      """
    })
  }
}

case class ArrayDistance(left: Expression, right: Expression) extends VectorBinaryExpression {
  override def prettyName: String = "array_distance"
  protected def evalVectors(a: ArrayData, b: ArrayData, n: Int): Double = {
    val lf = elemIsFloat(left); val rf = elemIsFloat(right)
    var s = 0.0; var i = 0
    while (i < n) { val d = get(a, i, lf) - get(b, i, rf); s += d * d; i += 1 }
    math.sqrt(s)
  }
  protected def genLoop(av: String, bv: String): (String, String, String) =
    ("double s = 0.0;", s"double d = $av - $bv; s += d * d;", "Math.sqrt(s)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression) = copy(l, r)
}

case class ArrayDistanceSq(left: Expression, right: Expression) extends VectorBinaryExpression {
  override def prettyName: String = "array_distance_sq"
  protected def evalVectors(a: ArrayData, b: ArrayData, n: Int): Double = {
    val lf = elemIsFloat(left); val rf = elemIsFloat(right)
    var s = 0.0; var i = 0
    while (i < n) { val d = get(a, i, lf) - get(b, i, rf); s += d * d; i += 1 }
    s
  }
  protected def genLoop(av: String, bv: String): (String, String, String) =
    ("double s = 0.0;", s"double d = $av - $bv; s += d * d;", "s")
  override protected def withNewChildrenInternal(l: Expression, r: Expression) = copy(l, r)
}

case class ArrayInnerProduct(left: Expression, right: Expression) extends VectorBinaryExpression {
  override def prettyName: String = "array_inner_product"
  protected def evalVectors(a: ArrayData, b: ArrayData, n: Int): Double = {
    val lf = elemIsFloat(left); val rf = elemIsFloat(right)
    var s = 0.0; var i = 0
    while (i < n) { s += get(a, i, lf) * get(b, i, rf); i += 1 }
    s
  }
  protected def genLoop(av: String, bv: String): (String, String, String) =
    ("double s = 0.0;", s"s += $av * $bv;", "s")
  override protected def withNewChildrenInternal(l: Expression, r: Expression) = copy(l, r)
}

case class ArrayNegativeInnerProduct(left: Expression, right: Expression)
    extends VectorBinaryExpression {
  override def prettyName: String = "array_negative_inner_product"
  protected def evalVectors(a: ArrayData, b: ArrayData, n: Int): Double = {
    val lf = elemIsFloat(left); val rf = elemIsFloat(right)
    var s = 0.0; var i = 0
    while (i < n) { s += get(a, i, lf) * get(b, i, rf); i += 1 }
    -s
  }
  protected def genLoop(av: String, bv: String): (String, String, String) =
    ("double s = 0.0;", s"s += $av * $bv;", "-s")
  override protected def withNewChildrenInternal(l: Expression, r: Expression) = copy(l, r)
}

case class ArrayCosineSimilarity(left: Expression, right: Expression)
    extends VectorBinaryExpression {
  override def prettyName: String = "array_cosine_similarity"
  protected def evalVectors(a: ArrayData, b: ArrayData, n: Int): Double = {
    val lf = elemIsFloat(left); val rf = elemIsFloat(right)
    var ab = 0.0; var aa = 0.0; var bb = 0.0; var i = 0
    while (i < n) {
      val x = get(a, i, lf); val y = get(b, i, rf)
      ab += x * y; aa += x * x; bb += y * y; i += 1
    }
    val den = math.sqrt(aa) * math.sqrt(bb)
    if (den == 0.0) 0.0 else ab / den
  }
  protected def genLoop(av: String, bv: String): (String, String, String) =
    ("double ab = 0.0; double aa = 0.0; double bb = 0.0;",
     s"ab += $av * $bv; aa += $av * $av; bb += $bv * $bv;",
     "(Math.sqrt(aa) * Math.sqrt(bb)) == 0.0 ? 0.0 : ab / (Math.sqrt(aa) * Math.sqrt(bb))")
  override protected def withNewChildrenInternal(l: Expression, r: Expression) = copy(l, r)
}

case class ArrayCosineDistance(left: Expression, right: Expression)
    extends VectorBinaryExpression {
  override def prettyName: String = "array_cosine_distance"
  protected def evalVectors(a: ArrayData, b: ArrayData, n: Int): Double = {
    val lf = elemIsFloat(left); val rf = elemIsFloat(right)
    var ab = 0.0; var aa = 0.0; var bb = 0.0; var i = 0
    while (i < n) {
      val x = get(a, i, lf); val y = get(b, i, rf)
      ab += x * y; aa += x * x; bb += y * y; i += 1
    }
    val den = math.sqrt(aa) * math.sqrt(bb)
    1.0 - (if (den == 0.0) 0.0 else ab / den)
  }
  protected def genLoop(av: String, bv: String): (String, String, String) =
    ("double ab = 0.0; double aa = 0.0; double bb = 0.0;",
     s"ab += $av * $bv; aa += $av * $av; bb += $bv * $bv;",
     "1.0 - ((Math.sqrt(aa) * Math.sqrt(bb)) == 0.0 ? 0.0 : ab / (Math.sqrt(aa) * Math.sqrt(bb)))")
  override protected def withNewChildrenInternal(l: Expression, r: Expression) = copy(l, r)
}
