package graft

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.graftshim.GraftShim
import org.apache.spark.sql.types.{ArrayType, FloatType}
import org.apache.spark.sql.{functions => F}
import graft.expressions._

/**
 * Column-level surface of the engine's scalar vector functions, mirroring the
 * function family the reference engine piggybacks on (DuckDB's `array_*` /
 * `list_*` built-ins; accepted set per reference src/ann_optimizer.cpp:385-391).
 * `list_*` aliases are registered for SQL alongside `array_*`.
 */
object functions {

  private[graft] def mkExpr(c: Column): Expression = GraftShim.expression(c)
  private[graft] def mkCol(e: Expression): Column = GraftShim.column(e)

  /** Cast any numeric-array column to ARRAY<FLOAT> (the engine's domain type;
   *  reference coerces LIST of any numeric to f32, src/ann_search.cpp:471-493). */
  def toFloatVec(c: Column): Column = c.cast(ArrayType(FloatType))

  /** A literal query vector as ARRAY<FLOAT>. */
  def floatVec(values: Seq[Float]): Column =
    F.array(values.map(v => F.lit(v)): _*).cast(ArrayType(FloatType))

  def array_distance(a: Column, b: Column): Column = mkCol(ArrayDistance(mkExpr(a), mkExpr(b)))
  def array_distance_sq(a: Column, b: Column): Column = mkCol(ArrayDistanceSq(mkExpr(a), mkExpr(b)))
  def array_inner_product(a: Column, b: Column): Column = mkCol(ArrayInnerProduct(mkExpr(a), mkExpr(b)))

  /** All random-hyperplane LSH bucket keys of a vector in one pass:
   *  ARRAY<LONG>, one `(table << 48) | bucket` per table. */
  def lsh_buckets(vec: Column, dim: Int, nTables: Int, bitsPerTable: Int,
      seed: Long): Column =
    mkCol(LshBuckets(mkExpr(vec), dim, nTables, bitsPerTable, seed))

  /** Distinct-LONG collection with per-group state capped at `cap` elements;
   *  saturated groups eval to an EMPTY array (see
   *  [[graft.expressions.BoundedCollectSet]]). */
  def bounded_collect_set(c: Column, cap: Int): Column =
    mkCol(BoundedCollectSet(mkExpr(c), cap).toAggregateExpression())
  def array_negative_inner_product(a: Column, b: Column): Column =
    mkCol(ArrayNegativeInnerProduct(mkExpr(a), mkExpr(b)))
  def array_cosine_similarity(a: Column, b: Column): Column =
    mkCol(ArrayCosineSimilarity(mkExpr(a), mkExpr(b)))
  def array_cosine_distance(a: Column, b: Column): Column =
    mkCol(ArrayCosineDistance(mkExpr(a), mkExpr(b)))

  /** Register SQL names (array_* + list_* aliases) in the session. */
  def registerAll(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    def reg2(name: String, builder: Seq[Expression] => Expression): Unit =
      reg.createOrReplaceTempFunction(name, exprs => {
        require(exprs.length == 2, s"$name expects 2 arguments")
        builder(exprs)
      }, "built-in")
    val fns: Seq[(String, Seq[Expression] => Expression)] = Seq(
      "array_distance" -> (e => ArrayDistance(e(0), e(1))),
      "array_distance_sq" -> (e => ArrayDistanceSq(e(0), e(1))),
      "array_inner_product" -> (e => ArrayInnerProduct(e(0), e(1))),
      "array_negative_inner_product" -> (e => ArrayNegativeInnerProduct(e(0), e(1))),
      "array_cosine_similarity" -> (e => ArrayCosineSimilarity(e(0), e(1))),
      "array_cosine_distance" -> (e => ArrayCosineDistance(e(0), e(1))))
    for ((n, b) <- fns) {
      reg2(n, b)
      reg2(n.replace("array_", "list_"), b)
    }
    // text-hashing kernels (dedup/fingerprint surface)
    reg.createOrReplaceTempFunction("rolling_hash", exprs => {
      require(exprs.length == 1, "rolling_hash expects 1 argument")
      RollingHash(exprs.head)
    }, "built-in")
    reg.createOrReplaceTempFunction("shingle_hashes", exprs => {
      require(exprs.length == 2, "shingle_hashes expects (tokens, k)")
      val k = exprs(1) match {
        case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
        case other => throw new IllegalArgumentException(
          s"shingle_hashes k must be an integer literal, got $other")
      }
      ShingleHashes(exprs.head, k)
    }, "built-in")
    reg.createOrReplaceTempFunction("ngram_repetition", exprs => {
      require(exprs.length == 2, "ngram_repetition expects (text, n)")
      val n = exprs(1) match {
        case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
        case other => throw new IllegalArgumentException(
          s"ngram_repetition n must be an integer literal, got $other")
      }
      NgramRepetition(exprs.head, n)
    }, "built-in")
    reg.createOrReplaceTempFunction("term_counts", exprs => {
      require(exprs.length == 1, "term_counts expects (text)")
      TermCounts(exprs.head)
    }, "built-in")
    def intLit(fn: String, e: Expression, what: String): Int = e match {
      case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
      case other => throw new IllegalArgumentException(
        s"$fn $what must be an integer literal, got $other")
    }
    reg.createOrReplaceTempFunction("hashed_tf", exprs => {
      require(exprs.length == 2, "hashed_tf expects (text, dim)")
      HashedTf(exprs.head, intLit("hashed_tf", exprs(1), "dim"))
    }, "built-in")
    reg.createOrReplaceTempFunction("word_lines", exprs => {
      require(exprs.length == 2, "word_lines expects (text, k)")
      WordLines(exprs.head, intLit("word_lines", exprs(1), "k"))
    }, "built-in")
    // composed text operators, built as direct Catalyst trees (the same
    // nodes TextOps' Column formulations analyze into — results identical)
    reg.createOrReplaceTempFunction("pii_scrub", exprs => {
      require(exprs.length == 1, "pii_scrub expects (text)")
      import org.apache.spark.sql.catalyst.expressions.{Cast, CreateNamedStruct,
        Literal, RegExpExtractAll, RegExpReplace, Size}
      import org.apache.spark.sql.types.LongType
      import graft.text.TextOps.{PiiEmail, PiiIp, PiiPhone}
      val text = exprs.head
      def cnt(re: String) =
        Cast(Size(RegExpExtractAll(text, Literal(re), Literal(0))), LongType)
      val redacted = RegExpReplace(RegExpReplace(RegExpReplace(text,
        Literal(PiiEmail), Literal("<EMAIL>")),
        Literal(PiiIp), Literal("<IP>")),
        Literal(PiiPhone), Literal("<PHONE>"))
      CreateNamedStruct(Seq(
        Literal("n_emails"), cnt(PiiEmail), Literal("n_ips"), cnt(PiiIp),
        Literal("n_phones"), cnt(PiiPhone), Literal("redacted"), redacted))
    }, "built-in")
    reg.createOrReplaceTempFunction("sample_gate", exprs => {
      require(exprs.length == 2, "sample_gate expects (id, permille)")
      import org.apache.spark.sql.catalyst.expressions.{Cast, LessThan, Literal,
        Multiply, Pmod}
      import org.apache.spark.sql.types.LongType
      import graft.text.TextOps.{HashMod, SampleMult}
      LessThan(
        Pmod(Multiply(Pmod(Cast(exprs(0), LongType), Literal(HashMod)),
          Literal(SampleMult)), Literal(1000L)),
        Cast(exprs(1), LongType))
    }, "built-in")
  }
}
