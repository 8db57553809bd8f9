package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{LeafNode, Statistics}
import org.apache.spark.sql.execution.LeafExecNode

/**
 * Side-effecting table functions (`ann_create_index` / `ann_vacuum` /
 * `ann_drop` / `diskann_streaming_build`) as a lazy command node. The
 * reference separates a TVF's bind step (schema only,
 * src/ann_search.cpp:55-96) from first-scan execution (:102-149); the Spark
 * analog is an unresolved-relation-style leaf whose effect body runs at
 * EXECUTION time. Resolving the function during analysis only fixes the
 * output attributes, so `EXPLAIN SELECT * FROM ann_drop('idx')` (or plan
 * caching over it) leaves the catalog untouched.
 *
 * The body produces the result DataFrame AFTER the effect. One body run per
 * physical plan instance (executeCollect and doExecute share it); re-running
 * the SQL statement resolves a fresh node and re-runs the effect, matching
 * re-execution semantics in the reference.
 *
 * Corollary of running at execution: if the optimizer proves the node's
 * output is never consumed and prunes it (`LIMIT 0`, a join against a
 * provably-empty relation → OptimizeLimitZero/PropagateEmptyRelation), the
 * effect does NOT run — the standard Spark contract that a pruned subtree
 * never executes, and the same outcome as `EXPLAIN`. Statements that want
 * the effect must consume at least one potential row (`SELECT * FROM
 * ann_vacuum('ix')` does; wrapping it in `LIMIT 0` asks for nothing and gets
 * nothing). Pinned by TableFunctionsSpec.
 */
case class CommandTvfNode(fnName: String, output: Seq[Attribute],
    @transient body: () => DataFrame) extends LeafNode {
  override def computeStats(): Statistics = Statistics(sizeInBytes = 64L)
  override def argString(maxFields: Int): String = fnName
}

case class CommandTvfExec(fnName: String, output: Seq[Attribute],
    @transient body: () => DataFrame) extends LeafExecNode {

  @transient private lazy val result: Array[InternalRow] = {
    val rows = body().queryExecution.executedPlan.executeCollect()
    val proj = UnsafeProjection.create(schema)
    rows.map(r => proj(r).copy().asInstanceOf[InternalRow])
  }

  override def executeCollect(): Array[InternalRow] = result

  protected def doExecute(): RDD[InternalRow] = {
    val rows = result
    sparkContext.parallelize(rows.toIndexedSeq, 1)
  }

  override def argString(maxFields: Int): String = fnName
}
