package graft.index

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the attribute-filtered search contract (Ann.searchFiltered — the
 *  FAISS SearchParameters/IDSelector analog): exact route == brute force
 *  over the allowed subset; graph route converges to the SAME exact answer
 *  once escalation saturates the shard; the IdFilter column/closure pair
 *  agree; tombstones still apply under a filter. */
class FilteredSearchSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.graft.ann.root", s"/tmp/graft-test-filt-${System.nanoTime()}")
    .getOrCreate()
  locally { spark.sparkContext.setLogLevel("ERROR") }

  private val sf = "/root/testdata/sf0.001"
  lazy val emb: DataFrame = spark.read.parquet(s"$sf/embeddings.parquet")

  private lazy val q0: Array[Float] = {
    val r = emb.orderBy("vec_id").limit(1).collect()(0)
    r.getSeq[Float](r.fieldIndex("embedding")).toArray
  }

  private def bruteFilteredTop(k: Int, q: Array[Float],
      allow: Long => Boolean): Seq[Long] = {
    import graft.functions._
    emb.select(col("vec_id"),
        array_distance_sq(toFloatVec(col("embedding")), floatVec(q.toSeq)).as("d"))
      .collect()
      .filter(r => allow(r.getLong(0)))
      .sortBy(r => (r.getDouble(1), r.getLong(0)))
      .take(k).map(_.getLong(0)).toSeq
  }

  test("exact route: filtered top-k == brute force over allowed subset") {
    Ann.buildIndex(emb, "embedding", "vec_id", "f_flat",
      Ann.BuildParams(engine = "flat"))
    val filt = Ann.IdFilter.modEq(7, 3)
    val got = Ann.searchFiltered(spark, "f_flat", q0, 10, filt)
      .collect().map(_.getLong(0)).toSeq
    assert(got == bruteFilteredTop(10, q0, filt.fn))
    assert(got.forall(_ % 7 == 3))
  }

  test("exact route pushes the predicate into the scan, not a post-filter") {
    Ann.buildIndex(emb, "embedding", "vec_id", "f_flat_plan",
      Ann.BuildParams(engine = "flat"))
    val df = Ann.searchFiltered(spark, "f_flat_plan", q0, 10,
      Ann.IdFilter.modEq(7, 3))
    // the predicate must sit below the top-k sort in the optimized plan:
    // find a Filter whose condition mentions the id column
    val plan = df.queryExecution.optimizedPlan
    val hasIdFilter = plan.collect {
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter
        if f.condition.references.exists(_.name == "id") => f
    }.nonEmpty
    assert(hasIdFilter, s"no id filter in plan:\n${plan.treeString}")
  }

  test("graph route saturates to the exact filtered answer on a selective filter") {
    Ann.buildIndex(emb, "embedding", "vec_id", "f_graph",
      Ann.BuildParams(engine = "diskann", numShards = 2))
    // ~1/50 selectivity: the initial 4k overfetch cannot yield k=10 allowed
    // hits, so every shard must escalate to saturation, where the beam has
    // visited every reachable node and the answer is exact
    val filt = Ann.IdFilter.modEq(50, 1)
    val want = bruteFilteredTop(10, q0, filt.fn)
    val got = Ann.searchFiltered(spark, "f_graph", q0, 10, filt)
      .collect().map(_.getLong(0)).toSeq
    assert(got == want, s"got $got want $want")
  }

  test("graph route with permissive filter returns k allowed rows, ordered") {
    Ann.buildIndex(emb, "embedding", "vec_id", "f_graph2",
      Ann.BuildParams(engine = "diskann", numShards = 2))
    val rows = Ann.searchFiltered(spark, "f_graph2", q0, 10,
      Ann.IdFilter.modEq(2, 0)).collect()
    assert(rows.length == 10)
    assert(rows.forall(_.getLong(0) % 2 == 0))
    val ds = rows.map(_.getFloat(1)).toSeq
    assert(ds == ds.sorted)
  }

  test("IdFilter constructors: column and closure agree; inSet works end-to-end") {
    val ids = emb.limit(40).collect().map(_.getLong(0)).filter(_ % 2 == 1).toSet
    val filt = Ann.IdFilter.inSet(ids)
    assert(ids.forall(filt.fn))
    assert(!filt.fn(-1L))
    Ann.buildIndex(emb, "embedding", "vec_id", "f_inset",
      Ann.BuildParams(engine = "flat"))
    val got = Ann.searchFiltered(spark, "f_inset", q0, 5, filt)
      .collect().map(_.getLong(0)).toSeq
    assert(got == bruteFilteredTop(5, q0, ids.contains))
  }

  test("tombstones still excluded under a filter (both routes)") {
    Ann.buildIndex(emb, "embedding", "vec_id", "f_tomb",
      Ann.BuildParams(engine = "flat"))
    val filt = Ann.IdFilter.modEq(2, 0)
    val before = Ann.searchFiltered(spark, "f_tomb", q0, 5, filt)
      .collect().map(_.getLong(0)).toSeq
    Ann.delete(spark, "f_tomb", Seq(before.head))
    val after = Ann.searchFiltered(spark, "f_tomb", q0, 5, filt)
      .collect().map(_.getLong(0)).toSeq
    assert(!after.contains(before.head))
    assert(after == bruteFilteredTop(6, q0, filt.fn).filterNot(_ == before.head).take(5))
  }
}
