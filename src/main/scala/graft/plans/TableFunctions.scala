package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.util.ArrayData

import graft.index.{Ann, IndexCatalog}
import graft.search.Hybrid

/**
 * SQL-callable table functions — the surface a SQL-only client uses where the
 * reference registers DuckDB table functions (src/ann_search.cpp:1165-1218,
 * src/ann_list.cpp, src/diskann_functions.cpp):
 *
 *   SELECT * FROM ann_search('documents', 'docs_idx', array(0.1, ...), 10)
 *   SELECT * FROM ann_search_batch('documents', 'docs_idx', array(array(...), ...), 5)
 *   SELECT * FROM ann_search_table('queries_view', 'documents', 'docs_idx', 5)
 *   SELECT * FROM vector_distances('embeddings', array(...))        -- + optional metric
 *   SELECT * FROM hybrid_search('documents', 'docs_idx', 'embedding', 'doc_id',
 *                               array(...), 'query text', 10)
 *   SELECT * FROM ann_list()
 *   SELECT * FROM ann_index_info()                                  -- or (name)
 *   SELECT * FROM faiss_gpu_info()
 *   SELECT * FROM ann_create_index('documents', 'embedding', 'doc_id',
 *                                  'docs_idx', 'IVF64,Flat')        -- build from SQL
 *   SELECT * FROM ann_vacuum('docs_idx')
 *   SELECT * FROM diskann_streaming_build('/path/file.bin', 'idx')
 *
 * Tables are referenced by NAME (views work: `CREATE TEMP VIEW queries AS
 * SELECT ...` replaces the reference's TABLE-valued subquery inputs — Spark
 * reserves TABLE() arguments for Python UDTFs). `ann_search_table` and
 * `vector_distances` auto-detect the query-vector column like the reference
 * (first numeric-array column, src/ann_search.cpp:471-494). All arguments
 * must be literals (they configure a search; they are not per-row values).
 *
 * Registered by [[Graft.init]] on the live session and by [[GraftExtensions]]
 * at session build; resolution happens at analysis time via the session's
 * TableFunctionRegistry, and the returned plan is the same DataFrame plan the
 * Scala API builds — identical execution path, identical results.
 */
object TableFunctions {

  private def err(fn: String, msg: String): Nothing =
    throw new IllegalArgumentException(s"$fn: $msg")

  private def evalLit(fn: String, e: Expression): Any = {
    if (!e.foldable) err(fn, s"argument must be a literal, got: ${e.sql}")
    e.eval()
  }

  private def str(fn: String, e: Expression): String = evalLit(fn, e) match {
    case null => err(fn, "argument must not be null")
    case v => v.toString
  }

  private def int(fn: String, e: Expression): Int = evalLit(fn, e) match {
    case i: Int => i
    case l: Long => l.toInt
    case s: Short => s.toInt
    case b: Byte => b.toInt
    case v => err(fn, s"expected an integer argument, got: $v")
  }

  private def num(fn: String, v: Any): Float = v match {
    case f: Float => f
    case d: Double => d.toFloat
    case i: Int => i.toFloat
    case l: Long => l.toFloat
    case s: Short => s.toFloat
    case b: Byte => b.toFloat
    case d: org.apache.spark.sql.types.Decimal => d.toFloat
    case x => err(fn, s"expected a numeric vector element, got: $x")
  }

  private def vec(fn: String, e: Expression): Array[Float] = evalLit(fn, e) match {
    case a: ArrayData => a.array.map(num(fn, _))
    case v => err(fn, s"expected an array literal query vector, got: $v")
  }

  private def vecs(fn: String, e: Expression): Array[Array[Float]] = evalLit(fn, e) match {
    case a: ArrayData => a.array.map {
      case inner: ArrayData => inner.array.map(num(fn, _))
      case v => err(fn, s"expected an array of arrays, got element: $v")
    }
    case v => err(fn, s"expected an array-of-arrays literal, got: $v")
  }

  private def plan(df: DataFrame): LogicalPlan = df.queryExecution.logical

  private def spark: SparkSession = SparkSession.active

  /** (name, builder) for every table function. */
  private def builders: Seq[(String, Seq[Expression] => LogicalPlan)] = Seq(
    "ann_search" -> { args =>
      val fn = "ann_search"
      if (args.length < 4 || args.length > 6)
        err(fn, "usage: ann_search(table, index, query_vec, k[, search_complexity, oversample])")
      val table = str(fn, args(0)); val index = str(fn, args(1))
      val q = vec(fn, args(2)); val k = int(fn, args(3))
      val sc = if (args.length > 4) int(fn, args(4)) else 0
      val over = if (args.length > 5) int(fn, args(5)) else 1
      val idCol = IndexCatalog.load(Ann.root(spark), index).idColumn
      plan(Ann.search(spark.table(table), idCol, index, q, k, sc, over))
    },
    "ann_search_batch" -> { args =>
      val fn = "ann_search_batch"
      if (args.length < 4 || args.length > 5)
        err(fn, "usage: ann_search_batch(table, index, query_vecs, k[, search_complexity])")
      val table = str(fn, args(0)); val index = str(fn, args(1))
      val qs = vecs(fn, args(2)); val k = int(fn, args(3))
      val sc = if (args.length > 4) int(fn, args(4)) else 0
      val idCol = IndexCatalog.load(Ann.root(spark), index).idColumn
      plan(Ann.searchBatch(spark.table(table), idCol, index, qs.toSeq, k, sc))
    },
    "ann_search_table" -> { args =>
      val fn = "ann_search_table"
      if (args.length < 4 || args.length > 5)
        err(fn, "usage: ann_search_table(queries_table, base_table, index, k[, search_complexity])")
      val queries = str(fn, args(0)); val base = str(fn, args(1))
      val index = str(fn, args(2)); val k = int(fn, args(3))
      val sc = if (args.length > 4) int(fn, args(4)) else 0
      val idCol = IndexCatalog.load(Ann.root(spark), index).idColumn
      plan(Ann.searchTable(spark.table(queries), spark.table(base), idCol, index, k, sc))
    },
    "vector_distances" -> { args =>
      val fn = "vector_distances"
      if (args.length < 2 || args.length > 3)
        err(fn, "usage: vector_distances(table, query_vec[, metric])")
      val df = spark.table(str(fn, args(0)))
      val q = vec(fn, args(1))
      val metric = if (args.length > 2) str(fn, args(2)) else "l2"
      plan(Ann.vectorDistances(df, Ann.detectVectorColumn(df.schema), q, metric))
    },
    "hybrid_search" -> { args =>
      val fn = "hybrid_search"
      if (args.length < 6 || args.length > 8)
        err(fn, "usage: hybrid_search(table, index, vec_col, id_col, query_vec, " +
          "query_text[, k, text_col])")
      val table = str(fn, args(0)); val index = str(fn, args(1))
      val vecCol = str(fn, args(2)); val idCol = str(fn, args(3))
      val qVec = vec(fn, args(4)); val qText = str(fn, args(5))
      val k = if (args.length > 6) int(fn, args(6)) else 10
      val textCol = if (args.length > 7) str(fn, args(7)) else "text"
      plan(Hybrid.hybridSearch(spark.table(table), textCol, vecCol, idCol,
        qText, qVec, k, indexName = index))
    },
    "ann_list" -> { args =>
      if (args.nonEmpty) err("ann_list", "takes no arguments")
      plan(Ann.list(spark))
    },
    "ann_index_info" -> { args =>
      val fn = "ann_index_info"
      if (args.length > 1) err(fn, "usage: ann_index_info([name])")
      val all = Ann.indexInfo(spark)
      if (args.isEmpty) plan(all)
      else plan(all.where(all("name") === str(fn, args(0))))
    },
    "faiss_gpu_info" -> { args =>
      if (args.nonEmpty) err("faiss_gpu_info", "takes no arguments")
      plan(Ann.gpuInfo(spark))
    },
    "ann_create_index" -> { args =>
      val fn = "ann_create_index"
      if (args.length != 5)
        err(fn, "usage: ann_create_index(table, vector_col, id_col, index_name, factory)")
      val table = str(fn, args(0)); val column = str(fn, args(1))
      val idCol = str(fn, args(2)); val index = str(fn, args(3))
      val factory = str(fn, args(4))
      Ann.buildIndexFactory(spark.table(table), column, idCol, index, factory)
      val info = Ann.indexInfo(spark)
      plan(info.where(info("name") === index))
    },
    "ann_vacuum" -> { args =>
      val fn = "ann_vacuum"
      if (args.length != 1) err(fn, "usage: ann_vacuum(index_name)")
      val index = str(fn, args(0))
      Ann.vacuum(spark, index)
      val info = Ann.indexInfo(spark)
      plan(info.where(info("name") === index))
    },
    "diskann_streaming_build" -> { args =>
      val fn = "diskann_streaming_build"
      if (args.length != 2) err(fn, "usage: diskann_streaming_build(path, index_name)")
      val (n, dim, sample) = Ann.streamingBuild(spark, str(fn, args(0)), str(fn, args(1)))
      val s = spark
      import s.implicits._
      plan(Seq((n, dim, sample)).toDF("num_vectors", "dimension", "sample_size"))
    }
  )

  /** Register on a live session (Graft.init path). Idempotent: re-registering
   *  replaces the previous builder. */
  def register(session: SparkSession): Unit = {
    val reg = session.sessionState.tableFunctionRegistry
    builders.foreach { case (name, b) =>
      reg.registerFunction(FunctionIdentifier(name),
        new ExpressionInfo(getClass.getCanonicalName, name), b)
    }
  }

  /** Descriptors for [[org.apache.spark.sql.SparkSessionExtensions.injectTableFunction]]. */
  def descriptors: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => LogicalPlan)] =
    builders.map { case (name, b) =>
      (FunctionIdentifier(name), new ExpressionInfo(getClass.getCanonicalName, name), b)
    }
}
