package graft.search

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class LateInteractionSpec extends AnyFunSuite {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  test("maxSim matches a naive per-group recompute; top-k order deterministic") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val rows = (0L until 120L).map { i =>
      (i % 10, Array.fill(8)(rnd.nextFloat() * 2 - 1)) // 10 docs × 12 tokens
    }
    val df = rows.toDF("gid", "vec")
    val queries = Seq(Array.fill(8)(0.5f), Array.tabulate(8)(d => (d % 3) * 0.25f))

    val got = LateInteraction.maxSimScores(df, "vec", "gid", queries)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap

    def dot(a: Array[Float], b: Array[Float]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i).toDouble * b(i).toDouble; i += 1 }
      s
    }
    val naive = rows.groupBy(_._1).map { case (g, rs) =>
      g -> queries.map(q => rs.map(r => dot(r._2, q)).max).sum
    }
    assert(got.keySet == naive.keySet)
    for ((g, s) <- naive)
      assert(math.abs(got(g) - s) < 1e-12, s"group $g: ${got(g)} vs $s")

    val top = LateInteraction.maxSimTopK(df, "vec", "gid", queries, 3)
      .collect().map(_.getLong(0)).toSeq
    val expectTop = naive.toSeq.sortBy { case (g, s) => (-s, g) }.take(3).map(_._1)
    assert(top == expectTop)
  }
}
