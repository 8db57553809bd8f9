package graft.streaming

import org.apache.spark.sql.SparkSession
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Property test: the one-shuffle mapPartitions sessionization scan must
 *  agree with a naive per-user reference (sort, walk, split on gap) for
 *  arbitrary event sets — including duplicate timestamps, exact-boundary
 *  gaps, single-event users, and shuffled input order. */
object SessionizeProperties extends Properties("graft.streaming.sessionize") {

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  private val gapUs = 100L

  // small user/time domains force collisions, boundary gaps, and long runs
  private val eventGen: Gen[(Long, Long, Long)] = for {
    u <- Gen.choose(0L, 3L)
    t <- Gen.choose(0L, 1000L)
    e <- Gen.choose(0L, 50L)
  } yield (u, t, e)

  private def reference(rows: List[(Long, Long, Long)]):
      Set[(Long, Long, Long, Long, Long)] = {
    rows.groupBy(_._1).flatMap { case (u, es) =>
      val sorted = es.map(r => (r._2, r._3)).sorted
      val sessions = scala.collection.mutable.ArrayBuffer
        .empty[(Long, Long, Long)] // (start, end, n)
      sorted.foreach { case (t, _) =>
        if (sessions.nonEmpty && t - sessions.last._2 <= gapUs) {
          val (s0, _, n) = sessions.last
          sessions(sessions.length - 1) = (s0, t, n + 1)
        } else sessions += ((t, t, 1L))
      }
      sessions.zipWithIndex.map { case ((s0, e0, n), i) =>
        (u, (i + 1).toLong, s0, e0, n)
      }
    }.toSet
  }

  property("scan == naive per-user reference") =
    forAll(Gen.listOfN(40, eventGen)) { rows0 =>
      val rows = rows0.distinct
      rows.isEmpty || {
        import spark.implicits._
        val df = rows.toDF("user_id", "tus", "event_id")
          .repartition(5) // arbitrary input layout
        val got = Sessionize.sessionizeBatch(df, "user_id", "tus", "event_id", gapUs)
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
            r.getLong(3), r.getLong(4))).toSet
        val expect = reference(rows)
        if (got != expect) println(s"rows=$rows\ngot=$got\nexpect=$expect")
        got == expect
      }
    }
}
