package graft.text

import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

import graft.expressions.{NgramRepetition, TermCounts, WordLines}

/** Property tests for the fused text kernels: the single-pass
 *  NgramRepetition counters must agree with a naive tokenize → slide →
 *  group recount on arbitrary text, for every n. */
object TextProperties extends Properties("graft.text") {

  private val wordGen = Gen.oneOf("a", "b", "ab", "xyz", "q1", "Spark", "B2b")
  private val sepGen = Gen.oneOf(" ", "  ", ", ", "!\n", " - ")
  private val textGen: Gen[String] = for {
    words <- Gen.listOfN(30, wordGen).flatMap(ws => Gen.someOf(ws))
    seps <- Gen.listOfN(words.size, sepGen)
  } yield words.zip(seps).map { case (w, s) => w + s }.mkString

  private def naive(text: String, n: Int): (Long, Long, Long) = {
    val toks = "[a-z0-9]+".r.findAllIn(text.toLowerCase).toSeq
    if (toks.length < n) return (0L, 0L, 0L)
    val counts = toks.sliding(n).map(_.mkString(" ")).toSeq
      .groupBy(identity).map { case (_, v) => v.size.toLong }
    (counts.sum, counts.max, counts.filter(_ > 1).sum)
  }

  property("ngram_repetition == naive recount") =
    forAll(textGen, Gen.choose(1, 6)) { (text, n) =>
      val row = NgramRepetition(Literal(UTF8String.fromString(text),
          org.apache.spark.sql.types.StringType), n)
        .eval(null).asInstanceOf[org.apache.spark.sql.catalyst.InternalRow]
      val got = (row.getLong(0), row.getLong(1), row.getLong(2))
      val expect = naive(text, n)
      if (got != expect)
        println(s"text=$text n=$n got=$got expect=$expect")
      got == expect
    }

  property("dup_count and max_count are consistent with total") =
    forAll(textGen, Gen.choose(1, 6)) { (text, n) =>
      val row = NgramRepetition(Literal(UTF8String.fromString(text),
          org.apache.spark.sql.types.StringType), n)
        .eval(null).asInstanceOf[org.apache.spark.sql.catalyst.InternalRow]
      val (total, maxC, dup) = (row.getLong(0), row.getLong(1), row.getLong(2))
      dup <= total && maxC <= total && (total == 0 || maxC >= 1) &&
        (dup == 0 || dup >= 2) && (maxC < 2 || dup >= maxC)
    }

  private def toksOf(text: String): Seq[String] =
    "[a-z0-9]+".r.findAllIn(text.toLowerCase).toSeq

  property("term_counts == naive groupBy; frequencies sum to token count") =
    forAll(textGen) { text =>
      val arr = TermCounts(Literal(UTF8String.fromString(text),
          org.apache.spark.sql.types.StringType))
        .eval(null).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      val got = (0 until arr.numElements()).map { i =>
        val r = arr.getStruct(i, 2)
        r.getUTF8String(0).toString -> r.getLong(1)
      }
      val toks = toksOf(text)
      val expect = toks.groupBy(identity).view.mapValues(_.size.toLong).toMap
      got.toMap == expect &&
        got.map(_._2).sum == toks.length &&
        got.map(_._1) == toks.distinct // first-occurrence order
    }

  property("word_lines: rejoining lines reconstructs the token stream") =
    forAll(textGen, Gen.choose(1, 7)) { (text, k) =>
      val arr = WordLines(Literal(UTF8String.fromString(text),
          org.apache.spark.sql.types.StringType), k)
        .eval(null).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      val lines = (0 until arr.numElements()).map(arr.getUTF8String(_).toString)
      val toks = toksOf(text)
      lines.mkString(" ").trim == toks.mkString(" ") &&
        lines.forall(l => l.split(" ").count(_.nonEmpty) <= k) &&
        lines.dropRight(1).forall(l => l.split(" ").length == k)
    }

  private lazy val sparkForProps: org.apache.spark.sql.SparkSession = {
    val s = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  property("dedup_lines == naive global first-occurrence keep rule") = {
    val docGen = Gen.listOfN(8, Gen.oneOf("a", "b", "c", "ab"))
      .map(_.mkString(" "))
    forAll(Gen.listOfN(6, docGen), Gen.choose(1, 3)) { (texts, k) =>
      import sparkForProps.implicits._
      val rows = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      val got = graft.text.TextOps.dedupLines(
          rows.toDF("doc_id", "text"), "text", "doc_id", k)
        .collect().map(r => r.getLong(0) ->
          (r.getLong(1), r.getLong(2), r.getString(3))).toMap
      // naive reference: global (doc, idx)-lexicographic first instance of
      // every distinct line survives
      val lines = rows.flatMap { case (id, t) =>
        val toks = "[a-z0-9]+".r.findAllIn(t.toLowerCase).toSeq
        toks.grouped(k).map(_.mkString(" ")).zipWithIndex
          .map { case (l, i) => (id, i.toLong, l) }.toSeq
      }
      val keeper = lines.groupBy(_._3).view
        .mapValues(_.map(x => (x._1, x._2)).min).toMap
      val expect = lines.groupBy(_._1).view.mapValues { ls =>
        val kept = ls.filter(x => keeper(x._3) == ((x._1, x._2)))
          .sortBy(_._2)
        (ls.size.toLong, kept.size.toLong, kept.map(_._3).mkString(" "))
      }.toMap
      val ok = got == expect
      if (!ok) println(s"texts=$texts k=$k got=$got expect=$expect")
      ok
    }
  }
}
