package graft.tools

import org.json4s._
import org.json4s.jackson.JsonMethods

/**
 * Merge an isolated-op scale artifact (a `SPARK_GRAFT_SCALE_ONLY=<op>` run)
 * into a full-ladder artifact WITHOUT breaking footer consistency — the
 * round-15 failure mode: semdedup's in-ladder entry was hand-replaced by an
 * isolated re-run, leaving the footer's `worst_major_stage_skew` (6.27)
 * orphaned from the max over its own ops (3.09). This tool:
 *
 *   1. replaces each op present in the isolated artifact, keeping the
 *      replaced entry's numbers beside the new ones as `inladder_sec` /
 *      `inladder_worst_task_skew` / `inladder_major_stage_skew` and
 *      stamping `rerun_isolated: true`, so both measurements survive;
 *   2. RECOMPUTES the footer (`value` total, `worst_task_skew`,
 *      `worst_major_stage_skew`) from the merged per-op values, so the
 *      artifact is self-consistent by construction.
 *
 * Usage: runMain graft.tools.ScaleMerge <ladder.json> <isolated.json> <out.json>
 */
object ScaleMerge {
  implicit private val fmts: Formats = DefaultFormats

  def main(args: Array[String]): Unit = {
    require(args.length == 3,
      "usage: ScaleMerge <ladder.json> <isolated.json> <out.json>")
    val ladder = JsonMethods.parse(slurp(args(0)))
    val iso = JsonMethods.parse(slurp(args(1)))
    val merged = merge(ladder, iso)
    val out = JsonMethods.compact(JsonMethods.render(merged))
    java.nio.file.Files.write(java.nio.file.Paths.get(args(2)),
      out.getBytes("UTF-8"))
    println(out)
  }

  private def slurp(p: String): String =
    new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(p)), "UTF-8")

  /** Fields this tool itself stamps onto a merged entry. Stripped from both
   *  sides before composing so merge() is IDEMPOTENT: re-merging into an
   *  already-merged ladder must neither duplicate `rerun_isolated` JFields
   *  nor overwrite the ORIGINAL in-ladder provenance with numbers that are
   *  themselves isolated re-runs. */
  private val MergeStamps = Set("rerun_isolated", "inladder_sec",
    "inladder_worst_task_skew", "inladder_major_stage_skew")

  private def stripStamps(e: JValue): List[JField] =
    e.asInstanceOf[JObject].obj.filterNot(f => MergeStamps.contains(f._1))

  private[tools] def merge(ladder: JValue, iso: JValue): JValue = {
    val ladderOps = (ladder \ "ops").asInstanceOf[JObject].obj
    val isoOps = (iso \ "ops").asInstanceOf[JObject].obj.toMap
    val mergedOps = ladderOps.map { case (name, oldEntry) =>
      isoOps.get(name) match {
        case Some(newEntry) =>
          // in-ladder provenance: if the old entry was ALREADY merged, its
          // inladder_* fields are the true ladder numbers — carry them
          // through verbatim; otherwise derive them from the old entry
          val keep = Seq("sec" -> "inladder_sec",
            "worst_task_skew" -> "inladder_worst_task_skew",
            "major_stage_skew" -> "inladder_major_stage_skew").flatMap {
            case (src, dst) => (oldEntry \ dst) match {
              case JNothing => (oldEntry \ src) match {
                case JNothing => None
                case v => Some(JField(dst, v))
              }
              case prior => Some(JField(dst, prior))
            }
          }
          name -> JObject(stripStamps(newEntry) ++
            keep :+ JField("rerun_isolated", JBool(true)))
        case None => name -> oldEntry
      }
    }
    // ops present only in the isolated artifact append at the end
    val extra = isoOps.view.filterKeys(k => !ladderOps.exists(_._1 == k)).toSeq
      .sortBy(_._1)
      .map { case (n, e) => n ->
        JObject(stripStamps(e) :+ JField("rerun_isolated", JBool(true))) }
    val allOps = mergedOps ++ extra
    def num(v: JValue): Option[Double] = v match {
      case JDouble(d) => Some(d)
      case JInt(i) => Some(i.toDouble)
      case JLong(l) => Some(l.toDouble)
      case JDecimal(d) => Some(d.toDouble)
      case _ => None
    }
    // skew fields may be legitimately absent (trivial ops); `sec` may not —
    // coercing a malformed entry to 0.0 would silently deflate the footer
    // total, counter to the tool's self-consistency-by-construction claim
    def maxOver(field: String): Double =
      allOps.flatMap { case (_, e) => num(e \ field) }.foldLeft(1.0)(math.max)
    val total = allOps.map { case (name, e) =>
      num(e \ "sec").getOrElse(throw new IllegalArgumentException(
        s"op '$name' lacks a numeric 'sec' field — refusing to fold it into " +
        "the footer total as 0.0"))
    }.sum
    val footer = Map(
      "value" -> JDouble(total),
      "worst_task_skew" -> JDouble(maxOver("worst_task_skew")),
      "worst_major_stage_skew" -> JDouble(maxOver("major_stage_skew")),
      "ops" -> JObject(allOps))
    // replace in place where the key exists, APPEND where it doesn't — an
    // older ladder artifact missing a footer field must still come out
    // carrying the recomputed value, or the tool's self-consistency-by-
    // construction claim silently fails on exactly the artifacts that need
    // repair most
    val present = ladder.asInstanceOf[JObject].obj.map(_._1).toSet
    val replaced = ladder.asInstanceOf[JObject].obj.map {
      case JField(k, _) if footer.contains(k) => JField(k, footer(k))
      case f => f
    }
    val appended = footer.collect {
      case (k, v) if !present.contains(k) => JField(k, v)
    }
    JObject(replaced ++ appended)
  }
}
