package graft.tools

import org.scalatest.funsuite.AnyFunSuite
import org.json4s._
import org.json4s.jackson.JsonMethods

/** Pins ScaleMerge's contract: an isolated-op re-run merges into a ladder
 *  artifact with the replaced in-ladder numbers PRESERVED beside the new
 *  ones and the footer (total / worst skews) RECOMPUTED from the merged
 *  per-op values — the round-15 inconsistency (footer max orphaned from its
 *  own ops after a hand-merge) is impossible by construction. */
class ScaleMergeSpec extends AnyFunSuite {

  private val ladder = JsonMethods.parse(
    """{"metric":"scale1000x_total","value":100.0,"unit":"sec",
      |"ops":{
      |  "op_a":{"sec":40.0,"worst_task_skew":2.0,"major_stage_skew":1.5},
      |  "op_b":{"sec":60.0,"worst_task_skew":6.3,"major_stage_skew":6.3}
      |},
      |"factor":1000,"worst_task_skew":6.3,"worst_major_stage_skew":6.3}""".stripMargin)

  private val iso = JsonMethods.parse(
    """{"metric":"scale1000x_total","value":55.0,"unit":"sec",
      |"ops":{
      |  "op_b":{"sec":55.0,"worst_task_skew":1.1,"major_stage_skew":1.04}
      |},
      |"factor":1000,"worst_task_skew":1.1,"worst_major_stage_skew":1.04}""".stripMargin)

  implicit private val fmts: Formats = DefaultFormats

  test("merge keeps in-ladder numbers, stamps rerun_isolated, recomputes footer") {
    val m = ScaleMerge.merge(ladder, iso)
    val opB = m \ "ops" \ "op_b"
    assert((opB \ "sec").extract[Double] == 55.0)
    assert((opB \ "inladder_sec").extract[Double] == 60.0)
    assert((opB \ "inladder_major_stage_skew").extract[Double] == 6.3)
    assert((opB \ "rerun_isolated").extract[Boolean])
    // op_a untouched, no rerun stamp
    assert((m \ "ops" \ "op_a" \ "rerun_isolated") == JNothing)
    // footer recomputed FROM the merged ops: total 40+55, skews from op_a
    // (2.0/1.5) vs op_b's new 1.1/1.04 — the stale 6.3 is gone
    assert((m \ "value").extract[Double] == 95.0)
    assert((m \ "worst_task_skew").extract[Double] == 2.0)
    assert((m \ "worst_major_stage_skew").extract[Double] == 1.5)
  }

  test("footer fields missing from the ladder are APPENDED, not dropped") {
    val bare = JsonMethods.parse(
      """{"metric":"scale1000x_total","value":100.0,
        |"ops":{"op_a":{"sec":40.0,"worst_task_skew":2.0,"major_stage_skew":1.5},
        |"op_b":{"sec":60.0,"worst_task_skew":6.3,"major_stage_skew":6.3}}}""".stripMargin)
    val m = ScaleMerge.merge(bare, iso)
    // the old artifact had no skew footer at all — the recomputed values
    // must still be present in the output
    assert((m \ "worst_task_skew").extract[Double] == 2.0)
    assert((m \ "worst_major_stage_skew").extract[Double] == 1.5)
    assert((m \ "value").extract[Double] == 95.0)
  }

  test("ops only in the isolated artifact append with the rerun stamp") {
    val iso2 = JsonMethods.parse(
      """{"ops":{"op_new":{"sec":5.0,"worst_task_skew":1.0,"major_stage_skew":1.0}}}""")
    val m = ScaleMerge.merge(ladder, iso2)
    assert((m \ "ops" \ "op_new" \ "sec").extract[Double] == 5.0)
    assert((m \ "ops" \ "op_new" \ "rerun_isolated").extract[Boolean])
    assert((m \ "value").extract[Double] == 105.0)
    // footer skews keep op_b's in-ladder 6.3 — it was not replaced
    assert((m \ "worst_major_stage_skew").extract[Double] == 6.3)
  }

  test("merge is idempotent: re-merging an already-merged ladder keeps the " +
      "ORIGINAL in-ladder provenance and emits no duplicate fields") {
    val once = ScaleMerge.merge(ladder, iso)
    val iso2 = JsonMethods.parse(
      """{"ops":{"op_b":{"sec":52.0,"worst_task_skew":1.2,"major_stage_skew":1.1}}}""")
    val twice = ScaleMerge.merge(once, iso2)
    val opB = twice \ "ops" \ "op_b"
    assert((opB \ "sec").extract[Double] == 52.0)
    // in-ladder provenance is the TRUE ladder number (60.0), not the first
    // isolated re-run's 55.0
    assert((opB \ "inladder_sec").extract[Double] == 60.0)
    assert((opB \ "inladder_major_stage_skew").extract[Double] == 6.3)
    // exactly one occurrence of each stamped field
    val fields = opB.asInstanceOf[JObject].obj.map(_._1)
    assert(fields.count(_ == "rerun_isolated") == 1)
    assert(fields.count(_ == "inladder_sec") == 1)
    assert((twice \ "value").extract[Double] == 92.0)
  }

  test("an op entry without a numeric 'sec' fails loudly instead of " +
      "deflating the footer total") {
    val bad = JsonMethods.parse(
      """{"ops":{"op_a":{"worst_task_skew":2.0},
        |"op_b":{"sec":60.0,"worst_task_skew":6.3,"major_stage_skew":6.3}}}""".stripMargin)
    val ex = intercept[IllegalArgumentException](ScaleMerge.merge(bad, iso))
    assert(ex.getMessage.contains("op_a"))
  }
}
