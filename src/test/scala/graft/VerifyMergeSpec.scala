package graft

import org.scalatest.funsuite.AnyFunSuite

/** The subset-Verify approx_err merge (Verify.carryForward — r13
  * ADVICE): carried entries must be validated against the CURRENT
  * code's bounds, never the bounds recorded when they were measured.
  * Pure-function spec; the end-to-end path (subset Verify over a
  * doctored prior file) was demonstrated r14 and rides the per-round
  * Verify runs. */
class VerifyMergeSpec extends AnyFunSuite {

  private val bounds = Map("a" -> 0.05, "b" -> 0.02)

  test("a carried entry's bound is rewritten from the current " +
      "inventory and tagged carried:true — a stale looser bound " +
      "cannot survive a subset run after a code-side tightening") {
    val prior = Map("a" -> """{"err": 0.004, "bound": 0.5}""")
    val out = Verify.carryForward(prior, Set.empty, bounds)
    assert(out.keySet == Set("a"))
    assert(out("a").contains("\"bound\": 0.05"), out("a"))
    assert(!out("a").contains("0.5,"), out("a"))
    assert(out("a").contains("\"err\": 0.004"), out("a"))
    assert(out("a").contains("\"carried\": true"), out("a"))
  }

  test("freshly re-measured keys are NOT carried (the fresh " +
      "measurement wins), and prior keys no longer in the inventory " +
      "are dropped") {
    val prior = Map(
      "a" -> """{"err": 0.004, "bound": 0.5}""",   // fresh below
      "gone" -> """{"err": 0.1, "bound": 9.9}""")  // left the inventory
    val out = Verify.carryForward(prior, Set("a"), bounds)
    assert(out.isEmpty, out)
  }

  test("a carried err=null (crashed measurement) stays null so " +
      "check.py still counts it as FAIL; an unparseable prior body " +
      "degrades to null rather than inventing a value") {
    val prior = Map(
      "a" -> """{"err": null, "bound": 0.05}""",
      "b" -> """not json at all""")
    val out = Verify.carryForward(prior, Set.empty, bounds)
    assert(out("a").contains("\"err\": null"), out("a"))
    assert(out("b").contains("\"err\": null"), out("b"))
    assert(out("b").contains("\"bound\": 0.02"), out("b"))
  }

  test("jsonQ escapes quotes, backslashes, and control characters — " +
      "builder-authored SQL with tabs/CRs must not break the " +
      "driver's json.load") {
    assert(Verify.jsonQ("a\"b\\c\nd\re\tf" + 1.toChar + "g") ==
      "\"a\\\"b\\\\c\\nd\\re\\tf\\u0001g\"")
  }
}
