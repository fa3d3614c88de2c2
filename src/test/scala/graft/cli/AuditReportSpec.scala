package graft.cli

import graft.SparkSpec

/** The CLI `--audit` report: the PlanAudit lint surfaced per query.
  * Exercises the report formatter on a clean plan and on a plan with a
  * deliberate scale risk, so the flag's output contract is pinned
  * without driving the CLI's session lifecycle. */
class AuditReportSpec extends SparkSpec {

  test("clean plan reports a single 'clean' line") {
    val df = graft.SparkEntry.queries("q01_scan")(spark, sfDir)
    assert(Main.auditReport(df) == Seq("[graft] plan audit: clean"))
  }

  test("a cross join surfaces as a finding line (cartesian or " +
      "nested-loop, depending on which physical form Spark picks)") {
    import spark.implicits._
    val a = Seq(1, 2).toDF("x")
    val b = Seq(3, 4).toDF("y")
    val lines = Main.auditReport(a.crossJoin(b))
    assert(lines.exists(l => l.contains("cartesian-join") ||
        l.contains("nested-loop-join")),
      s"expected a cross-join finding, got: $lines")
  }
}
