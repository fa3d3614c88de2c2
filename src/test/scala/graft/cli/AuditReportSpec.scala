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

  test("--explain prints the cost card (signature, exchange totals, " +
      "audit verdict) without executing the query") {
    val df = graft.SparkEntry.queries("q06_join_inner")(spark, sfDir)
    val lines = Main.explainReport(df, "q06_join_inner")
    assert(lines.head == "[graft] explain q06_join_inner")
    val sigLine = lines.find(_.startsWith("[graft] signature: ")).get
    assert(sigLine.contains("="), s"no operator counts in: $sigLine")
    val exLine = lines.find(_.startsWith("[graft] exchanges: ")).get
    assert(exLine.matches(".*\\d+ shuffle, \\d+ broadcast"),
      s"malformed exchange totals: $exLine")
    assert(lines.exists(_.startsWith("[graft] plan audit: ")))
    // the scan section: read width vs file width, plus the pushdown —
    // q06 joins orders (6 cols) to customer (5 cols), reading a strict
    // subset of each, so both scan lines show pruning
    val scanLines = lines.filter(_.matches(".*: \\d+/\\d+ cols .*"))
    assert(scanLines.size == 2, s"expected 2 scan lines in:\n" +
      lines.mkString("\n"))
    for (sl <- scanLines) {
      val m = "(\\d+)/(\\d+) cols".r.findFirstMatchIn(sl).get
      assert(m.group(1).toInt < m.group(2).toInt, s"unpruned scan: $sl")
    }
    // pruned scans of ≥5-wide tables: no unpruned-scan finding
    assert(!lines.exists(_.contains("unpruned-scan")), lines)
  }

  test("--profile executes once and reports MEASURED rows through the " +
      "final adaptive plan: the scan row counts and the join's output " +
      "are real numbers, exchanges carry bytes") {
    val df = graft.SparkEntry.queries("q06_join_inner")(spark, sfDir)
    val lines = Main.profileReport(df, "q06_join_inner")
    assert(lines.head.startsWith("[graft] profile q06_join_inner: "),
      s"no timing header: ${lines.head}")
    val rowLines = lines.filter(_.contains(" rows="))
    assert(rowLines.nonEmpty, s"no measured rows in:\n${lines.mkString("\n")}")
    // the fixture join produces rows, so SOME operator measured > 0
    val rows = rowLines.flatMap(
      "rows=(\\d+)".r.findFirstMatchIn(_)).map(_.group(1).toLong)
    assert(rows.exists(_ > 0), s"all row counts zero: $rowLines")
    // a scan node appears with its measured output
    assert(rowLines.exists(l => l.toLowerCase.contains("scan")),
      s"no scan row count in:\n${rowLines.mkString("\n")}")
  }

  test("--audit-measure reports measured window/join cardinalities and " +
      "a clean verdict for a sound query; a many-to-many fanout frame " +
      "surfaces a join-explosion finding with the measured numbers") {
    val df = graft.SparkEntry.queries("q06_join_inner")(spark, sfDir)
    val lines = Main.measuredAuditReport(df, "q06_join_inner")
    assert(lines.head == "[graft] measured audit q06_join_inner")
    // the join's measured shape appears with real counts
    val joinLine = lines.find(_.matches(
      ".*L=\\d+ R=\\d+ out=\\d+ \\(\\d+\\.\\d+x\\).*"))
    assert(joinLine.nonEmpty, s"no measured join line in:\n" +
      lines.mkString("\n"))
    // the checkpoint-pin section is always present (q06 pins nothing)
    assert(lines.contains(
      "[graft] checkpoint pins (executor-local storage):") &&
      lines.contains("[graft]   (no checkpointed inputs)"), lines)
    assert(lines.last == "[graft] measured audit: clean", lines.last)
    // the fanout shape: 200x200 rows all on ONE key value
    import spark.implicits._
    val l = (1 to 200).map(i => (1, i)).toDF("k", "a")
    val r = (1 to 200).map(i => (1, i)).toDF("k", "b")
    val boomLines = Main.measuredAuditReport(l.join(r, "k"), "boom")
    assert(boomLines.exists(x => x.contains("[join-explosion]") &&
        x.contains("out=40000")),
      s"fanout not flagged:\n${boomLines.mkString("\n")}")
  }

  test("-e ad-hoc SQL reaches the SAME audit tooling as the named " +
      "inventory: an ad-hoc join over the registered tables drives " +
      "the explain cost card and the measured audit, and the " +
      "normalized events view exposes ts_us") {
    val sql = """SELECT o.o_custkey, count(*) AS n
                |FROM orders o JOIN customer c
                |  ON o.o_custkey = c.c_custkey
                |WHERE c.c_acctbal > 0
                |GROUP BY o.o_custkey""".stripMargin
    val df = Main.adhocFrame(spark, sql, sfDir)
    // the cost card: signature + exchange totals + scan pruning, no
    // execution
    val ex = Main.explainReport(df, "adhoc")
    assert(ex.head == "[graft] explain adhoc")
    assert(ex.exists(_.startsWith("[graft] exchanges: ")), ex)
    val scanLines = ex.filter(_.matches(".*: \\d+/\\d+ cols .*"))
    assert(scanLines.size == 2, s"expected 2 scan lines in:\n" +
      ex.mkString("\n"))
    // the measured audit: the join's real cardinalities on this data
    val ma = Main.measuredAuditReport(df, "adhoc")
    assert(ma.head == "[graft] measured audit adhoc")
    assert(ma.exists(_.matches(
      ".*L=\\d+ R=\\d+ out=\\d+ \\(\\d+\\.\\d+x\\).*")), ma)
    assert(ma.last == "[graft] measured audit: clean", ma.last)
    // events arrives normalized: integer-µs ts_us, the oracle shape
    val ev = Main.adhocFrame(spark,
      "SELECT ts_us FROM events LIMIT 1", sfDir)
    assert(ev.schema("ts_us").dataType ==
      org.apache.spark.sql.types.LongType)
  }

  test("--scaling measures the query at the three sibling scale " +
      "directories and reports the per-SF times plus a fitted " +
      "exponent (or an explicit unfit verdict) — never silence") {
    val lines = Main.scalingReport(spark, "q01_scan",
      graft.SparkEntry.queries("q01_scan"), sfDir)
    assert(lines.head.startsWith("[graft] scaling q01_scan: "),
      lines.head)
    assert(lines.head.contains("sf0.001") && lines.head.contains("sf0.1"),
      lines.head)
    assert(lines.exists(_.startsWith("[graft] work exponent: ")), lines)
    // missing siblings degrade to a usage message, not an exception
    val missing = Main.scalingReport(spark, "q01_scan",
      graft.SparkEntry.queries("q01_scan"), "/tmp")
    assert(missing.head.contains("needs the sibling"), missing)
  }

  test("--audit-lowcard parsing is strict: a valid list parses, a " +
      "missing value errors, a following flag is NOT consumed as the " +
      "column list (the r6 positional-parsing trap)") {
    assert(Main.parseLowCard(Array("q", "dir", "--audit-lowcard",
      "et, lang,")) == Right(Set("et", "lang")))
    assert(Main.parseLowCard(Array("q", "dir")) == Right(Set.empty))
    assert(Main.parseLowCard(Array("q", "dir", "--audit-lowcard"))
      .isLeft)
    assert(Main.parseLowCard(Array("q", "dir", "--audit-lowcard",
      "--audit")).isLeft)
  }
}
