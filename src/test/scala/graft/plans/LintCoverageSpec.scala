package graft.plans

import org.scalatest.funsuite.AnyFunSuite

/** LINT-COVERAGE COMPLETENESS — the meta-invariant over the audit
  * tooling itself: every finding kind the lints can emit must be (a)
  * exercised by at least one positive control in a spec (it demonstrably
  * FIRES on a bad plan) and (b) produced by an audit method some
  * repo-wide sweep actually invokes (detection that nothing sweeps is
  * dead code wearing a seatbelt). Until this spec, both held by hand;
  * now a future finding kind cannot ship detection-only — adding a
  * `val NewKind = "..."` to an audit object without a firing control
  * and a sweep hookup fails here by name. */
class LintCoverageSpec extends AnyFunSuite {

  private def read(path: String): String = {
    val p = java.nio.file.Paths.get(path)
    assert(java.nio.file.Files.isRegularFile(p),
      s"missing source file: $path (cwd ${System.getProperty("user.dir")})")
    new String(java.nio.file.Files.readAllBytes(p), "UTF-8")
  }

  private val auditSources = Seq(
    "src/main/scala/graft/plans/PlanAudit.scala",
    "src/main/scala/graft/plans/StreamAudit.scala",
    "src/main/scala/graft/plans/ScalingAudit.scala")

  /** Finding-kind constants declared in the audit objects:
    * `val CamelName = "kebab-name"`. */
  private def declaredKinds: Seq[(String, String, String)] = {
    val decl = """val\s+([A-Z]\w*)\s*=\s*"([a-z][a-z0-9-]*)"""".r
    auditSources.flatMap { src =>
      decl.findAllMatchIn(read(src)).map(m =>
        (src, m.group(1), m.group(2)))
    }
  }

  private def testFiles: Seq[java.nio.file.Path] = {
    val root = java.nio.file.Paths.get("src/test/scala/graft")
    val buf = scala.collection.mutable.Buffer[java.nio.file.Path]()
    java.nio.file.Files.walk(root).forEach(p =>
      if (p.toString.endsWith(".scala")) buf += p)
    buf.toSeq
  }

  test("every declared finding kind has a positive control: some spec " +
      "references the constant (asserting it fires / allowlisting it " +
      "with a reason) — a kind no test can name is detection-only") {
    val kinds = declaredKinds
    assert(kinds.size >= 11, s"kind extraction broke? found: $kinds")
    val testText = testFiles.map(p => p -> new String(
      java.nio.file.Files.readAllBytes(p), "UTF-8"))
    val uncovered = kinds.filter { case (_, const, kebab) =>
      !testText.exists { case (p, txt) =>
        // the constant reference (PlanAudit.CartesianJoin) or the
        // literal kind string in an assertion/allowlist — excluding
        // this meta-spec itself
        !p.getFileName.toString.contains("LintCoverageSpec") &&
          (txt.contains(const) || txt.contains("\"" + kebab + "\"") ||
            txt.contains(s"[$kebab]"))
      }
    }
    assert(uncovered.isEmpty,
      "finding kinds with NO test reference (add a firing positive " +
        "control):\n" + uncovered.map { case (src, c, k) =>
          s"  $c (\"$k\") declared in $src" }.mkString("\n"))
  }

  /** producer method → the sweep file(s), at least one of which must
    * invoke it repo-wide. Main-source sweeps (ScalingSweep, the CLI)
    * count where the sweep IS a main (the scaling sweep runs as a
    * round artifact, pinned by ScalingTableSpec). */
  private val sweepHookups: Seq[(String, String, Seq[String])] = Seq(
    ("PlanAudit.audit", "cartesian/nested-loop/window/scala-udf",
      Seq("src/test/scala/graft/queries/PlanShapeSpec.scala",
        "src/test/scala/graft/plans/PlanAuditSweepSpec.scala")),
    // the repo-wide measured sweeps fold the raw PRODUCERS with
    // cap-verified allowlists (richer than the default folds)
    ("windowCardinalities", "measured window-skew producer",
      Seq("src/test/scala/graft/plans/PlanAuditSweepSpec.scala")),
    ("joinCardinalities", "measured join-blowup producer",
      Seq("src/test/scala/graft/plans/PlanAuditSweepSpec.scala")),
    ("checkpointProfiles", "measured checkpoint-pin producer",
      Seq("src/test/scala/graft/plans/PlanAuditSweepSpec.scala")),
    ("auditUnprunedScans", "scan pruning",
      Seq("src/test/scala/graft/plans/PlanAuditSweepSpec.scala")),
    // the default finding FOLDS ship through the CLI's measured audit
    ("auditSkewedWindowsByData", "measured window-skew fold (CLI)",
      Seq("src/main/scala/graft/cli/Main.scala")),
    ("auditJoinExplosion", "measured join-blowup fold (CLI)",
      Seq("src/main/scala/graft/cli/Main.scala")),
    ("auditWideCheckpoints", "measured checkpoint-pin fold (CLI)",
      Seq("src/main/scala/graft/cli/Main.scala")),
    ("StreamAudit.audit", "streaming state",
      Seq("src/test/scala/graft/plans/StreamAuditSpec.scala")),
    ("auditExponents", "scaling exponents",
      Seq("src/main/scala/graft/ScalingSweep.scala")),
    ("rowsBoundFindings", "rows-bound gate (exact-rows backstop)",
      Seq("src/main/scala/graft/ScalingSweep.scala")),
    ("floorFindings", "work-floor gate (floor-documented entries)",
      Seq("src/main/scala/graft/ScalingSweep.scala")))

  test("every audit producer is invoked by its repo-wide sweep — " +
      "detection without a sweep guards nothing") {
    val missing = sweepHookups.filter { case (method, _, files) =>
      !files.exists(f => read(f).contains(method))
    }
    assert(missing.isEmpty,
      "audit producers no sweep invokes:\n" + missing.map {
        case (m, what, fs) =>
          s"  $m ($what) — expected in ${fs.mkString(" or ")}"
      }.mkString("\n"))
  }
}
