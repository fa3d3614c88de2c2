package graft.plans

import org.scalatest.funsuite.AnyFunSuite

/** The checked-in scaling-exponent table (`scaling_exponents.json`,
  * written by `graft.ScalingSweep`) stays coherent with the code:
  * it exists, covers the full risk list, and every FITTED exponent
  * respects its bound — so regenerating the table after a change that
  * worsened growth fails here by query name (the drift gate's
  * committed half; the live half is `ScalingSweep --check`). */
class ScalingTableSpec extends AnyFunSuite {

  private lazy val raw: String = {
    val p = java.nio.file.Paths.get("scaling_exponents.json")
    assert(java.nio.file.Files.isRegularFile(p),
      "scaling_exponents.json missing — run `sbt \"runMain " +
        "graft.ScalingSweep\"` to regenerate the table")
    new String(java.nio.file.Files.readAllBytes(p), "UTF-8")
  }

  test("the table covers every risk-list query (fitted or explicitly " +
      "unfit — silence is not coverage)") {
    val missing = graft.ScalingSweep.riskList
      .filterNot(q => raw.contains("\"" + q + "\""))
    assert(missing.isEmpty,
      s"risk-list queries absent from the table: $missing — " +
        "regenerate with graft.ScalingSweep")
  }

  test("every fitted exponent in the table respects its bound — no " +
      "risk-list query grows super-linearly beyond its documented " +
      "design") {
    val fitted = graft.ScalingSweep.readTable(raw)
    assert(fitted.nonEmpty, "no fitted exponents in the table — the " +
      "work metric should fit most of the risk list; regenerate")
    val over = fitted.filter { case (name, e) =>
      e > graft.ScalingSweep.bounds.getOrElse(name, 1.6)
    }
    assert(over.isEmpty,
      "recorded exponents over bound (a growth regression was " +
        "committed into the table):\n" + over.map { case (n, e) =>
          f"  $n: $e%.2f > ${graft.ScalingSweep.bounds
            .getOrElse(n, 1.6)}%.2f" }.mkString("\n"))
  }
}
