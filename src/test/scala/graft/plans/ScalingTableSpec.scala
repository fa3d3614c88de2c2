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

  test("every fitted exponent in the table respects its bound — or " +
      "carries the regime-pass evidence (linear row growth, work " +
      "within the margin) that downgrades it to constant-regime " +
      "drift; a committed quadratic fails by name") {
    val fitted = graft.ScalingSweep.readTable(raw)
    assert(fitted.nonEmpty, "no fitted exponents in the table — the " +
      "work metric should fit most of the risk list; regenerate")
    val rowExps = readRowExponents(raw)
    val over = fitted.filter { case (name, e) =>
      val bound = graft.ScalingSweep.bounds.getOrElse(name, 1.6)
      e > bound && ScalingAudit.regimeFatal(e, bound, rowExps.get(name))
    }
    assert(over.isEmpty,
      "recorded exponents over bound WITHOUT exculpatory row-growth " +
        "evidence (a growth regression was committed into the " +
        "table):\n" + over.map { case (n, e) =>
          f"  $n: $e%.2f > ${graft.ScalingSweep.bounds
            .getOrElse(n, 1.6)}%.2f (rows_exponent: ${rowExps.get(n)})"
        }.mkString("\n"))
  }

  /** Per-query `rows_exponent` values (regime-pass evidence) out of
    * the committed table. */
  private def readRowExponents(json: String): Map[String, Double] = {
    import org.json4s._
    (org.json4s.jackson.JsonMethods.parse(json) \ "queries") match {
      case JObject(fields) => fields.collect {
        case (name, JObject(body)) =>
          body.collectFirst {
            case ("rows_exponent", JDouble(e))  => name -> e
            case ("rows_exponent", JInt(e))     => name -> e.toDouble
            case ("rows_exponent", JDecimal(e)) => name -> e.toDouble
          }
      }.flatten.toMap
      case _ => Map.empty
    }
  }
}
