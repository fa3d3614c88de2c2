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

  test("the table covers every entry the sweep measures — the risk " +
      "list AND the heaps variants (fitted or explicitly unfit — " +
      "silence is not coverage)") {
    val missing = graft.ScalingSweep.allEntries
      .filterNot(q => raw.contains("\"" + q + "\""))
    assert(missing.isEmpty,
      s"sweep entries absent from the table: $missing — " +
        "regenerate with graft.ScalingSweep")
  }

  test("every fitted exponent in the table respects its bound — or " +
      "carries the FULL regime-pass evidence (linear row growth, work " +
      "within margin and under the absolute cap, AND a scaled-" +
      "partitions control fit that dropped) downgrading it to " +
      "constant-regime drift; a committed quadratic fails by name") {
    val fitted = graft.ScalingSweep.readTable(raw)
    assert(fitted.nonEmpty, "no fitted exponents in the table — the " +
      "work metric should fit most of the risk list; regenerate")
    val rowExps = readRowExponents(raw)
    val controls = readControls(raw)
    val over = fitted.filter { case (name, e) =>
      val bound = graft.ScalingSweep.bounds.getOrElse(name, 1.6)
      def controlOk = controls.get(name).exists(c =>
        ScalingAudit.controlSupports(e, graft.ScalingData.rungs.size,
          c, graft.ScalingData.rungs.size, bound = bound))
      e > bound &&
        (ScalingAudit.regimeFatal(e, bound, rowExps.get(name)) || !controlOk)
    }
    assert(over.isEmpty,
      "recorded exponents over bound WITHOUT full exculpatory " +
        "evidence (a growth regression was committed into the " +
        "table):\n" + over.map { case (n, e) =>
          f"  $n: $e%.2f > ${graft.ScalingSweep.bounds
            .getOrElse(n, 1.6)}%.2f (rows_exponent: ${rowExps.get(n)}, " +
            s"control: ${controls.get(n)})"
        }.mkString("\n"))
  }

  test("every entry carries at least one measured growth axis — a " +
      "fitted WORK exponent, or (when work is honestly unfittable at " +
      "this host's sampling noise) a fitted ROWS exponent: 'no " +
      "signal' may describe the work metric, never the entry") {
    import org.json4s._
    val entries = (org.json4s.jackson.JsonMethods.parse(raw) \ "queries")
      .asInstanceOf[JObject].obj
    val blind = entries.collect {
      case (name, body: JObject)
          if !body.obj.exists { case (k, v) =>
            (k == "exponent" || k == "rows_exponent") &&
              (v.isInstanceOf[JDouble] || v.isInstanceOf[JInt] ||
                v.isInstanceOf[JDecimal])
          } => name
    }
    assert(blind.isEmpty,
      s"entries with neither a work nor a rows growth fit: $blind")
  }

  test("the heaps variants carry FITTED exponents under the default " +
      "bound — the natural-text growth numbers the corpus-bound " +
      "exponents defer to must exist and be sub-quadratic, not " +
      "all-overhead") {
    val fitted = graft.ScalingSweep.readTable(raw)
    for (e <- graft.ScalingSweep.heapsList) {
      val entry = e + "@heaps"
      val exp = fitted.get(entry)
      assert(exp.nonEmpty, s"$entry has no fitted exponent — the " +
        "Heaps ladder exists to measure exactly this entry")
      assert(exp.get <= 1.6, s"$entry fitted ${exp.get} > 1.6: the " +
        "natural-text pruning claim does not hold — investigate the " +
        "prefix filter before re-documenting a bound")
    }
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

  /** Per-query scaled-partitions control evidence: present iff the
    * control ran (the `exponent_scaled_partitions` key exists), with
    * None = the control flattened below the noise floor. */
  private def readControls(json: String): Map[String, Option[Double]] = {
    import org.json4s._
    (org.json4s.jackson.JsonMethods.parse(json) \ "queries") match {
      case JObject(fields) => fields.collect {
        case (name, JObject(body)) =>
          body.collectFirst {
            case ("exponent_scaled_partitions", JDouble(e)) =>
              name -> Option(e)
            case ("exponent_scaled_partitions", JInt(e)) =>
              name -> Option(e.toDouble)
            case ("exponent_scaled_partitions", JDecimal(e)) =>
              name -> Option(e.toDouble)
            case ("exponent_scaled_partitions", JNull) =>
              name -> Option.empty[Double]
          }
      }.flatten.toMap
      case _ => Map.empty
    }
  }
}
