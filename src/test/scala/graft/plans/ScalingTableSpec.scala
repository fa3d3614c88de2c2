package graft.plans

import org.scalatest.funsuite.AnyFunSuite

/** The checked-in scaling-exponent table (`scaling_exponents.json`,
  * written by `graft.ScalingSweep`) stays coherent with the code:
  * it exists, covers the full risk list, every FITTED exponent
  * respects its bound (or carries full regime evidence), and — the
  * r10 lesson — every committed fit is REPRODUCIBLE under the
  * CURRENT audit floors from its own recorded points, so a table
  * written under older, laxer rules cannot be recommitted (the r10
  * table carried a q22_dedup_embed fit whose rung-1 sample spread
  * the later spread floor refuses). This is the drift gate's
  * committed half; the live half is `ScalingSweep --check`. */
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
      "partitions control that measured EVERY rung and dropped or " +
      "genuinely flattened); a committed quadratic, or an advisory " +
      "leaning on a noisy/partial control, fails by name") {
    val fitted = graft.ScalingSweep.readTable(raw)
    assert(fitted.nonEmpty, "no fitted exponents in the table — the " +
      "work metric should fit most of the risk list; regenerate")
    val rowExps = readRowExponents(raw)
    val sizesOf = readPoints(raw).map { case (n, (_, sz, _, _)) => n -> sz }
    val controls = deriveControls(raw, sizesOf,
      "control_work", "control_work_spread")
    val strategies = deriveControls(raw, sizesOf,
      "nobroadcast_work", "nobroadcast_work_spread")
    val over = fitted.filter { case (name, e) =>
      val bound = graft.ScalingSweep.bounds.getOrElse(name, 1.6)
      // each control's evidence is RE-DERIVED here from its own
      // recorded work/spread points (same floors as the primary
      // refit) — points, exponent, AND the flattened flag: the r11
      // ADVICE's laundering residual was that a hand-edited or stale
      // control SUMMARY (points/flattened/exponent with no underlying
      // measurements) could still downgrade an over-bound committed
      // fit. An entry without recorded control points (legacy table)
      // derives nothing and supports nothing, forcing regeneration.
      // EITHER mechanism control may exculpate: scaled partitions
      // (working-set step) or no-broadcast (planner flip).
      def okIn(m: Map[String, Control]) = m.get(name).exists(c =>
        ScalingAudit.controlSupports(e, c.points, c.exponent,
          graft.ScalingData.rungs.size, bound = bound,
          flattened = c.flattened))
      e > bound &&
        (ScalingAudit.regimeFatal(e, bound, rowExps.get(name)) ||
          !(okIn(controls) || okIn(strategies)))
    }
    assert(over.isEmpty,
      "recorded exponents over bound WITHOUT full exculpatory " +
        "evidence (a growth regression was committed into the " +
        "table):\n" + over.map { case (n, e) =>
          f"  $n: $e%.2f > ${graft.ScalingSweep.bounds
            .getOrElse(n, 1.6)}%.2f (rows_exponent: ${rowExps.get(n)}, " +
            s"control: ${controls.get(n)}, nobroadcast: ${
              strategies.get(n)})"
        }.mkString("\n"))
  }

  test("every committed fit is reproducible from its own recorded " +
      "points under the CURRENT floors — re-running fitSized on the " +
      "recorded (work, sizes, work_spread) must yield the recorded " +
      "exponent, so a table written under older, laxer audit rules " +
      "(pre-spread-floor fits, hand-edits) cannot be recommitted") {
    val entries = readPoints(raw)
    assert(entries.nonEmpty, "no parseable entries in the table")
    val stale = entries.flatMap {
      case (name, (work, sizes, spreads, Some(recorded))) =>
        val refit = ScalingAudit.fitSized(work, sizes, spreads = spreads)
        refit match {
          case None => Some(s"$name: recorded exponent $recorded but " +
            "the current floors REFUSE this fit (work " +
            s"${work.mkString(",")} spread ${spreads.mkString(",")})")
          case Some(e) if math.abs(e - recorded) > 0.005 =>
            Some(f"$name: recorded $recorded%.3f but refit gives " +
              f"$e%.3f — the table does not match its own points")
          case _ => None
        }
      case _ => None // unfit entries assert nothing here
    }
    assert(stale.isEmpty,
      "committed fits the current audit rules would not produce " +
        "(regenerate the table under HEAD):\n" + stale.mkString("\n"))
  }

  test("every recorded control SUMMARY field (points / flattened / " +
      "exponent) matches what its own recorded points re-derive under " +
      "the current floors — the display fields must be the evidence, " +
      "not a separate claim") {
    import org.json4s._
    def num(v: JValue): Option[Double] = v match {
      case JDouble(d)  => Some(d)
      case JInt(i)     => Some(i.toDouble)
      case JDecimal(d) => Some(d.toDouble)
      case _           => None
    }
    val sizesOf = readPoints(raw).map { case (n, (_, sz, _, _)) => n -> sz }
    val entries = (org.json4s.jackson.JsonMethods.parse(raw) \ "queries")
      .asInstanceOf[JObject].obj
    val bad = for {
      (prefix, pointsKey, flatKey, expKey) <- Seq(
        ("control", "control_points", "control_flattened",
          "exponent_scaled_partitions"),
        ("nobroadcast", "nobroadcast_points", "nobroadcast_flattened",
          "exponent_no_broadcast"))
      derived = deriveControls(raw, sizesOf,
        s"${prefix}_work", s"${prefix}_work_spread")
      (name, body: JObject) <- entries
      m = body.obj.toMap if m.contains(expKey)
      problem <- {
        derived.get(name) match {
          case None => Seq(s"$name: $expKey recorded with no " +
            s"${prefix}_work/${prefix}_work_spread points to back it")
          case Some(c) =>
            val recPoints = m.get(pointsKey).flatMap(num).map(_.toInt)
            val recFlat = m.get(flatKey).contains(JBool(true))
            val recExp = m.get(expKey).flatMap(num)
            Seq(
              recPoints.filter(_ != c.points).map(p =>
                s"$name: $pointsKey=$p but ${c.points} points recorded"),
              if (recFlat != c.flattened)
                Some(s"$name: $flatKey=$recFlat but points re-derive " +
                  s"${c.flattened}")
              else None,
              (recExp, c.exponent) match {
                case (Some(r), Some(d)) if math.abs(r - d) > 0.005 =>
                  Some(f"$name: $expKey=$r%.3f but points refit $d%.3f")
                case (Some(r), None) =>
                  Some(f"$name: $expKey=$r%.3f but the current floors " +
                    "refuse the recorded control points")
                case (None, Some(d)) =>
                  Some(f"$name: $expKey=null but the points fit $d%.3f")
                case _ => None
              }).flatten
        }
      }
    } yield problem
    assert(bad.isEmpty,
      "control summary fields diverge from their own recorded points " +
        "(hand edit or stale table — regenerate under HEAD):\n" +
        bad.mkString("\n"))
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

  test("every rows-BOUNDED entry (ScalingSweep.rowsBounds — the " +
      "recorded backstop behind the widened definitional work bounds) " +
      "records its rows measurement, the bound itself, and a fitted " +
      "rows exponent AT OR UNDER that bound; the recorded bound must " +
      "equal the code's map and the exponent must re-derive from the " +
      "recorded rows/sizes — a gate on the committed table, not " +
      "scaladoc prose") {
    import org.json4s._
    def num(v: JValue): Option[Double] = v match {
      case JDouble(d)  => Some(d)
      case JInt(i)     => Some(i.toDouble)
      case JDecimal(d) => Some(d.toDouble)
      case _           => None
    }
    def longs(v: JValue): Option[Seq[Long]] = v match {
      case JArray(xs) =>
        val ls = xs.flatMap(num).map(_.toLong)
        if (ls.size == xs.size) Some(ls) else None
      case _ => None
    }
    val entries = (org.json4s.jackson.JsonMethods.parse(raw) \ "queries")
      .asInstanceOf[JObject].obj.collect {
        case (name, body: JObject) => name -> body.obj.toMap
      }.toMap
    val problems = graft.ScalingSweep.rowsBounds.toSeq.sortBy(_._1)
      .flatMap { case (name, bound) =>
        entries.get(name) match {
          case None => Seq(s"$name: rows-bounded entry absent from " +
            "the table — regenerate with graft.ScalingSweep")
          case Some(m) =>
            val rows = m.get("rows").flatMap(longs)
            val sizes = m.get("sizes").flatMap(longs)
            val recBound = m.get("rows_bound").flatMap(num)
            val recExp = m.get("rows_exponent").flatMap(num)
            Seq(
              if (rows.isEmpty)
                Some(s"$name: no recorded rows measurement — the " +
                  "backstop its widened work bound leans on is missing")
              else None,
              if (!recBound.exists(b => math.abs(b - bound) < 1e-9))
                Some(s"$name: recorded rows_bound $recBound != the " +
                  s"code's rowsBounds value $bound")
              else None,
              (recExp, rows, sizes) match {
                case (None, _, _) =>
                  Some(s"$name: no fitted rows_exponent — rows are " +
                    "exact, a refusal means a failed rung or a " +
                    "degenerate ladder; regenerate")
                case (Some(e), _, _) if e > bound =>
                  Some(f"$name: rows_exponent $e%.3f > rows bound " +
                    f"$bound%.2f — a materialized candidate blowup " +
                    "was committed into the table")
                case (Some(e), Some(r), Some(sz)) =>
                  ScalingAudit.fitRows(r, sz.take(r.size)) match {
                    case Some(d) if math.abs(d - e) <= 0.005 => None
                    case other =>
                      Some(f"$name: recorded rows_exponent $e%.3f " +
                        s"but the recorded rows/sizes refit to $other " +
                        "— the table does not match its own points")
                  }
                case _ => None
              }).flatten
        }
      }
    assert(problems.isEmpty,
      "rows-bound violations in the committed table:\n" +
        problems.mkString("\n"))
  }

  test("every FLOOR-DOCUMENTED entry (ScalingSweep.floorBounds — the " +
      "committed 'flat wall under a recorded work floor, rows exactly " +
      "linear' growth verdict that replaces a bare exponent:null) " +
      "records the floor, the rows bound, a rows measurement whose " +
      "fitted exponent sits at or under the bound and re-derives from " +
      "its own points, and work points all at or under the floor — " +
      "the disposition is a gate on the committed table, so an entry " +
      "whose wall cost grows past its floor cannot silently stay " +
      "unfit") {
    import org.json4s._
    def num(v: JValue): Option[Double] = v match {
      case JDouble(d)  => Some(d)
      case JInt(i)     => Some(i.toDouble)
      case JDecimal(d) => Some(d.toDouble)
      case _           => None
    }
    def longs(v: JValue): Option[Seq[Long]] = v match {
      case JArray(xs) =>
        val ls = xs.flatMap(num).map(_.toLong)
        if (ls.size == xs.size) Some(ls) else None
      case _ => None
    }
    def doubles(v: JValue): Option[Seq[Double]] = v match {
      case JArray(xs) =>
        val ds = xs.flatMap(num)
        if (ds.size == xs.size) Some(ds) else None
      case _ => None
    }
    val entries = (org.json4s.jackson.JsonMethods.parse(raw) \ "queries")
      .asInstanceOf[JObject].obj.collect {
        case (name, body: JObject) => name -> body.obj.toMap
      }.toMap
    val problems = graft.ScalingSweep.floorBounds.toSeq.sortBy(_._1)
      .flatMap { case (name, (workFloor, rowsBound)) =>
        entries.get(name) match {
          case None => Seq(s"$name: floor-documented entry absent " +
            "from the table — regenerate with graft.ScalingSweep")
          case Some(m) =>
            val rows = m.get("rows").flatMap(longs)
            val sizes = m.get("sizes").flatMap(longs)
            val work = m.get("work").flatMap(doubles)
            val recFloor = m.get("work_floor").flatMap(num)
            val recBound = m.get("rows_bound").flatMap(num)
            val recExp = m.get("rows_exponent").flatMap(num)
            Seq(
              if (!recFloor.exists(f => math.abs(f - workFloor) < 1e-9))
                Some(s"$name: recorded work_floor $recFloor != the " +
                  s"code's floorBounds value $workFloor")
              else None,
              if (!recBound.exists(b => math.abs(b - rowsBound) < 1e-9))
                Some(s"$name: recorded rows_bound $recBound != the " +
                  s"code's floorBounds value $rowsBound")
              else None,
              work match {
                case None => Some(s"$name: no recorded work points")
                case Some(ws) => ws.filter(_ > workFloor).sorted
                  .lastOption.map(w =>
                    f"$name: recorded work $w%.3f s over the " +
                      f"documented floor $workFloor%.2f s — the flat-" +
                      "wall half of the committed disposition is " +
                      "stale; re-measure and give the entry a real " +
                      "fit/bound or a ledgered floor raise")
              },
              if (rows.isEmpty)
                Some(s"$name: no recorded rows measurement — the " +
                  "linear-rows half of the disposition is missing")
              else None,
              (recExp, rows, sizes) match {
                case (None, _, _) =>
                  Some(s"$name: no fitted rows_exponent — rows are " +
                    "exact, a refusal means a failed rung or a " +
                    "degenerate ladder; regenerate")
                case (Some(e), _, _) if e > rowsBound =>
                  Some(f"$name: rows_exponent $e%.3f > rows bound " +
                    f"$rowsBound%.2f — the linear-rows verdict no " +
                    "longer holds")
                case (Some(e), Some(r), Some(sz)) =>
                  ScalingAudit.fitRows(r, sz.take(r.size)) match {
                    case Some(d) if math.abs(d - e) <= 0.005 => None
                    case other =>
                      Some(f"$name: recorded rows_exponent $e%.3f " +
                        s"but the recorded rows/sizes refit to $other " +
                        "— the table does not match its own points")
                  }
                case _ => None
              }).flatten
        }
      }
    assert(problems.isEmpty,
      "floor-disposition violations in the committed table:\n" +
        problems.mkString("\n"))
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

  private case class Control(points: Int, exponent: Option[Double],
      flattened: Boolean)

  /** Per-query mechanism-control evidence (scaled-partitions or
    * no-broadcast, selected by the work/spread field names), DERIVED
    * from the control's own recorded measurement points — never read
    * from the entry's summary fields: `points` = the recorded work
    * array's length, `exponent` = a fresh `fitSized` over
    * (control work, the entry's own sizes — the control ran the same
    * dirs/primary table — control spread) under the CURRENT floors,
    * `flattened` = a fresh [[ScalingAudit.flattened]] check when that
    * fit refuses. An entry that records only the summary fields with
    * no points (legacy table, hand edit) derives nothing here — a
    * control that can support nothing, forcing regeneration under
    * HEAD. The summary fields still ride in the artifact for readers;
    * the consistency test below pins them to these derivations. */
  private def deriveControls(json: String, sizesOf: Map[String, Seq[Long]],
      workKey: String, spreadKey: String): Map[String, Control] = {
    import org.json4s._
    def nums(v: JValue): Option[Seq[Double]] = v match {
      case JArray(xs) =>
        val ds = xs.flatMap {
          case JDouble(d)  => Some(d)
          case JInt(i)     => Some(i.toDouble)
          case JDecimal(d) => Some(d.toDouble)
          case _           => None
        }
        if (ds.size == xs.size) Some(ds) else None
      case _ => None
    }
    (org.json4s.jackson.JsonMethods.parse(json) \ "queries") match {
      case JObject(fields) => fields.flatMap {
        case (name, JObject(body)) =>
          val m = body.toMap
          for {
            work <- m.get(workKey).flatMap(nums)
            spread <- m.get(spreadKey).flatMap(nums)
            sizes <- sizesOf.get(name)
          } yield {
            val e = ScalingAudit.fitSized(work,
              sizes.take(work.size), spreads = spread)
            name -> Control(work.size, e,
              e.isEmpty && ScalingAudit.flattened(work,
                sizes.take(work.size)))
          }
        case _ => None
      }.toMap
      case _ => Map.empty
    }
  }

  /** Every entry's recorded (work, sizes, work_spread, exponent) for
    * the refit backstop. Entries missing any of the arrays are
    * skipped (they also fail the coverage/axis tests if material). */
  private def readPoints(json: String)
      : Map[String, (Seq[Double], Seq[Long], Seq[Double], Option[Double])] = {
    import org.json4s._
    def nums(v: JValue): Option[Seq[Double]] = v match {
      case JArray(xs) =>
        val ds = xs.flatMap {
          case JDouble(d)  => Some(d)
          case JInt(i)     => Some(i.toDouble)
          case JDecimal(d) => Some(d.toDouble)
          case _           => None
        }
        if (ds.size == xs.size) Some(ds) else None
      case _ => None
    }
    (org.json4s.jackson.JsonMethods.parse(json) \ "queries") match {
      case JObject(fields) => fields.flatMap {
        case (name, JObject(body)) =>
          val m = body.toMap
          for {
            work <- m.get("work").flatMap(nums)
            sizes <- m.get("sizes").flatMap(nums)
            spread <- m.get("work_spread").flatMap(nums)
          } yield name -> ((work, sizes.map(_.toLong), spread,
            m.get("exponent").flatMap {
              case JDouble(d)  => Some(d)
              case JInt(i)     => Some(i.toDouble)
              case JDecimal(d) => Some(d.toDouble)
              case _           => None
            }))
        case _ => None
      }.toMap
      case _ => Map.empty
    }
  }
}
