package graft.plans

import graft.SparkSpec

/** ScalingAudit — the exponent fit is exact on its own model (the
  * overhead term cancels in first differences), refuses to fit noise,
  * and the finding folds / drift checks enforce the bounds. The live
  * three-SF sweep lives in graft.ScalingSweep (minutes, not a unit
  * test); here one real measurement pins the plumbing end-to-end. */
class ScalingAuditSpec extends SparkSpec {

  private def t(c: Double, a: Double, e: Double)(n: Double): Double =
    c + a * math.pow(n, e)

  test("fitExponent recovers the exact exponent of t = c + a*n^e — " +
      "the per-query overhead cancels in first differences") {
    for (e <- Seq(0.5, 1.0, 1.3, 2.0); c <- Seq(0.0, 5.0)) {
      val f = t(c, 0.4, e) _
      val got = ScalingAudit.fitExponent(f(1), f(10), f(100),
        noiseFloorSec = 1e-9).get
      assert(math.abs(got - e) < 1e-9, s"e=$e c=$c got $got")
    }
  }

  test("fitExponent refuses to fit when a first difference is below " +
      "the noise floor — an all-overhead query carries no signal, and " +
      "the RELATIVE floor keeps a big fixed kernel cost's jitter from " +
      "wearing a trend") {
    // flat: 2.0s at every SF (pure overhead)
    assert(ScalingAudit.fitExponent(2.0, 2.05, 2.1).isEmpty)
    // only the last point moves: d1 (0.08) below the 0.1 floor
    assert(ScalingAudit.fitExponent(2.0, 2.08, 4.0).isEmpty)
    // negative difference (noise) never fits
    assert(ScalingAudit.fitExponent(2.0, 1.5, 4.0).isEmpty)
    // both diffs clear the floor: fits
    assert(ScalingAudit.fitExponent(2.0, 2.5, 7.0).nonEmpty)
    // relative floor: d1 = 0.4 clears the absolute 0.1 but is under
    // 5% of the 10s base — the q22_dedup_keep_best failure shape
    assert(ScalingAudit.fitExponent(10.0, 10.4, 20.0).isEmpty)
    assert(ScalingAudit.fitExponent(10.0, 11.0, 20.0).nonEmpty)
  }

  test("the SPREAD floor refuses a difference smaller than its own " +
      "endpoints' sample scatter — the q41_pagerank failure shape: " +
      "d1 = 0.107s between points whose samples scattered 2x 'fit' a " +
      "confidently wrong 2.10") {
    // the real numbers: work [0.763, 0.870, 14.390], spreads
    // [1.900, 2.057, 1.449] — d1 = 0.107 clears the absolute floor
    // but not the 0.46 endpoint scatter; refused
    assert(ScalingAudit.fitSized(
      Seq(0.763, 0.870, 14.390), Seq(15000L, 150000L, 1500000L),
      spreads = Seq(1.900, 2.057, 1.449)).isEmpty)
    // the same work values with TIGHT samples fit (the difference is
    // now evidence, however small)
    assert(ScalingAudit.fitSized(
      Seq(0.763, 0.870, 14.390), Seq(15000L, 150000L, 1500000L),
      spreads = Seq(1.05, 1.05, 1.05)).nonEmpty)
    // no spreads (legacy caller / single-sample runs): unchanged
    assert(ScalingAudit.fitSized(
      Seq(0.763, 0.870, 14.390), Seq(15000L, 150000L, 1500000L)).nonEmpty)
    // fitExponent honors the same floor
    assert(ScalingAudit.fitExponent(0.763, 0.870, 14.390,
      spreads = Seq(1.900, 2.057, 1.449)).isEmpty)
    // the floor is per-difference: a noisy SMALL pair with a huge d1
    // still fits (scatter 0.9*0.2*0.5 = 0.09 << d1 = 2.0)
    assert(ScalingAudit.fitExponent(0.2, 2.2, 22.0,
      spreads = Seq(1.9, 1.1, 1.1)).nonEmpty)
  }

  private def pts(ts: Double*): Seq[ScalingAudit.Point] =
    ts.zipWithIndex.map { case (t, i) =>
      ScalingAudit.Point(s"sf$i", t, t) }.toSeq

  test("auditExponents flags only fitted exponents above their bound, " +
      "honoring per-query overrides for documented super-linear " +
      "designs") {
    val fits = Seq(
      ScalingAudit.ScalingFit("lin", pts(1.0, 2.0, 12.0), Some(1.0)),
      ScalingAudit.ScalingFit("quad", pts(1.0, 2.0, 101.0), Some(2.0)),
      ScalingAudit.ScalingFit("n15", pts(1.0, 2.0, 46.0), Some(1.65)),
      ScalingAudit.ScalingFit("unfit", pts(1.0, 1.0, 1.0), None))
    val found = ScalingAudit.auditExponents(fits,
      bounds = Map("n15" -> 1.7))
    assert(found.map(_.kind).distinct == Seq(ScalingAudit.SuperlinearScaling))
    assert(found.size == 1 && found.head.detail.startsWith("quad:"),
      found)
    // without the override, the documented n^1.5 design would trip too
    assert(ScalingAudit.auditExponents(fits).size == 2)
  }

  test("driftFindings fires on upward drift beyond tolerance and on a " +
      "newly-fitted exponent above bound; getting faster or sinking " +
      "into overhead is never drift") {
    val rec = Map("a" -> 1.0, "b" -> 1.2, "c" -> 1.1)
    val fresh = Seq(
      ScalingAudit.ScalingFit("a", Nil, Some(1.5)),  // drifted +0.5
      ScalingAudit.ScalingFit("b", Nil, Some(1.3)),  // +0.1 within tol
      ScalingAudit.ScalingFit("c", Nil, None),       // sank into overhead
      ScalingAudit.ScalingFit("d", Nil, Some(1.9)),  // new, over bound
      ScalingAudit.ScalingFit("e", Nil, Some(1.2)))  // new, under bound
    // (points are irrelevant to drift logic — Nil keeps the fixture
    // focused on the exponent transitions)
    val found = ScalingAudit.driftFindings(rec, fresh)
    assert(found.size == 2, found)
    assert(found.exists(_.detail.startsWith("a:")), found)
    assert(found.exists(_.detail.startsWith("d:")), found)
  }

  test("measure returns per-directory wall AND work minima on a real " +
      "query — the task-time listener actually accumulates (the " +
      "plumbing: noop materialization, listener drain, ordering)") {
    val points = ScalingAudit.measure(spark,
      graft.SparkEntry.queries("q01_scan"), Seq(sfDir), runs = 1)
    assert(points.size == 1 && points.head.dir == sfDir, points)
    assert(points.head.wallSec > 0, points)
    assert(points.head.workSec > 0, // listener saw the tasks
      s"work metric empty — listener drain broken? $points")
  }

  test("LIVE mini-gate: three cheap risk-list queries run the real " +
      "three-SF fit every test round — all points measured (a query " +
      "that stops running at some scale fails here, not at the next " +
      "manual sweep), and any FITTED exponent stays far from " +
      "quadratic. The bound is deliberately loose (1.8 vs the sweep's " +
      "1.6): min-of-2 sampling noise adds up to ~0.2 to a true ~1.1, " +
      "and the full-rigor bound belongs to ScalingSweep/--check, not " +
      "a unit test") {
    val parent = java.nio.file.Paths.get(sfDir).toAbsolutePath.getParent
    val dirs = Seq("sf0.001", "sf0.01", "sf0.1").map(s =>
      parent.resolve(s)).filter(java.nio.file.Files.isDirectory(_))
      .map(_.toString)
    assume(dirs.size == 3, s"need all three scale dirs, found $dirs")
    val offenders = Seq("q19j_theilsen", "q28_skew_join", "q37_hierarchy")
      .flatMap { name =>
        val f = ScalingAudit.fit(spark, name,
          graft.SparkEntry.queries(name), dirs)
        val fails = ScalingAudit.auditMeasurementFailures(Seq(f), 3) ++
          ScalingAudit.auditExponents(Seq(f), defaultBound = 1.8)
        fails.map(x => s"$name: [${x.kind}] ${x.detail}")
      }
    assert(offenders.isEmpty, offenders.mkString("\n"))
  }

  test("fitSized fits only across two near-equal MEASURED growth " +
      "steps — the fixture's documents table (500/500/5000) and " +
      "embeddings (500/500/2000) make the first 'decade' identical " +
      "input, whose first difference is pure noise, not growth") {
    // valid 10x/10x steps: exact closed form, any equal ratio
    assert(math.abs(ScalingAudit.fitSized(
      Seq(1.0, 2.0, 12.0), Seq(600, 6000, 60000)).get - 1.0) < 1e-9)
    // 3x/3x steps fit too (the form generalizes past decades)
    val t3 = Seq(1.0, 1.0 + 0.9, 1.0 + 0.9 + 2.7) // e=1 at r=3
    assert(math.abs(ScalingAudit.fitSized(
      t3, Seq(100, 300, 900)).get - 1.0) < 1e-9)
    // documents shape: flat first step refuses even with big diffs
    assert(ScalingAudit.fitSized(
      Seq(1.0, 2.0, 12.0), Seq(500, 500, 5000)).isEmpty)
    // embeddings shape: unequal steps (1x then 4x) refuse
    assert(ScalingAudit.fitSized(
      Seq(1.0, 2.0, 12.0), Seq(500, 500, 2000)).isEmpty)
    // unequal non-degenerate steps (10x then 3x) refuse rather than
    // approximate (c no longer cancels)
    assert(ScalingAudit.fitSized(
      Seq(1.0, 2.0, 12.0), Seq(100, 1000, 3000)).isEmpty)
    // shrinking or missing sizes refuse
    assert(ScalingAudit.fitSized(
      Seq(1.0, 2.0, 12.0), Seq(1000, 100, 10000)).isEmpty)
    assert(ScalingAudit.fitSized(Seq(1.0, 2.0, 12.0), Nil).isEmpty)
    // the noise floors still apply on valid steps
    assert(ScalingAudit.fitSized(
      Seq(2.0, 2.05, 2.1), Seq(600, 6000, 60000)).isEmpty)
  }

  test("the sweep's risk list is a subset of the inventory, every " +
      "risk query has a primary-table mapping (the fit's scale axis), " +
      "and the bound overrides only name risk-list queries") {
    val missing =
      graft.ScalingSweep.riskList.filterNot(graft.SparkEntry.queries.contains)
    assert(missing.isEmpty, s"risk list not in inventory: $missing")
    val unmapped = graft.ScalingSweep.riskList
      .filterNot(graft.ScalingSweep.primaryTable.contains)
    assert(unmapped.isEmpty, s"risk queries without a primary table " +
      s"(their fit would silently assume 10x steps): $unmapped")
    val validTables = graft.Tables.names.toSet
    val badTables = graft.ScalingSweep.primaryTable.values
      .filterNot(validTables)
    assert(badTables.isEmpty, s"unknown tables in the scale map: $badTables")
    val strayBounds = graft.ScalingSweep.bounds.keys
      .filterNot(graft.ScalingSweep.riskList.contains)
    assert(strayBounds.isEmpty, s"bounds for non-risk queries: $strayBounds")
    // heaps variants: each strips to an inventory query with a
    // primary-table mapping, routes to the heaps ladder, and carries
    // NO bound override (the natural-text fit answers to the default
    // bound — that is the point of measuring it)
    for (e <- graft.ScalingSweep.heapsList) {
      val entry = e + "@heaps"
      assert(graft.ScalingSweep.allEntries.contains(entry), entry)
      assert(graft.ScalingSweep.queryOf(entry) == e, entry)
      assert(graft.SparkEntry.queries.contains(e), e)
      assert(graft.ScalingSweep.primaryTable.contains(e), e)
      assert(graft.ScalingSweep.ladderOf(entry) == "heaps", entry)
      assert(!graft.ScalingSweep.bounds.contains(entry), entry)
    }
  }

  test("the regime rule's row half: over-bound work stays FATAL when " +
      "rows are unfit or super-linear, the excess beats the margin, " +
      "or the absolute exponent reaches the cap; linear rows within " +
      "margin and under the cap make a downgrade CANDIDATE") {
    // linear rows, small excess → candidate (not row-fatal)
    assert(!ScalingAudit.regimeFatal(1.8, 1.6, Some(1.05)))
    // rows themselves quadratic (candidate blowup) → fatal
    assert(ScalingAudit.regimeFatal(1.8, 1.6, Some(1.95)))
    // no row fit → no exculpatory evidence → fatal
    assert(ScalingAudit.regimeFatal(1.8, 1.6, None))
    // linear rows but work way past the margin → fatal anyway
    assert(ScalingAudit.regimeFatal(2.3, 1.6, Some(1.0)))
    // ABSOLUTE CAP: an effectively-quadratic fit is never waved
    // through on row evidence alone, even inside the margin — the
    // compute-bound quadratic class (per-group O(n_g²) kernels,
    // in-task rescans) has linear rows and near-2 work
    assert(ScalingAudit.regimeFatal(1.95, 1.6, Some(1.0)))
    assert(ScalingAudit.regimeFatal(1.9, 1.8, Some(1.0)))
    assert(!ScalingAudit.regimeFatal(1.89, 1.8, Some(1.0)))
  }

  test("the scaled-partitions control has the final word on a " +
      "downgrade: a full-rung control whose exponent dropped by the " +
      "minimum (or sank below the noise floor) supports; a held " +
      "exponent or a failed control refutes") {
    // dropped 1.8 → 1.65: the per-task working-set mechanism confirmed
    assert(ScalingAudit.controlSupports(1.8, 3, Some(1.65), nDirs = 3))
    // sank below the noise floor entirely — and the caller VERIFIED
    // the refusal cause was genuine flattening: the strongest drop
    assert(ScalingAudit.controlSupports(1.8, 3, None, nDirs = 3,
      flattened = true))
    // unfit control WITHOUT verified flattening (fit refused by its
    // own samples' scatter or a degenerate size axis): noisy evidence
    // must not launder a fatal finding into an advisory
    assert(!ScalingAudit.controlSupports(1.8, 3, None, nDirs = 3))
    // held at 1.75 (< the 0.1 minimum drop): algorithmic growth
    assert(!ScalingAudit.controlSupports(1.8, 3, Some(1.75), nDirs = 3))
    // control failed to measure every rung: no evidence, no downgrade
    assert(!ScalingAudit.controlSupports(1.8, 2, Some(1.2), nDirs = 3))
    // the BOUND clause: a marginal 1.62-vs-1.60 fit whose control
    // lands at 1.54 — under the bound itself — supports even though
    // the drop (0.08) misses the minimum; the same control value
    // without the bound in evidence refutes
    assert(ScalingAudit.controlSupports(1.62, 3, Some(1.54), nDirs = 3,
      bound = 1.6))
    assert(!ScalingAudit.controlSupports(1.62, 3, Some(1.54), nDirs = 3))
    // ...but a control still OVER the bound needs the full drop
    assert(!ScalingAudit.controlSupports(1.72, 3, Some(1.65), nDirs = 3,
      bound = 1.6))
  }

  test("flattened distinguishes the fit-refusal causes: true only " +
      "when every first difference sits below the absolute/relative " +
      "floor ALONE — a spread-floor or size-axis refusal is noise, " +
      "not flattening") {
    val sizes = Seq(1000L, 10000L, 100000L)
    // genuinely flat: differences 0.03s / 0.05s under the 0.1s floor
    assert(ScalingAudit.flattened(Seq(1.00, 1.03, 1.08), sizes))
    // a real data term: d2 = 2.0s is signal, not flatness — this fit
    // would only have been refused by spread/size rules, so an unfit
    // control here supports nothing
    assert(!ScalingAudit.flattened(Seq(1.0, 1.5, 3.5), sizes))
    // one flat difference + one live one: ambiguous, not flattening
    assert(!ScalingAudit.flattened(Seq(1.0, 1.05, 3.0), sizes))
    // degenerate size axis (the fixture's 500/500/2000 documents):
    // whatever the times say, the axis carries no growth evidence
    assert(!ScalingAudit.flattened(Seq(1.00, 1.03, 1.08),
      Seq(500L, 500L, 2000L)))
    // relative floor: a 20s-base query's 0.6s differences are inside
    // the 5% sampling jitter — flat at that magnitude
    assert(ScalingAudit.flattened(Seq(20.0, 20.6, 21.1), sizes))
    // fewer than 3 points: no claim
    assert(!ScalingAudit.flattened(Seq(1.0, 1.01), Seq(10L, 100L)))
  }

  test("the advisory finding fires with the constant-regime-drift " +
      "kind, a structural subject, and carries the rows AND control " +
      "evidence inline — the firing positive control for " +
      "ScalingAudit.RegimeDrift") {
    val f = ScalingAudit.regimeFinding("q41b_lpa", 1.62, 1.6,
      Seq(4500L, 45000L, 450000L), Some(1.0), Some(1.45),
      "at 256 shuffle partitions")
    assert(f.kind == ScalingAudit.RegimeDrift)
    assert(f.subject == "q41b_lpa")
    assert(f.detail.contains("1.62") && f.detail.contains("1.00") &&
      f.detail.contains("4500 -> 45000 -> 450000") &&
      f.detail.contains("256") && f.detail.contains("1.45"), f.detail)
    // a control that flattened below the floor reads as such
    val g = ScalingAudit.regimeFinding("q", 1.7, 1.6,
      Seq(1L, 2L, 3L), Some(1.0), None, "at 256 shuffle partitions")
    assert(g.detail.contains("below the noise floor"), g.detail)
    // a drift-origin advisory whose exponent sits UNDER the bound
    // must not claim 'over bound' (q27_shuffle drifted 0.66 -> 1.19
    // against a 1.6 bound — the text was literally false)
    val h = ScalingAudit.regimeFinding("q27_shuffle", 1.19, 1.6,
      Seq(1L, 2L, 3L), Some(0.95), Some(1.04),
      "with the broadcast threshold disabled (join strategy held)")
    assert(!h.detail.contains("over bound") &&
      h.detail.contains("drifted above its recorded fit"), h.detail)
  }

  test("every scaling finding carries its query as a structural " +
      "subject — the sweep's fatal/advisory partition must never " +
      "re-parse detail text") {
    val fits = Seq(
      ScalingAudit.ScalingFit("over", pts(1.0, 3.0, 30.0), Some(2.2)),
      ScalingAudit.ScalingFit("broken", pts(1.0, 2.0), None))
    assert(ScalingAudit.auditExponents(fits).map(_.subject) == Seq("over"))
    assert(ScalingAudit.auditMeasurementFailures(fits, 3)
      .map(_.subject) == Seq("broken"))
    val drift = ScalingAudit.driftFindings(Map("over" -> 1.0),
      fits.take(1))
    assert(drift.map(_.subject) == Seq("over"))
  }

  test("rowsBoundFindings — the failing-positive control for the " +
      "rows gate: an over-bound rows exponent, a refused rows fit, " +
      "and a missing measurement are each FATAL on a rows-bounded " +
      "entry; under-bound fits and unbounded entries are silent") {
    val bounds = Map("a" -> 2.15, "b" -> 2.15, "c" -> 2.15, "d" -> 2.15)
    val rows = Map(
      "a" -> ((Seq(100L, 10000L, 3000000L), Some(2.38))), // over bound
      "b" -> ((Seq(100L, 110L, 120L), None)),             // fit refused
      // "c" never measured at all
      "d" -> ((Seq(100L, 10000L, 1000000L), Some(2.0))),  // under bound
      "e" -> ((Seq(1L, 100L, 10000L), Some(9.9))))        // no bound
    val fs = ScalingAudit.rowsBoundFindings(rows, bounds,
      Seq("e", "d", "c", "b", "a"))
    assert(fs.map(_.subject) == Seq("a", "b", "c"), fs)
    assert(fs.forall(_.kind == ScalingAudit.RowsOverBound))
    assert(fs.head.detail.contains("2.38") &&
      fs.head.detail.contains("2.15"), fs.head.detail)
    // the happy path really is silent
    assert(ScalingAudit.rowsBoundFindings(rows, bounds, Seq("d")).isEmpty)
  }

  test("floorFindings — the failing-positive control for the floor-" +
      "documented gate: work past the documented floor, a refused " +
      "rows fit, a missing rows measurement, and an over-bound rows " +
      "exponent are each FATAL; a sub-floor entry with linear rows " +
      "is silent, as is an entry without a floor") {
    def fit(name: String, work: Double*) = ScalingAudit.ScalingFit(
      name, work.zipWithIndex.map { case (w, i) =>
        ScalingAudit.Point(s"r${i + 1}", w, w) }, None)
    val floors = Map(
      "a" -> ((0.5, 1.15)), "b" -> ((0.5, 1.15)),
      "c" -> ((0.5, 1.15)), "d" -> ((0.5, 1.15)), "e" -> ((0.5, 1.15)))
    val fits = Seq(
      fit("a", 0.14, 0.15, 0.61), // work breach at r3
      fit("b", 0.14, 0.14, 0.15), // sub-floor, rows refused below
      fit("c", 0.14, 0.14, 0.15), // sub-floor, rows never measured
      fit("d", 0.14, 0.14, 0.15), // sub-floor, rows over bound below
      fit("e", 0.14, 0.14, 0.15), // healthy: sub-floor + linear rows
      fit("z", 9.99, 9.99, 9.99)) // no floor -> not this gate's business
    val rows = Map(
      "a" -> ((Seq(100L, 1000L, 10000L), Some(1.0))),
      "b" -> ((Seq(100L, 110L, 120L), None)),
      "d" -> ((Seq(100L, 10000L, 1000000L), Some(2.0))),
      "e" -> ((Seq(100L, 1000L, 10000L), Some(1.0))))
    val fs = ScalingAudit.floorFindings(fits, rows, floors,
      Seq("z", "e", "d", "c", "b", "a"))
    assert(fs.map(_.subject) == Seq("a", "b", "c", "d"), fs)
    assert(fs.forall(_.kind == ScalingAudit.FloorBreach))
    assert(fs.head.detail.contains("0.610") &&
      fs.head.detail.contains("0.50"), fs.head.detail)
    assert(fs.last.detail.contains("2.00") &&
      fs.last.detail.contains("1.15"), fs.last.detail)
    // the happy path really is silent
    assert(ScalingAudit.floorFindings(fits, rows, floors,
      Seq("e")).isEmpty)
  }

  test("fitRows fits exact row counts across valid steps and refuses " +
      "flat or degenerate axes") {
    assert(math.abs(ScalingAudit.fitRows(
      Seq(1000L, 10000L, 100000L), Seq(600, 6000, 60000)).get - 1.0) < 1e-9)
    // constant output (e.g. a fixed top-k) refuses instead of 0/0
    assert(ScalingAudit.fitRows(
      Seq(20L, 20L, 20L), Seq(600, 6000, 60000)).isEmpty)
    // degenerate size axis refuses like the work fit
    assert(ScalingAudit.fitRows(
      Seq(1000L, 2000L, 12000L), Seq(500, 500, 5000)).isEmpty)
  }

  test("rowVolumes measures a real query's materialized row volume " +
      "(PlanProfile off the executed adaptive plan)") {
    val rows = ScalingAudit.rowVolumes(spark,
      graft.SparkEntry.queries("q01_scan"), Seq(sfDir))
    assert(rows.size == 1 && rows.head > 0, rows)
  }

  test("auditMeasurementFailures flags a query measured at fewer " +
      "points than directories — a query that stopped running must " +
      "not read as benign unfit in the --check gate") {
    val fits = Seq(
      ScalingAudit.ScalingFit("ok", pts(1.0, 2.0, 12.0), Some(1.0)),
      ScalingAudit.ScalingFit("broken", pts(1.0, 2.0), None))
    val found = ScalingAudit.auditMeasurementFailures(fits, nDirs = 3)
    assert(found.size == 1 &&
      found.head.kind == ScalingAudit.MeasurementFailure &&
      found.head.detail.startsWith("broken: only 2/3"), found)
  }

  test("a subset sweep merges into the prior table instead of " +
      "clobbering it (readRawEntries round-trips untouched entries)") {
    val prior = """{"sf_base":"/x","queries":{
      |"a":{"wall":[1,2,3],"work":[1,2,3],"exponent":1.0},
      |"b":{"wall":[4,5,6],"work":[4,5,6],"exponent":null}}}""".stripMargin
    val entries = graft.ScalingSweep.readRawEntries(prior)
    assert(entries.keySet == Set("a", "b"), entries)
    assert(entries("a").contains("\"exponent\":1.0"), entries("a"))
    // overlay semantics: fresh wins, untouched carried
    val merged = entries ++ Map("a" -> """{"exponent":1.2}""")
    assert(merged("a") == """{"exponent":1.2}""" &&
      merged("b") == entries("b"))
    assert(graft.ScalingSweep.readRawEntries("garbage{").isEmpty)
  }

  test("readTable parses fitted exponents and skips unfit/null entries") {
    val json = """{"sf_base":"/x","cpus":32,"queries":{
      |"q41_pagerank":{"wall":[0.1,0.3,1.2],"work":[0.5,2.0,21.0],
      |"exponent":1.08},
      |"q01_scan":{"wall":[0.1,0.1,0.2],"work":[0.2,0.2,0.3],
      |"exponent":null}}}""".stripMargin
    assert(graft.ScalingSweep.readTable(json) == Map("q41_pagerank" -> 1.08))
    assert(graft.ScalingSweep.readTable("garbage{").isEmpty)
  }

  test("foldMin: a noise-window run folds away against a clean retry " +
      "(per-rung work min), a reproduced slow number keeps its fit, " +
      "and a retry that lost a rung folds nothing") {
    import ScalingAudit.{Point, ScalingFit, foldMin}
    val sizes = Seq(100L, 1000L, 10000L)
    def fitOf(work: Seq[Double]) = ScalingFit("q",
      work.zipWithIndex.map { case (w, i) => Point(s"r${i + 1}", w, w) },
      ScalingAudit.fitSized(work, sizes))
    // linear truth: work 1 -> 10 -> 100; the noisy run's top rung read 170
    val noisy = fitOf(Seq(1.0, 10.0, 170.0))
    val clean = fitOf(Seq(1.1, 10.2, 100.0))
    val folded = foldMin(noisy, clean, sizes)
    assert(folded.points.map(_.workSec) == Seq(1.0, 10.0, 100.0))
    assert(math.abs(folded.exponent.get - 1.0) < 0.01, folded)
    // the wall also folds by min
    assert(folded.points.map(_.wallSec) == Seq(1.0, 10.0, 100.0))
    // a genuine regression reproduces: both runs read the slow rung
    val again = fitOf(Seq(1.0, 10.0, 168.0))
    val confirmed = foldMin(noisy, again, sizes)
    assert(confirmed.exponent.get > 1.2, confirmed)
    // retry lost a rung: partial evidence never replaces the original
    val partial = ScalingFit("q",
      Seq(Point("r1", 0.5, 0.5), Point("r2", 5.0, 5.0)), None)
    assert(foldMin(noisy, partial, sizes) eq noisy)
    // each folded rung keeps the spread of the run that provided its min
    val spreadA = ScalingFit("q", Seq(Point("r1", 1, 1.0, 1.5),
      Point("r2", 10, 10.0, 1.1), Point("r3", 170, 170.0, 1.05)), None)
    val spreadB = ScalingFit("q", Seq(Point("r1", 2, 2.0, 1.0),
      Point("r2", 11, 11.0, 1.0), Point("r3", 100, 100.0, 1.2)), None)
    val fs = foldMin(spreadA, spreadB, sizes)
    assert(fs.points.map(_.workSpread) == Seq(1.5, 1.1, 1.2))
  }
}
