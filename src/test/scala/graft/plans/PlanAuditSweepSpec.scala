package graft.plans

import graft.{SparkEntry, SparkSpec}

/** Repo-wide scale-killer lint: every driver-visible query's physical
  * plan runs through [[PlanAudit]]; anything not on the explicit,
  * justified allowlist fails by name. This turns the per-query
  * PlanShapeSpec discipline into a standing invariant — a NEW query
  * that plans a cartesian, a nested-loop join, or an unpartitioned
  * window ships only with a written justification here. */
class PlanAuditSweepSpec extends SparkSpec {

  /** query → the PlanAudit kinds it is ALLOWED to trip, each with the
    * reason the pattern is intentional at that site. A nested-loop
    * join over a broadcast ONE-ROW side (grand totals, corpus stats,
    * probe heads) is O(n) work with O(1) replication — the idiom this
    * repo uses instead of an unpartitioned window; the grid cross is
    * a deliberate tiny-dimension cartesian. */
  private val nlj = Set(PlanAudit.NestedLoopJoin)
  private val allow: Map[String, Set[String]] = Map(
    // one-row broadcast side (grand total / corpus stats / head probe):
    // O(n) work, O(1) replication — the repo's alternative to an
    // unpartitioned window
    "q19e_chi2" -> nlj,        // grand-total row onto the contingency agg
    "q04c_hll_err" -> nlj,     // one-row union sketch × one-row whole sketch
    "q19h_benford" -> nlj,     // total-count row onto digit classes
    "q26_pps" -> nlj,          // corpus token-mass row onto strata
    "q26_temperature" -> nlj,  // mixture-weight summary row
    "q28c_cms_freq" -> nlj,    // the one broadcast CMS sketch row
    "q36c_anonymity" -> nlj,   // grand-total row for the ppm share
    "cdc15_lag" -> nlj,        // stream-head row onto per-table lags
    "s04_watermark" -> nlj,    // max-event-time row (batch watermark cut)
    "q24_collocations" -> nlj, // corpus bigram-total row onto pair lifts
    "q19l_ks" -> nlj,          // cohort-total row onto the CDF-gap grid
    "q23_recall" -> nlj,       // sampled query set (non-equi) + mean row
    // constant-size broadcast probe set with a NON-EQUI predicate
    // (cand_id != q_id / label inequality / edit-distance band):
    // the broadcast side is fixed-size by construction, the stream
    // side passes once — linear, not quadratic in the corpus
    "q23_knn_exact" -> nlj,
    // broadcast centroid side of k = ceil(sqrt(n)) rows (sub-linear,
    // KBs) probed once per vector then argmin-combined map-side: the
    // designed n^1.5 assignment, not a corpus cartesian
    "q23_semdedup_adaptive" -> nlj,
    "q23_range" -> nlj,
    "q23_hardneg" -> nlj,
    "q23_pq" -> nlj,
    "q17b_fuzzy" -> nlj,
    // deliberate tiny-dimension grid (documented in Relational)
    "q32_grid_cross" -> nlj)

  test("every query plan is PlanAudit-clean modulo the justified " +
      "allowlist, and matches its recorded PlanSignature baseline") {
    val baseline: Map[String, String] = {
      val url = getClass.getResource("/plan_signatures.tsv")
      assert(url != null, "missing plan_signatures.tsv — regenerate " +
        "with: sbt \"Test/runMain graft.plans.PlanSnapshotGen\"")
      scala.io.Source.fromURL(url).getLines()
        .map(_.split("\t", 2)).collect { case Array(n, s) => n -> s }.toMap
    }
    val (offenders, drifts) = SparkEntry.queries.toSeq.sortBy(_._1).map {
      case (name, fn) =>
        val (findings, sig) =
          try {
            val df = fn(spark, sfDir)
            (PlanAudit.audit(df), PlanSignature.render(PlanSignature.of(df)))
          } catch { case e: Throwable =>
            (Seq(PlanAudit.Finding("plan-error", e.getMessage.take(100))),
              s"ERROR ${e.getMessage.take(60)}")
          }
        val bad = findings
          .filterNot(f => allow.getOrElse(name, Set.empty).contains(f.kind))
          .map(f => s"$name: [${f.kind}] ${f.detail.take(80)}")
        val drift = baseline.get(name) match {
          case None => Seq(s"$name: no recorded signature (new query?)")
          case Some(rec) if rec != sig =>
            Seq(s"$name: recorded [$rec] now [$sig]")
          case _ => Nil
        }
        (bad, drift)
    }.unzip
    assert(offenders.flatten.isEmpty,
      s"unjustified scale risks:\n${offenders.flatten.mkString("\n")}")
    assert(drifts.flatten.isEmpty,
      "plan signatures drifted from the recorded baseline — if the new " +
        "shape is intended, regenerate with sbt \"Test/runMain " +
        "graft.plans.PlanSnapshotGen\" and review the file diff:\n" +
        drifts.flatten.mkString("\n"))
  }

  /** query → (reason, fixture input-row cap) for windows whose MEASURED
    * key cardinality is low because the window's input itself is
    * bounded (a histogram, a day series, a domain-product aggregate) —
    * NOT the corpus. Each entry's cap encodes that claim as a number:
    * the sweep asserts every low-cardinality window of the query reads
    * at most `cap` rows on the sf0.001 fixture, so an allowlisted
    * input that silently becomes corpus-scale fails by NAME instead of
    * riding a stale justification (the round-6 verdict's item 4). Caps
    * are the documented DOMAIN bound, with headroom, not a snapshot of
    * today's fixture count. The fixed q35d/q41c/q14g/q14b/q38/q38b
    * must NEVER appear here. */
  private val cardAllow: Map[String, (String, Long)] = Map(
    "q24_quantiles" ->
      (("cumulative over the integer n_chars histogram — bounded by " +
        "the length domain (~1e4 distinct), not the corpus"), 30000L),
    "q34b_interpolate" ->
      (("gap-filled day series: |days|x|types| rows, grows with " +
        "calendar time, not data volume"), 20000L),
    "q34d_seasonal" -> (("same day-series input as q34b"), 20000L),
    "q34e_acf" -> (("same day-series input as q34b"), 20000L),
    "q35_anomaly" ->
      (("trailing z over the gap-filled day series (q34b)"), 20000L),
    "q35c_seasonal_anomaly" ->
      (("day series + the 7x|types|-row weekday index aggregate"),
        20000L),
    "q36e_drift" ->
      (("per-lang totals over the (lang, length-bin) histogram — bin " +
        "domain = max length / 100"), 30000L),
    "q19f_winsorize" ->
      (("rank scan over the per-flag INTEGER quantity histogram — " +
        "l_quantity domain is 1..50, |flags|x50 rows total"), 1000L),
    "q19i_bootstrap" ->
      (("replica-mean ranking over 32 bootstrap replicas per flag"),
        1000L),
    "q29b_transitions" ->
      (("per-prev normalizer over the |types|^2 transition aggregate " +
        "(<=|types| rows per partition), never over events"), 1000L))

  test("no query runs a window whose MEASURED partition-key count is " +
      "bounded while its input is not — every Window node's input " +
      "subplan is executed on the fixture and its distinct key tuples " +
      "counted, so the q35d/q41c skew class fails on DATA, with no " +
      "column-name list to maintain or evade (bounded inputs are " +
      "allowlisted with a reason AND a row cap; the six fixed queries " +
      "are negative controls)") {
    val memo = scala.collection.mutable.Map
      .empty[(org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
        Seq[String]), (Long, Long)]
    // flag: ≥500 input rows feeding ≤64 distinct key tuples that are
    // <1% of the input. The absolute cap separates bounded KEYS (enum
    // domains — fixed parallelism at any scale) from bounded
    // rows-per-key (per-doc windows over tokens — key count scales
    // with the corpus); the ratio floor keeps genuinely-keyed small
    // fixtures (15 users over 1k events = 1.5%) out of the net.
    val flagged = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val cards =
          try PlanAudit.windowCardinalities(fn(spark, sfDir), memo,
            measureExempt = false)
          catch { case e: Throwable =>
            Seq(PlanAudit.WindowCardinality(
              Seq(s"plan-error: ${e.getMessage.take(80)}"), Long.MaxValue,
              0, exempt = false)) }
        cards.collect {
          case c if !c.exempt && c.inputRows >= 500 &&
              c.distinctKeys <= 64 && c.ratioPct < 1.0 => (name, c)
        }
    }
    val offenders = flagged.filterNot { case (name, c) =>
      cardAllow.get(name).exists { case (_, cap) => c.inputRows <= cap }
    }.map { case (name, c) =>
      f"$name: keys=${c.keys.mkString(",")} rows=${c.inputRows} " +
        f"distinct=${c.distinctKeys} (${c.ratioPct}%.2f%%)" +
        cardAllow.get(name).map { case (_, cap) =>
          s" — allowlisted but OVER its ${cap}-row cap" }.getOrElse("")
    }
    assert(offenders.isEmpty,
      "bounded-key windows over unbounded inputs (or allowlisted " +
        "inputs past their row cap):\n" + offenders.mkString("\n"))
    // allowlist verification (round-6 verdict item 4): each entry's
    // claim — "this query's bounded-key windows read a bounded input"
    // — is ASSERTED as a counted bound, measured even below the
    // detector's 500-row floor: every non-exempt window feeding ≤64
    // distinct key tuples must read ≤ cap rows, and at least one such
    // window must EXIST (an entry whose window was rewritten away is
    // stale and must be removed, not silently carried)
    val capBreaches = cardAllow.toSeq.sortBy(_._1).flatMap {
      case (name, (reason, cap)) =>
        val bounded = PlanAudit
          .windowCardinalities(SparkEntry.queries(name)(spark, sfDir), memo,
            measureExempt = false)
          .filter(c => !c.exempt && c.distinctKeys <= 64)
        if (bounded.isEmpty)
          Seq(s"$name: stale cardAllow entry — no bounded-key window " +
            s"left to justify ('$reason')")
        else bounded.filter(_.inputRows > cap).map(c =>
          s"$name: bounded-key window (${c.keys.mkString(",")}) reads " +
            s"${c.inputRows} rows — past the $cap-row cap its " +
            s"justification ('${reason.take(50)}...') promises")
    }
    assert(capBreaches.isEmpty,
      "cardAllow claims no longer hold:\n" + capBreaches.mkString("\n"))
    // negative controls: the queries this lint exists for (q35d/q41c
    // from the round-5 audit) and the three the name-based sweep then
    // caught (q14b/q38/q38b) stay fixed — zero flagged windows each
    val tripped = flagged.map(_._1).toSet
    for (fixed <- Seq("q35d_mad", "q41c_components", "q14g_pareto",
        "q14b_distribution", "q38_overlap", "q38b_interval_union")) {
      assert(!tripped.contains(fixed),
        s"$fixed regressed to a bounded-key window: " +
          flagged.filter(_._1 == fixed).map(_._2).toString)
      assert(!cardAllow.contains(fixed),
        s"$fixed must stay fixed, not allowlisted")
    }
  }

  /** query → (reason, width cap, fixture row cap) for localCheckpoint
    * pins that are corpus-scale AND wider than the 4-column frontier
    * bar by DESIGN. The caps verify the axis each justification
    * bounds: an envelope fork or derivation cache promises a fixed
    * WIDTH (pinning exactly the columns every fork consumes — rows
    * scale with the corpus, that's the point), a histogram pin
    * promises bounded ROWS. Long.MaxValue marks the axis the
    * justification does not rest on. The pre-round-7 q14b (the full
    * orders projection pinned for a fork one cheap re-scan would
    * serve) must NEVER appear here. */
  private val pinAllow: Map[String, (String, Int, Long)] = Map(
    "cdc1_decode" ->
      (("single-parse fork of the decoded CDC envelope: every branch " +
        "consumes these 7 columns, and the alternative is re-parsing " +
        "JSON per branch (CPU-dominant at any scale)"), 7, Long.MaxValue),
    "cdc4_mongo" ->
      (("same single-parse envelope fork for the oplog decode (8 " +
        "envelope columns incl. ns/db/collection routing)"), 8,
        Long.MaxValue),
    "cdc9_scd2_merge" ->
      (("SCD2 maintain-vs-rebuild: the maintained dimension snapshot " +
        "and the batch change set ARE the operator's state, each " +
        "forked by the merge branches; width = the 6 SCD2 state " +
        "columns"), 6, Long.MaxValue),
    "q35d_mad" ->
      (("the (event-type, squared-deviation) micro-unit histogram " +
        "PrefixSum forks twice — value-domain rows, not corpus rows"),
        5, 20000L),
    "q26_mix" ->
      (("narrow tokenization cache: 5 derived numeric/key columns " +
        "pinned so the PrefixSum fork does not re-tokenize the corpus " +
        "(text itself is dropped before the pin)"), 5, Long.MaxValue))

  test("no query pins a WIDE corpus-scale frame in executor-local " +
      "storage: every localCheckpoint (LogicalRDD) input across the " +
      "surface is measured — width x rows — and a pin holding >=500 " +
      "fixture rows across >4 columns fails unless allowlisted with " +
      "the cap its justification bounds (the q14b full-projection " +
      "class, caught by measurement)") {
    val memo = scala.collection.mutable.Map.empty[Int, Long]
    val flagged = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val pins =
          try PlanAudit.checkpointProfiles(fn(spark, sfDir), memo)
          catch { case e: Throwable =>
            // sentinel must TRIP the flag filter below (>4 cols,
            // >=500 rows), or a plan-time error silently vanishes
            Seq(PlanAudit.CheckpointProfile(
              s"plan-error: ${e.getMessage.take(80)}" +:
                Seq.fill(4)("plan-error"), Long.MaxValue))
          }
        pins.filter(c => c.rows >= 500 && c.cols.size > 4)
          .map(name -> _)
    }
    val offenders = flagged.filterNot { case (name, c) =>
      pinAllow.get(name).exists { case (_, colCap, rowCap) =>
        c.cols.size <= colCap && c.rows <= rowCap }
    }.map { case (name, c) =>
      s"$name: ${c.cols.size} cols x ${c.rows} rows pinned " +
        s"(${c.cols.mkString(",").take(80)})" +
        pinAllow.get(name).map { case (_, cc, rc) =>
          s" — allowlisted but past its caps (cols<=$cc, rows<=$rc)"
        }.getOrElse("")
    }
    assert(offenders.isEmpty,
      "wide corpus-scale checkpoint pins (narrow the pin to the " +
        "columns the fork consumes, or allowlist with the bounded " +
        "axis):\n" + offenders.mkString("\n"))
    // staleness: a narrowed pin sheds its entry
    val flaggedNames = flagged.map(_._1).toSet
    val stale = pinAllow.keys.filterNot(flaggedNames).toSeq.sorted
    assert(stale.isEmpty,
      s"stale pinAllow entries (pin now narrow or small): $stale")
    // negative control: q14b's fix (pin only the histogram, re-scan
    // the row side) is the origin of this lint and must hold
    assert(!flaggedNames.contains("q14b_distribution"),
      flagged.filter(_._1 == "q14b_distribution").toString)
  }

  /** query → reason its full-width scan IS the query: it genuinely
    * consumes every column of a ≥5-wide table (a whole-row audit, a
    * full-envelope decode), so there is nothing for Catalyst to prune.
    * Everything else must show ReadSchema < file width — the brief's
    * "a scan that reads all columns for a 2-column projection is
    * wrong", enforced across the whole surface. */
  private val scanAllow: Map[String, String] = Map.empty

  test("every file scan across the surface prunes columns (ReadSchema " +
      "< file width) unless the query reads the full row by design — " +
      "the I/O half of the scale checklist, asserted plan-wide") {
    var scansSeen = 0
    val flagged = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val findings =
          try {
            val df = fn(spark, sfDir)
            scansSeen += PlanAudit.scanProfiles(df).size
            PlanAudit.auditUnprunedScans(df)
          } catch { case e: Throwable =>
            Seq(PlanAudit.Finding("plan-error", e.getMessage.take(80))) }
        findings.map(name -> _)
    }
    // positive control: the sweep must actually SEE the surface's scans
    // (a walk that stopped matching FileSourceScanExec would pass
    // vacuously); the 211 plans carry hundreds
    assert(scansSeen >= 200,
      s"only $scansSeen file scans visible across the surface — the " +
        "scan walk lost the plans")
    val offenders = flagged.filterNot { case (n, _) => scanAllow.contains(n) }
      .map { case (n, f) => s"$n: [${f.kind}] ${f.detail}" }
    assert(offenders.isEmpty,
      "unpruned full-width scans (fix the projection or allowlist with " +
        "the reason the query reads every column):\n" +
        offenders.mkString("\n"))
    // staleness: an allowlisted query whose scan now prunes sheds its
    // entry instead of carrying a dead justification
    val stale = scanAllow.keys.filterNot(flagged.map(_._1).toSet)
      .toSeq.sorted
    assert(stale.isEmpty,
      s"stale scanAllow entries (scan now prunes): $stale")
  }

  /** query → (reason, blowup cap, small-side cap) for joins whose
    * MEASURED output exceeds 4x the larger input by DESIGN. The caps
    * turn each justification into verified numbers on the fixture:
    *   - small-side cap: the multiplier comes from a CONSTANT-size
    *     broadcast side (an ANN query set) — bounded forever, so the
    *     blowup is that constant, not a data-scaled fanout;
    *   - blowup cap: for same-frame expansions (triangle neighbor
    *     pairs) the multiplier is a DEGREE bound, not a constant side —
    *     capped with headroom so a silent shift to corpus-scaled
    *     fanout fails by name.
    * Long.MaxValue marks the cap that entry's justification does not
    * rest on. */
  private val joinAllow: Map[String, (String, Double, Long)] = Map(
    "q23_knn_exact" ->
      (("brute-force scorer: corpus x CONSTANT broadcast query set " +
        "(|Q|=10) — blowup IS |Q|, fixed at any corpus size"), 64.0, 64L),
    "q23_pq" -> (("same constant-query-set scorer over PQ codes"),
      64.0, 64L),
    "q23_recall" ->
      (("certification joins: both the exact and approx sides score " +
        "corpus x the constant query set"), 64.0, 64L),
    "q23_hardneg" ->
      (("label-inequality hard-negative mining against the constant " +
        "probe set"), 64.0, 64L),
    "q44_triangles" ->
      (("per-vertex neighbor-pair expansion (u's adjacency joined to " +
        "itself, x<y): output is Sum d(u)^2/2-scale — bounded by max " +
        "degree, the standard triangle-count candidate set"), 16.0,
        Long.MaxValue),
    "q44b_clustering" ->
      (("same wedge expansion as q44, denominator of the clustering " +
        "coefficient"), 16.0, Long.MaxValue))

  test("no query's join MULTIPLIES: measured output vs inputs for " +
      "every join node on the fixture — an accidental many-to-many " +
      "fanout (out >> max(inputs)) fails by name; deliberate " +
      "multipliers are allowlisted with the bound their justification " +
      "promises (constant broadcast side or degree-capped expansion)") {
    val memo = scala.collection.mutable
      .Map.empty[org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
        Long]
    val flagged = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val cards =
          try PlanAudit.joinCardinalities(fn(spark, sfDir), memo)
          catch { case e: Throwable =>
            // leftRows=1 so blowup = MaxValue and the flag filter
            // below trips — a plan-time error must surface, not vanish
            Seq(PlanAudit.JoinCardinality("plan-error",
              e.getMessage.take(80), 1, 0, Long.MaxValue)) }
        cards.collect {
          case c if c.outRows >= 1000 && c.blowup > 4.0 => (name, c)
        }
    }
    val offenders = flagged.filterNot { case (name, c) =>
      joinAllow.get(name).exists { case (_, blowCap, sideCap) =>
        c.blowup <= blowCap && math.min(c.leftRows, c.rightRows) <= sideCap
      }
    }.map { case (name, c) =>
      f"$name: ${c.joinType} out=${c.outRows} L=${c.leftRows} " +
        f"R=${c.rightRows} (${c.blowup}%.1fx) on ${c.condition.take(60)}" +
        joinAllow.get(name).map { case (_, bc, sc) =>
          s" — allowlisted but past its caps (blowup<=$bc, minSide<=$sc)"
        }.getOrElse("")
    }
    assert(offenders.isEmpty,
      "multiplying joins (or allowlisted joins past their caps):\n" +
        offenders.mkString("\n"))
    // staleness: every joinAllow entry must still have a flagged join
    // to justify — a rewritten query sheds its entry, not carries it
    val flaggedNames = flagged.map(_._1).toSet
    val stale = joinAllow.keys.filterNot(flaggedNames).toSeq.sorted
    assert(stale.isEmpty,
      s"stale joinAllow entries (no >4x join left to justify): $stale")
  }
}
