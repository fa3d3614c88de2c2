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

  /** Column names whose domain is BOUNDED in this schema — event types
    * (5), languages (5), nation keys (25), weekday, order priority /
    * status / flag enums, and the component root of a CC pass (real
    * co-occurrence graphs carry a giant component). A window partitioned
    * ONLY by these has a fixed task count at any data size. */
  private val lowCardCols = Set(
    "et", "event_type", "lang", "root", "nk", "c_nationkey", "dow",
    "o_orderpriority", "o_orderstatus", "l_returnflag", "l_linestatus",
    // repo-local aliases of the same bounded domains
    "flag", "prio", "prev_type", "next_type")

  /** query → reason its low-card-keyed window input is genuinely
    * bounded (histogram/day-series scale, NOT corpus scale), reviewed
    * by hand. The fixed q35d/q41c/q14g/q14b/q38/q38b must NEVER
    * reappear here. */
  private val skewAllow: Map[String, String] = Map(
    "q19e_chi2" ->
      ("windows run over the |status|x|priority| contingency aggregate " +
        "(15 rows) — domain-product scale"),
    "q24_quantiles" ->
      ("cumulative over the integer n_chars histogram — bounded by the " +
        "length domain (~1e4 distinct), not the corpus; scaladoc names " +
        "the two-level fallback if that ever changes"),
    "q34b_interpolate" ->
      ("gap-filled day series: |days|x|types| rows, grows with calendar " +
        "time, not data volume"),
    "q34d_seasonal" -> "same day-series input as q34b",
    "q34e_acf" -> "same day-series input as q34b",
    "q35_anomaly" -> "trailing z over the gap-filled day series (q34b)",
    "q35c_seasonal_anomaly" ->
      "day series + the 7x|types|-row weekday index aggregate",
    "q36e_drift" ->
      ("per-lang totals over the (lang, length-bin) histogram — bin " +
        "domain = max length / 100"),
    "q19f_winsorize" ->
      ("rank scan over the per-flag INTEGER quantity histogram — " +
        "l_quantity domain is 1..50, |flags|x50 rows total"),
    "q19i_bootstrap" ->
      "replica-mean ranking over 32 bootstrap replicas per flag",
    "q29b_transitions" ->
      ("per-prev normalizer over the |types|^2 transition aggregate " +
        "(<=|types| rows per partition), never over events"))

  test("no query runs a window partitioned only by declared " +
      "low-cardinality columns over non-summary rows — the q35d/q41c " +
      "skew class fails by name (bounded inputs are allowlisted with " +
      "a written reason; the two fixed queries are negative controls)") {
    val hits = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val findings =
          try PlanAudit.auditSkewedWindows(fn(spark, sfDir), lowCardCols)
          catch { case e: Throwable =>
            Seq(PlanAudit.Finding("plan-error", e.getMessage.take(100))) }
        findings.collect {
          case f if !skewAllow.contains(name) =>
            s"$name: [${f.kind}] partition keys (${f.detail})"
        }
    }
    assert(hits.isEmpty,
      "low-cardinality-keyed windows outside the justified allowlist:\n" +
        hits.mkString("\n"))
    // negative controls: the queries this lint exists for (q35d/q41c
    // from the round-5 audit) and the three it then CAUGHT on its
    // first sweep (q14b/q38/q38b) stay fixed
    for (fixed <- Seq("q35d_mad", "q41c_components", "q14g_pareto",
        "q14b_distribution", "q38_overlap", "q38b_interval_union")) {
      val f = PlanAudit.auditSkewedWindows(
        SparkEntry.queries(fixed)(spark, sfDir), lowCardCols)
      assert(f.isEmpty, s"$fixed regressed to a skewed window: $f")
      assert(!skewAllow.contains(fixed),
        s"$fixed must stay fixed, not allowlisted")
    }
  }
}
