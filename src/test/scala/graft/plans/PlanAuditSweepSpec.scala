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
}
