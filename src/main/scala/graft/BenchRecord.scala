package graft

/** The on-disk full bench record (`bench_full.json`) as a tiny pure
  * API, split out of [[Bench]] so its invariants are unit-testable
  * without running a sweep:
  *
  *   1. READ — `priorQueries` only yields a comparison map when the
  *      record was measured at the SAME scale factor (a local sf0.001
  *      iteration must not mark every sf0.1 query "regressed", or mask
  *      a real regression behind tiny numbers).
  *   2. WRITE — `mergedQueries` folds a run's results INTO the prior
  *      same-sf record instead of replacing it: a subset run
  *      (`SPARK_GRAFT_ONLY=...`) updates only the queries it measured
  *      and carries the rest forward. Before this, any smoke subset
  *      clobbered the 211-query record, and the next full sweep's
  *      regression-aware noise folding ran blind — exactly how the
  *      round-7 record shipped a 3.9x-inflated cdc block (cdc2 0.92s
  *      recorded as 3.52s) with `n_noise_folded: 0`.
  *   3. WRITE, slower side — a SLOWER value may only replace a query's
  *      record min when the caller CONFIRMED it (the strictly-last
  *      isolated retry still measured slow — a genuine regression);
  *      an unconfirmed slower value keeps the prior min. Before this,
  *      "a query measured this run always wins" let one dirty full
  *      sweep RAISE the clean record on untouched code (round 7:
  *      144.3s → 167.75s — q33_lateral swept 3.833s against an
  *      isolated truth of 0.399s).
  *
  * A query that failed every sample this run records its -1 sentinel
  * over any prior value (a query that stopped running must not keep a
  * healthy-looking number).
  */
object BenchRecord {
  import org.json4s._

  /** Per-query minima from a prior record, iff it was measured at
    * `sfDir` AND on the same thread basis; empty on any mismatch,
    * absence, or parse failure. The cpus check has the same rationale
    * as the sf check: a 4-thread record compared against a 32-thread
    * run (or vice versa) flags every parallelism-sensitive query as a
    * phantom regression — the round-7 "parse-heavy noise window" was
    * exactly a basis mismatch. A record with NO cpus field is a
    * MISMATCH when the caller knows its own basis (a legacy record's
    * basis is unknowable, and comparing leniently would re-admit the
    * exact phantom-regression class the guard exists to stop — one
    * full run re-establishes the record on the stated basis); leniency
    * only applies when the caller's basis is itself unknown. */
  def priorQueries(json: String, sfDir: String,
      cpus: Option[Int] = None): Map[String, Double] =
    try {
      val ast = org.json4s.jackson.JsonMethods.parse(json)
      val sameSf = (ast \ "sf") match {
        case JString(s) => s == sfDir
        case _          => false
      }
      val sameCpus = (ast \ "cpus", cpus) match {
        case (JInt(rec), Some(run))    => rec.toInt == run
        case (JDouble(rec), Some(run)) => rec.toInt == run
        case (_, None)                 => true // caller's basis unknown
        case _                         => false // record's basis unknown
      }
      if (!sameSf || !sameCpus) Map.empty
      else (ast \ "queries") match {
        case JObject(fields) => fields.collect {
          case (k, JDouble(v))  => k -> v
          case (k, JInt(v))     => k -> v.toDouble
          case (k, JDecimal(v)) => k -> v.toDouble
        }.toMap
        case _ => Map.empty
      }
    } catch { case _: Throwable => Map.empty }

  /** Queries whose folded min exceeds the prior record by more than
    * `factor`, over the `floorSec` absolute floor (tiny queries carry
    * too much relative noise to flag), against healthy priors only
    * (a carried -1 failure sentinel must not mark a now-healthy query
    * regressed). The single regression predicate Bench uses for the
    * re-audit net, the strictly-last confirmation retry, and the
    * self-reported `regressed_vs_record` — one definition, tested
    * here, three call sites. */
  def regressedVs(prior: Map[String, Double],
      mins: Seq[(String, Double)], floorSec: Double = 0.3,
      factor: Double = 1.5): Seq[String] =
    mins.collect {
      case (name, v) if v > floorSec &&
        prior.get(name).exists(p => p > 0 && v > p * factor) => name
    }

  /** How many CONSECUTIVE clean full sweeps a query must spend more
    * than [[RebaselineFactor]] over its record min before the record
    * refreshes to the observed value — the bound on the rolling min's
    * optimism. The record is best-confirmed-state by design (one dirty
    * sweep must not raise it), but a min that only ratchets DOWN
    * drifts ever further below the honest steady state as sub-
    * regression slowdowns (1.2–1.5×, under the confirmation bar)
    * accumulate: round 8 shipped `n_slower_unconfirmed: 45` with the
    * record total 135.6 s against a 153.2 s sweep. Three consecutive
    * CLEAN sweeps (full run, no contention flag) agreeing the query is
    * slower is evidence of a real new steady state, not a noise
    * window — noise windows are sporadic and the counting run is
    * already contention-gated. */
  val RebaselineRuns = 3

  /** The slower-than-record factor that starts a streak: above the
    * noise band (±8% run drift is normal), below the 1.5× regression
    * bar (those queries take the confirmation-retry path instead). */
  val RebaselineFactor = 1.2

  /** The agreement band two independent confirmation retries must land
    * inside for a slower value to count as REPRODUCED (matches the
    * in-sweep min-stability band): clean samples of the same steady
    * state cluster; values from a noise window scatter. */
  val RetryAgreeBand = 1.3

  /** Does the strictly-last confirmation evidence CONFIRM a
    * regression? Round 9 showed a single settled retry is not enough:
    * the box's noise arrives in sustained multi-minute windows, so a
    * retry launched inside the same window as the sweep "reproduces"
    * the slow number with agreeing samples (cdc10_ivm_join folded at
    * 2.435s against an isolated truth of 1.824s — 18 entries raised
    * on noise in one official run). A slower value may raise the
    * record min only when TWO retry windows, independently settled
    * and minutes apart, BOTH reproduce it (each min > `factor` × the
    * record) and AGREE with each other (within `band`) — sustained
    * noise fails the second settle's load gate (the caller passes a
    * dirty window as None), and sporadic noise fails agreement. */
  def retryConfirms(record: Double, w1: Option[Double], w2: Option[Double],
      factor: Double = 1.5, band: Double = RetryAgreeBand): Boolean =
    (w1, w2) match {
      case (Some(a), Some(b)) =>
        record > 0 && math.min(a, b) > record * factor &&
          math.max(a, b) <= math.min(a, b) * band
      case _ => false
    }

  /** The record's measured streaming throughput
    * (`streaming_events_per_sec`, written by Bench's ThroughputProbe
    * pass); None on absence, a -1 sentinel, or parse failure — so a
    * SUBSET run (which skips the probe) carries the last measured
    * rate forward instead of clobbering it. */
  def priorStreamingRate(json: String): Option[Double] =
    priorStreamingField(json, "streaming_events_per_sec")

  /** Any top-level non-negative numeric field of the record — the
    * streaming rate and the microbatch latency percentiles share the
    * same carry rule (skipped probe ⇒ keep the last measured value);
    * None on absence, a -1 sentinel, or parse failure. */
  def priorStreamingField(json: String, field: String): Option[Double] =
    try {
      (org.json4s.jackson.JsonMethods.parse(json) \ field) match {
        case JDouble(v) if v >= 0  => Some(v)
        case JInt(v) if v >= 0     => Some(v.toDouble)
        case JDecimal(v) if v >= 0 => Some(v.toDouble)
        case _                     => None
      }
    } catch { case _: Throwable => None }

  /** Per-query consecutive-slower streaks out of the record's
    * `slower_streak` map; empty on absence or parse failure. */
  def readStreaks(json: String): Map[String, Int] =
    try {
      val ast = org.json4s.jackson.JsonMethods.parse(json)
      (ast \ "slower_streak") match {
        case JObject(fields) => fields.collect {
          case (k, JInt(v))    => k -> v.toInt
          case (k, JDouble(v)) => k -> v.toInt
        }.toMap
        case _ => Map.empty
      }
    } catch { case _: Throwable => Map.empty }

  /** Advance the slower-than-record streaks with this run's folded
    * minima and decide which queries to RE-BASELINE (record refreshed
    * to the observed value via `mergedQueries`' confirmed set).
    *
    *   - Streaks only move on a CLEAN run (full sweep, no contention
    *     flag): a dirty box is evidence of nothing, so its streaks
    *     carry verbatim — neither incremented (a noise window must not
    *     accumulate toward a re-baseline) nor reset (nor may it erase
    *     three clean runs of evidence).
    *   - A query counts as slower when its folded min sits over
    *     `factor` × a healthy prior and above the absolute floor;
    *     `excluded` (the >1.5× regression set — those take the
    *     strictly-last confirmation path) never counts.
    *   - A fast-or-equal clean measurement RESETS the streak: the rule
    *     is consecutive, agreement across distant-in-time sweeps, not
    *     a lifetime tally.
    *   - A query that produced NO measurement on a clean run (every
    *     sample failed) DROPS its streak: "3 consecutive clean sweeps"
    *     means three consecutive clean OBSERVATIONS — two old slow
    *     runs plus one later slow run separated by failed measurements
    *     is not that, and a silently carried streak would let exactly
    *     that combination fire a re-baseline. (Dirty runs still carry
    *     everything verbatim, per the first rule — only a clean full
    *     run is evidence the query truly went unmeasured.)
    *   - Reaching `k` re-baselines and resets.
    *
    * Returns (updated streaks sans zeros, queries to re-baseline). */
  def slowerStreaks(prior: Map[String, Double],
      mins: Seq[(String, Double)], priorStreaks: Map[String, Int],
      excluded: Set[String], cleanRun: Boolean,
      k: Int = RebaselineRuns, factor: Double = RebaselineFactor,
      floorSec: Double = 0.3): (Map[String, Int], Set[String]) = {
    if (!cleanRun) return (priorStreaks, Set.empty)
    val measured = mins.map(_._1).toSet
    val rebaselined = Set.newBuilder[String]
    val carried = priorStreaks.filter(kv => measured(kv._1))
    val updated = mins.foldLeft(carried) { case (acc, (name, v)) =>
      val slower = v > floorSec && !excluded(name) &&
        prior.get(name).exists(p => p > 0 && v > p * factor)
      if (!slower) acc - name
      else {
        val streak = acc.getOrElse(name, 0) + 1
        if (streak >= k) { rebaselined += name; acc - name }
        else acc.updated(name, streak)
      }
    }
    (updated, rebaselined.result())
  }

  /** The record to persist: prior same-sf entries overlaid with this
    * run's results, sorted by query name. Faster values and failure
    * sentinels always win; a SLOWER value only replaces the prior min
    * when its query is in `confirmedSlower` (the caller's strictly-
    * last isolated retry reproduced the slow number, or the
    * [[slowerStreaks]] re-baseline rule fired — see the object
    * scaladoc for why an unconfirmed slow sweep must not raise the
    * record). */
  def mergedQueries(prior: Map[String, Double],
      current: Seq[(String, Double)],
      confirmedSlower: Set[String] = Set.empty): Seq[(String, Double)] = {
    val folded = current.map { case (name, v) =>
      name -> (prior.get(name) match {
        case Some(p) if p > 0 && v > p && !confirmedSlower(name) => p
        case _ => v
      })
    }
    (prior ++ folded).toSeq.sortBy(_._1)
  }
}
