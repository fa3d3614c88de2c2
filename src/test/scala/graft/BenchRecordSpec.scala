package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench record's two invariants (see BenchRecord's scaladoc):
  * same-sf-only comparison, and subset runs merging into — never
  * clobbering — the prior full record. The clobber case is not
  * hypothetical: the round-7 sweep ran with a 5-query smoke record on
  * disk, so 206 queries had no prior, the regression-aware fold never
  * fired, and the record shipped a 3.9x-inflated cdc block. */
class BenchRecordSpec extends AnyFunSuite {

  private val rec =
    """{"metric":"total","value":3.0,"unit":"sec","sf":"/data/sf0.1",
      |"queries":{"q1":1.0,"q2":2.0}}""".stripMargin

  test("priorQueries parses the per-query map at the matching sf") {
    assert(BenchRecord.priorQueries(rec, "/data/sf0.1") ==
      Map("q1" -> 1.0, "q2" -> 2.0))
  }

  test("priorQueries is empty at a different sf — a local sf0.001 " +
      "record must not drive sf0.1 regression flags") {
    assert(BenchRecord.priorQueries(rec, "/data/sf0.001").isEmpty)
  }

  test("priorQueries is empty on malformed json and on a record with " +
      "no queries map") {
    assert(BenchRecord.priorQueries("not json{", "/data/sf0.1").isEmpty)
    assert(BenchRecord.priorQueries(
      """{"sf":"/data/sf0.1","value":1}""", "/data/sf0.1").isEmpty)
  }

  test("priorQueries is empty on a thread-basis mismatch, matches on " +
      "the same basis — a 4-thread run against a 32-thread record " +
      "flags every parallelism-sensitive query as a phantom " +
      "regression (the round-7 'parse-heavy noise window' was exactly " +
      "this)") {
    val rec32 =
      """{"sf":"/data/sf0.1","cpus":32,"queries":{"q1":1.0}}"""
    assert(BenchRecord.priorQueries(rec32, "/data/sf0.1", Some(4)).isEmpty)
    assert(BenchRecord.priorQueries(rec32, "/data/sf0.1", Some(32)) ==
      Map("q1" -> 1.0))
  }

  test("a record with NO cpus field is a mismatch when the caller " +
      "knows its own basis (a legacy record's basis is unknowable — " +
      "comparing leniently re-admits the phantom-regression class; " +
      "one full run re-establishes the record), and lenient only when " +
      "the caller's basis is itself unknown") {
    val rec32 =
      """{"sf":"/data/sf0.1","cpus":32,"queries":{"q1":1.0}}"""
    // legacy record (no cpus) + known caller basis: mismatch
    assert(BenchRecord.priorQueries(rec, "/data/sf0.1", Some(32)).isEmpty)
    // caller doesn't know its basis: lenient both ways
    assert(BenchRecord.priorQueries(rec32, "/data/sf0.1") ==
      Map("q1" -> 1.0))
    assert(BenchRecord.priorQueries(rec, "/data/sf0.1") ==
      Map("q1" -> 1.0, "q2" -> 2.0))
  }

  test("priorQueries reads integral times too (hand-edited records)") {
    assert(BenchRecord.priorQueries(
      """{"sf":"/data/sf0.1","queries":{"q1":2}}""", "/data/sf0.1") ==
      Map("q1" -> 2.0))
  }

  test("a subset run updates only what it measured and carries the " +
      "rest of the prior record forward, sorted") {
    val merged = BenchRecord.mergedQueries(
      Map("q1" -> 1.0, "q2" -> 2.0, "q3" -> 3.0), Seq("q2" -> 0.5))
    assert(merged == Seq("q1" -> 1.0, "q2" -> 0.5, "q3" -> 3.0))
  }

  test("an UNCONFIRMED slower value keeps the prior record min — one " +
      "dirty sweep must not raise the record on untouched code (the " +
      "round-7 failure: q33_lateral swept 3.833s vs an isolated truth " +
      "of 0.399s, raising the clean 144.3s record to 167.75s)") {
    val merged = BenchRecord.mergedQueries(Map("q1" -> 1.0), Seq("q1" -> 4.0))
    assert(merged == Seq("q1" -> 1.0))
  }

  test("a CONFIRMED slower value (strictly-last isolated retry still " +
      "slow) does raise the record — a real regression must be able " +
      "to") {
    val merged = BenchRecord.mergedQueries(Map("q1" -> 1.0),
      Seq("q1" -> 4.0), confirmedSlower = Set("q1"))
    assert(merged == Seq("q1" -> 4.0))
  }

  test("faster values always win, confirmed or not") {
    assert(BenchRecord.mergedQueries(Map("q1" -> 2.0), Seq("q1" -> 1.5)) ==
      Seq("q1" -> 1.5))
    assert(BenchRecord.mergedQueries(Map("q1" -> 2.0), Seq("q1" -> 1.5),
      Set("q1")) == Seq("q1" -> 1.5))
  }

  test("a prior failure sentinel never outcompetes a healthy current " +
      "value (p > 0 guard)") {
    assert(BenchRecord.mergedQueries(Map("q1" -> -1.0), Seq("q1" -> 2.0)) ==
      Seq("q1" -> 2.0))
  }

  test("regressedVs flags >1.5x over a healthy prior above the 0.3s " +
      "floor — and nothing else: tiny queries, mild drift, failure-" +
      "sentinel priors, and no-prior queries never flag") {
    val prior = Map("slow" -> 1.0, "tiny" -> 0.05, "mild" -> 1.0,
      "dead" -> -1.0)
    val mins = Seq(
      "slow" -> 1.6,  // 1.6x over 1.0 and > 0.3s: flags
      "tiny" -> 0.29, // 5.8x but under the absolute floor: no flag
      "mild" -> 1.4,  // 1.4x, under the factor: no flag
      "dead" -> 2.0,  // prior is the -1 sentinel: no flag
      "new" -> 9.9)   // no prior at all: no flag
    assert(BenchRecord.regressedVs(prior, mins) == Seq("slow"))
    // the floor and factor are parameters (the sweep's knobs)
    assert(BenchRecord.regressedVs(prior, mins, floorSec = 0.1) ==
      Seq("slow", "tiny"))
    assert(BenchRecord.regressedVs(prior, mins, factor = 1.3) ==
      Seq("slow", "mild"))
  }

  test("a query that failed every sample records its -1 sentinel over " +
      "any prior value") {
    val merged = BenchRecord.mergedQueries(Map("q1" -> 1.0), Seq("q1" -> -1.0))
    assert(merged == Seq("q1" -> -1.0))
  }

  test("with no prior record the merge is just this run") {
    assert(BenchRecord.mergedQueries(Map.empty, Seq("q1" -> 1.0)) ==
      Seq("q1" -> 1.0))
  }

  // ------------------------------------------- re-baseline streaks

  private val prior = Map("q1" -> 1.0, "q2" -> 2.0, "tiny" -> 0.05)

  test("a query >1.2x over its record min on a clean full sweep opens " +
      "a streak; reaching 3 consecutive re-baselines and resets") {
    var streaks = Map.empty[String, Int]
    for (run <- 1 to 2) {
      val (s, rb) = BenchRecord.slowerStreaks(prior, Seq("q1" -> 1.3),
        streaks, Set.empty, cleanRun = true)
      assert(s == Map("q1" -> run) && rb.isEmpty, s"run $run")
      streaks = s
    }
    val (s3, rb3) = BenchRecord.slowerStreaks(prior, Seq("q1" -> 1.3),
      streaks, Set.empty, cleanRun = true)
    assert(rb3 == Set("q1") && s3.isEmpty, (s3, rb3))
  }

  test("a fast-or-equal clean measurement RESETS the streak — the rule " +
      "is consecutive agreement, not a lifetime tally") {
    val (s, rb) = BenchRecord.slowerStreaks(prior, Seq("q1" -> 1.05),
      Map("q1" -> 2), Set.empty, cleanRun = true)
    assert(s.isEmpty && rb.isEmpty)
  }

  test("a dirty run carries streaks verbatim: it may neither " +
      "accumulate toward a re-baseline nor erase clean evidence") {
    val (s, rb) = BenchRecord.slowerStreaks(prior,
      Seq("q1" -> 5.0, "q2" -> 2.1), Map("q1" -> 2), Set.empty,
      cleanRun = false)
    assert(s == Map("q1" -> 2) && rb.isEmpty)
  }

  test("the >1.5x regression set never counts (it takes the " +
      "confirmation-retry path), nor do sub-floor minima or queries " +
      "with no healthy prior") {
    val (s, rb) = BenchRecord.slowerStreaks(
      prior ++ Map("dead" -> -1.0),
      Seq("q1" -> 1.8, "tiny" -> 0.09, "new" -> 9.0, "dead" -> 9.0),
      Map.empty, excluded = Set("q1"), cleanRun = true)
    assert(s.isEmpty && rb.isEmpty, (s, rb))
  }

  test("a re-baselined query's slower value then replaces the record " +
      "min through mergedQueries' confirmed set") {
    val merged = BenchRecord.mergedQueries(prior, Seq("q1" -> 1.3),
      confirmedSlower = Set("q1")).toMap
    assert(merged("q1") == 1.3)
  }

  test("a query that produced NO measurement on a clean run DROPS its " +
      "streak — two old slow runs plus one later slow run separated " +
      "by failed measurements are not 3 consecutive clean " +
      "observations") {
    val (s, rb) = BenchRecord.slowerStreaks(prior, Seq("q2" -> 2.0),
      Map("q1" -> 2), Set.empty, cleanRun = true)
    assert(s.isEmpty && rb.isEmpty, (s, rb))
    // ...but a DIRTY run still carries it verbatim (dirty evidence may
    // neither advance nor erase)
    val (sd, _) = BenchRecord.slowerStreaks(prior, Seq("q2" -> 2.0),
      Map("q1" -> 2), Set.empty, cleanRun = false)
    assert(sd == Map("q1" -> 2))
  }

  // --------------------------------------- confirmation-retry evidence

  test("retryConfirms requires BOTH settled windows to reproduce the " +
      "slow number — one window (the other dirty or unmeasured) " +
      "confirms nothing, however slow it measured") {
    assert(!BenchRecord.retryConfirms(1.0, Some(2.4), None))
    assert(!BenchRecord.retryConfirms(1.0, None, Some(2.4)))
    assert(!BenchRecord.retryConfirms(1.0, None, None))
    assert(BenchRecord.retryConfirms(1.0, Some(2.4), Some(2.5)))
  }

  test("retryConfirms rejects windows that disagree beyond the noise " +
      "band (sporadic noise scatters; a real steady state clusters) " +
      "and windows where either min folded back under the regression " +
      "bar") {
    // both over 1.5x the 1.0 record, but 1.6 vs 2.4 disagree (>1.3x)
    assert(!BenchRecord.retryConfirms(1.0, Some(1.6), Some(2.4)))
    // one window folded back under the bar: the sweep number was noise
    assert(!BenchRecord.retryConfirms(1.0, Some(1.2), Some(2.4)))
    // agreement at the band edge still confirms
    assert(BenchRecord.retryConfirms(1.0, Some(2.0), Some(2.6)))
  }

  test("retryConfirms never confirms against a missing or failed " +
      "record entry (sentinel or zero)") {
    assert(!BenchRecord.retryConfirms(-1.0, Some(2.0), Some(2.0)))
    assert(!BenchRecord.retryConfirms(0.0, Some(2.0), Some(2.0)))
  }

  test("readStreaks round-trips the ledger and is empty on absence " +
      "or garbage") {
    val j = """{"sf":"/x","slower_streak":{"q1":2,"q9":1},"queries":{}}"""
    assert(BenchRecord.readStreaks(j) == Map("q1" -> 2, "q9" -> 1))
    assert(BenchRecord.readStreaks(rec).isEmpty)
    assert(BenchRecord.readStreaks("garbage{").isEmpty)
  }

  test("priorStreamingRate reads the recorded throughput, and returns " +
      "None on the -1 skip sentinel, absence, or garbage — so a subset " +
      "run carries the last measured rate instead of clobbering it") {
    val j = """{"sf":"/x","streaming_events_per_sec":41732.5,"queries":{}}"""
    assert(BenchRecord.priorStreamingRate(j).contains(41732.5))
    val skipped = """{"sf":"/x","streaming_events_per_sec":-1.000}"""
    assert(BenchRecord.priorStreamingRate(skipped).isEmpty)
    assert(BenchRecord.priorStreamingRate(rec).isEmpty) // field absent
    assert(BenchRecord.priorStreamingRate("garbage{").isEmpty)
    // integral rate (hand-edited records), same leniency as priorQueries
    assert(BenchRecord.priorStreamingRate(
      """{"streaming_events_per_sec":41000}""").contains(41000.0))
  }

  test("priorStreamingField generalizes the carry rule to the probe's " +
      "latency percentiles — same None on sentinel/absence/garbage") {
    val j = """{"streaming_batch_p50_ms":42.5,"streaming_batch_p99_ms":97.0}"""
    assert(BenchRecord.priorStreamingField(j, "streaming_batch_p50_ms")
      .contains(42.5))
    assert(BenchRecord.priorStreamingField(j, "streaming_batch_p99_ms")
      .contains(97.0))
    assert(BenchRecord.priorStreamingField(
      """{"streaming_batch_p50_ms":-1.0}""", "streaming_batch_p50_ms")
      .isEmpty)
    assert(BenchRecord.priorStreamingField(j, "absent_field").isEmpty)
    assert(BenchRecord.priorStreamingField("garbage{", "x").isEmpty)
  }
}
