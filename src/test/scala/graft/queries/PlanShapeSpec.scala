package graft.queries

import graft.SparkSpec

/** Physical-plan shape assertions for the properties that decide 100 TB
  * behavior — pushdown, pruning, broadcast choice, partial aggregation,
  * top-k without a global sort. Results are already oracle-checked; this
  * pins the PLANS so a refactor that silently trades them away (a
  * dropped broadcast hint, a filter that stops reaching the scan) fails
  * fast with a named property instead of a bench regression two rounds
  * later. */
class PlanShapeSpec extends SparkSpec {

  private def planOf(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("q02 filter reaches the parquet scan as PushedFilters") {
    val plan = planOf(Relational.queries("q02_filter")(spark, sfDir))
    assert(plan.contains("PushedFilters: [IsNotNull(l_quantity)"),
      "quantity range filter must push into the parquet scan")
  }

  test("q01 projection prunes the scan's ReadSchema to selected columns") {
    val plan = planOf(Relational.queries("q01_scan")(spark, sfDir))
    val read = "ReadSchema: ([^\\n]*)".r.findFirstMatchIn(plan)
      .map(_.group(1)).getOrElse("")
    assert(read.nonEmpty && !read.contains("l_comment"),
      s"scan must not read unprojected columns; ReadSchema=$read")
  }

  test("q07 small-dimension join broadcasts (no shuffle of the fact side)") {
    val plan = planOf(Relational.queries("q07_join_broadcast")(spark, sfDir))
    assert(plan.contains("BroadcastHashJoin"),
      "part dimension must broadcast against lineitem")
  }

  test("s08 stream-static enrichment broadcasts both dimension tables") {
    val plan = planOf(WindowedOps.queries("s08_enrich")(spark, sfDir))
    assert("BroadcastHashJoin".r.findAllIn(plan).size >= 2,
      "customer and nation must both broadcast; the event side never shuffles")
    assert(!plan.contains("SortMergeJoin"),
      "no sort-merge join in a stream-dim enrichment")
  }

  test("q24_vocab top-k is TakeOrderedAndProject, never a global sort") {
    val plan = planOf(TextOps.queries("q24_vocab")(spark, sfDir))
    assert(plan.contains("TakeOrderedAndProject"),
      "top-500 must be per-partition heaps + driver merge")
    // partial aggregation: two HashAggregate levels around the exchange
    assert("HashAggregate".r.findAllIn(plan).size >= 2,
      "token counts must combine map-side before the shuffle")
  }

  test("q26 hash sampling is a map-side predicate: no Exchange before " +
      "the filter, scan pruned to the output columns") {
    val q = SampleOps.queries("q26_sample_hash")(spark, sfDir)
    val plan = planOf(q)
    // the only exchange allowed is the final output ORDER BY's range
    // partitioning; the sample decision itself adds none
    val exchanges = "Exchange (\\w+)".r.findAllMatchIn(plan)
      .map(_.group(1)).toSeq
    assert(exchanges.forall(_ == "rangepartitioning"),
      s"sampling must not shuffle; found exchanges: $exchanges")
  }

  test("cdc5 snapshot apply is partially-aggregated (map-side combine " +
      "before the pk shuffle)") {
    val plan = planOf(CdcOps.queries("cdc5_apply")(spark, sfDir))
    assert("ObjectHashAggregate|HashAggregate|SortAggregate".r
      .findAllIn(plan).size >= 2,
      "max_by must run partial+final, not single-level")
    assert(!plan.contains("Window "),
      "snapshotting must not be a window over pk")
  }

  test("q27 pack/shuffle broadcast their tiny summary side back onto " +
      "the stream (never a shuffle join)") {
    for (q <- Seq("q27_pack", "q27_shuffle")) {
      val plan = planOf(CurationOps.queries(q)(spark, sfDir))
      assert(plan.contains("BroadcastHashJoin"),
        s"$q must broadcast its bucket offsets, plan:\n$plan")
    }
  }

  test("q24_tfidf per-doc top-5 plans as the bounded-heap TopKPerKey, " +
      "not a per-doc window sort") {
    val plan = planOf(TextOps.queries("q24_tfidf")(spark, sfDir))
    assert(plan.contains("TopKPerKey"),
      s"rank<=k must trigger the rewrite, plan:\n${plan.take(800)}")
  }

  test("q22_dedup_contain candidates ride the shingle equi join — " +
      "never a nested-loop product (containment has no length filter, " +
      "so a regression here would be quadratic at corpus scale)") {
    val plan = planOf(DedupOps.queries("q22_dedup_contain")(spark, sfDir))
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoop"),
      s"containment must stay an equi join, plan:\n${plan.take(800)}")
  }

  test("q43_index posting-list cut plans as TopKPerKey and the df side " +
      "NEVER broadcasts — the bigram vocabulary is corpus-scale (a " +
      "driver OOM as a broadcast side at 100 TB); the join shuffles " +
      "on term, which the ranking window already partitioned by") {
    val plan = planOf(IndexOps.queries("q43_index")(spark, sfDir))
    assert(plan.contains("TopKPerKey"),
      s"rank<=k must trigger the rewrite, plan:\n${plan.take(800)}")
    assert(!plan.contains("BroadcastHashJoin") &&
      !plan.contains("BroadcastExchange"),
      "vocabulary-scale df aggregate must shuffle-join, never broadcast: " +
        s"plan:\n${plan.take(1200)}")
    assert(plan.contains("SortMergeJoin"),
      s"df join should be the hinted sort-merge join, plan:\n${plan.take(800)}")
  }

  test("q42_cooccur pair expansion is row-local: no self-join of the " +
      "items (exactly the basket groupBy + pair groupBy exchanges " +
      "before the output sort)") {
    val plan = planOf(IndexOps.queries("q42_cooccur")(spark, sfDir))
    assert(!plan.contains("SortMergeJoin") && !plan.contains("Join"),
      s"pairs must come from the collected set, not a join:\n${plan.take(800)}")
    // basket collect + pair count: two hash exchanges, plus the final
    // ORDER BY range exchange. More would mean a lost partial agg.
    val hashEx = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(hashEx <= 2, s"expected ≤2 hash exchanges, got $hashEx")
  }

  test("q26_reservoir per-stratum top-8 plans as TopKPerKey — k rows " +
      "per language cross the exchange, never the corpus") {
    val plan = planOf(SampleOps.queries("q26_reservoir")(spark, sfDir))
    assert(plan.contains("TopKPerKey"),
      s"rank<=k must trigger the rewrite, plan:\n${plan.take(800)}")
  }

  test("no query plans an unpartitioned WindowExec (the single-task " +
      "whole-dataset window Spark itself warns about) — via the " +
      "PlanAudit library walk") {
    import graft.plans.PlanAudit
    // planning only — localCheckpoint-ing queries run their upstream
    // jobs, but nothing downstream executes
    val offenders = graft.SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        PlanAudit.audit(fn(spark, sfDir))
          .filter(_.kind == PlanAudit.UnpartitionedWindow)
          .map(f => s"$name: ${f.detail}")
    }
    assert(offenders.isEmpty,
      "global-window funnel(s) planned:\n" + offenders.mkString("\n"))
  }

  test("q24_bpe_pairs collapses to the word histogram before char work " +
      "and takes top-200 without a global sort") {
    val plan = planOf(TextOps.queries("q24_bpe_pairs")(spark, sfDir))
    assert(plan.contains("TakeOrderedAndProject"),
      "top-200 must be per-partition heaps + driver merge")
    assert("HashAggregate".r.findAllIn(plan).size >= 4,
      "both the word histogram and the pair count must partially " +
        "aggregate (two levels each)")
  }

  test("q11b binned range join plans as an equi join — never the " +
      "nested-loop cross product a keyless range condition invites") {
    val plan = planOf(Relational.queries("q11b_range_bin")(spark, sfDir))
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      "binning must restore an equi key; O(n^2) comparisons otherwise")
    assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin")
      || plan.contains("BroadcastHashJoin"),
      "the bin key must drive a hash/merge equi join")
  }

  test("q03b pivot with pinned values is ONE aggregate pass — no domain-" +
      "discovery job, no Expand") {
    val plan = planOf(Relational.queries("q03b_pivot")(spark, sfDir))
    assert("HashAggregate".r.findAllIn(plan).size >= 2,
      "pivot must partially aggregate (map-side conditional sums)")
    assert(!plan.contains("Expand"),
      "a single-agg pivot needs no Expand duplication of input rows")
  }

  test("q14b derives ntile/percent_rank/cume_dist from the histogram " +
      "rank — no window partitioned by the 5-value priority alone " +
      "(corpus rows through 5 tasks forever); ties ride a (prio, cents)" +
      "-bounded window and n broadcasts back") {
    val df = Relational.queries("q14b_distribution")(spark, sfDir)
    def windows(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.window.WindowExec] =
      p.collect {
        case a: org.apache.spark.sql.execution.adaptive
            .AdaptiveSparkPlanExec => windows(a.executedPlan)
        case w: org.apache.spark.sql.execution.window.WindowExec => Seq(w)
      }.flatten
    val wins = windows(df.queryExecution.executedPlan)
    assert(wins.nonEmpty)
    wins.foreach { w =>
      val keys = w.partitionSpec.flatMap(_.references.map(_.name)).toSet
      assert(keys != Set("prio") || w.child.output.exists(_.name == "_bsum"),
        s"a window partitions by ${keys.mkString(",")} over non-summary " +
          "rows — the priority-partition sort is back")
    }
    assert(planOf(df).contains("BroadcastHashJoin"),
      "the 5-row per-priority count must broadcast back onto the rows")
  }

  test("q17b fuzzy join broadcasts the distinct name vocabulary") {
    val plan = planOf(Relational.queries("q17b_fuzzy")(spark, sfDir))
    assert(plan.contains("BroadcastNestedLoopJoin") ||
      plan.contains("BroadcastHashJoin"),
      "the edit-distance self-join runs over the broadcast vocabulary, " +
        "never a shuffled cartesian of the row count")
  }

  test("q19b histogram is a partial hash aggregate on the bin id") {
    val plan = planOf(Relational.queries("q19b_histogram")(spark, sfDir))
    assert("HashAggregate".r.findAllIn(plan).size >= 2,
      "bin counts must combine map-side; the shuffle carries |bins| rows")
  }

  test("q20b collect-once HOF pipeline: one aggregation, lambdas stay " +
      "row-local (no Window, no join, no second aggregate pass)") {
    val plan = planOf(Relational.queries("q20b_array_hof")(spark, sfDir))
    assert(!plan.contains("Join") && !plan.contains("Window"),
      "all four derived facts must come from the collected array")
    assert("ObjectHashAggregate|HashAggregate|SortAggregate".r
      .findAllIn(plan).size <= 4,
      "collect_list aggregates once (partial+final) — no per-fact passes")
  }

  test("q14c RANGE frame is one Window over one sort, same as the ROWS " +
      "frame family") {
    val plan = planOf(Relational.queries("q14c_range_frame")(spark, sfDir))
    assert("Window".r.findAllIn(plan).size == 1,
      "both frame aggregates share the day-number sort")
  }

  test("q16b bag set-ops plan as count-compare aggregates, not joins") {
    val plan = planOf(Relational.queries("q16b_setops_all")(spark, sfDir))
    assert(!plan.contains("Join"),
      "INTERSECT ALL / EXCEPT ALL must be the single-shuffle replicate-" +
        "by-count aggregate, never a join per side")
  }

  test("q20c map pipeline derives and filters entries row-locally — no " +
      "join back for the per-user total") {
    val plan = planOf(Relational.queries("q20c_map")(spark, sfDir))
    assert(!plan.contains("Join"),
      "the total rides the same aggregate row as the map; shares/" +
        "filtering are transform_values/map_filter lambdas")
  }

  test("q29 funnel folds the stage chain without a single join — the " +
      "per-stage self-joins the SQL formulation needs are gone") {
    val plan = planOf(FunnelOps.queries("q29_funnel")(spark, sfDir))
    assert(!plan.contains("Join"),
      "the higher-order fold computes all four stages in one pass; any " +
        "Join means we re-scan events per stage")
  }

  test("q30 retention derives cohorts in-partition: no join back onto " +
      "events, window is partitioned") {
    val plan = planOf(FunnelOps.queries("q30_retention")(spark, sfDir))
    assert(!plan.contains("Join"),
      "first-event cohort must come from the per-user window, not a " +
        "self-join")
  }

  test("q33 lateral decorrelates: ranked window + equi join, never a " +
      "per-outer-row nested loop") {
    val plan = planOf(Relational.queries("q33_lateral")(spark, sfDir))
    // under GraftExtensions the decorrelated ranked window is further
    // rewritten into the bounded-heap TopKPerKey operator
    assert(plan.contains("Window") || plan.contains("TopKPerKey"),
      "the per-key LIMIT must plan as a ranked window (or its TopK " +
        "rewrite) over the join")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      "a lateral that re-executes per outer row would be O(|c|·|o|)")
  }

  test("q35 anomaly consumes the UNORDERED gap-fill body: no range " +
      "exchange below the window (that sort was pure waste)") {
    val plan = planOf(FunnelOps.queries("q35_anomaly")(spark, sfDir))
    // exactly one range exchange — the query's own output ORDER BY,
    // which prints ABOVE the window in the tree; none may feed it
    assert("rangepartitioning".r.findAllIn(plan).size == 1,
      "a second range exchange means q35 inherited q34's output sort " +
        "again:\n" + plan)
  }

  test("q21b EXISTS/NOT EXISTS decorrelate to semi/anti hash joins, " +
      "never a per-outer-row nested loop") {
    val plan = planOf(Relational.queries("q21b_exists")(spark, sfDir))
    assert(plan.contains("LeftSemi"), "EXISTS must plan as a semi join")
    assert(plan.contains("LeftAnti"), "NOT EXISTS must plan as an anti join")
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      "correlated EXISTS must not re-execute per outer row:\n" + plan)
  }

  test("q34b interpolation: both carry directions ride one window sort " +
      "(no second exchange below the windows)") {
    val plan = planOf(FunnelOps.queries("q34b_interpolate")(spark, sfDir))
    // backward and forward IGNORE-NULLS carries share partitioning and
    // ordering — at most the output ORDER BY's range exchange may appear
    assert("rangepartitioning".r.findAllIn(plan).size == 1,
      "a second range exchange means a carry direction re-sorted:\n" + plan)
    val hashEx = "hashpartitioning".r.findAllIn(plan).size
    assert(hashEx <= 3,
      s"expected only the daily-agg / scaffold-join / window exchanges, " +
        s"got $hashEx:\n" + plan)
  }

  test("q36 audit's referential check anti-joins against the broadcast " +
      "key side") {
    val plan = planOf(Relational.queries("q36_audit")(spark, sfDir))
    assert(plan.contains("LeftAnti"),
      "referential integrity must be an anti join, not a full join")
    assert(plan.contains("BroadcastHashJoin") ||
      plan.contains("BroadcastExchange"),
      "the key side is the small side and must broadcast")
  }

  test("q09b full outer joins two pre-aggregated unique-key sides — " +
      "the orders side collapses BEFORE the join, no nested loop") {
    val plan = planOf(Relational.queries("q09b_join_full")(spark, sfDir))
    assert(plan.contains("FullOuter"), "must plan a full outer join")
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      "full outer on an equi key must stay a hash/merge join")
    // the per-custkey aggregate must be partial (map-side combine) and
    // sit under the join, not after it
    assert("HashAggregate".r.findAllIn(plan).size >= 2,
      "orders must pre-aggregate with partial+final HashAggregate")
  }

  test("q26_temperature derives allocations from a broadcast summary — " +
      "doc rows never shuffle for the tiny per-source table") {
    val plan = planOf(SampleOps.queries("q26_temperature")(spark, sfDir))
    assert(plan.contains("BroadcastHashJoin"),
      "the |sources|-row allocation table must broadcast onto doc rows")
    assert(!plan.contains("BroadcastNestedLoopJoin") ||
      "BroadcastNestedLoopJoin".r.findAllIn(plan).size <= 1,
      "only the 1-row global-budget cross join may nest")
  }

  test("q24_lm_score counts bigrams with map-side combine and keeps " +
      "bigram extraction row-local") {
    val plan = planOf(TextOps.queries("q24_lm_score")(spark, sfDir))
    assert("HashAggregate".r.findAllIn(plan).size >= 4,
      "corpus counts and per-doc fold must both be partial+final")
    assert(plan.contains("Generate explode"),
      "bigram extraction is a row-local explode")
  }

  test("q25c_patchify is one row-local explode — no exchange before " +
      "the patch rows exist") {
    val df = graft.multimodal.Multimodal.queries("q25c_patchify")(
      spark, sfDir)
    val plan = planOf(df)
    val beforeSort = plan.split("Sort ").last // text below final sort
    assert(plan.contains("Generate explode"),
      "patch grid must be generated row-locally")
    assert("Exchange".r.findAllIn(beforeSort).size <= 1,
      "only the final output sort may exchange")
  }

  test("q23_pq scores candidates as 8 codes against a broadcast query " +
      "table — no vector ever crosses a shuffle join") {
    val plan = planOf(SimilarityOps.queries("q23_pq")(spark, sfDir))
    assert(plan.contains("BroadcastNestedLoopJoin"),
      "the 10 query rows (with their ADC tables) must broadcast")
    assert(!plan.contains("SortMergeJoin") &&
      !plan.contains("ShuffledHashJoin"),
      "the corpus side must never shuffle for the ADC join")
  }

  test("q23_ivfpq probes one cell per query through an equi hash join " +
      "on the cell id — codes shuffle, vectors never") {
    val plan = planOf(SimilarityOps.queries("q23_ivfpq")(spark, sfDir))
    assert(plan.contains("BroadcastHashJoin"),
      "label-cell restriction must plan as a broadcast equi join")
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      "the cell id gives IVF-PQ an equi key — no nested loop")
  }

  test("q26_pps gets its token position from the bucketed prefix sum " +
      "and the (total, step) row broadcasts onto the scan") {
    val plan = planOf(SampleOps.queries("q26_pps")(spark, sfDir))
    assert(plan.contains("BroadcastNestedLoopJoin") ||
      plan.contains("BroadcastHashJoin"),
      "the one-row step table must broadcast, not shuffle")
    // selection is a filter over prefix-sum output, never a sort+limit
    assert(!plan.contains("TakeOrderedAndProject") ||
      plan.indexOf("TakeOrderedAndProject") == plan.lastIndexOf(
        "TakeOrderedAndProject"), "no hidden global sort beyond output")
  }

  test("q27_pipeline composes its four stages with the right physical " +
      "choices: broadcast gram probe, anti join, no shuffled text") {
    // pin the pre-checkpoint composition (the checkpoint hides it from
    // the full query's executed plan)
    val plan = planOf(CurationOps.pipelineClean(spark, sfDir))
    assert(plan.contains("BroadcastHashJoin"),
      "the bench gram set must broadcast onto the survivor probe")
    assert(plan.contains("LeftAnti"),
      "contaminated survivors leave via an anti join")
    // the contamination probe re-joins shingles BY ID; shingle sets must
    // not ride the dedup window's exchange
    val winStart = plan.indexOf("Window")
    assert(winStart >= 0 && !plan.substring(winStart, math.min(
      plan.length, winStart + 400)).contains("shingles"),
      "dedup window must shuffle narrow rows, not shingle sets")
  }

  test("q22_dedup_spans is partial aggregates + an equi join on the span " +
      "hash — no cartesian, span strings never in the plan") {
    val plan = planOf(DedupOps.queries("q22_dedup_spans")(spark, sfDir))
    assert("HashAggregate".r.findAllIn(plan).size >= 4,
      "both the span document-frequency and the per-doc rollup must " +
        "combine map-side (partial+final each)")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      "span dedup must never plan an all-pairs join")
    assert(plan.contains("HashJoin") || plan.contains("SortMergeJoin"),
      "the frequency re-attach is an equi join on the 8-byte hash")
  }

  test("cdc1/cdc3/cdc4 decode plans keep every from_json behind the " +
      "checkpoint barrier, and their exchange budget stays flat") {
    // The r03 bench scare (cdc 14-70s official, <3.5s isolated) was
    // unfalsifiable because nothing pinned these plans. The structural
    // property that decides cdc decode cost: the parse happens ONCE,
    // before the localCheckpoint snapshot — every carry/sort fork
    // downstream re-reads the snapshot, never the json. A dropped
    // checkpoint re-parses the stream per fork (~6x historically: 30+
    // from_json nodes, 19s at sf0.1).
    val budgets = Seq( // (query, max exchanges, max windows)
      ("cdc1_decode", 6, 2), // schema-attach carry (2-level) + output sort
      ("cdc3_mysql", 1, 0),  // snapshot + range sort only
      ("cdc4_mongo", 1, 0))
    for ((q, maxEx, maxWin) <- budgets) {
      val plan = planOf(CdcOps.queries(q)(spark, sfDir))
      assert("from_json".r.findAllIn(plan).isEmpty,
        s"$q re-parses json downstream of its snapshot — a checkpoint " +
          s"barrier was dropped:\n${plan.take(1200)}")
      val ex = "Exchange".r.findAllIn(plan).size
      assert(ex <= maxEx,
        s"$q plans $ex exchanges (budget $maxEx) — a carry fork is " +
          "recomputing instead of reading the snapshot")
      assert("Window".r.findAllIn(plan).size <= maxWin,
        s"$q grew extra window passes")
    }
    // positive control: the same cdc1 chain WITHOUT its checkpoints must
    // trip the detector (this is what a regression would look like —
    // measured 38 from_json nodes / 19 exchanges when probed)
    val decoded = graft.cdc.JsonCdc.decode(CdcOps.syntheticLines(spark, sfDir))
    val unchk = graft.cdc.JsonCdc.withSchemaAttached(
      graft.cdc.JsonCdc.withTxId(
        graft.cdc.JsonCdc.filterTables(decoded, Seq("audit_log")), "seq")
        .filter(org.apache.spark.sql.functions.col("table").isNotNull),
      "seq")
    val unchkPlan = planOf(unchk)
    assert("from_json".r.findAllIn(unchkPlan).size > 1,
      "detector self-test: an un-checkpointed fork must show repeated " +
        "parses, or these assertions guard nothing")
  }

  test("q28 salted join runs the salted shuffle layout: hash join on " +
      "(key, _salt), no broadcast") {
    val plan = planOf(SkewOps.queries("q28_skew_join")(spark, sfDir))
    assert(plan.contains("ShuffledHashJoin"),
      "the dim side is too-big-to-broadcast by assumption; the hint " +
        "must pin the shuffle-hash path")
    assert(plan.contains("_salt"),
      "join keys must include the salt (the layout fix itself)")
    assert(!plan.contains("BroadcastHashJoin"),
      "a broadcast would make the salting a no-op")
  }

  test("q28c CMS builds with partial (map-side) sketch merge and probes " +
      "the one sketch row by broadcast — probes never shuffle") {
    val plan = planOf(SkewOps.queries("q28c_cms_freq")(spark, sfDir))
    // TypedImperativeAggregate plans as ObjectHashAggregate; two levels
    // (partial + final) around the exchange = counters merge map-side
    assert("ObjectHashAggregate".r.findAllIn(plan).size >= 2,
      "the sketch must combine per-partition before one-row final merge")
    assert(plan.contains("BroadcastNestedLoopJoin") ||
      plan.contains("BroadcastExchange"),
      "the single sketch row must broadcast onto the probe keys")
    assert(!plan.contains("SortMergeJoin") &&
      !plan.contains("ShuffledHashJoin"),
      "probing a 4KB sketch must never shuffle the probe side")
  }

  test("q44 triangles: closure probe joins without a cartesian and the " +
      "edge orientation reuses one checkpointed edge list") {
    val plan = planOf(GraphOps.queries("q44_triangles")(spark, sfDir))
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      "wedge generation and closure must stay equi joins — a cartesian " +
        "here is the O(n^3) failure mode")
    // oriented edge list is localCheckpointed: the wedge self-join scans
    // it twice as an in-memory table, not two re-derivations
    assert(plan.contains("Scan ExistingRDD") || plan.contains("InMemory"),
      "the oriented edge list must be materialized once and reused")
  }

  test("q43b BM25 cuts per-term top-5 through TopKPerKey and " +
      "broadcasts the 3-row probe set — tf never sorts per partition") {
    val plan = planOf(IndexOps.queries("q43b_bm25")(spark, sfDir))
    assert(plan.contains("TopKPerKey"),
      "row_number<=5 must plan as the bounded heap")
    assert(plan.contains("BroadcastHashJoin"),
      "the probe-term set must broadcast onto the tf table")
  }

  test("q19g percentile transform: the only windows run over the value " +
      "histogram, and the histogram side broadcasts back onto the rows") {
    val plan = planOf(Relational.queries("q19g_percentile")(spark, sfDir))
    assert(plan.contains("BroadcastHashJoin"),
      "the value-scale (n_chars, below) side must broadcast")
  }

  test("q45 bucketed join: zero hash exchanges — the write paid the " +
      "shuffle; join AND aggregate ride the bucket layout") {
    val plan = planOf(LayoutOps.queries("q45_bucketed_join")(spark, sfDir))
    assert(!plan.contains("Exchange hashpartitioning"),
      "bucketed join/agg on the bucket key must not re-shuffle")
    assert(plan.contains("SortMergeJoin"),
      "bucketed sides zip with a sort-merge join")
  }

  test("cdc10 join-view IVM: the three delta terms broadcast the batch " +
      "side — maintenance must not shuffle the accumulated state twice") {
    val plan = planOf(CdcOps.queries("cdc10_ivm_join")(spark, sfDir))
    assert("BroadcastHashJoin".r.findAllIn(plan).size >= 2,
      "dA ⋈ B_pre and A_pre ⋈ dB must ride broadcasts of the batch side")
    assert(!plan.contains("CartesianProduct"),
      "delta terms are custkey equi joins")
  }

  test("q23_ivf_layout: the probe dynamically prunes cell partitions — " +
      "unprobed inverted lists must never be READ, not just not compared") {
    val plan = planOf(SimilarityOps.queries("q23_ivf_layout")(spark, sfDir))
    assert(plan.toLowerCase.contains("dynamicpruning"),
      "cell scan must carry a DynamicPruningExpression partition filter")
    assert(plan.contains("BroadcastHashJoin"),
      "the query set broadcasts; the corpus side never shuffles")
  }

  test("q23_semdedup: within-cluster pairs ride the (cid, bucket) equi " +
      "join — never a nested-loop product of the corpus") {
    val plan = planOf(SimilarityOps.queries("q23_semdedup")(spark, sfDir))
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      "pair generation must stay an equi join on (cid, block-bucket)")
  }

  test("q29d session paths: the global top-20 is TakeOrderedAndProject " +
      "over the partial-agg'd path table, never a global sort") {
    val plan = planOf(FunnelOps.queries("q29d_paths")(spark, sfDir))
    assert(plan.contains("TakeOrderedAndProject"),
      "top-20 must be per-partition heaps + driver merge")
  }

  test("cdc14 transport audit: both detectors are partial-agg groupBys " +
      "— no windows, no carries, no sorts before the output order") {
    val plan = planOf(CdcOps.queries("cdc14_tx_audit")(spark, sfDir))
    assert(!plan.contains("Window"),
      "the audit must not pay any window/prefix-carry pass")
    assert("HashAggregate".r.findAllIn(plan).size >= 4,
      "tx pairing and dup detection must combine map-side")
  }

  test("q34e ACF: all seven lag columns share ONE WindowExec over the " +
      "daily aggregate (same partitioning + ordering fuse)") {
    val plan = planOf(FunnelOps.queries("q34e_acf")(spark, sfDir))
    assert("\\bWindow\\b".r.findAllIn(plan).size == 1,
      "seven lags with one sort — a second WindowExec means the fuse broke")
  }

  test("q22_snm: the 2w lead columns share ONE WindowExec and the " +
      "quadratic levenshtein never becomes a join") {
    val plan = planOf(DedupOps.queries("q22_dedup_snm")(spark, sfDir))
    assert("\\bWindow\\b".r.findAllIn(plan).size == 1,
      "w leads over one prefix-blocked sort")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("Join"),
      "SNM compares neighbors via leads, never a self-join")
  }

  test("q24_zipf: after the tf aggregate everything is histogram-scale " +
      "— no window over the token stream, carry side broadcasts") {
    val plan = planOf(TextOps.queries("q24_zipf")(spark, sfDir))
    assert(plan.contains("BroadcastHashJoin"),
      "the PrefixSum carry-in must broadcast back onto the histogram")
    assert(!plan.contains("CartesianProduct"))
  }

  test("q42c related items: pair generation stays row-local (no " +
      "self-join of the items table) and the top-5 cut is the bounded " +
      "TopKPerKey rewrite, not a full-partition sort filter") {
    val q = IndexOps.queries("q42c_related")(spark, sfDir)
    val plan = planOf(q)
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      "items must never self-join to form pairs")
    assert(plan.contains("TopKPerKey") || plan.contains("Window"),
      "per-item ranking must appear as TopKPerKey (or a keyed window)")
  }

  test("cdc15 lag report: one decode feeds both the head probe and the " +
      "per-table aggregate (snapshot cut — no second parse) and the " +
      "head joins back as a broadcast") {
    val plan = planOf(CdcOps.queries("cdc15_lag")(spark, sfDir))
    assert(!plan.contains("from_json"),
      "the decode must be snapshotted before the fan-out (a from_json " +
        "in the executed plan means a branch re-parses the stream)")
    assert(plan.contains("BroadcastNestedLoopJoin") ||
      plan.contains("BroadcastHashJoin"),
      "the one-row head must broadcast onto the aggregate")
  }

  test("q12d nearest as-of: backward and forward carries fuse into ONE " +
      "WindowExec over one user sort — no range join, no second " +
      "shuffle for the direction pick") {
    val plan = planOf(Relational.queries("q12d_asof_nearest")(spark, sfDir))
    assert("\\bWindow\\b".r.findAllIn(plan).size == 1,
      s"both frames share partitionBy+orderBy, plan:\n${plan.take(800)}")
    assert(!plan.contains("Join"), "the nearest pick is row-local CASE")
  }

  test("q38b interval union: islands come from two-level neighbor " +
      "gaps — every window is bucketed or summary-scale (never a " +
      "per-type pass over the start histogram), the summary side " +
      "broadcasts back, and nothing ever self-joins intervals") {
    val df = FunnelOps.queries("q38b_interval_union")(spark, sfDir)
    val plan = planOf(df)
    def windows(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.window.WindowExec] =
      p.collect {
        case a: org.apache.spark.sql.execution.adaptive
            .AdaptiveSparkPlanExec => windows(a.executedPlan)
        case w: org.apache.spark.sql.execution.window.WindowExec => Seq(w)
      }.flatten
    val wins = windows(df.queryExecution.executedPlan)
    assert(wins.nonEmpty, "expected the PrefixLead windows")
    wins.foreach { w =>
      val keys = w.partitionSpec.flatMap(_.references.map(_.name)).toSet
      assert(keys.contains("_b") ||
        w.child.output.exists(_.name == "_bmin"),
        s"a window partitions by ${keys.mkString(",")} over non-summary " +
          "rows — the per-type island chain is back")
    }
    assert(plan.contains("BroadcastHashJoin"),
      "the next-bucket-min summary must broadcast back onto the buckets")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("SortMergeJoin"),
      "merged islands are histogram work, never an interval self-join")
  }

  test("q36e drift: ONE corpus-scale partial aggregate — the cohort " +
      "split is conditional sums inside it, not a second scan or join") {
    val plan = planOf(Relational.queries("q36e_drift")(spark, sfDir))
    assert(!plan.contains("Join"),
      "cohorts must split via CASE inside the aggregate, not a join")
    assert(plan.contains("partial_sum") || plan.contains("HashAggregate"),
      s"expected map-side combine, plan:\n${plan.take(800)}")
  }

  test("q23_recall: the sampled query set broadcasts onto partitioned " +
      "candidates and the macro-average is a one-row broadcast, never " +
      "an unpartitioned window") {
    val plan = planOf(SimilarityOps.queries("q23_recall")(spark, sfDir))
    assert(plan.contains("BroadcastExchange"),
      "query set + mean row must broadcast")
    // (the repo-wide unpartitioned-WindowExec sweep covers the
    // no-global-window-for-the-mean half for every query, this one
    // included)
  }

  /** No Exchange may sit between the aggregate that consumes a window's
    * output and the window itself — they must share one hash exchange on
    * the same key. `aggKeyPrefix` anchors the FINAL aggregate (plans
    * print top-down: final agg, partial agg, then Window below). */
  private def assertAggRidesWindow(plan: String, aggKeyPrefix: String,
      what: String): Unit = {
    val aggIdx = plan.indexOf(s"HashAggregate(keys=[$aggKeyPrefix")
    val winIdx = plan.indexOf("Window ", aggIdx)
    assert(aggIdx >= 0 && winIdx > aggIdx,
      s"$what: expected an aggregate above a window in the printed plan")
    val between = plan.substring(aggIdx, winIdx)
    assert(!between.contains("Exchange"),
      s"$what: the aggregate must reuse the window's exchange, " +
        s"found an Exchange between them:\n$between")
  }

  test("q19j Theil-Sen: pairs never leave their row — one groupBy(pk) " +
      "exchange, no join, no window, no pair-scale sort") {
    val plan = planOf(Relational.queries("q19j_theilsen")(spark, sfDir))
    assert(!plan.contains("Join"), "pair expansion must be row-local")
    assert(!plan.contains("Window "), "median must not rank pair rows")
    val hashEx = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(hashEx == 1, s"one pk shuffle expected, got $hashEx")
  }

  test("q34g TWAP: lead-window and the per-user aggregate share ONE " +
      "user_id exchange") {
    val plan = planOf(FunnelOps.queries("q34g_twap")(spark, sfDir))
    assertAggRidesWindow(plan, "user_id", "q34g")
    val hashEx = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(hashEx == 1, s"q34g must hash-shuffle exactly once, got $hashEx")
  }

  test("q34h OHLC: both ranking windows and the bar aggregate ride ONE " +
      "(type, day) exchange") {
    val plan = planOf(FunnelOps.queries("q34h_ohlc")(spark, sfDir))
    assertAggRidesWindow(plan, "et", "q34h")
    assert("Window ".r.findAllIn(plan).size == 2,
      "expected exactly the asc and desc ranking windows")
    val hashEx = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(hashEx == 1, s"q34h must hash-shuffle exactly once, got $hashEx")
  }

  test("q35d MAD: no cumulative window partitions by event type alone " +
      "over the (continuous-valued, ≈row-scale) micro-unit histogram — " +
      "every WindowExec is either bucketed (partition keys include the " +
      "PrefixSum bucket id) or runs over per-bucket SUMMARY rows") {
    val df = FunnelOps.queries("q35d_mad")(spark, sfDir)
    def windows(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.window.WindowExec] =
      p.collect {
        case a: org.apache.spark.sql.execution.adaptive
            .AdaptiveSparkPlanExec => windows(a.executedPlan)
        case w: org.apache.spark.sql.execution.window.WindowExec => Seq(w)
      }.flatten
    val wins = windows(df.queryExecution.executedPlan)
    assert(wins.nonEmpty, "expected the PrefixSum in-bucket windows")
    wins.foreach { w =>
      val keys = w.partitionSpec.flatMap(_.references.map(_.name)).toSet
      val overSummaries = w.child.output.exists(_.name == "_bsum")
      assert(keys.contains("_b") || overSummaries,
        s"a window partitions by ${keys.mkString(",")} over non-summary " +
          "rows — the per-type cumulative skew shape is back")
    }
  }

  test("q43c phrase probe prunes BOTH postings sides before the " +
      "adjacency exchange: the w1 side via the broadcast probe join, " +
      "the w2 side via a literal IN over the declared second words — " +
      "the full token stream never shuffles on doc_id") {
    val plan = planOf(IndexOps.queries("q43c_phrase")(spark, sfDir))
    assert(plan.contains("BroadcastHashJoin"),
      s"probe list must broadcast onto the w1 postings:\n${plan.take(800)}")
    val secondWords = IndexOps.q43cPhrases.map(_._2).distinct.mkString(",")
    assert(s"IN \\($secondWords\\)".r.findFirstIn(plan).isDefined,
      "the adjacency side must be pruned map-side by the second-word " +
        s"IN list before the exchange:\n${plan.take(1200)}")
  }

  test("q18b business days: the CASE chain is one codegen projection " +
      "feeding a partial+final aggregate — no window, no extra pass") {
    val plan = planOf(Relational.queries("q18b_businessdays")(spark, sfDir))
    assert(!plan.contains("Window "), "q18b needs no window")
    assert("HashAggregate".r.findAllIn(plan).size >= 2,
      "bd totals must combine map-side before the prio shuffle")
  }

  test("q24_collocations: global top-20 is TakeOrderedAndProject over " +
      "partially-aggregated pair counts") {
    val plan = planOf(TextOps.queries("q24_collocations")(spark, sfDir))
    assert(plan.contains("TakeOrderedAndProject"),
      "top-20 must be per-partition heaps, not a vocabulary-scale sort")
    assert("HashAggregate".r.findAllIn(plan).size >= 4,
      "bigram and unigram counts must both combine map-side")
  }
}
