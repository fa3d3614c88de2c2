package graft.plans

import org.apache.spark.sql.{DataFrame, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions
import org.apache.spark.sql.catalyst.plans.logical
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.aggregate.ScalaAggregator
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
import org.apache.spark.sql.execution.window.WindowExec
import org.apache.spark.sql.functions.{count, count_distinct, lit, struct}

/** PLAN LINT — the scale-killer checklist as a library API: walk a
  * query's physical plan and report the patterns that decide 100 TB
  * behavior before the job runs. The same assertions PlanShapeSpec
  * pins for this repo's own queries, packaged for users composing
  * their own plans on top of the engine (audit in CI, gate a
  * scheduled job, print findings next to `.explain`).
  *
  * Findings are advisory signals, not errors: a cartesian over two
  * 10-row dimension frames is fine — which is why `audit` returns
  * data and `require`-style enforcement is the caller's policy
  * (`assertClean` for the common strict case with an allowlist). */
object PlanAudit {

  /** One detected scale risk. `subject` — the query (or other unit)
    * the finding is ABOUT, carried structurally so callers that
    * partition findings by query (the scaling sweep's fatal/advisory
    * gate) never re-parse the human-readable detail text; empty when
    * the producer has no per-query subject (the plan walks, whose
    * findings describe the one plan being audited). */
  case class Finding(kind: String, detail: String, subject: String = "")

  val CartesianJoin = "cartesian-join"
  val UnpartitionedWindow = "unpartitioned-window"
  val NestedLoopJoin = "nested-loop-join"
  val SkewedWindow = "skewed-window"
  val ScalaUdf = "scala-udf"

  /** Walk the executed plan (through AQE wrappers) and collect risks:
    *   - `cartesian-join`: CartesianProductExec — O(|L|·|R|) rows;
    *   - `nested-loop-join`: BroadcastNestedLoopJoinExec — per-row
    *     scan of the broadcast side, legitimate only when one side is
    *     tiny or the predicate is genuinely non-equi;
    *   - `unpartitioned-window`: WindowExec with an empty partition
    *     spec — the whole dataset in ONE task (Spark itself warns at
    *     runtime; this surfaces it at plan time);
    *   - `scala-udf`: a ScalaUDF / typed Aggregator anywhere in the
    *     plan's expressions — an opaque black box to Catalyst (no
    *     predicate pushdown or constant folding through it) that
    *     breaks whole-stage codegen and pays per-row
    *     serialization. Native `functions._` or a codegen'd custom
    *     Expression does the same work in the generated loop; this
    *     repo's own surface carries ZERO (pinned by the sweep). */
  def audit(df: DataFrame): Seq[Finding] = {
    val buf = scala.collection.mutable.Buffer[Finding]()
    def walk(p: SparkPlan): Unit = p.foreach { n =>
      n match {
        case w: WindowExec if w.partitionSpec.isEmpty =>
          buf += Finding(UnpartitionedWindow,
            w.windowExpression.map(_.sql).mkString(", "))
        case _: CartesianProductExec =>
          buf += Finding(CartesianJoin, "CartesianProductExec")
        case j: BroadcastNestedLoopJoinExec =>
          buf += Finding(NestedLoopJoin,
            s"BroadcastNestedLoopJoinExec(${j.joinType})")
        case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
        case _ =>
      }
      n.expressions.foreach(_.foreach {
        case u: expressions.ScalaUDF =>
          buf += Finding(ScalaUdf, s"ScalaUDF " +
            s"${u.udfName.getOrElse("<anonymous>")}(${u.children.size} " +
            s"arg) in ${n.nodeName}")
        case _: ScalaAggregator[_, _, _] =>
          buf += Finding(ScalaUdf, s"typed Aggregator in ${n.nodeName}")
        case _ =>
      })
      // subquery plans (scalar subqueries, DPP SubqueryBroadcast) are
      // separate trees hanging off expressions — audit them too
      n.subqueries.foreach(walk)
    }
    walk(df.queryExecution.executedPlan)
    buf.toSeq
  }

  /** Advisory skew lint: WindowExec whose partition keys ALL come from
    * a DECLARED low-cardinality column set (`lowCard`, matched by
    * attribute name). Such a window has at most |domain-product| tasks
    * at ANY data size — the q35d/q41c class: hash-green at test scale,
    * ~n/|domain| rows through one task at 100×. The partitioned-window
    * lint in [[audit]] cannot see it (the partition spec is non-empty),
    * which is exactly how the class ships.
    *
    * Name-based by design: cardinality is a property of the DATA, so
    * the caller annotates which column names are bounded domains (event
    * types, languages, nation keys, component roots after a CC pass).
    * A window is exempt when it IS the two-level prefix family's own
    * machinery, recognized by its structural markers: the `_b` / `_sb`
    * bucket ids among the PARTITION keys (level 1 / in-super carry) or
    * the `_bsum` / `_bmin` per-bucket aggregates in the child output
    * (the across-super summary fold — ≤ superSize rows per key by the
    * BucketedScan recursion bound). A `_b`-named column merely passing
    * through a user frame's output no longer exempts it. False
    * negatives are possible (a renamed alias), false positives go on
    * the caller's allowlist with the reason the input is genuinely
    * bounded. */
  def auditSkewedWindows(df: DataFrame, lowCard: Set[String])
      : Seq[Finding] = {
    val lc = lowCard.map(_.toLowerCase)
    val buf = scala.collection.mutable.Buffer[Finding]()
    def walk(p: SparkPlan): Unit = p.foreach {
      case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
      case w: WindowExec if w.partitionSpec.nonEmpty =>
        val keys = w.partitionSpec.flatMap(_.references.map(_.name))
        val bucketKeyed = keys.exists(k => k == "_b" || k == "_sb")
        val summaryFold =
          w.child.output.exists(a => a.name == "_bsum" || a.name == "_bmin")
        if (keys.nonEmpty && keys.forall(k => lc(k.toLowerCase)) &&
            !bucketKeyed && !summaryFold)
          buf += Finding(SkewedWindow, keys.mkString(","))
      case _ =>
    }
    walk(df.queryExecution.executedPlan)
    buf.toSeq
  }

  /** Measured shape of one Window node's input: its partition-key
    * column names, the input row count, and the distinct key-tuple
    * count — on whatever data `df` reads. `exempt` marks the
    * two-level prefix family's own carry windows (see
    * [[auditSkewedWindows]]' structural markers), whose key count is
    * #buckets-scaled by construction. */
  case class WindowCardinality(keys: Seq[String], inputRows: Long,
      distinctKeys: Long, exempt: Boolean) {
    /** distinct keys per 100 input rows; 100 when the input is empty. */
    def ratioPct: Double =
      if (inputRows == 0) 100.0 else 100.0 * distinctKeys / inputRows
  }

  /** DATA-DRIVEN skew audit: for every partitioned Window in the
    * optimized logical plan, EXECUTE its input subplan (one
    * count + count-distinct agg each) and measure how many distinct
    * partition-key tuples feed it. A window whose key cardinality is a
    * sliver of its input rows has that sliver's reciprocal as its
    * maximum parallelism at any scale — the q35d/q41c class, caught
    * here by MEASUREMENT instead of a maintained column-name list, so
    * a renamed alias cannot slip past (the false-negative class the
    * name-based lint documents).
    *
    * Run it on a small representative fixture: it pays one Spark job
    * per distinct window input (`memo` dedupes identical subplans
    * across calls — pass a shared map when sweeping many queries that
    * reuse frames). Windows keyed on a genuinely bounded-domain input
    * (a histogram, a day series) also measure low — the caller
    * allowlists those WITH a row-count cap so the claim stays
    * verified (see PlanAuditSweepSpec). */
  def windowCardinalities(df: DataFrame,
      memo: scala.collection.mutable.Map[(logical.LogicalPlan, Seq[String]),
        (Long, Long)] = scala.collection.mutable.Map.empty,
      measureExempt: Boolean = true): Seq[WindowCardinality] = {
    val spark = df.sparkSession
    val buf = scala.collection.mutable.Buffer[WindowCardinality]()
    df.queryExecution.optimizedPlan.foreach {
      case w: logical.Window if w.partitionSpec.nonEmpty =>
        val keyNames = w.partitionSpec.flatMap(_.references.map(_.name))
        val exempt =
          keyNames.exists(k => k == "_b" || k == "_sb") ||
            w.child.output.exists(a => a.name == "_bsum" || a.name == "_bmin")
        // exempt prefix-family carry windows are dropped by every
        // finding fold — callers that only fold (the sweeps) skip the
        // count job entirely with measureExempt = false; display
        // callers (the CLI report) keep the measured numbers
        if (exempt && !measureExempt)
          buf += WindowCardinality(keyNames, -1, -1, exempt = true)
        else {
          val memoKey = (w.child.canonicalized,
            w.partitionSpec.map(_.canonicalized.toString))
          val (n, k) = memo.getOrElseUpdate(memoKey, {
            val keyCols = w.partitionSpec.map(GraftColumnBridge.column)
            val r = GraftColumnBridge.ofRows(spark, w.child)
              .agg(count(lit(1)), count_distinct(struct(keyCols: _*)))
              .head()
            (r.getLong(0), r.getLong(1))
          })
          buf += WindowCardinality(keyNames, n, k, exempt)
        }
      case _ =>
    }
    buf.toSeq
  }

  /** [[windowCardinalities]] folded to findings: every non-exempt
    * window with at least `minRows` input rows whose distinct-key
    * count is BOTH below `maxPct`% of them AND at most `maxKeys` in
    * absolute terms. The two conditions separate the two shapes a low
    * ratio can mean: bounded KEYS (a 5-value enum — fixed parallelism
    * forever, the skew class) versus bounded ROWS-PER-KEY (a
    * per-document window over its ~100 tokens — low ratio, but the
    * key count scales with the corpus and so does the parallelism;
    * `maxKeys` clears it). */
  def auditSkewedWindowsByData(df: DataFrame, minRows: Long = 500,
      maxPct: Double = 1.0, maxKeys: Long = 1000,
      memo: scala.collection.mutable.Map[(logical.LogicalPlan, Seq[String]),
        (Long, Long)] = scala.collection.mutable.Map.empty)
      : Seq[Finding] =
    windowCardinalities(df, memo, measureExempt = false).collect {
      case c if !c.exempt && c.inputRows >= minRows &&
          c.distinctKeys <= maxKeys && c.ratioPct < maxPct =>
        Finding(SkewedWindow, f"keys=${c.keys.mkString(",")} " +
          f"rows=${c.inputRows} distinct=${c.distinctKeys} " +
          f"(${c.ratioPct}%.2f%%)")
    }

  /** Measured shape of one Join node: input row counts, output row
    * count, and the multiplier the join applied. `blowup` > 1 means
    * the join EMITS more rows than its larger input — a many-to-many
    * key collision (or deliberate replication). The ratio is scale-
    * free for genuine key-collision blowups: duplicate-key fanout
    * grows with the data, so a modest fixture multiplier becomes the
    * dominant cost at 100 TB. */
  case class JoinCardinality(joinType: String, condition: String,
      leftRows: Long, rightRows: Long, outRows: Long) {
    def blowup: Double = {
      val base = math.max(leftRows, rightRows)
      if (base == 0) 0.0 else outRows.toDouble / base
    }
  }

  /** DATA-DRIVEN join audit, the windowCardinalities sibling for the
    * OTHER silent scale-killer: a join that multiplies. For every Join
    * in the optimized logical plan, execute its two input subplans and
    * the join itself (one count each, `memo`-deduped across a sweep)
    * and report the measured blowup. An accidental many-to-many —
    * joining on a non-unique key both sides, the classic fan-out trap
    * — passes row/hash correctness at test scale and detonates at
    * 100x; here it shows up as outRows ≫ max(inputs) on the fixture.
    * Semi/anti joins are skipped (output ≤ left by construction). */
  def joinCardinalities(df: DataFrame,
      memo: scala.collection.mutable.Map[logical.LogicalPlan, Long] =
        scala.collection.mutable.Map.empty): Seq[JoinCardinality] = {
    val spark = df.sparkSession
    def rowsOf(p: logical.LogicalPlan): Long =
      memo.getOrElseUpdate(p.canonicalized,
        GraftColumnBridge.ofRows(spark, p).count())
    val buf = scala.collection.mutable.Buffer[JoinCardinality]()
    df.queryExecution.optimizedPlan.foreach {
      case j: logical.Join => j.joinType match {
        case org.apache.spark.sql.catalyst.plans.LeftSemi |
             org.apache.spark.sql.catalyst.plans.LeftAnti =>
        case jt =>
          buf += JoinCardinality(jt.sql,
            j.condition.map(_.sql).getOrElse("<cross>"),
            rowsOf(j.left), rowsOf(j.right), rowsOf(j))
      }
      case _ =>
    }
    buf.toSeq
  }

  val JoinExplosion = "join-explosion"

  /** [[joinCardinalities]] folded to findings: joins whose measured
    * output exceeds `minOut` rows AND `maxBlowup` times the larger
    * input. Deliberate replication (interval spanning-bins, grid
    * crosses, shingle expansion) goes on the caller's allowlist with
    * the domain bound that caps it. */
  def auditJoinExplosion(df: DataFrame, minOut: Long = 1000,
      maxBlowup: Double = 4.0,
      memo: scala.collection.mutable.Map[logical.LogicalPlan, Long] =
        scala.collection.mutable.Map.empty): Seq[Finding] =
    joinCardinalities(df, memo).collect {
      case c if c.outRows >= minOut && c.blowup > maxBlowup =>
        Finding(JoinExplosion, f"${c.joinType} out=${c.outRows} " +
          f"left=${c.leftRows} right=${c.rightRows} " +
          f"(${c.blowup}%.1fx) on ${c.condition.take(60)}")
    }

  val WideCheckpoint = "wide-checkpoint"

  /** One eagerly-materialized input (a `localCheckpoint` — the plan
    * shows it as a LogicalRDD leaf) pinned in executor-local storage:
    * its schema and measured row count. A pin is the right tool for
    * exactly two shapes, and this profile carries the number that
    * tells them apart from the failure class:
    *   - an aggregate/histogram-scale frame a query forks (sublinear
    *     rows at any corpus size — the PrefixSum inputs), or
    *   - an iterative loop's per-round state (corpus-scale rows by
    *     design, so the WIDTH must be minimal — the CC/k-core/BPE
    *     frontier, the standard lineage cut).
    * A WIDE, corpus-scale pin that is neither (the pre-round-7 q14b:
    * the full orders projection) holds table-size bytes in
    * non-reliable storage and truncates lineage — a lost executor
    * fails the job instead of recomputing a cheap re-scan. */
  case class CheckpointProfile(cols: Seq[String], rows: Long)

  /** Every checkpointed (LogicalRDD) input under `df`, with measured
    * row counts (`memo` dedupes shared pins across a sweep by RDD id
    * — one cheap count job each; the RDD is already materialized). */
  def checkpointProfiles(df: DataFrame,
      memo: scala.collection.mutable.Map[Int, Long] =
        scala.collection.mutable.Map.empty): Seq[CheckpointProfile] = {
    val buf = scala.collection.mutable.Buffer[CheckpointProfile]()
    df.queryExecution.optimizedPlan.foreach {
      case l: org.apache.spark.sql.execution.LogicalRDD =>
        buf += CheckpointProfile(l.output.map(_.name),
          memo.getOrElseUpdate(l.rdd.id, l.rdd.count()))
      case _ =>
    }
    buf.toSeq
  }

  /** [[checkpointProfiles]] folded to findings: pins holding at least
    * `minRows` rows AND more than `maxCols` columns — corpus-scale
    * width-times-rows in executor-local storage. Run on a fixture;
    * iterative frontiers stay under the width bar, histogram pins
    * under the row bar, and the wide-snapshot failure class trips. */
  def auditWideCheckpoints(df: DataFrame, minRows: Long = 500,
      maxCols: Int = 4,
      memo: scala.collection.mutable.Map[Int, Long] =
        scala.collection.mutable.Map.empty): Seq[Finding] =
    checkpointProfiles(df, memo).collect {
      case c if c.rows >= minRows && c.cols.size > maxCols =>
        Finding(WideCheckpoint, s"${c.cols.size} cols x ${c.rows} rows " +
          s"pinned (${c.cols.mkString(",").take(80)})")
    }.distinct // a forked pin appears once per plan occurrence

  val UnprunedScan = "unpruned-scan"

  /** Plan-time shape of one file scan: which columns actually reach
    * the reader (`ReadSchema`) versus the file's full width, and what
    * got pushed below it. The two numbers decide I/O at any scale — a
    * scan that reads every column of a wide table for a two-column
    * projection multiplies bytes-off-disk by the width ratio forever,
    * and columnar formats make the fix free WHEN the plan lets
    * Catalyst prune (an opaque UDF over the whole row, a lineage cut
    * before the projection, or a genuine select-* defeats it). */
  case class ScanProfile(table: String, readCols: Seq[String],
      totalCols: Int, pushedFilters: Seq[String],
      partitionFilters: Seq[String]) {
    def pruned: Boolean = readCols.size < totalCols
  }

  /** Every parquet/file scan in the (final adaptive) plan, derived
    * from the plan only — nothing executed. Scans hidden behind an
    * eager materialization (localCheckpoint → ExistingRDD) ran in a
    * separate query execution and do not appear; audit the frame
    * BEFORE the cut for those. */
  def scanProfiles(df: DataFrame): Seq[ScanProfile] = {
    val buf = scala.collection.mutable.Buffer[ScanProfile]()
    def walk(p: SparkPlan): Unit = p match {
      case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
      case s: QueryStageExec => walk(s.plan)
      case f: FileSourceScanExec =>
        walkScan(f)
        // a DPP / runtime-filter subquery hangs off the scan's OWN
        // partitionFilters — the dimension scan inside it is a scan too
        f.subqueries.foreach(walk)
      case other =>
        // descend into subquery plans too: a scalar subquery or a DPP
        // SubqueryBroadcast carries its own scan, invisible to a
        // children-only walk
        (other.children ++ other.subqueries).foreach(walk)
    }
    def walkScan(f: FileSourceScanExec): Unit = {
      // metadata("PushedFilters") is the same "[IsNotNull(x), ...]"
      // string .explain prints (the typed field is protected) — split
      // into one element PER FILTER at bracket depth 0, so consumers
      // counting or rendering per-filter aren't handed one
      // comma-joined blob (nested commas, e.g. In(c, [1,2]) or
      // Or(a, b), stay inside their filter)
      val pushed = f.metadata.get("PushedFilters").toSeq
        .flatMap(s => splitTopLevel(s.stripPrefix("[").stripSuffix("]")))
      buf += ScanProfile(
        f.relation.location.rootPaths.headOption
          .map(_.getName).getOrElse("<unknown>"),
        f.requiredSchema.fieldNames.toSeq,
        f.relation.dataSchema.size,
        pushed,
        f.partitionFilters.map(_.sql))
    }
    walk(df.queryExecution.executedPlan)
    buf.toSeq
  }

  /** Split a rendered filter list on commas at bracket depth 0 — the
    * separators BETWEEN filters, never the ones inside a nested
    * `Or(...)` / `In(c, [1,2])`. Filter VALUES are rendered raw and
    * unquoted, so a literal containing an unbalanced bracket (e.g.
    * `StringStartsWith(name,ab(c)`) corrupts depth counting; when the
    * input ends unbalanced (or ever dips negative) the split is
    * untrustworthy and the whole string comes back as ONE element —
    * the safe degenerate reading — instead of gluing the tail. */
  private[plans] def splitTopLevel(s: String): Seq[String] = {
    val out = scala.collection.mutable.Buffer[String]()
    val cur = new StringBuilder
    var depth = 0
    var corrupt = false
    s.foreach {
      case c @ ('(' | '[') => depth += 1; cur += c
      case c @ (')' | ']') =>
        depth -= 1; if (depth < 0) corrupt = true; cur += c
      case ',' if depth == 0 => out += cur.toString.trim; cur.clear()
      case c => cur += c
    }
    if (cur.nonEmpty) out += cur.toString.trim
    if (corrupt || depth != 0) Seq(s.trim).filter(_.nonEmpty)
    else out.toSeq.filter(_.nonEmpty)
  }

  /** [[scanProfiles]] folded to findings: scans of a table at least
    * `minCols` wide that read EVERY column. Narrow tables (a 3-column
    * dimension) are exempt — reading all of one is the query, not a
    * pruning failure. Deliberate full-width reads (a schema audit, a
    * select-* export) go on the caller's allowlist with the reason. */
  def auditUnprunedScans(df: DataFrame, minCols: Int = 5): Seq[Finding] =
    scanProfiles(df).collect {
      case s if !s.pruned && s.totalCols >= minCols =>
        Finding(UnprunedScan,
          s"${s.table}: reads all ${s.totalCols} columns" +
            (if (s.pushedFilters.isEmpty && s.partitionFilters.isEmpty)
              ", nothing pushed down" else ""))
    }

  /** Strict gate: throw (with every finding listed) unless each
    * finding's kind is allowlisted. `allow` names the risks the caller
    * has judged intentional — e.g. `Set(PlanAudit.CartesianJoin)` for
    * a deliberate tiny-dimension grid. */
  def assertClean(df: DataFrame, allow: Set[String] = Set.empty): Unit = {
    val bad = audit(df).filterNot(f => allow.contains(f.kind))
    require(bad.isEmpty,
      "plan audit found scale risks:\n" +
        bad.map(f => s"  [${f.kind}] ${f.detail}").mkString("\n"))
  }
}
