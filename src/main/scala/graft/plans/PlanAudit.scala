package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
import org.apache.spark.sql.execution.window.WindowExec

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

  /** One detected scale risk. */
  case class Finding(kind: String, detail: String)

  val CartesianJoin = "cartesian-join"
  val UnpartitionedWindow = "unpartitioned-window"
  val NestedLoopJoin = "nested-loop-join"
  val SkewedWindow = "skewed-window"

  /** Walk the executed plan (through AQE wrappers) and collect risks:
    *   - `cartesian-join`: CartesianProductExec — O(|L|·|R|) rows;
    *   - `nested-loop-join`: BroadcastNestedLoopJoinExec — per-row
    *     scan of the broadcast side, legitimate only when one side is
    *     tiny or the predicate is genuinely non-equi;
    *   - `unpartitioned-window`: WindowExec with an empty partition
    *     spec — the whole dataset in ONE task (Spark itself warns at
    *     runtime; this surfaces it at plan time). */
  def audit(df: DataFrame): Seq[Finding] = {
    val buf = scala.collection.mutable.Buffer[Finding]()
    def walk(p: SparkPlan): Unit = p.foreach {
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
    * A window is exempt when its input is a per-bucket SUMMARY frame
    * (output carries the `_b` bucket id — the two-level PrefixSum /
    * PrefixCarry cross-bucket carry, whose partition count is
    * #buckets·|keys|, data-scaled by construction). False negatives are
    * possible (a renamed alias), false positives go on the caller's
    * allowlist with the reason the input is genuinely bounded. */
  def auditSkewedWindows(df: DataFrame, lowCard: Set[String])
      : Seq[Finding] = {
    val lc = lowCard.map(_.toLowerCase)
    val buf = scala.collection.mutable.Buffer[Finding]()
    def walk(p: SparkPlan): Unit = p.foreach {
      case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
      case w: WindowExec if w.partitionSpec.nonEmpty =>
        val keys = w.partitionSpec.flatMap(_.references.map(_.name))
        val summaryInput = w.child.output.exists(_.name == "_b")
        if (keys.nonEmpty && keys.forall(k => lc(k.toLowerCase)) &&
            !summaryInput)
          buf += Finding(SkewedWindow, keys.mkString(","))
      case _ =>
    }
    walk(df.queryExecution.executedPlan)
    buf.toSeq
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
