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
