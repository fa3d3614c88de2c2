package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.physical.{HashPartitioning, RangePartitioning, SinglePartition}
import org.apache.spark.sql.execution.{FileSourceScanExec, GenerateExec, SortExec, SparkPlan, TakeOrderedAndProjectExec}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.aggregate.{HashAggregateExec, ObjectHashAggregateExec, SortAggregateExec}
import org.apache.spark.sql.execution.exchange.{BroadcastExchangeExec, ShuffleExchangeExec}
import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, BroadcastNestedLoopJoinExec, CartesianProductExec, ShuffledHashJoinExec, SortMergeJoinExec}
import org.apache.spark.sql.execution.window.WindowExec

/** PLAN FINGERPRINT — counts of the physical operators that decide
  * scale behavior (exchanges by partitioning kind, joins by strategy,
  * windows, aggregates, generators, scans, sorts, top-k). The
  * complement to [[PlanAudit]]: where the audit flags known
  * anti-patterns, the signature pins the WHOLE shape so any drift — an
  * extra shuffle after a refactor, a broadcast that silently became a
  * sort-merge join, a second window pass — shows up as a named diff
  * against a recorded baseline. Use it as a plan-regression gate in
  * CI: record `render(of(df))` per query at review time, diff on every
  * build (this repo does exactly that in PlanAuditSweepSpec against
  * `plan_signatures.tsv`). */
object PlanSignature {

  /** Operator counts for the query's (pre-adaptive) physical plan.
    * AQE may later improve a shape at runtime; the static plan is the
    * deterministic, stats-independent artifact worth pinning. */
  def of(df: DataFrame): Map[String, Int] = {
    val counts = scala.collection.mutable.Map.empty[String, Int]
    def add(k: String): Unit = counts(k) = counts.getOrElse(k, 0) + 1
    def walk(p: SparkPlan): Unit = p.foreach {
      case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
      case e: ShuffleExchangeExec => e.outputPartitioning match {
        case _: HashPartitioning => add("exchange_hash")
        case _: RangePartitioning => add("exchange_range")
        case SinglePartition => add("exchange_single")
        case _ => add("exchange_other")
      }
      case _: BroadcastExchangeExec => add("broadcast_exchange")
      case _: WindowExec => add("window")
      case _: SortMergeJoinExec => add("smj")
      case _: BroadcastHashJoinExec => add("bhj")
      case _: ShuffledHashJoinExec => add("shj")
      case _: BroadcastNestedLoopJoinExec => add("bnlj")
      case _: CartesianProductExec => add("cartesian")
      case _: HashAggregateExec => add("hash_agg")
      case _: ObjectHashAggregateExec => add("obj_agg")
      case _: SortAggregateExec => add("sort_agg")
      case _: GenerateExec => add("generate")
      case _: TakeOrderedAndProjectExec => add("top_k")
      case _: FileSourceScanExec => add("scan")
      case _: SortExec => add("sort")
      case _ =>
    }
    walk(df.queryExecution.executedPlan)
    counts.toMap
  }

  /** Canonical one-line form: `k=v` pairs sorted by key. */
  def render(sig: Map[String, Int]): String =
    sig.toSeq.sortBy(_._1).map { case (k, v) => s"$k=$v" }.mkString(" ")

  /** Human-readable diff of two signatures; empty when identical. */
  def diff(recorded: Map[String, Int], current: Map[String, Int])
      : Seq[String] =
    (recorded.keySet ++ current.keySet).toSeq.sorted.flatMap { k =>
      val (r, c) = (recorded.getOrElse(k, 0), current.getOrElse(k, 0))
      if (r == c) None else Some(s"$k: recorded $r, now $c")
    }
}
