package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ReusedExchangeExec

/** MEASURED cost profile of one query execution: run it once (full
  * materialization, nothing written or collected), then read the
  * per-operator SQL metrics Spark already accumulated off the FINAL
  * adaptive plan. Where [[PlanAudit]] predicts scale behavior from the
  * plan's shape, this reports what actually flowed: rows out of every
  * operator, bytes through every exchange — the numbers that say which
  * shuffle dominates and whether a filter cut what it should, at
  * whatever data scale `df` reads.
  *
  * The walk descends AQE's materialized stage wrappers
  * (QueryStageExec is a LEAF whose subtree hangs off `.plan`) and
  * reused exchanges, so profile rows line up with the plan the run
  * actually executed, not the pre-AQE sketch. */
object PlanProfile {

  /** One operator's measured output: `rows` from `numOutputRows`
    * (shuffle record count for exchanges that track writes instead),
    * `bytes` from `dataSize` where the operator reports it (exchanges,
    * broadcasts). `reused` marks a ReusedExchange reference — its
    * subtree ran once under the original exchange. */
  case class NodeProfile(depth: Int, name: String, rows: Option[Long],
      bytes: Option[Long], reused: Boolean = false)

  /** Execute `df` once and return the per-operator profile in plan
    * order (parents before children, children indented by `depth`).
    * Runs `df`'s OWN query execution (`toRdd` + a do-nothing foreach:
    * full materialization, nothing collected to the driver) — a sink
    * write would build a separate QueryExecution and leave this one's
    * metrics at zero. */
  def measure(df: DataFrame): Seq[NodeProfile] = {
    df.queryExecution.toRdd.foreach(_ => ())
    profileOf(df)
  }

  /** The profile of an ALREADY-EXECUTED frame (metrics are zero for
    * plans that never ran — [[measure]] is the usual entry). */
  def profileOf(df: DataFrame): Seq[NodeProfile] = {
    val buf = scala.collection.mutable.Buffer[NodeProfile]()
    def metric(p: SparkPlan, key: String): Option[Long] =
      p.metrics.get(key).map(_.value).filter(_ > 0)
    def walk(p: SparkPlan, depth: Int): Unit = p match {
      case a: AdaptiveSparkPlanExec => walk(a.executedPlan, depth)
      case s: QueryStageExec => walk(s.plan, depth)
      case r: ReusedExchangeExec =>
        buf += NodeProfile(depth, r.nodeName,
          metric(r, "numOutputRows"), metric(r, "dataSize"), reused = true)
      case other =>
        val rows = metric(other, "numOutputRows")
          .orElse(metric(other, "shuffleRecordsWritten"))
        buf += NodeProfile(depth, other.nodeName, rows,
          metric(other, "dataSize"))
        other.children.foreach(walk(_, depth + 1))
    }
    walk(df.queryExecution.executedPlan, 0)
    buf.toSeq
  }

  /** Human units for the report (SI, one decimal past KiB). */
  private def fmtBytes(b: Long): String =
    if (b < 1024) s"${b}B"
    else if (b < 1024 * 1024) f"${b / 1024.0}%.1fKiB"
    else if (b < 1024L * 1024 * 1024) f"${b / 1024.0 / 1024}%.1fMiB"
    else f"${b / 1024.0 / 1024 / 1024}%.2fGiB"

  /** The profile as indented report lines (the CLI's `--profile`). */
  def render(profile: Seq[NodeProfile]): Seq[String] =
    profile.map { n =>
      val rows = n.rows.map(r => s" rows=$r").getOrElse("")
      val bytes = n.bytes.map(b => s" bytes=${fmtBytes(b)}").getOrElse("")
      val reused = if (n.reused) " (reused)" else ""
      s"${"  " * n.depth}${n.name}$rows$bytes$reused"
    }
}
