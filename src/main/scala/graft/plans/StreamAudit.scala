package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

import PlanAudit.Finding

/** STREAMING-STATE LINT — the [[PlanAudit]] sibling for the third
  * surface: what a Structured Streaming query KEEPS. A batch plan's
  * scale risks are shuffles and fanouts; a streaming plan's is state
  * store growth — every stateful operator (aggregate, dedup,
  * stream-stream join, *GroupsWithState) holds rows in the state
  * store between micro-batches, and without an eviction bound that
  * store grows with the stream's LIFETIME, not its rate. The failure
  * ships silently: a test feeds minutes of data and passes; the
  * production query leaks until the state store (or the executor)
  * dies — weeks later.
  *
  * Findings are advisory, same contract as [[PlanAudit.audit]]: an
  * all-time bounded-key aggregate (a leaderboard over an enum domain)
  * is legitimate and goes on the caller's allowlist with the reason
  * the key domain is bounded. */
object StreamAudit {

  /** A stateful operator with no event-time watermark to evict by. */
  val UnboundedState = "unbounded-state"

  /** `*GroupsWithState` keeping per-key state that never times out —
    * sound only when the state is fixed-size per key AND the key
    * domain is the bounded business-entity set. */
  val NoStateTimeout = "no-state-timeout"

  private def hasWatermark(p: LogicalPlan): Boolean =
    p.exists(_.isInstanceOf[logical.EventTimeWatermark])

  /** Walk a STREAMING frame's analyzed plan and report every stateful
    * operator whose state has no eviction bound. Batch frames return
    * no findings (nothing is kept between batches). The watermark
    * check is presence-only by design: for stream-stream joins Spark
    * itself rejects a missing time-bound join condition at start, but
    * a missing watermark on an inner join only surfaces as unbounded
    * buffering. */
  def audit(df: DataFrame): Seq[Finding] = {
    if (!df.isStreaming) return Nil
    val buf = scala.collection.mutable.Buffer[Finding]()
    df.queryExecution.analyzed.foreach {
      case a: logical.Aggregate
          if a.child.isStreaming && !hasWatermark(a.child) =>
        buf += Finding(UnboundedState,
          "streaming aggregate keyed [" +
            a.groupingExpressions.map(_.sql).mkString(", ").take(60) +
            "] with no upstream watermark — one state row per key, kept " +
            "for the stream's lifetime")
      case d: logical.Deduplicate
          if d.child.isStreaming && !hasWatermark(d.child) =>
        buf += Finding(UnboundedState,
          "streaming dropDuplicates[" +
            d.keys.map(_.name).mkString(", ").take(60) +
            "] with no watermark — the seen-key set grows with the stream")
      case j: logical.Join
          if j.left.isStreaming && j.right.isStreaming &&
            (!hasWatermark(j.left) || !hasWatermark(j.right)) =>
        val side =
          if (!hasWatermark(j.left) && !hasWatermark(j.right)) "either side"
          else if (!hasWatermark(j.left)) "the left side"
          else "the right side"
        buf += Finding(UnboundedState,
          s"stream-stream ${j.joinType.sql} join with no watermark on " +
            s"$side — buffered rows are never evicted")
      case f: logical.FlatMapGroupsWithState
          if f.timeout.toString.contains("NoTimeout") =>
        buf += Finding(NoStateTimeout,
          "flatMapGroupsWithState(NoTimeout) — per-key state never " +
            "expires; sound only for fixed-size state over a bounded " +
            "key domain")
      case _ =>
    }
    buf.toSeq
  }
}
