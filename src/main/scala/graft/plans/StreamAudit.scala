package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.Alias
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

  /** A stateful operator with no state-eviction bound — either no
    * event-time watermark upstream, or (for aggregates and dedups) a
    * watermark whose event-time column never reaches the grouping /
    * dedup keys, which Spark needs to evict by (a watermarked
    * `groupBy(user_id).count()` in update mode keeps one state row per
    * key for the stream's lifetime — the watermark alone evicts
    * nothing). */
  val UnboundedState = "unbounded-state"

  /** `*GroupsWithState` keeping per-key state that never times out —
    * sound only when the state is fixed-size per key AND the key
    * domain is the bounded business-entity set. */
  val NoStateTimeout = "no-state-timeout"

  private def hasWatermark(p: LogicalPlan): Boolean =
    p.exists(_.isInstanceOf[logical.EventTimeWatermark])

  /** Spark's OWN eviction criterion, checked the way the physical
    * operators check it (WatermarkSupport.watermarkExpression): a
    * grouping/dedup key expression must BE an attribute carrying the
    * `EventTimeWatermark.delayKey` METADATA. The metadata survives
    * exactly the transformations Spark can evict through — a plain
    * rename (Alias over an attribute inherits metadata) and the
    * `window()`/`session_window()` rewrites (TimeWindowing copies it
    * onto the window attribute) — and is DROPPED by any computed
    * derivation (`date_trunc(ts)`, casts, arithmetic), which is
    * faithful: Spark cannot evict by those either, because it cannot
    * know how the derivation maps onto the advancing watermark. A
    * references-based or alias-tracing check would mark such
    * derivations clean and re-admit the watermark-present-but-
    * unevictable false-negative class this lint exists to close. */
  private def evictableBy(
      exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression])
      : Boolean =
    exprs.exists {
      case a: org.apache.spark.sql.catalyst.expressions.Attribute =>
        a.metadata.contains(logical.EventTimeWatermark.delayKey)
      case al: Alias =>
        al.metadata.contains(logical.EventTimeWatermark.delayKey)
      case _ => false
    }

  /** Walk a STREAMING frame's analyzed plan and report every stateful
    * operator whose state has no eviction bound. Batch frames return
    * no findings (nothing is kept between batches). For aggregates and
    * dedups the check is watermark-presence AND a watermark-carrying
    * key ([[evictableBy]] — Spark's own metadata criterion): a
    * watermark that never reaches the keys, or reaches them only
    * through a computed derivation that drops the metadata, is the
    * silent-leak false negative this lint exists to catch.
    * `dropDuplicatesWithinWatermark` evicts by arrival horizon instead
    * and only needs the watermark present. For stream-stream joins the
    * check stays presence-only by design: Spark itself rejects a
    * missing time-bound join condition at start, but a missing
    * watermark on an inner join only surfaces as unbounded
    * buffering. */
  def audit(df: DataFrame): Seq[Finding] = {
    if (!df.isStreaming) return Nil
    val buf = scala.collection.mutable.Buffer[Finding]()
    df.queryExecution.analyzed.foreach {
      case a: logical.Aggregate
          if a.child.isStreaming &&
            !(hasWatermark(a.child) &&
              evictableBy(a.groupingExpressions)) =>
        val why =
          if (!hasWatermark(a.child)) "no upstream watermark"
          else "no watermark-carrying event-time attribute among the " +
            "grouping keys (watermark present but nothing to evict by " +
            "— a computed derivation like date_trunc drops the " +
            "watermark metadata Spark evicts on)"
        buf += Finding(UnboundedState,
          "streaming aggregate keyed [" +
            a.groupingExpressions.map(_.sql).mkString(", ").take(60) +
            s"] with $why — one state row per key, kept for the " +
            "stream's lifetime")
      case d: logical.Deduplicate
          if d.child.isStreaming &&
            !(hasWatermark(d.child) && evictableBy(d.keys)) =>
        val why =
          if (!hasWatermark(d.child)) "no watermark"
          else "no watermark-carrying event-time column among the keys " +
            "(state is only evicted when a key attribute carries the " +
            "watermark metadata; use dropDuplicatesWithinWatermark to " +
            "evict by arrival horizon)"
        buf += Finding(UnboundedState,
          "streaming dropDuplicates[" +
            d.keys.map(_.name).mkString(", ").take(60) +
            s"] with $why — the seen-key set grows with the stream")
      case d: logical.DeduplicateWithinWatermark
          if d.child.isStreaming && !hasWatermark(d.child) =>
        buf += Finding(UnboundedState,
          "dropDuplicatesWithinWatermark[" +
            d.keys.map(_.name).mkString(", ").take(60) +
            "] with no watermark — nothing bounds the seen-key set")
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
