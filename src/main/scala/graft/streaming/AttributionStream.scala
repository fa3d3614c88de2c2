package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** S12: LIVE last-touch attribution — the streaming twin of
  * graft.queries.FunnelOps.q29c_attribution. Per-user keyed state
  * carries ONE string (the most recent non-purchase event type); each
  * purchase in a microbatch emits an attributed row (channel, value)
  * the moment it arrives — the real-time revenue dashboard the batch
  * op reports retrospectively.
  *
  * Semantics contract (the batch window's): events fold in
  * (ts_us, event_id) order WITHIN each microbatch; ACROSS batches the
  * fold consumes arrival order against saved state (the same in-order
  * transport contract as FunnelStream — a purchase and its touch split
  * across batches still attribute, via the state carry).
  *
  * Scale: state is one short string per user with touches; the
  * stateful shuffle carries narrow (user, ts, event_id, type, value)
  * rows; emitted rows are purchase-scale. flatMapGroupsWithState in
  * Append mode — zero rows for batches that bring a user no purchase.
  */
object AttributionStream {

  /** Attributed purchase: channel = last prior touch, else 'direct'. */
  case class Attributed(user_id: Long, ts_us: Long, channel: String,
      value: Double)

  /** Keyed state: the user's most recent non-purchase event type.
    * Public — Catalyst's encoder codegen instantiates it. */
  case class LastTouch(channel: String)

  /** Core fold shared with the spec: purchases attribute to the
    * carried touch; non-purchase events advance it. */
  private[streaming] def foldBatch(touch: Option[String],
      evs: Seq[(Long, Long, Long, String, Double)])
      : (Option[String], Seq[Attributed]) = {
    var cur = touch
    val out = scala.collection.mutable.Buffer[Attributed]()
    evs.sortBy(e => (e._2, e._3)).foreach { case (uid, ts, _, tpe, v) =>
      if (tpe == "purchase")
        out += Attributed(uid, ts, cur.getOrElse("direct"), v)
      else cur = Some(tpe)
    }
    (cur, out.toSeq)
  }

  /** Attributed purchases, streaming. Input: the events frame
    * (event_id, ts, user_id, event_type, value). */
  def attributed(events: DataFrame): Dataset[Attributed] = {
    val s = events.sparkSession
    import s.implicits._
    events
      .select(col("user_id").cast("long"),
        unix_micros(col("ts")).as("ts_us"),
        col("event_id").cast("long"), col("event_type"),
        col("value").cast("double"))
      .as[(Long, Long, Long, String, Double)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[LastTouch, Attributed](
        OutputMode.Append(), GroupStateTimeout.NoTimeout) {
        (_, it, state) =>
          val (next, out) = foldBatch(
            state.getOption.map(_.channel), it.toSeq)
          next.foreach(c => state.update(LastTouch(c)))
          out.iterator
      }
  }
}
