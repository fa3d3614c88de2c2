package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.GroupStateTimeout

/** S10: LIVE conversion funnel — the streaming twin of
  * graft.queries.FunnelOps.q29_funnel. Per-user stage progression
  * (signup → view → click → purchase, each stage strictly later in event
  * time) maintained as keyed streaming state, emitting the user's
  * current stage whenever a microbatch advances it.
  *
  * Semantics contract (same as the batch fold): stage k fills with the
  * first event of stage k's type strictly after stage k-1's timestamp.
  * Events are sorted by (ts, type) WITHIN each microbatch; ACROSS
  * batches the fold consumes them in arrival order against the saved
  * state — out-of-order delivery across batches cannot retroactively
  * rebuild a chain (the CDC transport contract is per-backend in-order
  * delivery, graft.streaming.CdcPipeline; this op inherits it).
  *
  * Scale: state is 4 longs per user — the same bounded-state shape as
  * the reference's single open-transaction variable (postgresql.js:
  * 447-450), keyed and checkpointed. The shuffle per microbatch carries
  * only (user, ts, type) triples.
  */
object FunnelStream {

  /** Stage timestamps; Long.MinValue = not reached. */
  case class FunnelState(t1: Long, t2: Long, t3: Long, t4: Long) {
    def stage: Int =
      if (t4 != Long.MinValue) 4
      else if (t3 != Long.MinValue) 3
      else if (t2 != Long.MinValue) 2
      else if (t1 != Long.MinValue) 1
      else 0
  }

  private val empty = FunnelState(
    Long.MinValue, Long.MinValue, Long.MinValue, Long.MinValue)

  private[streaming] def step(
      st: FunnelState, tsUs: Long, kind: String): FunnelState = kind match {
    case "signup" if st.t1 == Long.MinValue => st.copy(t1 = tsUs)
    case "view" if st.t2 == Long.MinValue && st.t1 != Long.MinValue &&
      tsUs > st.t1 => st.copy(t2 = tsUs)
    case "click" if st.t3 == Long.MinValue && st.t2 != Long.MinValue &&
      tsUs > st.t2 => st.copy(t3 = tsUs)
    case "purchase" if st.t4 == Long.MinValue && st.t3 != Long.MinValue &&
      tsUs > st.t3 => st.copy(t4 = tsUs)
    case _ => st
  }

  /** One (user_id, stage) row per user per microbatch that touched the
    * user — the latest stage reached. Update output mode; downstream
    * sinks key on user_id. */
  /** Funnel stages, in conversion order — the batch twin's definition. */
  private val stages = graft.queries.FunnelOps.stages

  def stageProgress(events: DataFrame): Dataset[(Long, Int)] = {
    val s = events.sparkSession
    import s.implicits._
    events
      // drop non-funnel traffic BEFORE the stateful shuffle (the batch
      // twin filters the same way): otherwise every user ever seen
      // allocates permanent state and emits stage-0 rows, and the
      // "4 longs per funnel participant" bound silently becomes
      // 4 longs per user of any event type
      .filter(col("event_type").isin(stages: _*))
      .select(col("user_id").cast("long"),
        unix_micros(col("ts")).as("ts_us"), col("event_type"))
      .as[(Long, Long, String)]
      .groupByKey(_._1)
      .mapGroupsWithState[FunnelState, (Long, Int)](
        GroupStateTimeout.NoTimeout) { (uid, it, state) =>
        // event-time order within the batch; (ts, type) matches the
        // batch fold's sort_array(struct(ts_us, event_type)) tiebreak
        val evs = it.toArray.sortBy(e => (e._2, e._3))
        var st = state.getOption.getOrElse(empty)
        evs.foreach(e => st = step(st, e._2, e._3))
        state.update(st)
        (uid, st.stage)
      }
      .toDF("user_id", "stage").as[(Long, Int)]
  }
}
