package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Streaming forms of S01–S06 (SURVEY.md §2.4) over an event frame with
  * columns (ts: timestamp, event_type: string, user_id: long,
  * event_id: long, value: double).
  *
  * These are the SAME aggregations as graft.queries.WindowedOps — batch
  * and streaming share the plan shape; streaming adds watermarks to bound
  * state. The ScalaTest suite feeds a MemoryStream and asserts streaming
  * output equals the batch result on converged input.
  */
object EventStreams {

  private def dec(c: org.apache.spark.sql.Column) = c.cast(DecimalType(18, 2))

  /** S01: tumbling 1h × event_type counts. Watermark bounds window state:
    * windows more than 10 minutes behind the max event time finalize and
    * evict. */
  def tumbling(events: DataFrame): DataFrame =
    events.withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(dec(col("value"))).cast(DoubleType).as("sum_value"))
      .select(unix_timestamp(col("window.start")).as("window_start_sec"),
        col("event_type"), col("n"), col("sum_value"))

  /** S02: sliding 1h / 15m counts. */
  def sliding(events: DataFrame): DataFrame =
    events.withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour", "15 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(unix_timestamp(col("window.start")).as("window_start_sec"),
        col("event_type"), col("n"))

  /** S03: per-user session windows, 30-minute gap. */
  def sessions(events: DataFrame): DataFrame =
    events.withWatermark("ts", "10 minutes")
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        unix_micros(col("session_window.start")).as("start_us"),
        unix_micros(col("session_window.end")).as("end_us"),
        col("n_events"))

  /** S04: the watermark itself — events later than 10 minutes behind the
    * watermark are dropped by any downstream stateful op; exposed as a
    * windowed count so tests can observe the drop. */
  def lateDataCounts(events: DataFrame): DataFrame =
    events.withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"))
      .agg(count(lit(1)).as("n"))
      .select(unix_timestamp(col("window.start")).as("window_start_sec"),
        col("n"))

  /** S06: streaming dedup by event_id with watermark-bounded state.
    * `dropDuplicatesWithinWatermark`, NOT `dropDuplicates`: plain
    * dropDuplicates only evicts state when the event-time column is
    * among the dedup keys — keyed by event_id alone its seen-key set
    * would grow with the stream's lifetime despite the watermark (the
    * StreamAudit false-negative class). WithinWatermark keeps the
    * id-only semantics and evicts each key once the watermark passes
    * its arrival horizon — duplicates are dropped as long as they
    * arrive within the 10-minute delay, the same bound the watermark
    * already imposes on every other stateful operator here. */
  def dedup(events: DataFrame): DataFrame =
    events.withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("event_id")

  /** S07: stream-stream interval join — purchases attributed to the same
    * user's clicks within the preceding 30 minutes. Both sides carry
    * watermarks and the join condition bounds event time on BOTH sides,
    * so Spark evicts buffered rows once the watermark passes their join
    * horizon (clicks after 30 min, purchases immediately) — state stays
    * proportional to the window, not the stream. */
  def purchaseAttribution(events: DataFrame): DataFrame =
    attribution(events, "inner")

  /** S09: LEFT-OUTER interval join — S07 plus the misses: a purchase
    * with no attributing click still emits (null click) once the
    * watermark passes its join horizon, i.e. once no future click could
    * match it. Same state-eviction bound as S07; the null-side emission
    * is what makes outer stream-stream joins need the watermark at all. */
  def purchaseAttributionOuter(events: DataFrame): DataFrame =
    attribution(events, "left_outer")

  /** S09b: FULL-OUTER interval join — both sides' misses surface: an
    * unattributed purchase AND a click that attributed nothing each
    * emit their null-row once the global watermark proves no partner
    * can still arrive. Same eviction bound; the user_id survives on
    * whichever side exists. */
  def purchaseAttributionFull(events: DataFrame): DataFrame =
    attribution(events, "full_outer")

  /** Shared S07/S09 body — one definition of the window, watermarks,
    * and join condition, so the inner and outer forms can never drift. */
  private def attribution(events: DataFrame, joinType: String): DataFrame = {
    val p = events.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("purchase_id"),
        col("ts").as("p_ts"))
      .withWatermark("p_ts", "10 minutes")
    val c = events.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("event_id").as("click_id"),
        col("ts").as("c_ts"))
      .withWatermark("c_ts", "10 minutes")
    p.join(c,
        col("user_id") === col("c_user") &&
        col("c_ts") >= col("p_ts") - expr("INTERVAL 30 MINUTES") &&
        col("c_ts") <= col("p_ts"), joinType)
      // full-outer: click-only rows carry their user on the c side
      .select(coalesce(col("user_id"), col("c_user")).as("user_id"),
        col("purchase_id"), col("click_id"),
        (unix_micros(col("p_ts")) - unix_micros(col("c_ts"))).as("lag_us"))
  }

  /** S08: stream-static dimension enrichment — stateless per microbatch;
    * the static side is broadcast so the stream side never shuffles. */
  def enrich(events: DataFrame, dim: DataFrame): DataFrame =
    events.join(broadcast(dim), col("user_id") === col("c_custkey"))
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("c_name"))

  /** S11: LIVE LEADERBOARD — running top-k event types by all-time
    * count and exact revenue. Sort + limit on a streaming frame is only
    * legal in COMPLETE output mode (the sink receives the whole small
    * result each batch, so a total order exists to take a top-k of);
    * that's the distinct capability this op pins. State is one running
    * aggregate row per event type — bounded by the type domain, no
    * watermark needed (the totals are deliberately all-time). */
  def liveLeaderboard(events: DataFrame, k: Int): DataFrame =
    events
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        sum(dec(col("value"))).cast(DoubleType).as("revenue"))
      .orderBy(col("n").desc, col("event_type"))
      .limit(k)
}
