package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}
import graft.Tables

/** S01–S06 — the streaming operator surface, executed in batch mode for
  * the DuckDB-oracle check (SURVEY.md §2.4: "streaming rows are
  * oracle-checked in batch mode; DuckDB has no streaming").
  *
  * These use the *same* Spark primitives the streaming package runs with
  * (`window`, `session_window`, event-time semantics), so the batch result
  * IS the converged streaming result. graft.streaming.EventStreams wires
  * the identical logic over readStream + watermarks, and the ScalaTest
  * suite asserts streaming output == these batch frames.
  *
  * Window starts are emitted as epoch seconds / µs integers — never raw
  * ns timestamps (see Tables.events).
  */
object WindowedOps {

  private def dec(c: org.apache.spark.sql.Column) =
    c.cast(DecimalType(18, 2))

  // ------------------------------------------------------------- S01
  /** Tumbling 1-hour windows × event_type. Epoch-aligned windows: Spark's
    * window() and integer floor-division agree exactly. */
  def s01_tumbling(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(dec(col("value"))).cast(DoubleType).as("sum_value"))
      .select(unix_timestamp(col("window.start")).as("window_start_sec"),
        col("event_type"), col("n"), col("sum_value"))
      .orderBy("window_start_sec", "event_type")

  val s01Sql: String =
    s"""WITH e AS ${Tables.eventsNormSql}
       |SELECT (ts_us // 3600000000) * 3600 AS window_start_sec, event_type,
       |  COUNT(*) AS n,
       |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
       |FROM e GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // ------------------------------------------------------------- S02
  /** Sliding windows: 1 hour every 15 minutes — each event lands in
    * exactly 4 windows. */
  def s02_sliding(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(window(col("ts"), "1 hour", "15 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(unix_timestamp(col("window.start")).as("window_start_sec"),
        col("event_type"), col("n"))
      .orderBy("window_start_sec", "event_type")

  val s02Sql: String =
    s"""WITH e AS ${Tables.eventsNormSql},
       |x AS (SELECT event_type,
       |        ((ts_us // 900000000) - unnest(range(4))) * 900
       |          AS window_start_sec
       |      FROM e)
       |SELECT window_start_sec, event_type, COUNT(*) AS n
       |FROM x GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // ------------------------------------------------------------- S03
  /** Session windows: per-user sessions with a 30-minute gap, via Spark's
    * native session_window. Oracle restates the semantics with
    * lag + cumulative-sum session ids (a new session starts when
    * ts - prev_ts >= gap, matching Spark's [ts, ts+gap) merge rule). */
  def s03_session(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        unix_micros(col("session_window.start")).as("start_us"),
        unix_micros(col("session_window.end")).as("end_us"),
        col("n_events"))
      .orderBy("user_id", "start_us")

  val s03Sql: String =
    s"""WITH e AS ${Tables.eventsNormSql},
       |flagged AS (SELECT user_id, ts_us, event_id,
       |    CASE WHEN ts_us - LAG(ts_us) OVER (PARTITION BY user_id
       |      ORDER BY ts_us, event_id) >= 1800000000 THEN 1 ELSE 0 END AS brk
       |  FROM e),
       |sess AS (SELECT user_id, ts_us,
       |    SUM(brk) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
       |      ROWS UNBOUNDED PRECEDING) AS sid
       |  FROM flagged)
       |SELECT user_id, MIN(ts_us) AS start_us,
       |  MAX(ts_us) + 1800000000 AS end_us,
       |  COUNT(*) AS n_events
       |FROM sess GROUP BY user_id, sid
       |ORDER BY user_id, start_us""".stripMargin

  // ------------------------------------------------------------- S04
  /** Watermark / late-data policy in batch: drop events more than
    * 10 minutes behind the global max event time. The global max is a
    * tiny aggregate broadcast back — no single-partition shuffle. */
  def s04_watermark(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir)
    val mx = e.agg(max(col("ts_us")).as("max_us"))
    e.crossJoin(broadcast(mx))
      .filter(col("ts_us") >= col("max_us") - 600000000L)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_kept"))
      .orderBy("event_type")
  }

  val s04Sql: String =
    s"""WITH e AS ${Tables.eventsNormSql}
       |SELECT event_type, COUNT(*) AS n_kept
       |FROM e
       |WHERE ts_us >= (SELECT MAX(ts_us) FROM e) - 600000000
       |GROUP BY event_type ORDER BY event_type""".stripMargin

  // ------------------------------------------------------------- S05
  /** Ordered stateful grouping — the batch shape of CDC transaction
    * assembly (user_id standing in for txId): deterministic in-order
    * item list per key via sort_array over (ts, id) structs, never a
    * bare collect_list (whose order is partition-dependent). */
  def s05_tx_assembly(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy("user_id")
      .agg(
        expr("array_join(transform(sort_array(collect_list(struct(ts_us, event_id)))," +
          " x -> cast(x.event_id as string)), ',')").as("items"),
        count(lit(1)).as("n_items"))
      .select("user_id", "n_items", "items")
      .orderBy("user_id")

  val s05Sql: String =
    s"""WITH e AS ${Tables.eventsNormSql}
       |SELECT user_id, COUNT(*) AS n_items,
       |  array_to_string(list(event_id ORDER BY ts_us, event_id), ',') AS items
       |FROM e GROUP BY user_id ORDER BY user_id""".stripMargin

  // ------------------------------------------------------------- S06
  /** Streaming-dedup analogue: deterministic first event per
    * (user_id, event_type) — the batch semantics of
    * dropDuplicates-with-watermark (earliest wins, ties by event_id). */
  def s06_dedup(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id", "event_type")
      .orderBy(col("ts_us"), col("event_id"))
    Tables.events(s, dir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select("user_id", "event_type", "event_id", "ts_us")
      .orderBy("user_id", "event_type")
  }

  val s06Sql: String =
    s"""WITH e AS ${Tables.eventsNormSql},
       |r AS (SELECT user_id, event_type, event_id, ts_us,
       |    ROW_NUMBER() OVER (PARTITION BY user_id, event_type
       |      ORDER BY ts_us, event_id) AS rn
       |  FROM e)
       |SELECT user_id, event_type, event_id, ts_us
       |FROM r WHERE rn = 1 ORDER BY user_id, event_type""".stripMargin

  // ------------------------------------------------------------- S07
  /** Stream-stream interval join in batch: every purchase attributed to
    * the same user's clicks in the preceding 30 minutes. The join keys on
    * user_id (one shuffle each side) with the time bound as a residual
    * range predicate — exactly the plan Structured Streaming runs with
    * two watermarked streams (graft.streaming.EventStreams
    * .purchaseAttribution), where the same bound also EVICTS buffered
    * state: a click older than 30 minutes past the watermark can never
    * join again. */
  /** Shared S07/S09 batch body (the twin of EventStreams.attribution):
    * one definition of the interval condition for both join types. The
    * condition lives IN the join condition — for the outer form a
    * filter afterwards would quietly turn the miss rows back into
    * drops (for the inner form the two are equivalent). */
  private def attribution(s: SparkSession, dir: String,
      joinType: String): DataFrame = {
    val e = Tables.events(s, dir)
    val p = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("purchase_id"),
        col("ts_us").as("p_us"))
    val c = e.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("event_id").as("click_id"),
        col("ts_us").as("c_us"))
    p.join(c,
        col("user_id") === col("c_user") &&
        col("c_us") >= col("p_us") - 1800000000L &&
        col("c_us") <= col("p_us"), joinType)
      // full-outer: click-only rows carry their user on the c side
      .select(coalesce(col("user_id"), col("c_user")).as("user_id"),
        col("purchase_id"), col("click_id"),
        (col("p_us") - col("c_us")).as("lag_us"))
  }

  def s07_stream_join(s: SparkSession, dir: String): DataFrame =
    attribution(s, dir, "inner")
      .orderBy("purchase_id", "click_id")

  val s07Sql: String =
    s"""WITH e AS ${Tables.eventsNormSql},
       |p AS (SELECT user_id, event_id AS purchase_id, ts_us AS p_us
       |      FROM e WHERE event_type = 'purchase'),
       |c AS (SELECT user_id, event_id AS click_id, ts_us AS c_us
       |      FROM e WHERE event_type = 'click')
       |SELECT p.user_id, purchase_id, click_id, p_us - c_us AS lag_us
       |FROM p JOIN c ON p.user_id = c.user_id
       |  AND c_us BETWEEN p_us - 1800000000 AND p_us
       |ORDER BY purchase_id, click_id""".stripMargin

  // ------------------------------------------------------------- S09
  /** Batch twin of the LEFT-OUTER interval join: every purchase, with
    * its attributing clicks where they exist and a null click where
    * none does (the rows S07 silently drops). */
  def s09_stream_join_outer(s: SparkSession, dir: String): DataFrame =
    attribution(s, dir, "left")
      // null click_id sorts differently across engines (Spark NULLS
      // FIRST, DuckDB NULLS LAST) — order on a null-free expression
      .orderBy(col("purchase_id"), coalesce(col("click_id"), lit(-1L)))

  val s09Sql: String =
    s"""WITH e AS ${Tables.eventsNormSql},
       |p AS (SELECT user_id, event_id AS purchase_id, ts_us AS p_us
       |      FROM e WHERE event_type = 'purchase'),
       |c AS (SELECT user_id AS c_user, event_id AS click_id, ts_us AS c_us
       |      FROM e WHERE event_type = 'click')
       |SELECT p.user_id, purchase_id, click_id, p_us - c_us AS lag_us
       |FROM p LEFT JOIN c ON p.user_id = c_user
       |  AND c_us BETWEEN p_us - 1800000000 AND p_us
       |ORDER BY purchase_id, COALESCE(click_id, -1)""".stripMargin

  // ------------------------------------------------------------ S09b
  /** Batch twin of the FULL-OUTER interval join: S09's purchase misses
    * PLUS the clicks that attributed nothing — the audit view that
    * accounts for every event on both sides exactly once or more. */
  def s09b_stream_join_full(s: SparkSession, dir: String): DataFrame =
    attribution(s, dir, "full")
      .orderBy(coalesce(col("purchase_id"), lit(-1L)),
        coalesce(col("click_id"), lit(-1L)))

  val s09bSql: String =
    s"""WITH e AS ${Tables.eventsNormSql},
       |p AS (SELECT user_id, event_id AS purchase_id, ts_us AS p_us
       |      FROM e WHERE event_type = 'purchase'),
       |c AS (SELECT user_id AS c_user, event_id AS click_id, ts_us AS c_us
       |      FROM e WHERE event_type = 'click')
       |SELECT COALESCE(p.user_id, c_user) AS user_id, purchase_id,
       |  click_id, p_us - c_us AS lag_us
       |FROM p FULL JOIN c ON p.user_id = c_user
       |  AND c_us BETWEEN p_us - 1800000000 AND p_us
       |ORDER BY COALESCE(purchase_id, -1), COALESCE(click_id, -1)"""
      .stripMargin

  // ------------------------------------------------------------- S08
  /** Stream-static enrichment: every event decorated with its user's
    * customer record and nation — the standard dimension join a CDC or
    * event stream needs on the way to a warehouse. The dimension side is
    * BROADCAST (a dim table is small next to a 100 TB stream), so the
    * stream never shuffles; in streaming form the same plan is stateless
    * per-microbatch (graft.streaming.EventStreams.enrich). */
  def s08_enrich(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir)
    val cust = Tables.load(s, dir, "customer")
      .select(col("c_custkey"), col("c_name"), col("c_nationkey"))
    val nation = Tables.load(s, dir, "nation")
      .select(col("n_nationkey"), col("n_name"))
    e.join(broadcast(cust), col("user_id") === col("c_custkey"))
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("c_name"), col("n_name").as("nation"))
      .orderBy("event_id")
  }

  val s08Sql: String =
    s"""WITH e AS ${Tables.eventsNormSql}
       |SELECT event_id, user_id, event_type, c_name, n_name AS nation
       |FROM e
       |JOIN customer ON user_id = c_custkey
       |JOIN nation ON c_nationkey = n_nationkey
       |ORDER BY event_id""".stripMargin

  // ------------------------------------------------------------- S10
  /** Driver-visible batch twin of the LIVE funnel
    * (graft.streaming.FunnelStream): the whole events table fed through
    * the SAME keyed `mapGroupsWithState` fold as one converged
    * microbatch (batch-mode mapGroupsWithState runs each group once with
    * empty initial state), rolled up to stage-reach counts. Output shape
    * and oracle are q29's — the streaming==batch equivalence
    * FunnelStreamSpec proves in ScalaTest, certified here by the
    * driver's DuckDB compare. */
  def s10_funnel_live(s: SparkSession, dir: String): DataFrame =
    graft.streaming.FunnelStream.stageProgress(Tables.events(s, dir))
      .toDF("user_id", "stage")
      .agg(
        count(when(col("stage") >= 1, 1)).as("n1"),
        count(when(col("stage") >= 2, 1)).as("n2"),
        count(when(col("stage") >= 3, 1)).as("n3"),
        count(when(col("stage") >= 4, 1)).as("n4"))
      .select(expr(
        "stack(4, 1, 'signup', n1, 2, 'view', n2, 3, 'click', n3," +
          " 4, 'purchase', n4) AS (stage, stage_name, n_users)"))
      .orderBy("stage")

  // s10's oracle IS q29's: stage-reach of the min-qualifying-event
  // cascade — the fold and the SQL must agree on every count.
  val s10Sql: String = FunnelOps.q29Sql

  // ------------------------------------------------------------- S11
  /** Driver-visible batch twin of the LIVE leaderboard
    * (graft.streaming.EventStreams.liveLeaderboard): the identical plan
    * on the converged frame — all-time top-k event types by exact
    * count + DECIMAL-exact revenue, the sort+limit that is only legal
    * in complete output mode on the streaming side. */
  def s11_leaderboard(s: SparkSession, dir: String): DataFrame =
    graft.streaming.EventStreams.liveLeaderboard(Tables.events(s, dir), 5)

  val s11Sql: String =
    s"""WITH e AS ${Tables.eventsNormSql}
       |SELECT event_type, COUNT(*) AS n,
       |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS revenue
       |FROM e GROUP BY event_type
       |ORDER BY n DESC, event_type LIMIT 5""".stripMargin

  // ------------------------------------------------------------- S12
  /** Driver-visible batch twin of the LIVE last-touch attribution
    * (graft.streaming.AttributionStream): the whole events table fed
    * through the SAME keyed flatMapGroupsWithState fold as one
    * converged microbatch, rolled up to per-channel totals. Output
    * shape and oracle are q29c's — the streaming==batch equivalence
    * AttributionStreamSpec proves over chunked replays, certified here
    * by the driver's DuckDB compare. */
  def s12_attribution(s: SparkSession, dir: String): DataFrame =
    graft.streaming.AttributionStream.attributed(Tables.events(s, dir))
      .toDF()
      .groupBy("channel")
      .agg(count(lit(1)).as("n_purchases"),
        sum(col("value").cast("decimal(18,2)")).cast("double")
          .as("revenue"))
      .orderBy("channel")

  // s12's oracle IS q29c's: the keyed fold and the carry window must
  // agree on every channel's count and revenue.
  val s12Sql: String = FunnelOps.q29cSql

  // ----------------------------------------------------------------
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "s10_funnel_live" -> (s10_funnel_live _),
    "s11_leaderboard" -> (s11_leaderboard _),
    "s12_attribution" -> (s12_attribution _),
    "s01_tumbling" -> (s01_tumbling _),
    "s02_sliding" -> (s02_sliding _),
    "s03_session" -> (s03_session _),
    "s04_watermark" -> (s04_watermark _),
    "s05_tx_assembly" -> (s05_tx_assembly _),
    "s06_dedup" -> (s06_dedup _),
    "s07_stream_join" -> (s07_stream_join _),
    "s08_enrich" -> (s08_enrich _),
    "s09_stream_join_outer" -> (s09_stream_join_outer _),
    "s09b_stream_join_full" -> (s09b_stream_join_full _))

  def oracles: Map[String, String] = Map(
    "s10_funnel_live" -> s10Sql,
    "s11_leaderboard" -> s11Sql,
    "s12_attribution" -> s12Sql,
    "s01_tumbling" -> s01Sql,
    "s02_sliding" -> s02Sql,
    "s03_session" -> s03Sql,
    "s04_watermark" -> s04Sql,
    "s05_tx_assembly" -> s05Sql,
    "s06_dedup" -> s06Sql,
    "s07_stream_join" -> s07Sql,
    "s08_enrich" -> s08Sql,
    "s09_stream_join_outer" -> s09Sql,
    "s09b_stream_join_full" -> s09bSql)
}
