package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables

/** Event-sequence analytics over the `events` stream table: conversion
  * funnel and cohort retention — the two queries every product-analytics
  * user of a CDC/event pipeline asks first (the reference's event
  * subscriptions feed exactly this kind of consumer).
  *
  * Scale design: both queries are ONE shuffle on user_id. The funnel
  * folds each user's time-ordered events through the stage chain with a
  * higher-order `aggregate` (no joins, no per-stage passes); retention
  * derives the cohort with an unordered per-user window min (no sort —
  * Spark plans a frame-less window as a hash-style full-partition
  * aggregate) instead of a self-join back onto the events.
  */
object FunnelOps {

  /** Funnel stages, in conversion order (shared with the streaming twin
    * graft.streaming.FunnelStream — the two must filter identically). */
  private[graft] val stages = Seq("signup", "view", "click", "purchase")

  // ---------------------------------------------------------------- Q29
  /** Conversion funnel: users reaching each stage of
    * signup → view → click → purchase, where each stage's event must be
    * STRICTLY later than the previous stage's (first-match semantics:
    * stage k's timestamp is the earliest qualifying event after stage
    * k-1's).
    *
    * One groupBy(user_id) collects the (ts, type) pairs; `sort_array` +
    * a single left-to-right `aggregate` fold computes all four stage
    * timestamps in one pass over each user's history. The shuffle
    * carries one row per event ((user, ts, type) — no payload) and the
    * fold accumulator is 4 longs — but collect_list materializes each
    * user's full history in one aggregation buffer first, so per-user
    * memory is O(events). For human-scale keys that is bytes; a
    * hot-key log (bots with 10⁷ events) should pre-filter or use the
    * streaming twin (graft.streaming.FunnelStream), whose keyed state
    * is genuinely 4 longs per user. */
  def q29_funnel(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir)
      .filter(col("event_type").isin(stages: _*))
    val nullT = lit(null).cast(LongType)
    // fold: t(k) fills with the first event of stage k strictly after
    // t(k-1); earlier accumulator fields are read from acc (the event
    // that sets t(k-1) cannot also set t(k) — its type differs).
    val folded = e
      .groupBy("user_id")
      .agg(sort_array(collect_list(struct(col("ts_us"), col("event_type"))))
        .as("evs"))
      .withColumn("ts", aggregate(
        col("evs"),
        struct(nullT.as("t1"), nullT.as("t2"), nullT.as("t3"),
          nullT.as("t4")),
        (acc: Column, ev: Column) => {
          def step(prev: Column, cur: Column, stage: String): Column =
            when(cur.isNull && prev.isNotNull &&
              ev("event_type") === stage && ev("ts_us") > prev, ev("ts_us"))
              .otherwise(cur)
          struct(
            when(acc("t1").isNull && ev("event_type") === "signup",
              ev("ts_us")).otherwise(acc("t1")).as("t1"),
            step(acc("t1"), acc("t2"), "view").as("t2"),
            step(acc("t2"), acc("t3"), "click").as("t3"),
            step(acc("t3"), acc("t4"), "purchase").as("t4"))
        }))
    folded
      .agg(
        count(col("ts.t1")).as("n1"), count(col("ts.t2")).as("n2"),
        count(col("ts.t3")).as("n3"), count(col("ts.t4")).as("n4"))
      .select(expr(
        "stack(4, 1, 'signup', n1, 2, 'view', n2, 3, 'click', n3," +
          " 4, 'purchase', n4) AS (stage, stage_name, n_users)"))
      .orderBy("stage")
  }

  val q29Sql: String =
    s"""WITH e AS ${Tables.eventsNormSql},
       |u1 AS (SELECT user_id,
       |         MIN(CASE WHEN event_type = 'signup' THEN ts_us END) AS t1
       |       FROM e GROUP BY user_id),
       |u2 AS (SELECT u1.user_id, t1,
       |         MIN(CASE WHEN e.event_type = 'view' AND e.ts_us > u1.t1
       |             THEN e.ts_us END) AS t2
       |       FROM u1 JOIN e ON e.user_id = u1.user_id
       |       GROUP BY u1.user_id, t1),
       |u3 AS (SELECT u2.user_id, t1, t2,
       |         MIN(CASE WHEN e.event_type = 'click' AND e.ts_us > u2.t2
       |             THEN e.ts_us END) AS t3
       |       FROM u2 JOIN e ON e.user_id = u2.user_id
       |       GROUP BY u2.user_id, t1, t2),
       |u4 AS (SELECT u3.user_id, t1, t2, t3,
       |         MIN(CASE WHEN e.event_type = 'purchase' AND e.ts_us > u3.t3
       |             THEN e.ts_us END) AS t4
       |       FROM u3 JOIN e ON e.user_id = u3.user_id
       |       GROUP BY u3.user_id, t1, t2, t3)
       |SELECT * FROM (
       |  SELECT 1 AS stage, 'signup' AS stage_name, COUNT(t1) AS n_users
       |  FROM u4
       |  UNION ALL SELECT 2, 'view', COUNT(t2) FROM u4
       |  UNION ALL SELECT 3, 'click', COUNT(t3) FROM u4
       |  UNION ALL SELECT 4, 'purchase', COUNT(t4) FROM u4)
       |ORDER BY stage""".stripMargin

  // --------------------------------------------------------------- Q29b
  /** MARKOV TRANSITION MATRIX over the event stream: for every ordered
    * pair of event types, how often does `prev → next` occur as two
    * consecutive events of the same user, and what fraction of all
    * transitions out of `prev` is it (the first-order behavioral model
    * behind next-action prediction and funnel drop-off diagnosis).
    *
    * Shape: the only row-scale shuffle is the per-user lag(1) window
    * (per-user partitions bounded by that user's event count — the q40
    * sessionize exchange); transition pairs then collapse through one
    * partial-agg groupBy to |types|² rows, and the per-prev normalizer
    * is a window over THAT aggregate (≤ |types| rows per partition) —
    * never over events. Probabilities are integer micro-units
    * (`n·10⁶ div Σn`), so both engines agree bit-for-bit. */
  def q29b_transitions(s: SparkSession, dir: String): DataFrame = {
    val wOrd = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    Tables.events(s, dir)
      .withColumn("prev_type", lag(col("event_type"), 1).over(wOrd))
      .filter(col("prev_type").isNotNull)
      .groupBy(col("prev_type"), col("event_type").as("next_type"))
      .agg(count(lit(1)).as("n"))
      .withColumn("tot",
        sum(col("n")).over(Window.partitionBy("prev_type")))
      .withColumn("p_micro", expr("n * 1000000 div tot"))
      .select("prev_type", "next_type", "n", "p_micro")
      .orderBy("prev_type", "next_type")
  }

  val q29bSql: String =
    s"""WITH e AS ${Tables.eventsNormSql},
       |x AS (SELECT user_id, event_type,
       |        LAG(event_type) OVER (PARTITION BY user_id
       |          ORDER BY ts_us, event_id) AS prev_type
       |      FROM e),
       |c AS (SELECT prev_type, event_type AS next_type, count(*) AS n
       |      FROM x WHERE prev_type IS NOT NULL GROUP BY 1, 2)
       |SELECT prev_type, next_type, n,
       |  CAST(n * 1000000 // SUM(n) OVER (PARTITION BY prev_type)
       |    AS BIGINT) AS p_micro
       |FROM c ORDER BY prev_type, next_type""".stripMargin

  // ---------------------------------------------------------------- Q30
  /** Cohort retention: users grouped by the epoch-day of their FIRST
    * event; for each (cohort_day, day_offset) the number of distinct
    * cohort users active that day (day granularity — the synthetic
    * corpus is dense enough that weekly retention is a flat 100%).
    *
    * The cohort day comes from an unordered window min over the user
    * partition — no sort and no join back. The distinct-user count
    * shuffles (cohort, offset, user) triples once; everything upstream
    * stays in the single user_id exchange. */
  def q30_retention(s: SparkSession, dir: String): DataFrame = {
    val usDay = 86400000000L // one epoch-aligned day, in µs
    val e = Tables.events(s, dir)
      .select(col("user_id"), col("ts_us"))
    val w = Window.partitionBy("user_id")
    // integer `div`, not `/`+cast: a double quotient that lands within
    // one ULP of a day boundary could truncate differently than the
    // oracle's integer division
    e.withColumn("first_ts", min(col("ts_us")).over(w))
      .withColumn("cohort_day", expr(s"first_ts div $usDay"))
      .withColumn("day_offset",
        expr(s"ts_us div $usDay") - col("cohort_day"))
      .groupBy("cohort_day", "day_offset")
      .agg(countDistinct(col("user_id")).as("n_users"))
      .orderBy("cohort_day", "day_offset")
  }

  val q30Sql: String =
    s"""WITH e AS ${Tables.eventsNormSql},
       |f AS (SELECT user_id, ts_us,
       |        MIN(ts_us) OVER (PARTITION BY user_id)
       |          // 86400000000 AS cohort_day
       |      FROM e)
       |SELECT cohort_day,
       |  ts_us // 86400000000 - cohort_day AS day_offset,
       |  COUNT(DISTINCT user_id) AS n_users
       |FROM f
       |GROUP BY 1, 2
       |ORDER BY cohort_day, day_offset""".stripMargin

  // -------------------------------------------------------------- Q30b
  /** COHORT LTV TRIANGLE (q30b) — q30's retention counts upgraded to
    * MONEY: per (cohort day, day offset), active users, that day's
    * revenue in exact cents, and the cohort's CUMULATIVE revenue
    * through the offset — the lifetime-value curve growth teams read
    * off the diagonal. Revenue stays integer cents end-to-end; the
    * running sum is a window over the |cohorts|×|offsets| triangle
    * aggregate (30×30 here), never over events. Same integer-div
    * day bucketing as q30 (a double quotient one ULP from a day
    * boundary could truncate differently than the oracle's). */
  def q30b_ltv(s: SparkSession, dir: String): DataFrame = {
    val usDay = 86400000000L
    val tri = Tables.events(s, dir)
      .select(col("user_id"), col("ts_us"),
        expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
      .withColumn("cohort_day", expr(s"min(ts_us) over " +
        s"(partition by user_id) div $usDay"))
      .withColumn("day_offset",
        expr(s"ts_us div $usDay") - col("cohort_day"))
      .groupBy("cohort_day", "day_offset")
      .agg(countDistinct(col("user_id")).as("n_users"),
        sum("cents").as("rev_cents"))
    tri.withColumn("cum_cents",
        sum("rev_cents").over(Window.partitionBy("cohort_day")
          .orderBy("day_offset")))
      .orderBy("cohort_day", "day_offset")
  }

  val q30bSql: String =
    s"""WITH e AS ${Tables.eventsNormSql},
       |f AS (SELECT user_id, ts_us,
       |        CAST(round(value * 100) AS BIGINT) AS cents,
       |        MIN(ts_us) OVER (PARTITION BY user_id)
       |          // 86400000000 AS cohort_day
       |      FROM e),
       |t AS (SELECT cohort_day,
       |        ts_us // 86400000000 - cohort_day AS day_offset,
       |        COUNT(DISTINCT user_id) AS n_users,
       |        CAST(SUM(cents) AS BIGINT) AS rev_cents
       |      FROM f GROUP BY 1, 2)
       |SELECT cohort_day, day_offset, n_users, rev_cents,
       |  CAST(SUM(rev_cents) OVER (PARTITION BY cohort_day
       |    ORDER BY day_offset) AS BIGINT) AS cum_cents
       |FROM t ORDER BY cohort_day, day_offset""".stripMargin

  // ---------------------------------------------------------------- Q34
  /** Time-series GAP FILL: daily event counts per type with missing days
    * zero-filled over each type's own active range — the date-scaffold
    * idiom (a time series with holes breaks every moving-window and
    * charting consumer downstream). The scaffold comes from
    * `sequence(min_day, max_day)` exploded off the per-type aggregate —
    * one row per type before the explode, so the generated rows are
    * |types| × days, never a function of event count; the daily counts
    * join back on (type, day). */
  def q34_gapfill(s: SparkSession, dir: String): DataFrame =
    gapFilled(s, dir).orderBy("event_type", "day")

  /** Scaffolded daily series with gap days kept as NULL — the common
    * core of the zero-fill (q34/q35) and interpolation (q34b) variants:
    * every calendar day in each type's active range, observed counts
    * where they exist, NULL where the scaffold invented the day. */
  private def scaffolded(s: SparkSession, dir: String): DataFrame = {
    val usDay = 86400000000L
    val e = Tables.events(s, dir)
      .select(col("event_type"), expr(s"ts_us div $usDay").as("day"))
    val daily = e.groupBy("event_type", "day")
      .agg(count(lit(1)).as("n"))
      .localCheckpoint() // scaffold bounds + join probe share one agg
    val scaffold = daily.groupBy("event_type")
      .agg(min(col("day")).as("mn"), max(col("day")).as("mx"))
      .select(col("event_type"),
        explode(expr("sequence(mn, mx)")).as("day"))
    scaffold.join(daily, Seq("event_type", "day"), "left")
  }

  /** Unordered gap-filled daily series — shared by q34 (which adds the
    * output order) and q35 (whose window brings its own partitioning; an
    * inherited ORDER BY would be a wasted range exchange + sort). */
  private def gapFilled(s: SparkSession, dir: String): DataFrame =
    scaffolded(s, dir)
      .select(col("event_type"), col("day"),
        coalesce(col("n"), lit(0L)).as("n"))

  /** The nullable-scaffold CTE chain (ends in `g`: gap days NULL),
    * shared by all three oracles — ONE definition, like the Spark
    * side's shared scaffolded(). */
  private val scaffoldCteBody: String =
    s"""e AS ${Tables.eventsNormSql},
       |d AS (SELECT event_type, ts_us // 86400000000 AS day, COUNT(*) AS n
       |      FROM e GROUP BY 1, 2),
       |b AS (SELECT event_type, MIN(day) AS mn, MAX(day) AS mx
       |      FROM d GROUP BY 1),
       |sc AS (SELECT event_type, UNNEST(generate_series(mn, mx)) AS day
       |       FROM b),
       |g AS (SELECT sc.event_type, sc.day, d.n
       |      FROM sc LEFT JOIN d ON d.event_type = sc.event_type
       |        AND d.day = sc.day)""".stripMargin

  private val scaffoldCtes: String = "WITH " + scaffoldCteBody

  /** The zero-filled chain the q34 and q35 oracles consume — body
    * (sans WITH) exposed separately so recursive consumers compose
    * "WITH RECURSIVE " + body explicitly instead of string surgery on
    * the assembled text (a replaceFirst against a reformatted prefix
    * would silently no-op and ship an invalid oracle). */
  private val gapFillCteBody: String =
    s"""$scaffoldCteBody,
       |f AS (SELECT event_type, day, COALESCE(n, 0) AS n FROM g)""".stripMargin

  private val gapFillCtes: String = "WITH " + gapFillCteBody

  val q34Sql: String =
    s"""$gapFillCtes
       |SELECT event_type, day, n FROM f
       |ORDER BY event_type, day""".stripMargin

  /** LINEAR-INTERPOLATION gap fill — the q34 scaffold with gaps filled
    * by the line between the neighboring OBSERVED days instead of zero
    * (sensor/metric series where a missing day means "not measured",
    * not "nothing happened"). Neighbor discovery is the q14d carry
    * idiom twice over ONE sort: last_value(IGNORE NULLS) over the
    * backward running frame, first_value(IGNORE NULLS) over the
    * forward one — Spark plans both frames in a single WindowExec
    * (same partitioning + ordering), so the whole operator costs one
    * shuffle + one sort, no self-join back to the observed rows.
    *
    * Exactness: the lerp stays in integers — micro-units via the
    * symmetric form (pn·(nd−day) + nn·(day−pd))·10⁶ div (nd−pd), every
    * term non-negative so Spark's truncating `div` and DuckDB's
    * flooring `//` agree. Each type's range endpoints are observed by
    * construction (the scaffold spans min..max of observed days), so
    * every gap day has both neighbors and the observed branch guards
    * the nd = pd division. */
  def q34b_interpolate(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("event_type").orderBy("day")
    val back = w.rowsBetween(Window.unboundedPreceding, 0)
    val fwd = w.rowsBetween(0, Window.unboundedFollowing)
    scaffolded(s, dir)
      .withColumn("pd", last(when(col("n").isNotNull, col("day")),
        ignoreNulls = true).over(back))
      .withColumn("pn", last(col("n"), ignoreNulls = true).over(back))
      .withColumn("nd", first(when(col("n").isNotNull, col("day")),
        ignoreNulls = true).over(fwd))
      .withColumn("nn", first(col("n"), ignoreNulls = true).over(fwd))
      .withColumn("interp_micro",
        when(col("n").isNotNull, col("n") * lit(1000000L)).otherwise(expr(
          "(pn * (nd - day) + nn * (day - pd)) * 1000000 div (nd - pd)")))
      .select(col("event_type"), col("day"),
        col("n").isNotNull.as("observed"), col("interp_micro"))
      .orderBy("event_type", "day")
  }

  val q34bSql: String =
    s"""$scaffoldCtes,
       |w AS (SELECT event_type, day, n,
       |        LAST_VALUE(CASE WHEN n IS NOT NULL THEN day END
       |          IGNORE NULLS) OVER back AS pd,
       |        LAST_VALUE(n IGNORE NULLS) OVER back AS pn,
       |        FIRST_VALUE(CASE WHEN n IS NOT NULL THEN day END
       |          IGNORE NULLS) OVER fwd AS nd,
       |        FIRST_VALUE(n IGNORE NULLS) OVER fwd AS nn
       |      FROM g
       |      WINDOW back AS (PARTITION BY event_type ORDER BY day
       |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
       |        fwd AS (PARTITION BY event_type ORDER BY day
       |          ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
       |SELECT event_type, day, n IS NOT NULL AS observed,
       |  CAST(CASE WHEN n IS NOT NULL THEN n * 1000000
       |    ELSE (pn * (nd - day) + nn * (day - pd)) * 1000000 // (nd - pd)
       |    END AS BIGINT) AS interp_micro
       |FROM w
       |ORDER BY event_type, day""".stripMargin

  /** EWMA smoothing (α = 1/8) over the gap-filled daily series — the
    * recursive per-series fold window functions cannot express (each
    * state needs the previous STATE, not a previous input). Per type,
    * the ordered (day, n) array collects ONCE and a row-local
    * `aggregate` fold emits every intermediate state; the recursion
    * never crosses rows, so there is exactly one shuffle (the per-type
    * collect) and the per-type array is bounded by the calendar span,
    * never by event count — the q29-funnel argument. A series too long
    * to collect would fold per-segment and stitch the boundary states
    * (the PrefixSum two-level shape, since s_t = f(s_{t-1}, x_t) is
    * associative in the segment-composition sense).
    *
    * Exactness: states live in 8ths (s₁ = 8·x₁; sₜ = (7·sₜ₋₁ + 8·xₜ)
    * div 8) — every operand non-negative, so truncating `div` and
    * flooring `//` agree and both engines walk identical integer
    * states; the oracle replays the same recurrence with a recursive
    * CTE. */
  def q34c_ewma(s: SparkSession, dir: String): DataFrame =
    gapFilled(s, dir)
      .groupBy("event_type")
      .agg(sort_array(collect_list(struct(col("day"), col("n"))))
        .as("xs"))
      .withColumn("st", expr(
        """aggregate(xs, cast(array() as array<struct<day: bigint, s: bigint>>),
          |  (acc, x) -> acc || array(struct(x.day AS day,
          |    case when size(acc) = 0 then x.n * 8
          |         else (7 * element_at(acc, -1).s + x.n * 8) div 8
          |    end AS s)))""".stripMargin))
      .select(col("event_type"), explode(col("st")).as("e"))
      .select(col("event_type"), col("e.day").as("day"),
        col("e.s").as("ewma_8ths"))
      .orderBy("event_type", "day")

  val q34cSql: String =
    s"""WITH RECURSIVE $gapFillCteBody,
       |rr AS (SELECT event_type, day, n,
       |         row_number() OVER (PARTITION BY event_type ORDER BY day)
       |           AS rn
       |       FROM f),
       |rec AS (
       |  SELECT event_type, rn, day, n * 8 AS s FROM rr WHERE rn = 1
       |  UNION ALL
       |  SELECT rr.event_type, rr.rn, rr.day, (7 * rec.s + rr.n * 8) // 8
       |  FROM rr JOIN rec ON rr.event_type = rec.event_type
       |    AND rr.rn = rec.rn + 1)
       |SELECT event_type, day, CAST(s AS BIGINT) AS ewma_8ths
       |FROM rec
       |ORDER BY event_type, day""".stripMargin
  /** Trailing-window ANOMALY SCORE: each day's event count z-scored
    * against the strictly-preceding 7 days of the same type. The moments
    * (n, Σx, Σx²) come from integer sums over a ROWS frame on the
    * gap-filled daily series (gaps count as 0 — exactly why q34's
    * scaffold matters: without it "quiet day" anomalies are invisible
    * and the frame silently spans more calendar time than 7 days), so
    * mean/std/z are the same doubles on both engines — the q19c
    * deterministic-statistics argument applied per window. One shuffle
    * on event_type, one sort, three frame aggregates sharing it. */
  def q35_anomaly(s: SparkSession, dir: String): DataFrame = {
    val filled = gapFilled(s, dir)
    val w = Window.partitionBy("event_type").orderBy("day")
      .rowsBetween(-7, -1)
    filled
      .withColumn("m", count(col("n")).over(w).cast(DoubleType))
      .withColumn("sx", sum(col("n")).over(w).cast(DoubleType))
      .withColumn("sxx", sum(col("n") * col("n")).over(w).cast(DoubleType))
      // sample variance of the trailing window; m >= 2 guards the
      // degenerate frames at each series head
      .filter(col("m") >= 2)
      .withColumn("mean", col("sx") / col("m"))
      .withColumn("variance",
        (col("m") * col("sxx") - col("sx") * col("sx")) /
          (col("m") * (col("m") - lit(1.0))))
      .filter(col("variance") > 0)
      .withColumn("z",
        (col("n").cast(DoubleType) - col("mean")) / sqrt(col("variance")))
      .filter(abs(col("z")) > 2.0)
      .select("event_type", "day", "n", "mean", "z")
      .orderBy("event_type", "day")
  }

  val q35Sql: String =
    s"""$gapFillCtes,
       |m AS (SELECT event_type, day, n,
       |        CAST(COUNT(n) OVER w AS DOUBLE) AS m,
       |        CAST(SUM(n) OVER w AS DOUBLE) AS sx,
       |        CAST(SUM(n * n) OVER w AS DOUBLE) AS sxx
       |      FROM f
       |      WINDOW w AS (PARTITION BY event_type ORDER BY day
       |        ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)),
       |v AS (SELECT event_type, day, n, sx / m AS mean,
       |        (m * sxx - sx * sx) / (m * (m - 1.0)) AS variance
       |      FROM m WHERE m >= 2)
       |SELECT event_type, day, n, mean,
       |  (CAST(n AS DOUBLE) - mean) / sqrt(variance) AS z
       |FROM v
       |WHERE variance > 0
       |  AND abs((CAST(n AS DOUBLE) - mean) / sqrt(variance)) > 2.0
       |ORDER BY event_type, day""".stripMargin

  // --------------------------------------------------------------- Q35b
  /** CUSUM CHANGE-POINT detection on the gap-filled daily series — the
    * sequential-analysis complement to q35's trailing z-score: the
    * one-sided cumulative sum `s_t = max(0, s_{t-1} + x_t·10⁶ − μ)`
    * accumulates evidence of a SUSTAINED upward level shift (many
    * slightly-elevated days trip it; one spike decays), alarming when
    * the statistic exceeds 4μ. μ is each type's series mean in
    * micro-units — derived row-locally from the collected series, so
    * no second aggregate pass and no join.
    *
    * The recursion is the q34c/EWMA shape window functions can't
    * express: per-type collect-once (≤ days-of-history rows per type —
    * series length, never event count) + one left-to-right `aggregate`
    * fold emitting every intermediate state. All integer micro-units:
    * `Σn·10⁶ div days` with non-negative operands, so Spark's
    * truncating div and DuckDB's flooring // agree, and max(0, ·)
    * keeps every later term exact. Oracle replays the recurrence as a
    * recursive CTE. */
  /** Core over (event_type, day, n) series rows — exposed so specs can
    * plant level-shift shapes. */
  private[graft] def cusum(series: DataFrame): DataFrame =
    series
      .groupBy("event_type")
      .agg(sort_array(collect_list(struct(col("day"), col("n"))))
        .as("xs"))
      .withColumn("mu",
        expr("aggregate(xs, 0L, (a, x) -> a + x.n) * 1000000 div size(xs)"))
      .withColumn("st", expr(
        """aggregate(xs, cast(array() as array<struct<day: bigint, s: bigint>>),
          |  (acc, x) -> acc || array(struct(x.day AS day,
          |    greatest(0L,
          |      case when size(acc) = 0 then 0L
          |           else element_at(acc, -1).s end
          |        + x.n * 1000000 - mu) AS s)))""".stripMargin))
      .select(col("event_type"), col("mu"), explode(col("st")).as("e"))
      .select(col("event_type"), col("e.day").as("day"),
        col("e.s").as("cusum_micro"),
        (col("e.s") > col("mu") * 4).as("alarm"))
      .orderBy("event_type", "day")

  def q35b_cusum(s: SparkSession, dir: String): DataFrame =
    cusum(gapFilled(s, dir))

  val q35bSql: String =
    s"""WITH RECURSIVE $gapFillCteBody,
       |mu AS (SELECT event_type, SUM(n) * 1000000 // COUNT(*) AS mu
       |       FROM f GROUP BY 1),
       |rr AS (SELECT f.event_type, day, n, mu,
       |         row_number() OVER (PARTITION BY f.event_type
       |           ORDER BY day) AS rn
       |       FROM f JOIN mu ON mu.event_type = f.event_type),
       |rec AS (
       |  SELECT event_type, rn, day, mu,
       |    GREATEST(0, n * 1000000 - mu) AS s
       |  FROM rr WHERE rn = 1
       |  UNION ALL
       |  SELECT rr.event_type, rr.rn, rr.day, rr.mu,
       |    GREATEST(0, rec.s + rr.n * 1000000 - rr.mu)
       |  FROM rr JOIN rec ON rr.event_type = rec.event_type
       |    AND rr.rn = rec.rn + 1)
       |SELECT event_type, day, CAST(s AS BIGINT) AS cusum_micro,
       |  s > mu * 4 AS alarm
       |FROM rec
       |ORDER BY event_type, day""".stripMargin

  // ---------------------------------------------------------------- Q38
  /** PEAK CONCURRENCY by SWEEP LINE — per event type, the maximum number
    * of simultaneously-active 30-minute windows and the earliest instant
    * it is reached. Each interval becomes two delta points (+1 at start,
    * −1 at end), a per-type running sum walks the boundary multiset, and
    * the peak reads off the walk — the classic rewrite that replaces the
    * quadratic interval self-join (`a.start < b.end AND b.start < a.end`
    * explodes on hot keys) with ONE sort and two window passes sharing
    * it (running sum + per-type max: same partitioning, zero extra
    * exchanges). Ordering (t, delta) puts −1 before +1 at equal t, i.e.
    * half-open [start, end) intervals — a window ending exactly when
    * another starts never overlaps it. Equal boundary points permute
    * only WHICH row carries which prefix value, never the value
    * multiset, so peak and its earliest instant are deterministic at
    * any partitioning. A single dominant type would bucket the running
    * sum two-level (graft.queries.PrefixSum) — same semantics. */
  def q38_overlap(s: SparkSession, dir: String): DataFrame =
    sweepLinePeak(
      Tables.events(s, dir).select("event_type", "ts_us"),
      winUs = 1800000000L) // 30 min
      .orderBy("event_type")

  /** Sweep-line core over any (event_type, ts_us) frame — split out so
    * specs can run it on planted interval patterns (half-open boundary
    * semantics, tie handling).
    *
    * Scale: a `partition by event_type order by t` running sum over the
    * raw ±1 boundary stream is ~2n/|types| rows through one task (the
    * q35d skew class — this was the skewed-window lint's second catch).
    * Collapse to the per-(type, t) BOUNDARY HISTOGRAM first: with ends
    * ordered before starts at a tied instant (half-open semantics), the
    * running count inside an instant dips then rises, so its maximum is
    * the INCLUSIVE prefix (excl + net) and only instants with ≥1 start
    * can host the peak — ends strictly descend from an earlier, higher
    * value. The inclusive prefix rides the keyed two-level
    * [[PrefixSum.exclusiveRunningSum]]; peak and earliest peak instant
    * come from one max(struct(active, -t)) partial agg — no
    * whole-partition window anywhere. */
  private[queries] def sweepLinePeak(events: DataFrame,
      winUs: Long): DataFrame = {
    val pts = events
      .select(col("event_type"), explode(array(
        struct(col("ts_us").as("t"), lit(1L).as("delta")),
        struct((col("ts_us") + lit(winUs)).as("t"),
          lit(-1L).as("delta")))).as("p"))
      .select(col("event_type"), col("p.t").as("t"), col("p.delta").as("delta"))
    val hist = pts.groupBy("event_type", "t")
      .agg(sum(when(col("delta") > 0, 1L).otherwise(0L)).as("starts"),
        sum(col("delta")).as("net"))
      .localCheckpoint()
    PrefixSum.exclusiveRunningSum(hist, "net", "excl",
        seqCol = "t", keys = Seq("event_type"))
      .withColumn("active", col("excl") + col("net"))
      .filter(col("starts") > 0)
      .groupBy("event_type")
      .agg(max(struct(col("active"), (-col("t")).as("negt"))).as("mx"))
      .select(col("event_type"), col("mx.active").as("peak"),
        (-col("mx.negt")).as("peak_t"))
  }

  val q38Sql: String =
    s"""WITH e AS ${Tables.eventsNormSql},
       |pts AS (SELECT event_type, ts_us AS t, 1 AS delta FROM e
       |        UNION ALL
       |        SELECT event_type, ts_us + 1800000000, -1 FROM e),
       |a AS (SELECT event_type, t,
       |        CAST(SUM(delta) OVER (PARTITION BY event_type
       |          ORDER BY t, delta
       |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       |          AS BIGINT) AS active
       |      FROM pts),
       |p AS (SELECT event_type, t, active,
       |        MAX(active) OVER (PARTITION BY event_type) AS peak
       |      FROM a)
       |SELECT event_type, CAST(MAX(peak) AS BIGINT) AS peak,
       |  MIN(CASE WHEN active = peak THEN t END) AS peak_t
       |FROM p GROUP BY event_type
       |ORDER BY event_type""".stripMargin

  // --------------------------------------------------------------- Q38b
  /** INTERVAL-UNION coverage (q38b) — per event type, the total time
    * covered by the UNION of the 30-minute activity intervals
    * [ts, ts+30min): q38's sweep line answers "how many overlap at
    * the peak", this answers "how much of the clock is covered at
    * all" (uptime from heartbeats, listened-time from play events —
    * double-counting overlaps is the classic naive bug).
    *
    * Merged-islands via NEIGHBOR GAPS, not a per-type running max: all
    * intervals share one width, so the running max of ends over a
    * type's sorted rows is just the previous DISTINCT start + width —
    * an island breaks exactly where the gap between consecutive
    * distinct starts exceeds the width (half-open semantics: a gap
    * EQUAL to the width chains), and each start covers
    * min(gap_to_next, width) fresh time (the last start covers width).
    * The textbook `partition by type order by ts` window form funnels
    * ~n/|types| rows through one task (the q35d skew class — the
    * skewed-window lint's third catch); instead the start histogram's
    * next-neighbor comes from the two-level [[PrefixLead.nextSeq]]
    * (in-bucket lead + next-bucket-min carry over summaries), and
    * islands/coverage/interval counts fold in ONE partial agg.
    * Duplicate starts are symmetric (same end), so collapsing to
    * distinct (type, ts) with counts loses nothing — deterministic at
    * any partitioning. */
  def q38b_interval_union(s: SparkSession, dir: String): DataFrame =
    intervalUnion(
      Tables.events(s, dir).select("event_type", "ts_us", "event_id"),
      winUs = 1800000000L) // 30 min
      .orderBy("event_type")

  /** Core over (event_type, ts_us, event_id) rows — exposed so specs
    * can plant touching/nested/disjoint interval patterns. */
  private[queries] def intervalUnion(events: DataFrame,
      winUs: Long): DataFrame = {
    val starts = events.groupBy("event_type", "ts_us")
      .agg(count(lit(1)).as("cnt"))
      .localCheckpoint() // PrefixLead forks into main + summary branches
    PrefixLead.nextSeq(starts, "next_ts",
        seqCol = "ts_us", keys = Seq("event_type"))
      .withColumn("fresh_us",
        when(col("next_ts").isNull, lit(winUs))
          .otherwise(least(col("next_ts") - col("ts_us"), lit(winUs))))
      .withColumn("brk",
        when(col("next_ts").isNotNull &&
          col("next_ts") - col("ts_us") > winUs, 1L).otherwise(0L))
      .groupBy("event_type")
      .agg((sum(col("brk")) + lit(1L)).as("n_islands"),
        sum(col("cnt")).as("n_intervals"),
        sum(col("fresh_us")).as("covered_us"))
  }

  val q38bSql: String =
    s"""WITH e AS ${Tables.eventsNormSql},
       |iv AS (SELECT event_type, event_id, ts_us,
       |         ts_us + 1800000000 AS fin
       |       FROM e),
       |m AS (SELECT event_type, event_id, ts_us, fin,
       |        MAX(fin) OVER (PARTITION BY event_type
       |          ORDER BY ts_us, event_id
       |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
       |          AS prev_max
       |      FROM iv),
       |s AS (SELECT event_type, event_id, ts_us, fin,
       |        CASE WHEN prev_max IS NULL OR ts_us > prev_max
       |          THEN 1 ELSE 0 END AS new_island
       |      FROM m),
       |isl AS (SELECT event_type, ts_us, fin,
       |          SUM(new_island) OVER (PARTITION BY event_type
       |            ORDER BY ts_us, event_id
       |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       |            AS island
       |        FROM s),
       |g AS (SELECT event_type, island,
       |        MAX(fin) - MIN(ts_us) AS len, COUNT(*) AS n
       |      FROM isl GROUP BY 1, 2)
       |SELECT event_type, COUNT(*) AS n_islands,
       |  CAST(SUM(n) AS BIGINT) AS n_intervals,
       |  CAST(SUM(len) AS BIGINT) AS covered_us
       |FROM g GROUP BY event_type
       |ORDER BY event_type""".stripMargin

  // ---------------------------------------------------------------- Q40
  /** Batch SESSIONIZATION: the 30-minute gap rule — a gap of more than
    * 30 min of inactivity per user closes the session — assigns every
    * event a (user, session) id, then sessions collapse to
    * start/end/count/revenue. This is s03's session-window semantics as
    * a batch operator with session IDENTITY exposed (session_window
    * keeps only the window bounds; joins back to events need the id).
    *
    * One sort per user partition serves both window passes (the gap
    * lag and the running new-session count share partitionBy+orderBy,
    * so Spark plans a single WindowExec), then one partial-agg groupBy.
    * Per-user partitions are bounded by that user's event count —
    * skew-free at any corpus size; revenue sums DECIMAL(18,2) so the
    * total is order-independent (the repo's money convention). */
  /** Core sessionizer over (user_id, event_id, ts_us, value) rows —
    * exposed so specs can plant gap-boundary cases. */
  private[graft] def sessionize(e: DataFrame,
      gapUs: Long = 30L * 60 * 1000 * 1000): DataFrame = {
    val wOrd = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    e.withColumn("new_s",
        when(col("ts_us") - lag(col("ts_us"), 1).over(wOrd) > gapUs, 1L)
          .otherwise(0L))
      .withColumn("session_id", sum(col("new_s")).over(
        wOrd.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy("user_id", "session_id")
      .agg(min(col("ts_us")).as("start_us"),
        max(col("ts_us")).as("end_us"),
        count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(18, 2))).cast(DoubleType)
          .as("revenue"))
  }

  def q40_sessionize(s: SparkSession, dir: String): DataFrame =
    sessionize(Tables.events(s, dir)).orderBy("user_id", "session_id")

  val q40Sql: String =
    s"""WITH e AS ${Tables.eventsNormSql},
       |m AS (SELECT user_id, event_id, ts_us, value,
       |        CASE WHEN ts_us - LAG(ts_us) OVER (PARTITION BY user_id
       |            ORDER BY ts_us, event_id) > 1800000000
       |          THEN 1 ELSE 0 END AS new_s
       |      FROM e),
       |s AS (SELECT user_id, ts_us, value,
       |        CAST(SUM(new_s) OVER (PARTITION BY user_id
       |          ORDER BY ts_us, event_id
       |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       |          AS BIGINT) AS session_id
       |      FROM m)
       |SELECT user_id, session_id,
       |  MIN(ts_us) AS start_us, MAX(ts_us) AS end_us,
       |  count(*) AS n_events,
       |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS revenue
       |FROM s GROUP BY user_id, session_id
       |ORDER BY user_id, session_id""".stripMargin

  // -------------------------------------------------------------- Q29c
  /** LAST-TOUCH ATTRIBUTION — each purchase credits the user's most
    * recent preceding non-purchase event ("channel"); purchases with no
    * prior touch are 'direct'. The marketing-analytics sibling of the
    * funnel: same one-sort-per-user discipline — ONE window carries the
    * last touch to every row (IGNORE NULLS last_value over the bounded
    * per-user partition; never a self-join of purchases × touches,
    * which is the quadratic trap), then a |channels|-row partial-agg
    * rollup of purchase count + exact DECIMAL revenue. Total order
    * inside a user = (ts_us, event_id) so simultaneous events attribute
    * deterministically in both engines. */
  /** Core over (user_id, ts_us, event_id, event_type, value) rows —
    * exposed so specs can plant sequences. */
  private[graft] def attribution(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    events
      .withColumn("touch",
        last(when(col("event_type") =!= "purchase", col("event_type")),
          ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase")
      .groupBy(coalesce(col("touch"), lit("direct")).as("channel"))
      .agg(count(lit(1)).as("n_purchases"),
        sum(col("value").cast("decimal(18,2)")).cast("double")
          .as("revenue"))
  }

  def q29c_attribution(s: SparkSession, dir: String): DataFrame =
    attribution(Tables.events(s, dir)).orderBy("channel")

  val q29cSql: String =
    s"""WITH e AS ${Tables.eventsNormSql},
       |t AS (SELECT *,
       |    LAST_VALUE(CASE WHEN event_type != 'purchase'
       |                    THEN event_type END IGNORE NULLS)
       |      OVER (PARTITION BY user_id ORDER BY ts_us, event_id
       |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
       |      AS touch
       |  FROM e)
       |SELECT COALESCE(touch, 'direct') AS channel,
       |  COUNT(*) AS n_purchases,
       |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS revenue
       |FROM t WHERE event_type = 'purchase'
       |GROUP BY 1 ORDER BY channel""".stripMargin

  // ----------------------------------------------------------------
  // -------------------------------------------------------------- Q29d
  /** SESSION-PATH MINING — the top-20 most common within-session
    * event-type sequences (the "user journey" report behind funnel
    * design: which paths actually occur, and how many distinct users
    * walk them). Same session identity as q40 (30-min gap over ONE
    * per-user window sort), but instead of aggregating the session away
    * the path materializes ROW-LOCALLY: collect each session's
    * (ts_us, event_id, event_type) structs once, sort in-row, join the
    * types with '>' — never a cross-session shuffle of partial paths.
    * Then one |paths|-row partial-agg groupBy (sessions collapse
    * map-side) and a global top-20 through TakeOrderedAndProject — k
    * rows per partition cross to the driver, never the path table.
    * Path length is bounded by session length (the 30-min gap bounds
    * state the same way it bounds q40), so the collected array is
    * session-scale, not user-scale. (ts_us, event_id) makes the
    * in-session order total, so ties replay identically in both
    * engines. */
  /** Per-session path assembly over (user_id, ts_us, event_id,
    * event_type) rows — exposed so specs can plant sequences. Returns
    * one (user_id, session_id, path) row per session. */
  private[graft] def sessionPaths(e: DataFrame,
      gapUs: Long = 30L * 60 * 1000 * 1000): DataFrame = {
    val wOrd = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    e.select(col("user_id"), col("ts_us"), col("event_id"),
        col("event_type"))
      .withColumn("new_s",
        when(col("ts_us") - lag(col("ts_us"), 1).over(wOrd) > gapUs, 1L)
          .otherwise(0L))
      .withColumn("session_id", sum(col("new_s")).over(
        wOrd.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy("user_id", "session_id")
      .agg(array_join(transform(
          array_sort(collect_list(
            struct(col("ts_us"), col("event_id"), col("event_type")))),
          x => x.getField("event_type")), ">").as("path"))
  }

  def q29d_paths(s: SparkSession, dir: String): DataFrame =
    sessionPaths(Tables.events(s, dir))
      .groupBy("path")
      .agg(count(lit(1)).as("n_sessions"),
        countDistinct(col("user_id")).as("n_users"))
      .orderBy(col("n_sessions").desc, col("path"))
      .limit(20)

  val q29dSql: String =
    s"""WITH e AS ${Tables.eventsNormSql},
       |m AS (SELECT user_id, event_id, ts_us, event_type,
       |        CASE WHEN ts_us - LAG(ts_us) OVER (PARTITION BY user_id
       |            ORDER BY ts_us, event_id) > 1800000000
       |          THEN 1 ELSE 0 END AS new_s
       |      FROM e),
       |s AS (SELECT user_id, event_id, ts_us, event_type,
       |        SUM(new_s) OVER (PARTITION BY user_id
       |          ORDER BY ts_us, event_id
       |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       |          AS session_id
       |      FROM m),
       |p AS (SELECT user_id, session_id,
       |        string_agg(event_type, '>' ORDER BY ts_us, event_id)
       |          AS path
       |      FROM s GROUP BY user_id, session_id)
       |SELECT path, count(*) AS n_sessions,
       |  count(DISTINCT user_id) AS n_users
       |FROM p GROUP BY path
       |ORDER BY n_sessions DESC, path LIMIT 20""".stripMargin

  // -------------------------------------------------------------- Q29f
  /** MARKOV TRANSITION MATRIX (q29f) — global (src → dst) counts over
    * each user's consecutive event pairs plus the per-source transition
    * probability in ppm: the first-order behavioral model under q29d's
    * raw paths (where do users go NEXT from each state). One
    * lead() window per user (the q29/q40 one-sort-per-user discipline),
    * then a |types|²-key partial-agg groupBy; the ppm normalization is
    * a window over the 25-row aggregate, not the corpus. */
  def q29f_markov(s: SparkSession, dir: String): DataFrame = {
    val wOrd = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    Tables.events(s, dir)
      .select(col("user_id"), col("ts_us"), col("event_id"),
        col("event_type").as("src"))
      .withColumn("dst", lead(col("src"), 1).over(wOrd))
      .filter(col("dst").isNotNull)
      .groupBy("src", "dst").agg(count(lit(1)).as("n"))
      .withColumn("p_ppm",
        expr("n * 1000000 div (sum(n) over (partition by src))"))
      .orderBy("src", "dst")
  }

  val q29fSql: String =
    s"""WITH e AS ${Tables.eventsNormSql},
       |s AS (
       |  SELECT event_type AS src,
       |    lead(event_type) OVER (PARTITION BY user_id
       |      ORDER BY ts_us, event_id) AS dst
       |  FROM e),
       |c AS (SELECT src, dst, CAST(COUNT(*) AS BIGINT) AS n
       |      FROM s WHERE dst IS NOT NULL GROUP BY 1, 2)
       |SELECT src, dst, n,
       |  CAST(n * 1000000 // SUM(n) OVER (PARTITION BY src) AS BIGINT)
       |    AS p_ppm
       |FROM c ORDER BY src, dst""".stripMargin

  // -------------------------------------------------------------- Q29g
  /** SEQUENTIAL CO-OCCURRENCE (q29g) — within each 30-minute session,
    * which event type PRECEDES which: (a, b) counted once per session
    * when some a occurs before some b (first(a) < last(b), a ≠ b) — the
    * order-aware sibling of q42's basket co-occurrence, the "what leads
    * to what" input a funnel designer mines before hard-coding stages.
    *
    * Scale: sessionization is the q40 window; the per-session
    * (type, first, last) profile is a partial-agg groupBy; pair
    * expansion is ROW-LOCAL (collect the ≤|types| profile per session,
    * one transform×filter lambda — the q42 idiom, never a self-join of
    * the event table); the final count is a |types|²-key aggregate. */
  def q29g_seq(s: SparkSession, dir: String): DataFrame = {
    val wOrd = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    val sess = Tables.events(s, dir)
      .select(col("user_id"), col("ts_us"), col("event_id"),
        col("event_type"))
      .withColumn("new_s",
        when(col("ts_us") - lag(col("ts_us"), 1).over(wOrd) > 1800000000L,
          1L).otherwise(0L))
      .withColumn("sid", sum(col("new_s")).over(
        wOrd.rowsBetween(Window.unboundedPreceding, 0)))
    sess.groupBy("user_id", "sid", "event_type")
      .agg(min("ts_us").as("f"), max("ts_us").as("l"))
      .groupBy("user_id", "sid")
      .agg(collect_list(struct(col("event_type").as("t"), col("f"),
        col("l"))).as("ps"))
      .select(explode(expr(
        """flatten(transform(ps, x ->
          |  filter(transform(ps, y -> struct(x.t AS a, y.t AS b,
          |                                   x.f AS f, y.l AS l)),
          |    p -> p.a != p.b AND p.f < p.l)))""".stripMargin)).as("p"))
      .groupBy(col("p.a").as("a"), col("p.b").as("b"))
      .agg(count(lit(1)).as("n_sessions"))
      .orderBy("a", "b")
  }

  val q29gSql: String =
    s"""WITH e AS ${Tables.eventsNormSql},
       |g AS (
       |  SELECT user_id, event_id, ts_us, event_type,
       |    CASE WHEN ts_us - lag(ts_us) OVER (PARTITION BY user_id
       |        ORDER BY ts_us, event_id) > 1800000000
       |      THEN 1 ELSE 0 END AS new_s
       |  FROM e),
       |s AS (
       |  SELECT user_id, event_type, ts_us,
       |    SUM(new_s) OVER (PARTITION BY user_id
       |      ORDER BY ts_us, event_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
       |  FROM g),
       |m AS (SELECT user_id, sid, event_type AS t,
       |        min(ts_us) AS f, max(ts_us) AS l
       |      FROM s GROUP BY 1, 2, 3),
       |p AS (SELECT a.user_id, a.sid, a.t AS a, b.t AS b
       |      FROM m a JOIN m b ON a.user_id = b.user_id AND a.sid = b.sid
       |        AND a.t <> b.t AND a.f < b.l)
       |SELECT a, b, CAST(COUNT(*) AS BIGINT) AS n_sessions
       |FROM p GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // -------------------------------------------------------------- Q34d
  /** DAY-OF-WEEK SEASONAL PROFILE — per (event_type, weekday): observed
    * days, total events, average daily volume, and the seasonal index
    * (this weekday's average as ‰ of the type's all-days average — the
    * multiplicative factor a forecast or the q35 anomaly baseline would
    * deseasonalize by). Built on the q34 gap-filled series so quiet
    * weekdays pull their average down (a day with no events is a 0, not
    * a gap). Weekday = epoch-day mod 7 — calendar-free, identical in
    * both engines. Two tiny stages after the daily aggregate: a
    * 7-rows-per-type partial-agg groupBy, then per-type totals via a
    * window over that 7-row aggregate (partitioned — never row-scale).
    * All ratios in integer micro/milli units via two-step floor
    * division, so every bit is engine-portable; magnitudes stay in
    * int64 for daily volumes up to ~10¹² events per (type, weekday). */
  def q34d_seasonal(s: SparkSession, dir: String): DataFrame = {
    val byDow = gapFilled(s, dir)
      .withColumn("dow", expr("day % 7"))
      .groupBy("event_type", "dow")
      .agg(count(lit(1)).as("n_days"), sum(col("n")).as("n_events"))
    val w = Window.partitionBy("event_type")
    byDow
      .withColumn("tot_days", sum(col("n_days")).over(w))
      .withColumn("tot_events", sum(col("n_events")).over(w))
      .withColumn("avg_micro", expr("1000000 * n_events div n_days"))
      .withColumn("idx_milli",
        expr("(1000 * (1000000 * n_events div n_days))" +
          " div (1000000 * tot_events div tot_days)"))
      .select("event_type", "dow", "n_days", "n_events", "avg_micro",
        "idx_milli")
      .orderBy("event_type", "dow")
  }

  val q34dSql: String =
    s"""$gapFillCtes,
       |w AS (SELECT event_type, day % 7 AS dow, count(*) AS n_days,
       |        CAST(SUM(n) AS BIGINT) AS n_events
       |      FROM f GROUP BY 1, 2),
       |t AS (SELECT *,
       |        CAST(SUM(n_days) OVER (PARTITION BY event_type) AS BIGINT)
       |          AS tot_days,
       |        CAST(SUM(n_events) OVER (PARTITION BY event_type) AS BIGINT)
       |          AS tot_events
       |      FROM w)
       |SELECT event_type, dow, n_days, n_events,
       |  (1000000 * n_events) // n_days AS avg_micro,
       |  (1000 * ((1000000 * n_events) // n_days))
       |    // ((1000000 * tot_events) // tot_days) AS idx_milli
       |FROM t ORDER BY event_type, dow""".stripMargin

  // -------------------------------------------------------------- Q35c
  /** SEASONALLY-ADJUSTED anomaly score — q35's trailing z-score run on
    * the DESEASONALIZED series: each day's count is first divided by
    * its weekday's q34d seasonal index (so "every Saturday is quiet"
    * stops tripping the detector and a quiet TUESDAY does), then
    * z-scored against the strictly-preceding 7 adjusted days. The
    * composition is the point: gap fill → seasonal profile → adjust →
    * trailing moments, one declarative plan. The index join is a
    * broadcast of the 7·|types|-row aggregate; the z-scores reuse q35's
    * deterministic-moments recipe (identical double formulas both
    * engines); adjustment is integer floor division with a
    * greatest(idx, 1) guard for weekdays the series never hit. */
  def q35c_seasonal_anomaly(s: SparkSession, dir: String): DataFrame = {
    // forked by the profile agg and the adjust join — snapshot so the
    // scaffold isn't built twice
    val filled = gapFilled(s, dir)
      .withColumn("dow", expr("day % 7"))
      .localCheckpoint()
    val wT = Window.partitionBy("event_type")
    val idx = filled.groupBy("event_type", "dow")
      .agg(count(lit(1)).as("n_days"), sum(col("n")).as("n_events"))
      .withColumn("tot_days", sum(col("n_days")).over(wT))
      .withColumn("tot_events", sum(col("n_events")).over(wT))
      .withColumn("idx_milli",
        expr("(1000 * (1000000 * n_events div n_days))" +
          " div (1000000 * tot_events div tot_days)"))
      .select("event_type", "dow", "idx_milli")
    val w = Window.partitionBy("event_type").orderBy("day")
      .rowsBetween(-7, -1)
    filled.join(broadcast(idx), Seq("event_type", "dow"))
      .withColumn("adj", expr("n * 1000 div greatest(idx_milli, 1L)"))
      .withColumn("m", count(col("adj")).over(w).cast(DoubleType))
      .withColumn("sx", sum(col("adj")).over(w).cast(DoubleType))
      .withColumn("sxx",
        sum(col("adj") * col("adj")).over(w).cast(DoubleType))
      .filter(col("m") >= 2)
      .withColumn("mean", col("sx") / col("m"))
      .withColumn("variance",
        (col("m") * col("sxx") - col("sx") * col("sx")) /
          (col("m") * (col("m") - lit(1.0))))
      .filter(col("variance") > 0)
      .withColumn("z",
        (col("adj").cast(DoubleType) - col("mean")) / sqrt(col("variance")))
      .filter(abs(col("z")) > 2.0)
      .select("event_type", "day", "n", "adj", "mean", "z")
      .orderBy("event_type", "day")
  }

  val q35cSql: String =
    s"""$gapFillCtes,
       |fd AS (SELECT event_type, day, n, day % 7 AS dow FROM f),
       |w AS (SELECT event_type, dow, count(*) AS n_days,
       |        CAST(SUM(n) AS BIGINT) AS n_events
       |      FROM fd GROUP BY 1, 2),
       |t AS (SELECT *,
       |        CAST(SUM(n_days) OVER (PARTITION BY event_type) AS BIGINT)
       |          AS tot_days,
       |        CAST(SUM(n_events) OVER (PARTITION BY event_type) AS BIGINT)
       |          AS tot_events
       |      FROM w),
       |ix AS (SELECT event_type, dow,
       |         (1000 * ((1000000 * n_events) // n_days))
       |           // ((1000000 * tot_events) // tot_days) AS idx_milli
       |       FROM t),
       |a AS (SELECT fd.event_type, fd.day, fd.n,
       |        CAST(fd.n * 1000 // GREATEST(ix.idx_milli, 1) AS BIGINT)
       |          AS adj
       |      FROM fd JOIN ix ON ix.event_type = fd.event_type
       |        AND ix.dow = fd.dow),
       |m AS (SELECT event_type, day, n, adj,
       |        CAST(COUNT(adj) OVER wd AS DOUBLE) AS m,
       |        CAST(SUM(adj) OVER wd AS DOUBLE) AS sx,
       |        CAST(SUM(adj * adj) OVER wd AS DOUBLE) AS sxx
       |      FROM a WINDOW wd AS (PARTITION BY event_type ORDER BY day
       |        ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)),
       |zz AS (SELECT event_type, day, n, adj, sx / m AS mean,
       |         (CAST(adj AS DOUBLE) - sx / m) /
       |           sqrt((m * sxx - sx * sx) / (m * (m - 1.0))) AS z
       |       FROM m
       |       WHERE m >= 2 AND (m * sxx - sx * sx) / (m * (m - 1.0)) > 0)
       |SELECT event_type, day, n, adj, mean, z
       |FROM zz WHERE abs(z) > 2.0
       |ORDER BY event_type, day""".stripMargin

  // -------------------------------------------------------------- Q35d
  /** MAD ROBUST OUTLIERS (q35d) — per event type: the exact median of
    * `value`, the exact median absolute deviation, and how many events
    * sit beyond 3 MADs — the 50%-breakdown robust detector that keeps
    * working when q35's mean/stddev z-score is itself dragged by the
    * outliers it should flag. Values live as micro-unit BIGINTs; medians
    * carry the ×2 doubled-trick (odd n → 2·middle, even n → the middle
    * pair's sum) so NO division ever happens — dev2 = 2·|v−med| and
    * mad4 = 4·MAD are exact integers, and |v−med| > 3·MAD clears
    * denominators to `2·dev2 > 3·mad4`.
    *
    * Scale: the naive per-type sort-and-rank median would hash the whole
    * corpus into |event_type| window partitions — the classic
    * low-cardinality-window skew. Collapsing to the (type, value, count)
    * HISTOGRAM first (a partial-agg groupBy) does NOT close it alone:
    * `value` is a continuous double, so distinct micro-units ≈ row count
    * and a `partition by et order by value` cumulative over the
    * "histogram" still funnels ~n/|types| rows through ONE task. Both
    * cumulative ranks therefore ride the KEYED two-level
    * [[PrefixSum.exclusiveRunningSum]] (keys = et): in-bucket windows are
    * partitioned by (et, value-bucket) — bounded by the auto-sized
    * bucket, not by type cardinality — and the cross-bucket carry runs
    * over per-(et, bucket) SUMMARY rows. The per-type totals are a
    * partial-agg groupBy broadcast back (never a whole-partition
    * window); everything corpus-scale is map-side partial aggregation.
    * The histograms are localCheckpoint'd first — PrefixSum forks its
    * input into main + summary branches (the documented
    * expensive-upstream caveat), and the second pass re-reads the first.
    */
  def q35d_mad(s: SparkSession, dir: String): DataFrame = {
    val v = Tables.events(s, dir).select(col("event_type").as("et"),
      expr("CAST(round(value * 1000000) AS BIGINT)").as("vus"))
    val hist = v.groupBy("et", "vus").agg(count(lit(1)).as("cnt"))
      .localCheckpoint()
    val tot = hist.groupBy("et").agg(sum("cnt").as("n"))
    val c = PrefixSum.exclusiveRunningSum(hist, "cnt", "below",
        seqCol = "vus", keys = Seq("et"))
      .withColumn("cum", col("below") + col("cnt"))
      .join(broadcast(tot), "et")
    val m = c.groupBy("et").agg(max("n").as("n"),
      (min(when(col("cum") >= expr("(n + 1) div 2"), col("vus"))) +
        min(when(col("cum") >= expr("(n + 2) div 2"), col("vus"))))
        .as("med2"))
      // 5-row frame, but its subtree is the whole first median pass —
      // snapshot it so the deviation scan below (forked into the dev2
      // histogram and the final outlier count) doesn't replay it
      .localCheckpoint()
    // deviation pass rides the FIRST histogram, not the corpus: every
    // (et, vus) bucket maps whole to one dev2 bucket, so summing the
    // bucket counts is bit-identical to re-counting corpus rows — the
    // previous shape re-scanned events twice more (once for the dev2
    // histogram, once for the outlier count; guide §1.2: 3 passes → 1)
    val d = hist.join(broadcast(m), "et")
      .select(col("et"), abs(lit(2) * col("vus") - col("med2")).as("dev2"),
        col("cnt"), col("med2"), col("n"))
    val hist2 = d.groupBy("et", "dev2")
      .agg(sum("cnt").as("cnt"), max("med2").as("med2"), max("n").as("n"))
      .localCheckpoint()
    val c2 = PrefixSum.exclusiveRunningSum(hist2, "cnt", "below2",
        seqCol = "dev2", keys = Seq("et"))
      .withColumn("cum", col("below2") + col("cnt"))
    val m2 = c2.groupBy("et").agg(
      (min(when(col("cum") >= expr("(n + 1) div 2"), col("dev2"))) +
        min(when(col("cum") >= expr("(n + 2) div 2"), col("dev2"))))
        .as("mad4"))
    hist2.join(broadcast(m2), "et")
      .groupBy("et")
      .agg(max("n").as("n"), max("med2").as("med2"), max("mad4").as("mad4"),
        sum(when(lit(2) * col("dev2") > lit(3) * col("mad4"), col("cnt"))
          .otherwise(0L)).as("n_outliers"))
      .orderBy("et")
  }

  val q35dSql: String =
    """WITH v AS (
      |  SELECT event_type AS et, CAST(round(value * 1000000) AS BIGINT)
      |    AS vus
      |  FROM events),
      |c AS (
      |  SELECT et, vus,
      |    SUM(cnt) OVER (PARTITION BY et ORDER BY vus) AS cum,
      |    SUM(cnt) OVER (PARTITION BY et) AS n
      |  FROM (SELECT et, vus, CAST(COUNT(*) AS BIGINT) AS cnt
      |        FROM v GROUP BY 1, 2)),
      |m AS (
      |  SELECT et, CAST(MAX(n) AS BIGINT) AS n,
      |    CAST(MIN(CASE WHEN cum >= (n + 1) // 2 THEN vus END)
      |       + MIN(CASE WHEN cum >= (n + 2) // 2 THEN vus END) AS BIGINT)
      |      AS med2
      |  FROM c GROUP BY et),
      |d AS (
      |  SELECT v.et, abs(2 * v.vus - m.med2) AS dev2, m.med2, m.n
      |  FROM v JOIN m ON v.et = m.et),
      |c2 AS (
      |  SELECT et, dev2, med2, n,
      |    SUM(cnt) OVER (PARTITION BY et ORDER BY dev2) AS cum
      |  FROM (SELECT et, dev2, CAST(COUNT(*) AS BIGINT) AS cnt,
      |          MAX(med2) AS med2, MAX(n) AS n
      |        FROM d GROUP BY et, dev2)),
      |m2 AS (
      |  SELECT et,
      |    CAST(MIN(CASE WHEN cum >= (n + 1) // 2 THEN dev2 END)
      |       + MIN(CASE WHEN cum >= (n + 2) // 2 THEN dev2 END) AS BIGINT)
      |      AS mad4
      |  FROM c2 GROUP BY et)
      |SELECT d.et, MAX(d.n) AS n, MAX(d.med2) AS med2, MAX(m2.mad4) AS mad4,
      |  CAST(SUM(CASE WHEN 2 * d.dev2 > 3 * m2.mad4 THEN 1 ELSE 0 END)
      |    AS BIGINT) AS n_outliers
      |FROM d JOIN m2 ON d.et = m2.et
      |GROUP BY d.et ORDER BY d.et""".stripMargin

  // -------------------------------------------------------------- Q34g
  /** TIME-WEIGHTED AVERAGE (q34g) — per user, the TWAP of `value`: each
    * event's value holds until the user's next event, so the mean is
    * weighted by holding duration, immune to burst-sampling bias (the
    * irregular-series mean a plain avg() gets wrong). Weights are
    * integer milliseconds from lead(ts) over a (ts, event_id)-ordered
    * per-user window; values are milli-units; each weight×value product
    * fits int64 (≤2.6e9 ms span × 4.9e5 ≈ 1.3e15) and the SUM rides
    * DECIMAL(38,0) so unbounded per-user history can never wrap — the
    * final double is one exact-operand IEEE division (q19 discipline).
    * A user's last event gets zero weight; single-event users yield NULL
    * via the 0-denominator CASE, never NaN.
    *
    * Scale: one window and one groupBy, both keyed on user_id — the
    * window sort and the aggregate shuffle share the user-key exchange,
    * and user-bounded partitions never see corpus-scale skew. */
  def q34g_twap(s: SparkSession, dir: String): DataFrame = {
    val d38 = DecimalType(38, 0)
    Tables.events(s, dir)
      .select(col("user_id"), col("event_id"), col("ts_us"),
        expr("CAST(round(value * 1000) AS BIGINT)").as("vms"))
      .withColumn("w_ms",
        expr("(lead(ts_us, 1) over (partition by user_id " +
          "order by ts_us, event_id) - ts_us) div 1000"))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_events"),
        sum(col("w_ms").cast(d38)).as("sum_w_ms"),
        sum((col("w_ms") * col("vms")).cast(d38)).as("sum_wv"))
      .select(col("user_id"), col("n_events"),
        col("sum_w_ms").cast(LongType).as("sum_w_ms"),
        when(col("sum_w_ms") > 0,
          col("sum_wv").cast(DoubleType) /
            col("sum_w_ms").cast(DoubleType)).as("twap_milli"))
      .orderBy("user_id")
    }

  val q34gSql: String =
    s"""WITH e AS ${Tables.eventsNormSql},
       |v AS (
       |  SELECT user_id, event_id, ts_us,
       |    CAST(round(value * 1000) AS BIGINT) AS vms
       |  FROM e),
       |d AS (
       |  SELECT user_id, vms,
       |    (lead(ts_us, 1) OVER (PARTITION BY user_id
       |      ORDER BY ts_us, event_id) - ts_us) // 1000 AS w_ms
       |  FROM v),
       |g AS (
       |  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
       |    SUM(CAST(w_ms AS DECIMAL(38,0))) AS sum_w_ms,
       |    SUM(CAST(w_ms * vms AS DECIMAL(38,0))) AS sum_wv
       |  FROM d GROUP BY user_id)
       |SELECT user_id, n_events, CAST(sum_w_ms AS BIGINT) AS sum_w_ms,
       |  CASE WHEN sum_w_ms > 0
       |    THEN CAST(sum_wv AS DOUBLE) / CAST(sum_w_ms AS DOUBLE) END
       |    AS twap_milli
       |FROM g ORDER BY user_id""".stripMargin

  // -------------------------------------------------------------- Q34h
  /** OHLC BAR RESAMPLE (q34h) — the candlestick downsample: per
    * (event_type, UTC day), the first/highest/lowest/last `value` and
    * the tick count. First/last are rank-selected over the total
    * (ts, event_id) order — the min(CASE WHEN rn=1) trick, exact under
    * ties — high/low/count are plain partial aggregates. Values in
    * milli-units, day = ts_us div 86_400_000_000: all integer.
    *
    * Scale: the two ranking windows partition on the SAME (type, day)
    * key as the final groupBy, so one hash exchange feeds sort, rank,
    * and aggregate; bars are day-bounded partitions (intraday volume,
    * never the corpus). The map-side-combine groupBy then carries
    * |bars|×partitions rows. */
  def q34h_ohlc(s: SparkSession, dir: String): DataFrame = {
    val v = Tables.events(s, dir)
      .select(col("event_type").as("et"),
        expr("ts_us div 86400000000").as("day"),
        col("ts_us"), col("event_id"),
        expr("CAST(round(value * 1000) AS BIGINT)").as("vms"))
    val wb = Window.partitionBy("et", "day")
    v.withColumn("rn",
        row_number().over(wb.orderBy("ts_us", "event_id")).cast(LongType))
      .withColumn("rnd",
        row_number().over(wb.orderBy(col("ts_us").desc, col("event_id").desc))
          .cast(LongType))
      .groupBy("et", "day")
      .agg(min(when(col("rn") === 1, col("vms"))).as("open_milli"),
        max("vms").as("high_milli"), min("vms").as("low_milli"),
        min(when(col("rnd") === 1, col("vms"))).as("close_milli"),
        count(lit(1)).as("n_ticks"))
      .orderBy("et", "day")
  }

  val q34hSql: String =
    s"""WITH e AS ${Tables.eventsNormSql},
       |v AS (
       |  SELECT event_type AS et, ts_us // 86400000000 AS day,
       |    ts_us, event_id, CAST(round(value * 1000) AS BIGINT) AS vms
       |  FROM e),
       |r AS (
       |  SELECT et, day, vms,
       |    ROW_NUMBER() OVER (PARTITION BY et, day
       |      ORDER BY ts_us, event_id) AS rn,
       |    ROW_NUMBER() OVER (PARTITION BY et, day
       |      ORDER BY ts_us DESC, event_id DESC) AS rnd
       |  FROM v)
       |SELECT et, day,
       |  CAST(MIN(CASE WHEN rn = 1 THEN vms END) AS BIGINT) AS open_milli,
       |  CAST(MAX(vms) AS BIGINT) AS high_milli,
       |  CAST(MIN(vms) AS BIGINT) AS low_milli,
       |  CAST(MIN(CASE WHEN rnd = 1 THEN vms END) AS BIGINT) AS close_milli,
       |  CAST(COUNT(*) AS BIGINT) AS n_ticks
       |FROM r GROUP BY et, day ORDER BY et, day""".stripMargin

  // -------------------------------------------------------------- Q34f
  /** HOLT double-exponential smoothing (α = β = 1/4) over the gap-filled
    * daily series — the level+trend forecaster one rung above q34c's
    * EWMA (which tracks level only and lags any drift): per (type, day),
    * the smoothed level, the smoothed trend, and the one-step-ahead
    * forecast l+b. Coupled recurrences no window frame can express —
    * same collect-once row-local `aggregate` fold as q34c, state in
    * integer 8ths.
    *
    * Exactness: the trend can be NEGATIVE, where Spark's `div`
    * (truncate) and DuckDB's `//` (floor) disagree — so both engines
    * divide as `floor(x / 4.0)`: the operands are exact in double
    * (counts ×8 ≪ 2^53) and IEEE floor is identical, restoring
    * bit-portability where the q34c `div` idiom can't go. The oracle
    * replays the recurrence as a recursive CTE. */
  def q34f_holt(s: SparkSession, dir: String): DataFrame =
    holtOf(gapFilled(s, dir))

  /** Core over a complete (event_type, day, n) daily series — exposed so
    * specs can plant series (constant lock-in, negative-trend floor). */
  private[graft] def holtOf(daily: DataFrame): DataFrame = {
    // l_t in 8ths; the b_t step needs l_t, and SQL lambdas have no
    // let-binding, so the l_t expression appears twice (once as the l
    // field, once inside b) — prev(.l/.b) is element_at(acc, -1)
    val prevL = "element_at(acc, -1).l"
    val prevB = "element_at(acc, -1).b"
    val lNew = s"cast(floor((x.n * 8 + 3 * ($prevL + $prevB)) / 4.0)" +
      " as bigint)"
    daily
      .groupBy("event_type")
      .agg(sort_array(collect_list(struct(col("day"), col("n"))))
        .as("xs"))
      .withColumn("st", expr(
        s"""aggregate(xs,
           |  cast(array() as array<struct<day: bigint, l: bigint, b: bigint>>),
           |  (acc, x) -> acc || array(
           |    case when size(acc) = 0
           |      then struct(x.day AS day, x.n * 8 AS l,
           |        cast(0 as bigint) AS b)
           |      else struct(x.day AS day, $lNew AS l,
           |        cast(floor((($lNew - $prevL) + 3 * $prevB) / 4.0)
           |          as bigint) AS b)
           |    end))""".stripMargin))
      .select(col("event_type"), explode(col("st")).as("e"))
      .select(col("event_type"), col("e.day").as("day"),
        col("e.l").as("level_8ths"), col("e.b").as("trend_8ths"),
        (col("e.l") + col("e.b")).as("forecast_8ths"))
      .orderBy("event_type", "day")
  }

  val q34fSql: String = {
    val lNew = "CAST(floor((rr.n * 8 + 3 * (rec.l + rec.b)) / 4.0)" +
      " AS BIGINT)"
    s"""WITH RECURSIVE $gapFillCteBody,
       |rr AS (SELECT event_type, day, n,
       |         row_number() OVER (PARTITION BY event_type ORDER BY day)
       |           AS rn
       |       FROM f),
       |rec AS (
       |  SELECT event_type, rn, day, n * 8 AS l, CAST(0 AS BIGINT) AS b
       |  FROM rr WHERE rn = 1
       |  UNION ALL
       |  SELECT rr.event_type, rr.rn, rr.day, $lNew,
       |    CAST(floor((($lNew - rec.l) + 3 * rec.b) / 4.0) AS BIGINT)
       |  FROM rr JOIN rec ON rr.event_type = rec.event_type
       |    AND rr.rn = rec.rn + 1)
       |SELECT event_type, day, CAST(l AS BIGINT) AS level_8ths,
       |  CAST(b AS BIGINT) AS trend_8ths,
       |  CAST(l + b AS BIGINT) AS forecast_8ths
       |FROM rec
       |ORDER BY event_type, day""".stripMargin
  }

  // -------------------------------------------------------------- Q34e
  /** LAG-k AUTOCORRELATION (ACF, k = 1..7) per event type over the
    * zero-filled daily series — the "is there weekly structure / how
    * fast does the signal decorrelate" diagnostic that decides a
    * forecast's feature windows (a lag-7 spike confirms the q34d
    * weekly seasonality; fast decay justifies the q35 7-day baseline).
    *
    * Shape: the gap-filled aggregate is |types|×days rows, so ALL
    * seven lag columns ride ONE WindowExec (same partitioning +
    * ordering — Spark fuses them into a single sort over the tiny
    * aggregate, never over raw events); the seven (x, lag-k x) pair
    * streams then stack row-locally and collapse through one
    * partial-agg groupBy to 7·|types| moment rows. Determinism is the
    * q19c recipe: exact decimal moment sums (counts square past int64
    * at ~10⁹ events/day, so the products accumulate in decimal),
    * doubles only in the final textbook correlation evaluated in
    * identical expression order on both engines; constant series
    * (zero variance) yield NULL rather than a 0/0 NaN. */
  def q34e_acf(s: SparkSession, dir: String): DataFrame =
    acfOf(gapFilled(s, dir), maxLag = 7)

  /** Core over a complete (event_type, day, n) daily series — exposed so
    * specs can plant series with known correlation structure. */
  private[graft] def acfOf(daily: DataFrame, maxLag: Int): DataFrame = {
    val lags = 1 to maxLag
    val w = Window.partitionBy("event_type").orderBy("day")
    val withLags = lags.foldLeft(daily) { (df, k) =>
      df.withColumn(s"p$k", lag(col("n"), k).over(w))
    }
    val dx = col("x").cast(DecimalType(18, 0))
    val dy = col("y").cast(DecimalType(18, 0))
    withLags
      .select(col("event_type"), explode(array(lags.map(k =>
          struct(lit(k).cast(IntegerType).as("k"), col("n").as("x"),
            col(s"p$k").as("y"))): _*)).as("p"))
      .select(col("event_type"), col("p.k").as("k"), col("p.x").as("x"),
        col("p.y").as("y"))
      .filter(col("y").isNotNull) // scaffold edge: first k days have no lag
      .groupBy("event_type", "k")
      .agg(count(lit(1)).cast(DoubleType).as("nn"),
        sum(dx).cast(DoubleType).as("sx"),
        sum(dx * dx).cast(DoubleType).as("sxx"),
        sum(dy).cast(DoubleType).as("sy"),
        sum(dy * dy).cast(DoubleType).as("syy"),
        sum(dx * dy).cast(DoubleType).as("sxy"))
      .select(col("event_type"), col("k"),
        col("nn").cast(LongType).as("n_pairs"),
        when(col("nn") * col("sxx") - col("sx") * col("sx") > 0 &&
            col("nn") * col("syy") - col("sy") * col("sy") > 0,
          (col("nn") * col("sxy") - col("sx") * col("sy")) /
            (sqrt(col("nn") * col("sxx") - col("sx") * col("sx")) *
              sqrt(col("nn") * col("syy") - col("sy") * col("sy"))))
          .as("acf"))
      .orderBy("event_type", "k")
  }

  val q34eSql: String = {
    val lagUnion = (1 to 7).map(k =>
      s"""SELECT event_type, $k AS k, n AS x,
         |  LAG(n, $k) OVER (PARTITION BY event_type ORDER BY day) AS y
         |FROM f""".stripMargin).mkString("\nUNION ALL\n")
    s"""$gapFillCtes,
       |l AS (
       |$lagUnion
       |),
       |m AS (SELECT event_type, k,
       |    CAST(COUNT(*) AS DOUBLE) AS nn,
       |    CAST(SUM(CAST(x AS DECIMAL(18,0))) AS DOUBLE) AS sx,
       |    CAST(SUM(CAST(x AS DECIMAL(18,0)) * CAST(x AS DECIMAL(18,0)))
       |      AS DOUBLE) AS sxx,
       |    CAST(SUM(CAST(y AS DECIMAL(18,0))) AS DOUBLE) AS sy,
       |    CAST(SUM(CAST(y AS DECIMAL(18,0)) * CAST(y AS DECIMAL(18,0)))
       |      AS DOUBLE) AS syy,
       |    CAST(SUM(CAST(x AS DECIMAL(18,0)) * CAST(y AS DECIMAL(18,0)))
       |      AS DOUBLE) AS sxy
       |  FROM l WHERE y IS NOT NULL GROUP BY 1, 2)
       |SELECT event_type, k, CAST(nn AS BIGINT) AS n_pairs,
       |  CASE WHEN nn * sxx - sx * sx > 0 AND nn * syy - sy * sy > 0
       |    THEN (nn * sxy - sx * sy) /
       |      (sqrt(nn * sxx - sx * sx) * sqrt(nn * syy - sy * sy))
       |  END AS acf
       |FROM m ORDER BY event_type, k""".stripMargin
  }

  // -------------------------------------------------------------- Q29e
  /** CONVERSION-LATENCY HISTOGRAM — how long users take from first
    * signup to their first purchase AFTER it, binned by hour: the
    * time-to-convert distribution that sits next to the q29 funnel
    * (q29 says how many convert; this says how fast). First-signup
    * discovery is a frame-less per-user window min (hash-style, no
    * sort) riding the same single user_id exchange the qualifying-
    * purchase filter and first-purchase groupBy reuse; the histogram
    * is a second |bins|-row partial agg. Latency is integer µs,
    * binned with `div` (strictly-after purchases make it positive, so
    * floor == truncate on both engines). */
  def q29e_convert_time(s: SparkSession, dir: String): DataFrame =
    convertTime(Tables.events(s, dir))

  /** Core over (user_id, event_type, ts_us) rows — exposed so specs can
    * plant conversion shapes (no purchase / purchase-before-signup /
    * repeat purchases). */
  private[graft] def convertTime(events: DataFrame): DataFrame = {
    val usHour = 3600000000L
    val w = Window.partitionBy("user_id")
    events
      .filter(col("event_type").isin("signup", "purchase"))
      .select("user_id", "event_type", "ts_us")
      .withColumn("t_signup",
        min(when(col("event_type") === "signup", col("ts_us"))).over(w))
      .filter(col("event_type") === "purchase" &&
        col("t_signup").isNotNull && col("ts_us") > col("t_signup"))
      .groupBy("user_id", "t_signup")
      .agg(min(col("ts_us")).as("t_purchase"))
      .withColumn("lat_h", expr(s"(t_purchase - t_signup) div $usHour"))
      .groupBy("lat_h")
      .agg(count(lit(1)).as("n_users"))
      .orderBy("lat_h")
  }

  val q29eSql: String =
    s"""WITH e AS ${Tables.eventsNormSql},
       |s AS (SELECT user_id, MIN(ts_us) AS t_signup
       |      FROM e WHERE event_type = 'signup' GROUP BY 1),
       |p AS (SELECT e.user_id, s.t_signup, MIN(e.ts_us) AS t_purchase
       |      FROM e JOIN s ON e.user_id = s.user_id
       |      WHERE e.event_type = 'purchase' AND e.ts_us > s.t_signup
       |      GROUP BY 1, 2)
       |SELECT (t_purchase - t_signup) // 3600000000 AS lat_h,
       |  count(*) AS n_users
       |FROM p GROUP BY 1 ORDER BY lat_h""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q34e_acf" -> (q34e_acf _),
    "q34f_holt" -> (q34f_holt _),
    "q34g_twap" -> (q34g_twap _),
    "q34h_ohlc" -> (q34h_ohlc _),
    "q35c_seasonal_anomaly" -> (q35c_seasonal_anomaly _),
    "q35d_mad" -> (q35d_mad _),
    "q29f_markov" -> (q29f_markov _),
    "q29g_seq" -> (q29g_seq _),
    "q30b_ltv" -> (q30b_ltv _),
    "q29e_convert_time" -> (q29e_convert_time _),
    "q29_funnel" -> (q29_funnel _),
    "q29d_paths" -> (q29d_paths _),
    "q34d_seasonal" -> (q34d_seasonal _),
    "q29c_attribution" -> (q29c_attribution _),
    "q29b_transitions" -> (q29b_transitions _),
    "q30_retention" -> (q30_retention _),
    "q34_gapfill" -> (q34_gapfill _),
    "q34b_interpolate" -> (q34b_interpolate _),
    "q34c_ewma" -> (q34c_ewma _),
    "q35_anomaly" -> (q35_anomaly _),
    "q35b_cusum" -> (q35b_cusum _),
    "q38_overlap" -> (q38_overlap _),
    "q38b_interval_union" -> (q38b_interval_union _),
    "q40_sessionize" -> (q40_sessionize _))

  def oracles: Map[String, String] = Map(
    "q34e_acf" -> q34eSql,
    "q34f_holt" -> q34fSql,
    "q34g_twap" -> q34gSql,
    "q34h_ohlc" -> q34hSql,
    "q35c_seasonal_anomaly" -> q35cSql,
    "q35d_mad" -> q35dSql,
    "q29f_markov" -> q29fSql,
    "q29g_seq" -> q29gSql,
    "q30b_ltv" -> q30bSql,
    "q29e_convert_time" -> q29eSql,
    "q29_funnel" -> q29Sql,
    "q29d_paths" -> q29dSql,
    "q34d_seasonal" -> q34dSql,
    "q29c_attribution" -> q29cSql,
    "q29b_transitions" -> q29bSql,
    "q30_retention" -> q30Sql,
    "q34_gapfill" -> q34Sql,
    "q34b_interpolate" -> q34bSql,
    "q34c_ewma" -> q34cSql,
    "q35_anomaly" -> q35Sql,
    "q35b_cusum" -> q35bSql,
    "q38_overlap" -> q38Sql,
    "q38b_interval_union" -> q38bSql,
    "q40_sessionize" -> q40Sql)
}
