package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.SparkSpec

case class Ev(ts: Timestamp, event_type: String, user_id: Long,
    event_id: Long, value: Double)

/** Structured Streaming semantics for S01–S06: MemoryStream-driven,
  * asserting streaming output matches the batch computation and that
  * watermarks drop late data / bound dedup state.
  */
class EventStreamsSpec extends SparkSpec {
  import spark.implicits._

  private def t(min: Int): Timestamp =
    new Timestamp(1700000000000L + min * 60000L)

  private def runStream(
      data: Seq[Seq[Ev]],
      build: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame,
      mode: String = "append"): org.apache.spark.sql.DataFrame = {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val name = s"es_${System.nanoTime()}"
    val q = build(mem.toDF()).writeStream.format("memory").queryName(name)
      .outputMode(mode).start()
    try {
      data.foreach { batch => mem.addData(batch: _*); q.processAllAvailable() }
    } finally q.stop()
    spark.table(name)
  }

  test("S01 streaming tumbling counts match batch on converged input") {
    val events = Seq(
      Ev(t(5), "click", 1, 1, 1.0), Ev(t(20), "click", 1, 2, 2.0),
      Ev(t(65), "click", 2, 3, 3.0), Ev(t(70), "error", 2, 4, 4.0),
      // advance watermark far enough to finalize all the above
      Ev(t(600), "click", 1, 5, 5.0))
    val res = runStream(Seq(events.take(2), events.slice(2, 4),
      Seq(events(4))), EventStreams.tumbling)
    val batch = EventStreams.tumbling(events.toDF())
      .collect().map(_.toSeq).toSet
    // append mode only emits finalized windows; the t(600) window is open
    val streamed = res.collect().map(_.toSeq).toSet
    val finalized = batch.filter(r =>
      r.head.asInstanceOf[Long] < 1700000000L + 600 * 60 - 3600)
    assert(finalized.subsetOf(streamed))
    assert(streamed.subsetOf(batch))
  }

  test("S03 session window merges events within the gap") {
    val events = Seq(
      Ev(t(0), "click", 1, 1, 1.0), Ev(t(10), "click", 1, 2, 1.0),
      Ev(t(29), "click", 1, 3, 1.0), // same session (gaps < 30m)
      Ev(t(90), "click", 1, 4, 1.0), // new session
      Ev(t(2000), "click", 9, 99, 1.0)) // watermark push
    val res = runStream(Seq(events), EventStreams.sessions)
    val sess = res.filter($"user_id" === 1).orderBy($"start_us")
      .as[(Long, Long, Long, Long)].collect()
    assert(sess.length == 2)
    assert(sess(0)._4 == 3, "first session holds 3 events")
    assert(sess(1)._4 == 1)
  }

  test("S04 watermark drops events >10m late") {
    val batches = Seq(
      Seq(Ev(t(120), "click", 1, 1, 1.0)), // watermark → t(110)
      Seq(Ev(t(30), "click", 1, 2, 1.0), // >10m late → dropped
        Ev(t(119), "click", 1, 3, 1.0)), // within watermark → kept
      Seq(Ev(t(1200), "click", 1, 4, 1.0))) // finalize
    val res = runStream(batches, EventStreams.lateDataCounts)
    val counts = res.as[(Long, Long)].collect().toMap
    // hour bucket of t(30) (=1700000000+1800s, bucket 472222h) must not
    // contain the late event; bucket of t(119)/t(120) has both kept rows
    val hour0 = (1700000000L + 30 * 60) / 3600 * 3600
    val hour2 = (1700000000L + 120 * 60) / 3600 * 3600
    assert(!counts.contains(hour0), "late event must be dropped")
    assert(counts(hour2) == 2)
  }

  test("S06 streaming dedup keeps first occurrence of event_id") {
    val batches = Seq(
      Seq(Ev(t(0), "click", 1, 42, 1.0)),
      Seq(Ev(t(1), "click", 1, 42, 9.0), // duplicate id → dropped
        Ev(t(2), "click", 1, 43, 2.0)))
    val res = runStream(batches, EventStreams.dedup)
    val vals = res.as[Ev].collect()
    assert(vals.map(_.event_id).sorted.toSeq == Seq(42L, 43L))
    assert(vals.find(_.event_id == 42).get.value == 1.0)
  }

  test("S07 stream-stream interval join attributes purchases to preceding " +
      "clicks and evicts out-of-window state") {
    val events = Seq(
      Ev(t(0), "click", 1, 10, 1.0),
      Ev(t(20), "click", 1, 11, 1.0),
      Ev(t(25), "purchase", 1, 20, 9.0), // joins clicks 10 (25m) and 11 (5m)
      Ev(t(40), "click", 2, 12, 1.0),
      Ev(t(95), "purchase", 2, 21, 9.0), // click 12 is 55m old -> no match
      Ev(t(31), "purchase", 1, 22, 9.0), // joins click 11 only (click 10 is 31m old)
      Ev(t(600), "click", 9, 99, 1.0)) // watermark push, finalizes joins
    val res = runStream(
      Seq(events.take(3), events.slice(3, 6), Seq(events(6))),
      EventStreams.purchaseAttribution)
    val got = res.select($"purchase_id", $"click_id", $"lag_us")
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set(
      (20L, 10L, 25L * 60000000), (20L, 11L, 5L * 60000000),
      (22L, 11L, 11L * 60000000)),
      s"unexpected attribution set: $got")
  }

  test("S09 left-outer interval join also emits unattributed purchases " +
      "(null click) once the watermark passes their horizon") {
    val events = Seq(
      Ev(t(0), "click", 1, 10, 1.0),
      Ev(t(20), "click", 1, 11, 1.0),
      Ev(t(25), "purchase", 1, 20, 9.0), // joins clicks 10 and 11
      Ev(t(40), "click", 2, 12, 1.0),
      Ev(t(95), "purchase", 2, 21, 9.0), // click 12 is 55m old -> MISS row
      Ev(t(31), "purchase", 1, 22, 9.0), // joins click 11 only
      // the GLOBAL watermark is min(purchase wm, click wm) — BOTH sides
      // need a sentinel or the null rows never free
      Ev(t(600), "click", 9, 99, 1.0),
      Ev(t(600), "purchase", 8, 97, 9.0), // distinct user: matches no
                                          // click; stays buffered (wm
                                          // never passes its horizon)
      Ev(t(700), "click", 9, 98, 1.0)) // one MORE batch: outer-join null
                                       // rows flush a batch after the
                                       // watermark that frees them
    val res = runStream(
      Seq(events.take(3), events.slice(3, 6), events.slice(6, 8),
        Seq(events(8))),
      EventStreams.purchaseAttributionOuter)
    val got = res.select($"purchase_id", $"click_id", $"lag_us")
      .as[(Long, Option[Long], Option[Long])].collect().toSet
    assert(got == Set(
      (20L, Some(10L), Some(25L * 60000000)),
      (20L, Some(11L), Some(5L * 60000000)),
      (22L, Some(11L), Some(11L * 60000000)),
      (21L, None, None)),
      s"unexpected outer attribution set: $got")
  }

  test("S09b full-outer interval join emits BOTH sides' misses: the " +
      "unattributed purchase and the click that attributed nothing") {
    val events = Seq(
      Ev(t(0), "click", 1, 10, 1.0),
      Ev(t(20), "click", 1, 11, 1.0),
      Ev(t(25), "purchase", 1, 20, 9.0), // joins clicks 10 and 11
      Ev(t(40), "click", 2, 12, 1.0),
      Ev(t(95), "purchase", 2, 21, 9.0), // click 12 is 55m old -> both miss
      Ev(t(31), "purchase", 1, 22, 9.0), // joins click 11 only
      // watermark pushers on BOTH sides, then one more batch pair so
      // the outer null rows (incl. the click-side miss) flush
      Ev(t(600), "click", 9, 99, 1.0),
      Ev(t(600), "purchase", 8, 97, 9.0),
      Ev(t(800), "click", 9, 96, 1.0),
      Ev(t(800), "purchase", 8, 95, 9.0))
    val res = runStream(
      Seq(events.take(3), events.slice(3, 6), events.slice(6, 8),
        events.slice(8, 10)),
      EventStreams.purchaseAttributionFull)
    val all: Set[(Option[Long], Option[Long])] =
      res.select($"purchase_id", $"click_id")
        .as[(Option[Long], Option[Long])].collect().toSet
    // restrict to the planted core — the sentinel users' own miss
    // rows depend on exactly where the final watermark lands
    val got = all.filter(pc =>
      pc._1.exists(_ <= 22L) || pc._2.exists(_ <= 12L))
    assert(got == Set(
      (Some(20L), Some(10L)), (Some(20L), Some(11L)),
      (Some(22L), Some(11L)),
      (Some(21L), None),  // purchase with no click in window
      (None, Some(12L))), // click that attributed nothing
      s"unexpected full-outer set: $got")
  }

  test("S11 complete-mode leaderboard: the final table is the all-time " +
      "top-k, identical to the batch ranking over everything seen") {
    val events = Seq(
      Ev(t(0), "view", 1, 1, 2.0), Ev(t(1), "view", 2, 2, 3.0),
      Ev(t(2), "click", 1, 3, 1.0), Ev(t(3), "view", 3, 4, 4.0),
      Ev(t(4), "purchase", 1, 5, 9.0), Ev(t(5), "click", 2, 6, 1.5),
      Ev(t(6), "view", 4, 7, 0.5), Ev(t(7), "error", 9, 8, 0.0))
    // complete mode REPLACES the sink table each batch — the final
    // table is the answer over all batches, not an append log
    val res = runStream(
      Seq(events.take(3), events.slice(3, 6), events.drop(6)),
      EventStreams.liveLeaderboard(_, 2), mode = "complete")
    val got = res.select($"event_type", $"n", $"revenue")
      .as[(String, Long, Double)].collect().toSeq.sortBy(_._1)
    assert(got == Seq(("click", 2L, 2.5), ("view", 4L, 9.5)),
      s"final leaderboard must rank over ALL batches: $got")
  }

  test("S08 stream-static enrichment decorates every event statelessly") {
    implicit val sqlCtx = spark.sqlContext
    val dim = Seq((1L, "Customer#1"), (2L, "Customer#2"))
      .toDF("c_custkey", "c_name")
    val events = Seq(
      Ev(t(0), "click", 1, 10, 1.0), Ev(t(1), "view", 2, 11, 1.0),
      Ev(t(2), "click", 7, 12, 1.0)) // no dim row -> dropped (inner join)
    val res = runStream(Seq(events),
      df => EventStreams.enrich(df, dim))
    val got = res.select($"event_id", $"c_name").as[(Long, String)]
      .collect().toSet
    assert(got == Set((10L, "Customer#1"), (11L, "Customer#2")))
  }
}
