package graft.queries

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** q40 batch sessionization — the gap-rule edges the oracle formula
  * can't isolate (it computes the same expression), pinned on planted
  * timelines, plus the one-sort plan shape. */
class SessionizeSpec extends SparkSpec {
  import spark.implicits._

  private val Gap = 30L * 60 * 1000 * 1000 // the default 30 min, in µs

  private def planted(rows: Seq[(Long, Long, Long, Double)]) =
    rows.toDF("user_id", "event_id", "ts_us", "value")

  test("a gap of exactly the threshold stays in-session; one past it " +
      "opens a new session (strict >)") {
    val out = FunnelOps.sessionize(planted(Seq(
        (1L, 1L, 0L, 1.0),
        (1L, 2L, Gap, 1.0), // exactly 30 min later — same session
        (1L, 3L, Gap + Gap + 1, 1.0)))) // 30 min + 1 µs — new session
      .orderBy("session_id").collect()
    assert(out.map(r => (r.getLong(1), r.getLong(4))).toSeq ==
      Seq((0L, 2L), (1L, 1L)))
  }

  test("sessions are per-user: simultaneous events of different users " +
      "never merge, and ids restart at 0 for each user") {
    val out = FunnelOps.sessionize(planted(Seq(
        (1L, 1L, 0L, 1.0), (2L, 2L, 0L, 2.0),
        (1L, 3L, Gap * 3, 1.0), (2L, 4L, 1000L, 2.0))))
      .orderBy("user_id", "session_id").collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1), r.getLong(4)))
      .toSeq == Seq((1L, 0L, 1L), (1L, 1L, 1L), (2L, 0L, 2L)))
  }

  test("equal timestamps tie-break on event_id — the session id " +
      "assignment is deterministic under any input order") {
    val rows = Seq((1L, 5L, 100L, 1.0), (1L, 4L, 100L, 1.0),
      (1L, 6L, 100L + Gap + 1, 1.0))
    val a = FunnelOps.sessionize(planted(rows))
      .orderBy("session_id").collect()
    val b = FunnelOps.sessionize(planted(rows.reverse))
      .orderBy("session_id").collect()
    assert(a.sameElements(b))
    assert(a.map(_.getLong(4)).toSeq == Seq(2L, 1L))
  }

  test("q40 over the fixture: session bounds nest inside [start,end], " +
      "revenue is non-negative, and the plan has ONE sort (both window " +
      "passes share it) and no unpartitioned window") {
    val df = FunnelOps.q40_sessionize(spark, sfDir)
    val rows = df.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.getLong(2) <= r.getLong(3)))
    assert(rows.forall(r => r.getLong(4) >= 1L))
    // post-collect, AQE's toString appends the pre-execution "Initial
    // Plan" copy — count operators in the final plan only
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    // lag + running sum share partitionBy(user)+orderBy(ts,event): both
    // window passes ride ONE user_id exchange and one in-partition sort
    // (the only other exchange is the output ORDER BY's range partition)
    assert("Exchange hashpartitioning".r.findAllIn(plan).size == 1,
      s"expected one user_id shuffle, got:\n$plan")
    assert("\\bSort \\[".r.findAllIn(plan).size <= 2,
      s"expected one window sort + the output sort, got:\n$plan")
  }
}
