package graft.cdc

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Backfill → streaming handoff: for ANY split point S,
  * advance(snapshot(lines <= S), decode(lines > S)) must equal
  * snapshot(all lines) — the property that makes it safe to bootstrap a
  * warehouse table from a replay and then attach the live stream. */
class CdcBootstrapSpec extends SparkSpec {
  import spark.implicits._

  // multi-table, multi-version history with deletes and re-inserts
  private val lines: Seq[(Long, String)] = {
    val rnd = new scala.util.Random(7L)
    (0 until 400).flatMap { i =>
      val table = s"t${i % 3}"
      val id = i % 40
      val v = s"v$i"
      val kind = rnd.nextInt(10)
      val line =
        if (kind < 5)
          s"""{"insert": {"id": $id, "val": "$v"}, "table": "$table"}"""
        else if (kind < 8)
          s"""{"update": {"id": $id, "val": "$v"}, "table": "$table"}"""
        else
          s"""{"delete": true, "@": {"id": $id}, "table": "$table"}"""
      Seq((i.toLong, line))
    }
  }

  private def feed(ls: Seq[(Long, String)]) =
    SnapshotApply.normalize(JsonCdc.decode(ls.toDF("seq", "line")))

  private def collectSnap(df: org.apache.spark.sql.DataFrame) =
    df.select("table", "pk", "item", "as_of_seq")
      .as[(String, String, String, Long)].collect().toSet

  test("snapshot(all) == advance(snapshot(prefix), suffix) at any split") {
    val full = collectSnap(SnapshotApply.snapshot(feed(lines)))
    assert(full.nonEmpty)
    for (split <- Seq(0L, 17L, 133L, 257L, 399L)) {
      val snap = SnapshotApply.snapshot(feed(lines.filter(_._1 <= split)))
      val advanced = SnapshotApply.advance(
        snap, feed(lines.filter(_._1 > split)))
      assert(collectSnap(advanced) == full, s"handoff broke at split=$split")
    }
  }

  test("replayed prefix rows are harmless (at-least-once overlap)") {
    val full = collectSnap(SnapshotApply.snapshot(feed(lines)))
    val snap = SnapshotApply.snapshot(feed(lines.filter(_._1 <= 200)))
    // the resumed stream re-delivers an overlapping window [150, 400)
    val advanced = SnapshotApply.advance(
      snap, feed(lines.filter(_._1 > 150)))
    assert(collectSnap(advanced) == full)
  }

  test("a deleted key disappears and a later re-insert resurrects it") {
    val story = Seq(
      (0L, """{"insert": {"id": 1, "val": "a"}, "table": "t"}"""),
      (1L, """{"delete": true, "@": {"id": 1}, "table": "t"}"""),
      (2L, """{"insert": {"id": 2, "val": "b"}, "table": "t"}"""))
    val s1 = collectSnap(SnapshotApply.snapshot(feed(story)))
    assert(s1.map(r => r._2) == Set("2"))
    val resurrect = story :+
      ((3L, """{"insert": {"id": 1, "val": "c"}, "table": "t"}"""))
    val s2 = SnapshotApply.snapshot(feed(resurrect))
    val row1 = s2.filter($"pk" === "1").select("item").as[String].head()
    assert(row1.contains("\"c\""))
  }
}
