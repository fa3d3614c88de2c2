package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.queries.FunnelOps

case class AttrEv(event_id: Long, ts: Timestamp, user_id: Long,
    event_type: String, value: Double)

/** S12 live attribution: state semantics + equivalence with the
  * oracle-checked batch q29c on the real test corpus. */
class AttributionStreamSpec extends SparkSpec {
  import spark.implicits._

  private def tsOf(us: Long): Timestamp = {
    val t = new Timestamp(us / 1000000L * 1000L)
    t.setNanos(((us % 1000000L) * 1000L).toInt)
    t
  }

  private def runStream(batches: Seq[Seq[AttrEv]])
      : Seq[(Long, Long, String, Double)] = {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[AttrEv]
    val name = s"attr_${System.nanoTime()}"
    val q = AttributionStream.attributed(mem.toDF())
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
    } finally q.stop()
    spark.table(name)
      .select("user_id", "ts_us", "channel", "value")
      .as[(Long, Long, String, Double)].collect().toSeq
  }

  test("purchases attribute to the carried touch across batches; no " +
      "prior touch is 'direct'; later touches never leak back") {
    val got = runStream(Seq(
      // batch 1: view (touch), then purchase in a LATER batch
      Seq(AttrEv(1, tsOf(1000000L), 1L, "view", 0.0),
        AttrEv(2, tsOf(2000000L), 2L, "purchase", 7.0)), // direct
      Seq(AttrEv(3, tsOf(3000000L), 1L, "purchase", 10.0)), // view
      // click then purchase inside one batch, out of order — in-batch
      // (ts, event_id) sort fixes it
      Seq(AttrEv(5, tsOf(6000000L), 3L, "purchase", 5.0),
        AttrEv(4, tsOf(5000000L), 3L, "click", 0.0)))) // click
    assert(got.toSet == Set(
      (2L, 2000000L, "direct", 7.0),
      (1L, 3000000L, "view", 10.0),
      (3L, 6000000L, "click", 5.0)))
  }

  test("streaming attribution over the real corpus == batch q29c " +
      "channel totals, fed in order across 4 microbatches") {
    val evs = graft.Tables.events(spark, sfDir)
      .select($"event_id", $"ts_us", $"user_id", $"event_type", $"value")
      .as[(Long, Long, Long, String, Double)].collect()
      .sortBy(e => (e._2, e._1))
      .map(e => AttrEv(e._1, tsOf(e._2), e._3, e._4, e._5))
    val batches = evs.grouped((evs.length / 4).max(1)).map(_.toSeq).toSeq
    val streamed = runStream(batches)
      .groupBy(_._3)
      .map { case (ch, rows) =>
        // exact money: sum in cents like the batch DECIMAL(18,2) path
        ch -> (rows.size.toLong,
          rows.map(r => math.round(r._4 * 100)).sum) }
    val batch = FunnelOps.q29c_attribution(spark, sfDir)
      .select(col("channel"), col("n_purchases"),
        (col("revenue") * 100).cast("long").as("cents"))
      .as[(String, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(streamed.keySet == batch.keySet)
    streamed.foreach { case (ch, (n, cents)) =>
      assert(batch(ch)._1 == n, s"$ch purchase count")
      assert(batch(ch)._2 == cents, s"$ch revenue cents")
    }
  }
}
