package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Streaming-path analogue of the reference's operational numbers
  * (BASELINE.md: 1–3 ms per-event relay latency, single-threaded JS
  * worker ≈ 10³ events/s order of magnitude): replay a synthetic jsoncdc
  * stream through the FULL dispatch pipeline (decode → filters → schema
  * attach → tx assembly) and measure events/second over a microbatch.
  *
  * The assertion floor is deliberately conservative (10k ev/s on the 4-
  * thread test session) — the point is a regression tripwire plus a
  * measured figure printed for BASELINE bookkeeping, not a tight bench.
  */
class CdcThroughputSpec extends SparkSpec {
  import spark.implicits._

  test("full dispatch pipeline sustains >10k events/s on the test session") {
    implicit val sqlCtx = spark.sqlContext
    val nTx = 20000 // 3 lines per tx → 60k lines
    val lines = (0 until nTx).iterator.flatMap { i =>
      Iterator(
        ("pg1", i * 3L, s"""{"begin": $i}"""),
        ("pg1", i * 3L + 1,
          s"""{"insert": {"id": $i, "v": "x$i"}, "table": "t"}"""),
        ("pg1", i * 3L + 2,
          s"""{"commit": $i, "t": "2024-01-01 00:00:00"}"""))
    }.toSeq
    val mem = MemoryStream[(String, Long, String)]
    val out = CdcPipeline.run(
      TxAssembly.decodeToEvents(mem.toDF.toDF("backend", "seq", "line")),
      emitTransaction = true)
    val name = s"thr_${System.nanoTime()}"
    val q = out.writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      mem.addData(lines.take(3): _*) // warm the plan/codegen first
      q.processAllAvailable()
      val t0 = System.nanoTime()
      mem.addData(lines.drop(3): _*)
      q.processAllAvailable()
      val secs = (System.nanoTime() - t0) / 1e9
      val n = lines.size - 3
      val rate = n / secs
      info(f"pipeline throughput: $n%d events in $secs%.2fs = $rate%.0f ev/s")
      println(f"[throughput] cdc dispatch pipeline: $rate%.0f events/s " +
        f"($n%d events, $secs%.2fs, local[4] test session)")
      assert(rate > 10000, f"$rate%.0f ev/s below the 10k floor")
      // sanity: every tx assembled
      val txCount = spark.table(name)
        .filter(col("kind") === "transaction").count()
      assert(txCount == nTx)
    } finally q.stop()
  }
}
