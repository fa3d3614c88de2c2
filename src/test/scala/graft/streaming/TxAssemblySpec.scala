package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.cdc.{CdcEvent, TxEvent}

/** Transaction assembly semantics mirrored from the reference's
  * multi-statement transaction test
  * (/root/reference/test/postgresql.test.js:365-434): a 3-statement tx
  * emits ONE transaction event whose items arrive in statement order
  * insert → update → delete with matching pks.
  */
class TxAssemblySpec extends SparkSpec {
  import spark.implicits._

  private def lines(backend: String, rows: Seq[(Long, String)]) =
    rows.toDF("seq", "line").withColumn("backend", lit(backend))

  private val txFixture = Seq(
    (0L, """{"begin": 55}"""),
    (1L, """{"insert": {"id": 3, "v": "a"}, "table": "t"}"""),
    (2L, """{"update": {"id": 3, "v": "b"}, "table": "t"}"""),
    (3L, """{"delete": true, "@": {"id": 3}, "table": "t"}"""),
    (4L, """{"commit": 55, "t": "2016-04-29 15:31:16.129"}"""))

  test("batch: one tx event, items in statement order with pks") {
    val events = TxAssembly.decodeToEvents(lines("pg1", txFixture))
    val txs = TxAssembly.assemble(events).collect()
    assert(txs.length == 1)
    val tx = txs.head
    assert(tx.txId == 55L)
    assert(tx.commitTs.isDefined)
    assert(tx.items.map(_.kind) == Seq("insert", "update", "delete"))
    assert(tx.items.map(_.pk).forall(_ == "3"))
  }

  test("commit id mismatch drops the transaction (reference asserts)") {
    val bad = Seq(
      (0L, """{"begin": 60}"""),
      (1L, """{"insert": {"id": 1}, "table": "t"}"""),
      (2L, """{"commit": 61, "t": "2016-04-29 15:31:16.129"}"""))
    val txs = TxAssembly.assemble(
      TxAssembly.decodeToEvents(lines("pg1", bad))).collect()
    assert(txs.isEmpty)
  }

  test("streaming: tx split across microbatches survives via state") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, Long, String)]
    val events = TxAssembly.decodeToEvents(
      mem.toDF().toDF("backend", "seq", "line"))
    val out = TxAssembly.assemble(events)
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft-tx-ckpt").toString
    val query = out.writeStream.format("memory").queryName("txout")
      .option("checkpointLocation", ckpt).outputMode("append").start()
    try {
      // batch 1: begin + first two statements — no emission yet
      mem.addData(txFixture.take(3).map { case (s, l) => ("pg1", s, l) }: _*)
      query.processAllAvailable()
      assert(spark.table("txout").count() == 0)
      // batch 2: delete + commit — tx completes
      mem.addData(txFixture.drop(3).map { case (s, l) => ("pg1", s, l) }: _*)
      query.processAllAvailable()
      val rows = spark.table("txout").as[TxEvent].collect()
      assert(rows.length == 1)
      assert(rows.head.items.map(_.kind) == Seq("insert", "update", "delete"))
    } finally query.stop()
  }

  test("two backends assemble independently and in parallel") {
    val both = lines("pg1", txFixture).unionAll(
      lines("mysql1", txFixture.map { case (s, l) =>
        (s, l.replace("55", "77")) }))
    val txs = TxAssembly.assemble(TxAssembly.decodeToEvents(both))
      .collect().sortBy(_.backend)
    assert(txs.map(t => (t.backend, t.txId)).toSeq ==
      Seq(("mysql1", 77L), ("pg1", 55L)))
  }
}
