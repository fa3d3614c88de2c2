package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.SparkSpec

/** O5 (stderr classifier) + O23 (health ping) — classifier table mirrored
  * from the reference's stdErrorToEvent (postgresql.js:192-229).
  */
class MonitorSpec extends SparkSpec {

  test("classifier maps pg_recvlogical diagnostics by prefix") {
    def kindOf(s: String) = StreamDiagnostics.classify(s).map(_._1)
    assert(kindOf("could not connect to server") == Some("error"))
    assert(kindOf("unrecognized option") == Some("error"))
    assert(kindOf("unexpected termination") == Some("error"))
    assert(kindOf("select() failed") == Some("error"))
    assert(kindOf("connected to server") == Some("status"))
    assert(kindOf("starting log streaming") == Some("status"))
    assert(kindOf("disconnected; waiting to retry") == Some("disconnected"))
    assert(kindOf("streaming initiated") == Some("status"))
    assert(kindOf("streaming header too small") == Some("error"))
    assert(kindOf("server log noise falls through") == None)
    assert(kindOf("") == None)
  }

  test("listener records per-query progress and termination health") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val logs = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val listener = new GraftQueryListener(s => { logs.add(s); () })
    spark.streams.addListener(listener)
    val name = s"mon_${System.nanoTime()}"
    try {
      val mem = MemoryStream[Long]
      val q = mem.toDF.writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      mem.addData(1L, 2L, 3L)
      q.processAllAvailable()
      q.stop()
      // listener events are delivered asynchronously
      val deadline = System.currentTimeMillis() + 15000
      def snap() = listener.health.find(_.name == name)
      while (System.currentTimeMillis() < deadline &&
          !snap().exists(h => h.rows >= 3 && !h.connected))
        Thread.sleep(100)
      val h = snap().get
      assert(h.batches >= 1)
      assert(h.rows >= 3)
      assert(!h.connected, "terminated query must report disconnected")
      assert(logs.stream().anyMatch(_.contains("rows=")))
    } finally spark.streams.removeListener(listener)
  }
}
