package graft

import org.apache.spark.sql.SparkSession

/** Isolated streaming-throughput measurement — the quiet-host
  * protocol's tool for the CDC dispatch rate, so the per-round
  * `streaming_events_per_sec` band can be measured WITHOUT a 30-min
  * bench sweep in front of it (the r14 attribution found the metric
  * carries ±20–30% session-level variance on unchanged pipeline code:
  * 21.6k–28.6k ev/s across four clean sessions of r12–r14 — a
  * standalone probe turns that claim into a measurable band).
  *
  *   tools/run_main.sh graft.StreamProbe [attempts]
  *
  * Runs [[graft.streaming.ThroughputProbe]] `attempts` times (default
  * 5) in one fresh JVM/session — each attempt self-warming, latency
  * phase only on the LAST attempt, exactly the Bench measurement
  * shape — and prints one JSON line per attempt plus a summary line
  * with min/median/max, so the session's own spread is visible beside
  * the point readings a bench artifact would record. */
object StreamProbe {
  def main(args: Array[String]): Unit = {
    val attempts = args.headOption.map(_.toInt).getOrElse(5)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.min(32, Runtime.getRuntime.availableProcessors).toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def f1(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.1f", Double.box(v))
    val rates = (0 until attempts).map { i =>
      val r = graft.streaming.ThroughputProbe.run(spark,
        measureLatency = i == attempts - 1)
      println(s"""{"attempt":${i + 1},"events_per_sec":${
        f1(r.eventsPerSec)},"events":${r.events},"secs":${
        f1(r.secs * 1000)},"latency_p50_ms":${f1(r.latencyP50Ms)},""" +
        s""""latency_p99_ms":${f1(r.latencyP99Ms)}}""")
      r.eventsPerSec
    }.sorted
    println(s"""{"metric":"stream_probe","attempts":$attempts,""" +
      s""""min":${f1(rates.head)},"median":${
        f1(rates(rates.size / 2))},"max":${f1(rates.last)},""" +
      s""""cpus":$cpus}""")
    spark.stop()
  }
}
