package graft.cli

import org.apache.spark.sql.SparkSession
import org.json4s._
import org.json4s.jackson.JsonMethods

import graft.SparkEntry
import graft.sinks.SinkRegistry
import graft.streaming.CdcStream
import graft.subscribe._

/** Daemon entry point mirroring the reference CLI (index.js:5-53):
  * `-c config.json` starts one streaming query per configured backend;
  * `-t` parses + validates the config and exits.
  *
  * Config JSON shape (source × wire preferred; legacy fused "kind"
  * still accepted):
  * {"backends": [{"name": "pg1", "source": "file", "wire": "jsoncdc",
  *   "options": {"path": "/data/cdc"}, "excludeTables": ["audit"],
  *   "emit": {"emitEvents": true, "emitSchema": false},
  *   "sinks": [{"kind": "console"}]}]}
  */
object Main {

  def parseConfig(json: String): EngineConfig = {
    implicit val fmts: Formats = DefaultFormats
    // malformed JSON throws a /Parse/-matching message, not a raw
    // Jackson stack (reference: config.test.js:8-12 asserts this)
    val ast =
      try JsonMethods.parse(json)
      catch { case e: Exception => throw new IllegalArgumentException(
        s"Parse error in config JSON: ${e.getMessage}") }
    val backends = (ast \ "backends") match {
      case JArray(items) => items.map { b =>
        BackendConfig(
          name = (b \ "name").extractOrElse[String](""),
          kind = (b \ "kind").extractOrElse[String](""),
          options = (b \ "options").extractOrElse[Map[String, String]](Map()),
          excludeTables =
            (b \ "excludeTables").extractOrElse[Seq[String]](Nil),
          emit = (b \ "emit").extractOrElse[EmitFlags](EmitFlags()),
          sinks = (b \ "sinks") match {
            case JArray(ss) => ss.map(sc => SinkConfig(
              (sc \ "kind").extractOrElse[String](""),
              (sc \ "options").extractOrElse[Map[String, String]](Map()),
              (sc \ "kinds").extractOrElse[Seq[String]](Nil)))
            case _ => Seq(SinkConfig("console"))
          },
          source = (b \ "source").extractOrElse[String](""),
          wire = (b \ "wire").extractOrElse[String](""))
      }
      case _ => Nil
    }
    EngineConfig(backends)
  }

  /** `-q <name> <sfDir> [limit]` — run one named query from the
    * engine's inventory against a parquet table directory and print
    * the head of the result: the ad-hoc face of the library (the
    * daemon covers streaming). `-q list` prints the inventory. */
  private def runQuery(args: Array[String]): Unit = {
    val builder = SparkSession.builder().appName("graft-query")
    if (!sys.props.contains("spark.master") &&
        !sys.env.contains("SPARK_MASTER"))
      builder.master("local[*]")
    SparkEntry.requiredConfs.foreach { case (k, v) => builder.config(k, v) }
    args.toSeq match {
      case Seq("list") =>
        SparkEntry.queries.keys.toSeq.sorted.foreach(println)
      case Seq(name, sfDir, rest @ _*) =>
        val fn = SparkEntry.queries.getOrElse(name, {
          System.err.println(
            s"unknown query '$name' — `-q list` prints the inventory")
          sys.exit(1)
        })
        val limit = rest.headOption.map(_.toInt).getOrElse(20)
        val spark = builder.getOrCreate()
        spark.sparkContext.setLogLevel("WARN")
        fn(spark, sfDir).show(limit, truncate = false)
        spark.stop()
      case _ =>
        System.err.println(
          "usage: graft.cli.Main -q <name|list> <sfDir> [limit]")
        sys.exit(1)
    }
  }

  def main(args: Array[String]): Unit = {
    val qIdx = args.indexOf("-q")
    if (qIdx >= 0) { runQuery(args.drop(qIdx + 1)); return }
    val cfgPath = args.sliding(2).collectFirst {
      case Array("-c", p) => p }.getOrElse {
      System.err.println(
        "usage: graft.cli.Main -c config.json [-t] | -q <name|list> <sfDir>")
      sys.exit(1)
    }
    val validateOnly = args.contains("-t")
    val cfg = parseConfig(
      new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(cfgPath))))
    val errors = ConfigValidation.validate(cfg)
    if (errors.nonEmpty) {
      errors.foreach(e => System.err.println(s"config error: $e"))
      sys.exit(1)
    }
    if (validateOnly) {
      println(s"config OK: ${cfg.backends.size} backend(s)")
      return
    }
    val builder = SparkSession.builder().appName("graft-cdc")
    // standalone launch (no spark-submit): default to local mode; under
    // spark-submit the master comes from the submit args / conf.
    if (!sys.props.contains("spark.master") &&
        !sys.env.contains("SPARK_MASTER"))
      builder.master("local[*]")
    SparkEntry.requiredConfs.foreach { case (k, v) => builder.config(k, v) }
    // RocksDB-backed keyed state (SURVEY §7 risk register): tx/schema
    // state spills off-heap instead of living in executor JVM memory
    builder.config("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val spark = builder.getOrCreate()
    // O5/O23 — progress/failure observability for every query
    spark.streams.addListener(new graft.streaming.GraftQueryListener())
    // one streaming query per backend (reference: worker per backend)
    val queries = cfg.backends.map { b =>
      val env = CdcStream.forBackend(spark, b)
      val sinks = b.sinks.map(SinkRegistry.create)
      SinkRegistry.attach(env, b.emit, sinks)
        .option("checkpointLocation",
          b.options.getOrElse("checkpoint", s"/tmp/graft-ckpt-${b.name}"))
        .start()
    }
    queries.foreach(_.awaitTermination())
  }
}
