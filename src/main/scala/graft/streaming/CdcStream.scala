package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.subscribe.BackendConfig

/** Source builders: raw CDC line streams → canonical envelope streams.
  *
  * Capture is external (SURVEY.md §0 — pg_recvlogical / Debezium / oplog
  * tailers write LDJSON files or Kafka topics); Spark consumes an ordered
  * (backend, seq, line) stream. For Kafka, backend=topic and seq=offset;
  * for file replay the capture layer stamps seq. One streaming query per
  * backend mirrors the reference's worker-per-backend process model
  * (lapidus.js:88-109) inside a single SparkSession.
  */
object CdcStream {

  /** Capture-layer line contract. */
  val lineSchema: StructType = StructType(Seq(
    StructField("backend", StringType),
    StructField("seq", LongType),
    StructField("line", StringType)))

  /** File-based LDJSON capture directory → raw line stream. */
  def fileLines(spark: SparkSession, path: String): DataFrame =
    spark.readStream.schema(lineSchema).json(path)

  /** Build the full pipeline for one configured backend: source → decode
    * + table filters → the one stateful dispatch op (schema attach, tx-id
    * carry, and — when `emitTransaction` is on — assembled `transaction`
    * rows, CdcPipeline). The caller attaches sinks (SinkRegistry.attach)
    * and starts the query. */
  def forBackend(spark: SparkSession, cfg: BackendConfig): DataFrame = {
    val lines = cfg.kind match {
      case "file-ldjson" => fileLines(spark, cfg.options("path"))
      case "kafka" =>
        // shape Kafka records into the line contract (topic/offset/value)
        spark.readStream.format("kafka")
          .options(cfg.options)
          .load()
          .select(col("topic").as("backend"), col("offset").as("seq"),
            col("value").cast("string").as("line"))
      case other =>
        throw new IllegalArgumentException(s"invalid backend type: $other")
    }
    val events = TxAssembly.decodeToEvents(lines, cfg.excludeTables)
    CdcPipeline.run(events, cfg.emit.transaction,
      cfg.options.get("txTimeoutMs").map(_.toLong))
  }
}
