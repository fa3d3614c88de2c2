package graft.subscribe

/** Subscription configuration — the reference's per-backend config surface
  * (README.md:100-160, validation src/lapidus.js:51-86, cascade semantics
  * src/postgresql.js:132-170).
  */

/** Per-kind emit switches with the reference's cascade rule: a kind
  * follows the master `emitEvents` unless explicitly customized
  * (postgresql.js:153-170 — "don't overwrite customized child").
  */
case class EmitFlags(
    emitEvents: Boolean = true,
    emitInsert: Option[Boolean] = None,
    emitUpdate: Option[Boolean] = None,
    emitDelete: Option[Boolean] = None,
    emitSchema: Option[Boolean] = None,
    emitBeginTransaction: Option[Boolean] = None,
    emitCommitTransaction: Option[Boolean] = None,
    emitTransaction: Option[Boolean] = None,
    emitEvent: Option[Boolean] = None) {

  def insert: Boolean = emitInsert.getOrElse(emitEvents)
  def update: Boolean = emitUpdate.getOrElse(emitEvents)
  def delete: Boolean = emitDelete.getOrElse(emitEvents)
  def schema: Boolean = emitSchema.getOrElse(emitEvents)
  def beginTransaction: Boolean = emitBeginTransaction.getOrElse(emitEvents)
  def commitTransaction: Boolean = emitCommitTransaction.getOrElse(emitEvents)
  def transaction: Boolean = emitTransaction.getOrElse(emitEvents)
  def event: Boolean = emitEvent.getOrElse(emitEvents)

  /** Kinds currently enabled (for building the stream filter). */
  def enabledKinds: Seq[String] = Seq(
    "insert" -> insert, "update" -> update, "delete" -> delete,
    "schema" -> schema, "beginTransaction" -> beginTransaction,
    "commitTransaction" -> commitTransaction,
    "transaction" -> transaction).collect { case (k, true) => k }
}

/** One sink ("plugin") attachment. */
case class SinkConfig(kind: String, options: Map[String, String] = Map.empty)

/** One backend (source) — capture itself stays external (Debezium /
  * pg_recvlogical writing LDJSON or Kafka); Spark consumes the stream.
  */
case class BackendConfig(
    name: String,
    kind: String, // "file-ldjson" | "kafka"
    options: Map[String, String] = Map.empty,
    excludeTables: Seq[String] = Nil,
    emit: EmitFlags = EmitFlags(),
    sinks: Seq[SinkConfig] = Seq(SinkConfig("console")))

case class EngineConfig(backends: Seq[BackendConfig])

object ConfigValidation {
  // exactly the kinds CdcStream.forBackend can build — a kind that passes
  // `-t` validation must not crash at daemon start
  val supportedBackends: Set[String] =
    Set("file-ldjson", "kafka", "file-binlog-json", "file-oplog-json")
  val supportedSinks: Set[String] =
    Set("console", "collect", "subject-routing", "parquet")

  /** Aggregate-errors validation in the spirit of lapidus.js:51-86:
    * at least one backend; every backend kind must have a worker; every
    * sink kind must resolve in the registry. */
  def validate(cfg: EngineConfig): Seq[String] = {
    val errs = Seq.newBuilder[String]
    if (cfg.backends.isEmpty)
      errs += "Lapidus requires at least one backend to run"
    cfg.backends.foreach { b =>
      if (b.name.isEmpty) errs += "backend missing name"
      if (!supportedBackends.contains(b.kind))
        errs += s"${b.name}: invalid backend type: ${b.kind}"
      b.sinks.foreach { s =>
        if (!supportedSinks.contains(s.kind))
          errs += s"${b.name}: invalid plugin: ${s.kind}"
      }
      if (b.kind.startsWith("file-") && !b.options.contains("path"))
        errs += s"${b.name}: ${b.kind} backend requires options.path"
    }
    errs.result()
  }
}
