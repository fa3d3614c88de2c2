package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.cdc.{CdcEvent, EnvelopeEvent, PipeState, TxItem, TxState}

/** The full per-backend dispatch pipeline as ONE stateful operator:
  * schema-cache attach (O13, reference postgresql.js:430-436 — the latest
  * `schema` line per table is stamped onto every subsequent DML envelope),
  * transaction-id carry, and transaction assembly (postgresql.js:18-33,
  * 447-484), emitted in the reference's dispatch order — the assembled
  * `transaction` event fires BEFORE the commit event that closed it
  * (postgresql.js:487-501).
  *
  * Scale: a CDC stream is serial per backend (the reference runs one
  * single-threaded worker per backend), so keying by backend preserves
  * total order while backends process in parallel — and folding all three
  * concerns into one `flatMapGroupsWithState` means the stream shuffles
  * ONCE and keeps one checkpoint-backed state store, instead of one
  * shuffle + store per concern.
  */
object CdcPipeline {

  def processGroup(emitTransaction: Boolean, txTimeoutMs: Option[Long])(
      backend: String,
      rows: Iterator[CdcEvent],
      state: GroupState[PipeState]): Iterator[EnvelopeEvent] = {
    // State bounding (SURVEY §7 risk register — the reference's unbounded
    // in-memory buffer, postgresql.js:14-17, is the cautionary tale): a
    // transaction whose commit never arrives is dropped after the
    // configured quiet period; the schema cache survives (schemas are
    // long-lived by design).
    if (state.hasTimedOut) {
      val st = state.get
      if (st.schemas.nonEmpty) state.update(PipeState(TxState(None, Nil), st.schemas))
      else state.remove()
      return Iterator.empty
    }
    // Materialize-and-sort is bounded by the MICROBATCH, not the stream:
    // one group = one backend's slice of one trigger, whose size the
    // source caps (CdcStream.forBackend sets maxFilesPerTrigger on the
    // file transport; Kafka callers pass maxOffsetsPerTrigger). Without
    // a trigger cap a backlogged first batch could be the whole backlog.
    val sorted = rows.toArray
    java.util.Arrays.sort(sorted,
      java.util.Comparator.comparingLong[CdcEvent](_.seq))
    var st = state.getOption.getOrElse(PipeState(TxState(None, Nil), Map.empty))
    val out = Seq.newBuilder[EnvelopeEvent]
    def env(e: CdcEvent, schema: String, txId: Option[Long]) =
      EnvelopeEvent(backend, e.seq, e.kind, e.table, e.pk, e.item,
        e.oldImage, schema, e.beginId, e.commitId, e.commitTs, txId, null)
    sorted.foreach { e =>
      e.kind match {
        case "schema" =>
          st = st.copy(schemas = st.schemas + (e.table -> e.schemaJson))
          out += env(e, e.schemaJson, st.tx.currentTxId)
        case "beginTransaction" =>
          st = st.copy(tx = TxState(e.beginId, Nil))
          out += env(e, null, e.beginId)
        case "commitTransaction" =>
          // reference asserts commit id == current tx id (postgresql.js:463)
          if (emitTransaction && st.tx.currentTxId.isDefined &&
              e.commitId == st.tx.currentTxId)
            out += EnvelopeEvent(backend, e.seq, "transaction", null, null,
              null, null, null, None, e.commitId, e.commitTs,
              st.tx.currentTxId, st.tx.buffered.reverse) // stored newest-first
          out += env(e, null, st.tx.currentTxId)
          st = st.copy(tx = TxState(None, Nil))
        case "insert" | "update" | "delete" =>
          if (emitTransaction && st.tx.currentTxId.isDefined)
            st = st.copy(tx = st.tx.copy(buffered =
              TxItem(e.seq, e.kind, e.table, e.pk, e.item) +: st.tx.buffered))
          out += env(e, st.schemas.get(e.table).orNull, st.tx.currentTxId)
        case _ => // unknown line shape: no dispatch, no state effect
      }
    }
    if (st.tx.currentTxId.isDefined || st.schemas.nonEmpty) {
      state.update(st)
      txTimeoutMs.foreach(state.setTimeoutDuration)
    } else state.remove()
    out.result().iterator
  }

  /** Streaming (or batch) events → dispatched envelope frame. Transaction
    * rows serialize their items as the reference's `{items, id, ts}` JSON
    * in `item`; all other rows pass `item` through untouched.
    * `txTimeoutMs` bounds open-transaction state (processing-time quiet
    * period); None keeps state until commit, matching the reference. */
  def run(events: Dataset[CdcEvent], emitTransaction: Boolean,
      txTimeoutMs: Option[Long] = None): DataFrame = {
    implicit val outEnc = Encoders.product[EnvelopeEvent]
    implicit val stEnc = Encoders.product[PipeState]
    val timeout =
      if (txTimeoutMs.isDefined) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    events.groupByKey(_.backend)(Encoders.STRING)
      .flatMapGroupsWithState(OutputMode.Append(),
        timeout)(processGroup(emitTransaction, txTimeoutMs))
      .toDF()
      .select(
        col("backend"), col("seq"), col("kind"), col("table"), col("pk"),
        when(col("kind") === "transaction", to_json(struct(
          col("txId").as("id"), col("commitTs").as("ts"),
          col("txItems").as("items"))))
          .otherwise(col("item")).as("item"),
        col("oldImage").as("old_image"), col("schema"),
        col("beginId").as("begin_id"), col("commitId").as("commit_id"),
        col("commitTs").as("commit_ts"), col("txId").as("tx_id"))
  }
}
