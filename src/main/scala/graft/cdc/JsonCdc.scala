package graft.cdc

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Decoder for the jsoncdc wire format the reference consumes from
  * `pg_recvlogical` (reference: /root/reference/src/postgresql.js:373-548).
  *
  * Line shapes (one JSON object per line):
  *   {"begin": txId}
  *   {"schema": {col: type, ...}, "table": t}
  *   {"insert": {row}, "table": t}
  *   {"update": {row}, "table": t}
  *   {"delete": true, "@": {old row, nulls for non-pk}, "table": t}
  *   {"commit": txId, "t": "timestamp"}
  *
  * Everything here is pure Column logic (`get_json_object` — codegen'd),
  * so the same decoder runs over a batch replay file, a Kafka value
  * column, or a socket stream. The `item` payload stays raw JSON text:
  * schemas are dynamic/out-of-band in CDC (reference schema-cache,
  * postgresql.js:430-436), so per-table StructType application happens
  * lazily at query time — never at decode time.
  */
object JsonCdc {

  /** Event-kind classification — the reference's lineHandler dispatch
    * chain (postgresql.js:400-469), as a when-chain over which top-level
    * key is present. */
  def kindOf(line: Column): Column =
    when(get_json_object(line, "$.insert").isNotNull, "insert")
      .when(get_json_object(line, "$.update").isNotNull, "update")
      .when(get_json_object(line, "$.delete").isNotNull, "delete")
      .when(get_json_object(line, "$.schema").isNotNull, "schema")
      .when(get_json_object(line, "$.begin").isNotNull, "beginTransaction")
      .when(get_json_object(line, "$.commit").isNotNull, "commitTransaction")
      .otherwise("unknown")

  /** pk for insert/update: item.id || item.ID (postgresql.js:472). */
  def pkOfItem(item: Column): Column =
    coalesce(get_json_object(item, "$.id"), get_json_object(item, "$.ID"))

  /** pk for delete: value of the first key of the old-row image whose
    * value is non-null (postgresql.js:423-425). */
  def pkOfOldImage(old: Column): Column = {
    // dynamic JSON paths need call_function — the Scala get_json_object
    // helper only accepts literal paths
    def jsonAt(path: Column): Column =
      call_function("get_json_object", old, concat(lit("$."), path))
    val firstKey = element_at(
      filter(json_object_keys(old), k => jsonAt(k).isNotNull), 1)
    jsonAt(firstKey)
  }

  /** Decode a frame with a string column `line` into the canonical
    * envelope (SURVEY.md §1.1): kind, table, item (raw json), old_image,
    * begin_id / commit_id / commit_ts, pk. Extra input columns (seq,
    * offsets, ...) pass through. */
  def decode(df: DataFrame, lineCol: String = "line"): DataFrame = {
    val line = col(lineCol)
    df.withColumn("kind", kindOf(line))
      .withColumn("table", get_json_object(line, "$.table"))
      .withColumn("item",
        coalesce(get_json_object(line, "$.insert"),
          get_json_object(line, "$.update")))
      .withColumn("old_image", get_json_object(line, "$.@"))
      .withColumn("schema_json", get_json_object(line, "$.schema"))
      .withColumn("begin_id", get_json_object(line, "$.begin").cast("long"))
      .withColumn("commit_id",
        get_json_object(line, "$.commit").cast("long"))
      .withColumn("commit_ts",
        to_timestamp(get_json_object(line, "$.t")))
      .withColumn("pk",
        when(col("kind").isin("insert", "update"), pkOfItem(col("item")))
          .when(col("kind") === "delete", pkOfOldImage(col("old_image"))))
  }

  /** Table filters — the reference's two stream filters:
    * pg_temp noise (postgresql.js:386-391, hardcoded) and user
    * excludeTables (postgresql.js:393-397). Rows with no table
    * (begin/commit) always pass. */
  def filterTables(df: DataFrame, excludeTables: Seq[String]): DataFrame = {
    val base = df.filter(
      col("table").isNull || !col("table").startsWith("pg_temp_"))
    if (excludeTables.isEmpty) base
    else base.filter(
      col("table").isNull || !col("table").isin(excludeTables: _*))
  }

  /** Attach txId to every event: the id of the most recent begin line at
    * or before it, in stream order (`seqCol`). Batch replay uses a global
    * carry-forward window — correct because a CDC stream is serial per
    * backend (the reference is single-threaded per worker); the streaming
    * path keeps the same semantics with per-batch state
    * (graft.streaming.TxAssembly). */
  def withTxId(df: DataFrame, seqCol: String = "seq"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.orderBy(col(seqCol))
      .rowsBetween(Window.unboundedPreceding, 0)
    df.withColumn("tx_id", last(col("begin_id"), ignoreNulls = true).over(w))
  }

  /** NATS-style routing subject: schema.table.pk
    * (reference: /root/reference/src/plugins/nats.js:17-21). */
  def subject(schemaName: Column, table: Column, pk: Column): Column =
    concat_ws(".", schemaName, table, pk)

  /** Cache-bus verb per event kind
    * (reference: /root/reference/src/plugins/nats.js:25-28). */
  def cacheVerb(kind: Column): Column =
    when(kind === "insert", "populate")
      .when(kind === "update", "invalidate")
      .when(kind === "delete", "purge")

  /** Cache-bus subject: {prefix}.{verb}.{subject}. */
  def cacheSubject(prefix: String, kind: Column, subj: Column): Column =
    concat_ws(".", lit(prefix), cacheVerb(kind), subj)
}
