package graft.cdc

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Decoder for MySQL row-format binlog events, as serialized to JSON by an
  * external ZongJi-style capture process (reference:
  * /root/reference/src/mysql.js:99-270 — the Spark side consumes the
  * capture stream; binlog tailing itself stays external, per SURVEY §0).
  *
  * Wire shapes (one JSON object per binlog event; a row event carries ALL
  * rows of the statement, like ZongJi's `evt.rows`):
  *   {"eventName":"tablemap","schemaName":db,"tableName":t,
  *    "columns":[{"name":c,"constraint":{"type":"PRIMARY KEY",
  *                "name":"PRIMARY","position":1}}, ...]}
  *   {"eventName":"writerows","schemaName":db,"tableName":t,
  *    "rows":[{row}, ...]}
  *   {"eventName":"updaterows", ..., "rows":[{"before":{..},"after":{..}}]}
  *   {"eventName":"deleterows", ..., "rows":[{old row}, ...]}
  *
  * Reference behaviors replicated:
  *   - constraint extraction (mysql.js:113-137): PRIMARY KEY / UNIQUE
  *     constraints keyed by name; pk = first column of PRIMARY
  *     (mysql.js:128-130, constraints.PRIMARY[0]); no UNIQUE fallback —
  *     the reference leaves that as a TODO (mysql.js:139), so a table
  *     without a PRIMARY constraint decodes with a null pk.
  *   - the pk COLUMN is stateful per (schema, table): the latest tablemap
  *     applies to every later row event (mysql.js:140) — a partitioned
  *     carry-forward window here.
  *   - row expansion (mysql.js:144-269): one event per row, in row order.
  *   - update uses the AFTER image for pk and item (mysql.js:231-236);
  *     delete carries NO item, only {pk, table, schema} (mysql.js:148-152).
  *   - excludeTables drops the whole event (mysql.js:107-111).
  */
object BinlogCdc {

  private val constraintType = StructType(Seq(
    StructField("type", StringType),
    StructField("name", StringType),
    StructField("position", IntegerType)))

  private val columnType = StructType(Seq(
    StructField("name", StringType),
    StructField("constraint", constraintType)))

  /** One-parse schema; row objects land as raw JSON strings. */
  private val eventSchema = StructType(Seq(
    StructField("eventName", StringType),
    StructField("schemaName", StringType),
    StructField("tableName", StringType),
    StructField("columns", ArrayType(columnType)),
    StructField("rows", ArrayType(StringType))))

  /** pk column from a tablemap's columns: the position-1 column of the
    * PRIMARY constraint (constraints.PRIMARY[0] in the reference). */
  private def pkColumnOf(columns: Column): Column =
    get(transform(filter(columns, c =>
      c.getField("constraint").getField("name") === "PRIMARY" &&
      c.getField("constraint").getField("position") === 1),
      c => c.getField("name")), lit(0))

  /** Sentinel `_pk_col` for a tablemap that carries no PRIMARY
    * constraint: the reference replaces the stored tableMap wholesale
    * (mysql.js:134), so a table that DROPS its pk mid-stream must reset
    * to a null pk — and a pk-less tablemap must stay distinguishable
    * from a non-tablemap row in the carry column. The sentinel is mapped
    * back to null before pk extraction (expandRows). */
  private[graft] val NoPk = ""

  /** Stateless parse + filter: one from_json per line, tablemap pk column
    * extracted onto `_pk_col` (NoPk sentinel when the tablemap has no
    * PRIMARY constraint; null on row events). Shared by the batch
    * (window-carry) and streaming (keyed-state-carry) paths. */
  private[graft] def parse(df: DataFrame, excludeTables: Seq[String],
      lineCol: String): DataFrame = {
    val parsed = df.withColumn("_p", from_json(col(lineCol), eventSchema))
      .withColumn("event_name", col("_p.eventName"))
      .withColumn("schema", col("_p.schemaName"))
      .withColumn("table", col("_p.tableName"))
      .withColumn("_pk_col",
        when(col("event_name") === "tablemap",
          coalesce(pkColumnOf(col("_p.columns")), lit(NoPk))))
      .withColumn("rows", col("_p.rows"))
    if (excludeTables.isEmpty) parsed
    else parsed.filter(!col("table").isin(excludeTables: _*))
  }

  /** Row expansion + envelope columns over a frame that already carries
    * the effective `pk_col` per event (however the carry was computed).
    * `extraCols` (e.g. a stream's `backend`) ride through unchanged. */
  private[graft] def expandRows(withPkCol: DataFrame, seqCol: String,
      extraCols: Seq[String] = Nil): DataFrame = {
    // row expansion: one envelope per row, in statement row order;
    // the NoPk sentinel (pk dropped / never declared) maps back to null
    val rows = withPkCol
      .withColumn("pk_col",
        when(col("pk_col") === NoPk, lit(null: String))
          .otherwise(col("pk_col")))
      .filter(col("event_name").isin("writerows", "updaterows", "deleterows"))
      .select(extraCols.map(col) ++ Seq(col(seqCol), col("schema"),
        col("table"), col("pk_col"), col("event_name"),
        posexplode(col("rows")).as(Seq("row_idx", "row_json"))): _*)
    val kind = when(col("event_name") === "writerows", "insert")
      .when(col("event_name") === "updaterows", "update")
      .otherwise("delete")
    // update rows are {"before":{..},"after":{..}}; pk and item both come
    // from the after image (mysql.js:231-236)
    val image = when(col("event_name") === "updaterows",
      get_json_object(col("row_json"), "$.after")).otherwise(col("row_json"))
    rows
      .withColumn("kind", kind)
      .withColumn("_image", image)
      .withColumn("pk",
        when(col("pk_col").isNotNull,
          element_at(from_json(col("_image"),
            MapType(StringType, StringType)), col("pk_col"))))
      .withColumn("item",
        when(col("event_name") =!= "deleterows", col("_image")))
      .select(extraCols.map(col) ++ Seq(col(seqCol), col("row_idx"),
        col("kind"), col("schema"), col("table"), col("pk"),
        col("item")): _*)
  }

  /** Decode a BATCH frame with a string column `line` (ordered by
    * `seqCol`) into per-row canonical envelopes: kind, schema, table, pk,
    * item. Tablemap events contribute the stateful pk column and are not
    * emitted. The streaming twin keeps the same carry as keyed state
    * (graft.streaming.BinlogStream). */
  def decode(df: DataFrame, excludeTables: Seq[String] = Nil,
             lineCol: String = "line", seqCol: String = "seq"): DataFrame = {
    // stateful pk column per (schema, table): latest tablemap wins —
    // bucketed prefix scan (PrefixCarry), so one hot table in a batch
    // replay spreads across tasks instead of funneling through one.
    // The parse is materialized ONCE (eager localCheckpoint): the carry
    // forks the plan into main + bucket-summary branches whose differing
    // column pruning defeats ReuseExchange, so without the snapshot the
    // whole binlog JSON parse would run twice. decode() is the
    // batch/replay path by contract (streaming = BinlogStream on
    // parse()), so eager materialization is safe here.
    val withPkCol = PrefixCarry.lastNonNull(
      parse(df, excludeTables, lineCol).localCheckpoint(), "_pk_col",
      "pk_col", seqCol, keys = Seq("schema", "table"))
    // the carry leaves rows partitioned by (schema, table, bucket) — a
    // replay dominated by ONE hot table would run the expansion (the
    // per-row JSON work, the expensive half of decode) in that key's
    // few partitions; respread first so expandRows uses the cluster
    val n = df.sparkSession.conf
      .get("spark.sql.shuffle.partitions", "32").toInt
    expandRows(withPkCol.repartition(n), seqCol)
  }
}
