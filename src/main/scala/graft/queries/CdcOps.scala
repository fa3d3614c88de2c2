package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.cdc.JsonCdc

/** CDC1/CDC2 — the reference's decode + routing pipeline as oracle-checked
  * batch queries (SURVEY.md §2.4).
  *
  * A deterministic jsoncdc replay stream is synthesized from `orders`
  * (3 lines per order: begin / one DML / commit; DML kind cycles by
  * orderkey; every 10th order targets a pg_temp_* table and every
  * 10th+8 an excluded table), then pushed through the REAL decoder
  * (graft.cdc.JsonCdc — get_json_object when-chain, pk rules, table
  * filters, tx carry). The oracle states the expected envelope directly,
  * so any decoder regression breaks the hash match.
  */
object CdcOps {

  /** 3 jsoncdc lines per order, globally ordered by seq. */
  private[graft] def syntheticLines(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.load(s, dir, "orders")
      .select(col("o_orderkey").as("k"), col("o_orderstatus").as("st"))
      .withColumn("tbl",
        when(col("k") % 10 === 9, lit("pg_temp_refresh"))
          .when(col("k") % 10 === 8, lit("audit_log"))
          .otherwise(lit("orders")))
    val begin = o.select((col("k") * 3).as("seq"),
      format_string("""{"begin": %d}""", col("k")).as("line"))
    val dml = o.select((col("k") * 3 + 1).as("seq"),
      when(col("k") % 3 === 0, format_string(
        """{"insert": {"id": %d, "status": "%s"}, "table": "%s"}""",
        col("k"), col("st"), col("tbl")))
        .when(col("k") % 3 === 1, format_string(
          """{"update": {"id": %d, "status": "%s"}, "table": "%s"}""",
          col("k"), col("st"), col("tbl")))
        .otherwise(format_string(
          """{"delete": true, "@": {"note": null, "id": %d}, "table": "%s"}""",
          col("k"), col("tbl"))).as("line"))
    val commit = o.select((col("k") * 3 + 2).as("seq"),
      format_string("""{"commit": %d, "t": "2024-01-01 00:00:00"}""",
        col("k")).as("line"))
    // The 3-way union of a single small parquet scan yields only 3 input
    // partitions; spread the lines so the decode (the operator under
    // measurement) runs at full parallelism, as a real multi-partition
    // source would. Explicit N so AQE doesn't coalesce it away.
    val n = s.conf.get("spark.sql.shuffle.partitions", "32").toInt
    begin.unionAll(dml).unionAll(commit).repartition(n)
  }

  // -------------------------------------------------------------- CDC1
  /** Decode the replay stream into canonical envelopes: classification,
    * table/pg_temp/exclude filtering, pk extraction (incl. the
    * first-non-null-key delete rule), txId carry from begin lines. */
  def cdc1_decode(s: SparkSession, dir: String): DataFrame = {
    val decoded = JsonCdc.decode(syntheticLines(s, dir))
    val filtered = JsonCdc.filterTables(decoded, Seq("audit_log"))
    JsonCdc.withTxId(filtered, "seq")
      .filter(col("kind").isin("insert", "update", "delete"))
      .select(col("pk").cast("long").as("pk"), col("kind"), col("table"),
        col("tx_id"))
      .orderBy("pk")
  }

  val cdc1Sql: String =
    """SELECT o_orderkey AS pk,
      |  CASE WHEN o_orderkey % 3 = 0 THEN 'insert'
      |       WHEN o_orderkey % 3 = 1 THEN 'update'
      |       ELSE 'delete' END AS kind,
      |  'orders' AS "table",
      |  o_orderkey AS tx_id
      |FROM orders
      |WHERE o_orderkey % 10 NOT IN (8, 9)
      |ORDER BY pk""".stripMargin

  // -------------------------------------------------------------- CDC2
  /** Routing: NATS-style subject schema.table.pk plus the cache-bus
    * subject {prefix}.{verb}.{subject} keyed by event kind. */
  def cdc2_routing(s: SparkSession, dir: String): DataFrame = {
    val decoded = JsonCdc.decode(syntheticLines(s, dir))
    val filtered = JsonCdc.filterTables(decoded, Seq("audit_log"))
      .filter(col("kind").isin("insert", "update", "delete"))
    val subj = JsonCdc.subject(lit("public"), col("table"), col("pk"))
    filtered
      .withColumn("subject", subj)
      .withColumn("cache_subject",
        JsonCdc.cacheSubject("cache", col("kind"), subj))
      .select(col("pk").cast("long").as("pk"), col("subject"),
        col("cache_subject"))
      .orderBy("pk")
  }

  val cdc2Sql: String =
    """SELECT o_orderkey AS pk,
      |  'public.orders.' || o_orderkey AS subject,
      |  'cache.' || CASE WHEN o_orderkey % 3 = 0 THEN 'populate'
      |       WHEN o_orderkey % 3 = 1 THEN 'invalidate'
      |       ELSE 'purge' END || '.public.orders.' || o_orderkey
      |    AS cache_subject
      |FROM orders
      |WHERE o_orderkey % 10 NOT IN (8, 9)
      |ORDER BY pk""".stripMargin

  // ----------------------------------------------------------------
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "cdc1_decode" -> (cdc1_decode _),
    "cdc2_routing" -> (cdc2_routing _))

  def oracles: Map[String, String] = Map(
    "cdc1_decode" -> cdc1Sql,
    "cdc2_routing" -> cdc2Sql)
}
