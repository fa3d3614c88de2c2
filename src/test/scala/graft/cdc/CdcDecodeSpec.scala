package graft.cdc

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Decoder semantics mirrored from the reference's live-DB integration
  * tests (/root/reference/test/postgresql.test.js:213-434), replayed as a
  * deterministic LDJSON fixture (FIXTURES.md §A.2).
  */
class CdcDecodeSpec extends SparkSpec {
  import spark.implicits._

  private val fixture = Seq(
    // (seq, line) — one tx: insert → update → delete, plus noise
    (0L, """{"begin": 100}"""),
    (1L, """{"schema": {"id": "integer", "first_name": "varchar"}, "table": "test_table"}"""),
    (2L, """{"insert": {"id": 7, "first_name": "Hayden", "sex": "M"}, "table": "test_table"}"""),
    (3L, """{"update": {"id": 7, "first_name": "Sloan"}, "table": "test_table"}"""),
    (4L, """{"delete": true, "@": {"nullable": null, "id": 7, "first_name": null}, "table": "test_table"}"""),
    (5L, """{"commit": 100, "t": "2016-04-29 15:31:16.129"}"""),
    (6L, """{"begin": 101}"""),
    (7L, """{"insert": {"ID": 9, "first_name": "Upper"}, "table": "test_table"}"""),
    (8L, """{"insert": {"id": 1}, "table": "pg_temp_12345"}"""),
    (9L, """{"insert": {"id": 2}, "table": "secrets"}"""),
    (10L, """{"commit": 101, "t": "2016-04-29 15:32:00"}"""))

  private def decoded = JsonCdc.decode(
    fixture.toDF("seq", "line").withColumn("backend", lit("pg1")))

  test("kind classification covers all six jsoncdc line shapes") {
    val kinds = decoded.orderBy("seq").select("kind").as[String].collect()
    assert(kinds.toSeq == Seq("beginTransaction", "schema", "insert",
      "update", "delete", "commitTransaction", "beginTransaction", "insert",
      "insert", "insert", "commitTransaction"))
  }

  test("insert/update pk = item.id with item.ID fallback") {
    val pks = decoded.filter($"kind".isin("insert", "update"))
      .orderBy("seq").select("pk").as[String].collect()
    assert(pks.toSeq == Seq("7", "7", "9", "1", "2"))
  }

  test("delete pk = value of first non-null key of the old image") {
    // old image keys: nullable(null), id(7), first_name(null) → pk = 7
    val pk = decoded.filter($"kind" === "delete")
      .select("pk").as[String].head()
    assert(pk == "7")
  }

  test("item payload survives as raw JSON") {
    val item = decoded.filter($"seq" === 2).select("item").as[String].head()
    assert(get_json_object(lit(item), "$.first_name") != null)
    assert(item.contains("\"first_name\""))
  }

  test("pg_temp tables and excluded tables are filtered; txs pass") {
    val filtered = JsonCdc.filterTables(decoded, Seq("secrets"))
    val kept = filtered.orderBy("seq").select("seq").as[Long].collect()
    assert(!kept.contains(8L), "pg_temp_* must drop")
    assert(!kept.contains(9L), "excludeTables must drop")
    assert(kept.contains(0L) && kept.contains(5L),
      "begin/commit (no table) must pass")
  }

  test("txId carry attaches the surrounding begin id to every event") {
    val withTx = JsonCdc.withTxId(decoded)
    val byTx = withTx.filter($"kind".isin("insert", "update", "delete"))
      .select("seq", "tx_id").as[(Long, Long)].collect().toMap
    assert(byTx(2L) == 100L && byTx(3L) == 100L && byTx(4L) == 100L)
    assert(byTx(7L) == 101L)
  }

  test("O13: the latest schema line per table governs subsequent DML; " +
      "a second schema line supersedes the first") {
    val lines = Seq(
      (0L, """{"schema": {"id": "integer", "v": "1"}, "table": "t"}"""),
      (1L, """{"insert": {"id": 1}, "table": "t"}"""),
      (2L, """{"schema": {"id": "integer", "v": "2"}, "table": "t"}"""),
      (3L, """{"insert": {"id": 2}, "table": "t"}"""),
      (4L, """{"insert": {"id": 3}, "table": "u"}"""))
      .toDF("seq", "line")
    val out = JsonCdc.withSchemaAttached(JsonCdc.decode(lines))
      .filter($"kind" === "insert")
      .select($"seq", get_json_object($"schema", "$.v").as("v"))
      .as[(Long, String)].collect().toMap
    assert(out(1L) == "1")
    assert(out(3L) == "2", "second schema line must supersede the first")
    assert(out(4L) == null, "tables with no schema line carry none")
  }

  test("bucketed prefix carry crosses bucket boundaries (keyless and keyed)") {
    // bucketSize=2 forces the 11-line fixture through ~6 buckets, so the
    // txId at seq 7 must come from a carry-in (begin 101 is in an earlier
    // bucket than the insert), and the empty bucket between schema lines
    // must inherit through the summary scan.
    val withTx = JsonCdc.withTxId(decoded, bucketSize = 2)
    val byTx = withTx.filter($"kind".isin("insert", "update", "delete"))
      .select("seq", "tx_id").as[(Long, Long)].collect().toMap
    assert(byTx == Map(2L -> 100L, 3L -> 100L, 4L -> 100L,
      7L -> 101L, 8L -> 101L, 9L -> 101L))
    // keyed carry: schema for table t set at seq 0, consumed at seq 9
    // (4+ buckets later, with value-free buckets in between); table u's
    // carry is independent.
    val lines = Seq(
      (0L, """{"schema": {"v": "t1"}, "table": "t"}"""),
      (1L, """{"schema": {"v": "u1"}, "table": "u"}"""),
      (4L, """{"insert": {"id": 1}, "table": "u"}"""),
      (9L, """{"insert": {"id": 2}, "table": "t"}"""))
      .toDF("seq", "line")
    val out = PrefixCarry.lastNonNull(JsonCdc.decode(lines),
        "schema_json", "schema", keys = Seq("table"), bucketSize = 2)
      .filter($"kind" === "insert")
      .select($"seq", get_json_object($"schema", "$.v").as("v"))
      .as[(Long, String)].collect().toMap
    assert(out == Map(4L -> "u1", 9L -> "t1"))
  }

  test("keyless prefix carry survives a null seq row (no crash; the " +
      "null row keeps only its local carry)") {
    val lines = Seq(
      (Some(0L), """{"begin": 500}"""),
      (None, """{"insert": {"id": 9}, "table": "t"}"""),
      (Some(7L), """{"insert": {"id": 1}, "table": "t"}"""))
      .toDF("seq", "line")
    val out = JsonCdc.withTxId(JsonCdc.decode(lines), bucketSize = 2)
      .select($"pk", $"tx_id").collect()
      .map(r => (if (r.isNullAt(0)) null else r.getString(0),
        if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    // real row carries the begin id across buckets; the null-seq row
    // belongs to no bucket and gets no cross-bucket carry
    assert(out("1") == 500L && out("9") == -1L)
  }

  test("commit timestamp parses") {
    val ts = decoded.filter($"seq" === 5).select("commit_ts").head().get(0)
    assert(ts != null)
  }
}
