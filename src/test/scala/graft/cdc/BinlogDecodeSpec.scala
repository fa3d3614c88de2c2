package graft.cdc

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** MySQL binlog normalizer semantics mirrored from the reference's
  * live-DB integration tests (/root/reference/test/mysql.test.js:176-330)
  * and _binLogHandler (/root/reference/src/mysql.js:99-270), replayed as
  * a deterministic JSON fixture.
  */
class BinlogDecodeSpec extends SparkSpec {
  import spark.implicits._

  private val colsWithPk =
    """[{"name": "id", "constraint": {"type": "PRIMARY KEY", "name": "PRIMARY", "position": 1}},
      | {"name": "email", "constraint": {"type": "UNIQUE", "name": "uq_email", "position": 1}},
      | {"name": "name"}]""".stripMargin.replaceAll("\n", "")

  private val fixture = Seq(
    (0L, s"""{"eventName": "tablemap", "schemaName": "lapidus", "tableName": "users", "columns": $colsWithPk}"""),
    // no PRIMARY constraint → reference has no UNIQUE fallback (mysql.js:139 TODO)
    (1L, """{"eventName": "tablemap", "schemaName": "lapidus", "tableName": "nopk", "columns": [{"name": "email", "constraint": {"type": "UNIQUE", "name": "uq", "position": 1}}]}"""),
    // multi-row insert expands in row order (mysql.js:185-226)
    (2L, """{"eventName": "writerows", "schemaName": "lapidus", "tableName": "users", "rows": [{"id": 1, "name": "Hayden"}, {"id": 2, "name": "Sloan"}]}"""),
    // update: pk and item from the AFTER image (mysql.js:231-236)
    (3L, """{"eventName": "updaterows", "schemaName": "lapidus", "tableName": "users", "rows": [{"before": {"id": 1, "name": "Hayden"}, "after": {"id": 1, "name": "Aiden"}}]}"""),
    // delete: no item, pk from the row image (mysql.js:148-152)
    (4L, """{"eventName": "deleterows", "schemaName": "lapidus", "tableName": "users", "rows": [{"id": 2, "name": "Sloan"}]}"""),
    (5L, """{"eventName": "writerows", "schemaName": "lapidus", "tableName": "nopk", "rows": [{"email": "x@y.z"}]}"""),
    (6L, """{"eventName": "writerows", "schemaName": "lapidus", "tableName": "secrets", "rows": [{"id": 9}]}"""),
    // a later tablemap changes the pk column for subsequent events
    (7L, s"""{"eventName": "tablemap", "schemaName": "lapidus", "tableName": "users", "columns": [{"name": "uid", "constraint": {"type": "PRIMARY KEY", "name": "PRIMARY", "position": 1}}]}"""),
    (8L, """{"eventName": "writerows", "schemaName": "lapidus", "tableName": "users", "rows": [{"uid": 77, "name": "New"}]}"""))

  private def decoded = BinlogCdc.decode(
    fixture.toDF("seq", "line"), excludeTables = Seq("secrets"))

  test("multi-row events expand to one envelope per row, in order") {
    val rows = decoded.filter($"table" === "users" && $"seq" === 2)
      .orderBy("row_idx")
      .select("kind", "pk").as[(String, String)].collect()
    assert(rows.toSeq == Seq(("insert", "1"), ("insert", "2")))
  }

  test("insert envelope carries schema, table, pk and the full row item") {
    val e = decoded.filter($"seq" === 2 && $"row_idx" === 0)
      .select("schema", "table", "pk", "item").head()
    assert(e.getString(0) == "lapidus" && e.getString(1) == "users")
    assert(e.getString(2) == "1")
    assert(e.getString(3).contains("\"Hayden\""))
  }

  test("update uses the after image for both pk and item") {
    val e = decoded.filter($"kind" === "update")
      .select("pk", "item").head()
    assert(e.getString(0) == "1")
    assert(e.getString(1).contains("Aiden") && !e.getString(1).contains("before"))
  }

  test("delete carries pk but no item") {
    val e = decoded.filter($"kind" === "delete")
      .select("pk", "item").head()
    assert(e.getString(0) == "2" && e.isNullAt(1))
  }

  test("pk column comes from the PRIMARY constraint; UNIQUE is no fallback") {
    val nopk = decoded.filter($"table" === "nopk").select("pk").head()
    assert(nopk.isNullAt(0), "table without PRIMARY decodes with null pk")
  }

  test("excludeTables drops the event") {
    assert(decoded.filter($"table" === "secrets").isEmpty)
  }

  test("a later tablemap supersedes the pk column for later events") {
    val e = decoded.filter($"seq" === 8).select("pk").head()
    assert(e.getString(0) == "77")
  }

  test("a pk-less tablemap RESETS the carried pk column (mysql.js:134 " +
      "replaces the stored tableMap wholesale)") {
    val lines = Seq(
      (0L, s"""{"eventName": "tablemap", "schemaName": "lapidus", "tableName": "t", "columns": $colsWithPk}"""),
      (1L, """{"eventName": "writerows", "schemaName": "lapidus", "tableName": "t", "rows": [{"id": 1}]}"""),
      // pk dropped: new tablemap has no PRIMARY constraint
      (2L, """{"eventName": "tablemap", "schemaName": "lapidus", "tableName": "t", "columns": [{"name": "id"}]}"""),
      (3L, """{"eventName": "writerows", "schemaName": "lapidus", "tableName": "t", "rows": [{"id": 2}]}"""))
      .toDF("seq", "line")
    val pks = BinlogCdc.decode(lines).orderBy("seq")
      .select("pk").collect().map(r => Option(r.getString(0)))
    assert(pks.toSeq == Seq(Some("1"), None),
      "pk must reset to null after the constraint disappears, not carry stale")
  }
}
