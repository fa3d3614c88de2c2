package graft.cli

import graft.SparkSpec

/** The `-e --cdc <file>` view: a user's own jsoncdc capture decoded by
  * the real normalizer and queryable as temp view `cdc` — the ad-hoc
  * face of the cdc14-style trust checks. Pins the registration seam
  * (file → decoded view) end to end on a real LDJSON file. */
class CdcViewSpec extends SparkSpec {

  private lazy val capture: String = {
    val p = java.nio.file.Files.createTempFile("graft-cdc-view", ".ldjson")
    val lines = Seq(
      """{"begin": 700}""",
      """{"schema": {"id": "integer"}, "table": "test_table"}""",
      """{"insert": {"id": 1, "first_name": "Ada"}, "table": "test_table"}""",
      """{"update": {"id": 1, "first_name": "Ada L"}, "table": "test_table"}""",
      """{"delete": true, "@": {"id": 1, "first_name": null}, "table": "test_table"}""",
      """{"insert": {"id": 9}, "table": "pg_temp_73"}""",
      """{"commit": 700, "t": "2024-01-01 00:00:01"}""")
    java.nio.file.Files.write(p,
      lines.mkString("\n").getBytes("UTF-8"))
    p.toString
  }

  test("registerCdcView decodes the capture through JsonCdc and drops " +
      "pg_temp noise; kinds, pk extraction and file order are " +
      "queryable as SQL") {
    Main.registerCdcView(spark, capture)
    val rows = spark.sql(
      "SELECT seq, kind, `table`, pk FROM cdc ORDER BY seq").collect()
    assert(rows.map(_.getString(1)).toSeq ==
      Seq("beginTransaction", "schema", "insert", "update", "delete",
        "commitTransaction"))
    // pg_temp_73 dropped by the same filter the stream path applies
    assert(!rows.exists(r => r.getString(2) == "pg_temp_73"))
    // pk = first key of the item (insert/update) / old image (delete)
    assert(rows.filter(r => Seq("insert", "update", "delete")
      .contains(r.getString(1))).forall(_.getString(3) == "1"))
    // seq is monotone in file order
    val seqs = rows.map(_.getLong(0)).toSeq
    assert(seqs == seqs.sorted)
  }

  test("adhocFrame composes the cdc view with the batch tables — one " +
      "SQL statement can join a capture against reference data") {
    val df = Main.adhocFrame(spark,
      "SELECT count(*) AS n FROM cdc WHERE kind = 'insert'",
      sfDir, cdcPath = Some(capture))
    assert(df.collect().head.getLong(0) == 1L)
  }
}
