package graft

/** Every declared query runs at sf0.001 without throwing and yields a
  * non-empty schema; the flagship entry yields rows (driver smoke). */
class QueriesSmokeSpec extends SparkSpec {

  test("flagship entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("queries and oracleSql keys line up") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracles without queries: $missing")
  }

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name runs at sf0.001") {
      val df = fn(spark, sfDir)
      assert(df.schema.nonEmpty)
      val n = df.count()
      assert(n >= 0)
    }
  }
}
