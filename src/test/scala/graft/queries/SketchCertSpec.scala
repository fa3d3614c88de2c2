package graft.queries

import org.apache.spark.sql.types.BooleanType

import graft.{SparkEntry, SparkSpec}

/** The four rows-only sketch/codec entries' ERROR CERTIFICATIONS —
  * the hash-green `*_err` / `*_roundtrip` twins (the oracle asserts
  * the literal `true` each bound implies, so a degraded sketch turns
  * the driver gate red) and the numeric measurements Verify dumps to
  * approx_err.json. This suite pins both halves on the fixture:
  * every certification row is true, every measured error sits under
  * its documented bound, and the cert columns really are booleans
  * (the hash coupling the oracle replays). */
class SketchCertSpec extends SparkSpec {

  test("q04b_approx_err: every group certifies |approx − exact| ≤ 5% " +
      "and the measured max relative error respects the bound") {
    val df = Relational.q04b_approx_err(spark, sfDir)
    assert(df.schema("err_ok").dataType == BooleanType)
    val rows = df.collect()
    assert(rows.length == 5) // the 5 order priorities
    rows.foreach(r => assert(r.getBoolean(1), r.toString))
    val (bound, fn) = SparkEntry.approxErrors("q04b_approx_distinct")
    val err = fn(spark, sfDir)
    assert(err >= 0 && err <= bound, s"measured $err > bound $bound")
  }

  test("q04c_hll_err: per-type sketches certify 5% vs exact and the " +
      "__all__ row certifies union-of-parts == sketch-of-whole") {
    val rows = Relational.q04c_hll_err(spark, sfDir).collect()
    assert(rows.length == 6) // 5 event types + __all__
    assert(rows.map(_.getString(0)).contains("__all__"))
    rows.foreach(r => assert(r.getBoolean(1), r.toString))
    val (bound, fn) = SparkEntry.approxErrors("q04c_hll_sketches")
    val err = fn(spark, sfDir)
    assert(err >= 0 && err <= bound, s"measured $err > bound $bound")
  }

  test("q24_quantiles_err: every (lang, percentile) rank certificate " +
      "holds and the measured worst rank-error fraction respects the " +
      "bound") {
    val rows = TextOps.q24_quantiles_err(spark, sfDir).collect()
    assert(rows.length == 5) // the 5 languages
    rows.foreach { r =>
      assert(r.getBoolean(1) && r.getBoolean(2) && r.getBoolean(3),
        r.toString)
    }
    val (bound, fn) = SparkEntry.approxErrors("q24_quantiles_approx")
    val err = fn(spark, sfDir)
    assert(err >= 0 && err <= bound, s"measured $err > bound $bound")
  }

  test("q24_compress_roundtrip: every document inflates back to its " +
      "exact original bytes and the measured failure fraction is zero") {
    val rows = TextOps.q24_compress_roundtrip(spark, sfDir).collect()
    val nDocs = spark.read.parquet(s"$sfDir/documents.parquet").count()
    assert(rows.length.toLong == nDocs, "one certification row per doc")
    rows.foreach(r => assert(r.getBoolean(1), s"doc ${r.getLong(0)}"))
    val (bound, fn) = SparkEntry.approxErrors("q24_compress")
    assert(fn(spark, sfDir) == bound) // 0.0: lossless corpus-wide
  }

  test("the approxErrors map certifies exactly the rows-only entries " +
      "(same keys InventorySpec exempts from the oracle) and every " +
      "bound is a real constraint") {
    val rowsOnly = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(SparkEntry.approxErrors.keySet == rowsOnly,
      "approx_err.json coverage drifted from the rows-only list")
    SparkEntry.approxErrors.foreach { case (name, (bound, _)) =>
      assert(bound >= 0.0 && bound <= 0.05, s"$name bound $bound")
    }
  }
}
