package graft.queries

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** cdc5 (snapshot apply) / cdc6 (SCD2 history) — the two canonical
  * consumer operations over the reference's change stream. Semantics are
  * oracle-checked by the driver; these tests pin the SCALE SHAPE of the
  * plans plus the edge semantics the oracle formulas can't isolate. */
class CdcConsumerOpsSpec extends SparkSpec {
  import spark.implicits._

  test("cdc5 snapshot apply: latest event wins, a latest delete removes " +
      "the row, and the plan is a pure hash aggregate (no window, no sort " +
      "before the output ORDER BY)") {
    val snap = CdcOps.cdc5_apply(spark, sfDir)
    val rows = snap.collect()
    // k%4==3 keys end in a delete → absent from the snapshot
    assert(rows.forall(_.getLong(0) % 4 != 3))
    // k%4==1 keys are never updated → still rev 1 / NEW
    val neverUpdated = rows.filter(_.getLong(0) % 4 == 1)
    assert(neverUpdated.nonEmpty)
    assert(neverUpdated.forall(r => r.getString(1) == "NEW" && r.getLong(2) == 1L))
    // all others were updated → rev 2, real status
    val updated = rows.filter(r => r.getLong(0) % 4 != 1)
    assert(updated.nonEmpty && updated.forall(r => r.getLong(2) == 2L))
    // scale shape: snapshotting must be the max_by hash aggregate — a
    // row_number()-over-pk formulation would show a Window + per-key sort
    val plan = snap.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"),
      "cdc5 must not materialize the snapshot through a window")
  }

  test("cdc6 SCD2: versions chain [valid_from, valid_to), deletes close " +
      "but never appear, exactly one current version per live key") {
    val hist = CdcOps.cdc6_scd2(spark, sfDir)
    hist.persist()
    try {
      // chained bounds: rev1.valid_to == rev2.valid_from where both exist
      val broken = hist.groupBy("pk")
        .agg(count(lit(1)).as("n"),
          sum(col("is_current")).as("cur"),
          max(col("rev")).as("maxrev"))
      // live keys (k%4 != 3) carry exactly one open version; dead keys none
      assert(broken.filter(col("pk") % 4 =!= 3)
        .filter(col("cur") =!= 1).count() == 0)
      assert(broken.filter(col("pk") % 4 === 3)
        .filter(col("cur") =!= 0).count() == 0)
      // adjacency: the next version starts where the previous one ends
      val pairs = hist.alias("a").join(hist.alias("b"),
        col("a.pk") === col("b.pk") && col("a.rev") + 1 === col("b.rev"))
      assert(pairs.filter(col("a.valid_to") =!= col("b.valid_from"))
        .count() == 0)
    } finally { hist.unpersist(); () }
  }
}
