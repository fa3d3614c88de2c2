package graft.queries

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Semantics pins for the round-4 additions: the cdc14 transport audit,
  * q29d session-path mining, q34d seasonality, and q23_semdedup — each
  * on planted inputs the oracle formula can't isolate (it computes the
  * same expression on the same fixture). */
class AuditPathsSpec extends SparkSpec {
  import spark.implicits._

  // ------------------------------------------------------------ cdc14
  private def decoded(rows: Seq[(Long, String, Option[Long], Option[Long])]) =
    rows.toDF("seq", "kind", "begin_id", "commit_id")

  test("txAudit: a healthy begin/commit pair emits nothing; an orphaned " +
      "begin, a stranded commit, and a re-delivered seq each emit one " +
      "typed anomaly row") {
    val out = CdcOps.txAudit(decoded(Seq(
        (1L, "beginTransaction", Some(10L), None), // healthy tx 10
        (2L, "insert", None, None),
        (3L, "commitTransaction", None, Some(10L)),
        (5L, "beginTransaction", Some(11L), None), // orphan: no commit
        (6L, "insert", None, None),
        (9L, "commitTransaction", None, Some(12L)), // stranded: no begin
        (6L, "insert", None, None)))) // seq 6 delivered twice
      .orderBy("anomaly", "key").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(out == Seq(
      ("dup_delivery", 6L, 2L),
      ("orphan_tx", 11L, 1L),
      ("stranded_commit", 12L, 1L)))
  }

  test("txAudit counts the missing side: two begins with one commit is " +
      "an orphan_tx with n=1 (re-delivered begin + lost commit never " +
      "cancel out)") {
    val out = CdcOps.txAudit(decoded(Seq(
        (1L, "beginTransaction", Some(7L), None),
        (4L, "beginTransaction", Some(7L), None), // re-delivered begin
        (5L, "commitTransaction", None, Some(7L)))))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq(("orphan_tx", 7L, 1L)))
  }

  test("cdc14 over the fixture finds exactly the planted fault classes " +
      "at the planted keys") {
    val out = CdcOps.queries("cdc14_tx_audit")(spark, sfDir).collect()
    val byKind = out.groupBy(_.getString(0))
    assert(byKind.keySet == Set("orphan_tx", "dup_delivery"))
    assert(byKind("orphan_tx").forall(r => r.getLong(1) % 89 == 0))
    assert(byKind("dup_delivery").forall { r =>
      val k = (r.getLong(1) - 2) / 4
      r.getLong(1) % 4 == 2 && k % 97 == 0 && r.getLong(2) == 2L
    })
  }

  // ------------------------------------------------------------- q29d
  private def events(rows: Seq[(Long, Long, Long, String)]) =
    rows.toDF("user_id", "event_id", "ts_us", "event_type")

  test("sessionPaths: path follows (ts_us, event_id) order inside the " +
      "session and the 30-min gap splits paths") {
    val gap = 30L * 60 * 1000 * 1000
    val out = FunnelOps.sessionPaths(events(Seq(
        (1L, 2L, 100L, "view"), // same ts: event_id orders view<click
        (1L, 3L, 100L, "click"),
        (1L, 1L, 50L, "signup"),
        (1L, 9L, 100L + gap + 1, "purchase")))) // new session
      .orderBy("session_id").collect().map(_.getString(2)).toSeq
    assert(out == Seq("signup>view>click", "purchase"))
  }

  test("q29d ranks by frequency with a deterministic (n DESC, path) " +
      "tie order and bounds the result at 20") {
    val out = FunnelOps.queries("q29d_paths")(spark, sfDir).collect()
    assert(out.length <= 20)
    val ns = out.map(_.getLong(1)).toSeq
    assert(ns == ns.sorted.reverse, "n_sessions must be non-increasing")
    assert(out.forall(r => r.getLong(2) <= r.getLong(1)),
      "distinct users can never exceed sessions")
  }

  // ------------------------------------------------------------- q34d
  test("q34d: every type covers all 7 weekdays of its active range, " +
      "avg_micro is the exact floor average, and the seasonal index " +
      "weight-averages to ~1000 per type") {
    val rows = FunnelOps.queries("q34d_seasonal")(spark, sfDir).collect()
    val byType = rows.groupBy(_.getString(0))
    byType.foreach { case (t, rs) =>
      assert(rs.map(_.getLong(1)).toSet.size == 7, s"$t misses a weekday")
      rs.foreach { r =>
        assert(r.getLong(4) == 1000000L * r.getLong(3) / r.getLong(2))
      }
      // Σ n_days·idx ≈ 1000·Σ n_days (floor error < 2 per row)
      val totDays = rs.map(_.getLong(2)).sum
      val wIdx = rs.map(r => r.getLong(2) * r.getLong(5)).sum
      assert(math.abs(wIdx - 1000L * totDays) <= 2L * totDays,
        s"$t seasonal index does not average to 1")
    }
  }

  // ----------------------------------------------------------- semdedup
  test("q23_semdedup: keepers are strictly earlier than their dropped " +
      "vector, similarity clears the threshold, and a dropped vector " +
      "never appears as a keeper of an earlier one") {
    val rows = SimilarityOps.queries("q23_semdedup")(spark, sfDir).collect()
    assert(rows.nonEmpty, "fixture corpus has near-duplicate pairs")
    assert(rows.map(_.getLong(0)).distinct.length == rows.length,
      "one row per dropped vector")
    rows.foreach { r =>
      assert(r.getLong(2) < r.getLong(0), "keeper must be earlier")
      assert(r.getDouble(3) >= 0.35)
      assert(r.getLong(1) >= 0 && r.getLong(1) < 8)
    }
  }

  test("q23_semdedup_adaptive: bit-identical to the naive in-memory " +
      "recompute under the k = max(8, ceil(sqrt(n))) sizing rule — " +
      "assignment (integer micro-space, first-minimum ties), drop " +
      "rule, keeper choice, and the cosine values themselves") {
    import org.apache.spark.sql.functions.col
    val vecs = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
      .sortBy(_._1)
    val n = vecs.length
    val k = math.max(8, math.ceil(math.sqrt(n.toDouble)).toInt)
    def vm(v: Array[Float]): Array[Long] =
      v.map(x => math.floor(x.toDouble * 1000000).toLong + 2000000)
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }; s
    }
    val dv = vecs.map { case (id, v) => (id, v.map(_.toDouble)) }
    val nrm = dv.map { case (id, v) => id -> math.sqrt(dot(v, v)) }.toMap
    val cents = vecs.take(k).map { case (_, v) => vm(v) }
    val cid = vecs.map { case (id, v) =>
      val m = vm(v)
      var best = 0; var bestD = Long.MaxValue
      for (c <- cents.indices) {
        var d = 0L; var i = 0
        while (i < 64) { val t = m(i) - cents(c)(i); d += t * t; i += 1 }
        if (d < bestD) { bestD = d; best = c } // first minimum wins
      }
      id -> best.toLong
    }.toMap
    val byId = dv.toMap
    val want = scala.collection.mutable.Map
      .empty[Long, (Long, Long, Double)] // dropped -> (cid, keeper, cos)
    for (Array((ia, _), (ib, _)) <- vecs.combinations(2)
         if cid(ia) == cid(ib)) {
      val cos = dot(byId(ia), byId(ib)) / (nrm(ia) * nrm(ib))
      if (cos >= 0.35) {
        val (a, b) = (math.min(ia, ib), math.max(ia, ib))
        val cur = want.get(b)
        if (cur.forall { case (_, ka, c) => cos > c || (cos == c && a < ka) })
          want(b) = (cid(b), a, cos)
      }
    }
    val got = SimilarityOps.queries("q23_semdedup_adaptive")(spark, sfDir)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    assert(got.keySet == want.keySet,
      s"drop lists differ: extra=${got.keySet -- want.keySet} " +
        s"missing=${want.keySet -- got.keySet}")
    got.foreach { case (b, row) => assert(row == want(b), s"dropped $b") }
    assert(got.nonEmpty, "fixture corpus has same-cluster near-dup pairs")
    // the sizing rule really widened the cluster space past the fixed-k
    // twin's 8
    assert(k > 8 && cid.values.toSet.size > 8)
  }
}
