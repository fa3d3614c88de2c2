package graft.queries

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Semantics pins for the round-4 batch additions — ACF (q34e),
  * conversion latency (q29e), related items (q42c), weighted sampling
  * (q26_weighted), Holt smoothing (q34f), Benford (q19h), sorted-
  * neighborhood linkage (q22_snm), MMR (q23_mmr), label propagation
  * (q41b), seasonal anomaly (q35c), Zipf bands (q24_zipf), FK discovery
  * (q36d), k-anonymity (q36c), freshness lag (cdc15), and the s12
  * attribution twin — each on planted inputs (or recomputed invariants)
  * the shared-fixture oracle can't isolate. */
class AnalyticsExtrasSpec extends SparkSpec {
  import spark.implicits._

  // ------------------------------------------------------------- q34e
  test("acfOf: a period-2 alternating series is perfectly anticorrelated " +
      "at lag 1 and perfectly correlated at lag 2") {
    val daily = (0 until 10)
      .map(d => ("a", d.toLong, if (d % 2 == 0) 1L else 3L))
      .toDF("event_type", "day", "n")
    val got = FunnelOps.acfOf(daily, maxLag = 2)
      .collect().map(r => (r.getInt(1), r.getLong(2), r.getDouble(3)))
    val byLag = got.map(t => t._1 -> t).toMap
    assert(byLag(1)._2 == 9L && math.abs(byLag(1)._3 + 1.0) < 1e-12)
    assert(byLag(2)._2 == 8L && math.abs(byLag(2)._3 - 1.0) < 1e-12)
  }

  test("acfOf: a constant series has zero variance — acf is NULL, " +
      "never a 0/0 NaN") {
    val daily = (0 until 6).map(d => ("c", d.toLong, 5L))
      .toDF("event_type", "day", "n")
    val got = FunnelOps.acfOf(daily, maxLag = 2).collect()
    assert(got.length == 2 && got.forall(_.isNullAt(3)))
  }

  test("acfOf: lags longer than the series produce no pair rows (the " +
      "scaffold edge drops them; no empty-group placeholder)") {
    val daily = (0 until 3).map(d => ("s", d.toLong, d.toLong))
      .toDF("event_type", "day", "n")
    val ks = FunnelOps.acfOf(daily, maxLag = 7)
      .select("k").as[Int].collect().toSet
    assert(ks == Set(1, 2)) // 3-day series: lag 3+ has no pairs
  }

  // ------------------------------------------------------------- q29e
  test("convertTime: first-signup→first-later-purchase latency, binned " +
      "by hour; non-converters, purchase-before-signup, and the exact " +
      "signup instant are excluded; repeat purchases count once") {
    val h = 3600000000L
    val e = Seq(
      // u1: converts in 90 min -> bin 1
      (1L, "signup", 0L), (1L, "purchase", h + h / 2),
      // u2: purchase but never signed up -> excluded
      (2L, "purchase", h),
      // u3: signup only -> excluded
      (3L, "signup", 100L),
      // u4: purchase before signup ignored; at the signup instant
      // excluded (strict >); 30 min after -> bin 0
      (4L, "purchase", 50L), (4L, "signup", 100L),
      (4L, "purchase", 100L), (4L, "purchase", 100L + h / 2),
      // u5: first purchase 10s after signup -> bin 0 (2h one ignored)
      (5L, "signup", 0L), (5L, "purchase", 10000000L),
      (5L, "purchase", 2 * h))
      .toDF("user_id", "event_type", "ts_us")
    val got = FunnelOps.convertTime(e)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == Seq((0L, 2L), (1L, 1L)))
  }

  // ------------------------------------------------------------- q42c
  test("relatedItems: jaccard ppm from pair supports and basket counts; " +
      "ties rank by neighbor id; sub-support pairs never appear") {
    val items = Seq(
      (10L, 1L), (10L, 2L), (11L, 1L), (11L, 2L), // co(1,2)=2
      (12L, 1L), (12L, 3L), (13L, 1L), (13L, 3L), // co(1,3)=2
      (14L, 2L), (14L, 3L)) // co(2,3)=1 -> below minSupport
      .toDF("basket", "item")
    // n(1)=4, n(2)=3, n(3)=3; jac(1,2)=jac(1,3)=2/5
    val got = IndexOps.relatedItems(items, minSupport = 2, k = 5)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(got == Seq(
      (1L, 1L, 2L, 2L, 400000L), // tie with 3 broken by id
      (1L, 2L, 3L, 2L, 400000L),
      (2L, 1L, 1L, 2L, 400000L),
      (3L, 1L, 1L, 2L, 400000L)))
  }

  // ----------------------------------------------------- q26_weighted
  test("q26_weighted: at most k per stratum, ranks consecutive from 1 " +
      "in priority order, and every priority recomputes from the key " +
      "and weight alone (reproducible membership)") {
    val got = SampleOps.queries("q26_weighted")(spark, sfDir).collect()
    val chars = graft.Tables.load(spark, sfDir, "documents")
      .select("doc_id", "n_chars").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    got.groupBy(_.getString(0)).foreach { case (_, rows) =>
      val rks = rows.map(_.getLong(1)).sorted.toSeq
      assert(rks == (1L to rks.length).toSeq && rks.length <= 8)
      val pris = rows.sortBy(_.getLong(1)).map(_.getLong(4)).toSeq
      assert(pris == pris.sorted) // rank follows priority
    }
    got.foreach { r =>
      val (docId, wt, pri) = (r.getLong(2), r.getLong(3), r.getLong(4))
      val h = java.lang.Math.floorMod(docId * 2654435761L, 4294967296L)
      assert(wt == math.max(chars(docId), 1L))
      assert(pri == h * 1000000L / wt)
    }
  }

  // ------------------------------------------------------------- q34f
  test("q34f holt: a constant series locks level = 8x and trend = 0 " +
      "(in 8ths) from the first observation") {
    val daily = (0 until 5).map(d => ("c", d.toLong, 7L))
      .toDF("event_type", "day", "n")
    val got = FunnelOps.holtOf(daily).collect()
    assert(got.forall(r => r.getLong(2) == 56L && r.getLong(3) == 0L &&
      r.getLong(4) == 56L))
  }

  test("q34f holt: a falling series goes through a NEGATIVE trend with " +
      "FLOOR division (floor(-22/4) = -6, where truncation would say -5)") {
    val daily = Seq(("d", 0L, 10L), ("d", 1L, 6L), ("d", 2L, 2L))
      .toDF("event_type", "day", "n")
    val got = FunnelOps.holtOf(daily).orderBy("day").collect()
      .map(r => (r.getLong(2), r.getLong(3))).toSeq
    assert(got == Seq((80L, 0L), (72L, -2L), (56L, -6L)))
  }

  // ------------------------------------------------------------- q19h
  test("q19h benford: digit classes partition the table, shares are " +
      "floor ppm, deviation is observed minus the pinned expectation") {
    val got = Relational.queries("q19h_benford")(spark, sfDir).collect()
    val total = graft.Tables.load(spark, sfDir, "orders").count()
    assert(got.map(_.getLong(1)).sum == total)
    val expPpm = Map(1 -> 301029L, 2 -> 176091L, 3 -> 124938L,
      4 -> 96910L, 5 -> 79181L, 6 -> 66946L, 7 -> 57991L, 8 -> 51152L,
      9 -> 45757L)
    got.foreach { r =>
      val (d, n) = (r.getInt(0), r.getLong(1))
      assert(d >= 1 && d <= 9)
      assert(r.getLong(2) == n * 1000000L / total)
      assert(r.getLong(3) == expPpm(d))
      assert(r.getLong(4) == r.getLong(2) - expPpm(d))
    }
  }

  // --------------------------------------------------------- q22_snm
  test("snmPairs: pairs emit within the w-window inside a prefix block " +
      "only; beyond-window and cross-prefix neighbors never compare, " +
      "and distance > maxDist drops") {
    val recs = Seq(
      // prefix 'aaaa': five records in sort order; w=2
      (1L, "aaaa 1"), (2L, "aaaa 2"), (3L, "aaaa 3"),
      (4L, "aaaa zzzzzz"), // dist > 3 from others
      (5L, "aaaa 4"),
      // prefix 'aaab': near-identical to an 'aaaa' record, but a
      // different block — never compared
      (6L, "aaab 1"))
      .toDF("key", "name")
    val got = DedupOps.snmPairs(recs, window = 2, maxDist = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    // sort order in 'aaaa': "aaaa 1"(1), "aaaa 2"(2), "aaaa 3"(3),
    // "aaaa 4"(5), "aaaa zzzzzz"(4)
    // w=2 candidates: (1,2),(1,3),(2,3),(2,5),(3,5),(3,4),(5,4);
    // (3,4) and (5,4) fail maxDist; (1,5) is beyond the window
    assert(got.sorted == Seq((1L, 2L), (1L, 3L), (2L, 3L), (2L, 5L),
      (3L, 5L)))
    assert(!got.exists { case (a, b) => a == 6L || b == 6L })
  }

  // ---------------------------------------------------------- q24_zipf
  test("q24_zipf: bands partition the vocabulary (term and occurrence " +
      "mass both add up) and band 0 is exactly the top-frequency tie " +
      "class") {
    val got = TextOps.queries("q24_zipf")(spark, sfDir).collect()
    val tf = graft.Tables.load(spark, sfDir, "documents")
      .select(explode(split(trim(col("text")), "\\s+")).as("t"))
      .groupBy("t").agg(count(lit(1)).as("n"))
      .collect().map(_.getLong(1))
    assert(got.map(_.getLong(1)).sum == tf.length) // Σ n_terms = |vocab|
    assert(got.map(_.getLong(2)).sum == tf.sum) // Σ n·cf = token count
    val bands = got.map(_.getInt(0)).toSeq
    assert(bands == bands.sorted && bands.head == 0)
    val top = tf.max
    val b0 = got.find(_.getInt(0) == 0).get
    assert(b0.getLong(3) == top) // band 0 holds the max frequency
    assert(b0.getLong(1) == tf.count(_ == top)) // = the whole tie class
    got.foreach(r => assert(r.getLong(4) <= r.getLong(3)))
  }

  // ------------------------------------------------------------ q19i
  test("q19i bootstrap: 32 replicas per flag, a proper interval " +
      "(lo < hi) that brackets the point estimate at this sample size") {
    val got = Relational.queries("q19i_bootstrap")(spark, sfDir).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val (est, lo, hi) = (r.getDouble(1), r.getDouble(2), r.getDouble(3))
      assert(r.getLong(4) == 32L)
      assert(lo < hi)
      // not a theorem for arbitrary data, but at thousands of rows per
      // flag a p10-p90 replica interval missing the mean would mean the
      // derandomized multiplicities are biased — the regression this
      // test exists to catch
      assert(lo <= est && est <= hi)
    }
  }

  // --------------------------------------------------------- q23_mmr
  test("mmrOf: diversification re-ranks — a near-duplicate of pick 1 " +
      "loses pick 2 to a less-relevant but diverse candidate, and all " +
      "three picks match a brute-force greedy recompute") {
    import graft.queries.SimilarityOps.{normExpr, toDoubleVec}
    // query 0 = x-axis; candidates: 10 at cos 0.90 to q; 11 at cos
    // 0.89 but nearly PARALLEL to 10 (cos(11,10) ~ 0.9997); 12 at cos
    // 0.85 on the other side (cos(12,10) ~ 0.535). Plain top-k ranks
    // 10, 11, 12; MMR(2/3) scores pick 2 as 2*rel - cos-to-pick1:
    // 11 -> 0.780, 12 -> 1.165 — the diverse candidate wins.
    val emb = Seq(
      (0L, Seq(1f, 0f, 0f)),
      (10L, Seq(0.9f, 0.43589f, 0f)),
      (11L, Seq(0.89f, 0.45596f, 0f)),
      (12L, Seq(0.85f, -0.52678f, 0f)))
      .toDF("vec_id", "embedding")
    val e = emb.select(col("vec_id"),
        toDoubleVec(col("embedding")).as("v"))
      .withColumn("nrm", normExpr(col("v")))
    val got = SimilarityOps.mmrOf(e)
      .filter(col("q_id") === 0L)
      .orderBy("pick").collect()
      .map(r => (r.getInt(1), r.getLong(2))).toSeq
    assert(got.map(_._2) == Seq(10L, 12L, 11L)) // NOT rel order 10,11,12
    // brute-force the same greedy rule as ground truth
    val vecs = Map(
      10L -> Seq(0.9, 0.43589, 0.0),
      11L -> Seq(0.89, 0.45596, 0.0),
      12L -> Seq(0.85, -0.52678, 0.0))
    def dot(a: Seq[Double], b: Seq[Double]) =
      a.zip(b).map { case (x, y) => x * y }.sum
    def cos(a: Seq[Double], b: Seq[Double]) =
      dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))
    val qv = Seq(1.0, 0.0, 0.0)
    var selected = Seq.empty[Long]
    var remaining = vecs.keySet
    for (_ <- 1 to 3) {
      val next = remaining.toSeq.map { id =>
        val rel = cos(qv, vecs(id))
        val div = if (selected.isEmpty) 0.0
          else selected.map(sl => cos(vecs(id), vecs(sl))).max
        (id, 2.0 * rel - div)
      }.maxBy { case (id, sc) => (sc, -id) }._1
      selected :+= next
      remaining -= next
    }
    assert(got.map(_._2) == selected)
  }

  // ------------------------------------------------------------ q41b
  test("labelProp: on a star the hub and leaves swap labels each " +
      "synchronous round (hub takes the smallest leaf label on the " +
      "3-way tie); isolated nodes never move") {
    val nodes = Seq(1L, 2L, 3L, 4L, 5L).toDF("node")
    val canon = Seq((1L, 2L), (1L, 3L), (1L, 4L)).toDF("a", "b")
    val und = canon.select(col("a").as("src"), col("b").as("dst"))
      .unionAll(canon.select(col("b").as("src"), col("a").as("dst")))
    def labelsAfter(iters: Int) =
      GraphOps.labelProp(nodes, und, iters).orderBy("node")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    // round 1: hub sees {2,3,4} once each -> tie -> 2; leaves see {1}
    assert(labelsAfter(1) ==
      Seq((1L, 2L), (2L, 1L), (3L, 1L), (4L, 1L), (5L, 5L)))
    // round 2: hub sees {1,1,1} -> 1; leaves see {2}
    assert(labelsAfter(2) ==
      Seq((1L, 1L), (2L, 2L), (3L, 2L), (4L, 2L), (5L, 5L)))
  }

  test("labelProp: triangle tie-break is (votes DESC, label ASC) — " +
      "node 1 adopts 2, the others adopt 1") {
    val nodes = Seq(1L, 2L, 3L).toDF("node")
    val canon = Seq((1L, 2L), (1L, 3L), (2L, 3L)).toDF("a", "b")
    val und = canon.select(col("a").as("src"), col("b").as("dst"))
      .unionAll(canon.select(col("b").as("src"), col("a").as("dst")))
    val got = GraphOps.labelProp(nodes, und, 1).orderBy("node")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == Seq((1L, 2L), (2L, 1L), (3L, 1L)))
  }

  // ------------------------------------------------------------ q35c
  test("q35c: every reported day clears |z| > 2, and the adjusted " +
      "series recomputes from the q34d seasonal index (n*1000 div " +
      "max(idx, 1))") {
    val idx = FunnelOps.queries("q34d_seasonal")(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(5)).toMap
    val got = FunnelOps.queries("q35c_seasonal_anomaly")(spark, sfDir)
      .collect()
    got.foreach { r =>
      val (tpe, day, n, adj) =
        (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))
      assert(math.abs(r.getDouble(5)) > 2.0)
      assert(adj == n * 1000L / math.max(idx((tpe, day % 7)), 1L))
    }
  }

  // ------------------------------------------------------------ q36d
  test("q36d inclusion: every branch reports its child key count from " +
      "the actual table, is_fk <=> total inclusion, ppm is floor — and " +
      "the known-true FKs come back total") {
    val got = Relational.queries("q36d_inclusion")(spark, sfDir).collect()
    assert(got.length == 7)
    got.foreach { r =>
      val (nc, nm) = (r.getLong(2), r.getLong(3))
      assert(nm <= nc)
      assert(r.getLong(4) == nm * 1000000L / nc)
      assert(r.getBoolean(5) == (nm == nc))
    }
    // the four canonical star-schema FKs must be total at any SF
    val fks = Set("lineitem.l_orderkey", "lineitem.l_partkey",
      "lineitem.l_suppkey", "orders.o_custkey")
    got.filter(r => fks(r.getString(0)))
      .foreach(r => assert(r.getBoolean(5), r.getString(0)))
  }

  // ----------------------------------------------------------- cdc15
  test("cdc15_lag: one row per (table, kind) incl. monitored-only " +
      "tables, event counts partition the replay's DML, and every lag " +
      "is positive (the head is a commit line)") {
    val got = CdcOps.queries("cdc15_lag")(spark, sfDir).collect()
    val orders = graft.Tables.load(spark, sfDir, "orders").count()
    assert(got.length == 9) // 3 tables x 3 kinds
    assert(got.map(_.getString(0)).toSet ==
      Set("orders", "audit_log", "pg_temp_refresh"))
    assert(got.map(_.getLong(2)).sum == orders) // one DML per order
    got.foreach(r => assert(r.getLong(4) >= 1L)) // head = 4*kmax+3 > any dml
  }

  // -------------------------------------------------------------- s12
  test("s12 attribution twin: the streaming fold's channel totals equal " +
      "the batch q29c window on the real corpus") {
    val twin = WindowedOps.queries("s12_attribution")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val batch = FunnelOps.queries("q29c_attribution")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(twin.toSeq == batch.toSeq)
  }

  // ------------------------------------------------------------- q36c
  test("q36c_anonymity: classes partition the table (sizes sum to the " +
      "row count), at_risk <=> size < 5, share is floor ppm") {
    val got = Relational.queries("q36c_anonymity")(spark, sfDir).collect()
    val total = graft.Tables.load(spark, sfDir, "customer").count()
    assert(got.map(_.getLong(2)).sum == total)
    got.foreach { r =>
      val size = r.getLong(2)
      assert(r.getBoolean(3) == (size < 5))
      assert(r.getLong(4) == size * 1000000L / total)
    }
    assert(got.length > 1)
  }
}
