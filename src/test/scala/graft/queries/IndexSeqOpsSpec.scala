package graft.queries

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** q42 co-occurrence, q43 inverted index, q29b transitions, q35b CUSUM —
  * the row-local expansions and recurrences pinned on planted inputs the
  * oracle formula can't isolate (it computes the same expression). */
class IndexSeqOpsSpec extends SparkSpec {
  import spark.implicits._

  // ---------------------------------------------------------------- q42
  test("cooccur emits every unordered pair exactly once per basket, " +
      "matching brute force on random baskets") {
    val rnd = new scala.util.Random(7)
    val items = (1 to 40).flatMap { b =>
      val sz = 1 + rnd.nextInt(6)
      Seq.fill(sz)((b.toLong, (1 + rnd.nextInt(9)).toLong))
    }
    val got = IndexOps.cooccur(items.toDF("basket", "item"), 1L)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2)))
      .toMap
    val want = items.distinct.groupBy(_._1).values.flatMap { bs =>
      val ps = bs.map(_._2).distinct.sorted
      for (i <- ps.indices; j <- i + 1 until ps.size) yield (ps(i), ps(j))
    }.groupBy(identity).map { case (k, v) => (k, v.size.toLong) }
    assert(got == want)
  }

  test("cooccur dedups within a basket (a part twice in one order " +
      "counts once) and the support floor drops singleton pairs") {
    val items = Seq((1L, 10L), (1L, 10L), (1L, 20L), (2L, 10L),
      (2L, 20L), (3L, 10L), (3L, 30L)).toDF("basket", "item")
    val all = IndexOps.cooccur(items, 1L).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(all == Set((10L, 20L, 2L), (10L, 30L, 1L)))
    val floored = IndexOps.cooccur(items, 2L).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(floored == Set((10L, 20L, 2L)))
  }

  // ---------------------------------------------------------------- q43
  test("invertedIndex: bigram tf counts repeats, df counts docs, " +
      "one-token and empty docs emit nothing") {
    val docs = Seq(
      (1L, "a b a b"), // bigrams: "a b" ×2, "b a" ×1
      (2L, "a b"), (3L, "solo"), (4L, " ")).toDF("doc_id", "text")
    val out = IndexOps.invertedIndex(docs, k = 8).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2), r.getLong(3),
        r.getLong(4)))
    assert(out.toSet == Set(
      ("a b", 2L, 1, 1L, 2L), ("a b", 2L, 2, 2L, 1L),
      ("b a", 1L, 1, 1L, 1L)))
  }

  test("invertedIndex caps postings at k by (tf DESC, doc_id) and df " +
      "still counts ALL docs, not the kept ones") {
    val docs = (1L to 5L).map(d =>
      (d, Seq.fill(d.toInt)("x y").mkString(" "))).toDF("doc_id", "text")
    // every doc contains "x y" (doc d: d times; joins "y x" between)
    val out = IndexOps.invertedIndex(docs, k = 2)
      .filter(col("term") === "x y").collect()
      .map(r => (r.getLong(1), r.getInt(2), r.getLong(3), r.getLong(4)))
    assert(out.toSeq.sortBy(_._2) ==
      Seq((5L, 1, 5L, 5L), (5L, 2, 4L, 4L))) // df=5 though only 2 kept
  }

  // --------------------------------------------------------------- q29b
  test("q29b transitions: lag pairs are per-user and the micro " +
      "probabilities per prev row-sum to ≤ 10⁶ (floor division)") {
    val out = FunnelOps.q29b_transitions(spark, sfDir).collect()
    assert(out.nonEmpty)
    val byPrev = out.groupBy(_.getString(0))
    byPrev.foreach { case (_, rows) =>
      val tot = rows.map(_.getLong(3)).sum
      assert(tot <= 1000000L && tot > 1000000L - rows.length)
    }
    // n column equals an independent SQL recount
    graft.Tables.registerAll(spark, sfDir)
    val n = spark.sql(
      """SELECT count(*) FROM (
        |  SELECT prev, event_type, count(*) FROM (
        |    SELECT user_id, event_type, lag(event_type) OVER (
        |      PARTITION BY user_id ORDER BY ts, event_id) AS prev
        |    FROM events) WHERE prev IS NOT NULL
        |  GROUP BY prev, event_type)""".stripMargin).head().getLong(0)
    assert(out.length == n)
  }

  // --------------------------------------------------------------- q35b
  test("cusum clamps at zero, accumulates a sustained shift, and " +
      "matches the scalar recurrence on a planted series") {
    // 4 quiet + 8 elevated days: mean 80/12 → mu = 6666666 (floor)
    val series = (0L to 11L).map(d =>
      ("t", d, if (d < 4) 0L else 10L)).toDF("event_type", "day", "n")
    val out = FunnelOps.cusum(series).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getBoolean(3)))
    val mu = 80L * 1000000L / 12L
    var s = 0L
    val want = (0L to 11L).map { d =>
      val x = if (d < 4) 0L else 10L
      s = math.max(0L, s + x * 1000000L - mu)
      (d, s, s > 4L * mu)
    }
    assert(out.toSeq == want)
    // quiet days clamp: first four days sit at 0, never negative
    assert(out.take(4).forall(_._2 == 0L))
    // the shift alarms only once 8 elevated days accumulate past 4μ —
    // 8·3333334 = 26666672 crosses 4μ = 26666664 on the LAST day only
    assert(out.toSeq.map(_._3) ==
      Seq.fill(11)(false) :+ true)
  }

  test("cusum series are independent per type (one type's shift never " +
      "leaks into another's statistic)") {
    val series = ((0L to 3L).map(d => ("a", d, 100L)) ++
      (0L to 3L).map(d => ("b", d, 0L))).toDF("event_type", "day", "n")
    val out = FunnelOps.cusum(series).collect()
    // both series are flat at their own mean → statistic pinned at 0
    assert(out.forall(r => r.getLong(2) == 0L && !r.getBoolean(3)))
  }

  // --------------------------------------------------------------- q42b
  test("frequentTriples == brute-force triple counts on random " +
      "baskets — Apriori pruning never drops a qualifying triple") {
    val rnd = new scala.util.Random(11)
    val baskets = (1L to 40L).map(b =>
      b -> (1 to 2 + rnd.nextInt(5)).map(_ => 1L + rnd.nextInt(12)).toSet)
    val items = baskets.flatMap { case (b, is) => is.map(b -> _) }
      .toDF("basket", "item")
    val expected = baskets.flatMap { case (_, is) =>
      val s = is.toSeq.sorted
      for {
        i <- s.indices; j <- (i + 1) until s.length
        k <- (j + 1) until s.length
      } yield (s(i), s(j), s(k))
    }.groupBy(identity).view.mapValues(_.size.toLong)
      .filter(_._2 >= 2L).toMap
    val got = IndexOps.frequentTriples(items, 2)
      .collect().map(r => ((r.getLong(0), r.getLong(1), r.getLong(2)),
        r.getLong(3))).toMap
    assert(got == expected, "pruned result must equal brute force")
    assert(expected.nonEmpty, "degenerate fixture: no frequent triples")
  }

  // --------------------------------------------------------------- q43b
  test("q43b BM25 semantics on the fixture: scores saturate in tf, " +
      "penalize long docs, and rank by (score DESC, doc_id)") {
    val rows = IndexOps.q43b_bm25(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (term, posting) =>
      val byRank = posting.sortBy(_._2)
      assert(byRank.map(_._2).toSeq == (1 to byRank.length),
        s"$term ranks must be dense from 1")
      // ranking is by score desc then doc_id — verify the invariant
      byRank.sliding(2).foreach {
        case Array(hi, lo) =>
          assert(hi._5 > lo._5 || (hi._5 == lo._5 && hi._3 < lo._3),
            s"$term rank order violated")
        case _ =>
      }
      assert(byRank.length <= 5)
    }
  }

  test("q43b BM25 tf saturation: the micro-unit factor rises with tf " +
      "but is bounded by k1+1 and falls with document length") {
    // the integer formula the operator computes, probed directly
    def tfn(tf: Long, dl: Long, n: Long, s: Long): Long =
      tf * 2200000L * 1000000L /
        (tf * 1000000L + 300000L + 9L * (dl * n * 1000000L / s) / 10L)
    val (n, s) = (100L, 10000L) // avgdl = 100
    assert(tfn(2, 100, n, s) > tfn(1, 100, n, s), "rising in tf")
    assert(tfn(1000, 100, n, s) < 2200000L, "bounded by (k1+1) micro")
    assert(tfn(5, 400, n, s) < tfn(5, 100, n, s), "long docs penalized")
    assert(tfn(1000, 100, n, s) > 2000000L, "saturates NEAR the bound")
  }

  // --------------------------------------------------------------- q29c
  test("q29c attribution semantics on planted sequences: last touch " +
      "wins, no prior touch is 'direct', later touches don't leak back") {
    val ev = Seq(
      // user 1: view → click → purchase(10) → purchase(5): both credit
      // the click (last touch persists until a new one)
      (1L, 1L, "view", 0.0), (1L, 2L, "click", 0.0),
      (1L, 3L, "purchase", 10.0), (1L, 4L, "purchase", 5.0),
      // user 2: purchase with NO prior touch → direct; the view AFTER
      // must not leak backwards
      (2L, 1L, "purchase", 7.0), (2L, 2L, "view", 0.0),
      // user 3: view then purchase at the same ts — event_id orders
      // the view first, so it attributes
      (3L, 5L, "view", 0.0), (3L, 5L, "purchase", 3.0))
      .toDF("user_id", "ts_us", "event_type", "value")
      .withColumn("event_id", col("ts_us") * 10 + col("user_id"))
    val got = FunnelOps.attribution(ev)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      .toSet
    assert(got == Set(("click", 2L, 15.0), ("direct", 1L, 7.0),
      ("view", 1L, 3.0)))
  }
}
