package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Independent-reimplementation checks for the round-6 hardening work:
  * the q35d/q14g rewrites onto the keyed two-level PrefixSum, the
  * negative-seq regime q14g rides (seq = −cents), and the q36g
  * decimal-before-multiply overflow fix. Brute forces are plain Scala
  * over the same fixture rows — independent of Spark AND DuckDB. */
class RoundSixOpsSpec extends SparkSpec {

  import org.apache.spark.sql.Row

  private def rows(name: String): Seq[Row] =
    graft.SparkEntry.queries(name)(spark, sfDir).collect().toSeq

  /** Doubled exact median: odd n → 2·middle, even n → middle pair sum
    * (the q35d no-division trick). */
  private def med2(xs: Seq[Long]): Long = {
    val s = xs.sorted
    s((s.size - 1) / 2) + s(s.size / 2)
  }

  // ------------------------------------------------------------- q35d
  test("q35d MAD equals a sorted-walk median/MAD on a value column " +
      "that is genuinely high-cardinality (the continuous regime the " +
      "keyed PrefixSum rewrite exists for)") {
    val ev = graft.Tables.events(spark, sfDir)
      .selectExpr("event_type", "CAST(round(value * 1000000) AS BIGINT)")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    // precondition: distinct micro-units ≈ rows — if this ever fails the
    // fixture stopped exercising the skew regime the plan pin guards
    assert(ev.map(_._2).distinct.size > ev.size / 2,
      "events.value no longer behaves as a continuous column")
    val expected = ev.groupBy(_._1).map { case (et, xs) =>
      val vs = xs.map(_._2).toSeq
      val m2 = med2(vs)
      val devs = vs.map(v => math.abs(2 * v - m2))
      val mad4 = med2(devs)
      (et, (vs.size.toLong, m2, mad4,
        devs.count(d => 2 * d > 3 * mad4).toLong))
    }
    val got = rows("q35d_mad").map(r => r.getString(0) ->
      ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got == expected)
  }

  // ------------------------------------------ keyed PrefixSum, seq < 0
  test("keyed exclusiveRunningSum is exact on an all-negative seq axis " +
      "(q14g's seq = -cents regime: `div` truncates toward zero on " +
      "negatives, which must stay order-preserving for buckets)") {
    import spark.implicits._
    val rnd = new scala.util.Random(6)
    val df = Seq.tabulate(5000) { i =>
      val k = i % 3
      // negative, duplicate-heavy, spanning many 64-sized buckets
      (k.toLong, -(rnd.nextInt(20000).toLong + 1), rnd.nextInt(9).toLong)
    }.toDF("k", "seq", "v")
    val got = PrefixSum.exclusiveRunningSum(df, "v", "ps",
        seqCol = "seq", keys = Seq("k"), bucketSize = 64)
      .select("k", "seq", "v", "ps").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val bySeq = got.groupBy(t => (t._1, t._2))
    // brute force: per key, sum of v over STRICTLY smaller seq; rows
    // sharing a seq are peers (same prefix, none of each other's)
    val rowsByKey = got.groupBy(_._1)
    got.foreach { case (k, seq, _, ps) =>
      val want = rowsByKey(k).filter(_._2 < seq).map(_._3).sum
      assert(ps == want, s"key $k seq $seq: got $ps want $want")
      // peers agree
      assert(bySeq((k, seq)).map(_._4).distinct.size == 1)
    }
  }

  // ------------------------------------------------------------- q14g
  test("q14g Pareto: revenue ties across the 80% boundary keep the " +
      "(cents desc, custkey) ROWS contract after the PrefixSum+tie-" +
      "window rewrite") {
    import spark.implicits._
    // synthetic nation: 4 customers, three tied at 100, total 400;
    // threshold 0.8·400 = 320. Walk order ck1,ck2,ck3 (ties by key),
    // cum_before = 0,100,200,300 → vital while cum_before·5 < total·4
    // (i.e. < 320): ck1,ck2,ck3 yes, ck4 no → n_vital80 = 3.
    val r = Seq((1L, 10L, 100L), (1L, 11L, 100L), (1L, 12L, 100L),
      (1L, 13L, 100L)).toDF("nk", "ck", "cents")
      .withColumn("nseq", -col("cents"))
    val wTie = org.apache.spark.sql.expressions.Window
      .partitionBy("nk", "cents").orderBy("ck")
      .rowsBetween(org.apache.spark.sql.expressions.Window
        .unboundedPreceding, -1)
    val cum = PrefixSum.exclusiveRunningSum(r, "cents", "below",
        seqCol = "nseq", keys = Seq("nk"), bucketSize = 64)
      .withColumn("cum_before",
        col("below") + coalesce(sum("cents").over(wTie), lit(0L)))
      .select("ck", "cum_before").collect()
      .map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(cum == Map(10L -> 0L, 11L -> 100L, 12L -> 200L, 13L -> 300L))
  }

  // ------------------------------------------------- PrefixLead.nextSeq
  test("PrefixLead.nextSeq matches a sorted-neighbor walk — keyed and " +
      "keyless, across bucket boundaries, empty buckets, and null seqs") {
    import spark.implicits._
    val rnd = new scala.util.Random(66)
    // sparse distinct seqs (empty buckets at bucketSize=64 guaranteed),
    // 2 keys, plus one null-seq row per key
    val base = (0 until 2).flatMap { k =>
      rnd.shuffle((0 until 3000).toList).take(900)
        .map(i => (k.toLong, Option(i.toLong * 7)))
    } ++ Seq((0L, None), (1L, None))
    val df = base.toDF("k", "seq")
    val got = PrefixLead.nextSeq(df, "nxt",
        seqCol = "seq", keys = Seq("k"), bucketSize = 64)
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getLong(1)),
        if (r.isNullAt(2)) None else Some(r.getLong(2))))
    val byKey = base.groupBy(_._1).map { case (k, xs) =>
      k -> xs.flatMap(_._2).sorted
    }
    got.foreach { case (k, seq, nxt) =>
      val want = seq.flatMap(s => byKey(k).find(_ > s))
      assert(nxt == want, s"key $k seq $seq: got $nxt want $want")
    }
    // keyless path (the negated-bucket keylessCarry branch)
    val one = base.filter(_._1 == 0L).toDF("k", "seq").drop("k")
    val gotG = PrefixLead.nextSeq(one, "nxt", seqCol = "seq",
        bucketSize = 64)
      .collect().map(r => (
        if (r.isNullAt(0)) None else Some(r.getLong(0)),
        if (r.isNullAt(1)) None else Some(r.getLong(1))))
    gotG.foreach { case (seq, nxt) =>
      val want = seq.flatMap(s => byKey(0L).find(_ > s))
      assert(nxt == want, s"keyless seq $seq: got $nxt want $want")
    }
  }

  // ------------------------------------------------------------- q36g
  test("q36g gini: Σcnt² survives per-category counts past the int64 " +
      "wrap point (~3e9 rows) because each factor is DECIMAL before " +
      "the multiply — the formula text under test is the query's own") {
    import spark.implicits._
    // two categories of 3.1e9 and 1e9 rows, pre-collapsed: BIGINT
    // cnt*cnt would wrap (9.61e18 > 2^63) before any outer cast
    val cnts = Seq(3100000000L, 1000000000L)
    val df = cnts.toDF("cnt")
    val gini = df.agg(
      expr("CAST(floor((1.0 - " +
        "CAST(SUM(CAST(cnt AS DECIMAL(19,0)) * " +
        "CAST(cnt AS DECIMAL(19,0))) AS DOUBLE) / " +
        "(CAST(SUM(cnt) AS DOUBLE) * CAST(SUM(cnt) AS DOUBLE))) " +
        "* 1000000) AS BIGINT)").as("gini_ppm"))
      .head().getLong(0)
    val n = cnts.map(BigInt(_)).sum
    val sq = cnts.map(c => BigInt(c) * c).sum
    val want = math.floor(
      (1.0 - sq.toDouble / (n.toDouble * n.toDouble)) * 1000000).toLong
    assert(gini == want && sq > BigInt(Long.MaxValue),
      s"got $gini want $want (sq=$sq)")
  }
}
