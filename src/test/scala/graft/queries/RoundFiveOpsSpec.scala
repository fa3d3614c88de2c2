package graft.queries

import graft.SparkSpec

/** Independent-reimplementation checks for the round-5 operators: each
  * query's answer at sf0.001 is recomputed with plain Scala collections
  * from the same parquet rows — an oracle independent of BOTH Spark and
  * DuckDB, so a dialect quirk shared by the two engines can't hide a
  * semantic bug. Inputs here are fixture-sized (≤6k rows), so the brute
  * force is exact and fast. */
class RoundFiveOpsSpec extends SparkSpec {

  import org.apache.spark.sql.Row

  private def rows(name: String): Seq[Row] =
    graft.SparkEntry.queries(name)(spark, sfDir).collect().toSeq

  // ------------------------------------------------------------- q18b
  test("q18b business days equal a java.time weekday walk") {
    import java.time.LocalDate
    import java.time.temporal.ChronoUnit
    val li = graft.Tables.load(spark, sfDir, "lineitem")
      .selectExpr("l_orderkey", "CAST(l_shipdate AS DATE)").collect()
      .map(r => r.getLong(0) -> r.getAs[java.sql.Date](1).toLocalDate)
    val ord = graft.Tables.load(spark, sfDir, "orders")
      .selectExpr("o_orderkey", "CAST(o_orderdate AS DATE)",
        "o_orderpriority").collect()
      .map(r => r.getLong(0) ->
        (r.getAs[java.sql.Date](1).toLocalDate, r.getString(2)))
      .toMap
    def bizDays(d1: LocalDate, d2: LocalDate): Long =
      // weekdays in (d1, d2]: walk is fine at fixture scale
      Iterator.iterate(d1.plusDays(1))(_.plusDays(1))
        .take(ChronoUnit.DAYS.between(d1, d2).toInt)
        .count(d => d.getDayOfWeek.getValue <= 5).toLong
    val expected = li.flatMap { case (ok, ship) =>
      ord.get(ok).collect { case (od, prio) if !ship.isBefore(od) =>
        (prio, bizDays(od, ship))
      }
    }.groupBy(_._1).map { case (prio, xs) =>
      val bds = xs.map(_._2)
      (prio, (bds.size.toLong, bds.sum, bds.max,
        bds.sum * 1000 / bds.size, bds.count(_ > 60).toLong))
    }
    val got = rows("q18b_businessdays").map(r =>
      r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))).toMap
    assert(got == expected)
  }

  // ------------------------------------------------------------- q19j
  test("q19j Theil-Sen slope equals the brute-force pair median and " +
      "shrugs off what drags the mean slope") {
    val li = graft.Tables.load(spark, sfDir, "lineitem")
      .select("l_partkey", "l_orderkey", "l_linenumber", "l_extendedprice",
        "l_quantity").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2).toLong,
        math.round(r.getDouble(3) * 100), r.getDouble(4).toLong))
    val expected = li.groupBy(_._1).flatMap { case (pk, xs) =>
      val sorted = xs.sortBy(t => (t._2, t._3))
      val slopes = (for {
        i <- sorted.indices; j <- (i + 1) until sorted.size
        a = sorted(i); b = sorted(j)
        // lineitem has no unique key: rows sharing (orderkey, linenumber)
        // are indistinguishable, and the operator's strict (ok, ln) order
        // deliberately pairs each such clique zero times
        if (a._2, a._3) != (b._2, b._3)
        if a._5 != b._5
      } yield (b._4 - a._4).toDouble / (b._5 - a._5).toDouble).sorted
      if (slopes.isEmpty) None
      else {
        val n = slopes.size
        val med2 = slopes((n + 1) / 2 - 1) + slopes((n + 2) / 2 - 1)
        Some(pk -> ((n.toLong, med2)))
      }
    }
    val got = rows("q19j_theilsen")
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got == expected)
  }

  // ------------------------------------------------------------- q35d
  test("q35d MAD medians and outlier counts equal a sorted brute force") {
    val ev = graft.Tables.events(spark, sfDir)
      .selectExpr("event_type", "CAST(round(value * 1000000) AS BIGINT)")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    def med2(xs: Seq[Long]): Long = {
      val s = xs.sorted; val n = s.size
      s((n + 1) / 2 - 1) + s((n + 2) / 2 - 1)
    }
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

  // ------------------------------------------------------------- q41d
  test("q41d k-core equals a sequential Matula-Beck peel of the same " +
      "pair graph") {
    val pairs = IndexOps.pairCounts(
      graft.Tables.load(spark, sfDir, "lineitem")
        .selectExpr("l_orderkey AS basket", "l_partkey AS item"),
      minSupport = 2).select("a", "b").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val adj = scala.collection.mutable.Map
      .empty[Long, scala.collection.mutable.Set[Long]]
    for ((a, b) <- pairs) {
      adj.getOrElseUpdate(a, scala.collection.mutable.Set.empty) += b
      adj.getOrElseUpdate(b, scala.collection.mutable.Set.empty) += a
    }
    var alive = adj.keySet.toSet
    var changed = true
    while (changed) {
      val drop = alive.filter(n => adj(n).count(alive) < 2)
      changed = drop.nonEmpty
      alive = alive -- drop
    }
    val expected = alive.map(n => n -> adj(n).count(alive).toLong).toMap
    val got = rows("q41d_kcore")
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expected)
  }

  // ------------------------------------------------------------- q34g
  test("q34g TWAP equals the hold-until-next-event integral") {
    val ev = graft.Tables.events(spark, sfDir)
      .selectExpr("user_id", "event_id", "ts_us",
        "CAST(round(value * 1000) AS BIGINT)")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val expected = ev.groupBy(_._1).map { case (u, xs) =>
      val s = xs.sortBy(t => (t._3, t._2))
      val ws = s.zip(s.tail).map { case (a, b) => ((b._3 - a._3) / 1000, a._4) }
      // a single-event user has NO holding intervals: the query's sum
      // over zero weight rows is NULL (not 0), and twap is NULL too —
      // mirror that contract instead of defaulting to 0
      val sumW = if (ws.isEmpty) None else Some(ws.map(_._1).sum)
      val sumWV = ws.map { case (w, v) => BigInt(w) * v }.sum
      val twap = if (sumW.exists(_ > 0))
        Some(sumWV.toDouble / sumW.get.toDouble) else None
      (u, (s.size.toLong, sumW, twap))
    }
    val got = rows("q34g_twap").map { r =>
      val sumW = if (r.isNullAt(2)) None else Some(r.getLong(2))
      val twap = if (r.isNullAt(3)) None else Some(r.getDouble(3))
      r.getLong(0) -> ((r.getLong(1), sumW, twap))
    }.toMap
    assert(got == expected)
  }

  // ------------------------------------------------------------- q34h
  test("q34h OHLC bars equal first/max/min/last over the tick order") {
    val ev = graft.Tables.events(spark, sfDir)
      .selectExpr("event_type", "ts_us div 86400000000", "ts_us",
        "event_id", "CAST(round(value * 1000) AS BIGINT)")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    val expected = ev.groupBy(t => (t._1, t._2)).map { case (k, xs) =>
      val s = xs.sortBy(t => (t._3, t._4))
      (k, (s.head._5, s.map(_._5).max, s.map(_._5).min, s.last._5,
        s.size.toLong))
    }
    val got = rows("q34h_ohlc").map(r =>
      (r.getString(0), r.getLong(1)) -> ((r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))).toMap
    assert(got == expected)
  }

  // ------------------------------------------------------------- q14g
  test("q14g Pareto vital-few counts equal a sorted cumulative walk") {
    val rev = graft.Tables.load(spark, sfDir, "customer")
      .join(graft.Tables.load(spark, sfDir, "orders"),
        org.apache.spark.sql.functions.expr("o_custkey = c_custkey"))
      .selectExpr("CAST(c_nationkey AS BIGINT)", "CAST(c_custkey AS BIGINT)",
        "CAST(round(o_totalprice * 100) AS BIGINT)")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val expected = rev.groupBy(_._1).map { case (nk, xs) =>
      val perCust = xs.groupBy(_._2).map { case (ck, ys) =>
        (ck, ys.map(_._3).sum) }.toSeq
        .sortBy { case (ck, cents) => (-cents, ck) }
      val total = perCust.map(_._2).sum
      val cums = perCust.scanLeft(0L)(_ + _._2).init // cum BEFORE each
      val vital = cums.count(c => c * 5 < total * 4).toLong
      (nk, (perCust.size.toLong, total, vital,
        perCust.head._2 * 1000000 / total))
    }
    // nk is INT in the parquet schema (the oracle compares it as such)
    val got = rows("q14g_pareto").map(r => r.getInt(0).toLong ->
      ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got == expected)
  }

  // ------------------------------------------------------------- q29f
  test("q29f Markov transitions equal the consecutive-pair count over " +
      "each user's (ts, event_id) order") {
    val ev = graft.Tables.events(spark, sfDir)
      .selectExpr("user_id", "ts_us", "event_id", "event_type").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val pairs = ev.groupBy(_._1).values.flatMap { xs =>
      val s = xs.toSeq.sortBy(t => (t._2, t._3)).map(_._4)
      s.zip(s.tail)
    }.toSeq
    val counts = pairs.groupBy(identity)
      .map { case (k, v) => k -> v.size.toLong }
    val srcTot = pairs.groupBy(_._1).map { case (k, v) => k -> v.size.toLong }
    val expected = counts.map { case ((a, b), n) =>
      (a, b) -> ((n, n * 1000000 / srcTot(a))) }
    val got = rows("q29f_markov").map(r => (r.getString(0), r.getString(1))
      -> ((r.getLong(2), r.getLong(3)))).toMap
    assert(got == expected)
  }

  // ------------------------------------------------------------- q29g
  test("q29g sequential co-occurrence equals a per-session first/last " +
      "scan with 30-minute gap splits") {
    val ev = graft.Tables.events(spark, sfDir)
      .selectExpr("user_id", "ts_us", "event_id", "event_type").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val pairCount = scala.collection.mutable.Map.empty[(String, String), Long]
    for (xs <- ev.groupBy(_._1).values) {
      val s = xs.toSeq.sortBy(t => (t._2, t._3))
      // split into sessions on >30min gaps
      val sessions = s.tail.foldLeft(Vector(Vector(s.head))) { (acc, e) =>
        if (e._2 - acc.last.last._2 > 1800000000L) acc :+ Vector(e)
        else acc.init :+ (acc.last :+ e)
      }
      for (sess <- sessions) {
        val byType = sess.groupBy(_._4)
          .map { case (t, es) => (t, es.map(_._2).min, es.map(_._2).max) }
        for ((a, fa, _) <- byType; (b, _, lb) <- byType
             if a != b && fa < lb)
          pairCount((a, b)) = pairCount.getOrElse((a, b), 0L) + 1
      }
    }
    val got = rows("q29g_seq").map(r => (r.getString(0), r.getString(1))
      -> r.getLong(2)).toMap
    assert(got == pairCount.toMap)
  }

  // ------------------------------------------------------------- q36f
  test("q36f g3 equals the rows-minus-majority count per candidate") {
    val expected = Relational.q36fCands.map { case (tb, a, b) =>
      val xs = graft.Tables.load(spark, sfDir, tb)
        .selectExpr(s"CAST($a AS STRING)", s"CAST($b AS STRING)").collect()
        .map(r => (r.getString(0), r.getString(1)))
      val byA = xs.groupBy(_._1)
      val n = xs.length.toLong
      val keep = byA.values.map(g =>
        g.groupBy(_._2).values.map(_.size).max.toLong).sum
      (s"$tb.$a->$tb.$b", (byA.size.toLong,
        byA.values.count(g => g.map(_._2).distinct.size > 1).toLong,
        n - keep, (n - keep) * 1000000 / n))
    }.toMap
    val got = rows("q36f_fd").map(r => r.getString(0) ->
      ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got == expected)
  }

  // ------------------------------------------------------------- q36g
  test("q36g Gini equals the histogram formula") {
    val expected = Relational.q36gCols.map { case (tb, c) =>
      val vs = graft.Tables.load(spark, sfDir, tb)
        .selectExpr(s"CAST($c AS STRING)").collect().map(_.getString(0))
      val h = vs.groupBy(identity).map(_._2.size.toLong)
      val n = vs.length.toDouble
      val gini = math.floor(
        (1.0 - h.map(c => BigDecimal(c) * c).sum.toDouble / (n * n))
          * 1000000).toLong
      (s"$tb.$c", (vs.length.toLong, h.size.toLong, gini))
    }.toMap
    val got = rows("q36g_gini").map(r => r.getString(0) ->
      ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got == expected)
  }

  // ------------------------------------------------------------- q19k
  test("q19k Mann-Whitney U equals midrank brute force and satisfies " +
      "U1 + U2 = 2*n1*n2") {
    val ev = graft.Tables.events(spark, sfDir)
      .selectExpr("event_type", "CAST(round(value * 1000000) AS BIGINT)")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    def u2x(a: String, b: String): (Long, Long, Long, Long) = {
      val pool = ev.filter(t => t._1 == a || t._1 == b)
      val sorted = pool.map(_._2).sorted
      // doubled midrank of value v = 2*(#below) + (#equal) + 1
      val below = sorted.zipWithIndex.groupBy(_._1)
        .map { case (v, xs) => v -> (2L * xs.map(_._2).min + xs.size) }
      val r1x2 = pool.filter(_._1 == a).map(t => below(t._2) + 1).sum
      val r2x2 = pool.filter(_._1 == b).map(t => below(t._2) + 1).sum
      val (n1, n2) = (pool.count(_._1 == a).toLong,
        pool.count(_._1 == b).toLong)
      (n1, n2, r1x2 - n1 * (n1 + 1), r2x2 - n2 * (n2 + 1))
    }
    val expected = Relational.q19kPairs
      .map { case (a, b) => s"$a vs $b" -> u2x(a, b) }.toMap
    val got = rows("q19k_mannwhitney").map(r => r.getString(0) ->
      ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got == expected)
    got.values.foreach { case (n1, n2, u1, u2) =>
      assert(u1 + u2 == 2 * n1 * n2, "rank-sum identity broken")
    }
  }

  // ------------------------------------------------------------- q19l
  test("q19l KS statistic equals the step-function max gap") {
    val ev = graft.Tables.events(spark, sfDir)
      .selectExpr("event_type", "CAST(round(value * 1000000) AS BIGINT)")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val expected = Relational.q19kPairs.map { case (a, b) =>
      val va = ev.filter(_._1 == a).map(_._2)
      val vb = ev.filter(_._1 == b).map(_._2)
      val (n1, n2) = (va.length.toLong, vb.length.toLong)
      val grid = (va ++ vb).distinct
      val gap = grid.map(v =>
        math.abs(va.count(_ <= v) * n2 - vb.count(_ <= v) * n1)).max
      val d = math.floor(gap.toDouble * 1000000 /
        (n1.toDouble * n2.toDouble)).toLong
      s"$a vs $b" -> ((n1, n2, d))
    }.toMap
    val got = rows("q19l_ks").map(r => r.getString(0) ->
      ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got == expected)
  }

  // ------------------------------------------------------------- q43c
  test("q43c phrase counts equal a token-adjacency scan") {
    val texts = graft.Tables.load(spark, sfDir, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).trim.split("\\s+").toSeq)
    val expected = IndexOps.q43cPhrases.flatMap { case (w1, w2) =>
      val perDoc = texts.map { case (id, tk) =>
        id -> tk.zip(tk.tail).count(p => p._1 == w1 && p._2 == w2)
      }.filter(_._2 > 0)
      if (perDoc.isEmpty) None
      else Some(s"$w1 $w2" -> ((perDoc.size.toLong,
        perDoc.map(_._2).sum.toLong, perDoc.map(_._2).max.toLong)))
    }.toMap
    val got = rows("q43c_phrase").map(r => r.getString(0) ->
      ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got == expected)
  }

  // ------------------------------------------------------------- q44b
  test("q44b clustering coefficient equals adjacency-set counting") {
    val nCust = graft.Tables.load(spark, sfDir, "customer").count()
    val edges = graft.Tables.load(spark, sfDir, "orders")
      .selectExpr("o_custkey AS src",
        s"(o_orderkey * 2654435761) % 4294967296 % $nCust + 1 AS dst")
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
      .filter { case (a, b) => a != b }
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }.distinct
    val adj = scala.collection.mutable.Map
      .empty[Long, Set[Long]].withDefaultValue(Set.empty)
    for ((a, b) <- edges) { adj(a) += b; adj(b) += a }
    val expected = adj.collect { case (n, nb) if nb.size >= 2 =>
      val deg = nb.size.toLong
      val pairs = nb.toSeq.sorted
      val tri = (for {
        i <- pairs.indices; j <- (i + 1) until pairs.size
        if adj(pairs(i)).contains(pairs(j))
      } yield 1).size.toLong
      n -> ((deg, tri, 2 * tri * 1000000 / (deg * (deg - 1))))
    }.toMap
    val got = rows("q44b_clustering").map(r => r.getLong(0) ->
      ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got == expected)
  }

  // --------------------------------------------------- q24_collocations
  test("q24_collocations lift ranking equals the brute-force ppm grid") {
    val texts = graft.Tables.load(spark, sfDir, "documents")
      .select("text").collect().map(_.getString(0))
    val toks = texts.map(_.trim.split("\\s+").toSeq)
    val bigrams = toks.flatMap(t => t.zip(t.tail))
    val nXY = bigrams.groupBy(identity).map { case (k, v) => k -> v.size }
    val uni = toks.flatten.groupBy(identity).map { case (k, v) => k -> v.size }
    val nBig = bigrams.size.toLong
    val lifts = nXY.collect { case ((x, y), nxy) if nxy >= 5 =>
      val l = (nxy.toLong * 1000000L / uni(x)) * nBig / uni(y)
      (x, y, nxy.toLong, uni(x).toLong, uni(y).toLong, l)
    }.toSeq.sortBy(t => (-t._6, t._1, t._2)).take(20)
    val got = rows("q24_collocations").map(r => (r.getString(0),
      r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4),
      r.getLong(5)))
    assert(got == lifts)
  }
}
