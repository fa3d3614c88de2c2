package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Q27 corpus-curation operators: brute-force ground truth on the tiny
  * corpus + the plan-shape properties the 100 TB design depends on. */
class CurationOpsSpec extends SparkSpec {

  test("PrefixSum matches a single-window running sum (keyed + keyless)") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    // seqs deliberately sparse + shuffled so bucket boundaries are hit
    val rows = rnd.shuffle((0 until 5000).toList).map { i =>
      (i.toLong * 37, if (i % 3 == 0) "a" else "b", rnd.nextInt(50).toLong)
    }
    val df = rows.toDF("seq", "k", "v")
    // tiny buckets force many cross-bucket carries
    val got = PrefixSum.exclusiveRunningSum(df, "v", "ps",
        seqCol = "seq", keys = Seq("k"), bucketSize = 64)
      .select("seq", "k", "ps")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("k").orderBy("seq")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val want = df.withColumn("ps", coalesce(sum("v").over(w), lit(0L)))
      .select("seq", "k", "ps")
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)

    val gotG = PrefixSum.exclusiveRunningSum(df, "v", "ps",
        seqCol = "seq", bucketSize = 64)
      .select("seq", "ps")
    val wg = org.apache.spark.sql.expressions.Window.orderBy("seq")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val wantG = df.withColumn("ps", coalesce(sum("v").over(wg), lit(0L)))
      .select("seq", "ps")
    assert(gotG.exceptAll(wantG).isEmpty && wantG.exceptAll(gotG).isEmpty)
  }

  test("PrefixSum: a null seq row neither crashes the keyless scan nor " +
      "leaks into real buckets (position-less, per the BucketedScan " +
      "contract)") {
    import spark.implicits._
    val df = Seq((Some(0L), 10L), (None, 100L), (Some(70L), 1L))
      .toDF("seq", "v")
    val got = PrefixSum.exclusiveRunningSum(df, "v", "ps",
        seqCol = "seq", bucketSize = 64)
      .collect().map(r => (if (r.isNullAt(0)) -1L else r.getLong(0),
        r.getLong(2))).toMap
    // null row: position-less — no cross-bucket carry received (its
    // bucket never equi-joins back) or contributed; null seqs are
    // range-frame PEERS locally, so it keeps its own peer-group sum;
    // seq 0: first real bucket, carry 0; seq 70: next bucket, carry 10
    assert(got == Map(-1L -> 100L, 0L -> 0L, 70L -> 10L))
  }

  test("PrefixSum: duplicate seq values share the same strictly-smaller " +
      "sum, deterministically") {
    import spark.implicits._
    // 3 rows at seq=10 (values 1,2,4), 2 at seq=200 (values 8,16)
    val df = Seq((10L, 1L), (10L, 2L), (10L, 4L), (200L, 8L), (200L, 16L))
      .toDF("seq", "v")
    val got = PrefixSum.exclusiveRunningSum(df, "v", "ps", bucketSize = 64)
      .select("seq", "v", "ps").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set((10L, 1L, 0L), (10L, 2L, 0L), (10L, 4L, 0L),
      (200L, 8L, 7L), (200L, 16L, 7L)))
  }

  test("decontaminate: flagged docs truly share a 3-gram with the bench " +
      "slice, clean docs truly don't") {
    val sh = DedupOps.shingleSets(spark, sfDir)
      .withColumn("is_bench", SampleOps.bucketOf("doc_id") % 100 >= 95)
    val rows = sh.collect().map(r => (r.getLong(0),
      r.getSeq[Long](1).toSet, r.getBoolean(2))).toSeq
    val benchGrams = rows.filter(_._3).flatMap(_._2).toSet
    assert(benchGrams.nonEmpty, "fixture must produce a non-empty bench slice")
    val want = rows.filterNot(_._3)
      .map { case (id, s, _) => id -> (s & benchGrams).size }
      .filter(_._2 > 0).toMap
    val got = CurationOps.q27_decontaminate(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getLong(1).toInt).toMap
    assert(got == want)
  }

  test("decontaminate broadcasts the benchmark gram set") {
    val plan = CurationOps.q27_decontaminate(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"benchmark side must broadcast, plan was:\n$plan")
  }

  test("bloom decontaminate ≡ exact decontaminate, with the probe in " +
      "the plan before the verify join") {
    val exact = CurationOps.q27_decontaminate(spark, sfDir)
    val bloom = CurationOps.q27b_decontam_bloom(spark, sfDir)
    assert(bloom.exceptAll(exact).isEmpty && exact.exceptAll(bloom).isEmpty,
      "the verify join must remove every Bloom false positive")
    val plan = bloom.queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"),
      "the Bloom membership probe must gate the corpus side map-side")
  }

  test("repetition: brute-force ground truth on the corpus") {
    val docs = graft.Tables.load(spark, sfDir, "documents")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val want = docs.map { case (id, text) =>
      val tk = text.trim.split("\\s+").toSeq
      val g2 = tk.sliding(2).filter(_.size == 2).map(_.mkString(" ")).toSeq
      val topN = tk.groupBy(identity).map(_._2.size).max.toLong
      val ok = topN * 10 <= tk.size &&
        (g2.size - g2.distinct.size) * 5 <= g2.size
      id -> ((tk.size.toLong, topN, g2.size.toLong,
        g2.distinct.size.toLong, ok))
    }.toMap
    val got = CurationOps.q27_repetition(spark, sfDir).collect().map { r =>
      r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getBoolean(5)))
    }.toMap
    assert(got == want)
  }

  test("shuffle: pos is a permutation equal to the (h, doc_id) rank") {
    val out = CurationOps.q27_shuffle(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val n = out.length
    assert(out.map(_._3).sorted.toSeq == (0L until n).toSeq,
      "positions must be a permutation of 0..n-1")
    val want = out.sortBy(t => (t._2, t._1)).zipWithIndex
      .map { case ((id, _, _), i) => id -> i.toLong }.toMap
    assert(out.forall { case (id, _, pos) => want(id) == pos })
  }

  test("redact: no email/phone/IP survives, placeholders land, and the " +
      "counts match the salt construction") {
    val out = CurationOps.q27_redact(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(1),
        r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(out.nonEmpty)
    for ((id, text, nEmail, nPhone, nIp) <- out) {
      assert(!text.contains("@"), s"doc $id leaked an email")
      assert(!text.matches(".*\\+[0-9]{1,3}-[0-9]{3}-[0-9]{4}.*"),
        s"doc $id leaked a phone number")
      assert(!text.matches(
        ".*\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b.*"),
        s"doc $id leaked an IP")
      assert(text.contains("<EMAIL>") && text.contains("<PHONE>") &&
        text.contains("<IP>"), s"doc $id missing a placeholder")
      assert(nEmail == (if (id % 3 == 0) 2L else 1L), s"doc $id email count")
      assert(nPhone == 1L && nIp == 1L, s"doc $id phone/ip count")
    }
  }

  test("chunk: stride-de-overlapped chunks reconstruct every document " +
      "and neighbors overlap by window - stride tokens") {
    val chunks = CurationOps.q27_chunk(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).trim.split("\\s+").toSeq)
      .toMap
    assert(chunks.keySet == docs.keySet)
    for ((id, cs) <- chunks) {
      assert(cs.map(_._2).toSeq == cs.indices.map(_.toLong),
        s"doc $id chunk indices must be dense")
      // first 48 tokens of each chunk (all of the last) rebuild the doc
      val rebuilt = cs.map(_._4.split(" ").toSeq).zipWithIndex.flatMap {
        case (tk, i) => if (i == cs.size - 1) tk else tk.take(48)
      }
      assert(rebuilt.toSeq == docs(id), s"doc $id does not reconstruct")
      // every kept chunk must contribute tokens: a tail wholly inside
      // the previous window is dropped, not emitted
      if (cs.size > 1)
        assert(cs.last._3 > 16, s"doc $id emitted a fully-contained tail")
      for (Array((_, _, _, a), (_, _, _, b)) <- cs.sliding(2))
        assert(a.split(" ").toSeq.drop(48) == b.split(" ").toSeq.take(16),
          s"doc $id neighbor chunks must overlap by 16 tokens")
    }
  }

  test("pack: offsets are the exclusive cumsum in (lang, doc_id) order " +
      "and bins chunk at the budget") {
    val out = CurationOps.q27_pack(spark, sfDir)
      .orderBy("lang", "doc_id").collect()
    val byLang = out.groupBy(_.getString(1))
    for ((_, rows) <- byLang) {
      var cum = 0L
      for (r <- rows) {
        assert(r.getLong(3) == cum, s"offset mismatch at doc ${r.getLong(0)}")
        assert(r.getLong(4) == cum / 2048, "bin must be offset div budget")
        cum += r.getLong(2)
      }
    }
  }

  test("pipeline: quality -> dedup-keep-first -> decontaminate -> pack " +
      "equals the naive four-stage fold") {
    val docs = graft.Tables.load(spark, sfDir, "documents")
      .select("doc_id", "lang", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val toksOf = (t: String) => t.trim.split("\\s+").toSeq
    val gramsOf = (t: String) => toksOf(t).sliding(3)
      .filter(_.length == 3).map(_.mkString(" ")).toSet
    val isBench = (id: Long) =>
      java.lang.Math.floorMod(id * 2654435761L, 4294967296L) % 100 >= 95
    val bg = docs.filter(d => isBench(d._1)).flatMap(d => gramsOf(d._3)).toSet
    val pass = docs.filter { case (id, _, t) =>
      val tk = toksOf(t)
      !isBench(id) && tk.length >= 20 &&
        (tk.length - tk.distinct.length) * 2 < tk.length
    }
    val keepOf = pass.groupBy(d => d._3.trim.replaceAll("\\s+", " "))
      .map { case (_, ds) => ds.map(_._1).min }.toSet
    val clean = pass.filter(d => keepOf(d._1))
      .filter(d => gramsOf(d._3).intersect(bg).isEmpty)
    var want = Set.empty[(Long, String, Long, Long, Long)]
    clean.groupBy(_._2).foreach { case (lang, ds) =>
      var cum = 0L
      ds.sortBy(_._1).foreach { case (id, _, t) =>
        val n = toksOf(t).length.toLong
        want += ((id, lang, n, cum, cum / 2048))
        cum += n
      }
    }
    val got = CurationOps.q27_pipeline(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
      .toSet
    assert(got == want)
    assert(got.nonEmpty, "pipeline must keep some documents")
  }
}
