package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.window.WindowExec
import org.apache.spark.sql.functions._

/** Round-7 hardening checks: the KEYED cross-bucket carry in
  * PrefixSum / PrefixLead now recurses over SUPER-buckets (parity with
  * BucketedScan.keylessCarry), PrefixLead is duplicate-safe, and both
  * scans reject non-integral seq columns up front. Brute forces are
  * plain Scala over synthetic frames — independent of Spark's window
  * machinery. */
class RoundSevenOpsSpec extends SparkSpec {

  /** Partition-key name sets of every WindowExec in the plan. */
  private def windowKeySets(df: DataFrame): Seq[Set[String]] = {
    val buf = scala.collection.mutable.Buffer[Set[String]]()
    def walk(p: SparkPlan): Unit = p.foreach {
      case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
      // materialized AQE stages are leaf wrappers — descend explicitly
      case s: QueryStageExec => walk(s.plan)
      case w: WindowExec =>
        buf += w.partitionSpec.flatMap(_.references.map(_.name)).toSet
      case _ =>
    }
    walk(df.queryExecution.executedPlan)
    buf.toSeq
  }

  // --------------------------- keyed PrefixSum super-bucket recursion
  test("keyed exclusiveRunningSum stays exact when the carry is FORCED " +
      "across many super-buckets (tiny bucketSize AND superSize), and " +
      "the plan proves the recursion: the carry windows partition by " +
      "(keys, _sb) / (keys over supers), never by keys over all buckets") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    // 2 keys x ~600 buckets at bucketSize=8 -> ~75 super-buckets at
    // superSize=8: the per-key across-super fold must carry through
    // dozens of supers, including negative seqs (floor-div regime)
    val df = Seq.tabulate(4000) { i =>
      val k = i % 2
      (k.toLong, rnd.nextInt(5000).toLong - 2500, rnd.nextInt(9).toLong)
    }.toDF("k", "seq", "v")
    val out = PrefixSum.exclusiveRunningSum(df, "v", "ps",
      seqCol = "seq", keys = Seq("k"), bucketSize = 8, superSize = 8)
    val got = out.select("k", "seq", "v", "ps").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val byKey = got.groupBy(_._1)
    got.foreach { case (k, seq, _, ps) =>
      val want = byKey(k).filter(_._2 < seq).map(_._3).sum
      assert(ps == want, s"key $k seq $seq: got $ps want $want")
    }
    // structural pin: the keyed carry must ride (k, _sb)-partitioned
    // windows — a plain keys-only window over ALL bucket summaries
    // (the pre-round-7 shape) would show {k} with no _sb anywhere
    val keySets = windowKeySets(out)
    assert(keySets.exists(_ == Set("k", "_sb")),
      s"no (keys, _sb) in-super carry window found: $keySets")
  }

  // -------------------------- keyed PrefixLead super-bucket recursion
  test("keyed PrefixLead.nextSeq stays exact across forced super-bucket " +
      "splits (empty buckets, empty SUPER-buckets, negative seqs) and " +
      "plans the recursive carry windows") {
    import spark.implicits._
    val rnd = new scala.util.Random(77)
    // sparse: ~400 of 6000 possible seqs per key at bucketSize=8 ->
    // plenty of empty buckets AND empty supers at superSize=8
    val base = (0 until 2).flatMap { k =>
      rnd.shuffle((0 until 3000).toList).take(400)
        .map(i => (k.toLong, i.toLong * 2 - 3000))
    }
    val df = base.toDF("k", "seq")
    val out = PrefixLead.nextSeq(df, "nxt",
      seqCol = "seq", keys = Seq("k"), bucketSize = 8, superSize = 8)
    val got = out.collect().map(r => (r.getLong(0), r.getLong(1),
      if (r.isNullAt(2)) None else Some(r.getLong(2))))
    val sortedByKey = base.groupBy(_._1).map { case (k, xs) =>
      k -> xs.map(_._2).sorted
    }
    got.foreach { case (k, seq, nxt) =>
      val want = sortedByKey(k).find(_ > seq)
      assert(nxt == want, s"key $k seq $seq: got $nxt want $want")
    }
    val keySets = windowKeySets(out)
    assert(keySets.exists(_ == Set("k", "_sb")),
      s"no (keys, _sb) in-super lead window found: $keySets")
  }

  // ------------------------------------- PrefixLead duplicate safety
  test("PrefixLead.nextSeq returns the STRICTLY-greater successor even " +
      "with duplicate (keys, seq) rows — a peer's equal seq is never " +
      "handed over (the lead() failure mode the range frame replaces)") {
    import spark.implicits._
    val rnd = new scala.util.Random(777)
    // heavy duplication: 3000 rows over only 150 distinct seqs, so
    // nearly every row has same-seq peers, including at bucket edges
    val base = Seq.tabulate(3000) { i =>
      (i % 2L, rnd.nextInt(150).toLong * 11)
    }
    val df = base.toDF("k", "seq")
    val got = PrefixLead.nextSeq(df, "nxt",
        seqCol = "seq", keys = Seq("k"), bucketSize = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2))))
    val distinctSorted = base.distinct.groupBy(_._1).map { case (k, xs) =>
      k -> xs.map(_._2).sorted
    }
    got.foreach { case (k, seq, nxt) =>
      val want = distinctSorted(k).find(_ > seq)
      assert(nxt == want, s"key $k seq $seq: got $nxt want $want")
      assert(!nxt.contains(seq), s"peer's equal seq returned at $k/$seq")
    }
  }

  // ---------------------------------------------- integral-seq guard
  test("both prefix scans reject a non-integral seq column up front " +
      "(a DOUBLE seq would silently break the strictly-below range " +
      "frames) — and still accept every integral width") {
    import spark.implicits._
    val bad = Seq((1.5, 1L)).toDF("seq", "v")
    val e1 = intercept[IllegalArgumentException] {
      PrefixSum.exclusiveRunningSum(bad, "v", "ps")
    }
    assert(e1.getMessage.contains("integral"))
    val e2 = intercept[IllegalArgumentException] {
      PrefixLead.nextSeq(bad, "nxt")
    }
    assert(e2.getMessage.contains("integral"))
    // int-typed seq still accepted (the guard is about spacing, not
    // requiring BIGINT specifically)
    val ok = Seq((1, 1L), (3, 2L), (3, 5L), (9, 4L)).toDF("seq", "v")
    val ps = PrefixSum.exclusiveRunningSum(ok, "v", "ps", bucketSize = 2)
      .select("seq", "ps").collect().map(r => r.getInt(0) -> r.getLong(1))
      .toMap
    assert(ps == Map(1 -> 0L, 3 -> 1L, 9 -> 8L))
  }
}
