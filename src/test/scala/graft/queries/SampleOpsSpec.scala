package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Q26 sampling operators: brute-force ground truth on the tiny corpus.
  * (Plan-shape properties — map-side predicate, pruned scans — live in
  * PlanShapeSpec.) */
class SampleOpsSpec extends SparkSpec {

  test("reservoir: the hash-priority-minimal 8 docs per language, and " +
      "corpus growth displaces at most the boundary member") {
    val hashOf = (id: Long) =>
      java.lang.Math.floorMod(id * 2654435761L, 4294967296L)
    val docs = spark.read
      .parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("lang")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val want = docs.groupBy(_._2).flatMap { case (lang, ds) =>
      ds.sortBy(d => (hashOf(d._1), d._1)).take(8).zipWithIndex
        .map { case ((id, _), i) => (lang, (i + 1).toLong, id, hashOf(id)) }
        .toSeq
    }.toSet
    val got = SampleOps.q26_reservoir(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got == want)
    // stability: re-running the sample without one NON-member leaves the
    // sample identical — membership depends only on the surviving keys'
    // own hashes, not on corpus composition (what rand() can't give)
    val members = want.map(_._3)
    val nonMember = docs.map(_._1).filterNot(members).head
    val again = docs.filter(_._1 != nonMember).groupBy(_._2)
      .flatMap { case (lang, ds) =>
        ds.sortBy(d => (hashOf(d._1), d._1)).take(8).zipWithIndex
          .map { case ((id, _), i) =>
            (lang, (i + 1).toLong, id, hashOf(id)) }
          .toSeq
      }.toSet
    assert(again == want)
  }

  test("mix: greedy per-source token fill in key-hash order, " +
      "integer budgets") {
    val docs = spark.read
      .parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("source"), trim(col("text")).as("t"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1),
        r.getString(2).split("\\s+").length.toLong))
    val hashOf = (id: Long) =>
      java.lang.Math.floorMod(id * 2654435761L, 4294967296L)
    val want = docs.groupBy(_._2).flatMap { case (src, rows) =>
      // first digit run, matching the query's regexp_extract('[0-9]+')
      val srcn = "[0-9]+".r.findFirstIn(src).get.toLong
      val tot = rows.map(_._3).sum
      val budget = (50 + 2 * srcn) * tot / 100
      var cum = 0L
      rows.toList.sortBy(r => hashOf(r._1)).flatMap { case (id, _, n) =>
        val sel = cum < budget
        val pos = cum
        cum += n
        if (sel) Some((id, src, n, pos)) else None
      }
    }.toSet
    val got = SampleOps.q26_mix(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got == want)
    // the fill must actually downsample: every source's selection is a
    // strict subset at rates < 100%
    val bySrc = got.groupBy(_._2).view.mapValues(_.size).toMap
    val input = docs.groupBy(_._2).view.mapValues(_.size).toMap
    assert(bySrc.exists { case (s, n) => n < input(s) },
      "at least one source must be downsampled")
  }

  test("temperature: sqrt-weighted allocations realized by the " +
      "key-hash fill, all integer-exact") {
    val docs = spark.read
      .parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("source"), trim(col("text")).as("t"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1),
        r.getString(2).split("\\s+").length.toLong))
    val hashOf = (id: Long) =>
      java.lang.Math.floorMod(id * 2654435761L, 4294967296L)
    val totals = docs.groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap
    val weights = totals.view
      .mapValues(t => math.floor(math.sqrt(t.toDouble)).toLong).toMap
    val budget = totals.values.sum / 2
    val sumW = weights.values.sum
    val want = totals.keys.map { src =>
      val alloc = budget * weights(src) / sumW
      var cum = 0L
      var nSel = 0L
      var selToks = 0L
      docs.filter(_._2 == src).sortBy(r => hashOf(r._1)).foreach {
        case (_, _, n) =>
          if (cum < alloc) { nSel += 1; selToks += n }
          cum += n
      }
      (src, totals(src), weights(src), alloc, nSel, selToks)
    }.toSet
    val got = SampleOps.q26_temperature(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
      .toSet
    assert(got == want)
    // temperature flattening: the smallest source's alloc/tokens rate
    // must exceed the largest source's (sqrt upsamples the tail)
    val bySize = want.toSeq.sortBy(_._2)
    val rate = (r: (String, Long, Long, Long, Long, Long)) =>
      r._4.toDouble / r._2
    assert(rate(bySize.head) > rate(bySize.last),
      "sqrt weighting must favor smaller sources")
  }

  test("pps: one dart every total/50 tokens in key-hash order selects " +
      "size-proportional docs, integer-exact") {
    val docs = spark.read
      .parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("source"), trim(col("text")).as("t"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1),
        r.getString(2).split("\\s+").length.toLong))
    val hashOf = (id: Long) =>
      java.lang.Math.floorMod(id * 2654435761L, 4294967296L)
    val total = docs.map(_._3).sum
    val step = math.max(total / 50, 1L)
    var cum = 0L
    val want = docs.sortBy(d => hashOf(d._1)).flatMap {
      case (id, src, n) =>
        val pick = (cum + step - 1) / step
        val sel = if (pick * step < cum + n) Some((id, src, n, cum, pick))
          else None
        cum += n
        sel
    }.toSet
    val got = SampleOps.q26_pps(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
      .toSet
    assert(got == want)
    // fixed-size property: each dart lands in exactly one doc, so the
    // sample is at most the dart count (fewer only when one doc catches
    // several darts)
    val nDarts = (total + step - 1) / step
    assert(got.nonEmpty && got.size <= nDarts)
    // the size bias PPS exists for: selected docs average more tokens
    // than the corpus at large
    assert(got.toSeq.map(_._3).sum.toDouble / got.size >
      total.toDouble / docs.length,
      "token-weighted darts must favor longer documents")
  }
}
