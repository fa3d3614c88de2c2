package graft.queries

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Sketch-based operators (no DuckDB oracle) asserted against exact
  * ground truth computed in-process on sf0.001.
  */
class DedupSimilaritySpec extends SparkSpec {
  import spark.implicits._

  test("MinHash-LSH near-dup pairs ⊆ exact, with high recall") {
    val exact = DedupOps.q22_dedup_ngram(spark, sfDir)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    val lsh = DedupOps.q22_dedup_minhash(spark, sfDir)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(exact.nonEmpty, "fixture data should contain near-dups")
    assert(lsh.subsetOf(exact),
      "LSH verifies candidates exactly → precision must be 1.0")
    assert(lsh.size >= (exact.size * 0.9).toInt,
      s"recall too low: ${lsh.size}/${exact.size}")
  }

  test("duplicated-span stats on a planted corpus: shared 25-token span " +
      "counted in both docs, unique docs at zero, short docs absent") {
    val span = (1 to 25).map(i => s"s$i").mkString(" ")
    val corpus = Seq(
      // 30 tokens: 6 sliding spans, of which exactly ONE (offset 3,
      // the planted span) also occurs in doc 2
      (1L, s"a1 a2 a3 $span b1 b2"),
      // 27 tokens: 3 spans, the planted one at offset 2
      (2L, s"c1 c2 $span"),
      // 26 tokens, all spans unique to this doc
      (3L, (1 to 26).map(i => s"u$i").mkString(" ")),
      // 24 tokens: below k, no spans — must not appear at all
      (4L, (1 to 24).map(i => s"v$i").mkString(" "))
    ).toDF("doc_id", "text")
    val got = DedupOps.spanStats(corpus, k = 25)
      .select("doc_id", "n_spans", "n_dup", "dup_pct")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(got.toSeq == Seq(
      (1L, 6L, 1L, 16L),  // 1*100 div 6 = 16
      (2L, 3L, 1L, 33L),
      (3L, 2L, 0L, 0L)),
      s"got ${got.toSeq}")
  }

  test("containment catches the subset-duplicate Jaccard misses, at " +
      "the planted 80% boundary") {
    // doc 2 is the first third of doc 1: containment 1.0, Jaccard ~0.32
    val big = (1 to 60).map(i => s"w$i").mkString(" ")
    val sub = (1 to 20).map(i => s"w$i").mkString(" ")
    // doc 3 shares 15 of doc 4's 20 tokens (distinct vocab from 1/2):
    // shingle containment lands BELOW 0.8 → excluded
    val corpus = Seq(
      (1L, big), (2L, sub),
      (3L, (1 to 30).map(i => s"x$i").mkString(" ")),
      (4L, ((1 to 15).map(i => s"x$i") ++ (1 to 5).map(i => s"y$i"))
        .mkString(" ")))
      .toDF("doc_id", "text")
    val sh = corpus.select(col("doc_id"),
      graft.functions.native.shingleHashes(col("text"), 3).as("shingles"))
    val got = DedupOps.containPairs(sh)
      .select("doc_a", "doc_b", "contain_pct")
      .as[(Long, Long, Long)].collect().toSet
    // doc2 has 18 shingles, all inside doc1 → pct 100; pair (3,4):
    // doc4's 18 shingles intersect doc3's in 13 ("x1..x15" runs) →
    // 13/18 = 72% < 80% → absent
    assert(got == Set((1L, 2L, 100L)), s"got $got")
    // and the Jaccard pass must NOT see the subset pair (18/58 < 0.5)
    val jac = DedupOps.verified(
        DedupOps.containPairs(sh).select("doc_a", "doc_b"), sh)
      .as[(Long, Long, Long, Long)].collect()
    assert(jac.isEmpty, s"subset pair must fail Jaccard, got ${jac.toSeq}")
  }

  test("property: containment prefix-filter finds EVERY pair brute " +
      "force finds on random overlapping corpora (candidate " +
      "completeness — the subtle half of the prefix argument)") {
    val rnd = new scala.util.Random(20260814L)
    for (_ <- 1 to 3) {
      // small vocab forces heavy shingle sharing; mixed doc lengths
      // force min-size asymmetry (the case Jaccard prefixes get wrong)
      val corpus = (1L to 25L).map { id =>
        val nTok = 4 + rnd.nextInt(30)
        (id, (1 to nTok).map(_ => s"t${rnd.nextInt(12)}").mkString(" "))
      }.toDF("doc_id", "text")
      val sh = corpus.select(col("doc_id"),
        graft.functions.native.shingleHashes(col("text"), 3).as("shingles"))
      val sets = sh.collect()
        .map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
      val brute = (for {
        a <- sets.keys; b <- sets.keys if a < b
        ia = sets(a).intersect(sets(b)).size
        mn = math.min(sets(a).size, sets(b).size)
        if mn > 0 && ia * 5 >= mn * 4
      } yield (a, b, ia.toLong, mn.toLong, ia.toLong * 100 / mn)).toSet
      val got = DedupOps.containPairs(sh)
        .as[(Long, Long, Long, Long, Long)].collect().toSet
      assert(got == brute,
        s"missing=${brute -- got} spurious=${got -- brute}")
    }
  }

  test("incremental near-dup = exact pairs touching the new batch") {
    val exact = DedupOps.q22_dedup_ngram(spark, sfDir)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    def isNew(id: Long) = (id * 2654435761L) % 4294967296L % 100 >= 80
    val want = exact.filter { case (a, b) => isNew(a) || isNew(b) }
    val got = DedupOps.q22_dedup_incr_near(spark, sfDir)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(want.nonEmpty, "fixture should have pairs touching the new slice")
    assert(got == want,
      s"probe-the-index output must equal exact new-vs-anything pairs " +
        s"(missing: ${want -- got}, extra: ${got -- want})")
  }

  test("SimHash blocking finds exactly the Hamming<=3 pairs (brute check)") {
    val blocked = DedupOps.q22_dedup_simhash(spark, sfDir)
      .select("doc_a", "doc_b", "hamming")
      .as[(Long, Long, Long)].collect().toSet
    // brute-force: pairwise Hamming over the operator's own sketch
    // values — this asserts the BLOCKING is exact for distance <= 3
    // (pigeonhole: 3 differing bits can't touch all 4 16-bit blocks).
    val sim = DedupOps.simhashes(spark, sfDir)
    val a = sim.select(col("doc_id").as("doc_a"), col("simhash").as("sa"))
    val b = sim.select(col("doc_id").as("doc_b"), col("simhash").as("sb"))
    val brute = a.crossJoin(b).filter(col("doc_a") < col("doc_b"))
      .withColumn("hamming", expr("bit_count(sa ^ sb)"))
      .filter(col("hamming") <= 3)
      .select("doc_a", "doc_b", "hamming")
      .as[(Long, Long, Long)].collect().toSet
    assert(blocked == brute)
  }

  test("LSH ANN recall@5 vs exact brute force") {
    val exact = SimilarityOps.q23_knn_exact(spark, sfDir)
      .select("q_id", "cand_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val lsh = SimilarityOps.q23_knn_lsh(spark, sfDir)
      .select("q_id", "cand_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val recalls = exact.map { case (q, truth) =>
      val got = lsh.getOrElse(q, Set.empty)
      truth.intersect(got).size.toDouble / truth.size
    }
    val mean = recalls.sum / recalls.size
    info(s"mean recall@5 = $mean")
    assert(mean >= 0.8, s"mean recall@5 $mean — the 16×4-bit banding " +
      "should hold ≥0.8 (see the trade-off note in SimilarityOps)")
  }

  test("int8 quantization: codes in range, error within the half-step " +
      "bound, dequantized vectors stay close") {
    val out = SimilarityOps.q23_quantize(spark, sfDir).collect()
    assert(out.nonEmpty)
    for (r <- out) {
      val codes = r.getString(1).split(",").map(_.toInt)
      val scale = r.getDouble(2)
      val err = r.getDouble(3)
      assert(codes.forall(c => c >= -127 && c <= 127),
        s"vec ${r.getLong(0)} codes out of int8 range")
      // max-abs quantization: |x - q*s/127| <= s/254 (half a step)
      assert(err <= scale / 254 * (1 + 1e-9),
        s"vec ${r.getLong(0)} err $err exceeds half-step ${scale / 254}")
    }
  }

  test("exact dedup groups identical normalized text") {
    val df = Seq(
      (1L, "a  b c", "en", "s", 5L),
      (2L, " a b  c ", "en", "s", 5L),
      (3L, "different", "en", "s", 9L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    df.createOrReplaceTempView("documents")
    // run the same logic directly over a temp frame
    val groups = df.groupBy(
        regexp_replace(trim(col("text")), "\\s+", " ").as("k"))
      .agg(min("doc_id").as("keep_id"), count(lit(1)).as("n"))
      .orderBy("keep_id")
      .select("keep_id", "n").as[(Long, Long)].collect()
    assert(groups.toSeq == Seq((1L, 2L), (3L, 1L)))
  }

  test("connected components match a union-find ground truth on random " +
      "graphs and an adversarial chain") {
    // union-find reference
    def components(n: Int, edges: Seq[(Long, Long)]): Map[Long, Long] = {
      val parent = scala.collection.mutable.Map.empty[Long, Long]
      def find(x: Long): Long = {
        val p = parent.getOrElse(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
      nodes.map(v => v -> find(v)).toMap
    }
    def check(edges: Seq[(Long, Long)], label: String): Unit = {
      val got = DedupOps.connectedComponents(edges.toDF("u", "v"))
        .as[(Long, Long)].collect().toMap
      val want = components(0, edges)
      assert(got == want, s"$label: got ${got.toSeq.sorted.take(10)}... " +
        s"want ${want.toSeq.sorted.take(10)}...")
    }
    // adversarial long chain: worst case for label propagation, the
    // case large-star/small-star's O(log^2 n) rounds exist for
    check((0L until 200L).map(i => (i, i + 1)), "chain-201")
    // star + separate components + duplicate/reversed edges
    check(Seq((10L, 2L), (10L, 7L), (2L, 10L), (30L, 31L), (31L, 32L),
      (50L, 40L), (40L, 50L)), "stars")
    // random graphs, fixed seeds
    for (seed <- Seq(1, 2, 3)) {
      val rnd = new scala.util.Random(seed)
      val edges = Seq.fill(300)(
        (rnd.nextInt(200).toLong, rnd.nextInt(200).toLong))
        .filter(e => e._1 != e._2)
      check(edges, s"random-$seed")
    }
  }

  test("product quantization: encode + ADC top-5 equal a naive " +
      "single-machine reference in the same integer space") {
    val m = 8; val sub = 8; val k = 16
    val vecs = graft.Tables.load(spark, sfDir, "embeddings")
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(x =>
        math.floor(x.toDouble * 1000000d).toLong + 2000000L).toIndexedSeq))
      .sortBy(_._1)
    val cb = vecs.take(k).map(_._2)
    def subdist(a: IndexedSeq[Long], b: IndexedSeq[Long], s: Int): Long =
      (0 until sub).map { i =>
        val d = a(s * sub + i) - b(s * sub + i); d * d
      }.sum
    def encode(v: IndexedSeq[Long]): IndexedSeq[Int] =
      (0 until m).map { s =>
        cb.map(c => subdist(v, c, s)).zipWithIndex
          .minBy(t => (t._1, t._2))._2
      }.toIndexedSeq
    val want = vecs.filter(_._1 < 10).flatMap { case (qid, qv) =>
      val qtab = Array.tabulate(m, k)((s, j) => subdist(qv, cb(j), s))
      vecs.filter(_._1 != qid).map { case (cid, cv) =>
        val codes = encode(cv)
        (qid, cid, (0 until m).map(s => qtab(s)(codes(s))).sum)
      }.sortBy(t => (t._3, t._2)).take(5).zipWithIndex
        .map { case ((q, c, d), i) => (q, i + 1, c, d) }
    }.toSet
    val got = SimilarityOps.q23_pq(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got == want)
  }

  test("IVF-PQ: same ADC arithmetic, candidates restricted to the " +
      "query's coarse cell, top-3") {
    val m = 8; val sub = 8; val k = 16
    val vecs = graft.Tables.load(spark, sfDir, "embeddings")
      .select("vec_id", "label", "embedding").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getSeq[Float](2).map(x =>
        math.floor(x.toDouble * 1000000d).toLong + 2000000L).toIndexedSeq))
      .sortBy(_._1)
    val cb = vecs.take(k).map(_._3)
    def subdist(a: IndexedSeq[Long], b: IndexedSeq[Long], s: Int): Long =
      (0 until sub).map { i =>
        val d = a(s * sub + i) - b(s * sub + i); d * d
      }.sum
    def encode(v: IndexedSeq[Long]): IndexedSeq[Int] =
      (0 until m).map { s =>
        cb.map(c => subdist(v, c, s)).zipWithIndex
          .minBy(t => (t._1, t._2))._2
      }.toIndexedSeq
    val want = vecs.filter(_._1 < 10).flatMap { case (qid, qlabel, qv) =>
      val qtab = Array.tabulate(m, k)((s, j) => subdist(qv, cb(j), s))
      vecs.filter(c => c._1 != qid && c._2 == qlabel)
        .map { case (cid, _, cv) =>
          val codes = encode(cv)
          (qid, cid, (0 until m).map(s => qtab(s)(codes(s))).sum)
        }.sortBy(t => (t._3, t._2)).take(3).zipWithIndex
        .map { case ((q, c, d), i) => (q, i + 1, c, d) }
    }.toSet
    val got = SimilarityOps.q23_ivfpq(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got == want)
  }
}
