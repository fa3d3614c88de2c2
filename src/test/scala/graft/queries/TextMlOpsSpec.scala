package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Brute-force ground truth for the tokenizer-training / clustering ops
  * (q24_bpe_pairs, q24_quantiles, q23_kmeans) on the tiny corpus — the
  * same integer semantics re-implemented naively in Scala, compared
  * row-for-row. The DuckDB oracle checks the SQL twin; this pins the
  * SEMANTICS independently of either engine. */
class TextMlOpsSpec extends SparkSpec {

  test("q24_bpe_train learns the same merges as an independent single-" +
      "machine greedy BPE over the same corpus") {
    import spark.implicits._
    // reference implementation: plain Scala, no Spark. Split into CODE
    // POINTS (not UTF-16 units — `w.map(_.toString)` would shear
    // surrogate pairs where Spark's substring works on code points) and
    // tie-break in UTF-8 BYTE order, matching Spark's binary string
    // ordering; the current fixture is ASCII, where both choices
    // coincide, but the reference shouldn't rely on that.
    def codePoints(w: String): Array[String] =
      w.codePoints().toArray.map(cp => new String(Character.toChars(cp)))
    val utf8Order: Ordering[String] = (a: String, b: String) => {
      val (x, y) = (a.getBytes("UTF-8"), b.getBytes("UTF-8"))
      val n = math.min(x.length, y.length)
      var i = 0
      while (i < n && x(i) == y(i)) i += 1
      if (i < n) (x(i) & 0xff) - (y(i) & 0xff) else x.length - y.length
    }
    var vocab: Array[(Array[String], Long)] =
      graft.Tables.load(spark, sfDir, "documents")
        .select(explode(split(trim(col("text")), "\\s+")).as("w"))
        .filter(length(col("w")) >= 1)
        .groupBy("w").agg(count(lit(1)).as("freq"))
        .as[(String, Long)].collect()
        .map { case (w, f) => (codePoints(w), f) }
    val expected = (1 to 3).map { it =>
      val counts = scala.collection.mutable.Map[(String, String), Long]()
      for ((sym, f) <- vocab; i <- 0 until sym.length - 1) {
        val k = (sym(i), sym(i + 1))
        counts(k) = counts.getOrElse(k, 0L) + f
      }
      val ((l, r), cnt) = counts.toSeq
        .minBy { case ((pl, pr), c) => (-c, pl, pr) }(
          Ordering.Tuple3(Ordering.Long, utf8Order, utf8Order))
      vocab = vocab.map { case (sym, f) =>
        val out = scala.collection.mutable.ArrayBuffer[String]()
        var i = 0
        while (i < sym.length) {
          if (i + 1 < sym.length && sym(i) == l && sym(i + 1) == r) {
            out += (l + r); i += 2
          } else { out += sym(i); i += 1 }
        }
        (out.toArray, f)
      }
      (it, l, r, cnt)
    }
    val got = TextOps.q24_bpe_train(spark, sfDir)
      .as[(Int, String, String, Long)].collect().toSeq
    assert(got == expected,
      s"distributed merges $got != reference $expected")
  }

  test("BPE greedy merge-apply fold == the imperative scan on adversarial " +
      "repeated-letter words (overlap chains like 'aaaa')") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    // 2-letter alphabet forces dense merge collisions and runs
    val words = Seq.fill(300)(
      (1 to (1 + rnd.nextInt(8))).map(_ => if (rnd.nextBoolean()) "a" else "b")
        .mkString)
    def refApply(sym: Array[String], l: String, r: String): Array[String] = {
      val out = scala.collection.mutable.ArrayBuffer[String]()
      var i = 0
      while (i < sym.length) {
        if (i + 1 < sym.length && sym(i) == l && sym(i + 1) == r) {
          out += (l + r); i += 2
        } else { out += sym(i); i += 1 }
      }
      out.toArray
    }
    for ((l, r) <- Seq(("a", "a"), ("a", "b"), ("b", "a"))) {
      val applied = aggregate(
        col("sym"),
        typedLit(Seq.empty[String]),
        (out, x) => {
          val hit = size(out) > 0 &&
            element_at(out, -1) === lit(l) && x === lit(r)
          when(hit, concat(
            slice(out, lit(1), size(out) - 1), array(lit(l + r))))
            .otherwise(concat(out, array(x)))
        })
      val got = words.toDF("w")
        .select(col("w"), expr(
          "transform(sequence(1, length(w)), i -> substring(w, i, 1))")
          .as("sym"))
        .select(col("w"), applied.as("m"))
        .as[(String, Seq[String])].collect().toMap
      words.foreach { w =>
        val want = refApply(w.map(_.toString).toArray, l, r).toSeq
        assert(got(w) == want,
          s"merge($l,$r) on '$w': fold ${got(w)} != scan $want")
      }
    }
  }

  test("bpe pairs: distinct-word-histogram pair counts equal the " +
      "naive full-stream count") {
    val words = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(trim(col("text")).as("t")).collect()
      .flatMap(_.getString(0).split("\\s+"))
    val counts = scala.collection.mutable.Map.empty[String, Long]
    for (w <- words; p <- w.sliding(2) if p.length == 2)
      counts(p) = counts.getOrElse(p, 0L) + 1L
    val want = counts.toSeq.sortBy { case (p, c) => (-c, p) }.take(200)
    val got = TextOps.q24_bpe_pairs(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == want)
  }

  test("quantiles: histogram-cumsum picks exactly the ceil(q*n)-ranked " +
      "value per language") {
    val byLang = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("lang"), col("n_chars")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toIndexedSeq).toMap
    def rank(n: Long, num: Long, den: Long): Int =
      ((num * n + den - 1) / den).toInt // ceil(num*n/den), 1-based
    val want = byLang.toSeq.map { case (lang, v) =>
      val n = v.size.toLong
      (lang, n, v(rank(n, 1, 2) - 1), v(rank(n, 9, 10) - 1),
        v(rank(n, 99, 100) - 1))
    }.sortBy(_._1)
    val got = TextOps.q24_quantiles(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(got == want)
  }

  test("compress: distributed deflate sizes equal single-threaded " +
      "java.util.zip, and repetition compresses harder than variety") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val defl = new java.util.zip.Deflater(6)
    val buf = new Array[Byte](64 * 1024)
    val want = docs.map { case (id, text) =>
      val in = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      defl.reset(); defl.setInput(in); defl.finish()
      var total = 0L
      while (!defl.finished()) total += defl.deflate(buf)
      val ratio = if (in.isEmpty) 100L else total * 100L / in.length
      (id, in.length.toLong, total, ratio)
    }.sortBy(_._1).toSeq
    defl.end()
    val got = TextOps.q24_compress(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got == want)
    // sanity of the signal itself: a pathologically repetitive doc must
    // compress far harder than typical corpus text
    val medianRatio = want.map(_._4).sorted.apply(want.size / 2)
    val rep = "spam " * 200
    val in = rep.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val d2 = new java.util.zip.Deflater(6)
    d2.setInput(in); d2.finish()
    var repTotal = 0L
    while (!d2.finished()) repTotal += d2.deflate(buf)
    d2.end()
    assert(repTotal * 100L / in.length < medianRatio / 2,
      "repetitive text must compress far below the corpus median ratio")
  }

  test("approx quantiles stay within 2% rank error of the exact " +
      "histogram answer") {
    val exact = TextOps.q24_quantiles(spark, sfDir).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), Seq(r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    val byLang = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("lang"), col("n_chars")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toIndexedSeq).toMap
    val approx = TextOps.q24_quantiles_approx(spark, sfDir).collect()
    assert(approx.nonEmpty)
    for (r <- approx) {
      val lang = r.getString(0)
      val (nExact, _) = exact(lang)
      assert(r.getLong(1) == nExact)
      val sorted = byLang(lang)
      for ((q, i) <- Seq(0.5, 0.9, 0.99).zipWithIndex) {
        val got = r.getLong(2 + i)
        // rank error bound: the sketch value must sit within ±2% of n
        // positions of the true rank (accuracy 10000 → eps 1e-4; 2% is
        // a generous envelope that still catches a broken sketch)
        val lo = sorted(math.max(0, (q * sorted.size).toInt -
          math.max(1, sorted.size / 50) - 1))
        val hi = sorted(math.min(sorted.size - 1,
          (q * sorted.size).toInt + math.max(1, sorted.size / 50)))
        assert(got >= lo && got <= hi,
          s"$lang p$q=$got outside rank envelope [$lo,$hi]")
      }
    }
  }

  test("kmeans: two Lloyd iterations match the naive integer-space loop " +
      "(assignments, sizes, centroids)") {
    val vecs = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0),
        r.getSeq[Float](1).map(x =>
          math.floor(x.toDouble * 1000000d).toLong + 2000000L).toArray))
      .sortBy(_._1)
    var centroids: Seq[(Long, Array[Long])] =
      vecs.take(8).zipWithIndex.map { case ((_, vm), i) => (i.toLong, vm) }
    var sizes = Map.empty[Long, Long]
    for (_ <- 1 to 2) {
      val assigned = vecs.map { case (id, vm) =>
        val best = centroids.map { case (cid, cm) =>
          var d = 0L
          var i = 0
          while (i < vm.length) {
            val t = vm(i) - cm(i); d += t * t; i += 1
          }
          (d, cid)
        }.min // (dist, cid) lexicographic: lowest cid wins ties
        (best._2, id, vm)
      }
      centroids = assigned.groupBy(_._1).toSeq.sortBy(_._1).map {
        case (cid, rows) =>
          val n = rows.length
          val cm = Array.tabulate(rows.head._3.length)(i =>
            rows.map(_._3(i)).sum / n) // positive values: / == floor div
          (cid, cm)
      }
      sizes = assigned.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    }
    val want = centroids.map { case (cid, cm) =>
      (cid, sizes(cid), cm.mkString(","))
    }
    val got = SimilarityOps.q23_kmeans(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq
    assert(got == want)
  }

  test("lm score: mean corpus-bigram frequency equals the naive " +
      "two-pass count") {
    val docs = graft.Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), trim(col("text")).as("t")).collect()
      .map(r => (r.getLong(0), r.getString(1).split("\\s+").toSeq))
    val bigramsOf = (tk: Seq[String]) =>
      if (tk.length < 2) Seq.empty[String]
      else tk.sliding(2).map(p => p(0) + " " + p(1)).toSeq
    val corpus = scala.collection.mutable.Map[String, Long]()
    docs.foreach { case (_, tk) =>
      bigramsOf(tk).foreach(b => corpus(b) = corpus.getOrElse(b, 0L) + 1)
    }
    val want = docs.map { case (id, tk) =>
      val bgs = bigramsOf(tk)
      val freqSum = bgs.map(corpus).sum
      val score = if (bgs.isEmpty) 0L else freqSum / bgs.length
      (id, tk.length.toLong, bgs.length.toLong, freqSum, score)
    }.toSet
    val got = TextOps.q24_lm_score(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
      .toSet
    assert(got == want)
    // a bigram occurs at least once (itself) → scores are ≥ 1 wherever
    // a doc has any bigram at all
    assert(got.filter(_._3 > 0).forall(_._5 >= 1))
  }

  test("oov: per-language token totals reconcile with text_stats, the " +
      "rate is a valid percentage, and every vocab token is by " +
      "construction in-vocabulary") {
    val oov = TextOps.q24_oov(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(oov.nonEmpty)
    assert(oov.forall { case (_, n, o, pct) =>
      o >= 0 && o <= n && pct == o * 100 / n })
    // the same tokenization feeds q24_text_stats' sum_toks — totals agree
    val stats = TextOps.q24_text_stats(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(oov.forall { case (lang, n, _, _) => stats(lang) == n })
  }
}
