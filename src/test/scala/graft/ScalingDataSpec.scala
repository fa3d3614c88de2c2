package graft

/** The scaling-ladder generator ([[ScalingData]]) — determinism, the
  * driver-fixture marginals the risk queries consume, and the schema
  * contract that lets every inventory query run on a ladder rung
  * unchanged. The distributional assertions use generous tolerances:
  * they pin the RECIPE (the law each column follows), not a sample. */
class ScalingDataSpec extends SparkSpec {

  test("per-row functions are pure: the same id always yields the " +
      "same row (regeneration must be byte-deterministic so the " +
      "committed exponent table stays comparable)") {
    assert(ScalingData.doc(123L) == ScalingData.doc(123L))
    assert(ScalingData.vec(77L).embedding.toSeq ==
      ScalingData.vec(77L).embedding.toSeq)
    assert(ScalingData.order(5L, 1500L) == ScalingData.order(5L, 1500L))
    assert(ScalingData.lines(9L, 2000L, 100L) ==
      ScalingData.lines(9L, 2000L, 100L))
    assert(ScalingData.event(3L, 10000L) == ScalingData.event(3L, 10000L))
    // adjacent ids decorrelate (splitmix64 seeds, not raw ids)
    assert(ScalingData.doc(123L).text != ScalingData.doc(124L).text)
  }

  test("ladder sizes: every ladder steps a clean 10x per rung on its " +
      "growth tables, and the non-growth tables pin at core-r1 size " +
      "(big grows documents/embeddings; heaps grows documents/part; " +
      "vec grows only embeddings)") {
    for (l <- ScalingData.ladders; r <- 0 to 1) {
      val a = ScalingData.sizes(l, r)
      val b = ScalingData.sizes(l, r + 1)
      if (l != "vec" && l != "graph")
        assert(b("documents") == 10 * a("documents"), s"$l r$r")
      if (l != "heaps" && l != "graph")
        assert(b("embeddings") == 10 * a("embeddings"), s"$l r$r")
      if (l == "heaps")
        assert(b("part") == 10 * a("part"), s"$l r$r")
      if (l == "graph") { // orders+customers grow in the 10:1 ratio
        assert(b("orders") == 10 * a("orders"), s"$l r$r")
        assert(b("customer") == 10 * a("customer"), s"$l r$r")
        assert(a("orders") == 10 * a("customer"), s"$l r$r")
      }
    }
    val core1 = ScalingData.sizes("core", 0)
    val big3 = ScalingData.sizes("big", 2)
    for (t <- Seq("customer", "supplier", "part", "orders", "events"))
      assert(big3(t) == core1(t), t)
    val heaps3 = ScalingData.sizes("heaps", 2)
    for (t <- Seq("customer", "supplier", "orders", "events", "embeddings"))
      assert(heaps3(t) == core1(t), t)
    val vec3 = ScalingData.sizes("vec", 2)
    for (t <- Seq("customer", "supplier", "part", "orders", "events",
        "documents"))
      assert(vec3(t) == core1(t), t)
    val graph3 = ScalingData.sizes("graph", 2)
    for (t <- Seq("supplier", "part", "events", "documents", "embeddings"))
      assert(graph3(t) == core1(t), t)
    assert(ScalingData.sizes("core", 2)("orders") == 1500000L)
    assert(graph3("orders") == 5000000L)
  }

  test("heaps documents follow Heaps/Zipf: vocabulary grows ~sqrt(10)x " +
      "per decade with rank-stable words (growth appends NEW words), " +
      "frequencies are head-heavy, and the length law and duplicate " +
      "mass match the constant-vocabulary recipe") {
    assert(ScalingData.docHeaps(123L, 5000L) ==
      ScalingData.docHeaps(123L, 5000L)) // pure
    val small = (0L until 2000L).map(ScalingData.docHeaps(_, 2000L))
    val large = (0L until 20000L).map(ScalingData.docHeaps(_, 20000L))
    val vSmall = small.flatMap(_.text.split(" ")).toSet
    val vLarge = large.flatMap(_.text.split(" ")).toSet
    // V = ceil(sqrt(54 n)) up to unseen-tail slack: a decade of docs
    // grows the OBSERVED vocabulary ~2.5-3.2x (sqrt(10) at the recipe)
    val growth = vLarge.size.toDouble / vSmall.size
    assert(growth > 2.2 && growth < 3.6, (vSmall.size, vLarge.size))
    // rank-stable: the small rung's vocabulary is (almost entirely) a
    // subset of the large rung's — new words appear, old ones persist
    assert(vSmall.diff(vLarge).size < vSmall.size / 20,
      vSmall.diff(vLarge).size)
    // Zipf head: the most frequent word covers >5% of tokens while the
    // median word is rare (head-heavy, long tail)
    val freq = large.flatMap(_.text.split(" "))
      .groupBy(identity).map(_._2.size).toSeq.sorted(Ordering[Int].reverse)
    assert(freq.head.toDouble / freq.sum > 0.05,
      freq.head.toDouble / freq.sum)
    val perDoc = large.map(_.text.split(" ").length)
    assert(perDoc.min >= 8 && perDoc.max <= 100)
    val dupRows = 20000 - large.map(_.text).distinct.size
    assert(dupRows > 20000 / 2000 && dupRows < 20000 / 50, dupRows)
  }

  test("heaps parts grow their NAME vocabulary ~sqrt(n) (the fuzzy " +
      "quadratic core then grows ~n, the vocabulary-bounded claim as " +
      "a measurable exponent)") {
    assert(ScalingData.partHeaps(9L, 2000L) ==
      ScalingData.partHeaps(9L, 2000L)) // pure
    val small = (0L until 2000L).map(ScalingData.partHeaps(_, 2000L))
    val large = (0L until 200000L).map(ScalingData.partHeaps(_, 200000L))
    val vs = small.map(_.p_name).distinct.size.toDouble
    val vl = large.map(_.p_name).distinct.size.toDouble
    // two decades of parts: name vocabulary grows ~10x (a² with
    // a = ceil(n^0.25); integer ceilings make it approximate)
    assert(vl / vs > 6 && vl / vs < 16, (vs, vl))
  }

  test("documents keep the fixture's law: 31-word vocabulary, 8-100 " +
      "words, lang weights (en ~0.40), source = src(id % 20), n_chars " +
      "= text length, and a small exact+near duplicate mass") {
    val n = 20000
    val docs = (0L until n.toLong).map(ScalingData.doc(_))
    assert(docs.forall(d => d.n_chars == d.text.length))
    assert(docs.forall(d => d.source == s"src${d.doc_id % 20}"))
    val words = docs.flatMap(_.text.split(" "))
    assert(words.toSet.size == 31, words.toSet.size)
    val perDoc = docs.map(_.text.split(" ").length)
    assert(perDoc.min >= 8 && perDoc.max <= 100)
    val en = docs.count(_.lang == "en").toDouble / n
    assert(en > 0.36 && en < 0.44, en)
    assert(docs.map(_.lang).toSet == Set("en", "zh", "es", "fr", "de"))
    // duplicate mass: some texts repeat (exact copies), but few —
    // the fixture's ~0.4% copy rate, not a degenerate corpus
    val dupRows = n - docs.map(_.text).distinct.size
    assert(dupRows > n / 2000 && dupRows < n / 50, dupRows)
  }

  test("embeddings keep the fixture's law: 64-dim unit vectors, " +
      "near-uniform labels 0-9, weak centroid signal (mean cosine to " +
      "own label centroid ~0.065, nothing clustered enough to plant " +
      "near-dups)") {
    val n = 4000
    val vs = (0L until n.toLong).map(ScalingData.vec(_))
    assert(vs.forall(_.embedding.length == 64))
    assert(vs.forall(v =>
      math.abs(v.embedding.map(x => x.toDouble * x).sum - 1.0) < 1e-4))
    val byLabel = vs.groupBy(_.label)
    assert(byLabel.keySet == (0 until 10).toSet)
    assert(byLabel.values.map(_.size).min > n / 20)
    val cos = byLabel.map { case (_, g) =>
      val c = Array.tabulate(64)(i =>
        g.map(_.embedding(i).toDouble).sum / g.size)
      val cn = math.sqrt(c.map(x => x * x).sum)
      g.map(v => v.embedding.zip(c).map { case (a, b) =>
        a * b / cn }.sum).sum / g.size
    }
    val mean = cos.sum / cos.size
    assert(mean > 0.03 && mean < 0.12, mean)
  }

  test("orders/lineitem keep the fixture's joint law: custkey uniform " +
      "over the rung's customers, Poisson(4) lines per order (some " +
      "zero-line orders), linenumber 1 + i%7, part/supp keys in range") {
    val nCust = 1500L
    val orders = (0L until 15000L).map(ScalingData.order(_, nCust))
    assert(orders.forall(o => o.o_custkey >= 0 && o.o_custkey < nCust))
    val perCust = orders.groupBy(_.o_custkey).values.map(_.size)
    assert(perCust.sum == 15000 && perCust.max < 30) // Poisson-ish 10
    assert(orders.map(_.o_orderstatus).toSet == Set("F", "O", "P"))
    val li = (0L until 15000L).flatMap(ScalingData.lines(_, 2000L, 100L))
    val perOrder = li.groupBy(_.l_orderkey)
    val mean = li.size.toDouble / 15000
    assert(mean > 3.7 && mean < 4.3, mean)
    assert(perOrder.size < 15000, "Poisson(4) must yield ~1.8% empty")
    assert(li.forall(l => l.l_linenumber >= 1 && l.l_linenumber <= 7))
    assert(li.forall(l => l.l_partkey < 2000 && l.l_suppkey < 100))
    assert(li.forall(l => l.l_quantity >= 1 && l.l_quantity <= 50))
  }

  test("events keep the fixture's law: sorted by id within the fixed " +
      "30-day window, users = 1.5% of rows, Exp(50) values, " +
      "{\"k\": 0-99} props") {
    val n = 10000L
    val ev = (0L until n).map(ScalingData.event(_, n))
    assert(ev.sliding(2).forall(p => !p(1).ts.isBefore(p(0).ts)))
    assert(ev.map(_.user_id).distinct.size == 150)
    val avg = ev.map(_.value).sum / n
    assert(avg > 40 && avg < 60, avg) // Exp(mean 50)
    assert(ev.forall(_.props.matches("""\{"k": \d{1,2}\}""")))
    val spanMs = java.time.Duration.between(ev.head.ts, ev.last.ts).toMillis
    assert(spanMs > 29L * 86400000 && spanMs <= 30L * 86400000, spanMs)
  }

  test("generated tables carry exactly the driver fixture's schema " +
      "(names, types, order) — any inventory query must run on a " +
      "ladder rung unchanged") {
    val sz = Map("customer" -> 50L, "supplier" -> 10L, "part" -> 20L,
      "orders" -> 100L, "events" -> 50L, "documents" -> 20L,
      "embeddings" -> 10L)
    for (t <- Seq("customer", "supplier", "part", "orders", "lineitem",
        "events", "documents", "embeddings")) {
      val fixture = Tables.load(spark, sfDir, t).schema
      val mine = ScalingData.table(spark, t, sz).schema
      assert(mine.fieldNames.toSeq == fixture.fieldNames.toSeq, t)
      mine.fields.zip(fixture.fields).foreach { case (m, f) =>
        // events.ts: the fixture generation at hand may be NANOS-as-
        // long while we write MICROS timestamps — Tables.events
        // normalizes both, so either type satisfies the contract
        val tsSeam = t == "events" && m.name == "ts"
        assert(tsSeam ||
          m.dataType.catalogString == f.dataType.catalogString,
          s"$t.${m.name}: ${m.dataType} vs fixture ${f.dataType}")
      }
    }
  }
}
