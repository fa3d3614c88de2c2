package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Association / retrieval index builders: market-basket co-occurrence
  * (Q42) and a capped inverted phrase index (Q43) — the two "turn the
  * corpus into a lookup structure" operators a recommendation or RAG
  * consumer of this engine runs over the tables the CDC stream lands.
  *
  * Both are pure aggregation pipelines: the heavy shuffle is a single
  * partial-agg groupBy keyed on the item/term, and every per-key result
  * is bounded (pair counts / top-k postings), so output scales with the
  * vocabulary, never the corpus.
  */
object IndexOps {

  // ---------------------------------------------------------------- Q42
  /** CO-OCCURRENCE counts (market-basket): for every unordered pair of
    * parts appearing in the same order, the number of orders containing
    * both — the support counts behind "frequently bought together" and
    * item-item collaborative filtering.
    *
    * ONE shuffle on the basket key collects each order's distinct sorted
    * part set (`collect_set` dedups in the partial aggregate, so the
    * exchange carries at most one row per (order, part)); pairs are then
    * generated ROW-LOCALLY from the sorted set — ascending order makes
    * every pair emit exactly once as (a < b), no dedup pass, no
    * self-join that would shuffle the items table twice. The pair
    * explosion is quadratic in basket size: bounded (≤ 7 lines/order
    * here, human-scale carts generally); a bot-scale basket needs a
    * size cap or a frequency prefilter before this operator — that is
    * a data contract, not a plan property. Final counts collapse through
    * a second partial-agg groupBy to one row per surviving pair; the
    * `n ≥ 2` support floor keeps the result the interesting tail.
    * Ordering (n DESC, a, b) is total because (a, b) is unique. */
  /** Unordered pair-support core over (basket, item) rows — exposed so
    * specs can plant baskets and so q42c can consume the counts without
    * inheriting a mid-plan sort; `minSupport` floors the emitted pair
    * counts. */
  private[graft] def pairCounts(items: DataFrame,
      minSupport: Long): DataFrame =
    pairsFromSets(basketSets(items), minSupport)

  /** The per-basket sorted distinct item sets — the one corpus-scale
    * aggregation every lattice level starts from. Split out so q42b
    * (pairs + triples) and q42c (pairs + per-item counts) can compute
    * it ONCE and fan out from a snapshot instead of re-running the
    * collect_set shuffle per consumer (guide §1.2/§2.4). */
  private[graft] def basketSets(items: DataFrame): DataFrame =
    items
      .groupBy("basket")
      .agg(sort_array(collect_set(col("item"))).as("ps"))

  /** Pair supports from a (basket, ps) set frame — row-local (a < b)
    * pair generation, then one partial-agg groupBy. */
  private[graft] def pairsFromSets(sets: DataFrame,
      minSupport: Long): DataFrame =
    sets
      .select(explode(expr(
        """flatten(transform(ps, (x, i) ->
          |  transform(slice(ps, i + 2, size(ps)),
          |    y -> struct(x AS a, y AS b))))""".stripMargin)).as("pr"))
      .groupBy(col("pr.a").as("a"), col("pr.b").as("b"))
      .agg(count(lit(1)).as("n"))
      .filter(col("n") >= minSupport)

  /** [[pairCounts]] with the report's presentation order. */
  private[graft] def cooccur(items: DataFrame, minSupport: Long): DataFrame =
    pairCounts(items, minSupport)
      .orderBy(desc("n"), col("a"), col("b"))

  def q42_cooccur(s: SparkSession, dir: String): DataFrame =
    cooccur(Tables.load(s, dir, "lineitem")
      .select(col("l_orderkey").as("basket"), col("l_partkey").as("item")),
      minSupport = 2)

  val q42Sql: String =
    """WITH i AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
      |p AS (SELECT a.l_partkey AS a, b.l_partkey AS b
      |      FROM i a JOIN i b ON a.l_orderkey = b.l_orderkey
      |        AND a.l_partkey < b.l_partkey)
      |SELECT a, b, count(*) AS n FROM p GROUP BY a, b
      |HAVING count(*) >= 2
      |ORDER BY n DESC, a, b""".stripMargin

  // --------------------------------------------------------------- Q42c
  /** RELATED-ITEMS retrieval: each part's top-5 most-related parts by
    * basket Jaccard — the item-item collaborative-filtering table
    * ("customers who bought X also bought…") built from the q42 pair
    * supports. jaccard(a, b) = co / (n_a + n_b − co) in integer ppm
    * (floor division, engine-portable); ties break on the neighbor id
    * so the per-item ranking is total.
    *
    * Scale: pair supports come from [[pairCounts]] (row-local pair
    * generation, no self-join); per-item basket counts are one
    * distinct-collapse + partial-agg groupBy at vocabulary scale. Both
    * joins onto the symmetrized pair list key on an item id — item-
    * scale tables, shuffle-joinable at any corpus size (no broadcast
    * assumption: at 100 TB the catalog itself can be huge). The top-5
    * cut is `row_number() ≤ 5` over (jac DESC, other) — the
    * TopKPerKey bounded-heap shape, so a hub item with 10⁵ neighbors
    * never materializes its full candidate list in one task. */
  def q42c_related(s: SparkSession, dir: String): DataFrame =
    relatedItems(Tables.load(s, dir, "lineitem")
      .select(col("l_orderkey").as("basket"), col("l_partkey").as("item")),
      minSupport = 2, k = 5)

  /** Core over (basket, item) rows — exposed so specs can plant baskets
    * with known Jaccard structure. */
  private[graft] def relatedItems(items: DataFrame, minSupport: Long,
      k: Int): DataFrame = {
    // ONE basket aggregation feeds both the pair supports and the
    // per-item basket counts: explode of the distinct per-basket sets
    // ≡ items.distinct() row-for-row, so nb is unchanged, and the
    // second corpus scan + its distinct exchange disappear (guide §1.2)
    val sets = basketSets(items).localCheckpoint()
    val pairs = pairsFromSets(sets, minSupport)
    val cnt = sets.select(explode(col("ps")).as("item"))
      .groupBy("item").agg(count(lit(1)).as("nb"))
    val sym = pairs.select(col("a").as("item"), col("b").as("other"), col("n"))
      .union(pairs.select(col("b").as("item"), col("a").as("other"), col("n")))
    val w = Window.partitionBy("item")
      .orderBy(desc("jac_ppm"), col("other"))
    sym
      .join(cnt.select(col("item"), col("nb").as("na")), "item")
      .join(cnt.select(col("item").as("other"), col("nb").as("nob")), "other")
      .withColumn("jac_ppm", expr("n * 1000000 div (na + nob - n)"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("item"), col("rk").cast("long").as("rk"), col("other"),
        col("n"), col("jac_ppm"))
      .orderBy("item", "rk")
  }

  val q42cSql: String =
    """WITH i AS (SELECT DISTINCT l_orderkey AS basket, l_partkey AS item
      |           FROM lineitem),
      |c AS (SELECT item, count(*) AS nb FROM i GROUP BY 1),
      |p AS (SELECT a.item AS a, b.item AS b, count(*) AS n
      |      FROM i a JOIN i b ON a.basket = b.basket AND a.item < b.item
      |      GROUP BY 1, 2 HAVING count(*) >= 2),
      |sym AS (SELECT a AS item, b AS other, n FROM p
      |        UNION ALL SELECT b, a, n FROM p),
      |j AS (SELECT sym.item, sym.other, sym.n,
      |        (sym.n * 1000000) // (ca.nb + cb.nb - sym.n) AS jac_ppm
      |      FROM sym JOIN c ca ON ca.item = sym.item
      |        JOIN c cb ON cb.item = sym.other),
      |r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY item
      |        ORDER BY jac_ppm DESC, other) AS rk
      |      FROM j)
      |SELECT item, rk, other, n, jac_ppm
      |FROM r WHERE rk <= 5
      |ORDER BY item, rk""".stripMargin

  // ---------------------------------------------------------------- Q43
  /** CAPPED INVERTED PHRASE INDEX: bigram term → document-frequency +
    * the top-8 postings (doc_id, tf) per term, ranked by tf then doc_id
    * — the structure a phrase-search / RAG retrieval layer probes, built
    * as a declarative plan.
    *
    * Bigrams generate row-locally (slice+transform over the token
    * array — `slice(tk, 1, size-1)` is empty for one-token docs, no
    * degenerate `sequence(1, 0)` descent); term frequencies collapse
    * through one token-scale partial-agg groupBy on (term, doc). The
    * top-8 cut is `row_number() ≤ 8` over (tf DESC, doc_id) — the
    * graft.plans.TopKPerKey rewrite turns it into a bounded heap, so a
    * stopword bigram with df ≈ |docs| never materializes its full
    * posting list in one task. df itself comes from a SEPARATE
    * vocabulary-scale aggregate joined back onto the ≤8·|vocab|
    * surviving rows — deliberately NOT a count() sharing the ranking
    * window, which would force full-partition materialization and
    * defeat the heap. The df join is a SHUFFLE join on `term`,
    * never a broadcast: df is vocabulary-scale (billions of bigrams
    * at 100 TB — a driver OOM as a broadcast side), and the left side
    * just exited `Window.partitionBy("term")`, so it is already
    * hash-partitioned on the join key and the sort-merge join reuses
    * that exchange. PlanShapeSpec pins the no-broadcast shape. */
  /** Core over (doc_id, text) rows — exposed so specs can plant
    * documents; `k` caps the posting list per term. */
  private[graft] def invertedIndex(docs: DataFrame, k: Int): DataFrame = {
    val tf = docs
      .select(col("doc_id"), expr("split(trim(text), '\\\\s+')").as("tk"))
      .select(col("doc_id"), explode(expr(
        """transform(slice(tk, 1, size(tk) - 1),
          |  (x, i) -> concat(x, ' ', element_at(tk, i + 2)))"""
          .stripMargin)).as("term"))
      .groupBy("term", "doc_id")
      .agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val w = Window.partitionBy("term").orderBy(desc("tf"), col("doc_id"))
    tf.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .join(df.hint("shuffle_merge"), "term")
      .select(col("term"), col("df"), col("rk"), col("doc_id"), col("tf"))
      .orderBy("term", "rk")
  }

  def q43_index(s: SparkSession, dir: String): DataFrame =
    invertedIndex(Tables.load(s, dir, "documents")
      .select("doc_id", "text"), k = 8)

  val q43Sql: String =
    """WITH d AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS tk
      |           FROM documents),
      |b AS (SELECT doc_id, array_to_string(tk[i.i:i.i + 1], ' ') AS term
      |      FROM d, LATERAL (SELECT unnest(range(1, len(tk))) AS i) i),
      |tf AS (SELECT term, doc_id, count(*) AS tf FROM b GROUP BY 1, 2),
      |df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
      |r AS (SELECT term, doc_id, tf,
      |        row_number() OVER (PARTITION BY term
      |          ORDER BY tf DESC, doc_id) AS rk
      |      FROM tf)
      |SELECT r.term, df.df, CAST(rk AS INT) AS rk, doc_id, r.tf
      |FROM r JOIN df ON df.term = r.term
      |WHERE rk <= 8
      |ORDER BY r.term, rk""".stripMargin

  // --------------------------------------------------------------- Q42b
  /** FREQUENT TRIPLES with A-PRIORI pruning (q42b) — one lattice level
    * above q42's pairs (Agrawal & Srikant VLDB'94): a triple can only
    * be frequent if all three of its pairs are, so candidate triples
    * filter against the (small) frequent-pair set BEFORE any shuffle —
    * three broadcast LEFT-SEMI joins on the row-locally generated
    * (a<b<c) triples. Without the pruning every basket ships C(n,3)
    * candidate rows into the exchange; with it, only triples already
    * plausible at the pair level survive map-side. Triple generation
    * stays row-local from the sorted basket set (the q42 discipline);
    * counts collapse through one partial-agg groupBy. The oracle skips
    * the pruning — it is a pure optimization, the result set is
    * provably identical (monotonicity of support).
    *
    * Broadcast guard: Apriori conventionally broadcasts the frequent
    * set, and the support threshold keeps it small on any plausible
    * corpus — but "plausible" is not a plan property. The pair set is
    * localCheckpointed (three consumers — without it each broadcast
    * would recompute the basket aggregation) and counted once; only
    * when it is provably broadcast-sized (≤ [[maxBroadcastPairs]]
    * rows ≈ tens of MB) do the semi-joins take the broadcast hint.
    * A degenerate min-support that blows past the bound degrades to
    * unhinted semi-joins — shuffle on the pair keys, still Apriori-
    * lossless, never a driver OOM. */
  /** Frequent-pair rows above which [[frequentTriples]] stops hinting
    * broadcast: 2M (a, b) long-pairs ≈ 32 MB raw — comfortably inside
    * executor broadcast budgets; beyond it the prune joins shuffle. */
  private[graft] val maxBroadcastPairs: Long = 2L * 1000 * 1000

  private[graft] def frequentTriples(items: DataFrame,
      minSupport: Long): DataFrame = {
    // ONE basket aggregation shared by the pair level and the triple
    // level — the previous shape ran the corpus-scale collect_set
    // groupBy twice, once inside pairCounts and once for the triple
    // generator (guide §1.2/§2.4: share the exchange, halve the scans)
    val sets = basketSets(items).localCheckpoint()
    val pairsCk = pairsFromSets(sets, minSupport).select("a", "b")
      .localCheckpoint()
    val hint: DataFrame => DataFrame =
      if (pairsCk.count() <= maxBroadcastPairs) broadcast else identity
    val pairs = pairsCk
    val triples = sets
      .select(explode(expr(
        """flatten(flatten(transform(ps, (x, i) ->
          |  transform(slice(ps, i + 2, size(ps)), (y, j) ->
          |    transform(slice(ps, i + j + 3, size(ps)),
          |      z -> struct(x AS a, y AS b, z AS c))))))""".stripMargin))
        .as("tr"))
      .select(col("tr.a").as("a"), col("tr.b").as("b"), col("tr.c").as("c"))
    val pruned = triples
      .join(hint(pairs), Seq("a", "b"), "left_semi")
      .join(hint(pairs.select(col("a"), col("b").as("c"))),
        Seq("a", "c"), "left_semi")
      .join(hint(pairs.select(col("a").as("b"), col("b").as("c"))),
        Seq("b", "c"), "left_semi")
    pruned.groupBy("a", "b", "c").agg(count(lit(1)).as("n"))
      .filter(col("n") >= minSupport)
      .orderBy(desc("n"), col("a"), col("b"), col("c"))
  }

  def q42b_triples(s: SparkSession, dir: String): DataFrame =
    frequentTriples(Tables.load(s, dir, "lineitem")
      .select(col("l_orderkey").as("basket"), col("l_partkey").as("item")),
      minSupport = 2)

  val q42bSql: String =
    """WITH i AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
      |t AS (SELECT a.l_partkey AS a, b.l_partkey AS b, c.l_partkey AS c
      |      FROM i a
      |      JOIN i b ON a.l_orderkey = b.l_orderkey
      |        AND a.l_partkey < b.l_partkey
      |      JOIN i c ON a.l_orderkey = c.l_orderkey
      |        AND b.l_partkey < c.l_partkey)
      |SELECT a, b, c, count(*) AS n FROM t GROUP BY 1, 2, 3
      |HAVING count(*) >= 2
      |ORDER BY n DESC, a, b, c""".stripMargin

  // --------------------------------------------------------------- Q43b
  /** BM25 RANKED RETRIEVAL over the unigram index — the scoring layer a
    * RAG/search consumer runs on top of q43's structure: for each probe
    * term, the top-5 documents by Okapi BM25 (k1 = 1.2, b = 0.75).
    *
    * Integer-exact variant: the tf-saturation factor is computed in
    * micro-units with the length ratio dl/avgdl carried as
    * dl·N·10⁶ div ΣDL (one corpus-stats row, broadcast), and the idf
    * uses the pre-log odds ratio ((N−df)·2+1)·10⁶ div (df·2+1) — a
    * monotone surrogate for ln-idf that keeps every bit engine-portable
    * (doubles + ln would diverge in the last ulp across libm
    * implementations and break the oracle hash; per-term ranking is
    * unchanged, cross-term sums are documented as surrogate).
    *
    * Plan: token-scale (term, doc) partial-agg tf; probe terms = top-3
    * by document frequency among length ≥ 4 tokens (deterministic,
    * scale-independent selection — a driver-squashed 3-row result that
    * broadcasts back as a semi filter); per-term top-5 through the
    * TopKPerKey bounded heap. Magnitude guard: intermediates stay in
    * Long while tf·2.2e12 and idf_e6·tfn_e6 < 2⁶³ — corpus-stats
    * require() documents the bound rather than silently wrapping. */
  def q43b_bm25(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(s, dir, "documents").select("doc_id", "text")
    val toks = docs
      .select(col("doc_id"), expr("split(trim(text), '\\\\s+')").as("tk"))
      .select(col("doc_id"), size(col("tk")).cast("long").as("dl"),
        explode(col("tk")).as("term"))
      .filter(col("term") =!= "")
      .localCheckpoint() // tf, dl, corpus stats, probe all derive from it
    val tf = toks.groupBy("term", "doc_id")
      .agg(count(lit(1)).as("tf"), first(col("dl")).as("dl"))
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
    // corpus stats: two scalars to the driver (q41's nCust precedent)
    val dls = toks.select("doc_id", "dl").distinct()
    val stats = dls.agg(count(lit(1)).as("n"), sum("dl").as("s")).head()
    val (nDocs, sumDl) = (stats.getLong(0), stats.getLong(1))
    require(sumDl < Long.MaxValue / 2200000L,
      "q43b: corpus token mass overflows the micro-unit BM25 grid — " +
        "rescale the constants for this corpus size")
    val probe = df.filter(length(col("term")) >= 4)
      .orderBy(desc("df"), col("term")).limit(3)
    val scored = tf.join(broadcast(probe), "term")
      .withColumn("dlr_e6",
        expr(s"dl * ${nDocs}L * 1000000 div ${sumDl}L"))
      .withColumn("tfn_e6", expr(
        "tf * 2200000 * 1000000 div " +
          "(tf * 1000000 + 300000 + 9 * dlr_e6 div 10)"))
      .withColumn("idf_e6", expr(
        s"((${nDocs}L - df) * 2 + 1) * 1000000 div (df * 2 + 1)"))
      .withColumn("score_e6", expr("idf_e6 * tfn_e6 div 1000000"))
    val w = Window.partitionBy("term").orderBy(desc("score_e6"),
      col("doc_id"))
    scored.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 5)
      .select(col("term"), col("rk"), col("doc_id"), col("tf"),
        col("score_e6"))
      .orderBy("term", "rk")
  }

  val q43bSql: String =
    """WITH d AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS tk
      |           FROM documents),
      |t AS (SELECT doc_id, CAST(len(tk) AS BIGINT) AS dl,
      |        unnest(tk) AS term
      |      FROM d),
      |tok AS (SELECT * FROM t WHERE term != ''),
      |tf AS (SELECT term, doc_id, count(*) AS tf, MIN(dl) AS dl
      |       FROM tok GROUP BY 1, 2),
      |df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
      |st AS (SELECT CAST(count(*) AS BIGINT) AS n,
      |         CAST(SUM(dl) AS BIGINT) AS s
      |       FROM (SELECT DISTINCT doc_id, dl FROM tok)),
      |probe AS (SELECT term, df FROM df WHERE length(term) >= 4
      |          ORDER BY df DESC, term LIMIT 3),
      |sc AS (SELECT tf.term, tf.doc_id, tf.tf,
      |    ((st.n - p.df) * 2 + 1) * 1000000 // (p.df * 2 + 1) AS idf_e6,
      |    tf.tf * 2200000 * 1000000 // (tf.tf * 1000000 + 300000 +
      |      9 * (tf.dl * st.n * 1000000 // st.s) // 10) AS tfn_e6
      |  FROM tf JOIN probe p ON p.term = tf.term, st),
      |r AS (SELECT term, doc_id, tf,
      |        CAST(idf_e6 * tfn_e6 // 1000000 AS BIGINT) AS score_e6,
      |        row_number() OVER (PARTITION BY term
      |          ORDER BY idf_e6 * tfn_e6 // 1000000 DESC, doc_id) AS rk
      |      FROM sc)
      |SELECT term, CAST(rk AS INT) AS rk, doc_id, tf, score_e6
      |FROM r WHERE rk <= 5
      |ORDER BY term, rk""".stripMargin

  // ----------------------------------------------------------------
  // --------------------------------------------------------------- Q43c
  /** The declared phrase probes (shared by both engines). */
  private[graft] val q43cPhrases: Seq[(String, String)] =
    Seq(("key", "agg"), ("row", "scan"), ("spark", "table"))

  /** PHRASE SEARCH over a POSITIONAL index (q43c) — exact two-word
    * phrase matching by position adjacency: postings (term, doc, pos)
    * from one row-local posexplode, probe terms selected MAP-SIDE by a
    * broadcast join against the (tiny, declared) phrase list, then the
    * adjacency test is an EQUI join on (doc_id, pos+1) — never a text
    * scan with LIKE, never a non-equi position window. Per phrase:
    * matching docs, total occurrences, max per doc. This is the probe
    * path a positional inverted index exists for; for one-off fixed
    * phrases a row-local token scan (the q24_collocations idiom) wins —
    * build the index when the corpus is probed many times.
    *
    * Scale: BOTH join sides are postings FILTERED to probe terms before
    * the exchange (selectivity |probe terms| / |vocab|) — the first-word
    * side by the broadcast probe join, the adjacency side by a literal
    * `isin` over the declared second words (a map-side predicate; the
    * per-phrase t2 = w2 pairing can only apply inside the join, so
    * without the isin the FULL token stream would shuffle on doc_id).
    * The adjacency join is hash-partitioned on doc_id, and the rollups
    * are |phrases|-key partial aggs. */
  def q43c_phrase(s: SparkSession, dir: String): DataFrame = {
    val post = Tables.load(s, dir, "documents")
      .select(col("doc_id"),
        posexplode(split(trim(col("text")), "\\s+")).as(Seq("pos", "term")))
    import s.implicits._
    val probe = q43cPhrases.toDF("w1", "w2")
    val a = post.join(broadcast(probe), col("term") === col("w1"))
      .select(col("w1"), col("w2"), col("doc_id"), col("pos"))
    val b = post
      .filter(col("term").isin(q43cPhrases.map(_._2).distinct: _*))
      .select(col("term").as("t2"), col("doc_id").as("d2"),
        col("pos").as("p2"))
    a.join(b, col("d2") === col("doc_id") && col("p2") === col("pos") + 1
        && col("t2") === col("w2"))
      .groupBy("w1", "w2", "doc_id").agg(count(lit(1)).as("k"))
      .groupBy(concat_ws(" ", col("w1"), col("w2")).as("phrase"))
      .agg(count(lit(1)).as("n_docs"), sum("k").as("n_occ"),
        max("k").as("max_in_doc"))
      .orderBy("phrase")
  }

  val q43cSql: String = {
    val vals = q43cPhrases.map { case (a, b) => s"('$a','$b')" }
      .mkString(", ")
    s"""WITH d AS (SELECT doc_id, string_split_regex(trim(text), '\\s+')
       |             AS tk
       |           FROM documents),
       |post AS (SELECT doc_id, CAST(i.i AS INT) - 1 AS pos, tk[i.i] AS term
       |         FROM d, LATERAL (SELECT unnest(range(1, len(tk) + 1)) AS i)
       |           i),
       |ph(w1, w2) AS (VALUES $vals),
       |m AS (SELECT ph.w1, ph.w2, a.doc_id
       |      FROM post a JOIN ph ON a.term = ph.w1
       |      JOIN post b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
       |        AND b.term = ph.w2),
       |per AS (SELECT w1, w2, doc_id, count(*) AS k FROM m GROUP BY 1, 2, 3)
       |SELECT w1 || ' ' || w2 AS phrase, CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(SUM(k) AS BIGINT) AS n_occ, CAST(MAX(k) AS BIGINT)
       |    AS max_in_doc
       |FROM per GROUP BY 1 ORDER BY phrase""".stripMargin
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q42_cooccur" -> (q42_cooccur _),
    "q42c_related" -> (q42c_related _),
    "q42b_triples" -> (q42b_triples _),
    "q43_index" -> (q43_index _),
    "q43b_bm25" -> (q43b_bm25 _),
    "q43c_phrase" -> (q43c_phrase _))

  def oracles: Map[String, String] = Map(
    "q42_cooccur" -> q42Sql,
    "q42c_related" -> q42cSql,
    "q42b_triples" -> q42bSql,
    "q43_index" -> q43Sql,
    "q43b_bm25" -> q43bSql,
    "q43c_phrase" -> q43cSql)
}
