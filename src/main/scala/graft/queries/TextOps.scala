package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Q24 family — text analysis for training-data pipelines
  * (SURVEY.md §2.4 north star): token stats, language-ID heuristic,
  * quality scoring, document fingerprinting.
  *
  * All four are pure row-local expressions + one aggregation, so they
  * scale embarrassingly (no shuffle except the final small group-by) and
  * are oracle-checked exactly: similarity/ratio math stays in integers.
  */
object TextOps {

  private val stopwords =
    Seq("the", "a", "of", "and", "to", "in", "is", "it", "for", "on")
  private val stopwordsSqlList = stopwords.map(w => s"'$w'").mkString(", ")

  private def toks(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")
      .withColumn("toks", expr("split(trim(text), '\\\\s+')"))
      .withColumn("n_toks", size(col("toks")).cast("long"))

  // ------------------------------------------------------------- stats
  /** Corpus token statistics per language: doc/token/char counts.
    * Map-side partial agg → 5-row result. */
  def q24_text_stats(s: SparkSession, dir: String): DataFrame =
    toks(s, dir)
      .withColumn("n_distinct", size(array_distinct(col("toks")))
        .cast("long"))
      .groupBy("lang")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_toks")).as("sum_toks"),
        max(col("n_toks")).as("max_toks"),
        min(col("n_toks")).as("min_toks"),
        sum(col("n_distinct")).as("sum_distinct"),
        sum(length(col("text")).cast("long")).as("sum_chars"))
      .orderBy("lang")

  val q24StatsSql: String =
    """WITH d AS (SELECT lang, string_split_regex(trim(text), '\s+') AS tk,
      |    length(text) AS n_chars_c
      |  FROM documents)
      |SELECT lang, COUNT(*) AS n_docs,
      |  CAST(SUM(len(tk)) AS BIGINT) AS sum_toks,
      |  CAST(MAX(len(tk)) AS BIGINT) AS max_toks,
      |  CAST(MIN(len(tk)) AS BIGINT) AS min_toks,
      |  CAST(SUM(len(list_distinct(tk))) AS BIGINT) AS sum_distinct,
      |  CAST(SUM(n_chars_c) AS BIGINT) AS sum_chars
      |FROM d GROUP BY lang ORDER BY lang""".stripMargin

  // ------------------------------------------------------------ langid
  /** N-gram-free language-ID heuristic: stopword-hit ratio, integer
    * threshold (4*hits >= n_toks → 'en'-like). A real system would use
    * char-n-gram profiles per language; the Spark shape (row-local
    * expression, no shuffle) is identical. */
  def q24_langid(s: SparkSession, dir: String): DataFrame =
    toks(s, dir)
      .withColumn("en_hits",
        size(expr(s"filter(toks, t -> t IN ($stopwordsSqlList))"))
          .cast("long"))
      .withColumn("pred",
        when(col("en_hits") * 4 >= col("n_toks"), lit("en"))
          .otherwise(lit("und")))
      .select("doc_id", "lang", "n_toks", "en_hits", "pred")
      .orderBy("doc_id")

  val q24LangidSql: String =
    s"""WITH d AS (SELECT doc_id, lang,
       |    string_split_regex(trim(text), '\\s+') AS tk
       |  FROM documents),
       |h AS (SELECT doc_id, lang, CAST(len(tk) AS BIGINT) AS n_toks,
       |    CAST(len(list_filter(tk, t -> t IN ($stopwordsSqlList))) AS BIGINT)
       |      AS en_hits
       |  FROM d)
       |SELECT doc_id, lang, n_toks, en_hits,
       |  CASE WHEN en_hits * 4 >= n_toks THEN 'en' ELSE 'und' END AS pred
       |FROM h ORDER BY doc_id""".stripMargin

  // ----------------------------------------------------------- quality
  /** Quality scoring with integer-only signals: token counts, repetition
    * (n_toks - n_distinct), mean-token-length numerator, and a boolean
    * gate — the length/stopword/repetition filters of a C4-style
    * pipeline. */
  def q24_quality(s: SparkSession, dir: String): DataFrame =
    toks(s, dir)
      .withColumn("n_distinct", size(array_distinct(col("toks")))
        .cast("long"))
      .withColumn("n_repeated", col("n_toks") - col("n_distinct"))
      .withColumn("alpha_chars",
        length(regexp_replace(col("text"), "[^a-z]", "")).cast("long"))
      .withColumn("quality_ok",
        col("n_toks") >= 20 && col("n_repeated") * 2 < col("n_toks"))
      .select("doc_id", "n_toks", "n_distinct", "n_repeated",
        "alpha_chars", "quality_ok")
      .orderBy("doc_id")

  val q24QualitySql: String =
    """WITH d AS (SELECT doc_id, text,
      |    string_split_regex(trim(text), '\s+') AS tk
      |  FROM documents),
      |m AS (SELECT doc_id, CAST(len(tk) AS BIGINT) AS n_toks,
      |    CAST(len(list_distinct(tk)) AS BIGINT) AS n_distinct,
      |    CAST(length(regexp_replace(text, '[^a-z]', '', 'g')) AS BIGINT)
      |      AS alpha_chars
      |  FROM d)
      |SELECT doc_id, n_toks, n_distinct, n_toks - n_distinct AS n_repeated,
      |  alpha_chars,
      |  (n_toks >= 20 AND (n_toks - n_distinct) * 2 < n_toks) AS quality_ok
      |FROM m ORDER BY doc_id""".stripMargin

  // ------------------------------------------------------ token count
  /** Token counting two ways per doc: whitespace tokens and a BPE-ish
    * regex segmentation (letter runs, digit runs, single
    * non-alphanumeric marks — the coarse shape of a byte-pair pretoken
    * split). Row-local; the pattern is deliberately RE2/Java-portable so
    * both engines segment identically. */
  def q24_token_count(s: SparkSession, dir: String): DataFrame =
    toks(s, dir)
      .withColumn("n_bpe", size(expr(
        """regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]', 0)"""))
        .cast("long"))
      // `div` (integer division) matches DuckDB's `//` — `/` on longs
      // would widen to double and break the hash compare
      .withColumn("pct_vs_ws",
        when(col("n_toks") > 0, expr("n_bpe * 100 div n_toks")))
      .select("doc_id", "n_toks", "n_bpe", "pct_vs_ws")
      .orderBy("doc_id")

  val q24TokenCountSql: String =
    """WITH d AS (SELECT doc_id,
      |    CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT)
      |      AS n_toks,
      |    CAST(len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]'))
      |      AS BIGINT) AS n_bpe
      |  FROM documents)
      |SELECT doc_id, n_toks, n_bpe,
      |  CASE WHEN n_toks > 0 THEN n_bpe * 100 // n_toks END AS pct_vs_ws
      |FROM d ORDER BY doc_id""".stripMargin

  // --------------------------------------------------------- classify
  /** HASHED-FEATURE LINEAR CLASSIFIER inference — the hashing-trick
    * quality/spam gate (fastText / Vowpal Wabbit shape) run the way it
    * runs at 100 TB: one row-local codegen pass per document
    * (graft.functions.HashedLinearScore — tokenize, poly-hash each
    * token into one of 256 weight buckets, sum the bucket weights),
    * zero shuffles before the output sort. Weights are a deterministic
    * Knuth mix of the bucket id into [−1000, 1000] so DuckDB replays
    * the scoring exactly (a real model swaps in trained weights; the
    * plan shape — inference as a scan-side scalar — is the product). */
  def q24_classify(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")
      .withColumn("score",
        graft.functions.native.hashedLinearScore(col("text")))
      .select(col("doc_id"), col("score"),
        (col("score") > 0).as("flagged"))
      .orderBy("doc_id")

  /** Oracle: per-token rolling hash → bucket → weight, re-summed in
    * SQL (empty tokens filtered exactly as the kernel skips them). */
  val q24ClassifySql: String =
    """WITH tok AS (
      |  SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS t
      |  FROM documents),
      |w AS (SELECT doc_id,
      |    (list_reduce(list_prepend(CAST(0 AS BIGINT),
      |        list_transform(range(1, length(t)+1),
      |          i -> CAST(ascii(substring(t, i, 1)) AS BIGINT))),
      |      (acc, c) -> (acc * 31 + c) % 1000000007) % 256)
      |      * 2654435761 % 4294967296 % 2001 - 1000 AS w
      |  FROM tok WHERE t != ''),
      |sc AS (SELECT doc_id, CAST(COALESCE(SUM(w), 0) AS BIGINT) AS score
      |  FROM w GROUP BY doc_id)
      |SELECT d.doc_id, COALESCE(sc.score, 0) AS score,
      |  COALESCE(sc.score, 0) > 0 AS flagged
      |FROM documents d LEFT JOIN sc ON sc.doc_id = d.doc_id
      |ORDER BY d.doc_id""".stripMargin

  // ------------------------------------------------------- fingerprint
  /** Rolling polynomial hash of the document (mod 1e9+7) — a content
    * fingerprint whose fold both engines evaluate in the same order.
    * Winnowing/shingled fingerprints reuse the same kernel per window. */
  def q24_fingerprint(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")
      // native codegen'd kernel (graft.functions.RollingHash): one pass
      // over the string, vs the O(len²) interpreted
      // transform(sequence, substring) fold it replaces
      .withColumn("fp", graft.functions.native.rollingHash(col("text")))
      .select("doc_id", "fp")
      .orderBy("doc_id")

  val q24FingerprintSql: String =
    """SELECT doc_id,
      |  list_reduce(
      |    list_prepend(CAST(0 AS BIGINT),
      |      list_transform(range(1, length(text)+1),
      |        i -> CAST(ascii(substring(text, i, 1)) AS BIGINT))),
      |    (acc, c) -> (acc * 31 + c) % 1000000007) AS fp
      |FROM documents ORDER BY doc_id""".stripMargin

  // ------------------------------------------------------------ vocab
  /** Corpus vocabulary: top-500 whitespace tokens by frequency — the
    * first step of tokenizer/vocab training. explode → count is the
    * right 100 TB shape BECAUSE of map-side partial aggregation: the
    * shuffle carries one (token, partial_n) row per distinct token per
    * partition, not one row per occurrence; the global top-k is a
    * TakeOrderedAndProject (per-partition heap + driver merge of
    * 500-row heads), never a full sort. Ties break on the token for a
    * total order. */
  def q24_vocab(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")
      .select(explode(split(trim(col("text")), "\\s+")).as("token"))
      .groupBy("token")
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("token"))
      .limit(500)

  val q24VocabSql: String =
    """WITH tok AS (
      |  SELECT unnest(string_split_regex(trim(text), '\s+')) AS token
      |  FROM documents)
      |SELECT token, count(*) AS n
      |FROM tok
      |GROUP BY token
      |ORDER BY n DESC, token
      |LIMIT 500""".stripMargin

  /** ZIPF RANK-FREQUENCY diagnostic (q24_zipf) — the vocabulary's
    * frequency mass per power-of-two rank band: the curve a tokenizer /
    * corpus-quality review reads to see whether token frequencies decay
    * like natural language (straight line in log-log) or like template
    * spam (mass bulging in one band). A term's band comes from its
    * TIE-FREE rank base — the count of terms with STRICTLY higher
    * frequency — so no within-frequency ordering exists to funnel the
    * vocabulary-scale freq=1 tie class through one window task:
    * after the token-scale tf aggregate everything is FREQUENCY-
    * HISTOGRAM scale (|distinct freqs| rows), ranked by the keyless
    * two-level PrefixSum (descending via negated freq), banded by
    * integer log2 (binary-string length — no float log anywhere).
    * Output: band k covers rank base + 1 ∈ [2^k, 2^(k+1)). */
  def q24_zipf(s: SparkSession, dir: String): DataFrame = {
    val tf = Tables.load(s, dir, "documents")
      .select(explode(split(trim(col("text")), "\\s+")).as("token"))
      .groupBy("token")
      .agg(count(lit(1)).as("n"))
    // histogram materialized: PrefixSum forks its input, and the fork
    // would otherwise re-explode the token stream (PrefixCarry's note)
    val hist = tf.groupBy("n").agg(count(lit(1)).as("cf"))
      .withColumn("negn", -col("n"))
      .localCheckpoint()
    // whole-range bucket: histogram-scale input, no auto-sizer job
    PrefixSum.exclusiveRunningSum(hist, "cf", "higher",
        seqCol = "negn", bucketSize = 1L << 33)
      .withColumn("band", (length(bin(col("higher") + 1)) - 1).cast("int"))
      .groupBy("band")
      .agg(sum(col("cf")).as("n_terms"),
        sum(col("n") * col("cf")).as("n_occurrences"),
        max(col("n")).as("max_freq"),
        min(col("n")).as("min_freq"))
      .orderBy("band")
  }

  val q24ZipfSql: String =
    """WITH tok AS (
      |  SELECT unnest(string_split_regex(trim(text), '\s+')) AS token
      |  FROM documents),
      |tf AS (SELECT token, count(*) AS n FROM tok GROUP BY 1),
      |h AS (SELECT n, count(*) AS cf FROM tf GROUP BY 1),
      |hi AS (SELECT n, cf,
      |    CAST(COALESCE(SUM(cf) OVER (ORDER BY n DESC
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
      |      AS BIGINT) AS higher
      |  FROM h)
      |SELECT CAST(length(format('{:b}', higher + 1)) - 1 AS INT) AS band,
      |  CAST(SUM(cf) AS BIGINT) AS n_terms,
      |  CAST(SUM(n * cf) AS BIGINT) AS n_occurrences,
      |  MAX(n) AS max_freq, MIN(n) AS min_freq
      |FROM hi GROUP BY 1 ORDER BY band""".stripMargin

  /** TF-IDF top terms per document — the classic relevance/quality
    * primitive, in INTEGER math so both engines agree bit-for-bit:
    * idf_micro = (1_000_000 × N) div df (floor division stands in for
    * the log — monotone in N/df, which is all ranking needs), score =
    * tf × idf_micro, top 5 per doc by (score desc, token asc).
    *
    * Scale: tf and df are partial-agg groupBys (map-side combine); the
    * tf↔df join shuffles on token (the honest path — at corpus scale
    * the vocabulary outgrows any broadcast); the per-doc top-5 is a
    * `row_number <= k` filter, the exact shape the TopKPerKey rewrite
    * turns into a bounded-heap partial instead of a per-doc sort. */
  def q24_tfidf(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.load(s, dir, "documents")
    val n = d.count() // one tiny job; N is a query constant both engines
    val tok = d.select(col("doc_id"),
      explode(split(trim(col("text")), "\\s+")).as("token"))
    val tf = tok.groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
    val df = tok.select("doc_id", "token").distinct()
      .groupBy("token").agg(count(lit(1)).as("df"))
    val w = Window.partitionBy("doc_id")
      .orderBy(col("score_micro").desc, col("token"))
    tf.join(df, "token")
      .withColumn("score_micro",
        col("tf") * expr(s"(1000000 * ${n}L) div df"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 5)
      .select(col("doc_id"), col("rk").cast("long").as("rk"),
        col("token"), col("tf"), col("df"), col("score_micro"))
      .orderBy("doc_id", "rk")
  }

  val q24TfidfSql: String =
    """WITH tok AS (SELECT doc_id,
      |    unnest(string_split_regex(trim(text), '\s+')) AS token
      |  FROM documents),
      |tf AS (SELECT doc_id, token, count(*) AS tf FROM tok GROUP BY 1, 2),
      |df AS (SELECT token, count(DISTINCT doc_id) AS df FROM tok GROUP BY 1),
      |n AS (SELECT count(*) AS n FROM documents),
      |sc AS (SELECT doc_id, token, tf, df,
      |    tf * ((1000000 * n) // df) AS score_micro
      |  FROM tf JOIN df USING (token), n),
      |rk AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
      |    ORDER BY score_micro DESC, token) AS rk FROM sc)
      |SELECT doc_id, CAST(rk AS BIGINT) AS rk, token, tf, df, score_micro
      |FROM rk WHERE rk <= 5
      |ORDER BY doc_id, rk""".stripMargin

  /** Corpus-LM quality score — the CCNet/Gopher "perplexity filter"
    * shape with an integer-exact statistic: score each document by the
    * mean corpus frequency of its token BIGRAMS. Documents whose
    * bigrams are rare in the corpus (gibberish, OCR noise, unusual
    * boilerplate) score low; templated/common prose scores high. A
    * production pipeline swaps the corpus-frequency table for an
    * external LM's n-gram table — the join/aggregate shape is
    * identical. Integer mean (`div`) keeps the score hash-exact.
    *
    * Scale: bigram extraction is row-local (`transform` over the token
    * array); the corpus bigram-count table is ONE partial-agg groupBy
    * (map-side combine collapses the zipf head before the shuffle); the
    * doc↔count join shuffles on the bigram where AQE's skew split
    * handles the hot head; the per-doc fold-back is a second partial
    * agg keyed on doc_id. Nothing is driver-side, nothing is quadratic. */
  def q24_lm_score(s: SparkSession, dir: String): DataFrame = {
    val d = toks(s, dir).select("doc_id", "toks", "n_toks")
    val bg = d.withColumn("bg", explode(expr(
        """CASE WHEN size(toks) >= 2
          |THEN transform(sequence(0, size(toks) - 2),
          |               i -> concat(toks[i], ' ', toks[i + 1]))
          |ELSE array() END""".stripMargin)))
      .select("doc_id", "bg")
    val counts = bg.groupBy("bg").agg(count(lit(1)).as("cnt"))
    val perDoc = bg.join(counts, "bg")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"), sum(col("cnt")).as("freq_sum"))
    d.select("doc_id", "n_toks")
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_toks"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("freq_sum"), lit(0L)).as("freq_sum"),
        coalesce(expr("freq_sum div n_bigrams"), lit(0L)).as("lm_score"))
      .orderBy("doc_id")
  }

  val q24LmScoreSql: String =
    """WITH d AS (SELECT doc_id,
      |    string_split_regex(trim(text), '\s+') AS tk
      |  FROM documents),
      |b AS (SELECT doc_id,
      |    unnest(list_transform(range(1, len(tk)),
      |      i -> tk[i] || ' ' || tk[i + 1])) AS bg
      |  FROM d),
      |c AS (SELECT bg, count(*) AS cnt FROM b GROUP BY 1),
      |p AS (SELECT doc_id, count(*) AS n_bigrams,
      |    CAST(SUM(cnt) AS BIGINT) AS freq_sum
      |  FROM b JOIN c USING (bg) GROUP BY 1)
      |SELECT d.doc_id, CAST(len(d.tk) AS BIGINT) AS n_toks,
      |  COALESCE(p.n_bigrams, 0) AS n_bigrams,
      |  COALESCE(p.freq_sum, 0) AS freq_sum,
      |  COALESCE(p.freq_sum // p.n_bigrams, 0) AS lm_score
      |FROM d LEFT JOIN p USING (doc_id)
      |ORDER BY doc_id""".stripMargin

  /** BPE tokenizer-training step: corpus-wide adjacent character-pair
    * frequencies (the statistic each merge round of byte-pair encoding
    * maximizes), top-200 by (count desc, pair asc).
    *
    * Scale: the corpus collapses to its DISTINCT-WORD histogram first —
    * the classic BPE trick; at 100 TB the vocabulary is ~10⁸ rows where
    * the token stream is ~10¹³, so the character-level work runs on a
    * 10⁵× smaller input. Both groupBys are partial-agg shuffles
    * (map-side combine), and the top-200 is TakeOrderedAndProject
    * (per-partition heaps + driver merge), never a full sort. Pair
    * extraction is a row-local `transform` over the word — overlapping
    * pairs counted, as BPE's statistic requires. */
  def q24_bpe_pairs(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")
      .select(explode(split(trim(col("text")), "\\s+")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("freq"))
      // length-1 words contribute no pair; the guard also keeps
      // sequence(1, length-1) ascending (sequence(1, 0) is DESCENDING
      // in Spark, not empty)
      .filter(length(col("w")) >= 2)
      .select(explode(expr(
        "transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))"))
        .as("pair"), col("freq"))
      .groupBy("pair").agg(sum(col("freq")).as("cnt"))
      .orderBy(col("cnt").desc, col("pair"))
      .limit(200)

  val q24BpePairsSql: String =
    """WITH w AS (SELECT unnest(string_split_regex(trim(text), '\s+')) AS w
      |           FROM documents),
      |wf AS (SELECT w, count(*) AS freq FROM w GROUP BY w),
      |p AS (SELECT unnest(list_transform(range(1, length(w)),
      |        i -> substring(w, i, 2))) AS pair, freq
      |      FROM wf WHERE length(w) >= 2)
      |SELECT pair, CAST(sum(freq) AS BIGINT) AS cnt
      |FROM p GROUP BY pair
      |ORDER BY cnt DESC, pair
      |LIMIT 200""".stripMargin

  /** BPE merge TRAINING, three iterations — the loop q24_bpe_pairs is
    * one statistic of: count adjacent symbol pairs over the
    * distinct-word histogram, adopt the most frequent pair as a merge,
    * apply it greedily (left-to-right, non-overlapping) to every word's
    * symbol sequence, repeat. Emits the learned merge table
    * (iteration, left, right, pair count).
    *
    * Scale: identical to bpe_pairs — all character-level work runs on
    * the vocabulary histogram (10⁵× smaller than the token stream at
    * corpus scale); each iteration is one partial-agg pair count plus a
    * ROW-LOCAL merge apply (an `aggregate` fold carrying (out, just-
    * merged) state, so overlapping occurrences resolve exactly like
    * the reference greedy scan). The per-iteration `.limit(1).collect`
    * is the k-means-style driver decision: ONE row crosses to the
    * driver per merge, never data. Checkpoint per iteration truncates
    * the growing lineage. Tiebreak (count desc, pair) is total, so the
    * learned merges are deterministic at any partitioning.
    *
    * SQL oracle (q24BpeTrainSql): the greedy apply IS expressible —
    * iterated leftmost-pair replacement (a recursive CTE per iteration)
    * equals the single-pass fold, because a merged token can never
    * re-create its own left or right symbol (|l·r| > |l|, |r|), so no
    * new (l, r) occurrence ever forms across a replacement boundary and
    * both procedures compute the same maximal left-greedy matching. The
    * ScalaTest pin against an independent single-machine BPE reference
    * stays as the semantic check. */
  def q24_bpe_train(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val (merges, _) = bpeLoop(s, dir, iterations = 3, applyLast = false)
    merges.toDF("iter", "left", "right", "cnt").orderBy("iter")
  }

  /** Shared BPE merge-learning loop (q24_bpe_train emits the merges,
    * q24_bpe_encode consumes the fully-merged vocabulary). Carries the
    * word alongside its symbol sequence so the final vocabulary is a
    * (w → tokens) lookup; `applyLast` controls whether the final
    * iteration's merge is applied (training doesn't need it — nothing
    * downstream reads the vocab — encoding does). */
  private def bpeLoop(s: SparkSession, dir: String, iterations: Int,
      applyLast: Boolean): (Seq[(Int, String, String, Long)], DataFrame) = {
    var vocab = Tables.load(s, dir, "documents")
      .select(explode(split(trim(col("text")), "\\s+")).as("w"))
      .filter(length(col("w")) >= 1)
      .groupBy("w").agg(count(lit(1)).as("freq"))
      .select(col("w"), expr(
        "transform(sequence(1, length(w)), i -> substring(w, i, 1))")
        .as("sym"), col("freq"))
      .localCheckpoint()
    val merges = Seq.newBuilder[(Int, String, String, Long)]
    for (it <- 1 to iterations) {
      val tops = vocab.filter(size(col("sym")) >= 2)
        .select(explode(expr(
          "transform(sequence(1, size(sym) - 1)," +
            " i -> struct(sym[i - 1] AS l, sym[i] AS r))")).as("p"),
          col("freq"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("freq")).as("cnt"))
        .orderBy(col("cnt").desc, col("l"), col("r"))
        .limit(1).collect()
      require(tops.nonEmpty,
        s"BPE corpus exhausted before merge $it of $iterations — no " +
          "word has two symbols left; lower the iteration count")
      val top = tops(0)
      val (l, r, cnt) = (top.getString(0), top.getString(1), top.getLong(2))
      merges += ((it, l, r, cnt))
      // greedy left-to-right apply. No just-merged flag is needed: the
      // merged token l+r can never equal l (r is non-empty), so the
      // last-output-element check alone gives non-overlapping greedy
      // semantics ("aaa" + merge(a,a) -> [aa, a]: after the merge the
      // last element is "aa" != "a", and the final "a" appends).
      if (it < iterations || applyLast) {
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
        vocab = vocab.select(col("w"), applied.as("sym"), col("freq"))
          .localCheckpoint()
      }
    }
    (merges.result(), vocab)
  }

  /** Distributed tokenizer APPLY (BPE encode) — the deployment half of
    * q24_bpe_train: learn the 3 merges, then tokenize the corpus with
    * them and emit per-document whitespace-token and BPE-token counts.
    *
    * Scale: tokenization cost rides the DISTINCT-WORD vocabulary, not
    * the token stream — a word's tokenization depends only on the word,
    * so each distinct word is encoded ONCE (the same 10⁵× collapse the
    * training loop exploits) and token counts rejoin the corpus through
    * a narrow (w, n_sym) equi-join against the per-(doc, word)
    * histogram. Encoding every token occurrence would fold ~10¹³ cells
    * at 100 TB; this folds ~10⁸ vocabulary rows and shuffles only
    * (doc_id, w, c) triples. */
  def q24_bpe_encode(s: SparkSession, dir: String): DataFrame = {
    val (_, vocab) = bpeLoop(s, dir, iterations = 3, applyLast = true)
    val wordTok = vocab.select(col("w"),
      size(col("sym")).cast("long").as("n_sym"))
    Tables.load(s, dir, "documents")
      .select(col("doc_id"),
        explode(split(trim(col("text")), "\\s+")).as("w"))
      .filter(length(col("w")) >= 1)
      .groupBy("doc_id", "w").agg(count(lit(1)).as("c"))
      .join(wordTok, "w")
      .groupBy("doc_id")
      .agg(sum(col("c")).as("n_toks"),
        sum(col("c") * col("n_sym")).as("n_bpe"))
      .orderBy("doc_id")
  }

  /** DuckDB twin of the 3-iteration training loop. Each iteration is a
    * pair-count CTE + LIMIT 1 top pick (same (cnt DESC, l, r) total
    * tiebreak as the Spark side) + a RECURSIVE apply: rows still
    * containing the pair replace their LEFTMOST occurrence and recurse;
    * a row exits when no occurrence remains (see q24_bpe_train scaladoc
    * for why leftmost-iterate == the greedy fold). The top row is
    * cross-joined into the recursion because DuckDB lambdas cannot hold
    * subqueries. */
  /** Pair-count + top-pick CTE pair for BPE iteration n — shared by the
    * train and encode oracles. */
  private def bpeStageSql(n: Int, vocab: String): String =
    s"""cnt$n AS (SELECT p.l AS l, p.r AS r, CAST(SUM(freq) AS BIGINT) AS cnt
       |  FROM (SELECT unnest(list_transform(range(1, len(sym)),
       |          i -> struct_pack(l := sym[i], r := sym[i+1]))) AS p, freq
       |        FROM $vocab WHERE len(sym) >= 2) t
       |  GROUP BY 1, 2),
       |top$n AS (SELECT l, r, cnt FROM cnt$n
       |  ORDER BY cnt DESC, l, r LIMIT 1)""".stripMargin

  private val bpeIdxSql = "list_aggregate(list_transform(range(1, len(sym)), " +
    "i -> CASE WHEN sym[i] = l AND sym[i+1] = r THEN i END), 'min')"

  /** Recursive greedy-apply CTE pair for BPE iteration n; `carryW`
    * threads the word column through the recursion (the encode oracle
    * needs the final vocab keyed by word, training doesn't). */
  private def bpeApplySql(n: Int, vocab: String,
      carryW: Boolean = false): String = {
    val idx = bpeIdxSql
    val wCol = if (carryW) "w, " else ""
    s"""r$n(${wCol}sym, freq, l, r) AS (
       |  SELECT ${if (carryW) "v.w, " else ""}v.sym, v.freq, t.l, t.r
       |  FROM $vocab v, top$n t
       |  UNION ALL
       |  SELECT ${wCol}list_concat(list_concat(sym[1:($idx)-1], [l || r]),
       |      sym[($idx)+2:]) AS sym, freq, l, r
       |  FROM r$n WHERE $idx IS NOT NULL),
       |ap$n AS (SELECT ${wCol}sym, freq FROM r$n WHERE $idx IS NULL)"""
      .stripMargin
  }

  val q24BpeTrainSql: String =
    s"""WITH RECURSIVE
       |w AS (SELECT unnest(string_split_regex(trim(text), '\\s+')) AS w
       |      FROM documents),
       |v0 AS (SELECT list_transform(range(1, length(w)+1), i -> w[i:i])
       |         AS sym,
       |        CAST(count(*) AS BIGINT) AS freq
       |       FROM w WHERE length(w) >= 1 GROUP BY w),
       |${bpeStageSql(1, "v0")},
       |${bpeApplySql(1, "v0")},
       |${bpeStageSql(2, "ap1")},
       |${bpeApplySql(2, "ap1")},
       |${bpeStageSql(3, "ap2")}
       |SELECT * FROM (
       |  SELECT CAST(1 AS INT) AS iter, l AS "left", r AS "right", cnt
       |  FROM top1
       |  UNION ALL SELECT 2, l, r, cnt FROM top2
       |  UNION ALL SELECT 3, l, r, cnt FROM top3)
       |ORDER BY iter""".stripMargin

  /** DuckDB twin of the encode pass: the same three learned merges
    * (train CTE chain, words carried), the THIRD merge also applied
    * (ap3), then per-doc word counts join the tokenized vocabulary. */
  val q24BpeEncodeSql: String =
    s"""WITH RECURSIVE
       |w AS (SELECT unnest(string_split_regex(trim(text), '\\s+')) AS w
       |      FROM documents),
       |v0 AS (SELECT w,
       |        list_transform(range(1, length(w)+1), i -> w[i:i]) AS sym,
       |        CAST(count(*) AS BIGINT) AS freq
       |       FROM w WHERE length(w) >= 1 GROUP BY w),
       |${bpeStageSql(1, "v0")},
       |${bpeApplySql(1, "v0", carryW = true)},
       |${bpeStageSql(2, "ap1")},
       |${bpeApplySql(2, "ap1", carryW = true)},
       |${bpeStageSql(3, "ap2")},
       |${bpeApplySql(3, "ap2", carryW = true)},
       |dc AS (SELECT doc_id, dw.w, CAST(count(*) AS BIGINT) AS c
       |       FROM (SELECT doc_id,
       |               unnest(string_split_regex(trim(text), '\\s+')) AS w
       |             FROM documents) dw
       |       WHERE length(dw.w) >= 1 GROUP BY 1, 2)
       |SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_toks,
       |  CAST(SUM(c * len(sym)) AS BIGINT) AS n_bpe
       |FROM dc JOIN ap3 USING (w)
       |GROUP BY doc_id
       |ORDER BY doc_id""".stripMargin

  /** Exact per-language length quantiles (p50/p90/p99 of `n_chars`) via
    * the VALUE-HISTOGRAM cumsum — the scale-safe exact-quantile shape:
    * rank r(q) = ⌈q·n⌉ picks the smallest value whose cumulative count
    * reaches it, and `cum ≥ ⌈q·n⌉ ⟺ cum·denom ≥ num·n` keeps the
    * comparison in integers (no float rank math to disagree on).
    *
    * Scale: the window runs over the per-language VALUE histogram (one
    * row per distinct length — bounded by value cardinality, ~10⁴), not
    * over documents — a `percentile` window over raw rows would funnel
    * every doc of a hot language through one task. The histogram itself
    * is a partial-agg groupBy. If value cardinality ever rivaled row
    * count, the histogram window would bucket two-level like
    * graft.queries.PrefixSum. */
  def q24_quantiles(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.load(s, dir, "documents").select("lang", "n_chars")
    val w = Window.partitionBy("lang").orderBy("n_chars")
      .rowsBetween(Window.unboundedPreceding, 0)
    // n_docs = the cumsum's last value per language — a second window
    // over the SAME partitioning (no new shuffle), not a second corpus
    // scan: the histogram already holds every count
    val cum = d.groupBy("lang", "n_chars").agg(count(lit(1)).as("c"))
      .withColumn("cum", sum(col("c")).over(w))
      .withColumn("n_docs", max(col("cum")).over(Window.partitionBy("lang")))
    cum.groupBy("lang")
      .agg(
        max(col("n_docs")).as("n_docs"),
        min(when(col("cum") * 2 >= col("n_docs"), col("n_chars"))).as("p50"),
        min(when(col("cum") * 10 >= col("n_docs") * 9, col("n_chars")))
          .as("p90"),
        min(when(col("cum") * 100 >= col("n_docs") * 99, col("n_chars")))
          .as("p99"))
      .orderBy("lang")
  }

  val q24QuantilesSql: String =
    """WITH h AS (SELECT lang, n_chars, count(*) AS c
      |           FROM documents GROUP BY 1, 2),
      |cum AS (SELECT lang, n_chars, sum(c) OVER (PARTITION BY lang
      |          ORDER BY n_chars
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      |        FROM h),
      |tot AS (SELECT lang, count(*) AS n_docs FROM documents GROUP BY 1)
      |SELECT lang, n_docs,
      |  min(CASE WHEN cum * 2 >= n_docs THEN n_chars END) AS p50,
      |  min(CASE WHEN cum * 10 >= n_docs * 9 THEN n_chars END) AS p90,
      |  min(CASE WHEN cum * 100 >= n_docs * 99 THEN n_chars END) AS p99
      |FROM cum JOIN tot USING (lang)
      |GROUP BY lang, n_docs
      |ORDER BY lang""".stripMargin

  /** Sketch twin of q24_quantiles — `percentile_approx` (Greenwald-
    * Khanna) per language: the 100 TB path when even the value histogram
    * is too wide, trading exactness for constant-size mergeable state
    * (one sketch per partition per language, merged map-side — no
    * histogram shuffle, no window at all). Sketch internals are
    * engine-specific → rows-only driver check; TextMlOpsSpec bounds the
    * sketch against the exact histogram answer, the same pairing as
    * q04/q04b. */
  def q24_quantiles_approx(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        percentile_approx(col("n_chars"),
          array(lit(0.5), lit(0.9), lit(0.99)), lit(10000)).as("ps"))
      .select(col("lang"), col("n_docs"),
        col("ps").getItem(0).as("p50"), col("ps").getItem(1).as("p90"),
        col("ps").getItem(2).as("p99"))
      .orderBy("lang")

  /** Compression-ratio quality signal: deflate each document and report
    * compressed/raw sizes — the classic cheap proxy for repetitive or
    * boilerplate text (highly compressible ⇒ low information density;
    * used alongside the Gopher gates in q27_repetition). `ratio_pct` is
    * integer percent so the column is engine-portable.
    *
    * Scale: mapPartitions with ONE native Deflater per partition
    * (zlib init is expensive — the same per-partition-codec pattern as
    * graft.multimodal); rows stream through it with no shuffle. No
    * DuckDB oracle (no zlib there) → driver rows-only check; the
    * semantics are pinned by TextMlOpsSpec against single-threaded
    * java.util.zip output. */
  def q24_compress(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val stats = Tables.load(s, dir, "documents")
      .select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions { it =>
        val defl = new java.util.zip.Deflater(6)
        Option(org.apache.spark.TaskContext.get())
          .foreach(_.addTaskCompletionListener[Unit](_ => defl.end()))
        val buf = new Array[Byte](64 * 1024)
        it.map { case (id, text) =>
          val in = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
          defl.reset(); defl.setInput(in); defl.finish()
          var total = 0L
          while (!defl.finished()) total += defl.deflate(buf)
          (id, in.length.toLong, total)
        }
      }.toDF("doc_id", "n_bytes", "n_compressed")
    stats
      .withColumn("ratio_pct",
        when(col("n_bytes") === 0L, lit(100L))
          // `div` = exact Long integer division (Column./ would detour
          // through DOUBLE, inexact past 2^53 — the file's convention is
          // integer-exact math, q20c/q30 use div for the same reason)
          .otherwise(expr("n_compressed * 100 div n_bytes")))
      .orderBy("doc_id")
  }

  /** ERROR CERTIFICATION for q24_quantiles_approx — the Greenwald-
    * Khanna rank guarantee as a HASH-GREEN driver check: for each
    * reported percentile value v, the count of rows strictly below v
    * must not exceed (p + ε)·n and the count at-or-below v must reach
    * (p − ε)·n, with ε = 1/accuracy (= 1e-4) and a ±1-row slack for
    * the fractional target rank. The oracle asserts the literal
    * `true` per language — a sketch whose rank error exceeded its
    * contract turns the driver's hash gate red. One conditional-sum
    * aggregate over documents with the 5-row approx result broadcast
    * onto it — no window, no second shuffle. */
  def q24_quantiles_err(s: SparkSession, dir: String): DataFrame = {
    val eps = 1.0 / 10000
    val ap = q24_quantiles_approx(s, dir) // lang, n_docs, p50, p90, p99
    val j = Tables.load(s, dir, "documents").select(col("lang"), col("n_chars"))
      .join(broadcast(ap), Seq("lang"))
    val agg = j.groupBy("lang").agg(
      first(col("n_docs")).as("n"),
      sum(when(col("n_chars") < col("p50"), 1L).otherwise(0L)).as("lt_p50"),
      sum(when(col("n_chars") <= col("p50"), 1L).otherwise(0L)).as("le_p50"),
      sum(when(col("n_chars") < col("p90"), 1L).otherwise(0L)).as("lt_p90"),
      sum(when(col("n_chars") <= col("p90"), 1L).otherwise(0L)).as("le_p90"),
      sum(when(col("n_chars") < col("p99"), 1L).otherwise(0L)).as("lt_p99"),
      sum(when(col("n_chars") <= col("p99"), 1L).otherwise(0L)).as("le_p99"))
    def ok(p: String, frac: Double): Column =
      (col(s"lt_$p") <= col("n") * frac + col("n") * eps + 1.0) &&
        (col(s"le_$p") >= col("n") * frac - col("n") * eps - 1.0)
    agg.select(col("lang"), ok("p50", 0.5).as("p50_ok"),
        ok("p90", 0.9).as("p90_ok"), ok("p99", 0.99).as("p99_ok"))
      .orderBy("lang")
  }

  val q24QuantilesErrSql: String =
    """SELECT lang, true AS p50_ok, true AS p90_ok, true AS p99_ok
      |FROM documents GROUP BY lang ORDER BY lang""".stripMargin

  /** The measured error behind q24_quantiles_err: the worst rank-error
    * FRACTION across (language × percentile) — max(0, lt − t, t − le)/n
    * with t = p·n — one double to the driver for approx_err.json. */
  def q24QuantilesMaxRankErr(s: SparkSession, dir: String): Double = {
    val ap = q24_quantiles_approx(s, dir)
    val j = Tables.load(s, dir, "documents").select(col("lang"), col("n_chars"))
      .join(broadcast(ap), Seq("lang"))
    val agg = j.groupBy("lang").agg(
      first(col("n_docs")).as("n"),
      sum(when(col("n_chars") < col("p50"), 1L).otherwise(0L)).as("lt_p50"),
      sum(when(col("n_chars") <= col("p50"), 1L).otherwise(0L)).as("le_p50"),
      sum(when(col("n_chars") < col("p90"), 1L).otherwise(0L)).as("lt_p90"),
      sum(when(col("n_chars") <= col("p90"), 1L).otherwise(0L)).as("le_p90"),
      sum(when(col("n_chars") < col("p99"), 1L).otherwise(0L)).as("lt_p99"),
      sum(when(col("n_chars") <= col("p99"), 1L).otherwise(0L)).as("le_p99"))
    def err(p: String, frac: Double): Column =
      greatest(lit(0.0), col(s"lt_$p") - col("n") * frac,
        col("n") * frac - col(s"le_$p")) / col("n")
    agg.select(greatest(err("p50", 0.5), err("p90", 0.9), err("p99", 0.99))
        .as("e"))
      .agg(max(col("e")).as("m"))
      .head().getDouble(0)
  }

  /** ERROR CERTIFICATION for q24_compress — the codec's semantic
    * contract as a HASH-GREEN driver check: every document's deflate
    * stream must inflate back to the exact original bytes (and be
    * non-empty, and no larger than raw + the 64-byte zlib overhead
    * bound). The oracle asserts the literal `true` per document. Same
    * one-codec-per-partition shape as q24_compress; the inflate rides
    * the same pass, so certification costs one map over the corpus,
    * no shuffle. */
  def q24_compress_roundtrip(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.load(s, dir, "documents")
      .select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions { it =>
        val defl = new java.util.zip.Deflater(6)
        val infl = new java.util.zip.Inflater()
        Option(org.apache.spark.TaskContext.get())
          .foreach(_.addTaskCompletionListener[Unit] { _ =>
            defl.end(); infl.end()
          })
        val buf = new Array[Byte](64 * 1024)
        it.map { case (id, text) =>
          val in = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
          defl.reset(); defl.setInput(in); defl.finish()
          val comp = new java.io.ByteArrayOutputStream(in.length / 2 + 16)
          while (!defl.finished()) {
            val m = defl.deflate(buf)
            comp.write(buf, 0, m)
          }
          val cbytes = comp.toByteArray
          val back = new java.io.ByteArrayOutputStream(in.length + 16)
          val ok =
            try {
              infl.reset(); infl.setInput(cbytes)
              var stuck = false
              while (!infl.finished() && !stuck) {
                val m = infl.inflate(buf)
                if (m > 0) back.write(buf, 0, m)
                else if (!infl.finished()) stuck = true // truncated stream
              }
              infl.finished() &&
                java.util.Arrays.equals(in, back.toByteArray)
            } catch { case _: java.util.zip.DataFormatException => false }
          (id, ok && cbytes.length > 0 && cbytes.length <= in.length + 64)
        }
      }.toDF("doc_id", "roundtrip_ok")
      .orderBy("doc_id")
  }

  val q24CompressRoundtripSql: String =
    """SELECT doc_id, true AS roundtrip_ok
      |FROM documents ORDER BY doc_id""".stripMargin

  /** The measured error behind q24_compress_roundtrip: the FRACTION of
    * documents failing the roundtrip/size contract (0.0 = the codec
    * seam is lossless corpus-wide) — one double to the driver. */
  def q24CompressFailFrac(s: SparkSession, dir: String): Double =
    q24_compress_roundtrip(s, dir)
      .agg(avg(when(col("roundtrip_ok"), 0.0).otherwise(1.0)).as("f"))
      .head().getDouble(0)

  /** Tokenizer VOCABULARY COVERAGE / OOV rate per language: what share
    * of a corpus's tokens fall outside the trained top-500 vocabulary
    * (q24_vocab's selection rule) — the go/no-go check before shipping
    * a tokenizer (a stratum with high OOV will fragment into bytes and
    * blow up its token budget downstream).
    *
    * Scale: the vocabulary is top-k-bounded, so it BROADCASTS; the
    * probe is a map-side broadcast left join on the token stream (no
    * token-keyed exchange), collapsing to one partial-agg row per
    * language. The corpus is tokenized twice (train + probe) — same
    * trade as q24_tfidf's tf/df forks: re-tokenizing is cheaper at
    * scale than materializing the token stream. */
  def q24_oov(s: SparkSession, dir: String): DataFrame = {
    val tok = Tables.load(s, dir, "documents")
      .select(col("lang"),
        explode(split(trim(col("text")), "\\s+")).as("token"))
    val vocab = tok.groupBy("token").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("token")).limit(500)
      .select(col("token"), lit(1).as("in_vocab"))
    tok.join(broadcast(vocab), Seq("token"), "left")
      .groupBy("lang")
      .agg(count(lit(1)).as("n_tokens"),
        count(when(col("in_vocab").isNull, lit(1))).as("n_oov"))
      .withColumn("oov_pct", expr("n_oov * 100 div n_tokens"))
      .orderBy("lang")
  }

  val q24OovSql: String =
    """WITH tok AS (
      |  SELECT lang,
      |    unnest(string_split_regex(trim(text), '\s+')) AS token
      |  FROM documents),
      |v AS (SELECT token FROM (
      |  SELECT token, count(*) AS n FROM tok
      |  GROUP BY token ORDER BY n DESC, token LIMIT 500))
      |SELECT lang, count(*) AS n_tokens,
      |  COUNT(CASE WHEN v.token IS NULL THEN 1 END) AS n_oov,
      |  COUNT(CASE WHEN v.token IS NULL THEN 1 END) * 100
      |    // count(*) AS oov_pct
      |FROM tok LEFT JOIN v ON tok.token = v.token
      |GROUP BY lang
      |ORDER BY lang""".stripMargin

  // ----------------------------------------------------------------
  // ------------------------------------------------------- collocations
  /** COLLOCATION MINING (q24_collocations) — the top-20 bigrams by
    * integer LIFT (n_xy·N / (n_x·n_y), in ppm): the multiword-
    * expression detector ("new york", "machine learning") a tokenizer
    * or vocab builder runs before merging frequent word pairs. Lift is
    * the exponential of PMI, so it ranks identically — and unlike PMI
    * it needs no log, keeping every bit engine-portable (the q36e
    * no-logs discipline).
    *
    * Shape: bigrams generate row-locally (the q43 slice+transform
    * idiom); bigram and unigram counts collapse through token-scale
    * partial-agg groupBys; the two unigram joins key on the word —
    * vocabulary-scale sides, shuffle-joined (the q42c rule: no
    * broadcast of a side that grows with the corpus); the corpus
    * bigram total is the one-row broadcast crossJoin idiom; the
    * global top-20 is orderBy+limit → TakeOrderedAndProject (k rows
    * per partition cross the final exchange, never the vocabulary).
    *
    * Magnitude guard: lift_e6 = (n_xy·10⁶ div n_x)·N div n_y keeps
    * the first factor ≤ 10⁶, so the product stays under 2⁶³ while
    * N < 9.2e12 bigrams (≈ 40 TB of raw text) — the require()
    * documents the rescale point instead of wrapping silently. */
  def q24_collocations(s: SparkSession, dir: String): DataFrame = {
    val bi = Tables.load(s, dir, "documents")
      .select(expr("split(trim(text), '\\\\s+')").as("tk"))
      .select(explode(expr(
        """transform(slice(tk, 1, size(tk) - 1),
          |  (x, i) -> struct(x AS x, element_at(tk, i + 2) AS y))"""
          .stripMargin)).as("b"))
      .select(col("b.x").as("x"), col("b.y").as("y"))
    // the pair-count aggregate snapshots once (vocab²-scale), and the
    // TOTAL bigram mass derives from it (Σ n_xy ≡ count over the
    // exploded corpus) — the previous shape re-ran the corpus-scale
    // bigram explode twice more, once for the require scalar and once
    // for the crossJoin's total frame (guide §1.2: 3 corpus passes → 1)
    val nxy = bi.groupBy("x", "y").agg(count(lit(1)).as("n_xy"))
      .localCheckpoint()
    val uni = Tables.load(s, dir, "documents")
      .select(explode(split(trim(col("text")), "\\s+")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("n"))
    val nTotal = nxy.agg(coalesce(sum("n_xy"), lit(0L)).as("n_big"))
    val bigN = nTotal.head().getLong(0)
    require(bigN < 9200000000000L,
      "q24_collocations: bigram mass overflows the ppm lift grid — " +
        "rescale the constants for this corpus size")
    nxy.filter(col("n_xy") >= 5)
      .join(uni.select(col("w").as("x"), col("n").as("n_x")), "x")
      .join(uni.select(col("w").as("y"), col("n").as("n_y")), "y")
      .crossJoin(broadcast(nTotal))
      .withColumn("lift_e6",
        expr("(n_xy * 1000000 div n_x) * n_big div n_y"))
      .select("x", "y", "n_xy", "n_x", "n_y", "lift_e6")
      .orderBy(desc("lift_e6"), col("x"), col("y"))
      .limit(20)
  }

  val q24CollocationsSql: String =
    """WITH d AS (SELECT string_split_regex(trim(text), '\s+') AS tk
      |           FROM documents),
      |b AS (SELECT tk[i.i] AS x, tk[i.i + 1] AS y
      |      FROM d, LATERAL (SELECT unnest(range(1, len(tk))) AS i) i),
      |nxy AS (SELECT x, y, count(*) AS n_xy FROM b GROUP BY 1, 2),
      |uni AS (SELECT unnest(string_split_regex(trim(text), '\s+')) AS w
      |        FROM documents),
      |u AS (SELECT w, count(*) AS n FROM uni GROUP BY 1),
      |t AS (SELECT count(*) AS n_big FROM b)
      |SELECT nxy.x, nxy.y, n_xy, ux.n AS n_x, uy.n AS n_y,
      |  CAST((n_xy * 1000000 // ux.n) * t.n_big // uy.n AS BIGINT)
      |    AS lift_e6
      |FROM nxy JOIN u ux ON ux.w = nxy.x
      |  JOIN u uy ON uy.w = nxy.y, t
      |WHERE n_xy >= 5
      |ORDER BY lift_e6 DESC, nxy.x, nxy.y
      |LIMIT 20""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q24_collocations" -> (q24_collocations _),
    "q24_text_stats" -> (q24_text_stats _),
    "q24_langid" -> (q24_langid _),
    "q24_quality" -> (q24_quality _),
    "q24_token_count" -> (q24_token_count _),
    "q24_classify" -> (q24_classify _),
    "q24_fingerprint" -> (q24_fingerprint _),
    "q24_vocab" -> (q24_vocab _),
    "q24_zipf" -> (q24_zipf _),
    "q24_oov" -> (q24_oov _),
    "q24_tfidf" -> (q24_tfidf _),
    "q24_lm_score" -> (q24_lm_score _),
    "q24_bpe_pairs" -> (q24_bpe_pairs _),
    // hash-checked via q24BpeTrainSql (recursive-CTE greedy rewrites);
    // ScalaTest additionally pins a single-machine BPE reference
    "q24_bpe_train" -> (q24_bpe_train _),
    "q24_bpe_encode" -> (q24_bpe_encode _),
    "q24_quantiles" -> (q24_quantiles _),
    // rows-only: sketch internals engine-specific (see scaladoc)
    "q24_quantiles_approx" -> (q24_quantiles_approx _),
    // rows-only: no zlib in the oracle engine (see q24_compress doc)
    "q24_compress" -> (q24_compress _),
    // hash-green error certifications of the two rows-only kernels
    "q24_quantiles_err" -> (q24_quantiles_err _),
    "q24_compress_roundtrip" -> (q24_compress_roundtrip _))

  def oracles: Map[String, String] = Map(
    "q24_collocations" -> q24CollocationsSql,
    "q24_text_stats" -> q24StatsSql,
    "q24_langid" -> q24LangidSql,
    "q24_quality" -> q24QualitySql,
    "q24_token_count" -> q24TokenCountSql,
    "q24_classify" -> q24ClassifySql,
    "q24_fingerprint" -> q24FingerprintSql,
    "q24_vocab" -> q24VocabSql,
    "q24_zipf" -> q24ZipfSql,
    "q24_oov" -> q24OovSql,
    "q24_tfidf" -> q24TfidfSql,
    "q24_lm_score" -> q24LmScoreSql,
    "q24_bpe_pairs" -> q24BpePairsSql,
    "q24_bpe_train" -> q24BpeTrainSql,
    "q24_bpe_encode" -> q24BpeEncodeSql,
    "q24_quantiles" -> q24QuantilesSql,
    "q24_quantiles_err" -> q24QuantilesErrSql,
    "q24_compress_roundtrip" -> q24CompressRoundtripSql)
}
