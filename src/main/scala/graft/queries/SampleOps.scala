package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Q26 family — deterministic sampling for training-data pipelines.
  *
  * Sampling at 100 TB must be (a) a narrow map-side predicate (no
  * shuffle, no global coordination), (b) reproducible across engines and
  * runs, and (c) stable under repartitioning — which rules out
  * `rand()`/`TABLESAMPLE`. The standard answer is KEY-HASH sampling:
  * a deterministic integer mix of the stable row key selects the
  * sample. The mix here is Knuth multiplicative hashing
  * (key × 2654435761 mod 2³²) — integer-exact in both Spark and DuckDB,
  * so the oracle states the identical sample. */
object SampleOps {

  /** Knuth multiplicative hash of a long key into [0, 2³²) — THE
    * deterministic key-bucket contract shared by every sampling/split
    * decision in the engine (q22_dedup_incremental's new/existing split
    * uses the same function so its "new batch" is exactly this
    * sampler's complement). Keep in lockstep with the inline
    * `(key * 2654435761) % 4294967296` in the oracle SQL strings. */
  def bucketOf(key: String): org.apache.spark.sql.Column =
    pmod(col(key) * 2654435761L, lit(4294967296L))

  /** 10% deterministic sample of `documents`: pure filter, no shuffle —
    * the sampling decision rides the scan (PushedFilters can't take the
    * modulo, but the predicate is map-side and the scan stays pruned to
    * the two output columns). */
  def q26_sample_hash(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")
      .filter(bucketOf("doc_id") % 100 < 10)
      .select(col("doc_id"), col("lang"))
      .orderBy("doc_id")

  val q26SampleSql: String =
    """SELECT doc_id, lang FROM documents
      |WHERE (doc_id * 2654435761) % 4294967296 % 100 < 10
      |ORDER BY doc_id""".stripMargin

  /** Stratified 80/20 train/test split: the same key-hash assigns every
    * doc a split label; output is per-(lang, split) counts — the check a
    * pipeline runs to confirm the split is balanced per stratum. One
    * map-side projection + one partial-aggregated groupBy. */
  def q26_split_stratified(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")
      .withColumn("split",
        when(bucketOf("doc_id") % 100 < 80, "train").otherwise("test"))
      .groupBy("lang", "split")
      .agg(count(lit(1)).as("n"))
      .orderBy("lang", "split")

  val q26SplitSql: String =
    """SELECT lang,
      |  CASE WHEN (doc_id * 2654435761) % 4294967296 % 100 < 80
      |       THEN 'train' ELSE 'test' END AS split,
      |  count(*) AS n
      |FROM documents
      |GROUP BY 1, 2
      |ORDER BY lang, split""".stripMargin

  /** K-FOLD cross-validation assignment — the same key hash deals every
    * doc into one of 5 folds; output is the per-(lang, fold) balance
    * check plus each fold's token mass (the two numbers that decide
    * whether hash folding is safe for a given corpus). Reproducible,
    * shuffle-free per row, one partial-agg groupBy — and because the
    * fold is a pure key function, any machine can recompute membership
    * without the assignment table (the q26 family's defining
    * property). */
  def q26_kfold(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")
      .withColumn("fold", (bucketOf("doc_id") % 5).cast("int"))
      .withColumn("n_toks",
        size(split(trim(col("text")), "\\s+")).cast("long"))
      .groupBy("lang", "fold")
      .agg(count(lit(1)).as("n"), sum(col("n_toks")).as("toks"))
      .orderBy("lang", "fold")

  val q26KfoldSql: String =
    """SELECT lang,
      |  CAST((doc_id * 2654435761) % 4294967296 % 5 AS INT) AS fold,
      |  count(*) AS n,
      |  CAST(SUM(len(string_split_regex(trim(text), '\s+'))) AS BIGINT)
      |    AS toks
      |FROM documents
      |GROUP BY 1, 2
      |ORDER BY lang, fold""".stripMargin

  /** Data mixing: sample each source at its own rate against a
    * per-source TOKEN budget (the Pile/Dolma "mixture weights" step —
    * downsample the over-represented sources, keep the rest). A doc is
    * selected iff the tokens of the source's hash-earlier docs haven't
    * exhausted the budget, so the selection is a deterministic
    * pseudo-random greedy fill:
    *
    *   - order within a source: the Knuth key-hash. Injective for keys
    *     below 2³² (odd multiplier mod 2³²); beyond that keys CAN
    *     collide, so tied docs share one token position (strictly-
    *     smaller-h sum — PrefixSum's RANGE semantics, mirrored by the
    *     oracle's RANGE frame) and are admitted or rejected together,
    *     deterministically in both engines;
    *   - budget_s = rate_s × total-tokens_s in INTEGER math
    *     (rate parsed from the source id: (50 + 2·n)/100 — stands in
    *     for a user-supplied weight table, engine-exact either way);
    *   - running token position per source: the keyed two-level
    *     PrefixSum — never a whole source (at 100 TB: TBs) through one
    *     window task.
    *
    * Totals per source are a tiny broadcast (one row per source). */
  def q26_mix(s: SparkSession, dir: String): DataFrame = {
    // narrow + materialized: PrefixSum forks its input, and the fork
    // would otherwise re-tokenize the corpus (see PrefixCarry's note)
    val d = Tables.load(s, dir, "documents")
      .withColumn("n_toks",
        size(split(trim(col("text")), "\\s+")).cast("long"))
      .withColumn("h", bucketOf("doc_id"))
      .withColumn("srcn",
        regexp_extract(col("source"), "[0-9]+", 0).cast("long"))
      .select("doc_id", "source", "srcn", "n_toks", "h")
      .localCheckpoint()
    val totals = d.groupBy("source")
      .agg(sum(col("n_toks")).as("tot"))
    PrefixSum.exclusiveRunningSum(d, "n_toks", "tok_pos",
        seqCol = "h", keys = Seq("source"))
      .join(broadcast(totals), "source")
      .filter(col("tok_pos") <
        expr("((50 + 2 * srcn) * tot) div 100"))
      .select("doc_id", "source", "n_toks", "tok_pos")
      .orderBy("doc_id")
  }

  val q26MixSql: String =
    """WITH d AS (SELECT doc_id, source,
      |    CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT)
      |      AS n_toks,
      |    (doc_id * 2654435761) % 4294967296 AS h,
      |    CAST(regexp_extract(source, '[0-9]+') AS BIGINT) AS srcn
      |  FROM documents),
      |p AS (SELECT doc_id, source, n_toks,
      |    CAST(COALESCE(SUM(n_toks) OVER (PARTITION BY source ORDER BY h
      |      RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
      |      AS BIGINT) AS tok_pos,
      |    ((50 + 2 * srcn) * SUM(n_toks) OVER (PARTITION BY source)) // 100
      |      AS budget
      |  FROM d)
      |SELECT doc_id, source, n_toks, tok_pos
      |FROM p WHERE tok_pos < budget
      |ORDER BY doc_id""".stripMargin

  /** Temperature-weighted mixture allocation (α = 0.5): the multilingual
    * /multi-source rebalancing step — each source's sampling weight is
    * tokens^α, flattening the source distribution so small sources are
    * upsampled relative to their share (the mT5/XLM-R recipe). With
    * α = 1/2 the weight is `floor(sqrt(tokens))`: IEEE-754 sqrt is
    * correctly rounded in both engines and the floor lands the weight
    * back in exact integer space, so the whole allocation — budget =
    * half the corpus tokens, alloc_s = budget × w_s div Σw — is
    * hash-exact with no float summation anywhere. The same key-hash
    * greedy fill as q26_mix then realizes each allocation at doc
    * granularity, and the output reports per source: tokens, weight,
    * allocation, and what the fill actually selected.
    *
    * Scale: per-source totals are one partial-agg groupBy (|sources|
    * rows); weights/allocations ride a broadcast of that tiny result;
    * the running token position is the keyed two-level PrefixSum (never
    * a whole source through one window task); the final report is a
    * second |sources|-row partial agg. */
  def q26_temperature(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.load(s, dir, "documents")
      .withColumn("n_toks",
        size(split(trim(col("text")), "\\s+")).cast("long"))
      .withColumn("h", bucketOf("doc_id"))
      .select("doc_id", "source", "n_toks", "h")
      .localCheckpoint() // PrefixSum forks its input (see q26_mix)
    val totals = d.groupBy("source").agg(sum(col("n_toks")).as("tot"))
      .withColumn("w", floor(sqrt(col("tot").cast("double"))).cast("long"))
    val global = totals.agg(
      expr("sum(tot) div 2").as("budget"), sum(col("w")).as("sum_w"))
    val alloc = totals.crossJoin(broadcast(global))
      .withColumn("alloc", expr("(budget * w) div sum_w"))
      .select("source", "tot", "w", "alloc")
    PrefixSum.exclusiveRunningSum(d, "n_toks", "tok_pos",
        seqCol = "h", keys = Seq("source"))
      .join(broadcast(alloc), "source")
      .groupBy("source")
      .agg(max(col("tot")).as("n_toks"), max(col("w")).as("w"),
        max(col("alloc")).as("alloc"),
        count(when(col("tok_pos") < col("alloc"), lit(1))).as("n_sel"),
        coalesce(sum(when(col("tok_pos") < col("alloc"), col("n_toks"))),
          lit(0L)).as("sel_toks"))
      .orderBy("source")
  }

  val q26TemperatureSql: String =
    """WITH d AS (SELECT doc_id, source,
      |    CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT)
      |      AS n_toks,
      |    (doc_id * 2654435761) % 4294967296 AS h
      |  FROM documents),
      |t AS (SELECT source, CAST(SUM(n_toks) AS BIGINT) AS tot
      |      FROM d GROUP BY 1),
      |w AS (SELECT source, tot,
      |        CAST(floor(sqrt(CAST(tot AS DOUBLE))) AS BIGINT) AS w
      |      FROM t),
      |g AS (SELECT CAST(SUM(tot) // 2 AS BIGINT) AS budget,
      |        CAST(SUM(w) AS BIGINT) AS sum_w
      |      FROM w),
      |a AS (SELECT source, tot, w,
      |        CAST((g.budget * w.w) // g.sum_w AS BIGINT) AS alloc
      |      FROM w, g),
      |p AS (SELECT doc_id, source, n_toks,
      |    CAST(COALESCE(SUM(n_toks) OVER (PARTITION BY source ORDER BY h
      |      RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
      |      AS BIGINT) AS tok_pos
      |  FROM d)
      |SELECT a.source, a.tot AS n_toks, a.w, a.alloc,
      |  COUNT(CASE WHEN p.tok_pos < a.alloc THEN 1 END) AS n_sel,
      |  CAST(COALESCE(
      |    SUM(CASE WHEN p.tok_pos < a.alloc THEN p.n_toks END), 0)
      |    AS BIGINT) AS sel_toks
      |FROM a JOIN p USING (source)
      |GROUP BY 1, 2, 3, 4
      |ORDER BY source""".stripMargin

  /** PPS systematic sampling (probability proportional to size — the
    * Madow '49 estimator, the standard weighted corpus sampler): lay
    * every document's tokens end-to-end in deterministic key-hash order,
    * then take one "dart" every `step = total div 50` tokens; a document
    * is selected iff a dart lands inside its token interval. Selection
    * probability is exactly n_toks/step (capped at 1) — long documents
    * proportionally more likely, any document with n_toks ≥ step
    * CERTAIN — with a fixed sample size of ~50, no randomness, and
    * map-side decidability once the token position is known. `pick` is
    * the index of the first dart inside the interval. All arithmetic is
    * nonnegative-integer (`div`), so both engines agree exactly —
    * DuckDB's floor-`//` and Spark's truncating `div` only diverge on
    * negatives, which the first-dart formulation avoids.
    *
    * Scale: the token position is the keyless two-level PrefixSum (no
    * global window); the (total, step) row broadcasts; everything else
    * is a row-local predicate. */
  def q26_pps(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.load(s, dir, "documents")
      .withColumn("n_toks",
        size(split(trim(col("text")), "\\s+")).cast("long"))
      .withColumn("h", bucketOf("doc_id"))
      .select("doc_id", "source", "n_toks", "h")
      .localCheckpoint() // PrefixSum forks its input (see q26_mix)
    val tot = d.agg(sum(col("n_toks")).as("total"))
      .withColumn("step", greatest(expr("total div 50"), lit(1L)))
      .select("step")
    PrefixSum.exclusiveRunningSum(d, "n_toks", "tok_pos", seqCol = "h")
      .crossJoin(broadcast(tot))
      .withColumn("pick", expr("(tok_pos + step - 1) div step"))
      .filter(col("pick") * col("step") < col("tok_pos") + col("n_toks"))
      .select("doc_id", "source", "n_toks", "tok_pos", "pick")
      .orderBy("doc_id")
  }

  val q26PpsSql: String =
    """WITH d AS (SELECT doc_id, source,
      |    CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT)
      |      AS n_toks,
      |    (doc_id * 2654435761) % 4294967296 AS h
      |  FROM documents),
      |t AS (SELECT greatest(CAST(SUM(n_toks) AS BIGINT) // 50,
      |        CAST(1 AS BIGINT)) AS step FROM d),
      |p AS (SELECT doc_id, source, n_toks,
      |    CAST(COALESCE(SUM(n_toks) OVER (ORDER BY h
      |      RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
      |      AS BIGINT) AS tok_pos
      |  FROM d)
      |SELECT doc_id, source, n_toks, tok_pos,
      |  (tok_pos + t.step - 1) // t.step AS pick
      |FROM p, t
      |WHERE ((tok_pos + t.step - 1) // t.step) * t.step
      |      < tok_pos + n_toks
      |ORDER BY doc_id""".stripMargin

  /** Deterministic per-stratum RESERVOIR: exactly k=8 docs per language,
    * selected by key-hash priority — the fixed-size sample every
    * dashboard / eval-set / spot-check pipeline draws per stratum.
    * Hash-priority order makes the reservoir REPRODUCIBLE (same keys →
    * same sample, any partitioning, any engine) and STABLE under corpus
    * growth: a new doc displaces at most one incumbent — lower-priority
    * members are unaffected (the property random sort can't give).
    *
    * Scale: `row_number() <= k` over (lang, priority) is exactly the
    * shape the TopKPerKey rewrite compiles to a bounded per-partition
    * heap — k rows per stratum cross the exchange, never the corpus. */
  def q26_reservoir(s: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("lang").orderBy(col("pri"), col("doc_id"))
    Tables.load(s, dir, "documents")
      .withColumn("pri", bucketOf("doc_id"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 8)
      .select(col("lang"), col("rk").cast("long").as("rk"),
        col("doc_id"), col("pri"))
      .orderBy("lang", "rk")
  }

  val q26ReservoirSql: String =
    """WITH p AS (SELECT lang, doc_id,
      |    (doc_id * 2654435761) % 4294967296 AS pri
      |  FROM documents),
      |r AS (SELECT lang, doc_id, pri,
      |    ROW_NUMBER() OVER (PARTITION BY lang ORDER BY pri, doc_id)
      |      AS rk
      |  FROM p)
      |SELECT lang, rk, doc_id, pri
      |FROM r WHERE rk <= 8
      |ORDER BY lang, rk""".stripMargin

  // --------------------------------------------------- weighted sample
  /** Deterministic WEIGHTED per-stratum sample: k=8 docs per language
    * with selection biased toward LONG documents — the
    * Efraimidis–Spirakis A-Res recipe (priority = random^(1/w), keep
    * the top-k) in an engine-portable integer surrogate: priority =
    * hash·10⁶ div weight, keep the LOWEST k. The uniform key-hash
    * stands in for the random draw, so a doc with twice the weight
    * halves its expected priority (first-order proportional-to-weight
    * inclusion rather than E–S's exact exponential order statistics —
    * the trade that keeps every bit integer and reproducible: same
    * keys → same sample on any engine, any partitioning). Shares
    * q26_reservoir's stability: corpus growth displaces at most one
    * incumbent per new doc.
    *
    * Scale: `row_number() ≤ k` over (lang, priority) — the TopKPerKey
    * bounded-heap shape; k rows per stratum cross the exchange. */
  def q26_weighted(s: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("lang").orderBy(col("pri"), col("doc_id"))
    Tables.load(s, dir, "documents")
      .withColumn("wt", greatest(col("n_chars"), lit(1L)))
      // `div`: exact Long floor division (Column./ detours through
      // DOUBLE — h·10⁶ still double-exact at 4.3e15, but the repo
      // convention is integer math stays integer)
      .withColumn("h", bucketOf("doc_id"))
      .withColumn("pri", expr("h * 1000000 div wt"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 8)
      .select(col("lang"), col("rk").cast("long").as("rk"),
        col("doc_id"), col("wt"), col("pri"))
      .orderBy("lang", "rk")
  }

  val q26WeightedSql: String =
    """WITH p AS (SELECT lang, doc_id,
      |    GREATEST(n_chars, 1) AS wt,
      |    (((doc_id * 2654435761) % 4294967296) * 1000000)
      |      // GREATEST(n_chars, 1) AS pri
      |  FROM documents),
      |r AS (SELECT lang, doc_id, wt, pri,
      |    ROW_NUMBER() OVER (PARTITION BY lang ORDER BY pri, doc_id)
      |      AS rk
      |  FROM p)
      |SELECT lang, rk, doc_id, wt, pri
      |FROM r WHERE rk <= 8
      |ORDER BY lang, rk""".stripMargin

  // ------------------------------------------------------- curriculum
  /** CURRICULUM ORDERING — training positions easy→hard (Bengio et al.
    * '09): documents sort by length-percentile QUARTILE (difficulty),
    * deterministically shuffled INSIDE each quartile (the q27_shuffle
    * hash order), every row getting its global position. Composes the
    * engine's own primitives at their scale shapes: the q19g histogram
    * + keyless PrefixSum for percentiles (no global cume_dist window),
    * then the bucket-decomposed global rank over the composite
    * (difficulty, hash-bucket) order — counts per composite bucket,
    * exclusive prefix sum over the 4·|buckets| summary rows, broadcast
    * offsets + within-bucket row_number. No single-task window touches
    * row-scale data anywhere. */
  def q26_curriculum(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val nBuckets = 1024L
    val bucketWidth = 4294967296L / nBuckets
    val docs = Tables.load(s, dir, "documents")
      .select("doc_id", "n_chars")
    // difficulty: length percentile → quartile (q19g's histogram shape)
    val hist = docs.groupBy("n_chars").agg(count(lit(1)).as("c"))
    // explicit bucket size covering the whole n_chars range: skips the
    // auto-sizer's stats job (which would re-run the scan + groupBy at
    // plan build — q27_shuffle's lesson) and keeps the level-1 window
    // one tiny histogram-scale partition
    val below = PrefixSum.exclusiveRunningSum(
      hist, "c", "below", seqCol = "n_chars", bucketSize = 1L << 30)
    val total = docs.count()
    val d = docs
      .join(broadcast(below.select(col("n_chars"), col("below"))),
        Seq("n_chars"))
      .withColumn("diff", expr(s"below * 100 div ${total}L div 25"))
      .withColumn("h", bucketOf("doc_id"))
      .withColumn("bkt", expr(s"diff * $nBuckets + h div $bucketWidth"))
      .select("doc_id", "diff", "h", "bkt")
      .localCheckpoint() // counts + offsets-join both fork it
    val counts = d.groupBy("bkt").agg(count(lit(1)).as("n"))
    val offsets = PrefixSum
      .exclusiveRunningSum(counts, "n", "off", seqCol = "bkt",
        bucketSize = 4 * nBuckets)
      .select("bkt", "off")
    val wLocal = Window.partitionBy("bkt").orderBy(col("h"), col("doc_id"))
    d.join(broadcast(offsets), "bkt")
      .withColumn("pos", col("off") + row_number().over(wLocal) - 1)
      .select("doc_id", "diff", "pos")
      .orderBy("doc_id")
  }

  val q26CurriculumSql: String =
    """WITH h AS (SELECT n_chars, COUNT(*) AS c FROM documents GROUP BY 1),
      |cm AS (SELECT n_chars,
      |    COALESCE(SUM(c) OVER (ORDER BY n_chars
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS below
      |  FROM h),
      |n AS (SELECT COUNT(*) AS tot FROM documents),
      |d AS (SELECT doc_id,
      |    CAST(cm.below * 100 // (SELECT tot FROM n) // 25 AS BIGINT)
      |      AS diff,
      |    (doc_id * 2654435761) % 4294967296 AS hsh
      |  FROM documents JOIN cm USING (n_chars))
      |SELECT doc_id, diff,
      |  ROW_NUMBER() OVER (ORDER BY diff, hsh, doc_id) - 1 AS pos
      |FROM d ORDER BY doc_id""".stripMargin

  // ------------------------------------------------------------- DSIR
  /** IMPORTANCE RESAMPLING data selection (q26_dsir) — the DSIR recipe
    * (Xie et al., "Data Selection for Language Models via Importance
    * Resampling", NeurIPS'23): score every document by how much its
    * hashed-feature distribution looks like a TARGET sample relative
    * to the raw SOURCE pool, keep the top scorers. Features are hashed
    * unigrams (the [[graft.functions.RollingHash]] kernel mod 1024 —
    * codegen'd, oracle-portable); the target/source bucket histograms
    * are 1024-row aggregates whose smoothed ratio broadcasts back onto
    * the token stream (q24_oov's probe shape), so scoring is one
    * map-side join + one doc-keyed partial agg. The integer ratio
    * (t+1)·10⁶ div (s+1) replaces the paper's log-likelihood ratio —
    * monotone per bucket, hash-exact on both engines (the q43b idf
    * argument). Selection is top-100 by (importance, doc_id) —
    * TakeOrderedAndProject, never a global sort. */
  def q26_dsir(s: SparkSession, dir: String): DataFrame = {
    val tok = Tables.load(s, dir, "documents")
      .select(col("doc_id"),
        explode(split(trim(col("text")), "\\s+")).as("token"))
      .filter(col("token") =!= "")
      .withColumn("b",
        pmod(graft.functions.native.rollingHash(col("token")), lit(1024L)))
      .select("doc_id", "b")
      .localCheckpoint() // target + source + scoring all read it
    val target = tok.filter(col("doc_id") % 7 === 0)
      .groupBy("b").agg(count(lit(1)).as("t"))
    val source = tok.groupBy("b").agg(count(lit(1)).as("sdist"))
    val ratio = source.join(target, Seq("b"), "left")
      .select(col("b"),
        expr("(coalesce(t, 0L) + 1) * 1000000 div (sdist + 1)").as("w"))
    tok.join(broadcast(ratio), "b")
      .groupBy("doc_id").agg(sum("w").as("sw"), count(lit(1)).as("nt"))
      .select(col("doc_id"), expr("sw div nt").as("importance_e6"))
      .orderBy(desc("importance_e6"), col("doc_id")).limit(100)
  }

  val q26DsirSql: String =
    """WITH tok AS (
      |  SELECT doc_id, unnest(string_split_regex(trim(text), '\s+'))
      |    AS token
      |  FROM documents),
      |ne AS (SELECT doc_id,
      |    list_reduce(list_prepend(CAST(0 AS BIGINT),
      |      list_transform(range(1, length(token)+1),
      |        i -> CAST(ascii(substring(token, i, 1)) AS BIGINT))),
      |      (acc, c) -> (acc * 31 + c) % 1000000007) % 1024 AS b
      |  FROM tok WHERE token != ''),
      |tgt AS (SELECT b, COUNT(*) AS t FROM ne
      |        WHERE doc_id % 7 = 0 GROUP BY b),
      |src AS (SELECT b, COUNT(*) AS sdist FROM ne GROUP BY b),
      |ratio AS (SELECT src.b,
      |    (COALESCE(t, 0) + 1) * 1000000 // (sdist + 1) AS w
      |  FROM src LEFT JOIN tgt ON tgt.b = src.b),
      |sc AS (SELECT doc_id, CAST(SUM(w) // COUNT(*) AS BIGINT)
      |    AS importance_e6
      |  FROM ne JOIN ratio USING (b) GROUP BY doc_id)
      |SELECT doc_id, importance_e6 FROM sc
      |ORDER BY importance_e6 DESC, doc_id LIMIT 100""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q26_dsir" -> (q26_dsir _),
    "q26_curriculum" -> (q26_curriculum _),
    "q26_sample_hash" -> (q26_sample_hash _),
    "q26_split_stratified" -> (q26_split_stratified _),
    "q26_kfold" -> (q26_kfold _),
    "q26_mix" -> (q26_mix _),
    "q26_temperature" -> (q26_temperature _),
    "q26_pps" -> (q26_pps _),
    "q26_reservoir" -> (q26_reservoir _),
    "q26_weighted" -> (q26_weighted _))

  def oracles: Map[String, String] = Map(
    "q26_dsir" -> q26DsirSql,
    "q26_curriculum" -> q26CurriculumSql,
    "q26_sample_hash" -> q26SampleSql,
    "q26_split_stratified" -> q26SplitSql,
    "q26_kfold" -> q26KfoldSql,
    "q26_mix" -> q26MixSql,
    "q26_temperature" -> q26TemperatureSql,
    "q26_pps" -> q26PpsSql,
    "q26_reservoir" -> q26ReservoirSql,
    "q26_weighted" -> q26WeightedSql)
}
