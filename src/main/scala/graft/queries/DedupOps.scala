package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Q22 family — deduplication operators for training-data pipelines
  * (SURVEY.md §2.4 north star).
  *
  * Exact + n-gram-Jaccard are oracle-checked against DuckDB (integer-only
  * similarity math: `2*|∩| >= |∪|` instead of a float threshold). MinHash-LSH
  * and SimHash are sketch-based candidate generators — not SQL-expressible —
  * so they get rows-only driver checks plus ScalaTest recall assertions
  * against the exact-Jaccard ground truth.
  *
  * Scale design: everything is shuffle-bounded by (token/shingle, doc) or
  * (band, doc) pairs — no cross join anywhere. At 100 TB the LSH band join
  * is the scale path; the exact all-pairs verification only ever runs on
  * LSH candidates, never on the full corpus.
  */
object DedupOps {

  /** doc_id + distinct 3-token shingles. */
  private def shingled(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")
      .select(col("doc_id"),
        expr("split(trim(text), '\\\\s+')").as("toks"))
      .select(col("doc_id"),
        expr("array_distinct(transform(sequence(0, size(toks)-3), " +
          "i -> concat_ws(' ', slice(toks, i+1, 3))))").as("shingles"))

  /** Inverted-index candidate pairs with exact intersection counts.
    * Shuffle cost ∝ Σ(shingle document-frequency²) — the standard
    * all-pairs-similarity pattern (prefix filtering would bound the worst
    * case at larger scale). */
  private def jaccardPairs(s: SparkSession, dir: String): DataFrame = {
    val sh = shingled(s, dir)
    val ex = sh.select(col("doc_id"),
      size(col("shingles")).cast("long").as("n"),
      explode(col("shingles")).as("g"))
    val a = ex.select(col("doc_id").as("doc_a"), col("n").as("na"),
      col("g"))
    val b = ex.select(col("doc_id").as("doc_b"), col("n").as("nb"),
      col("g").as("gb"))
    a.join(b, col("g") === col("gb") && col("doc_a") < col("doc_b"))
      .groupBy("doc_a", "doc_b", "na", "nb")
      .agg(count(lit(1)).as("inter"))
      .withColumn("uni", col("na") + col("nb") - col("inter"))
  }

  // ------------------------------------------------------------- exact
  /** Exact dedup by normalized text: hash-groupBy on the normalized key,
    * keep the smallest doc_id. One shuffle on the text hash; at 100 TB
    * group on a 128-bit fingerprint of the text instead of the text
    * itself to keep shuffle rows narrow (semantics identical, collisions
    * negligible) — here the full key keeps the oracle trivially exact. */
  def q22_dedup_exact(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")
      .groupBy(regexp_replace(trim(col("text")), "\\s+", " ").as("norm_key"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))
      .select("keep_id", "n_copies")
      .orderBy("keep_id")

  val q22ExactSql: String =
    """SELECT min(doc_id) AS keep_id, count(*) AS n_copies
      |FROM documents
      |GROUP BY regexp_replace(trim(text), '\s+', ' ', 'g')
      |ORDER BY keep_id""".stripMargin

  // ------------------------------------------------------------- ngram
  /** Near-dup pairs with 3-gram Jaccard >= 0.5 via inverted-index join —
    * integer-only threshold math so both engines agree exactly. */
  def q22_dedup_ngram(s: SparkSession, dir: String): DataFrame =
    jaccardPairs(s, dir)
      .filter(col("inter") * 2 >= col("uni"))
      .select("doc_a", "doc_b", "inter", "uni")
      .orderBy("doc_a", "doc_b")

  val q22NgramSql: String =
    """WITH t AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS tk
      |           FROM documents),
      |sh AS (SELECT doc_id, list_distinct(list_transform(
      |         range(1, len(tk)-1), i -> array_to_string(tk[i:i+2], ' '))) AS s
      |       FROM t),
      |ex AS (SELECT doc_id, len(s) AS n, unnest(s) AS g FROM sh),
      |p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.n AS na,
      |             b.n AS nb, count(*) AS inter
      |      FROM ex a JOIN ex b ON a.g = b.g AND a.doc_id < b.doc_id
      |      GROUP BY 1, 2, 3, 4)
      |SELECT doc_a, doc_b, inter, na + nb - inter AS uni
      |FROM p WHERE 2*inter >= na + nb - inter
      |ORDER BY doc_a, doc_b""".stripMargin

  // ----------------------------------------------------------- minhash
  /** MinHash(128 perms) + LSH(32 bands × 4 rows) candidate generation,
    * then exact Jaccard verification of candidates only. Deterministic
    * permutations: h_i(x) = (a_i * xxhash64(shingle) + b_i) mod p.
    *
    * Output = verified near-dup pairs (J >= 0.5), same shape as
    * q22_dedup_ngram; ScalaTest asserts LSH recall against the exact
    * result. Not SQL-expressible → rows-only driver check.
    *
    * Scale: shuffle rows are (doc, band-signature) — 32 per doc — then a
    * self-join per band bucket; candidate verification touches only
    * bucket-mates. This is the 100 TB path where all-pairs is impossible. */
  def q22_dedup_minhash(s: SparkSession, dir: String): DataFrame = {
    val nPerms = 128
    val nBands = 32 // 4 rows per band
    val p = 2147483647L // 2^31-1
    // deterministic (a_i, b_i) from a fixed LCG seed
    val coef = (0 until nPerms).map { i =>
      val a = 1103515245L * (i + 1) % p
      val b = 12345L * (i + 17) % p
      (if (a == 0) 1L else a, b)
    }
    val aArr = typedLit(coef.map(_._1))
    val bArr = typedLit(coef.map(_._2))

    val sh = shingled(s, dir)
    // (doc, shingle-hash) → 128 permuted hashes → per-doc min per perm
    val hashed = sh
      .select(col("doc_id"), explode(col("shingles")).as("g"))
      .select(col("doc_id"),
        pmod(xxhash64(col("g")), lit(p)).as("h"))
      .withColumn("a", aArr).withColumn("b", bArr)
      .select(col("doc_id"), posexplode(
        expr(s"transform(a, (ai, i) -> pmod(ai * h + element_at(b, i+1), ${p}L))"))
        .as(Seq("perm", "hv")))
    val sig = hashed.groupBy("doc_id", "perm").agg(min("hv").as("mh"))
      .withColumn("band", col("perm") % nBands)
    // band signature = hash of the band's sorted (perm, mh) pairs
    val bands = sig.groupBy("doc_id", "band")
      .agg(xxhash64(to_json(sort_array(collect_list(struct(
        col("perm"), col("mh")))))).as("band_sig"))
    val left = bands.select(col("doc_id").as("doc_a"), col("band"),
      col("band_sig"))
    val right = bands.select(col("doc_id").as("doc_b"),
      col("band").as("band_r"), col("band_sig").as("band_sig_r"))
    val cand = left.join(right,
        col("band") === col("band_r") &&
        col("band_sig") === col("band_sig_r") &&
        col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b").distinct()
    // exact verification of candidates only
    jaccardPairs(s, dir)
      .join(cand, Seq("doc_a", "doc_b"), "left_semi")
      .filter(col("inter") * 2 >= col("uni"))
      .select("doc_a", "doc_b", "inter", "uni")
      .orderBy("doc_a", "doc_b")
  }

  // ------------------------------------------------------------ simhash
  /** 64-bit SimHash over token hashes; near-dup = Hamming distance <= 3
    * found via 4-block pigeonhole blocking (any pair at distance <= 3
    * agrees on at least one 16-bit block). Rows-only driver check +
    * ScalaTest vs exact Hamming. */
  def q22_dedup_simhash(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(s, dir, "documents")
      .select(col("doc_id"), expr("split(trim(text), '\\\\s+')").as("toks"))
    // weighted bit votes: for each bit, sum(+1/-1 per token occurrence)
    val tok = docs.select(col("doc_id"), explode(col("toks")).as("t"))
      .select(col("doc_id"), xxhash64(col("t")).as("h"))
    // sign-safe bit extraction: shiftright + mask (bit 63 of xxhash64 is
    // the sign bit; div/mod on negative longs would misbehave)
    val bits = tok.select(col("doc_id"), posexplode(
      expr("transform(sequence(0, 63), b -> CASE WHEN (shiftright(h, b) & 1) = 1 THEN 1 ELSE -1 END)"))
      .as(Seq("bit", "vote")))
    val sim = bits.groupBy("doc_id", "bit")
      .agg(sum("vote").as("v"))
      .groupBy("doc_id")
      // bitwise OR-accumulate via sum is safe: each term sets a distinct bit
      .agg(sum(expr("CASE WHEN v > 0 THEN shiftleft(1L, bit) ELSE 0L END"))
        .as("simhash"))
    val blocked = sim.select(col("doc_id"), col("simhash"),
      posexplode(expr(
        "transform(sequence(0, 3), k -> shiftrightunsigned(simhash, k*16) & 65535)"))
        .as(Seq("blk", "blk_val")))
    val l = blocked.select(col("doc_id").as("doc_a"),
      col("simhash").as("sh_a"), col("blk"), col("blk_val"))
    val r = blocked.select(col("doc_id").as("doc_b"),
      col("simhash").as("sh_b"), col("blk").as("blk_r"),
      col("blk_val").as("blk_val_r"))
    l.join(r, col("blk") === col("blk_r") &&
        col("blk_val") === col("blk_val_r") && col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b", "sh_a", "sh_b").distinct()
      .withColumn("hamming", expr("bit_count(sh_a ^ sh_b)"))
      .filter(col("hamming") <= 3)
      .select("doc_a", "doc_b", "hamming")
      .orderBy("doc_a", "doc_b")
  }

  // ------------------------------------------------------ embedding-cos
  /** Embedding near-dup pairs: exact cosine >= 0.5 over all pairs.
    * Fold-order-exact double math (see SimilarityOps.cosineExpr) makes
    * this oracle-checkable bit-for-bit. The all-pairs join is the
    * correctness baseline; the LSH-bucketed scale path is
    * SimilarityOps.q23_knn_lsh. */
  def q22_dedup_embed(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.load(s, dir, "embeddings")
      .select(col("vec_id"), SimilarityOps.toDoubleVec(col("embedding"))
        .as("v"))
      .withColumn("nrm", SimilarityOps.normExpr(col("v")))
    val a = e.select(col("vec_id").as("vec_a"), col("v").as("va"),
      col("nrm").as("nrm_a"))
    val b = e.select(col("vec_id").as("vec_b"), col("v").as("vb"),
      col("nrm").as("nrm_b"))
    a.join(b, col("vec_a") < col("vec_b"))
      .withColumn("cos",
        SimilarityOps.dotExpr(col("va"), col("vb"))
          / (col("nrm_a") * col("nrm_b")))
      .filter(col("cos") >= 0.5)
      .select("vec_a", "vec_b", "cos")
      .orderBy("vec_a", "vec_b")
  }

  val q22EmbedSql: String =
    """WITH e AS (SELECT vec_id,
      |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      |  FROM embeddings),
      |n AS (SELECT vec_id, v,
      |    sqrt(list_reduce(list_transform(v, x -> x*x), (a,b) -> a+b)) AS nrm
      |  FROM e)
      |SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
      |  list_reduce(list_transform(list_zip(a.v, b.v), p -> p[1]*p[2]),
      |    (x,y) -> x+y) / (a.nrm * b.nrm) AS cos
      |FROM n a JOIN n b ON a.vec_id < b.vec_id
      |WHERE list_reduce(list_transform(list_zip(a.v, b.v), p -> p[1]*p[2]),
      |    (x,y) -> x+y) / (a.nrm * b.nrm) >= 0.5
      |ORDER BY vec_a, vec_b""".stripMargin

  // ----------------------------------------------------------------
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q22_dedup_exact" -> (q22_dedup_exact _),
    "q22_dedup_ngram" -> (q22_dedup_ngram _),
    "q22_dedup_minhash" -> (q22_dedup_minhash _),
    "q22_dedup_simhash" -> (q22_dedup_simhash _),
    "q22_dedup_embed" -> (q22_dedup_embed _))

  def oracles: Map[String, String] = Map(
    "q22_dedup_exact" -> q22ExactSql,
    "q22_dedup_ngram" -> q22NgramSql,
    "q22_dedup_embed" -> q22EmbedSql)
}
