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

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q26_sample_hash" -> (q26_sample_hash _),
    "q26_split_stratified" -> (q26_split_stratified _))

  def oracles: Map[String, String] = Map(
    "q26_sample_hash" -> q26SampleSql,
    "q26_split_stratified" -> q26SplitSql)
}
