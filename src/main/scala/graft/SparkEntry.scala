package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.{queries => q}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the full declared operator inventory (SURVEY.md §2.4);
  * every entry with an `oracleSql` twin is hash-compared against DuckDB
  * on the sf0.01 test data. Entries without oracle SQL get a rows-only
  * check (approximate / sketch-based operators whose exact output is not
  * SQL-expressible).
  */
object SparkEntry {

  /** Session config every entry point needs:
    *   - nanosAsLong: older generations of events.parquet store
    *     TIMESTAMP(NANOS) which Spark cannot represent; with this set we
    *     read the raw long and manage precision explicitly. Harmless on
    *     the current TIMESTAMP(MICROS) fixture — Tables.events handles
    *     both generations.
    */
  val requiredConfs: Map[String, String] = Map(
    "spark.sql.legacy.parquet.nanosAsLong" -> "true",
    "spark.sql.session.timeZone" -> "UTC",
    "spark.sql.adaptive.enabled" -> "true",
    // native kernels for SQL users + the per-key top-k plan rewrite
    // (graft.plans.TopKPerKey); queries stay correct without it
    "spark.sql.extensions" -> "graft.functions.GraftExtensions")

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    q.Relational.q08_join_multiway(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    q.Relational.queries ++ q.DedupOps.queries ++ q.SimilarityOps.queries ++
      q.TextOps.queries ++ q.WindowedOps.queries ++ q.CdcOps.queries ++
      q.SampleOps.queries ++ q.CurationOps.queries ++ q.SkewOps.queries ++
      q.FunnelOps.queries ++ q.GraphOps.queries ++ q.IndexOps.queries ++
      q.LayoutOps.queries ++ graft.multimodal.Multimodal.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops
    * (sketch/LSH-based operators get the driver's rows-only check). */
  def oracleSql: Map[String, String] =
    q.Relational.oracles ++ q.DedupOps.oracles ++ q.SimilarityOps.oracles ++
      q.TextOps.oracles ++ q.WindowedOps.oracles ++ q.CdcOps.oracles ++
      q.SampleOps.oracles ++ q.CurationOps.oracles ++ q.SkewOps.oracles ++
      q.FunnelOps.oracles ++ q.GraphOps.oracles ++ q.IndexOps.oracles ++
      q.LayoutOps.oracles ++ graft.multimodal.Multimodal.oracles
}
