package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated test tables (TESTDATA.md).
  *
  * All queries take the scale-factor directory as a parameter so the same
  * code runs at sf0.001 (unit tests), sf0.01 (oracle) and sf0.1 (bench).
  * At 100 TB these become partitioned/bucketed external tables; this loader
  * is the single seam where that swap happens.
  *
  * Test-artifact caveat: each table is ONE parquet file with ONE row
  * group, so a scan gets at most one non-empty split regardless of
  * maxPartitionBytes — scan-rooted narrow pipelines run on one core
  * until their first exchange. This is a property of the fixture, not
  * the design (production tables have many files/row groups and split
  * naturally); operators that need pre-shuffle parallelism at test scale
  * (the CDC generators, DedupOps.docs) repartition explicitly and say so.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** `events` with deterministic integer time columns.
    *
    * Two generations of the fixture exist: TIMESTAMP(NANOS), which Spark
    * reads as a raw ns long under `spark.sql.legacy.parquet.nanosAsLong`,
    * and TIMESTAMP(MICROS), which arrives as a (NTZ) timestamp. Both
    * normalize to:
    *   - ts_us: integer µs (floor) — canonical time for oracle-compared
    *     arithmetic; DuckDB's parquet reader yields the same µs instants
    *     (`epoch_us(ts)` truncates ns→µs identically).
    *   - ts: TimestampType at µs for Spark window()/session_window().
    * NTZ→timestamp is wall-clock-preserving because every session pins
    * `spark.sql.session.timeZone=UTC`.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    val raw = load(spark, dir, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumnRenamed("ts", "ts_ns")
          .withColumn("ts_us", expr("ts_ns div 1000"))
          .withColumn("ts", timestamp_micros(col("ts_us")))
          .drop("ts_ns")
      case _ =>
        raw.withColumn("ts", col("ts").cast("timestamp"))
          .withColumn("ts_us", unix_micros(col("ts")))
    }
  }

  /** DuckDB-side equivalent of [[events]], spliced into oracle SQL. */
  val eventsNormSql: String =
    "(SELECT event_id, epoch_us(ts) AS ts_us, user_id, event_type, value," +
      " props FROM events)"

  /** Register every table as a temp view (for spark.sql-based queries). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
