package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Batch-id-VERSIONED parquet state tables (`.../b=<id>`) — the
  * foreachBatch crash contract shared by IvmStream and Scd2Stream:
  * processing batch b reads version b−1 and writes version b, so a
  * re-delivered batch recomputes from the same input and state and
  * lands the same bytes (idempotent). Writes land in a temp dir and
  * rename; on a cluster filesystem without atomic rename, use the
  * marker-committed pattern of graft.sinks (parquet-exactly-once). */
private[streaming] object VersionedState {

  def read(spark: SparkSession, dir: String, batchId: Long,
      schema: StructType): DataFrame = {
    val p = new java.io.File(s"$dir/b=$batchId")
    if (batchId >= 0 && p.exists())
      spark.read.schema(schema).parquet(p.toString)
    else spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
  }

  private def rm(f: java.io.File): Unit = {
    Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
  }

  def write(df: DataFrame, dir: String, batchId: Long): Unit = {
    val tmp = new java.io.File(s"$dir/.tmp-b=$batchId")
    val dst = new java.io.File(s"$dir/b=$batchId")
    df.write.mode("overwrite").parquet(tmp.toString)
    if (dst.exists()) rm(dst) // re-delivery: replace the identical version
    require(tmp.renameTo(dst), s"rename $tmp -> $dst failed")
  }

  def versions(dir: String): Seq[Long] =
    Option(new java.io.File(dir).listFiles())
      .getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith("b="))
      .map(_.getName.stripPrefix("b=").toLong).toSeq

  /** Latest committed version, or an empty frame before any commit. */
  def latest(spark: SparkSession, dir: String,
      schema: StructType): DataFrame = {
    val vs = versions(dir)
    if (vs.isEmpty) spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    else read(spark, dir, vs.max, schema)
  }

  /** Drop versions ≤ batchId − 2: re-delivery of batch b only ever
    * reads b−1; older versions are dead weight growing O(batches). */
  def prune(dir: String, batchId: Long): Unit =
    versions(dir).filter(_ <= batchId - 2).foreach(v =>
      rm(new java.io.File(s"$dir/b=$v")))

  /** The batch-id-gap guard every versioned-state loop needs: a missing
    * predecessor version means a checkpoint reset against existing
    * state — continuing from empty state would silently corrupt it. */
  def requireLineage(dir: String, batchId: Long, what: String): Unit =
    require(batchId == 0 ||
      new java.io.File(s"$dir/b=${batchId - 1}").exists(),
      s"state version b=${batchId - 1} missing under $dir — batch-id " +
        s"gap or checkpoint reset; rebuild the $what from a full " +
        "replay instead of silently restarting from empty state")
}
