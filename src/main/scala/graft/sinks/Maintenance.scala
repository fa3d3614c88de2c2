package graft.sinks

import org.apache.spark.sql.SparkSession

/** Table maintenance for the parquet sinks: a streaming sink appending a
  * file (or several) per microbatch accretes thousands of small files —
  * at warehouse scale the file-listing and per-file open costs come to
  * dominate every scan long before data volume does. Compaction rewrites
  * a directory into ⌈bytes / targetFileBytes⌉ files.
  *
  * The rewrite is offline-atomic on a local filesystem: the compacted
  * copy builds in a sibling `.compacting` directory and swaps in via two
  * renames, so a concurrent reader sees either the old layout or the new
  * one. (On an object store, swap via a manifest instead — renames
  * aren't atomic there.) Run it between streaming restarts or on a
  * partition no longer receiving appends (the natural cadence for
  * hive-partitioned CDC output: compact yesterday's partitions).
  */
object Maintenance {

  /** Rewrite `dir` to ~targetFileBytes files. Returns (before, after)
    * data-file counts. */
  def compact(spark: SparkSession, dir: String,
      targetFileBytes: Long = 128L * 1024 * 1024): (Int, Int) = {
    val d = new java.io.File(dir)
    def dataFiles(f: java.io.File) =
      Option(f.listFiles()).toSeq.flatten
        .filter(f => f.isFile && f.getName.endsWith(".parquet"))
    val before = dataFiles(d)
    val totalBytes = before.map(_.length()).sum
    val nFiles = math.max(1, math.ceil(
      totalBytes.toDouble / targetFileBytes).toInt)
    val tmp = new java.io.File(d.getParentFile, d.getName + ".compacting")
    spark.read.parquet(dir).repartition(nFiles)
      .write.mode("overwrite").parquet(tmp.toString)
    val old = new java.io.File(d.getParentFile, d.getName + ".old")
    if (!d.renameTo(old))
      throw new java.io.IOException(s"cannot swap out $dir")
    if (!tmp.renameTo(d)) {
      old.renameTo(d) // roll back
      throw new java.io.IOException(s"cannot swap in $tmp")
    }
    Option(old.listFiles()).toSeq.flatten.foreach(_.delete())
    old.delete()
    (before.size, dataFiles(d).size)
  }
}
