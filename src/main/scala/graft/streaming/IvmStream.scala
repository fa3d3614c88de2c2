package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** Streaming INCREMENTAL VIEW MAINTENANCE — the continuous face of
  * cdc8: a per-status count aggregate maintained across microbatches
  * from signed change-stream deltas, never rescanning history.
  *
  * The batch operator recovers each event's predecessor status with one
  * lag(1) window — legal only because every event is present. A stream
  * sees arbitrary slices, so the predecessor lives in STATE: alongside
  * the maintained counts, a (pk → last status) table advances with each
  * batch; an event's predecessor is the in-batch lag where the batch
  * has one, else the state lookup (the exact seam the slice cut).
  *
  * Both tables are VERSIONED BY BATCH ID (`.../b=<id>`), written to a
  * temp dir and renamed: processing batch b reads version b−1 and
  * writes version b, so a re-delivered batch recomputes from the same
  * input and predecessor state and lands the same bytes — idempotent,
  * the foreachBatch crash contract. On a cluster filesystem without
  * atomic rename, land versions with the marker-committed pattern of
  * graft.sinks (parquet-exactly-once).
  *
  * Scale: per batch, one bounded lag window over the batch's own rows,
  * one equi-join against state on pk (bucket the state table on pk via
  * graft.sinks.Bucketing to make it co-located), and a |statuses|-row
  * counts merge. State size is |live keys| — the same footprint a
  * snapshot-maintaining sink already carries. */
object IvmStream {

  private val countsSchema = StructType(Seq(
    StructField("status", StringType), StructField("n", LongType)))
  private val lastSchema = StructType(Seq(
    StructField("pk", LongType), StructField("status", StringType)))

  private def readVersion(spark: SparkSession, dir: String, batchId: Long,
      schema: StructType): DataFrame = {
    val p = new java.io.File(s"$dir/b=$batchId")
    if (batchId >= 0 && p.exists())
      spark.read.schema(schema).parquet(p.toString)
    else spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
  }

  private def writeVersion(df: DataFrame, dir: String,
      batchId: Long): Unit = {
    val tmp = new java.io.File(s"$dir/.tmp-b=$batchId")
    val dst = new java.io.File(s"$dir/b=$batchId")
    df.write.mode("overwrite").parquet(tmp.toString)
    if (dst.exists()) { // re-delivery: replace the identical version
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete()
      }
      rm(dst)
    }
    require(tmp.renameTo(dst), s"rename $tmp -> $dst failed")
  }

  /** Current maintained counts (after the latest committed batch). */
  def counts(spark: SparkSession, stateDir: String): DataFrame = {
    val versions = Option(new java.io.File(s"$stateDir/counts").listFiles())
      .getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith("b="))
      .map(_.getName.stripPrefix("b=").toLong)
    if (versions.isEmpty) spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], countsSchema)
    else readVersion(spark, s"$stateDir/counts", versions.max, countsSchema)
  }

  /** One microbatch of decoded envelopes (pk, seq, kind, status) through
    * the maintenance loop. Exposed for tests; `start` wires it into
    * foreachBatch. */
  private[streaming] def processBatch(batch: DataFrame, batchId: Long,
      stateDir: String): Unit = {
    val spark = batch.sparkSession
    // a missing predecessor version means a batch-id gap or a
    // checkpoint reset against existing state — continuing from empty
    // state would silently corrupt the maintained aggregate
    require(batchId == 0 ||
      new java.io.File(s"$stateDir/counts/b=${batchId - 1}").exists(),
      s"state version b=${batchId - 1} missing under $stateDir/counts — " +
        "batch-id gap or checkpoint reset; rebuild the view from a full " +
        "replay instead of silently restarting from empty state")
    val w = Window.partitionBy("pk").orderBy("seq")
    // in_state marks "this pk exists in carried state" explicitly:
    // state_status.isNotNull can't — NULL is a legitimate last status
    // (statusDeltas' contract), and its −1 must still land on it
    val prevLast = readVersion(spark, s"$stateDir/last", batchId - 1,
      lastSchema).withColumnRenamed("status", "state_status")
      .withColumn("in_state", lit(true))
    val ev = batch
      .filter(col("kind").isin("insert", "update", "delete"))
      .withColumn("prev_in", lag(col("status"), 1).over(w))
      .withColumn("rn", row_number().over(w))
      .join(prevLast, Seq("pk"), "left")
      .withColumn("prev",
        when(col("rn") === 1, col("state_status")).otherwise(col("prev_in")))
      .withColumn("has_prev",
        col("rn") > 1 || coalesce(col("in_state"), lit(false)))
      .localCheckpoint() // deltas + last-state advance both fork it
    // an update/delete whose predecessor neither the batch nor the
    // state knows = the stream started mid-history; its −1 has no
    // status to land on, so the view would silently drift — fail loudly
    val orphans = ev.filter(
      col("kind").isin("update", "delete") && !col("has_prev")).count()
    require(orphans == 0,
      s"$orphans update/delete event(s) with unknown predecessor state — " +
        "the stream was attached mid-history; seed the state tables from " +
        "a snapshot (cdc5) before attaching")
    val deltas = graft.queries.CdcOps.statusDeltas(ev)
      .withColumnRenamed("delta", "n")
    val newCounts = readVersion(spark, s"$stateDir/counts", batchId - 1,
        countsSchema)
      .unionByName(deltas)
      .groupBy("status").agg(sum(col("n")).as("n"))
      .filter(col("n") =!= 0)
    // last-status advance: latest in-batch event per pk wins; deletes
    // drop the key; untouched keys carry over
    val lastInBatch = ev.groupBy("pk")
      .agg(max_by(struct(col("kind"), col("status")), col("seq")).as("l"))
      .select(col("pk"), col("l.kind").as("kind"),
        col("l.status").as("status"))
    val newLast = prevLast
      .join(lastInBatch.select("pk"), Seq("pk"), "left_anti")
      .select(col("pk"), col("state_status").as("status"))
      .unionByName(lastInBatch.filter(col("kind") =!= "delete")
        .select("pk", "status"))
    writeVersion(newCounts, s"$stateDir/counts", batchId)
    writeVersion(newLast, s"$stateDir/last", batchId)
    // retention: re-delivery of batch b only ever reads b−1; versions
    // ≤ b−2 are dead weight that would otherwise grow O(batches)
    Seq("counts", "last").foreach { t =>
      Option(new java.io.File(s"$stateDir/$t").listFiles())
        .getOrElse(Array.empty)
        .filter(f => f.isDirectory && f.getName.startsWith("b=") &&
          f.getName.stripPrefix("b=").toLong <= batchId - 2)
        .foreach { f =>
          def rm(x: java.io.File): Unit = {
            Option(x.listFiles()).foreach(_.foreach(rm)); x.delete()
          }
          rm(f)
        }
    }
  }

  /** Wire a streaming frame of decoded envelopes into the loop. */
  def start(envelopes: DataFrame, stateDir: String,
      checkpoint: String): StreamingQuery =
    envelopes.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (b: DataFrame, id: Long) =>
        processBatch(b, id, stateDir)
      }
      .start()
}
