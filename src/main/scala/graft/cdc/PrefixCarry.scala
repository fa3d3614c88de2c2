package graft.cdc

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scale-safe "carry the latest non-null value forward in stream order"
  * — the shape behind every batch CDC carry: tx-id carry (the reference
  * tracks the open transaction in a single mutable variable,
  * postgresql.js:447-450), schema-cache attach (postgresql.js:430-436),
  * and the MySQL tablemap → pk-column carry (mysql.js:113-140).
  *
  * A naive `last(value, ignoreNulls) over (partition by key order by
  * seq)` funnels every row of a hot key through ONE task — the exact
  * skew that kills a 100 TB replay. Instead, rows are bucketed by
  * `seq div bucketSize` and the scan runs at two levels:
  *
  *   1. inside each (key, bucket): a PARTITIONED window — bounded by
  *      bucketSize rows per task regardless of key skew;
  *   2. across buckets: a running last-non-null over the per-bucket
  *      SUMMARIES (one row per (key, bucket)), which is a linear scan of
  *      #buckets rows — near-nothing relative to the data — and is then
  *      broadcast back onto the buckets.
  *
  * Level 2 is a keyed window (or, keyless, the BucketedScan single-task
  * fold) — never a non-equi self-join: joining every bucket against
  * every earlier summary-bearing bucket would be
  * O(#buckets × #summary-buckets) pairs, quadratic in stream length at
  * fixed bucketSize. The summary resolution is single-pass.
  *
  * Sizing: level 2 holds seqRange / bucketSize rows per key group in one
  * window partition. The default (bucketSize = 0) SELF-SIZES from the
  * data — one narrow count/min/max agg targets ~64 Ki rows per level-1
  * task AND ~rows/64 Ki summary rows, whatever the seq range
  * (BucketedScan.autoBucketSize; a fixed range-based default either
  * collapses a short dense replay into one bucket or explodes the
  * summary count on a sparse one). Pass an explicit size to pin it.
  * For replays where even rows/64 Ki summaries are too many, the
  * KEYLESS fold already applies the same argument one level up — super-
  * buckets of bucket ids (BucketedScan.keylessCarry) bound every carry
  * task at 2^20 rows for any corpus under 2^40 buckets. The keyed path
  * bounds each window partition by that key's summaries instead.
  *
  * The streaming paths don't need any of this — they keep the same
  * semantics as keyed state (graft.streaming.CdcPipeline /
  * BinlogStream); this is the batch/replay/oracle path only.
  */
object PrefixCarry {

  /** Adds `outCol` = latest non-null `valueCol` at or before each row in
    * `seqCol` order, independently per `keys` group (null keys group as
    * usual for a window but never receive a cross-bucket carry — fine
    * for CDC, where null-table rows carry no schema). Input column order
    * is preserved; `outCol` is appended. */
  def lastNonNull(df: DataFrame, valueCol: String, outCol: String,
      seqCol: String = "seq", keys: Seq[String] = Nil,
      bucketSize: Long = 0): DataFrame = {
    val sizedBucket =
      if (bucketSize > 0) bucketSize else BucketedScan.autoBucketSize(df, seqCol)
    // NOTE for callers: this function forks `df` into a main branch and
    // a bucket-summary branch. The two subtrees prune different columns,
    // so ReuseExchange can NEVER share them — an expensive upstream
    // (JSON decode, a join chain) is evaluated once per branch, and
    // nested carries compound that multiplicatively (cdc1's tx-id +
    // schema-attach pair re-decoded its stream ~6x, 19s at sf0.1).
    // Batch/replay callers must materialize expensive inputs first
    // (eager localCheckpoint — see CdcOps.cdc1_decode / BinlogCdc.decode:
    // 19s → 7.5s); the summary branch below is then a cheap narrow
    // partial-agg scan of the snapshot.
    val withB = df.withColumn("_b", expr(s"`$seqCol` div $sizedBucket"))
    val keyCols = keys.map(col)
    val grpCols = keyCols :+ col("_b")
    // ONE summary aggregate yields both the (key, bucket) universe and
    // each bucket's last non-null value (max_by with a null-guarded
    // ordering key ignores null-value rows; an all-null bucket gets a
    // null _last but still a summary row, which the carry window needs).
    // The narrow projection before the groupBy keeps the summary
    // branch's shuffle to (keys, bucket, seq, value) rows with map-side
    // partial aggregation — ~one row per (key, bucket) per task.
    val summaries = withB
      .select(grpCols :+ col(seqCol).as("_s") :+ col(valueCol).as("_v"): _*)
      .groupBy(grpCols: _*)
      .agg(max_by(col("_v"),
        when(col("_v").isNotNull, col("_s"))).as("_last"))
    // running last-non-null over the summaries, strictly-earlier buckets
    // only. Keyed: a window partitioned by the keys (≤ #buckets summary
    // rows per key — bounded); keyless: the shared single-task sorted
    // fold (BucketedScan.keylessCarry, which also owns the null-seq
    // contract — position-less rows receive and contribute no carry;
    // the keyed filter below drops their inert summaries likewise).
    val carryIn =
      if (keyCols.isEmpty)
        BucketedScan.keylessCarry(summaries, null)(
          (acc, v) => if (v != null) v else acc)
      else {
        val wSum = Window.partitionBy(keyCols: _*).orderBy(col("_b"))
          .rowsBetween(Window.unboundedPreceding, -1)
        summaries.filter(col("_b").isNotNull)
          .withColumn("_carry_in",
            last(col("_last"), ignoreNulls = true).over(wSum))
          .select(grpCols :+ col("_carry_in"): _*)
      }
    val wIn = Window.partitionBy(grpCols: _*).orderBy(col(seqCol))
      .rowsBetween(Window.unboundedPreceding, 0)
    withB
      .withColumn("_local", last(col(valueCol), ignoreNulls = true).over(wIn))
      .join(broadcast(carryIn), keys :+ "_b", "left")
      .withColumn(outCol, coalesce(col("_local"), col("_carry_in")))
      .drop("_b", "_local", "_carry_in")
  }
}
