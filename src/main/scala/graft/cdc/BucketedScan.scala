package graft.cdc

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StructField, StructType}

/** Machinery shared by the two-level bucketed prefix scans —
  * PrefixCarry (last-non-null) and graft.queries.PrefixSum (running
  * sum): the single-task cross-bucket resolution for the KEYLESS case.
  *
  * Null-seq contract (identical in both scans): a row with a null seq
  * is position-less — it belongs to no bucket, RECEIVES no cross-bucket
  * carry (a null bucket never equi-joins back onto the stream), and
  * CONTRIBUTES nothing to real buckets (null buckets are excluded from
  * the cross-bucket fold). Within the null peer group the caller's
  * level-1 window still applies. CDC decode and the packing/mix
  * callers always produce non-null seqs; the contract only bounds the
  * blast radius of malformed input.
  */
private[graft] object BucketedScan {

  /** Rows per level-1 task the auto-sizer targets. */
  val targetRowsPerBucket: Long = 1L << 16

  /** Data-adaptive bucket size: one narrow agg (count / min / max of the
    * seq column — callers have already materialized their input, per the
    * fork-recompute contract) sizes buckets so a UNIFORM seq density
    * yields ~64Ki rows per level-1 task and ~rows/64Ki summary rows —
    * both bounds scale with the DATA, not with a fixed seq-range guess.
    * A fixed default can't do both jobs: 64Ki of seq RANGE collapses a
    * short dense replay into one bucket (single-task carry), while a
    * huge sparse range would explode the summary count. Skewed seq
    * density can still overfill a bucket (heuristic, not a guarantee);
    * callers with pathological density can pass an explicit size. */
  def autoBucketSize(df: DataFrame, seqCol: String): Long = {
    val r = df.select(col(seqCol).cast("long").as("s"))
      .agg(count(col("s")), min(col("s")), max(col("s"))).head()
    if (r.getLong(0) == 0L || r.isNullAt(1)) targetRowsPerBucket
    else {
      val buckets = math.max(1L, r.getLong(0) / targetRowsPerBucket)
      val range = r.getLong(2) - r.getLong(1) + 1
      math.max(1L, (range + buckets - 1) / buckets)
    }
  }

  /** Single-task sorted fold over KEYLESS bucket summaries. `summaries`
    * must have exactly two columns: the bucket id then the per-bucket
    * value. Output (_b, _carry_in) gives each bucket the fold of all
    * STRICTLY-EARLIER buckets' values (the first bucket gets `init`).
    *
    * Deliberately ONE task: it runs over ≤ seqRange/bucketSize summary
    * rows, not the stream, and is written as mapPartitions because a
    * keyless window would plan through WindowExec's empty-partition
    * path (literal partition keys fold away under
    * EliminateWindowPartitions) and warn on every run for a scan that
    * is safely sequential. */
  def keylessCarry(summaries: DataFrame, init: Any)
      (fold: (Any, Any) => Any): DataFrame = {
    val bCol = summaries.columns(0)
    val outSchema = StructType(Seq(
      summaries.schema.fields(0),
      StructField("_carry_in", summaries.schema.fields(1).dataType)))
    summaries.filter(col(bCol).isNotNull)
      .repartition(1).sortWithinPartitions(bCol)
      .mapPartitions { it =>
        var acc = init
        it.map { r =>
          val out = Row(r.get(0), acc)
          acc = fold(acc, r.get(1))
          out
        }
      }(Encoders.row(outSchema))
  }
}
