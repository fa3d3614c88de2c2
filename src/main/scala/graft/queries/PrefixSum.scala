package graft.queries

import graft.cdc.BucketedScan
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Scale-safe EXCLUSIVE running sum in `seqCol` order — the additive
  * sibling of graft.cdc.PrefixCarry (same two-level argument, sum
  * instead of last-non-null).
  *
  * A naive `sum(x) over (partition by key order by seq)` puts every row
  * of a key into ONE window task; with few or no keys (a global
  * document order, exactly the sequence-packing case) that is a
  * single-task scan of the corpus. Bucketing by `seq div bucketSize`
  * bounds level 1 at bucketSize rows per task, and level 2 runs over
  * one summary row per bucket — linear, tiny, broadcast back.
  *
  * Sizing mirrors PrefixCarry: the default (bucketSize = 0) self-sizes
  * from a narrow count/min/max agg (BucketedScan.autoBucketSize) so
  * level-1 tasks hold ~64 Ki rows and the summary stays ~rows/64 Ki,
  * whatever the seq range; pass an explicit size to pin it. The keyless
  * cross-bucket fold recurses over SUPER-buckets itself
  * (BucketedScan.keylessCarry), so no carry task ever scans more than
  * 2^20 summary rows at any seq range.
  */
object PrefixSum {

  /** Appends `outCol` = sum of `valueCol` over all rows with STRICTLY
    * SMALLER `seqCol` in the same `keys` group; rows sharing a seq value
    * share the same sum (none of each other's), and the smallest seq of
    * a group gets 0. Null values count as 0. Input columns are
    * preserved. */
  def exclusiveRunningSum(df: DataFrame, valueCol: String, outCol: String,
      seqCol: String = "seq", keys: Seq[String] = Nil,
      bucketSize: Long = 0): DataFrame = {
    // Like PrefixCarry, this forks `df` into a main + summary branch;
    // the summary stays a narrow partial-agg scan. Callers with an
    // expensive upstream should materialize it first (see PrefixCarry).
    val sizedBucket =
      if (bucketSize > 0) bucketSize else BucketedScan.autoBucketSize(df, seqCol)
    val withB = df.withColumn("_b", expr(s"`$seqCol` div $sizedBucket"))
    val keyCols = keys.map(col)
    val grpCols = keyCols :+ col("_b")
    val summaries = withB
      .select(grpCols :+ col(valueCol).as("_v"): _*)
      .groupBy(grpCols: _*)
      .agg(sum(col("_v")).as("_bsum"))
    // Cross-bucket carry: keyed → window partitioned by the keys
    // (≤ #buckets summary rows per key); keyless → the shared
    // single-task sorted fold (BucketedScan.keylessCarry, which also
    // owns the null-seq contract both scans share).
    val carryIn =
      if (keyCols.isEmpty) {
        summaries.schema("_bsum").dataType match {
          case LongType => BucketedScan.keylessCarry(summaries, 0L)(
            (acc, v) => if (v == null) acc
              else acc.asInstanceOf[Long] + v.asInstanceOf[Long])
          case DoubleType => BucketedScan.keylessCarry(summaries, 0.0)(
            (acc, v) => if (v == null) acc
              else acc.asInstanceOf[Double] + v.asInstanceOf[Double])
          case t => throw new IllegalArgumentException(
            s"keyless exclusiveRunningSum over $t not supported (add a " +
              "fold case or pre-cast the value column to long/double)")
        }
      } else {
        val wSum = Window.partitionBy(keyCols: _*).orderBy(col("_b"))
          .rowsBetween(Window.unboundedPreceding, -1)
        summaries.filter(col("_b").isNotNull)
          .withColumn("_carry_in", sum(col("_bsum")).over(wSum))
          .select(grpCols :+ col("_carry_in"): _*)
      }
    // RANGE frame, not ROWS: with duplicate seq values a ROWS frame
    // would hand one duplicate the other's value in partition-layout
    // order (nondeterministic); the range frame gives every row the sum
    // over seq values STRICTLY below its own, honoring the contract.
    val wIn = Window.partitionBy(grpCols: _*).orderBy(col(seqCol))
      .rangeBetween(Window.unboundedPreceding, -1)
    withB
      .withColumn("_local", sum(col(valueCol)).over(wIn))
      .join(broadcast(carryIn), keys :+ "_b", "left")
      .withColumn(outCol,
        coalesce(col("_local"), lit(0L)) + coalesce(col("_carry_in"), lit(0L)))
      .drop("_b", "_local", "_carry_in")
  }
}
