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

/** Scale-safe NEXT-NEIGHBOR lookup in `seqCol` order — the third
  * sibling of the two-level bucketed prefix family (PrefixCarry =
  * last-non-null, PrefixSum = running sum, PrefixLead = next seq):
  * each row gets the smallest seq value STRICTLY GREATER than its own
  * within its `keys` group, null for the group maximum.
  *
  * A naive `lead(seq) over (partition by key order by seq)` funnels
  * every row of a hot key through ONE task — for a low-cardinality key
  * (the q38b interval-union case: 5 event types over corpus-scale
  * distinct timestamps) that is ~n/|keys| rows per task at any scale.
  * Bucketed, the lead is local to each (key, seq-bucket) window except
  * for each bucket's LAST row, whose successor is the next non-empty
  * bucket's minimum — resolved on the per-bucket SUMMARY frame
  * (#buckets rows per key, the same bounded level-2 argument as the
  * carry) and broadcast back.
  *
  * Contract: input rows must be UNIQUE per (keys, seqCol) — collapse
  * to a histogram first (the natural shape for gap/island work; a
  * duplicate would make "next" ambiguous between a peer and the true
  * successor). Null seqs are position-less (null out, never a
  * successor), mirroring the BucketedScan null-seq contract. */
object PrefixLead {

  /** Appends `outCol` = the group's next strictly-greater seq value
    * (null at the group max). Input columns are preserved. */
  def nextSeq(df: DataFrame, outCol: String,
      seqCol: String = "seq", keys: Seq[String] = Nil,
      bucketSize: Long = 0): DataFrame = {
    val sizedBucket =
      if (bucketSize > 0) bucketSize else BucketedScan.autoBucketSize(df, seqCol)
    val withB = df.withColumn("_b", expr(s"`$seqCol` div $sizedBucket"))
    val keyCols = keys.map(col)
    val grpCols = keyCols :+ col("_b")
    // level 2: each non-empty bucket's minimum seq, then the NEXT
    // bucket's minimum via a lead over the summary frame (keyed window
    // over ≤ #buckets rows per key; keyless → one summary partition of
    // #buckets rows — bounded by rows/64Ki at the auto size)
    val summaries = withB
      .filter(col("_b").isNotNull)
      .groupBy(grpCols: _*)
      .agg(min(col(seqCol)).as("_bmin"))
    val nextB =
      if (keyCols.isEmpty) {
        // "next bucket's min" = the nearest STRICTLY-LATER bucket's
        // value = an exclusive last-non-null carry over NEGATED bucket
        // ids (ascending -b ⟺ descending b, carry = closest larger b)
        // — rides the shared super-bucketed fold, never one big task
        val neg = summaries.select((-col("_b")).as("_nb"), col("_bmin"))
        BucketedScan.keylessCarry(neg, null)(
          (acc, v) => if (v != null) v else acc)
          .select((-col("_nb")).as("_b"), col("_carry_in").as("_nextb"))
      } else {
        val wS = Window.partitionBy(keyCols: _*).orderBy(col("_b"))
        summaries.withColumn("_nextb", lead(col("_bmin"), 1).over(wS))
          .select(grpCols :+ col("_nextb"): _*)
      }
    // level 1: in-bucket lead, bounded by the bucket row count; the
    // bucket's last row falls through to the next bucket's minimum
    val wIn = Window.partitionBy(grpCols: _*).orderBy(col(seqCol))
    withB
      .withColumn("_lead", lead(col(seqCol), 1).over(wIn))
      .join(broadcast(nextB), keys :+ "_b", "left")
      .withColumn(outCol,
        when(col(seqCol).isNull, lit(null))
          .otherwise(coalesce(col("_lead"), col("_nextb"))))
      .drop("_b", "_lead", "_nextb")
  }
}
