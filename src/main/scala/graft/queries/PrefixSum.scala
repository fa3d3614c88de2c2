package graft.queries

import graft.cdc.BucketedScan
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}

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
  * whatever the seq range; pass an explicit size to pin it. BOTH
  * cross-bucket folds recurse over SUPER-buckets — keyless through
  * BucketedScan.keylessCarry, keyed through windows over
  * `_b div superSize` groups — so no carry task ever scans more than
  * `superSize` (default 2^20) summary rows at any seq range or key
  * skew: a key's summaries split across #buckets/superSize bounded
  * within-super windows, and the across-super fold per key is one row
  * per super-bucket (≤ superSize rows for any corpus below superSize²
  * buckets ≈ 10^17 rows at the 64Ki bucket target — the keylessCarry
  * bound, now uniform across both branches).
  *
  * `seqCol` must be integral (byte/short/int/long): the
  * strictly-smaller RANGE frame (`rangeBetween(…, -1)`) and the
  * `seq div bucket` assignment are exact only on integer-spaced
  * values — a double seq would silently exclude rows within 1.0 below
  * the current value. Discretize first (micros as BIGINT, cents, …).
  */
object PrefixSum {

  /** Appends `outCol` = sum of `valueCol` over all rows with STRICTLY
    * SMALLER `seqCol` in the same `keys` group; rows sharing a seq value
    * share the same sum (none of each other's), and the smallest seq of
    * a group gets 0. Null values count as 0. Input columns are
    * preserved. `superSize` bounds the rows any cross-bucket carry task
    * scans (exposed for specs; the default is the documented 2^20). */
  def exclusiveRunningSum(df: DataFrame, valueCol: String, outCol: String,
      seqCol: String = "seq", keys: Seq[String] = Nil,
      bucketSize: Long = 0,
      superSize: Long = BucketedScan.maxCarryRows): DataFrame = {
    BucketedScan.requireIntegralSeq(df, seqCol, "PrefixSum.exclusiveRunningSum")
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
    // Cross-bucket carry: keyless → the shared recursive sorted fold
    // (BucketedScan.keylessCarry, which also owns the null-seq contract
    // both scans share); keyed → the same two-level shape in window
    // form: an exclusive in-super running sum over (keys, _sb) plus an
    // exclusive across-super fold of per-super totals per key — both
    // windows bounded at superSize rows per task, never #buckets.
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
        // FLOOR division (keylessCarry's trick): truncation would merge
        // negative bucket ids in (−superSize, superSize) with super 0
        val nn = summaries.filter(col("_b").isNotNull).withColumn("_sb",
          expr(s"(`_b` - pmod(`_b`, $superSize)) div $superSize"))
        val superCols = keyCols :+ col("_sb")
        val wLocal = Window.partitionBy(superCols: _*).orderBy(col("_b"))
          .rowsBetween(Window.unboundedPreceding, -1)
        val wSuper = Window.partitionBy(keyCols: _*).orderBy(col("_sb"))
          .rowsBetween(Window.unboundedPreceding, -1)
        // the per-super totals frame keeps the `_bsum` summary marker —
        // the skew lint's structural exemption keys on it
        val superCarry = nn
          .groupBy(superCols: _*).agg(sum(col("_bsum")).as("_bsum"))
          .withColumn("_sc", sum(col("_bsum")).over(wSuper))
          .select(superCols :+ col("_sc"): _*)
        nn.withColumn("_lc", sum(col("_bsum")).over(wLocal))
          .join(broadcast(superCarry), keys :+ "_sb")
          .withColumn("_carry_in",
            when(col("_lc").isNull && col("_sc").isNull, lit(null))
              .otherwise(coalesce(col("_lc"), lit(0L)) +
                coalesce(col("_sc"), lit(0L))))
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
  * Bucketed, the successor is local to each (key, seq-bucket) window
  * except for each bucket's LAST rows, whose successor is the next
  * non-empty bucket's minimum — resolved on the per-bucket SUMMARY
  * frame, itself two-level over SUPER-buckets (keyless through
  * BucketedScan.keylessCarry; keyed through an in-super lead plus an
  * across-super lead of per-super minima, every task ≤ superSize
  * rows — the same recursion as PrefixSum's keyed carry).
  *
  * Duplicate (keys, seqCol) rows are SAFE: level 1 computes the
  * successor as `-max(-seq)` over a strictly-below RANGE frame, so a
  * peer's EQUAL seq is never returned (a plain lead() would silently
  * hand it over). Collapsing to a distinct histogram first is still
  * the natural shape for gap/island work — it shrinks the frame — but
  * it is no longer a correctness precondition. `seqCol` must be
  * integral (the range frame and bucketing are exact only on
  * integer-spaced values). Null seqs are position-less (null out,
  * never a successor), mirroring the BucketedScan null-seq contract. */
object PrefixLead {

  /** Appends `outCol` = the group's next strictly-greater seq value
    * (null at the group max). Input columns are preserved. */
  def nextSeq(df: DataFrame, outCol: String,
      seqCol: String = "seq", keys: Seq[String] = Nil,
      bucketSize: Long = 0,
      superSize: Long = BucketedScan.maxCarryRows): DataFrame = {
    BucketedScan.requireIntegralSeq(df, seqCol, "PrefixLead.nextSeq")
    val sizedBucket =
      if (bucketSize > 0) bucketSize else BucketedScan.autoBucketSize(df, seqCol)
    val withB = df.withColumn("_b", expr(s"`$seqCol` div $sizedBucket"))
    val keyCols = keys.map(col)
    val grpCols = keyCols :+ col("_b")
    // level 2: each non-empty bucket's minimum seq, then the NEXT
    // bucket's minimum — never resolved in one per-key task: both
    // branches recurse over super-buckets of `superSize` bucket ids
    val summaries = withB
      .filter(col("_b").isNotNull)
      .groupBy(grpCols: _*)
      .agg(min(col(seqCol)).as("_bmin"))
    val nextB =
      if (keyCols.isEmpty) {
        // "next bucket's min" = the nearest STRICTLY-LATER bucket's
        // value = an exclusive last-non-null carry over ORDER-REVERSED
        // bucket ids (ascending ~b ⟺ descending b, carry = closest
        // larger b) — rides the shared super-bucketed fold, never one
        // big task. Bitwise NOT, not arithmetic negation: ~x = -x-1 is
        // a strictly-decreasing BIJECTION on the full signed domain
        // (negating Long.MinValue would wrap silently under non-ANSI
        // arithmetic and corrupt the fold order), and keylessCarry only
        // SORTS and floor-divides the id — no ±1 value arithmetic that
        // could wrap at the mapped extremes.
        val neg = summaries.select(bitwise_not(col("_b")).as("_nb"),
          col("_bmin"))
        BucketedScan.keylessCarry(neg, null)(
          (acc, v) => if (v != null) v else acc)
          .select(bitwise_not(col("_nb")).as("_b"),
            col("_carry_in").as("_nextb"))
      } else {
        val nn = summaries.withColumn("_sb",
          expr(s"(`_b` - pmod(`_b`, $superSize)) div $superSize"))
        val superCols = keyCols :+ col("_sb")
        val wS = Window.partitionBy(superCols: _*).orderBy(col("_b"))
        val wSuper = Window.partitionBy(keyCols: _*).orderBy(col("_sb"))
        // bucketing is monotone in seq, so min(_bmin) per super IS the
        // smallest bucket's min — the value the PREVIOUS super's last
        // bucket needs as its successor (frame keeps the `_bmin`
        // summary marker for the skew lint's structural exemption)
        val nextFirst = nn
          .groupBy(superCols: _*).agg(min(col("_bmin")).as("_bmin"))
          .withColumn("_nf", lead(col("_bmin"), 1).over(wSuper))
          .select(superCols :+ col("_nf"): _*)
        nn.withColumn("_il", lead(col("_bmin"), 1).over(wS))
          .join(broadcast(nextFirst), keys :+ "_sb")
          .withColumn("_nextb", coalesce(col("_il"), col("_nf")))
          .select(grpCols :+ col("_nextb"): _*)
      }
    // level 1: in-bucket strictly-greater successor, bounded by the
    // bucket row count. NOT lead(): with duplicate seqs lead() returns
    // a peer's equal value. The smallest seq strictly above the current
    // row = ~(largest ~seq strictly below) — a growing range frame over
    // BIT-FLIPPED seq, streamed O(n) by the unbounded-preceding frame
    // processor (the mirrored frame, rangeBetween(1, unboundedFollowing),
    // would re-aggregate per row — O(n²) per bucket). The bucket's last
    // rows fall through to the next bucket's minimum.
    //
    // NOT `-seq`: negating Byte/Short/Long.MinValue wraps silently
    // under non-ANSI arithmetic (and throws under ANSI), corrupting
    // the ordering for a seq domain requireIntegralSeq explicitly
    // admits. Two exact order-reversing encodings, by width:
    //   - byte/short/int: ~(seq cast long) — a bijection with the
    //     whole image strictly inside the long range, so Spark's
    //     frame-bound arithmetic (`ord + (-1)`, evaluated in LONG)
    //     can never overflow either;
    //   - long: -(seq cast Decimal(20,0)) — bit-flipped LONG would
    //     put seq = Long.MaxValue at ord = Long.MinValue, where the
    //     frame bound itself overflows (observed as an ANSI
    //     ARITHMETIC_OVERFLOW; a silent wrap non-ANSI). Decimal
    //     negation, bound arithmetic (which widens precision), and
    //     the cast back are exact over the full long domain; the
    //     decimal sort key is the price of admitting all 2^64 values.
    val seqType = df.schema(seqCol).dataType
    val (ordFlip, unflip) = seqType match {
      case LongType =>
        val o = -col(seqCol).cast(DecimalType(20, 0))
        (o, (m: Column) => (-m).cast(LongType))
      case _ =>
        val o = bitwise_not(col(seqCol).cast(LongType))
        (o, (m: Column) => bitwise_not(m).cast(seqType))
    }
    val wIn = Window.partitionBy(grpCols: _*).orderBy(ordFlip)
      .rangeBetween(Window.unboundedPreceding, -1)
    withB
      .withColumn("_lead", unflip(max(ordFlip).over(wIn)))
      .join(broadcast(nextB), keys :+ "_b", "left")
      .withColumn(outCol,
        when(col(seqCol).isNull, lit(null))
          .otherwise(coalesce(col("_lead"), col("_nextb"))))
      .drop("_b", "_lead", "_nextb")
  }
}
