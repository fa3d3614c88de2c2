package graft.cdc

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType, StructField, StructType}

/** Machinery shared by the two-level bucketed prefix scans —
  * PrefixCarry (last-non-null) and graft.queries.PrefixSum (running
  * sum): the cross-bucket resolution for the KEYLESS case.
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

  /** The prefix family's seq columns must be integer-spaced: the
    * strictly-smaller/greater RANGE frames (`rangeBetween(…, -1)` /
    * the negated mirror) and `seq div bucket` assignment are exact
    * only on integral values — a DOUBLE seq would silently exclude
    * rows within 1.0 below the current value, violating the documented
    * contract. Rejected up front so the failure is loud, not a wrong
    * answer. */
  def requireIntegralSeq(df: DataFrame, seqCol: String, who: String): Unit =
    df.schema(seqCol).dataType match {
      case ByteType | ShortType | IntegerType | LongType => ()
      case t => throw new IllegalArgumentException(
        s"$who requires an integral seq column, got `$seqCol`: " +
          s"${t.simpleString} — the strictly-below range frames and " +
          "`seq div bucket` bucketing are exact only on integer-spaced " +
          "values; discretize first (micros as BIGINT, cents, ...)")
    }

  /** Bucket-summary rows a single sorted-fold task may scan. The carry
    * always runs as two levels over SUPER-buckets of this many bucket
    * ids, so no task ever folds more than this many rows — see
    * [[keylessCarry]]. */
  val maxCarryRows: Long = 1L << 20

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

  /** Exclusive folded carry over KEYLESS bucket summaries. `summaries`
    * must have exactly two columns: the bucket id then the per-bucket
    * value. Output (_b, _carry_in) gives each bucket the fold of all
    * STRICTLY-EARLIER buckets' values (the first bucket gets `init`).
    *
    * The fold must absorb a folded TOTAL as if it were a plain value:
    * fold(a, foldLeft(init, vs)) == foldLeft(a, vs). Both users satisfy
    * it — running sum from a zero init (a + sum(vs)) and last-non-null
    * from a null init (vs' last non-null, or a when there is none).
    *
    * No task here ever scans more than `superSize` rows, whatever the
    * seq range: bucket ids are DISTINCT, so grouping them by
    * `_b div superSize` puts at most superSize summary rows in each
    * super-bucket — a density-independent bound, unlike the row→bucket
    * level. Each super-bucket folds its own summaries in bucket order
    * (one bounded task per super-bucket, parallel across them); a
    * single task then resolves the exclusive carry ACROSS super-buckets
    * from their totals — ≤ #buckets / superSize ≤ superSize rows for
    * any corpus below superSize² = 2^40 buckets, i.e. ~10^17 rows at
    * the 64Ki-row bucket target; a third level would only be needed
    * beyond that. When everything fits one super-bucket the scheme
    * degenerates to the plain single-task fold it replaced, at the cost
    * of one extra exchange of the (tiny) summary frame. */
  def keylessCarry(summaries: DataFrame, init: Any,
      superSize: Long = maxCarryRows)
      (fold: (Any, Any) => Any): DataFrame = {
    val bCol = summaries.columns(0)
    val vField = summaries.schema.fields(1)
    val nonNull = summaries.filter(col(bCol).isNotNull)
    // FLOOR division, not `div`: truncation would merge the negative
    // bucket ids in (−superSize, superSize) with super-bucket 0 and
    // double the documented per-task bound on replays with negative
    // seqs; (b − pmod(b, n)) div n floors exactly in integer space
    val withSuper = nonNull
      .select(expr(s"(`$bCol` - pmod(`$bCol`, $superSize)) div $superSize")
        .as("_sb"),
        col(bCol), col(vField.name))
    // per-super-bucket folded totals, in bucket order (groups are
    // contiguous after the sort; the buffer holds one row per
    // super-bucket in the partition, not per summary row)
    val totalsSchema = StructType(Seq(StructField("_sb", LongType),
      StructField("_total", vField.dataType)))
    val totals = withSuper
      .repartition(col("_sb")).sortWithinPartitions("_sb", bCol)
      .mapPartitions { it =>
        val out = scala.collection.mutable.ArrayBuffer.empty[Row]
        var cur: java.lang.Long = null
        var acc: Any = init
        it.foreach { r =>
          val sb = r.getLong(0)
          if (cur == null) cur = sb
          else if (sb != cur.longValue) {
            out += Row(cur.longValue, acc); cur = sb; acc = init
          }
          acc = fold(acc, r.get(2))
        }
        if (cur != null) out += Row(cur.longValue, acc)
        out.iterator
      }(Encoders.row(totalsSchema))
    // exclusive carry ACROSS super-buckets: deliberately ONE task over
    // the totals (≤ #buckets / superSize rows — see scaladoc bound),
    // written as mapPartitions because a keyless window would plan
    // through WindowExec's empty-partition path (literal partition keys
    // fold away under EliminateWindowPartitions) and warn on every run
    // for a scan that is safely sequential.
    val carrySchema = StructType(Seq(StructField("_sb", LongType),
      StructField("_sc", vField.dataType)))
    val superCarry = totals
      .repartition(1).sortWithinPartitions("_sb")
      .mapPartitions { it =>
        var acc: Any = init
        it.map { r =>
          val out = Row(r.getLong(0), acc)
          acc = fold(acc, r.get(1))
          out
        }
      }(Encoders.row(carrySchema))
    // final pass: re-fold each super-bucket from its across-super carry
    // (the join cannot miss — superCarry covers every _sb in withSuper,
    // and its _sc for the first super-bucket is `init` itself)
    val outSchema = StructType(Seq(summaries.schema.fields(0),
      StructField("_carry_in", vField.dataType)))
    withSuper
      .join(broadcast(superCarry), Seq("_sb"))
      .repartition(col("_sb")).sortWithinPartitions("_sb", bCol)
      .mapPartitions { it =>
        var cur: java.lang.Long = null
        var acc: Any = init
        it.map { r =>
          val sb = r.getLong(0)
          if (cur == null || sb != cur.longValue) {
            cur = sb; acc = r.get(3)
          }
          val out = Row(r.get(1), acc)
          acc = fold(acc, r.get(2))
          out
        }
      }(Encoders.row(outSchema))
  }
}
