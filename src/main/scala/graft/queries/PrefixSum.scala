package graft.queries

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType, StructField, StructType}

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
  * Sizing mirrors PrefixCarry: at the 64 Ki default the summary window
  * holds seqRange/bucketSize rows; beyond ~2³² of seq range raise the
  * bucket size or recurse over the summaries.
  */
object PrefixSum {

  /** Appends `outCol` = sum of `valueCol` over all rows with STRICTLY
    * SMALLER `seqCol` in the same `keys` group; rows sharing a seq value
    * share the same sum (none of each other's), and the smallest seq of
    * a group gets 0. Null values count as 0. Input columns are
    * preserved. */
  def exclusiveRunningSum(df: DataFrame, valueCol: String, outCol: String,
      seqCol: String = "seq", keys: Seq[String] = Nil,
      bucketSize: Long = 1L << 16): DataFrame = {
    // Like PrefixCarry, this forks `df` into a main + summary branch;
    // the summary stays a narrow partial-agg scan. Callers with an
    // expensive upstream should materialize it first (see PrefixCarry).
    val withB = df.withColumn("_b", expr(s"`$seqCol` div $bucketSize"))
    val keyCols = keys.map(col)
    val grpCols = keyCols :+ col("_b")
    val summaries = withB
      .select(grpCols :+ col(valueCol).as("_v"): _*)
      .groupBy(grpCols: _*)
      .agg(sum(col("_v")).as("_bsum"))
    // Cross-bucket carry: keyed → window partitioned by the keys
    // (≤ #buckets summary rows per key). Keyless → the scan is global
    // and sequential by nature, so it runs as ONE explicit task over the
    // summaries via sorted mapPartitions; a keyless window would plan
    // through WindowExec's empty-partition path (literal partition keys
    // fold away) and warn on every run. Same resolution as
    // graft.cdc.PrefixCarry's keyless branch.
    val carryIn =
      if (keyCols.isEmpty) {
        val sumType = summaries.schema("_bsum").dataType
        val outSchema = StructType(Seq(
          summaries.schema("_b"),
          StructField("_carry_in", sumType)))
        // a null-seq row yields a null `_b` summary; it sorts FIRST
        // (a window's nulls-first order — its sum feeds every real
        // bucket) and its own out-row never matches the `_b` equi-join,
        // so null-seq rows keep their partition-local sum only.
        val scan = summaries.repartition(1).sortWithinPartitions("_b")
        sumType match {
          case LongType => scan.mapPartitions { it =>
            var acc = 0L
            it.map { r =>
              val out = Row(r.get(0), acc)
              if (!r.isNullAt(1)) acc += r.getLong(1)
              out
            }
          }(Encoders.row(outSchema))
          case DoubleType => scan.mapPartitions { it =>
            var acc = 0.0
            it.map { r =>
              val out = Row(r.get(0), acc)
              if (!r.isNullAt(1)) acc += r.getDouble(1)
              out
            }
          }(Encoders.row(outSchema))
          case t => throw new IllegalArgumentException(
            s"keyless exclusiveRunningSum over $t not supported (add a " +
              "scan case or pre-cast the value column to long/double)")
        }
      } else {
        val wSum = Window.partitionBy(keyCols: _*).orderBy(col("_b"))
          .rowsBetween(Window.unboundedPreceding, -1)
        summaries
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
