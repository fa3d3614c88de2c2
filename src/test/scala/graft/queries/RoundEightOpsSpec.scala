package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ByteType, ShortType, StructField, StructType, LongType}
import org.apache.spark.sql.Row

/** Round-8 hardening: PrefixLead's successor machinery is exact at the
  * signed-domain EXTREMES. The old level-1 frame ordered by `-seq`,
  * and arithmetic negation of Byte/Short/Long.MinValue wraps silently
  * under non-ANSI arithmetic (throws under ANSI) — a seq domain
  * `requireIntegralSeq` explicitly admits — corrupting the ordering
  * and returning wrong successors. The fix orders by ~(seq cast long)
  * for sub-long widths (exact, and the frame-bound arithmetic cannot
  * overflow because the image sits strictly inside the long range)
  * and by -(seq cast Decimal(20,0)) for long seqs (exact over all
  * 2^64 values; the frame bound widens precision instead of
  * overflowing). */
class RoundEightOpsSpec extends SparkSpec {

  private def collectNext(rows: Seq[Row]): Map[Long, Option[Long]] =
    rows.map { r =>
      val seq = r.get(0) match {
        case b: Byte => b.toLong
        case s: Short => s.toLong
        case l: Long => l
        case i: Int => i.toLong
      }
      val nxt = if (r.isNullAt(r.length - 1)) None
        else Some(r.get(r.length - 1) match {
          case b: Byte => b.toLong
          case s: Short => s.toLong
          case l: Long => l
          case i: Int => i.toLong
        })
      seq -> nxt
    }.toMap

  test("PrefixLead.nextSeq is exact on a BYTE seq including " +
      "Byte.MinValue — arithmetic negation would wrap -128 and corrupt " +
      "the level-1 ordering") {
    val schema = StructType(Seq(StructField("seq", ByteType)))
    val data = Seq[Byte](Byte.MinValue, -1, 0, 5, Byte.MaxValue)
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(data.map(b => Row(b)), 2), schema)
    val got = collectNext(
      PrefixLead.nextSeq(df, "nxt", bucketSize = 4).collect().toSeq)
    assert(got == Map(-128L -> Some(-1L), -1L -> Some(0L),
      0L -> Some(5L), 5L -> Some(127L), 127L -> None), got)
  }

  test("PrefixLead.nextSeq is exact on a SHORT seq including " +
      "Short.MinValue, keyed, with duplicates at the minimum") {
    val schema = StructType(Seq(StructField("k", LongType),
      StructField("seq", ShortType)))
    val data = Seq[(Long, Short)](
      (1L, Short.MinValue), (1L, Short.MinValue), (1L, 0), (1L, 100),
      (2L, Short.MinValue), (2L, Short.MaxValue))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(data.map { case (k, s) =>
        Row(k, s) }, 2), schema)
    val out = PrefixLead.nextSeq(df, "nxt", keys = Seq("k"),
      bucketSize = 8).collect().toSeq
    val byKey = out.groupBy(_.getLong(0)).map { case (k, rs) =>
      k -> collectNext(rs.map(r => Row(r.get(1), r.get(2))))
    }
    assert(byKey(1L) == Map(Short.MinValue.toLong -> Some(0L),
      0L -> Some(100L), 100L -> None), byKey(1L))
    assert(byKey(2L) == Map(Short.MinValue.toLong ->
      Some(Short.MaxValue.toLong), Short.MaxValue.toLong -> None),
      byKey(2L))
  }

  test("PrefixLead.nextSeq is exact on a LONG seq spanning " +
      "Long.MinValue and Long.MaxValue with bucketSize=1 — the keyless " +
      "cross-bucket fold's id mapping must not wrap either (bitwise " +
      "NOT, not negation), and the decimal ordering admits both " +
      "extremes") {
    val schema = StructType(Seq(StructField("seq", LongType)))
    val data = Seq(Long.MinValue, Long.MinValue + 1, -7L, 0L, 3L,
      Long.MaxValue)
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(data.map(l => Row(l)), 3), schema)
    val got = collectNext(
      PrefixLead.nextSeq(df, "nxt", bucketSize = 1).collect().toSeq)
    assert(got == Map(
      Long.MinValue -> Some(Long.MinValue + 1),
      (Long.MinValue + 1) -> Some(-7L),
      -7L -> Some(0L), 0L -> Some(3L), 3L -> Some(Long.MaxValue),
      Long.MaxValue -> None), got)
  }

  test("duplicates of Long.MaxValue all get null — no strictly-greater " +
      "successor exists, and the frame bound must neither overflow " +
      "nor invent one") {
    import spark.implicits._
    val df = Seq(Long.MaxValue, Long.MaxValue, 1L).toDF("seq")
    val got = collectNext(
      PrefixLead.nextSeq(df, "nxt", bucketSize = 16).collect().toSeq)
    assert(got == Map(1L -> Some(Long.MaxValue), Long.MaxValue -> None),
      got)
  }
}
