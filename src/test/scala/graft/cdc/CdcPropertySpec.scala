package graft.cdc

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Property-style randomized coverage of the decode rules the oracle
  * fixtures exercise only at fixed shapes: pk extraction (insert/update
  * `id`||`ID`, delete first-non-null-of-old-image, postgresql.js:472,
  * 423-425) and the Mongo ns split (first dot only, mongo.js:138-142).
  * 500 seeded random cases run as ONE Spark job and compare against the
  * rules computed independently in Scala. */
class CdcPropertySpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(20260812L)

  // JSON-safe identifier-ish strings (no escaping concerns, mixed case,
  // dots and spaces excluded from KEYS but values may hold spaces)
  private def word(): String = {
    val chars = "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ_0123456789"
    (0 until (1 + rnd.nextInt(8))).map(_ => chars(rnd.nextInt(chars.length))).mkString
  }

  test("PrefixCarry equals the naive carry on random keyed streams " +
      "with nulls, gaps, and tiny buckets") {
    // random sparse seqs (gaps + bucket boundaries), 3 keys, ~60% null
    // values — compare against last(ignoreNulls) over a plain keyed
    // window (the semantics PrefixCarry de-skews)
    val rows = rnd.shuffle((0 until 3000).toList).map { i =>
      (i.toLong * (1 + rnd.nextInt(40)),
        s"k${rnd.nextInt(3)}",
        if (rnd.nextInt(10) < 6) null
        else s"v${rnd.nextInt(100)}")
    }
    val df = rows.toDF("seq", "key", "value")
    val got = PrefixCarry.lastNonNull(df, "value", "carried",
        keys = Seq("key"), bucketSize = 128)
      .select("seq", "key", "carried")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("key").orderBy("seq")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val want = df
      .withColumn("carried", last(col("value"), ignoreNulls = true).over(w))
      .select("seq", "key", "carried")
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
      "two-level bucketed carry must equal the single-window carry")

    // AUTO sizing (bucketSize = 0, the default) must agree too
    val auto = PrefixCarry.lastNonNull(df, "value", "carried",
        keys = Seq("key"))
      .select("seq", "key", "carried")
    assert(auto.exceptAll(want).isEmpty && want.exceptAll(auto).isEmpty,
      "auto-sized carry must equal the single-window carry")
  }

  test("autoBucketSize targets ~64Ki rows per bucket whatever the " +
      "seq range") {
    import spark.implicits._
    // dense: 200k rows over a 200k range -> 3 buckets of ~66.7k
    val dense = spark.range(200000).select(col("id").as("seq"))
    assert(graft.cdc.BucketedScan.autoBucketSize(dense, "seq") == 66667L)
    // short dense replay (the cdc3 shape): well under 64Ki rows ->
    // ONE bucket spanning the whole range, not a range-based splinter
    val short = spark.range(3000).select(col("id").as("seq"))
    assert(graft.cdc.BucketedScan.autoBucketSize(short, "seq") == 3000L)
    // sparse: same 200k rows spread over a 2^40 range -> bucket size
    // grows with the range so the summary stays ~rows/64Ki
    val sparse = spark.range(200000)
      .select((col("id") * (1L << 22)).as("seq"))
    val bs = graft.cdc.BucketedScan.autoBucketSize(sparse, "seq")
    val buckets = ((199999L * (1L << 22)) + 1 + bs - 1) / bs
    assert(buckets >= 2 && buckets <= 4,
      s"sparse range must still resolve to ~rows/64Ki buckets, got $buckets")
    // empty / all-null-seq input falls back to the fixed default
    val empty = Seq.empty[Long].toDF("seq")
    assert(graft.cdc.BucketedScan.autoBucketSize(empty, "seq") == (1L << 16))
  }

  test("pk extraction rules hold on 500 random envelopes") {
    case class Case(seq: Long, line: String, expected: Option[String])
    val cases = (0 until 500).map { i =>
      val kind = rnd.nextInt(3)
      // ordered distinct keys; maybe id / ID at a random position
      val baseKeys = Seq.fill(1 + rnd.nextInt(4))(word()).distinct
        .filterNot(k => k == "id" || k == "ID")
      val withId = rnd.nextInt(4) match {
        case 0 => insertAt(baseKeys, "id")
        case 1 => insertAt(baseKeys, "ID")
        case 2 => insertAt(insertAt(baseKeys, "ID"), "id")
        case _ => baseKeys
      }
      // values: JSON string, int, or null
      val kvs = withId.map { k =>
        val v = rnd.nextInt(3) match {
          case 0 => "\"" + word() + "\""
          case 1 => rnd.nextInt(100000).toString
          case _ => "null"
        }
        k -> v
      }
      def raw(v: String): Option[String] =
        if (v == "null") None
        else Some(if (v.startsWith("\"")) v.substring(1, v.length - 1) else v)
      val obj = kvs.map { case (k, v) => s""""$k": $v""" }.mkString("{", ", ", "}")
      val m = kvs.toMap
      kind match {
        case 0 | 1 =>
          val tag = if (kind == 0) "insert" else "update"
          // id || ID — null-valued id falls through to ID (coalesce is
          // on the parsed VALUE, not key presence)
          val exp = m.get("id").flatMap(raw).orElse(m.get("ID").flatMap(raw))
          Case(i.toLong, s"""{"$tag": $obj, "table": "t"}""", exp)
        case _ =>
          // first key IN ORDER whose value is non-null
          val exp = kvs.collectFirst { case (_, v) if v != "null" => raw(v).get }
          Case(i.toLong, s"""{"delete": true, "@": $obj, "table": "t"}""", exp)
      }
    }
    val decoded = JsonCdc.decode(
        cases.map(c => (c.seq, c.line)).toDF("seq", "line"))
      .select("seq", "pk").as[(Long, String)].collect().toMap
    cases.foreach { c =>
      assert(Option(decoded(c.seq)) == c.expected,
        s"seq=${c.seq} line=${c.line}: got ${Option(decoded(c.seq))}, " +
          s"want ${c.expected}")
    }
  }

  test("oplog ns splits on the FIRST dot only, for any collection name") {
    case class Case(seq: Long, line: String, db: String, coll: String)
    val cases = (0 until 200).map { i =>
      val db = word()
      val coll = (0 until (1 + rnd.nextInt(3))).map(_ => word()).mkString(".")
      Case(i.toLong,
        s"""{"op": "i", "ns": "$db.$coll", "o": {"_id": $i}}""", db, coll)
    }
    val decoded = OplogCdc.decode(
        cases.map(c => (c.seq, c.line)).toDF("seq", "line"))
      .select("seq", "db", "collection").as[(Long, String, String)]
      .collect().map(r => r._1 -> ((r._2, r._3))).toMap
    cases.foreach { c =>
      assert(decoded(c.seq) == ((c.db, c.coll)),
        s"ns=${c.db}.${c.coll}: got ${decoded(c.seq)}")
    }
  }

  private def insertAt(keys: Seq[String], k: String): Seq[String] = {
    val pos = rnd.nextInt(keys.length + 1)
    (keys.take(pos) :+ k) ++ keys.drop(pos)
  }

  test("malformed and unknown lines never crash the decode; they classify " +
      "as unknown and carry no dispatchable payload") {
    // the reference ERRORS on an unknown line shape (postgresql.js:466-469)
    // and would die on broken JSON from the pipe; a distributed replay
    // must instead quarantine — decode classifies them 'unknown', the
    // pipeline dispatches nothing for them (CdcPipeline's catch-all arm)
    val lines = Seq(
      (0L, """{"insert": {"id": 1}, "table": "t"}"""), // control
      (1L, """not json at all"""),
      (2L, """{"truncated": """),
      (3L, """{"someNewKind": {"id": 2}, "table": "t"}"""),
      (4L, """[1, 2, 3]"""),
      (5L, ""),
      (6L, """{"table": "t"}"""))
    val decoded = JsonCdc.decode(lines.toDF("seq", "line"))
      .select("seq", "kind", "pk").as[(Long, String, String)]
      .collect().sortBy(_._1)
    assert(decoded.head == ((0L, "insert", "1")))
    decoded.tail.foreach { case (seq, kind, pk) =>
      assert(kind == "unknown" && pk == null,
        s"line $seq must quarantine as unknown, got kind=$kind pk=$pk")
    }
  }

  test("keylessCarry super-bucket recursion equals the sequential fold " +
      "for both fold kinds, and drops null bucket ids") {
    import spark.implicits._
    val r = new scala.util.Random(4242L)
    // sparse DISTINCT bucket ids; superSize=4 forces ~100 super-buckets,
    // so the totals pass, the across-super fold, and the re-fold all
    // exercise real multi-group boundaries (production superSize = 2^20
    // would degenerate to one super-bucket at any test scale)
    val ids = (0 until 400).scanLeft(0L)((a, _) => a + 1 + r.nextInt(7)).tail
    // ~25% null values, plus one null bucket id that must vanish
    val sumRows = ids.map(b => (Option(b),
      if (r.nextInt(4) == 0) None else Some(r.nextInt(100).toLong))) :+
      ((Option.empty[Long], Some(999L)))
    val sumFold = (acc: Any, v: Any) =>
      if (v == null) acc else acc.asInstanceOf[Long] + v.asInstanceOf[Long]
    val gotSum = BucketedScan.keylessCarry(
        sumRows.toDF("_b", "_bsum"), 0L, superSize = 4)(sumFold)
      .as[(Long, Long)].collect().toMap
    val wantSum = ids.zip(sumRows.collect { case (Some(_), v) => v }
      .scanLeft(0L)((a, v) => a + v.getOrElse(0L))).toMap
    assert(gotSum == wantSum,
      "recursive sum carry must equal the sequential exclusive prefix sum")

    val lastRows = ids.map(b => (Option(b),
      if (r.nextInt(3) == 0) None else Some(s"v${r.nextInt(50)}"))) :+
      ((Option.empty[Long], Some("ghost")))
    val lastFold = (acc: Any, v: Any) => if (v != null) v else acc
    val gotLast = BucketedScan.keylessCarry(
        lastRows.toDF("_b", "_last"), null, superSize = 4)(lastFold)
      .as[(Long, Option[String])].collect().toMap
    val wantLast = ids.zip(lastRows.collect { case (Some(_), v) => v }
      .scanLeft(Option.empty[String])((a, v) => v.orElse(a))).toMap
    assert(gotLast == wantLast,
      "recursive last-non-null carry must equal the sequential fold")
    assert(!gotSum.contains(0L) || ids.contains(0L),
      "a null bucket id must not produce a carry row")
  }
}
