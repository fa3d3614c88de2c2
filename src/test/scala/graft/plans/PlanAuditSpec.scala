package graft.plans

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** PlanAudit — each detector must fire on a deliberately bad plan and
  * stay silent on the equivalent good one, or the repo-wide sweep in
  * PlanShapeSpec guards nothing. */
class PlanAuditSpec extends SparkSpec {
  import spark.implicits._

  private def kinds(df: org.apache.spark.sql.DataFrame): Set[String] =
    PlanAudit.audit(df).map(_.kind).toSet

  test("unpartitioned window fires; partitioned window stays silent") {
    import org.apache.spark.sql.expressions.Window
    val d = (1 to 100).map(i => (i.toLong, i % 5)).toDF("v", "k")
    val global = d.withColumn("r",
      row_number().over(Window.orderBy("v")))
    assert(kinds(global).contains(PlanAudit.UnpartitionedWindow))
    val keyed = d.withColumn("r",
      row_number().over(Window.partitionBy("k").orderBy("v")))
    assert(!kinds(keyed).contains(PlanAudit.UnpartitionedWindow))
  }

  test("cartesian/nested-loop fires on a joinless cross; an equi join " +
      "stays silent") {
    val a = (1 to 10).map(_.toLong).toDF("x")
    val b = (1 to 10).map(_.toLong).toDF("y")
    val cross = kinds(a.crossJoin(b))
    assert(cross.contains(PlanAudit.CartesianJoin) ||
      cross.contains(PlanAudit.NestedLoopJoin))
    assert(kinds(a.join(b, col("x") === col("y"))).isEmpty)
  }

  test("assertClean throws with the finding listed, and the allowlist " +
      "lets an intentional risk through") {
    val a = (1 to 3).map(_.toLong).toDF("x")
    val b = (1 to 3).map(_.toLong).toDF("y")
    val cross = a.crossJoin(b)
    val e = intercept[IllegalArgumentException] {
      PlanAudit.assertClean(cross)
    }
    assert(e.getMessage.contains("join"))
    PlanAudit.assertClean(cross, // deliberate tiny grid — caller policy
      allow = Set(PlanAudit.CartesianJoin, PlanAudit.NestedLoopJoin))
  }

  test("skewed-window fires on a declared-low-card partition over raw " +
      "rows; stays silent when a high-card key joins the spec, when the " +
      "column isn't declared, and on the two-level PrefixSum shape") {
    import org.apache.spark.sql.expressions.Window
    val d = (1 to 500).map(i => (i % 5, i.toLong)).toDF("k", "v")
    def skew(df: org.apache.spark.sql.DataFrame): Set[String] =
      PlanAudit.auditSkewedWindows(df, Set("k")).map(_.detail).toSet
    val bad = d.withColumn("c",
      sum("v").over(Window.partitionBy("k").orderBy("v")))
    assert(skew(bad) == Set("k"))
    // a non-declared column alone → silent (caller owns the annotation)
    assert(PlanAudit.auditSkewedWindows(bad, Set("lang")).isEmpty)
    // a high-cardinality co-key lifts the bound → silent
    val mixed = d.withColumn("c",
      sum("v").over(Window.partitionBy("k", "v").orderBy("v")))
    assert(skew(mixed).isEmpty)
    // the keyed two-level PrefixSum: in-bucket windows carry _b in the
    // partition keys, the carry window runs over _bsum summaries —
    // the lint's own prescribed rewrite must come back clean
    val fixed = graft.queries.PrefixSum.exclusiveRunningSum(
      d, "v", "c", seqCol = "v", keys = Seq("k"), bucketSize = 64)
    assert(skew(fixed).isEmpty, PlanAudit.auditSkewedWindows(
      fixed, Set("k")).toString)
    // the exemption is STRUCTURAL: a user column merely NAMED _b
    // passing through the window input no longer bypasses the lint
    // (the pre-round-7 exemption keyed on `_b` anywhere in the output)
    val sneaky = d.withColumn("_b", col("v") % 3).withColumn("c",
      sum("v").over(Window.partitionBy("k").orderBy("v")))
    assert(skew(sneaky) == Set("k"), "a passthrough _b column exempted")
  }

  test("scala-udf fires on a ScalaUDF in the plan (with its registered " +
      "name) and on a typed Aggregator; native functions stay silent") {
    import org.apache.spark.sql.functions.udf
    // NOT a local relation: ConvertToLocalRelation would evaluate the
    // project (UDF included) at optimization time and leave no plan
    val df = spark.range(10).select(col("id").cast("int").as("x"))
    val plusOne = udf((i: Int) => i + 1).withName("plus_one")
    val udfs = PlanAudit.audit(df.select(plusOne(col("x")).as("y")))
      .filter(_.kind == PlanAudit.ScalaUdf)
    assert(udfs.nonEmpty && udfs.head.detail.contains("plus_one"), udfs)
    // typed Aggregator: same black-box cost, different expression class
    val sumAgg = new org.apache.spark.sql.expressions.Aggregator[
        Int, Int, Int] {
      def zero = 0
      def reduce(b: Int, a: Int) = b + a
      def merge(b1: Int, b2: Int) = b1 + b2
      def finish(r: Int) = r
      def bufferEncoder = implicitly[org.apache.spark.sql.Encoder[Int]]
      def outputEncoder = implicitly[org.apache.spark.sql.Encoder[Int]]
    }
    val aggs = PlanAudit.audit(
        df.agg(org.apache.spark.sql.functions.udaf(sumAgg).apply(col("x"))))
      .filter(_.kind == PlanAudit.ScalaUdf)
    assert(aggs.nonEmpty && aggs.head.detail.contains("Aggregator"), aggs)
    // the native equivalent of both: clean
    assert(PlanAudit.audit(df.select((col("x") + 1).as("y")))
      .filter(_.kind == PlanAudit.ScalaUdf).isEmpty)
  }

  test("join-explosion fires on a measured many-to-many fanout, stays " +
      "silent on a key-unique equi join, and skips semi/anti joins") {
    import spark.implicits._
    // 200 rows x 200 rows all sharing ONE key value -> 40000 out: the
    // accidental-fanout shape (hash-correct at test scale, quadratic
    // at any scale)
    val l = (1 to 200).map(i => (1, i)).toDF("k", "a")
    val r = (1 to 200).map(i => (1, i)).toDF("k", "b")
    val boom = l.join(r, "k")
    val found = PlanAudit.auditJoinExplosion(boom)
    assert(found.nonEmpty && found.head.kind == PlanAudit.JoinExplosion,
      s"fanout join not flagged: $found")
    // measured numbers in the finding
    assert(found.head.detail.contains("out=40000"), found.head.detail)
    // unique-key dimension join: out == left, no finding
    val dim = (1 to 10).map(i => (i, s"d$i")).toDF("k", "d")
    val fact = (1 to 5000).map(i => (i % 10 + 1, i)).toDF("k", "v")
    assert(PlanAudit.auditJoinExplosion(fact.join(dim, "k")).isEmpty)
    // semi joins can't multiply — not even measured
    assert(PlanAudit.joinCardinalities(
      fact.join(dim, Seq("k"), "left_semi")).isEmpty)
  }

  test("wide-checkpoint fires on a wide corpus-scale localCheckpoint " +
      "pin, stays silent on a narrow frontier pin and on a small " +
      "histogram pin") {
    // the q14b failure class: a 6-column corpus-scale projection pinned
    // whole in executor-local storage (the fork it serves is a cheap
    // re-scan)
    val wide = spark.read.parquet(s"$sfDir/orders.parquet")
      .localCheckpoint()
    val found = PlanAudit.auditWideCheckpoints(wide)
    assert(found.nonEmpty &&
      found.head.kind == PlanAudit.WideCheckpoint, found)
    assert(found.head.detail.contains("6 cols"), found.head.detail)
    // a narrow iterative-frontier pin (2 columns, corpus-scale rows):
    // the standard lineage cut, under the width bar
    val frontier = spark.read.parquet(s"$sfDir/orders.parquet")
      .select("o_orderkey", "o_custkey").localCheckpoint()
    assert(PlanAudit.auditWideCheckpoints(frontier).isEmpty)
    // a small aggregate pin (wide but tiny): under the row bar
    val hist = spark.read.parquet(s"$sfDir/orders.parquet")
      .groupBy("o_orderstatus", "o_orderpriority")
      .agg(count(lit(1)).as("c"), sum("o_totalprice").as("s"),
        max("o_orderdate").as("d"))
      .localCheckpoint()
    assert(PlanAudit.auditWideCheckpoints(hist).isEmpty)
    // profiles carry the measured numbers either way
    val prof = PlanAudit.checkpointProfiles(frontier)
    assert(prof.size == 1 && prof.head.cols.size == 2 &&
      prof.head.rows > 1000, prof)
  }

  test("unpruned-scan fires on a full-width read of a wide table, " +
      "stays silent on a pruned projection (and shows the pushdown), " +
      "and exempts narrow dimensions") {
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet") // 11 columns
    val full = PlanAudit.auditUnprunedScans(li)
    assert(full.nonEmpty && full.head.kind == PlanAudit.UnprunedScan, full)
    // a projection + filter: the scan reads 2 columns and the predicate
    // is pushed — clean, and the profile carries both facts
    val pruned = li.select("l_orderkey", "l_quantity")
      .filter(col("l_quantity") > 10)
    assert(PlanAudit.auditUnprunedScans(pruned).isEmpty)
    val prof = PlanAudit.scanProfiles(pruned)
    assert(prof.size == 1 && prof.head.totalCols == 11 &&
      prof.head.readCols.toSet == Set("l_orderkey", "l_quantity"), prof)
    assert(prof.head.pushedFilters.exists(_.contains("l_quantity")), prof)
    // a narrow dimension read whole IS the query, not a pruning failure
    val region = spark.read.parquet(s"$sfDir/region.parquet") // 2 columns
    assert(PlanAudit.auditUnprunedScans(region).isEmpty)
  }

  test("scanProfiles yields ONE element per pushed filter — a " +
      "multi-predicate scan must not arrive as a comma-joined blob, " +
      "and nested commas (In/Or lists) stay inside their filter") {
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val two = li.select("l_orderkey", "l_quantity", "l_returnflag")
      .filter(col("l_quantity") > 10 && col("l_returnflag").isin("A", "R"))
    val prof = PlanAudit.scanProfiles(two)
    assert(prof.size == 1, prof)
    val pushed = prof.head.pushedFilters
    // at minimum: IsNotNull x2, GreaterThan, In — each its OWN element
    assert(pushed.size >= 3, pushed)
    assert(pushed.forall(f => !f.contains("), ")), // no glued pairs
      pushed)
    assert(pushed.exists(_.startsWith("In(")) ||
      pushed.exists(_.contains("l_returnflag")), pushed)
    // the splitter itself, on the documented nasty shapes
    assert(PlanAudit.splitTopLevel(
      "IsNotNull(x), GreaterThan(y,3), Or(EqualTo(a,b), In(c, [1,2]))") ==
      Seq("IsNotNull(x)", "GreaterThan(y,3)",
        "Or(EqualTo(a,b), In(c, [1,2]))"))
    assert(PlanAudit.splitTopLevel("") == Nil)
    assert(PlanAudit.splitTopLevel("IsNotNull(x)") == Seq("IsNotNull(x)"))
    // raw unquoted literal values can unbalance the brackets
    // (StringStartsWith(name,ab(c) renders with 2 opens / 1 close):
    // an unbalanced input comes back as ONE element, never a glued
    // or mis-split tail
    assert(PlanAudit.splitTopLevel(
      "StringStartsWith(name,ab(c), IsNotNull(y)") ==
      Seq("StringStartsWith(name,ab(c), IsNotNull(y)"))
    assert(PlanAudit.splitTopLevel("A(x)), B(y)") == Seq("A(x)), B(y)"))
  }

  test("PlanSignature counts the shape (exchange/agg/window), renders " +
      "canonically, and diff names exactly what moved") {
    import org.apache.spark.sql.expressions.Window
    val d = (1 to 100).map(i => (i % 5, i.toLong)).toDF("k", "v")
    val agg = d.groupBy("k").count()
    val sig = PlanSignature.of(agg)
    assert(sig.getOrElse("exchange_hash", 0) == 1 &&
      sig.getOrElse("hash_agg", 0) == 2, // partial + final
      s"unexpected aggregate signature: $sig")
    val win = d.withColumn("r",
      row_number().over(Window.partitionBy("k").orderBy("v")))
    assert(PlanSignature.of(win).getOrElse("window", 0) == 1)
    assert(PlanSignature.render(Map("b" -> 2, "a" -> 1)) == "a=1 b=2")
    assert(PlanSignature.diff(Map("window" -> 1), Map("window" -> 2,
      "exchange_hash" -> 1)) ==
      Seq("exchange_hash: recorded 0, now 1", "window: recorded 1, now 2"))
    assert(PlanSignature.diff(sig, sig).isEmpty)
  }
}
