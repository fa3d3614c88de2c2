package graft.plans

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The per-key TOP-K whole-operator extension: the declarative
  * `row_number().over(...) <= k` form must plan as TopKPerKeyExec (when
  * the GraftExtensions are installed — the shared test session builds
  * with SparkEntry.requiredConfs, which sets spark.sql.extensions) and
  * produce exactly the rows the window plan produces.
  */
class TopKPerKeySpec extends SparkSpec {
  import spark.implicits._

  private def topkQuery = {
    val o = graft.Tables.load(spark, sfDir, "orders")
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    o.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .select("o_custkey", "rk", "o_orderkey", "o_totalprice")
  }

  test("rewrite fires: plan contains TopKPerKey (partial + final), " +
      "no Window, no invalid-node marker") {
    val plan = topkQuery.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKey"), plan.take(800))
    assert(!plan.contains("Window"), plan.take(800))
    assert(!plan.contains("!TopKPerKey"), plan.take(800))
    // both passes present: map-side partial prunes before the exchange
    val n = "TopKPerKey".r.findAllIn(plan).size
    assert(n >= 2, s"expected partial+final, saw $n:\n${plan.take(800)}")
  }

  test("operator output == window-plan output (total order, exact rows)") {
    val got = topkQuery
      .as[(Long, Int, Long, Double)].collect().toSet
    // reference: same query with the rewrite disabled via excludedRules
    val conf = "spark.sql.optimizer.excludedRules"
    val prev = spark.conf.getOption(conf)
    spark.conf.set(conf, TopKRewrite.ruleName)
    try {
      val refPlan = topkQuery.queryExecution.executedPlan.toString
      assert(refPlan.contains("Window"), refPlan.take(500))
      val ref = topkQuery
        .as[(Long, Int, Long, Double)].collect().toSet
      assert(got == ref)
      assert(got.nonEmpty)
    } finally {
      prev.fold(spark.conf.unset(conf))(spark.conf.set(conf, _))
    }
  }

  test("k larger than group size keeps whole groups ranked") {
    val df = Seq((1L, 10.0), (1L, 20.0), (2L, 5.0))
      .toDF("k", "v")
    val w = Window.partitionBy("k").orderBy(col("v").desc)
    val out = df.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 5)
      .as[(Long, Double, Int)].collect().toSet
    assert(out == Set((1L, 20.0, 1), (1L, 10.0, 2), (2L, 5.0, 1)))
  }

  test("strict < and extra conjuncts still rewrite, residual preserved") {
    val df = Seq((1L, 10.0), (1L, 20.0), (1L, 30.0), (2L, 5.0))
      .toDF("k", "v")
    val w = Window.partitionBy("k").orderBy(col("v").desc)
    val q = df.withColumn("rk", row_number().over(w))
      .filter(col("rk") < 3 && col("v") > 9.0)
    assert(q.queryExecution.executedPlan.toString.contains("TopKPerKey"))
    val out = q.as[(Long, Double, Int)].collect().toSet
    assert(out == Set((1L, 30.0, 1), (1L, 20.0, 2)))
  }

  test("degenerate k <= 0 does NOT rewrite and returns zero rows") {
    val df = Seq((1L, 10.0), (2L, 5.0)).toDF("k", "v")
    val w = Window.partitionBy("k").orderBy(col("v"))
    // rank < 1 → k = 0: the exec would keep one row per key, so the
    // rewrite must leave the window plan, which returns nothing
    val q0 = df.withColumn("rk", row_number().over(w)).filter(col("rk") < 1)
    assert(!q0.queryExecution.executedPlan.toString.contains("TopKPerKey"))
    assert(q0.count() == 0)
    val qneg = df.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= -2)
    assert(!qneg.queryExecution.executedPlan.toString.contains("TopKPerKey"))
    assert(qneg.count() == 0)
  }

  test("near-unique keys under a tiny partial budget stay correct") {
    // 1000 distinct keys, budget 8: the map-side partial exhausts its
    // budget almost immediately and must pass rows through unpruned;
    // the final pass still produces exact per-key top-k.
    val conf = TopKStrategy.partialBudgetKey
    spark.conf.set(conf, "8")
    try {
      val df = (0 until 2000).map(i => (i % 1000, i / 1000 + i % 7))
        .toDF("k", "v")
      val w = Window.partitionBy("k")
        .orderBy(col("v").desc, col("k"))
      val q = df.withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 1).select("k", "v", "rk")
      assert(q.queryExecution.executedPlan.toString.contains("TopKPerKey"))
      val got = q.as[(Int, Int, Int)].collect().toSet
      val expect = (0 until 2000).map(i => (i % 1000, i / 1000 + i % 7))
        .groupBy(_._1).map { case (k, vs) =>
          (k, vs.map(_._2).max, 1) }.toSet
      assert(got == expect)
    } finally spark.conf.unset(conf)
  }

  test("rank/dense_rank and empty partitioning do NOT rewrite") {
    val df = Seq((1L, 10.0)).toDF("k", "v")
    val w = Window.partitionBy("k").orderBy(col("v"))
    val r = df.withColumn("rk", rank().over(w)).filter(col("rk") <= 2)
    assert(!r.queryExecution.executedPlan.toString
      .contains("TopKPerKey"))
    val g = df.withColumn("rk",
        row_number().over(Window.orderBy(col("v"))))
      .filter(col("rk") <= 2)
    assert(!g.queryExecution.executedPlan.toString
      .contains("TopKPerKey"))
  }

  test("rank < Int.MinValue returns zero rows (no overflow past the k guard)") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val df = Seq((1L, 10.0), (1L, 20.0), (2L, 30.0)).toDF("k", "v")
    val w = Window.partitionBy("k").orderBy(col("v").desc)
    val q = df.withColumn("rk", row_number().over(w))
      .filter(col("rk") < Int.MinValue)
    assert(q.count() == 0,
      "v - 1 overflow must not turn an empty result into everything")
  }
}
