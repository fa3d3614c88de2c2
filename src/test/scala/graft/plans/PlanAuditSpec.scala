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
}
