package graft.plans

/** CALIBRATION SCRATCH (not a spec): sweep every query's measured
  * join cardinalities on the sf0.001 fixture and print the blowups,
  * to choose the join-explosion thresholds and allowlist empirically.
  * Run: sbt "Test/runMain graft.plans.JoinCardScan" */
object JoinCardScan {
  def main(args: Array[String]): Unit = {
    val spark = graft.TestSession.spark
    val sfDir = graft.TestSession.sfDir
    val memo = scala.collection.mutable
      .Map.empty[org.apache.spark.sql.catalyst.plans.logical.LogicalPlan, Long]
    val rows = graft.SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val cards =
          try PlanAudit.joinCardinalities(fn(spark, sfDir), memo)
          catch { case e: Throwable =>
            System.err.println(s"[scan] $name ERROR ${e.getMessage.take(80)}")
            Nil }
        cards.map(c => (name, c))
    }
    println(s"== ${rows.size} join nodes across the surface ==")
    rows.sortBy(-_._2.blowup).take(60).foreach { case (name, c) =>
      println(f"${c.blowup}%8.2fx out=${c.outRows}%9d L=${c.leftRows}%9d " +
        f"R=${c.rightRows}%9d $name%-28s ${c.condition.take(70)}")
    }
    spark.stop()
  }
}
