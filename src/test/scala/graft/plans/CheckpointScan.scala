package graft.plans

/** CALIBRATION SCRATCH (not a spec): sweep every query's checkpointed
  * (LogicalRDD) inputs on the sf0.001 fixture and print width x rows,
  * to choose the wide-checkpoint thresholds and allowlist empirically.
  * Run: sbt "Test/runMain graft.plans.CheckpointScan" */
object CheckpointScan {
  def main(args: Array[String]): Unit = {
    val spark = graft.TestSession.spark
    val sfDir = graft.TestSession.sfDir
    val memo = scala.collection.mutable.Map.empty[Int, Long]
    val rows = graft.SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val pins =
          try PlanAudit.checkpointProfiles(fn(spark, sfDir), memo)
          catch { case e: Throwable =>
            System.err.println(s"[scan] $name ERROR ${e.getMessage.take(80)}")
            Nil }
        pins.map(c => (name, c))
    }
    println(s"== ${rows.size} checkpoint pins across the surface ==")
    rows.sortBy { case (_, c) => -(c.rows * c.cols.size) }
      .foreach { case (name, c) =>
        println(f"${c.cols.size}%3d cols x ${c.rows}%8d rows  $name%-28s " +
          c.cols.mkString(",").take(90))
      }
    spark.stop()
  }
}
