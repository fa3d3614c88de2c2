package graft

import org.apache.spark.sql.SparkSession

/** Scratch profiling entry (test scope only): time one query with or
  * without the planner extensions, print the executed plan head.
  * Usage: Test/runMain graft.Prof <queryName> <sfDir> [noext]
  */
object Prof {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = args(1)
    val noExt = args.contains("noext")
    val builder = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
    SparkEntry.requiredConfs
      .filterNot { case (k, _) => noExt && k == "spark.sql.extensions" }
      .foreach { case (k, v) => builder.config(k, v) }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val si = e.stageInfo
        val ms = si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L)
        if (ms > 500)
          println(s"[prof-stage] id=${si.stageId} tasks=${si.numTasks} " +
            s"wall=${ms}ms name=${si.name.take(90)}")
      }
    })
    val df = SparkEntry.queries(name)(spark, sfDir)
    val t0 = System.nanoTime()
    df.write.format("noop").mode("overwrite").save()
    println(f"[prof] $name noext=$noExt run1: ${(System.nanoTime() - t0) / 1e9}%.1fs")
    val t1 = System.nanoTime()
    df.write.format("noop").mode("overwrite").save()
    println(f"[prof] $name noext=$noExt run2: ${(System.nanoTime() - t1) / 1e9}%.1fs")
    println("[prof] plan contains TopKPerKey: " +
      df.queryExecution.executedPlan.toString.contains("TopKPerKey"))
    if (args.contains("plan")) println(df.queryExecution.executedPlan.toString)
    spark.stop()
  }
}
