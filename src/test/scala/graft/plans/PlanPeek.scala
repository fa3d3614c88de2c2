package graft.plans

import org.apache.spark.sql.SparkSession

/** Throwaway plan inspector: prints executedPlan for named queries so
  * pin assertions are written against the REAL shapes. Not a test. */
object PlanPeek {
  def main(args: Array[String]): Unit = {
    val builder = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
    graft.SparkEntry.requiredConfs.foreach { case (k, v) =>
      builder.config(k, v) }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.001"
    for (name <- args) {
      val df = graft.SparkEntry.queries(name)(spark, dir)
      println(s"========== $name ==========")
      println(df.queryExecution.executedPlan.toString.take(4000))
    }
    spark.stop()
  }
}
