package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.window.WindowExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** Throwaway plan probe (not a test): prints every WindowExec's
  * partition spec for the named query, including inside AQE subtrees. */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("cdc1_decode")
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.queries(name)(spark, dir)
    // force execution so AQE finalizes subtrees
    df.write.format("noop").mode("overwrite").save()
    def walk(p: org.apache.spark.sql.execution.SparkPlan): Unit = {
      p.foreach {
        case w: WindowExec =>
          println(s"WIN|parts=[${w.partitionSpec.map(_.sql).mkString(",")}]" +
            s"|order=[${w.orderSpec.map(_.sql).mkString(",")}]")
        case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
        case _ =>
      }
    }
    walk(df.queryExecution.executedPlan)
    println("=== done ===")
    spark.stop()
  }
}
