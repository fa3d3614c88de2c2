package graft.plans

import java.nio.file.{Files, Paths}

import graft.{SparkEntry, TestSession}

/** Regenerates the plan-signature baseline consumed by
  * PlanAuditSweepSpec:
  *
  *   sbt "Test/runMain graft.plans.PlanSnapshotGen"
  *
  * Writes src/test/resources/plan_signatures.tsv (name TAB signature),
  * one line per SparkEntry query, using the SAME session config and
  * fixture the suites use so recorded and checked plans are identical.
  * Review the git diff of the file — every changed line is a plan
  * shape change you are signing off on. */
object PlanSnapshotGen {
  def main(args: Array[String]): Unit = {
    val spark = TestSession.spark
    val lines = SparkEntry.queries.toSeq.sortBy(_._1).map {
      case (name, fn) =>
        val sig =
          try PlanSignature.render(PlanSignature.of(
            fn(spark, TestSession.sfDir)))
          catch { case e: Throwable => s"ERROR ${e.getMessage.take(60)}" }
        s"$name\t$sig"
    }
    val out = Paths.get("src/test/resources/plan_signatures.tsv")
    Files.createDirectories(out.getParent)
    Files.writeString(out, lines.mkString("", "\n", "\n"))
    println(s"wrote ${lines.size} signatures to $out")
    spark.stop()
  }
}
