package graft

import org.apache.spark.sql.SparkSession

/** Shared plumbing for the driver-contract mains (Bench / Verify). */
private[graft] object Harness {

  /** Drop leftover localCheckpoint RDDs between queries — across ~90
    * queries the pinned sf-sized snapshots otherwise crowd executor
    * memory and later queries absorb the GC pressure as phantom
    * regressions. Called BETWEEN queries only: every run still pays its
    * own checkpoint cost inside its own clock. */
  def dropPinnedRdds(spark: SparkSession): Unit =
    spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = false))
}
