package org.apache.spark

/** Bridge into the spark package for the scaling-exponent audit's
  * WORK metric: total task `executorRunTime` while a body runs. Wall
  * time is the wrong signal for growth fitting on a parallel engine —
  * added work hides behind added parallelism exactly when the data
  * grows (understating the exponent a safety audit exists to catch),
  * and at tiny scale factors the data term drowns under fixed
  * session/scheduling overhead and host noise. Total task time is
  * parallelism-independent and decade-over-decade comparable; its
  * fixed term (per-task dispatch over a constant 32-partition layout)
  * cancels in the same first differences the fit already takes.
  *
  * Lives here because `SparkContext.listenerBus` is `private[spark]`
  * and the listener events are ASYNC — reading the accumulated total
  * without `waitUntilEmpty()` undercounts the final stages. */
object GraftMetricsBridge {

  /** Work (task milliseconds) and row volume (input records read +
    * shuffle records written) accumulated over every task that
    * completed while a body ran.
    *
    * The ROW metric is the audit's algorithmic-growth axis, and it is
    * listener-side ON PURPOSE: reading `numOutputRows` off the final
    * plan's SQL metrics has two systematic blind spots the round-9
    * regime pass hit in production — eagerly-checkpointed loop queries
    * (CC, LPA, k-core) whose loop-stage rows never appear in the last
    * DataFrame's plan (q41c read 1458 → 242 → 22: component counts,
    * not work), and AQE's EmptyRelation collapse zeroing every metric
    * of an empty-output query even though its upstream stages ran
    * (q42b at the top rung: 270 s of work, "0 rows"). Task-level
    * input/shuffle records see every job the query triggered,
    * whatever the final plan looks like. */
  case class TaskTotals(timeMs: Long, rows: Long)

  /** Run `body`, returning the accumulated [[TaskTotals]]. */
  def taskTotals(sc: SparkContext)(body: => Unit): TaskTotals = {
    val time = new java.util.concurrent.atomic.AtomicLong(0L)
    val rows = new java.util.concurrent.atomic.AtomicLong(0L)
    val listener = new scheduler.SparkListener {
      override def onTaskEnd(e: scheduler.SparkListenerTaskEnd): Unit = {
        val m = e.taskMetrics
        if (m != null) {
          time.addAndGet(m.executorRunTime)
          rows.addAndGet(m.inputMetrics.recordsRead +
            m.shuffleWriteMetrics.recordsWritten)
        }
      }
    }
    sc.addSparkListener(listener)
    try {
      body
      sc.listenerBus.waitUntilEmpty()
    } finally sc.removeSparkListener(listener)
    TaskTotals(time.get, rows.get)
  }

  /** Run `body`, returning the sum of executorRunTime (milliseconds)
    * over every task that completed during it. */
  def taskTimeMs(sc: SparkContext)(body: => Unit): Long =
    taskTotals(sc)(body).timeMs
}
