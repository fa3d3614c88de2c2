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

  /** Run `body`, returning the sum of executorRunTime (milliseconds)
    * over every task that completed during it. */
  def taskTimeMs(sc: SparkContext)(body: => Unit): Long = {
    val total = new java.util.concurrent.atomic.AtomicLong(0L)
    val listener = new scheduler.SparkListener {
      override def onTaskEnd(e: scheduler.SparkListenerTaskEnd): Unit = {
        val m = e.taskMetrics
        if (m != null) total.addAndGet(m.executorRunTime)
      }
    }
    sc.addSparkListener(listener)
    try {
      body
      sc.listenerBus.waitUntilEmpty()
    } finally sc.removeSparkListener(listener)
    total.get
  }
}
