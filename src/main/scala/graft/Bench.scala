package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
    SparkEntry.requiredConfs.foreach { case (k, v) => builder.config(k, v) }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // noop sink forces full materialization of every operator (count()
    // would let Catalyst prune the work being measured).
    // SPARK_GRAFT_ONLY=q1,q2 restricts the run for local iteration.
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    val selected = only.fold(SparkEntry.queries)(
      names => SparkEntry.queries.filter(kv => names(kv._1)))
    // Untimed steady-state warm-up: run the surface once at the smallest
    // SF so JVM/codegen/shuffle-service startup isn't billed to whichever
    // query happens to run first (codegen caches by generated source, so
    // the sf0.001 pass pre-compiles the same plans the timed pass runs).
    // Disable with SPARK_GRAFT_WARMUP=0.
    val warmDir = {
      val parent = java.nio.file.Paths.get(sfDir).toAbsolutePath.getParent
      Option(parent).map(_.resolve("sf0.001"))
        .filter(java.nio.file.Files.isDirectory(_))
        .map(_.toString).getOrElse(sfDir)
    }
    def dropPinnedRdds(): Unit = Harness.dropPinnedRdds(spark)
    if (sys.env.get("SPARK_GRAFT_WARMUP").forall(_ != "0"))
      selected.foreach { case (_, fn) =>
        try fn(spark, warmDir).write.format("noop").mode("overwrite").save()
        catch { case _: Throwable => () }
        finally dropPinnedRdds()
      }
    // min of 2 timed runs per query: single samples on a shared box
    // vary up to 2.5x with CPU contention; the minimum is the standard
    // steady-state estimator (SPARK_GRAFT_RUNS overrides).
    val runs = math.max(1, sys.env.getOrElse("SPARK_GRAFT_RUNS", "2").toInt)
    // /proc/loadavg before/after makes machine contention self-evident in
    // the official record: the r03 bench reported 68x "regressions" that
    // were concurrent CPU load, invisible in the artifact itself.
    def loadavg(): Double =
      try scala.io.Source.fromFile("/proc/loadavg").mkString
        .split("\\s+")(0).toDouble
      catch { case _: Throwable => -1.0 }
    val loadBefore = loadavg()
    val raw = selected.toSeq.sortBy(_._1).map { case (name, fn) =>
      // a failed run must not contribute its (fast) elapsed time — only
      // successful runs compete for the min; all-failed → sentinel -1
      val times = (0 until runs).flatMap { _ =>
        val t0 = System.nanoTime()
        try {
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          Some((System.nanoTime() - t0) / 1e9)
        } catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          None
        } finally dropPinnedRdds()
      }
      (name, times)
    }
    val loadAfter = loadavg()
    // contention tripwire: a >10x min/max spread on a non-trivial query
    // means some runs were starved — the min is still reported, but the
    // run is flagged so a contaminated bench can't read as a regression.
    val suspect = raw.collect {
      case (name, ts) if ts.nonEmpty && ts.max > 1.0 &&
          ts.max / ts.min > 10.0 =>
        System.err.println(f"[bench] WARN $name spread ${ts.max / ts.min}%.1fx " +
          f"(min ${ts.min}%.2fs max ${ts.max}%.2fs) — CPU contention?")
        name
    }
    def f3(v: Double): String = f"$v%.3f"
    val results = raw.map { case (name, ts) =>
      name -> (if (ts.isEmpty) -1.0 else ts.min)
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + f3(v) }
      .mkString("{", ",", "}")
    val total = results.filter(_._2 >= 0).map(_._2).sum
    // total FIRST + 3-decimal seconds: the r01-r03 lines were long enough
    // that the driver's captured tail truncated mid-object and the total
    // never officially registered ("parsed": null three rounds running).
    val warnJson = suspect.map("\"" + _ + "\"").mkString("[", ",", "]")
    println(s"""{"metric":"total","value":${f3(total)},"unit":"sec","sf":"$sfDir","load_before":$loadBefore,"load_after":$loadAfter,"contention_warnings":$warnJson,"queries":$qs}""")
    spark.stop()
  }
}
