package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.sinks.Bucketing

/** Q45 — physical-layout operators made driver-visible: the recurring
  * join that pays its shuffle ONCE at write time.
  *
  * A fact⋈dim join on a non-broadcastable dim shuffles both sides
  * every run; bucketing both tables on the join key at the same count
  * moves that cost into one write (`graft.sinks.Bucketing`), after
  * which every join AND aggregation on the bucket key plans with zero
  * exchanges — the recurring-workload layout decision at 100 TB (ETL
  * writes bucketed once, every downstream consumer joins for free).
  * BucketingSpec pins the zero-exchange/zero-sort plan; this entry
  * puts the RESULT on the correctness scoreboard (oracle = the plain
  * join, which the bucketed layout must reproduce exactly).
  */
object LayoutOps {

  /** Bucketed tables are written once per (JVM, dir) — the layout's
    * whole premise; subsequent calls (bench steady-state) measure the
    * exchange-free read path. Stale warehouse dirs from previous JVMs
    * (in-memory catalog, surviving files) are cleaned before the first
    * write. Local-mode harness construct, like CdcOps.replayFixture:
    * a cluster writes bucketed tables to its real catalog once. */
  private val writtenLock = new Object
  private var written = Set.empty[(String, String)]
  private def ensureBucketed(s: SparkSession, dir: String,
      table: String, src: => DataFrame, key: String): String = {
    val name = table + "_" + dir.replaceAll("[^a-zA-Z0-9]", "_")
    writtenLock.synchronized {
      if (!written((name, dir))) {
        s.sql(s"DROP TABLE IF EXISTS $name")
        val loc = new java.io.File(
          s.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"), name)
        if (loc.exists())
          scala.reflect.io.Directory(loc).deleteRecursively()
        Bucketing.writeBucketed(src, name, key, 8)
        written += ((name, dir))
      }
    }
    name
  }

  def q45_bucketed_join(s: SparkSession, dir: String): DataFrame = {
    val to = ensureBucketed(s, dir, "gb_orders",
      Tables.load(s, dir, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice"),
      "o_custkey")
    val tc = ensureBucketed(s, dir, "gb_customer",
      Tables.load(s, dir, "customer").select("c_custkey", "c_name"),
      "c_custkey")
    Bucketing.readBucketed(s, to)
      .hint("merge") // pin SMJ: bucketed sides zip per-bucket, no sort
      .join(Bucketing.readBucketed(s, tc),
        col("o_custkey") === col("c_custkey"))
      .groupBy("c_custkey") // bucket key again: still no exchange
      .agg(count(lit(1)).as("n_orders"),
        sum(expr("CAST(FLOOR(o_totalprice * 100) AS BIGINT)"))
          .as("cents"))
      .orderBy("c_custkey")
  }

  /** Oracle: the plain join + aggregate the layout must reproduce. */
  val q45Sql: String =
    """SELECT c_custkey, COUNT(*) AS n_orders,
      |  CAST(SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT)) AS BIGINT)
      |    AS cents
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |GROUP BY c_custkey ORDER BY c_custkey""".stripMargin

  // ----------------------------------------------------------------
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q45_bucketed_join" -> (q45_bucketed_join _))

  def oracles: Map[String, String] = Map(
    "q45_bucketed_join" -> q45Sql)
}
