package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Q28 — skew-resilient equi-join by key salting.
  *
  * A shuffle join partitions both sides by hash(key); a key that
  * dominates the fact side (at 100 TB: one hot customer, one default
  * enum value) lands in ONE reducer and the stage runs at the speed of
  * that task. AQE's skew-join split handles the SORT-MERGE case after
  * the fact; salting fixes the layout by construction and also covers
  * the shuffle-hash path and any engine without AQE: the fact side
  * spreads each key over `salt` sub-keys with a deterministic per-row
  * hash, the dim side replicates each row `salt` times (dim × salt
  * rows — the method's cost, so it fits dims far too big to broadcast
  * but far smaller than the fact), and the join runs on (key, salt) —
  * hot keys now occupy `salt` reducers instead of one.
  *
  * The salt column is internal plumbing: results are EXACTLY the plain
  * join's (the oracle is the plain SQL join), which is the whole point —
  * a layout fix, not a semantics change.
  */
object SkewOps {

  /** Equi-join `fact ⋈ dim` on `key`, spreading each fact key over
    * `salt` sub-keys. `saltOn` must be deterministic per fact row (any
    * unique-ish column; correctness holds for ANY assignment, spread
    * quality needs variety). The dim side must be unique per key (a
    * dimension), or the replicate-and-join would duplicate matches. */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String, salt: Int,
      saltOn: Column): DataFrame = {
    val dimS = dim
      .withColumn("_salt", explode(array((0 until salt).map(lit): _*)))
      // the dim side is "too big to broadcast" by assumption — pin the
      // shuffle-hash path so the salted layout is what actually runs
      // (a broadcast would make salting a no-op and hide the demo)
      .hint("shuffle_hash")
    fact
      .withColumn("_salt", pmod(xxhash64(saltOn), lit(salt)).cast("int"))
      .join(dimS, Seq(key, "_salt"))
      .drop("_salt")
  }

  /** The canonical skew shape on the test data: lineitem's
    * `l_returnflag` has THREE distinct values, so a plain shuffle join
    * against a per-flag dimension uses three reducers no matter how many
    * executors exist. Salted 16 ways it uses 48. Output = each line's
    * deviation from its flag's average quantity (micro-unit integers so
    * the oracle hash-matches). */
  def q28_skew_join(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.load(s, dir, "lineitem")
    // per-row micro-unit quantization BEFORE the sum: a raw double sum
    // is partition-order-dependent; the integer sum is exact and
    // engine-portable (same convention as q23_centroid)
    val dim = li.groupBy("l_returnflag")
      .agg(expr("sum(cast(floor(cast(l_quantity as double) * 1000000) " +
        "as bigint)) div count(*)").as("flag_avg_micro"))
    saltedJoin(li, dim, "l_returnflag", 16,
        concat_ws("/", col("l_orderkey"), col("l_linenumber")))
      .select(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"),
        (floor(col("l_quantity").cast("double") * 1000000d).cast("long")
          - col("flag_avg_micro")).as("qty_dev_micro"))
      // lineitem has no unique key in the test data: total-order by ALL
      // output columns so the oracle hash compare is deterministic
      .orderBy("l_orderkey", "l_linenumber", "l_returnflag",
        "qty_dev_micro")
  }

  val q28SkewJoinSql: String =
    """WITH dim AS (SELECT l_returnflag,
      |    CAST(SUM(CAST(FLOOR(CAST(l_quantity AS DOUBLE) * 1000000)
      |      AS BIGINT)) AS BIGINT) // COUNT(*) AS flag_avg_micro
      |  FROM lineitem GROUP BY 1)
      |SELECT l_orderkey, l_linenumber, l_returnflag,
      |  CAST(FLOOR(CAST(l_quantity AS DOUBLE) * 1000000) AS BIGINT)
      |    - flag_avg_micro AS qty_dev_micro
      |FROM lineitem JOIN dim USING (l_returnflag)
      |ORDER BY l_orderkey, l_linenumber, l_returnflag, qty_dev_micro"""
      .stripMargin

  // --------------------------------------------------------------- Q28b
  /** HOT-KEY DETECTION — the step BEFORE salting: which keys are worth
    * spreading? The full `groupBy(key).count` answer is itself the skew
    * victim at 100 TB (the hot key's partial counts still converge on
    * one reducer, and a billion-key cardinality makes the aggregate
    * huge). The Misra-Gries sketch (graft.functions.native.heavyHitters,
    * k counters per partition buffer, mergeable with summed error) finds
    * every key above the n/(k+1) frequency floor in ONE pass with a
    * CONSTANT-size buffer crossing the exchange — the partial-aggregate
    * shape where the exchange carries k counters per partition
    * regardless of corpus size.
    *
    * Demo on events.event_type (5 distinct values ≤ k=64, so no
    * decrement ever fires and the sketch counts are EXACT — the oracle
    * is the plain groupBy; MisraGriesSpec pins the saturated-sketch
    * bounds the fixture can't reach). */
  def q28b_hot_keys(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "events")
      .agg(graft.functions.native.heavyHitters(col("event_type"), 64)
        .as("hh"))
      .select(explode(col("hh")).as("e"))
      .select(col("e.item").as("item"), col("e.n").as("n"))

  val q28bSql: String =
    """SELECT event_type AS item, count(*) AS n
      |FROM events GROUP BY 1
      |ORDER BY n DESC, item""".stripMargin

  // --------------------------------------------------------------- Q28c
  /** COUNT-MIN SKETCH point-frequency estimates — the complement of
    * q28b: Misra-Gries tells you WHICH keys are heavy, the CMS answers
    * "how often did key k occur" for ANY key after one pass, in
    * depth×width longs no matter the key cardinality (a billion-key
    * groupBy materializes a billion-row aggregate; the sketch crosses
    * the exchange as 4×1024 counters per partition, elementwise-summed).
    *
    * The estimate — min over 4 hash rows of the bucket counter — is
    * row-local arithmetic over the one broadcast sketch row: probes
    * never shuffle. Counters merge by exact addition, so the sketch is
    * deterministic under any partitioning and the DuckDB oracle can
    * recompute the identical buckets with a plain GROUP BY over the
    * same Knuth hash ([[graft.functions.CmsAggregate.bucket]]).
    * Estimates overshoot truth by at most n·e/width with prob
    * 1−e^−depth (CmsSpec pins both the overestimate direction and
    * exactness on planted collision-free keys). */
  def q28c_cms_freq(s: SparkSession, dir: String): DataFrame = {
    val sketch = Tables.load(s, dir, "lineitem")
      .agg(graft.functions.native.cmsAgg(col("l_partkey"), 4, 1024)
        .as("cms"))
    def bucketIdx(r: Int): Column =
      (lit(r * 1024) +
        pmod((col("l_partkey") + lit(r * 97L)) * lit(2654435761L),
          lit(4294967296L)) % 1024 + 1).cast("int")
    s.range(1, 51).select(col("id").as("l_partkey"))
      .crossJoin(broadcast(sketch))
      .select(col("l_partkey"),
        least(element_at(col("cms"), bucketIdx(0)),
          element_at(col("cms"), bucketIdx(1)),
          element_at(col("cms"), bucketIdx(2)),
          element_at(col("cms"), bucketIdx(3))).as("n_est"))
      .orderBy("l_partkey")
  }

  /** Oracle: the same 4×1024 bucket counters via GROUP BY, the same
    * min-over-rows probe for keys 1..50. */
  val q28cSql: String =
    """WITH h AS (SELECT t.d,
      |    ((l_partkey + t.d * 97) * 2654435761) % 4294967296 % 1024 AS b
      |  FROM lineitem, range(4) t(d)),
      |bs AS (SELECT d, b, COUNT(*) AS n FROM h GROUP BY d, b),
      |probe AS (SELECT unnest(range(1, 51)) AS k),
      |pe AS (SELECT p.k, t.d,
      |    ((p.k + t.d * 97) * 2654435761) % 4294967296 % 1024 AS b
      |  FROM probe p, range(4) t(d))
      |SELECT pe.k AS l_partkey, CAST(MIN(COALESCE(bs.n, 0)) AS BIGINT)
      |  AS n_est
      |FROM pe LEFT JOIN bs ON bs.d = pe.d AND bs.b = pe.b
      |GROUP BY pe.k ORDER BY pe.k""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q28_skew_join" -> (q28_skew_join _),
    "q28b_hot_keys" -> (q28b_hot_keys _),
    "q28c_cms_freq" -> (q28c_cms_freq _))

  def oracles: Map[String, String] = Map(
    "q28_skew_join" -> q28SkewJoinSql,
    "q28b_hot_keys" -> q28bSql,
    "q28c_cms_freq" -> q28cSql)
}
