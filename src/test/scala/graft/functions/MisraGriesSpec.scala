package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** MisraGriesAggregate — the saturated-sketch guarantees the q28b
  * fixture case (≤ k distinct → exact) can't reach: lower-bound
  * counters, the n/(k+1) error cap, survival of every key above the
  * frequency floor, and partition-layout independence of all three. */
class MisraGriesSpec extends SparkSpec {
  import spark.implicits._

  private def sketch(xs: Seq[String], k: Int, parts: Int) =
    xs.toDF("x").repartition(parts)
      .agg(native.heavyHitters(col("x"), k).as("hh"))
      .select(explode(col("hh")).as("e"))
      .select("e.item", "e.n").collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap

  test("≤ k distinct values: counts are exact under any partitioning " +
      "(the q28b oracle case)") {
    val xs = Seq.fill(100)("a") ++ Seq.fill(37)("b") ++ Seq.fill(3)("c")
    val want = Map("a" -> 100L, "b" -> 37L, "c" -> 3L)
    for (parts <- Seq(1, 7, 32))
      assert(sketch(scala.util.Random.shuffle(xs), 8, parts) == want)
  }

  test("saturated sketch: every counter is a lower bound short by at " +
      "most n/(k+1), and every key above the floor survives — for " +
      "random streams and any partition count") {
    val rnd = new scala.util.Random(11)
    for (trial <- 1 to 3; parts <- Seq(1, 8)) {
      // zipf-ish: a few heavy keys over a long tail, 60 distinct > k=8
      val xs = (1 to 2000).map { _ =>
        val r = rnd.nextInt(100)
        if (r < 30) "hot1" else if (r < 50) "hot2"
        else s"tail${rnd.nextInt(58)}"
      }
      val k = 8
      val truth = xs.groupBy(identity).map { case (a, b) =>
        (a, b.size.toLong) }
      val err = xs.size.toLong / (k + 1)
      val got = sketch(xs, k, parts)
      assert(got.size <= k)
      got.foreach { case (item, est) =>
        val t = truth(item)
        assert(est <= t, s"counter must lower-bound truth ($item)")
        assert(t - est <= err, s"error above n/(k+1) for $item")
      }
      truth.filter(_._2 > err).keys.foreach(hot =>
        assert(got.contains(hot), s"key above the floor lost: $hot"))
    }
  }

  test("q28b on the fixture equals the exact per-type counts") {
    val got = SkewQueries.hotKeys(spark, sfDir)
    val want = graft.Tables.load(spark, sfDir, "events")
      .groupBy(col("event_type")).count().collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(got == want)
  }
}

/** Test-only indirection so the spec reads naturally. */
private object SkewQueries {
  def hotKeys(s: org.apache.spark.sql.SparkSession,
      dir: String): Map[String, Long] =
    graft.queries.SkewOps.q28b_hot_keys(s, dir).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
}
