package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Exhaustive correctness of the Hilbert layout kernel — the properties
  * that make it a LAYOUT key (and better than Morton), not just a hash:
  * bijectivity (every cell gets exactly one index) and unit-step
  * locality (consecutive indexes are always grid-neighbors — the
  * property whose absence gives Z-order its quadrant jumps). */
class LayoutKeysSpec extends SparkSpec {
  import spark.implicits._

  private def curve(bits: Int): Map[Long, (Long, Long)] = {
    val n = 1L << bits
    val grid = for (x <- 0L until n; y <- 0L until n) yield (x, y)
    grid.toDF("x", "y")
      .withColumn("d", graft.functions.native.hilbert(col("x"), col("y"),
        bits))
      .collect()
      .map(r => r.getLong(2) -> (r.getLong(0), r.getLong(1))).toMap
  }

  test("hilbert(bits=4) is a bijection onto [0, 256) and every " +
      "consecutive pair of indexes is Manhattan-distance 1 — the " +
      "no-quadrant-jump property Z-order lacks") {
    val m = curve(4)
    assert(m.size == 256 && m.keySet == (0L until 256L).toSet)
    (0L until 255L).foreach { d =>
      val (ax, ay) = m(d); val (bx, by) = m(d + 1)
      assert(math.abs(ax - bx) + math.abs(ay - by) == 1,
        s"jump at d=$d: ($ax,$ay) -> ($bx,$by)")
    }
  }

  test("morton (q39's z key) DOES jump between quadrants — the contrast " +
      "that motivates q39b") {
    // z-order over the same 16x16 grid: positions of z and z+1 are NOT
    // always adjacent (e.g. z=3 (1,1) -> z=4 (2,0) is distance 2)
    def z(x: Long, y: Long): Long =
      (0 until 4).map(i => (((x >> i) & 1L) << (2 * i + 1)) |
        (((y >> i) & 1L) << (2 * i))).sum
    val pos = (for (x <- 0L until 16L; y <- 0L until 16L)
      yield z(x, y) -> (x, y)).toMap
    val jumps = (0L until 255L).count { d =>
      val (ax, ay) = pos(d); val (bx, by) = pos(d + 1)
      math.abs(ax - bx) + math.abs(ay - by) > 1
    }
    assert(jumps > 0, "z-order unexpectedly jump-free at 16x16")
  }

  test("hilbert interpreted eval == codegen path (the NativeKernelsSpec " +
      "contract) on a deterministic point set") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    val pts = (0 until 200).map { i =>
      val h = java.lang.Math.floorMod(i * 2654435761L, 4294967296L)
      (h % 1024L, (h >> 10) % 1024L)
    }
    val viaDf = pts.toDF("x", "y")
      .withColumn("d", graft.functions.native.hilbert(col("x"), col("y"),
        10))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    pts.foreach { case (x, y) =>
      val interp = HilbertIndex(Literal(x), Literal(y), 10).eval(null)
        .asInstanceOf[Long]
      assert(interp == viaDf((x, y)), s"($x, $y)")
    }
  }

  test("hilbert masks inputs to the grid (keys beyond 2^bits wrap to " +
      "their low bits, never error)") {
    val got = Seq((1024L + 3L, 2048L + 5L), (3L, 5L))
      .toDF("x", "y")
      .withColumn("d", graft.functions.native.hilbert(col("x"), col("y"),
        10))
      .select("d").as[Long].collect()
    assert(got(0) == got(1))
  }
}
