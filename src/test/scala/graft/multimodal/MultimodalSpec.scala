package graft.multimodal

import graft.SparkSpec
import Multimodal._

/** Multimodal plumbing: schema, partition batching, stub-decode
  * determinism, payload transforms. */
class MultimodalSpec extends SparkSpec {

  test("binary payloads round-trip with typed metadata") {
    val media = mediaFromDocuments(spark, sfDir)
    val row = media.filter(_.media_id == 0L).head()
    assert(row.mime == "text/plain")
    assert(new String(row.media, "UTF-8").startsWith("the "))
  }

  test("feature extraction is deterministic and partition-independent") {
    val media = mediaFromDocuments(spark, sfDir)
    val once = extractFeatures(media).collect().map(f =>
      f.media_id -> ((f.n_bytes, f.first_byte, f.checksum))).toMap
    val repartitioned = extractFeatures(media.repartition(7)).collect()
      .map(f => f.media_id -> ((f.n_bytes, f.first_byte, f.checksum))).toMap
    assert(once == repartitioned)
    assert(once.nonEmpty)
  }

  test("stub features have the declared batch shape") {
    val f = extractFeatures(mediaFromDocuments(spark, sfDir)).head()
    assert(f.feature.length == 8)
    assert(f.feature.forall(v => v >= 0.0f && v <= 1.0f))
  }

  test("frame sampling chunks payloads and keeps every Nth frame") {
    import spark.implicits._
    val media = Seq(
      // 200 bytes → frames 0..3 (64,64,64,8 bytes); sampled: 0
      MediaRow(1L, "video/fake", Array.fill[Byte](200)('a'.toByte)),
      // 300 bytes → frames 0..4; sampled: 0, 4 (last frame 44 bytes)
      MediaRow(2L, "video/fake", Array.fill[Byte](300)('b'.toByte)),
      MediaRow(3L, "video/fake", Array.emptyByteArray))
      .toDS()
    val frames = frameSample(media).collect()
      .map(f => (f.media_id, f.frame_idx, f.n_bytes)).sorted.toSeq
    assert(frames == Seq((1L, 0, 64L), (2L, 0, 64L), (2L, 4, 44L)),
      s"got $frames")
  }

  test("resize stub truncates payloads, preserving ids") {
    val media = mediaFromDocuments(spark, sfDir)
    val resized = resizeStub(media, 16).collect()
    assert(resized.forall(_.media.length <= 16))
    assert(resized.map(_.media_id).sorted.toSeq ==
      media.collect().map(_.media_id).sorted.toSeq)
  }

  test("patch grid tiles every image exactly: per-image patch count " +
      "is nx*ny and clipped areas sum to w*h") {
    val rows = Multimodal.q25c_patchify(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    val dims = mediaFromDocuments(spark, sfDir).collect()
      .map { r =>
        val n = r.media.length.toLong
        val w = 16 + n % 33
        val h = (n + w - 1) / w
        (r.media_id, (w, h))
      }.toMap
    rows.groupBy(_._1).foreach { case (id, ps) =>
      val (w, h) = dims(id)
      val nx = (w + 15) / 16
      val ny = (h + 15) / 16
      assert(ps.length == nx * ny, s"media $id patch count")
      assert(ps.map(_._7).sum == w * h, s"media $id area coverage")
      // every patch lies inside the image and is non-empty
      ps.foreach { case (_, _, x0, y0, pw, ph, npix) =>
        assert(pw >= 1 && ph >= 1 && npix == pw * ph)
        assert(x0 + pw <= w && y0 + ph <= h)
      }
    }
    // the dims derivation must actually exercise clipping on both axes
    assert(rows.exists(_._5 < 16) && rows.exists(_._6 < 16),
      "fixture should produce clipped edge patches")
  }

  test("approx distinct stays within HLL error bound") {
    val rows = graft.queries.Relational
      .q04b_approx_distinct(spark, sfDir).collect()
    rows.foreach { r =>
      val approx = r.getLong(1).toDouble
      val exact = r.getLong(2).toDouble
      assert(math.abs(approx - exact) / exact < 0.1,
        s"approx $approx vs exact $exact")
    }
  }

  test("phashStub: equal-width blocks, aHash bit semantics, edit " +
      "locality — a few changed bytes move few bits") {
    val base = Array.tabulate(600)(i => ((i * 37) % 251).toByte)
    val h = graft.multimodal.Multimodal.phashStub(base)
    assert(h == graft.multimodal.Multimodal.phashStub(base.clone()),
      "deterministic")
    // flip a handful of bytes in one region: bounded signature movement
    val edited = base.clone()
    (100 until 110).foreach(i => edited(i) = (edited(i) + 90).toByte)
    val h2 = graft.multimodal.Multimodal.phashStub(edited)
    assert(java.lang.Long.bitCount(h ^ h2) <= 6,
      s"local edit moved ${java.lang.Long.bitCount(h ^ h2)} bits")
    assert(graft.multimodal.Multimodal.phashStub(Array.empty[Byte]) == 0L)
  }

  test("q25e multi-index probe: pigeonhole recall is total at " +
      "Hamming <= 8 on planted signatures (plain exact-band LSH " +
      "provably misses some)") {
    // the operator's candidate scheme, replayed in-memory over planted
    // hashes: every pair within 8 must surface; distance-9+ pairs may
    // or may not (they're verify-filtered anyway)
    val rnd = new scala.util.Random(5)
    val base = rnd.nextLong() & ((1L << 60) - 1)
    def flip(h: Long, bits: Seq[Int]) = bits.foldLeft(h)((a, b) => a ^ (1L << b))
    // distance exactly 8, spread 2-per-band (the worst case for exact
    // bands: NO band matches exactly, 2 errors in each)
    val spread8 = flip(base, Seq(0, 7, 15, 22, 30, 37, 45, 52))
    val sigs = Seq(1L -> base, 2L -> spread8,
      3L -> flip(base, Seq(3)), 4L -> flip(base, (0 until 12)))
    def bandVals(h: Long) = (0 until 4).map(b => (b, (h >> (15 * b)) & 0x7FFF))
    val masks = 0L +: ((0 until 15).map(1L << _) ++
      (for { i <- 0 until 15; j <- (i + 1) until 15 }
        yield (1L << i) | (1L << j)))
    def candidates(a: Long, b: Long): Boolean =
      bandVals(a).exists { case (i, va) =>
        val vb = bandVals(b)(i)._2
        masks.exists(m => va == (vb ^ m))
      }
    // exact-band LSH misses the spread-8 pair; the probe finds it
    assert(!bandVals(base).zip(bandVals(spread8)).exists {
      case ((_, x), (_, y)) => x == y }, "planted case defeats exact bands")
    for {
      (ia, ha) <- sigs; (ib, hb) <- sigs if ia < ib
      if java.lang.Long.bitCount(ha ^ hb) <= 8
    } assert(candidates(ha, hb), s"pair $ia-$ib missed")
  }

  test("q04c sketch columns: per-type estimates within error of exact, " +
      "and the union row equals a direct sketch of all users") {
    import org.apache.spark.sql.functions._
    val got = graft.queries.Relational
      .q04c_hll_sketches(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val ev = graft.Tables.events(spark, sfDir).localCheckpoint()
    val exact = ev.groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (k, n) =>
      assert(math.abs(got(k).toDouble - n) / n < 0.05,
        s"$k: sketch ${got(k)} vs exact $n")
    }
    // the re-aggregation property: union of per-type sketches must land
    // the SAME estimate as one sketch built over everything — registers
    // merge by max, so this is equality, not approximation
    val direct = ev.agg(
        hll_sketch_estimate(hll_sketch_agg(col("user_id"), lit(14))))
      .head().getLong(0)
    assert(got("__all__") == direct,
      s"union ${got("__all__")} != direct sketch $direct")
  }
}
