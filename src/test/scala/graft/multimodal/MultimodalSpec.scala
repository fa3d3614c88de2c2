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
}
