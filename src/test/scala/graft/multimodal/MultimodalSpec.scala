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
