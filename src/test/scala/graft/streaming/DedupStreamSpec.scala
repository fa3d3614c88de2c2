package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The continuous-dedup index loop: exact dedup must work ACROSS
  * microbatches (the whole point of the persisted fingerprint index)
  * and near-dup candidates must surface against documents indexed in
  * earlier batches. */
class DedupStreamSpec extends SparkSpec {

  private val base = "the quick brown fox jumps over the lazy dog " +
    "again and again every single day without fail in the morning"

  test("exact dups drop across batches; near dups flag against the " +
      "band index; indexes grow by survivors only") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("dedup_stream").toString
    val mem = MemoryStream[(Long, String)]
    val q = DedupStream.start(
      mem.toDF().toDF("doc_id", "text"), dir)
    try {
      // batch 0: two distinct docs + an in-batch exact dup of doc 1
      mem.addData((1L, base), (2L, "completely different words " * 5),
        (3L, base))
      q.processAllAvailable()
      // batch 1: cross-batch exact dup of doc 1; a near-dup of doc 1
      // (one token edited); a fresh doc
      mem.addData((4L, base), (5L, base.replace("lazy", "sleepy")),
        (6L, "yet another unrelated document " * 4))
      q.processAllAvailable()
    } finally q.stop()
    val dec = spark.read.parquet(s"$dir/decisions")
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[String]("decision"), Option(r.getAs[java.lang.Long]("near_partner"))))
      .toMap
    assert(dec(1L)._1 == "kept" && dec(2L)._1 == "kept")
    assert(dec(3L)._1 == "exact_dup", "in-batch exact dup must drop")
    assert(dec(4L)._1 == "exact_dup",
      "CROSS-batch exact dup must drop via the fingerprint index")
    assert(dec(5L) == ("near_candidate", Some(1L)),
      s"one-token edit must band-collide with indexed doc 1, got ${dec(5L)}")
    assert(dec(6L)._1 == "kept")
    // index contents = survivors only (exact dups never indexed)
    val fpIds = spark.read.parquet(s"$dir/fp")
      .select("doc_id").as[Long].collect().toSet
    assert(fpIds == Set(1L, 2L, 5L, 6L))
    val bandIds = spark.read.parquet(s"$dir/bands")
      .select("doc_id").distinct().as[Long].collect().toSet
    assert(bandIds == Set(1L, 2L, 5L, 6L))
    // re-delivery safety: reprocessing batch 1's rows against the grown
    // index flips nothing — existence joins ignore duplicate index rows
    DedupStream.processBatch(
      Seq((4L, base)).toDF("doc_id", "text"), 99L, dir)
    val redo = spark.read.parquet(s"$dir/decisions")
      .filter(col("batch_id") === 99L).collect()
    assert(redo.length == 1 && redo(0).getAs[String]("decision") == "exact_dup")
  }
}
