package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Multimodal column plumbing (north-star surface): image/audio/video
  * travel as opaque `binary` columns with typed metadata; decode /
  * feature-extraction runs partition-batched so a real codec (JNI/FFI or
  * a Python worker) amortizes per-batch setup — the Scala analogue of
  * pandas-UDF batching over mapInPandas.
  *
  * The codec itself is STUBBED (this container has no image/audio libs):
  * `decodeStub` produces deterministic pseudo-features from the bytes.
  * Everything around it — schema, encoders, partition batching, the
  * downstream feature columns — is real and oracle-tested (q25).
  */
object Multimodal {

  /** A media row: opaque payload + typed metadata. */
  case class MediaRow(media_id: Long, mime: String, media: Array[Byte])

  /** Extracted features (what a real decoder would emit). */
  case class MediaFeatures(media_id: Long, n_bytes: Long, first_byte: Int,
      checksum: Long, feature: Array[Float])

  /** STUB decode: deterministic byte-level pseudo-features standing in
    * for image decode / audio frame extraction. A production build swaps
    * ONLY this function for a real codec call; the batching shape stays. */
  def decodeStub(bytes: Array[Byte]): (Long, Int, Long, Array[Float]) = {
    val n = bytes.length.toLong
    val first = if (bytes.isEmpty) -1 else bytes(0) & 0xff
    var acc = 0L
    var i = 0
    while (i < bytes.length) {
      acc = (acc * 31 + (bytes(i) & 0xff)) % 1000000007L
      i += 1
    }
    val feat = Array.tabulate(8)(d =>
      (((acc >> (d * 4)) & 0xf).toFloat / 15.0f))
    (n, first, acc, feat)
  }

  /** Partition-batched feature extraction. mapPartitions (not a per-row
    * UDF) so a real codec initializes once per partition and processes
    * rows in bulk — at 100 TB this is the difference between one codec
    * init per row and one per ~128 MB split. */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    implicit val enc = Encoders.product[MediaFeatures]
    media.mapPartitions { rows =>
      // real codecs acquire native resources here, once per partition
      rows.map { r =>
        val (n, first, checksum, feat) = decodeStub(r.media)
        MediaFeatures(r.media_id, n, first, checksum, feat)
      }
    }
  }

  /** Stub "resize/transcode": binary → binary, deterministic truncation
    * standing in for a real transform; keeps the payload-in/payload-out
    * pipeline shape. */
  def resizeStub(media: Dataset[MediaRow], maxBytes: Int): Dataset[MediaRow] = {
    implicit val enc = Encoders.product[MediaRow]
    media.map(r => r.copy(media = r.media.take(maxBytes)))
  }

  /** Synthesize a media table from `documents` (UTF-8 bytes as payload)
    * so the plumbing runs on driver test data. */
  def mediaFromDocuments(s: SparkSession, dir: String): Dataset[MediaRow] = {
    implicit val enc = Encoders.product[MediaRow]
    Tables.load(s, dir, "documents")
      .select(col("doc_id").as("media_id"), lit("text/plain").as("mime"),
        encode(col("text"), "UTF-8").as("media"))
      .as[MediaRow]
  }

  /** q25 — the oracle-checked query: binary ingestion → partition-batched
    * decode → integer features. DuckDB restates the expected features
    * directly from the text. */
  def q25_multimodal(s: SparkSession, dir: String): DataFrame =
    extractFeatures(mediaFromDocuments(s, dir))
      .select(col("media_id"), col("n_bytes"), col("first_byte"),
        col("checksum"))
      .orderBy("media_id")

  val q25Sql: String =
    """SELECT doc_id AS media_id,
      |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
      |  ascii(substring(text, 1, 1)) AS first_byte,
      |  list_reduce(
      |    list_prepend(CAST(0 AS BIGINT),
      |      list_transform(range(1, length(text)+1),
      |        i -> CAST(ascii(substring(text, i, 1)) AS BIGINT))),
      |    (acc, c) -> (acc * 31 + c) % 1000000007) AS checksum
      |FROM documents ORDER BY media_id""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q25_multimodal" -> (q25_multimodal _))

  def oracles: Map[String, String] = Map(
    "q25_multimodal" -> q25Sql)
}
