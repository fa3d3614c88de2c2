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

  /** One sampled frame: payload chunk metadata + content checksum. */
  case class FrameRow(media_id: Long, frame_idx: Int, n_bytes: Long,
      checksum: Long)

  /** Stub "frame sampling": chunk the payload into fixed-size frames and
    * keep every `every`-th — the pipeline shape of video keyframe
    * extraction (a real build decodes container frames here instead of
    * slicing bytes). Partition-batched for the same codec-amortization
    * reason as extractFeatures. */
  def frameSample(media: Dataset[MediaRow], frameBytes: Int = 64,
      every: Int = 4): Dataset[FrameRow] = {
    implicit val enc = Encoders.product[FrameRow]
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        val n = r.media.length
        val nFrames = (n + frameBytes - 1) / frameBytes
        Iterator.range(0, nFrames, every).map { idx =>
          val start = idx * frameBytes
          val end = math.min(start + frameBytes, n)
          var acc = 0L
          var i = start
          while (i < end) {
            acc = (acc * 31 + (r.media(i) & 0xff)) % 1000000007L
            i += 1
          }
          FrameRow(r.media_id, idx, (end - start).toLong, acc)
        }
      }
    }
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

  /** q25b — frame sampling, oracle-checked: 64-byte frames, every 4th
    * kept; DuckDB restates each sampled frame with substring math (the
    * corpus is ASCII, so char offsets == byte offsets). */
  def q25b_frame_sample(s: SparkSession, dir: String): DataFrame =
    frameSample(mediaFromDocuments(s, dir))
      .select(col("media_id"), col("frame_idx"), col("n_bytes"),
        col("checksum"))
      .orderBy("media_id", "frame_idx")

  val q25bSql: String =
    """WITH d AS (SELECT doc_id, text, length(text) AS len FROM documents),
      |f AS (SELECT doc_id, text,
      |    unnest(range(0, CAST(ceil(len / 64.0) AS BIGINT), 4)) AS idx
      |  FROM d)
      |SELECT doc_id AS media_id, CAST(idx AS INTEGER) AS frame_idx,
      |  CAST(length(substring(text, idx*64 + 1, 64)) AS BIGINT) AS n_bytes,
      |  list_reduce(
      |    list_prepend(CAST(0 AS BIGINT),
      |      list_transform(range(1, length(substring(text, idx*64 + 1, 64))+1),
      |        i -> CAST(ascii(substring(substring(text, idx*64 + 1, 64), i, 1))
      |               AS BIGINT))),
      |    (acc, c) -> (acc * 31 + c) % 1000000007) AS checksum
      |FROM f ORDER BY media_id, frame_idx""".stripMargin

  /** q25c — ViT-style patch grid: every vision-transformer pipeline
    * starts by slicing each image into a fixed 16×16 patch grid with
    * edge clipping; the patch COORDINATE computation (grid shape, patch
    * origin, clipped extent) is pure Spark-side metadata math and runs
    * here exactly, while pixel extraction belongs to the stubbed codec
    * seam (q25). Image dims derive deterministically from the payload
    * (width 16 + n_bytes mod 33 — deliberately not a multiple of 16 so
    * both axes exercise clipping; height = the raster row count at that
    * width), so the op runs on driver test data with no image libs.
    *
    * Scale: one row-local explode of nx·ny patch rows per image — no
    * shuffle, no state; output size is a function of image dims, never
    * of byte count. */
  def q25c_patchify(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, length, lit}
    mediaFromDocuments(s, dir)
      .select(col("media_id"), length(col("media")).cast("long").as("n_bytes"))
      .withColumn("w", lit(16L) + col("n_bytes") % 33L)
      .withColumn("h", expr("(n_bytes + w - 1) div w"))
      .withColumn("nx", expr("(w + 15) div 16"))
      .withColumn("ny", expr("(h + 15) div 16"))
      .withColumn("p", expr(
        """explode(CASE WHEN nx * ny >= 1
          |THEN sequence(0L, nx * ny - 1) ELSE array() END""".stripMargin
          + ")"))
      .select(col("media_id"), col("p").as("patch_idx"),
        expr("(p % nx) * 16").as("x0"),
        expr("(p div nx) * 16").as("y0"),
        expr("least(16L, w - (p % nx) * 16)").as("pw"),
        expr("least(16L, h - (p div nx) * 16)").as("ph"),
        expr("least(16L, w - (p % nx) * 16)" +
          " * least(16L, h - (p div nx) * 16)").as("n_pix"))
      .orderBy("media_id", "patch_idx")
  }

  val q25cSql: String =
    """WITH m AS (SELECT doc_id AS media_id,
      |    CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
      |  FROM documents),
      |d AS (SELECT media_id, n_bytes, 16 + n_bytes % 33 AS w FROM m),
      |e AS (SELECT *, (n_bytes + w - 1) // w AS h FROM d),
      |g AS (SELECT *, (w + 15) // 16 AS nx, (h + 15) // 16 AS ny FROM e),
      |p AS (SELECT media_id, w, h, nx,
      |    unnest(range(0, nx * ny)) AS p
      |  FROM g)
      |SELECT media_id, p AS patch_idx,
      |  (p % nx) * 16 AS x0, (p // nx) * 16 AS y0,
      |  least(16, w - (p % nx) * 16) AS pw,
      |  least(16, h - (p // nx) * 16) AS ph,
      |  least(16, w - (p % nx) * 16) * least(16, h - (p // nx) * 16)
      |    AS n_pix
      |FROM p ORDER BY media_id, patch_idx""".stripMargin

  // ------------------------------------------------------------- pairs
  /** CONTRASTIVE (text, embedding) pair assembly — the CLIP-style
    * training-set build: each document pairs with its embedding row
    * (doc_id = vec_id — the keying a real pipeline gets from running
    * the encoder over the same corpus), stamped with the q26 key-hash
    * train/test split so pair membership is recomputable from the key
    * alone. Output is the per-(lang, label, split) pair inventory with
    * token mass — the balance sheet checked before a contrastive run.
    *
    * Scale: ONE equi-join on the id (both sides shuffle-partition on
    * it; at corpus scale this is a bucketed co-located join via
    * graft.sinks.Bucketing), then a partial-agg groupBy. The embedding
    * vectors themselves never move — only (id, label) projects into
    * the join. */
  def q25d_pairs(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.load(s, dir, "documents")
      .select(col("doc_id"), col("lang"),
        size(split(trim(col("text")), "\\s+")).cast("long").as("n_toks"))
    val e = Tables.load(s, dir, "embeddings")
      .select(col("vec_id"), col("label"))
    d.join(e, col("doc_id") === col("vec_id"))
      .withColumn("split",
        when(pmod(col("doc_id") * 2654435761L, lit(4294967296L))
          % 100 < 80, "train").otherwise("test"))
      .groupBy("lang", "label", "split")
      .agg(count(lit(1)).as("n_pairs"), sum(col("n_toks")).as("toks"))
      .orderBy("lang", "label", "split")
  }

  val q25dSql: String =
    """SELECT lang, label,
      |  CASE WHEN (doc_id * 2654435761) % 4294967296 % 100 < 80
      |       THEN 'train' ELSE 'test' END AS split,
      |  count(*) AS n_pairs,
      |  CAST(SUM(len(string_split_regex(trim(text), '\s+'))) AS BIGINT)
      |    AS toks
      |FROM documents JOIN embeddings ON doc_id = vec_id
      |GROUP BY 1, 2, 3
      |ORDER BY lang, label, split""".stripMargin

  /** Stub perceptual hash: 60-bit signature, one parity bit per
    * EQUAL-WIDTH payload block — the fixed-grid discipline of a real
    * pHash (resize → per-block DCT sign); block boundaries scale with
    * the payload (block i = bytes [i·len/60, (i+1)·len/60)), so every
    * media fills all 60 bits and no length class degenerates into one
    * shared bucket (a frame-indexed signature left every short doc's
    * high bands zero → all-pairs among them, measured 124k candidate
    * pairs on 500 docs). A real build swaps the block feature at this
    * same codec seam. */
  def phashStub(bytes: Array[Byte]): Long = {
    val len = bytes.length
    var total = 0L
    var t = 0
    while (t < len) { total += (bytes(t) & 0xff); t += 1 }
    var hash = 0L
    var i = 0
    while (i < 60) {
      val from = i.toLong * len / 60
      val until = (i + 1).toLong * len / 60
      var s = 0L
      var j = from
      while (j < until) { s += (bytes(j.toInt) & 0xff); j += 1 }
      // aHash bit: block mean above the payload mean, exact integer
      // cross-multiply (s/w > total/len ⇔ s·len > total·w) — edit-
      // robust, so near-identical payloads land small Hamming
      // distances (a checksum-parity bit flips on ANY byte change and
      // finds only byte-identical media)
      if (s * len > total * (until - from)) hash |= (1L << i)
      i += 1
    }
    hash
  }

  /** A (media, signature) row. */
  case class MediaSig(media_id: Long, hash: Long)

  /** q25e — PERCEPTUAL-HASH NEAR-DUP over media payloads: the image
    * dedup step of a multimodal pipeline (pHash/aHash family), run at
    * its production scale shape. Per media, the 60-bit [[phashStub]]
    * signature (partition-batched through the codec seam); candidates
    * come from MULTI-INDEX HAMMING SEARCH (Norouzi, Punjani & Fleet,
    * CVPR'12): split the signature into 4 bands of 15 bits — by
    * pigeonhole, any pair within distance 8 agrees within 2 bits in
    * SOME band — and probe each band value against its ≤2-error
    * neighborhood (121 masks), an EQUI join on (band, value), never an
    * all-pairs scan (plain exact-band LSH provably misses distance-8
    * pairs; the corpus's closest real pair sits at exactly 8).
    * Survivors verify by exact Hamming ≤ 8 on the full signature.
    * Oracle re-derives signatures from the text with substring block
    * math (the q25b precedent) and replays the same mask probe. */
  def q25e_phash_dedup(s: SparkSession, dir: String): DataFrame = {
    implicit val enc = Encoders.product[MediaSig]
    val sigs = mediaFromDocuments(s, dir)
      .mapPartitions { rows => // codec init once per partition
        rows.map(r => MediaSig(r.media_id, phashStub(r.media)))
      }
      .toDF()
      .localCheckpoint() // bands + verify both read it
    // SPLIT mask expansion (r14): any e with |e| ≤ 2 factors as
    // e1 ⊕ e2 with |e1|,|e2| ≤ 1, so expanding BOTH sides by the 16
    // weight-≤1 masks meets every band-distance-≤2 pair at the equi key
    // x ⊕ e1 = y ⊕ e2 — the same candidate predicate as probing one
    // side with all 121 weight-≤2 masks, at 2·16 = 32 shuffled rows per
    // band row instead of 1 + 121 (and ReuseExchange shares the ONE
    // exploded exchange across both join sides, so the shuffle runs
    // once). Verified identical candidate SET: multiplicities differ,
    // the distinct below already absorbed them.
    val masks1: Seq[Long] = 0L +: (0 until 15).map(1L << _)
    val expanded = sigs.select(col("media_id"), col("hash"),
        explode(sequence(lit(0), lit(3))).as("b"))
      .withColumn("band_val",
        expr("hash div shiftleft(1L, 15 * b) % 32768"))
      .withColumn("mask", explode(typedlit(masks1)))
      .select(col("b"), expr("band_val ^ mask").as("bv"),
        col("media_id"), col("hash"))
    val cand = expanded.as("L")
      .join(expanded.as("R"), col("L.b") === col("R.b") &&
        col("L.bv") === col("R.bv") &&
        col("L.media_id") < col("R.media_id"))
      .select(col("L.media_id").as("id_a"), col("R.media_id").as("id_b"),
        col("L.hash").as("ha"), col("R.hash").as("hb"))
    cand
      .withColumn("hamming", expr("bit_count(ha ^ hb)").cast("int"))
      // verify BEFORE the dedup exchange: hamming is determined by the
      // pair, so filtering first shuffles only true near-dups into the
      // distinct instead of every band-collision candidate
      .filter(col("hamming") <= 8)
      .select("id_a", "id_b", "hamming")
      .distinct()
      .orderBy("id_a", "id_b")
  }

  val q25eSql: String =
    """WITH d AS (SELECT doc_id, text, length(text) AS len FROM documents),
      |f AS (SELECT doc_id, unnest(range(0, 60)) AS idx, text, len
      |  FROM d),
      |tot AS (SELECT doc_id,
      |    list_reduce(
      |      list_prepend(CAST(0 AS BIGINT),
      |        list_transform(range(1, length(text)+1),
      |          i -> CAST(ascii(substring(text, i, 1)) AS BIGINT))),
      |      (acc, c) -> acc + c) AS total
      |  FROM d),
      |blk AS (SELECT doc_id, idx, len,
      |    substring(text, CAST(idx * len // 60 AS INT) + 1,
      |      CAST((idx + 1) * len // 60 - idx * len // 60 AS INT)) AS s
      |  FROM f),
      |bit AS (SELECT blk.doc_id, idx,
      |    CASE WHEN list_reduce(
      |        list_prepend(CAST(0 AS BIGINT),
      |          list_transform(range(1, length(s)+1),
      |            i -> CAST(ascii(substring(s, i, 1)) AS BIGINT))),
      |        (acc, c) -> acc + c) * len
      |      > tot.total * CAST(length(s) AS BIGINT)
      |      THEN 1 ELSE 0 END AS b
      |  FROM blk JOIN tot ON tot.doc_id = blk.doc_id),
      |sig AS (SELECT doc_id,
      |    CAST(SUM(b * (CAST(1 AS BIGINT) << CAST(idx AS INT))) AS BIGINT)
      |      AS hash
      |  FROM bit GROUP BY doc_id),
      |bands AS (SELECT doc_id, hash, b.b,
      |    hash // (CAST(1 AS BIGINT) << CAST(15 * b.b AS INT)) % 32768
      |      AS band_val
      |  FROM sig, range(4) b(b)),
      |mk AS (SELECT CAST(0 AS BIGINT) AS mask
      |  UNION ALL
      |  SELECT CAST(1 AS BIGINT) << CAST(i.i AS INT) FROM range(15) i(i)
      |  UNION ALL
      |  SELECT (CAST(1 AS BIGINT) << CAST(i.i AS INT))
      |       | (CAST(1 AS BIGINT) << CAST(j.j AS INT))
      |  FROM range(15) i(i), range(15) j(j) WHERE j.j > i.i),
      |cand AS (SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b,
      |    x.hash AS ha, y.hash AS hb
      |  FROM bands x, bands y, mk
      |  WHERE x.b = y.b AND x.band_val = xor(y.band_val, mk.mask)
      |    AND x.doc_id < y.doc_id)
      |SELECT id_a, id_b, CAST(bit_count(xor(ha, hb)) AS INT) AS hamming
      |FROM cand WHERE bit_count(xor(ha, hb)) <= 8
      |ORDER BY id_a, id_b""".stripMargin

  /** One frame's integer energy (what a real DSP layer would emit). */
  case class FrameEnergy(media_id: Long, frame_idx: Int, energy: Long)

  /** q25f — AUDIO FRAME ENERGY through the same codec seam: the payload
    * read as 8-bit PCM, non-overlapping 64-sample frames, per-frame
    * energy Σ(s−128)² — the silence/level detector an audio pipeline
    * runs before transcription or segmentation (drop dead air, find
    * peaks). Per media: frame count, quiet frames (energy < 120 000),
    * peak and total energy — all integer, so the oracle restates every
    * bit with substring/ascii math. The per-sample loop lives in
    * mapPartitions behind the codec seam (a real DSP lib initializes
    * once per partition, exactly like the decode stub); the rollup is a
    * partial-agg groupBy on media_id. */
  def q25f_audio_energy(s: SparkSession, dir: String): DataFrame = {
    implicit val enc = Encoders.product[FrameEnergy]
    val frames = mediaFromDocuments(s, dir).mapPartitions { rows =>
      rows.flatMap { r =>
        r.media.grouped(64).zipWithIndex.map { case (fb, idx) =>
          var e = 0L
          var i = 0
          while (i < fb.length) {
            val d = (fb(i) & 0xff) - 128
            e += d.toLong * d
            i += 1
          }
          FrameEnergy(r.media_id, idx, e)
        }
      }
    }
    frames.groupBy("media_id")
      .agg(count(lit(1)).as("n_frames"),
        sum(when(col("energy") < 120000L, 1L).otherwise(0L)).as("n_quiet"),
        max("energy").as("peak_energy"),
        sum("energy").as("sum_energy"))
      .orderBy("media_id")
  }

  val q25fSql: String =
    """WITH d AS (SELECT doc_id, text, length(text) AS len FROM documents),
      |f AS (SELECT doc_id, text,
      |    unnest(range(0, CAST(ceil(len / 64.0) AS BIGINT), 1)) AS idx
      |  FROM d),
      |fr AS (SELECT doc_id, idx, substring(text, idx*64 + 1, 64) AS fb
      |       FROM f),
      |en AS (SELECT doc_id, idx,
      |  CAST(list_reduce(
      |    list_prepend(CAST(0 AS BIGINT),
      |      list_transform(range(1, length(fb)+1),
      |        i -> CAST((ascii(substring(fb, i, 1)) - 128)
      |             * (ascii(substring(fb, i, 1)) - 128) AS BIGINT))),
      |    (a, b) -> a + b) AS BIGINT) AS energy
      |  FROM fr)
      |SELECT doc_id AS media_id, CAST(COUNT(*) AS BIGINT) AS n_frames,
      |  CAST(SUM(CASE WHEN energy < 120000 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_quiet,
      |  CAST(MAX(energy) AS BIGINT) AS peak_energy,
      |  CAST(SUM(energy) AS BIGINT) AS sum_energy
      |FROM en GROUP BY 1 ORDER BY media_id""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q25_multimodal" -> (q25_multimodal _),
    "q25f_audio_energy" -> (q25f_audio_energy _),
    "q25b_frame_sample" -> (q25b_frame_sample _),
    "q25c_patchify" -> (q25c_patchify _),
    "q25d_pairs" -> (q25d_pairs _),
    "q25e_phash_dedup" -> (q25e_phash_dedup _))

  def oracles: Map[String, String] = Map(
    "q25_multimodal" -> q25Sql,
    "q25f_audio_energy" -> q25fSql,
    "q25b_frame_sample" -> q25bSql,
    "q25c_patchify" -> q25cSql,
    "q25d_pairs" -> q25dSql,
    "q25e_phash_dedup" -> q25eSql)
}
