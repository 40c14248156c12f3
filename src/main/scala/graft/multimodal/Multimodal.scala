package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video payloads travel as
  * opaque `binary` columns next to a typed metadata struct, and decode /
  * feature-extract runs batch-wise inside `mapPartitions` so a real
  * decoder (JNI image lib, ffmpeg pipe, ONNX runtime) amortizes its init
  * cost per partition, not per row.
  *
  * The IMAGE kernel is real: payloads any `javax.imageio` reader claims
  * (PNG/BMP/GIF/JPEG — all ship with the JDK, zero-egress) decode to
  * real pixels, and [[decodeMeta]]/[[perceptualHash]]/[[resize]] run on
  * actual dimensions and luminance. Payloads no reader claims (text,
  * audio, video — codecs this container lacks) fall back to the
  * documented deterministic stub, so those kernels stay honestly
  * stubbed while schema, batching, and plan shape are shared with the
  * real path. Swap the stub for an ffmpeg/ONNX call and nothing else
  * changes.
  */
object Multimodal {

  /** Real image decode through the JDK's public ImageIO registry.
    * None when no registered reader claims the payload OR the stream
    * is a truncated/corrupt claimed format — both route to the
    * deterministic stub rather than failing a 100 TB scan on one bad
    * blob. Two robustness points a per-row hot path needs:
    *
    *  - catch NonFatal, not just IOException: the JDK readers throw
    *    RuntimeExceptions (ArrayIndexOutOfBounds, IllegalArgument,
    *    NegativeArraySize) on malformed headers — a crafted blob must
    *    degrade to the stub, never abort the scan;
    *  - an explicit MemoryCacheImageInputStream: bare
    *    ImageIO.read(InputStream) with the default useCache=true
    *    spools every payload through a disk-backed temp file — one
    *    executor-disk round-trip per row, paid even for payloads no
    *    reader claims. The payload is already fully in memory.
    */
  def decodeImage(payload: Array[Byte]): Option[java.awt.image.BufferedImage] =
    try {
      val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
        new java.io.ByteArrayInputStream(payload))
      // ImageIO.read(ImageInputStream) closes the stream itself on the
      // success path; the swallow covers the resulting double-close
      try Option(javax.imageio.ImageIO.read(iis))
      finally { try iis.close() catch { case _: java.io.IOException => () } }
    } catch { case scala.util.control.NonFatal(_) => None }

  /** 64 integer brightness cells over an 8x8 block grid (block
    * boundaries floor(c*W/8) etc.): luminance per pixel is
    * (299r + 587g + 114b) / 1000 and the cell is the integer mean of
    * its block — ALL-integer arithmetic, so an independent decoder
    * replays every cell exactly (the q_media_phash_img VALUES oracle
    * was computed by a from-scratch BMP reader running this math).
    * Requires both dimensions >= 8 so every block is non-empty.
    */
  def imageCells(img: java.awt.image.BufferedImage): Array[Int] = {
    val w = img.getWidth; val h = img.getHeight
    require(w >= 8 && h >= 8, s"image must be >= 8x8 for the cell grid, got ${w}x$h")
    Array.tabulate(64) { c =>
      val x0 = (c % 8) * w / 8; val x1 = (c % 8 + 1) * w / 8
      val y0 = (c / 8) * h / 8; val y1 = (c / 8 + 1) * h / 8
      var s = 0L; var y = y0
      while (y < y1) {
        var x = x0
        while (x < x1) {
          val rgb = img.getRGB(x, y)
          s += (299 * ((rgb >> 16) & 0xff) + 587 * ((rgb >> 8) & 0xff) +
            114 * (rgb & 0xff)) / 1000
          x += 1
        }
        y += 1
      }
      (s / ((x1 - x0).toLong * (y1 - y0))).toInt
    }
  }

  /** Typed metadata extracted from a binary payload. */
  case class MediaMeta(
      doc_id: Long,
      n_bytes: Int,
      sha256_hex: String,
      width: Int,
      height: Int,
      n_frames: Int)

  /** Not private: the Catalyst encoder's generated SafeProjection must
    * be able to construct it from outside this object.
    */
  case class BinRow(doc_id: Long, payload: Array[Byte])

  /** Attach a binary payload column (here: utf-8 bytes of `text`; in a
    * real corpus this is the stored image/audio blob).
    */
  def withBinaryPayload(docs: DataFrame): DataFrame =
    docs.withColumn("payload", encode(col("text"), "UTF-8"))

  /** Deterministic fake decode — stands in for the codec. Derives
    * "media" dimensions from the payload bytes only, so results are
    * reproducible and oracle-checkable.
    */
  def fakeDecode(payload: Array[Byte]): (Int, Int, Int) = {
    val n = payload.length
    // n * 31 in LONG: Int would wrap for payloads >= ~69 MB and diverge
    // from the DuckDB oracle's 64-bit arithmetic (negative "height").
    (64 + n % 512, 64 + (n.toLong * 31 % 512).toInt, 1 + n % 16)
  }

  /** Batch decode: one `mapPartitions` pass; per-partition iterator keeps
    * the (stubbed) decoder warm. Output is a flat typed Dataset.
    */
  def decodeMeta(spark: SparkSession, withPayload: DataFrame): Dataset[MediaMeta] = {
    import spark.implicits._
    withPayload.select(col("doc_id"), col("payload")).as[BinRow]
      .mapPartitions { rows =>
        // real impl for audio/video: val codec = Codec.open() — once per
        // partition; images decode for real via ImageIO below
        val digest = java.security.MessageDigest.getInstance("SHA-256")
        rows.map { r =>
          digest.reset()
          val sha = digest.digest(r.payload).map("%02x".format(_)).mkString
          val (w, h, f) = decodeImage(r.payload) match {
            case Some(img) => (img.getWidth, img.getHeight, 1)
            case None => fakeDecode(r.payload)
          }
          MediaMeta(r.doc_id, r.payload.length, sha, w, h, f)
        }
      }
  }

  /** Frame sampling shape: explode n_frames into (doc_id, frame_idx)
    * rows — the layout a video pipeline feeds to a per-frame model.
    */
  def sampleFrames(meta: Dataset[MediaMeta], stride: Int): DataFrame =
    meta.toDF().select(col("doc_id"),
      explode(sequence(lit(0), col("n_frames") - 1, lit(stride))).as("frame_idx"))

  /** Embedding row produced by [[extractFeatures]] — `features`
    * conforms to the `array<float>` contract the Similarity / KMeans
    * operators consume, closing the multimodal → embedding → ANN loop.
    */
  case class MediaFeatures(doc_id: Long, features: Array[Float])

  /** Batch feature extraction: binary payload → fixed-`dim` float
    * vector, the step between decode and indexing where a real vision/
    * audio encoder (ONNX session, JNI model) runs. Same `mapPartitions`
    * batching as [[decodeMeta]] — a real encoder loads once per
    * partition and consumes the row iterator in model-sized batches.
    *
    * The encoder kernel is the documented deterministic stand-in:
    * component j is the first 4 md5 bytes of (payload ++ "_j") as an
    * unsigned 32-bit scaled to [0, 1) — the `Similarity.hyperplanes`
    * bytes-to-unit recipe, so an external engine rebuilds every
    * component exactly and the whole operator is oracle-checkable.
    * Swap the kernel for a model call and nothing else changes.
    */
  def extractFeatures(
      spark: SparkSession, withPayload: DataFrame,
      dim: Int = 16): Dataset[MediaFeatures] = {
    import spark.implicits._
    require(dim > 0, s"dim must be positive, got $dim")
    withPayload.select(col("doc_id"), col("payload")).as[BinRow]
      .mapPartitions { rows =>
        // real impl: val encoder = Encoder.load() — once per partition
        val digest = java.security.MessageDigest.getInstance("MD5")
        rows.map { r =>
          val f = Array.tabulate(dim) { j =>
            digest.reset()
            digest.update(r.payload)
            digest.update(s"_$j".getBytes("UTF-8"))
            val h = digest.digest()
            val u = ((h(0) & 0xffL) << 24) | ((h(1) & 0xffL) << 16) |
              ((h(2) & 0xffL) << 8) | (h(3) & 0xffL)
            (u / 4294967296.0).toFloat
          }
          MediaFeatures(r.doc_id, f)
        }
      }
  }

  /** A 63-bit perceptual hash row (63 bits, not 64 — signed/unsigned
    * min-parity across engines, the SimHash lesson). */
  case class MediaHash(doc_id: Long, phash: Long)

  /** Perceptual difference-hash (dHash) over the decoded media: bit j
    * is "cell j at least as bright as cell j+1" over 64 brightness
    * cells — the classic near-duplicate image fingerprint (robust to
    * re-encoding and uniform brightness shifts, which preserve
    * brightness ORDER even when they perturb values). Same
    * `mapPartitions` batching as [[decodeMeta]].
    *
    * Decodable images >= 8x8 hash REAL luminance via [[imageCells]]
    * (all-integer, independently replayable — `q_media_phash_img`'s
    * oracle holds values computed by a from-scratch BMP decoder);
    * other payloads keep the md5 brightness stand-in (first md5 byte
    * of payload ++ "_p<j>", DuckDB-rebuildable). Either way the 64
    * cells are computed ONCE per row into a local array — the bit loop
    * reads each cell twice, and recomputing per bit would double the
    * digest passes for nothing.
    */
  def perceptualHash(
      spark: SparkSession, withPayload: DataFrame): Dataset[MediaHash] = {
    import spark.implicits._
    withPayload.select(col("doc_id"), col("payload")).as[BinRow]
      .mapPartitions { rows =>
        val digest = java.security.MessageDigest.getInstance("MD5")
        rows.map { r =>
          val cells: Array[Int] = decodeImage(r.payload)
            .filter(i => i.getWidth >= 8 && i.getHeight >= 8)
            .map(imageCells)
            .getOrElse(Array.tabulate(64) { j =>
              digest.reset()
              digest.update(r.payload)
              digest.update(s"_p$j".getBytes("UTF-8"))
              digest.digest()(0) & 0xff
            })
          var h = 0L
          var j = 0
          while (j < 63) {
            if (cells(j) >= cells(j + 1)) h |= (1L << j)
            j += 1
          }
          MediaHash(r.doc_id, h)
        }
      }
  }

  /** Near-duplicate media pairs by perceptual-hash hamming distance:
    * 4 × 16-bit band buckets generate candidates (two hashes within
    * hamming <= 3 MUST agree on at least one band — pigeonhole), an
    * exact `bit_count(xor)` verifies. The [[Dedup.simhashNearDuplicates]]
    * shape applied to media: candidates are an equi-join on (band,
    * bucket), never all-pairs. Output: (doc_a, doc_b, hamming),
    * doc_a < doc_b.
    */
  def nearDuplicateMedia(
      spark: SparkSession, withPayload: DataFrame,
      maxHamming: Int): DataFrame =
    nearDuplicatesFromHashes(
      perceptualHash(spark, withPayload).toDF(), maxHamming)

  /** The banding core over an existing (doc_id, phash) frame —
    * factored out so the pigeonhole recall guarantee is
    * property-testable against brute force on arbitrary hash sets
    * (MultimodalPropertiesSpec), and so callers with persisted hashes
    * skip the re-hash.
    */
  def nearDuplicatesFromHashes(
      h: DataFrame, maxHamming: Int): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 3,
      s"4-band bucketing guarantees recall only for hamming <= 3, got $maxHamming")
    val bands = h.select(col("doc_id"), col("phash"),
      explode(array((0 until 4).map(b => struct(lit(b).as("band"),
        (shiftright(col("phash"), 16 * b)
          .bitwiseAND(lit(0xffffL))).as("bucket"))): _*)).as("bb"))
      .select(col("doc_id"), col("phash"),
        col("bb.band").as("band"), col("bb.bucket").as("bucket"))
    bands.as("a").join(bands.as("b"),
        col("a.band") === col("b.band")
          && col("a.bucket") === col("b.bucket")
          && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        bit_count(col("a.phash").bitwiseXOR(col("b.phash"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** A resized payload with its new dimensions. */
  case class ResizedMedia(
      doc_id: Long, width: Int, height: Int, payload: Array[Byte])

  /** Batch resize to fit a `maxDim` bounding box, preserving aspect
    * ratio — binary in, binary out, the transform an image-training
    * pipeline runs between decode and feature extraction. Same
    * `mapPartitions` batching as `decodeMeta` (a real resampler inits
    * once per partition).
    *
    * Decodable images resample for REAL: deterministic nearest-neighbor
    * pixel picks (src x = dst x * w / nw, integer floor — no
    * platform-varying interpolation), re-encoded as BMP via the JDK
    * encoder, so the output decodes back to the exact predicted pixels
    * (round-tripped in MultimodalSpec). Non-image payloads keep the
    * documented stub (byte slice proportional to the area change).
    */
  def resize(
      spark: SparkSession, withPayload: DataFrame, maxDim: Int): Dataset[ResizedMedia] = {
    import spark.implicits._
    withPayload.select(col("doc_id"), col("payload")).as[BinRow]
      .mapPartitions { rows =>
        // real impl for audio/video: val resampler = Resampler.open()
        rows.map { r =>
          val decoded = decodeImage(r.payload)
          // ONE bounding-box rule for both kernels — a rounding tweak
          // edited in one arm but not the other would silently make
          // real-image and stub outputs disagree on dimensions
          val (w, h) = decoded.map(i => (i.getWidth, i.getHeight))
            .getOrElse { val (fw, fh, _) = fakeDecode(r.payload); (fw, fh) }
          val scale = math.min(1.0, maxDim.toDouble / math.max(w, h))
          val (nw, nh) =
            (math.max(1, (w * scale).toInt), math.max(1, (h * scale).toInt))
          decoded match {
            case Some(img) =>
              val out = new java.awt.image.BufferedImage(
                nw, nh, java.awt.image.BufferedImage.TYPE_INT_RGB)
              var y = 0
              while (y < nh) {
                var x = 0
                while (x < nw) {
                  out.setRGB(x, y, img.getRGB(x * w / nw, y * h / nh))
                  x += 1
                }
                y += 1
              }
              val baos = new java.io.ByteArrayOutputStream()
              javax.imageio.ImageIO.write(out, "bmp", baos)
              ResizedMedia(r.doc_id, nw, nh, baos.toByteArray)
            case None =>
              // stub kernel: keep bytes proportional to the area change
              val nBytes = math.max(1,
                (r.payload.length * (nw.toLong * nh) / math.max(1L, w.toLong * h)).toInt)
              ResizedMedia(r.doc_id, nw, nh, r.payload.take(nBytes))
          }
        }
      }
  }
}
