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
  * actual dimensions and luminance. AUDIO is real via
  * `javax.sound.sampled` ([[decodeAudio]]), and VIDEO is real via the
  * RIFF/AVI parser ([[decodeAviFrames]] — MJPEG through the JDK JPEG
  * codec, uncompressed DIB decoded exactly). Payloads outside those
  * codecs (text blobs, containers the JDK has no codec for — MP4/H.264
  * etc.) fall back to the documented deterministic stub, so those
  * kernels stay honestly stubbed while schema, batching, and plan
  * shape are shared with the real path. Swap the stub for an
  * ffmpeg/ONNX call and nothing else changes.
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
    withImageReader(payload) { reader =>
      // declared-dimensions bound BEFORE the raster allocates —
      // the decodeFrames guard applied to the single-frame path:
      // a crafted header claiming 40000×40000 would OOM inside
      // reader.read, and OutOfMemoryError is an Error the
      // NonFatal degradation cannot catch
      if (reader.getWidth(0).toLong * reader.getHeight(0) > MaxTotalPixels)
        None
      else Option(reader.read(0))
    }

  /** The ImageIO reader-protocol dance — stream open, reader lookup,
    * setInput flags, dispose/close ordering, NonFatal degradation —
    * in ONE place: three hand-maintained copies had already drifted in
    * their close-exception handling, and every future robustness fix
    * (a reader-leak guard, a new setInput flag) had to land three
    * times or silently miss a path. `body` returns None to degrade;
    * any NonFatal throw degrades identically.
    */
  private def withImageReader[A](payload: Array[Byte])(
      body: javax.imageio.ImageReader => Option[A]): Option[A] =
    try {
      val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
        new java.io.ByteArrayInputStream(payload))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (!readers.hasNext) None
        else {
          val reader = readers.next()
          try {
            reader.setInput(iis, false, true)
            body(reader)
          } finally reader.dispose()
        }
      } finally { try iis.close() catch { case _: java.io.IOException => () } }
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Dims-only header probe: declared (width, height) of frame 0
    * WITHOUT the full-stream `getNumImages(true)` marker scan
    * [[imageHeader]] pays — the per-chunk budget probe of an MJPEG AVI
    * needs only geometry, and re-scanning every chunk's whole payload
    * before decode even starts doubled the container's read cost.
    */
  private def imageDims(payload: Array[Byte]): Option[(Int, Int)] =
    withImageReader(payload)(r => Some((r.getWidth(0), r.getHeight(0))))

  /** Header-only probe: declared (width, height, n_frames) without
    * allocating any raster — what [[decodeMeta]] needs. n_frames comes
    * from the reader's full-scan count (`getNumImages(true)`), so an
    * animated GIF reports its REAL frame count here and agrees with
    * [[frameHashes]] — a hardcoded 1 made the two operators contradict
    * each other on the same corpus. Same NonFatal + no-reader fallback
    * contract as [[decodeImage]].
    */
  def imageHeader(payload: Array[Byte]): Option[(Int, Int, Int)] =
    try {
      if (isAvi(payload)) {
        // AVI branch: dims from the main header, frame count from the
        // located movi chunks (the header's dwTotalFrames word is
        // advisory — a writer that leaves it 0 must not read as a
        // 0-frame clip when real frame chunks exist). Header-only:
        // parseAvi never allocates a raster.
        parseAvi(payload).collect {
          case i if i.width > 0 && i.height > 0 &&
              (i.totalFrameChunks > 0 || i.declaredFrames > 0) =>
            (i.width, i.height,
              if (i.totalFrameChunks > 0) i.totalFrameChunks
              else i.declaredFrames)
        }
      } else withImageReader(payload) { reader =>
        Some((reader.getWidth(0), reader.getHeight(0),
          reader.getNumImages(true)))
      }
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
          // header-only: dimensions and the REAL frame count without
          // decoding a raster (an animated GIF reports its n frames,
          // agreeing with frameHashes)
          val (w, h, f) = imageHeader(r.payload)
            .getOrElse(fakeDecode(r.payload))
          MediaMeta(r.doc_id, r.payload.length, sha, w, h, f)
        }
      }
  }

  /** Frame sampling shape: explode n_frames into (doc_id, frame_idx)
    * rows — the layout a video pipeline feeds to a per-frame model.
    */
  def sampleFrames(meta: Dataset[MediaMeta], stride: Int): DataFrame = {
    // fail at plan time with an actionable message, not mid-scan with
    // sequence()'s obscure step-must-not-be-zero runtime error
    require(stride >= 1, s"stride must be >= 1, got $stride")
    meta.toDF().select(col("doc_id"),
      explode(sequence(lit(0), col("n_frames") - 1, lit(stride))).as("frame_idx"))
  }

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

  /** The dHash bit rule over 64 brightness cells: bit j = "cell j at
    * least as bright as cell j+1", 63 bits. One definition shared by
    * the whole-payload and per-frame hash paths.
    */
  private def dHash63(cells: Array[Int]): Long = {
    var h = 0L
    var j = 0
    while (j < 63) {
      if (cells(j) >= cells(j + 1)) h |= (1L << j)
      j += 1
    }
    h
  }

  /** Real MULTI-frame decode — the [[decodeImage]] upgrade for
    * animated/video containers. Two real paths: AVI (RIFF container
    * parsed by [[decodeAviFrames]] — MJPEG chunks through the JDK's
    * JPEG codec, uncompressed-DIB chunks decoded exactly; a true VIDEO
    * container end to end) and the ImageIO reader protocol for
    * everything ImageIO claims (animated GIF — the one multi-frame
    * codec the JDK ships — plus single-frame formats returning one
    * frame; GIF fixtures use full-size frames with no transparency, so
    * per-frame reads need no compositing). Payloads neither path
    * claims, that any frame read trips on, or that declare more than
    * [[MaxFrames]] frames (all frames materialize in memory here — a
    * crafted 100k-frame blob must degrade to the stub, not OOM the
    * executor) return None (NonFatal — the decodeImage robustness
    * contract).
    */
  val MaxFrames = 1024

  /** Total decoded pixels a single payload may materialize (all frames
    * live at once in the returned Vector): a declared-dimensions bound
    * checked BEFORE any raster allocates, because a crafted header
    * claiming 30000×30000 frames would OOM on `reader.read` — and
    * OutOfMemoryError is an Error, which the NonFatal degradation
    * cannot catch. 64M pixels ≈ 256 MB of ARGB rasters.
    */
  val MaxTotalPixels = 64L * 1024 * 1024

  def decodeFrames(
      payload: Array[Byte]): Option[Vector[java.awt.image.BufferedImage]] =
    try {
      if (isAvi(payload)) decodeAviFrames(payload)
      else withImageReader(payload) { reader =>
        val n = reader.getNumImages(true)
        val declaredPixels =
          if (n < 1 || n > MaxFrames) Long.MaxValue
          else (0 until n).iterator
            .map(i => reader.getWidth(i).toLong * reader.getHeight(i))
            .sum
        if (declaredPixels > MaxTotalPixels) None
        else Some((0 until n).map(reader.read).toVector)
      }
    } catch { case scala.util.control.NonFatal(_) => None }

  /** RIFF/AVI container magic: "RIFF" <size> "AVI ". */
  private[multimodal] def isAvi(p: Array[Byte]): Boolean =
    p.length >= 12 &&
      p(0) == 'R' && p(1) == 'I' && p(2) == 'F' && p(3) == 'F' &&
      p(8) == 'A' && p(9) == 'V' && p(10) == 'I' && p(11) == ' '

  private def leU32(p: Array[Byte], off: Int): Long =
    if (off < 0 || off + 4 > p.length) -1L
    else (p(off) & 0xffL) | ((p(off + 1) & 0xffL) << 8) |
      ((p(off + 2) & 0xffL) << 16) | ((p(off + 3) & 0xffL) << 24)

  private def leU16(p: Array[Byte], off: Int): Int =
    if (off < 0 || off + 2 > p.length) -1
    else (p(off) & 0xff) | ((p(off + 1) & 0xff) << 8)

  private def fourcc(p: Array[Byte], off: Int): String =
    if (off < 0 || off + 4 > p.length) ""
    else new String(p, off, 4, "US-ASCII")

  /** Everything the frame decoder needs from an AVI's headers plus the
    * located frame chunks: main-header dims + declared frame count,
    * the FIRST video stream's BITMAPINFOHEADER (compression, bit
    * depth, and its OWN signed dims — the authoritative raster
    * geometry; biHeight < 0 means top-down row order), that stream's
    * `NNdc`/`NNdb` chunks as (offset, length) capped at
    * [[MaxFrames]] + 1 entries, and the UNCAPPED chunk count (so the
    * header probe reports a real number without materializing a
    * tuple per chunk for a million-chunk bomb).
    */
  private case class AviInfo(
      width: Int, height: Int, declaredFrames: Int,
      biCompression: Long, biBitCount: Int,
      biWidth: Int, biHeight: Int,
      frameChunks: Vector[(Int, Int)], totalFrameChunks: Int)

  /** Defensive RIFF walk: every chunk size is bounds-checked against
    * its enclosing list (a crafted size cannot index past the payload
    * or loop forever — sizes strictly advance the cursor), list
    * recursion is depth-capped, the frame-chunk collection is capped
    * at [[MaxFrames]] + 1 tuples (a payload packed with millions of
    * tiny chunks must not allocate a boxed pair per chunk just to be
    * rejected — the count still accumulates as one Int), and a
    * malformed structure returns None rather than throwing (the
    * caller's NonFatal net stays a backstop, not the parser). Frame
    * chunks are pinned to the captured video stream's number — a
    * second stream's `01db` chunks must not be decoded with stream
    * 0's geometry nor counted into its frame sequence. Header-only by
    * construction: nothing here allocates a raster, so [[imageHeader]]
    * can share it.
    */
  private def parseAvi(p: Array[Byte]): Option[AviInfo] = {
    if (!isAvi(p)) return None
    var w = -1; var h = -1; var nf = -1
    var comp = -1L; var bits = -1
    var bw = -1; var bh = 0
    var lastStrh = ""
    var strhSeen = 0
    var vidStream = -1
    var nChunks = 0
    val frames = Vector.newBuilder[(String, Int, Int)] // (streamPrefix, off, len)
    def walk(start: Int, end: Int, depth: Int): Boolean = {
      if (depth > 8) return false
      var off = start
      while (off + 8 <= end) {
        val id = fourcc(p, off)
        val size = leU32(p, off + 4)
        if (size < 0 || size > end - off - 8) return false
        val ds = off + 8
        val sz = size.toInt
        id match {
          case "LIST" if sz >= 4 =>
            if (!walk(ds + 4, ds + sz, depth + 1)) return false
          case "avih" if sz >= 40 =>
            nf = leU32(p, ds + 16).toInt
            w = leU32(p, ds + 32).toInt
            h = leU32(p, ds + 36).toInt
          case "strh" if sz >= 4 =>
            lastStrh = fourcc(p, ds)
            strhSeen += 1
          case "strf" if sz >= 20 && comp == -1L && lastStrh == "vids" =>
            bw = leU32(p, ds + 4).toInt  // signed i32 by truncation
            bh = leU32(p, ds + 8).toInt
            bits = leU16(p, ds + 14)
            comp = leU32(p, ds + 16)
            vidStream = strhSeen - 1
          // Stream-number prefixes in NNdc/NNdb fourccs diverge by
          // muxer: avifil32's ToHex macros write HEX (stream 10 =
          // '0Adc'), ffmpeg writes DECIMAL ('10dc' for stream ten).
          // The raw two-char prefix is KEPT, not parsed to an int here
          // — the ambiguous '10' can only be resolved against the
          // captured video stream's index below, where both renderings
          // are tried.
          case other if other.length == 4 && other.take(2).forall(c =>
                c.isDigit || ('a' to 'f').contains(c.toLower))
              && (other.endsWith("dc") || other.endsWith("db")) =>
            nChunks += 1
            if (nChunks <= MaxFrames + 1)
              frames += ((other.take(2), ds, sz))
          case _ => ()
        }
        off = ds + sz + (sz & 1) // chunks pad to even
      }
      true
    }
    if (!walk(12, p.length, 0)) None
    else {
      // no vids strf captured (headerless MJPEG-style writers): default
      // to stream 0's chunks — the JPEG-magic branch needs no geometry
      val sNo = if (vidStream >= 0) vidStream else 0
      // Accept EITHER rendering of the captured stream's number:
      // decimal ("%02d", ffmpeg) or hex ("%02X", avifil32). For
      // indexes <= 9 the two coincide; past 9 whichever muxer wrote
      // the file matches its own rendering. The residual ambiguity —
      // a decimal-muxed stream 10 colliding with a hex-muxed stream 16
      // IN THE SAME FILE — is unresolvable from the fourcc alone and
      // vanishingly rare (two muxers don't write one file); chunk
      // geometry checks downstream still reject mis-pinned rasters.
      val decId = f"$sNo%02d"
      val hexId = f"$sNo%02X"
      val mine = frames.result().collect {
        case (s, o, l) if s == decId || s.equalsIgnoreCase(hexId) => (o, l)
      }
      // nChunks counted ALL streams; past the collection cap the
      // per-stream split is unknowable without the tuples, so report
      // the conservative total (only ever used to REJECT at > MaxFrames
      // and as the header probe's count)
      val total = if (nChunks <= MaxFrames + 1) mine.length else nChunks
      Some(AviInfo(w, h, nf, comp, bits, bw, bh, mine, total))
    }
  }

  /** Real VIDEO-container decode: MJPEG-in-AVI (each `00dc` chunk is a
    * JFIF JPEG the JDK's ImageIO decodes — the JPEG codec ships with
    * the JDK even though no AVI *reader* does) and uncompressed
    * DIB-in-AVI (`00db` chunks of bottom-up, 4-byte-row-padded BGR24 —
    * decoded here exactly, the BMP raster rule). This retires the
    * video branch of the multimodal stub: a video pipeline's
    * frame-sampling path now runs REAL container parsing + REAL frame
    * decode end to end ([[frameHashes]], `q_media_frames_avi`).
    *
    * Budgets before any raster allocates, like [[decodeFrames]]'s
    * ImageIO path: frame COUNT from the located chunks (never the
    * header's word alone) against [[MaxFrames]], total declared pixels
    * against [[MaxTotalPixels]]. Payloads outside the two supported
    * codecs (e.g. table-less MJPEG variants ImageIO rejects, or any
    * other fourcc) degrade to None — the stub fallback, never an
    * error.
    */
  private[multimodal] def decodeAviFrames(
      p: Array[Byte]): Option[Vector[java.awt.image.BufferedImage]] =
    parseAvi(p).flatMap { info =>
      val n = info.frameChunks.length
      if (n < 1 || info.totalFrameChunks > MaxFrames) None
      else if (info.width <= 0 || info.height <= 0) None
      else {
        // Cumulative declared-pixel budget summed from each FRAME's own
        // authoritative header — the strf geometry for DIB rasters, the
        // JPEG chunk's header for MJPEG. Trusting avih alone let a
        // 16x16 container smuggle 1024 JPEGs each declaring 64M pixels:
        // every chunk passed decodeImage's PER-frame cap exactly while
        // the vector accumulated ~256 GB of rasters — the OOM class
        // this budget exists to refuse before anything allocates.
        var declared = 0L
        var ok = true
        val it0 = info.frameChunks.iterator
        while (ok && it0.hasNext) {
          val (off, len) = it0.next()
          declaredFrameDims(p, off, len, info) match {
            case Some((fw, fh)) if fw > 0 && fh > 0 =>
              declared += fw.toLong * fh
            case _ => ok = false
          }
        }
        if (!ok || declared > MaxTotalPixels) None
        else {
          // short-circuit: the first undecodable frame abandons the
          // payload (all-or-nothing — a half-decoded clip would
          // mislabel frame_idx — but the remaining 1023 frames must
          // not pay full decode just to be thrown away)
          val out = Vector.newBuilder[java.awt.image.BufferedImage]
          var good = true
          val it = info.frameChunks.iterator
          while (good && it.hasNext) {
            val (off, len) = it.next()
            decodeAviFrame(p, off, len, info) match {
              case Some(img) => out += img
              case None => good = false
            }
          }
          if (good) Some(out.result()) else None
        }
      }
    }

  /** Header-declared (width, height) of one frame chunk — no raster
    * allocates. JPEG chunks answer from their own JFIF header via the
    * ImageIO reader protocol; raw-DIB chunks answer from the stream's
    * strf geometry, REQUIRED to agree with the container's avih dims
    * (a mismatch means one of the two headers lies — degrade, don't
    * pick one and silently hash misaligned rows).
    */
  /** Frame-chunk classification — the SINGLE definition the pixel
    * budget ([[declaredFrameDims]]) and the decoder ([[decodeAviFrame]])
    * both branch on. Duplicated predicates let the two drift: a fix to
    * one arm (accepting 32-bit DIBs, tightening the avih-agreement
    * rule) would make the budget admit frames the decoder rejects — or
    * vice versa — silently flipping whole payloads between decoded and
    * stubbed.
    */
  private def isJpegChunk(p: Array[Byte], off: Int, len: Int): Boolean =
    len >= 2 && (p(off) & 0xff) == 0xff && (p(off + 1) & 0xff) == 0xd8

  /** The raw-DIB acceptance rule: uncompressed 24-bit with the strf
    * geometry AGREEING with avih (a mismatch means one of the two
    * headers lies — degrade, never pick a side and hash misaligned
    * rows). */
  private def isRawDib(info: AviInfo): Boolean =
    info.biCompression == 0L && info.biBitCount == 24 &&
      info.biWidth == info.width &&
      math.abs(info.biHeight) == info.height

  private def declaredFrameDims(
      p: Array[Byte], off: Int, len: Int,
      info: AviInfo): Option[(Int, Int)] = {
    if (isJpegChunk(p, off, len))
      // dims-only probe: the budget needs geometry, not the frame
      // count — imageHeader's getNumImages(true) marker-scans the
      // whole chunk, which doubled the container's read cost before
      // decode even started
      imageDims(java.util.Arrays.copyOfRange(p, off, off + len))
    else if (isRawDib(info))
      Some((info.biWidth, math.abs(info.biHeight)))
    else None
  }

  private def decodeAviFrame(
      p: Array[Byte], off: Int, len: Int,
      info: AviInfo): Option[java.awt.image.BufferedImage] = {
    if (isJpegChunk(p, off, len))
      // ImageIO path reuses decodeImage's own per-frame guards
      decodeImage(java.util.Arrays.copyOfRange(p, off, off + len))
    else if (isRawDib(info)) {
      // raster geometry from the stream's OWN BITMAPINFOHEADER:
      // biHeight < 0 is the standard top-down convention (capture
      // tools write it) — rows then run first-to-last instead of the
      // default bottom-up order
      val w = info.biWidth
      val h = math.abs(info.biHeight)
      val topDown = info.biHeight < 0
      val stride = ((w * 3 + 3) / 4) * 4
      if (stride.toLong * h > len) None
      else {
        val img = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < h) {
          val srcRow = if (topDown) y else h - 1 - y
          val row = off + srcRow * stride
          var x = 0
          while (x < w) {
            val b = p(row + x * 3) & 0xff
            val g = p(row + x * 3 + 1) & 0xff
            val r = p(row + x * 3 + 2) & 0xff
            img.setRGB(x, y, (r << 16) | (g << 8) | b)
            x += 1
          }
          y += 1
        }
        Some(img)
      }
    } else None
  }

  /** One perceptual hash PER DECODED FRAME ([[frameHashes]]). */
  case class FrameHash(
      doc_id: Long, frame_idx: Int, n_frames: Int, phash: Long)

  /** Per-frame perceptual hashing: the frame-sampling path run over
    * REAL multi-frame decode ([[decodeFrames]]) — each frame's 64
    * integer luminance cells ([[imageCells]]) hash independently, so
    * near-dup mining can match clips frame-by-frame (shot-level
    * dedup) instead of collapsing a clip to one bit pattern. Same
    * `mapPartitions` batching as [[decodeMeta]].
    *
    * Payloads [[decodeFrames]] rejects (or whose frames are smaller
    * than the 8x8 cell grid) emit ONE stub row — frame_idx 0, the same
    * md5 brightness stand-in [[perceptualHash]] uses, and n_frames
    * from [[imageHeader]] when the container header is still readable
    * (1 otherwise) so this operator and [[decodeMeta]] agree on frame
    * counts for rejected-but-readable containers. A mixed corpus
    * degrades per-row, never aborts, and the stub stays bit-compatible
    * with the whole-payload hash path.
    */
  def frameHashes(
      spark: SparkSession, withPayload: DataFrame): Dataset[FrameHash] = {
    import spark.implicits._
    withPayload.select(col("doc_id"), col("payload")).as[BinRow]
      .mapPartitions { rows =>
        val digest = java.security.MessageDigest.getInstance("MD5")
        rows.flatMap { r =>
          val decoded = decodeFrames(r.payload)
          decoded.filter(fs => fs.nonEmpty &&
            fs.forall(f => f.getWidth >= 8 && f.getHeight >= 8)) match {
            case Some(frames) =>
              frames.zipWithIndex.map { case (f, i) =>
                FrameHash(r.doc_id, i, frames.length, dHash63(imageCells(f)))
              }
            case None =>
              val cells = stubCells(digest, r.payload)
              // n_frames must agree with decodeMeta for rejected-but-
              // readable containers (a hardcoded 1 re-created the
              // cross-operator contradiction imageHeader's docstring
              // records). Decoded-but-sub-8x8 payloads already carry
              // their count — reuse it; only budget-rejected ones
              // (where decodeFrames stopped at the declared-size
              // probe) pay imageHeader's block scan. frame_idx stays
              // 0 with the md5 stub hash.
              val nf = decoded.map(_.length).filter(_ > 0)
                .orElse(imageHeader(r.payload).map(_._3)).getOrElse(1)
              Seq(FrameHash(r.doc_id, 0, nf, dHash63(cells)))
          }
        }
      }
  }

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
            .getOrElse(stubCells(digest, r.payload))
          MediaHash(r.doc_id, dHash63(cells))
        }
      }
  }

  /** The md5 brightness stand-in for undecodable payloads — 64 cells
    * of (first md5 byte of payload ++ "_p<j>") — in ONE definition:
    * [[frameHashes]]' stub row must stay bit-compatible with
    * [[perceptualHash]]'s whole-payload path (a stated invariant), and
    * two literal copies kept that true only by hand — a salt or
    * byte-index tweak applied to one would silently desync frame-level
    * and whole-payload hashes for every stubbed row. DuckDB rebuilds
    * the same cells, which is what upgrades the stub from filler to a
    * replayable oracle value.
    */
  private def stubCells(
      digest: java.security.MessageDigest, payload: Array[Byte]): Array[Int] =
    Array.tabulate(64) { j =>
      digest.reset()
      digest.update(payload)
      digest.update(s"_p$j".getBytes("UTF-8"))
      digest.digest()(0) & 0xff
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

  /** Decoded PCM audio: format metadata plus ALL interleaved 16-bit
    * samples as Int.
    */
  case class DecodedAudio(
      sampleRate: Int, channels: Int, samples: Array[Int])

  /** Real audio decode through the JDK's public `javax.sound.sampled`
    * registry (WAV/AIFF/AU PCM readers ship with the JDK —
    * zero-egress, the [[decodeImage]] parallel). Only canonical
    * 16-bit signed PCM is accepted; anything else — unclaimed
    * payloads, truncated streams, other encodings — returns None and
    * routes to the deterministic stub, so one bad blob degrades
    * instead of aborting a 100 TB scan (NonFatal, the decodeImage
    * lesson: format readers throw RuntimeExceptions on malformed
    * headers).
    */
  /** Largest audio payload decoded in place: the sample array is a 2×
    * byte-size amplification held per row (and OutOfMemoryError would
    * escape the NonFatal degradation), so oversized blobs route to the
    * stub the way oversized frame rasters do in [[decodeFrames]].
    * 64 MiB of 16-bit PCM ≈ 32M samples ≈ 128 MB as Int.
    */
  val MaxAudioBytes: Int = 64 * 1024 * 1024

  def decodeAudio(payload: Array[Byte]): Option[DecodedAudio] =
    if (payload.length > MaxAudioBytes) None
    else try {
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(payload))
      try {
        val f = ais.getFormat
        // sample-rate gate: the WAV fmt rate field is a raw uint32 the
        // JDK reader passes through unvalidated — a corrupted header
        // yields 0, a NaN-ish float, or (via float→int overflow) a
        // NEGATIVE rate, which downstream duration math divides by
        // (found by the header-stomp fuzz sweep). 8 Hz .. 10 MHz
        // brackets every real format (DSD tops out ~2.8 MHz).
        val rate = f.getSampleRate
        if (f.getEncoding !=
            javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED ||
            f.getSampleSizeInBits != 16 || f.getChannels < 1 ||
            !(rate >= 8f && rate <= 1e7f)) None
        else {
          val bytes = ais.readAllBytes()
          val n = bytes.length / 2
          val samples = Array.tabulate(n) { i =>
            if (f.isBigEndian) (bytes(2 * i) << 8) | (bytes(2 * i + 1) & 0xff)
            else (bytes(2 * i + 1) << 8) | (bytes(2 * i) & 0xff)
          }
          Some(DecodedAudio(f.getSampleRate.toInt, f.getChannels, samples))
        }
      } finally ais.close()
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Floor integer square root (Newton-corrected double seed) — equal
    * to python's math.isqrt for every non-negative Long, so the
    * fixture generator's independent replay matches bit-for-bit.
    */
  private[graft] def isqrt(n: Long): Long = {
    require(n >= 0, s"isqrt of negative $n")
    // correction compares via division: x*x > n ⟺ x > n/x for x > 0
    // (and (x+1)² <= n ⟺ x+1 <= n/(x+1)) — x*x itself overflows Long
    // for n near Long.MaxValue and would wrap negative, stalling the
    // loop for ~2e9 iterations before returning a wrong root
    var x = math.sqrt(n.toDouble).toLong
    while (x > 0 && x > n / x) x -= 1
    while (x + 1 <= n / (x + 1)) x += 1
    x
  }

  /** Per-payload audio profile row ([[audioProfile]]). */
  case class AudioProfile(
      doc_id: Long, sample_rate: Int, channels: Int, n_frames: Long,
      duration_ms: Long, peak: Int, rms: Long, zero_crossings: Long,
      decoded: Boolean)

  /** Batch audio profiling: payload → (format, duration, loudness,
    * zero-crossing rate) in one `mapPartitions` pass — the audio
    * analogue of [[decodeMeta]]+[[perceptualHash]], and the
    * filter-signal source an audio-training pipeline gates on
    * (silence/clipping detection, duration histograms). ALL-integer
    * arithmetic over real decoded samples:
    *
    *  - n_frames = interleaved samples / channels;
    *    duration_ms = n_frames * 1000 / sample_rate (integer div)
    *  - peak = max |s| over ALL interleaved samples
    *  - rms = isqrt(Σ s² / n_samples) — integer floor sqrt, so the
    *    fixture generator's python replay (math.isqrt) is exact
    *  - zero_crossings counts sign flips over CHANNEL 0 only
    *    ((prev < 0) != (cur < 0): a 0-sample counts as non-negative)
    *
    * Payloads [[decodeAudio]] rejects keep a deterministic md5 stub
    * (decoded = false): rate 8000 / 1 channel / n_frames = byte
    * length; peak = first-two-md5-bytes of payload ++ "_au" mod
    * 32768, rms = peak/2, crossings = n_frames/4 — every value
    * replayable by an external engine, mirroring [[fakeDecode]].
    */
  def audioProfile(
      spark: SparkSession, withPayload: DataFrame): Dataset[AudioProfile] = {
    import spark.implicits._
    withPayload.select(col("doc_id"), col("payload")).as[BinRow]
      .mapPartitions { rows =>
        val digest = java.security.MessageDigest.getInstance("MD5")
        rows.map { r =>
          decodeAudio(r.payload) match {
            case Some(a) if a.samples.nonEmpty && a.sampleRate > 0 =>
              val nFrames = a.samples.length.toLong / a.channels
              var peak = 0
              var sumSq = 0L
              var i = 0
              while (i < a.samples.length) {
                val s = a.samples(i)
                val abs = if (s < 0) -s else s
                if (abs > peak) peak = abs
                sumSq += s.toLong * s
                i += 1
              }
              var zc = 0L
              var j = a.channels
              while (j < a.samples.length) {
                if ((a.samples(j - a.channels) < 0) != (a.samples(j) < 0)) zc += 1
                j += a.channels
              }
              AudioProfile(r.doc_id, a.sampleRate, a.channels, nFrames,
                nFrames * 1000L / a.sampleRate, peak,
                isqrt(sumSq / a.samples.length), zc, decoded = true)
            case _ =>
              digest.reset()
              digest.update(r.payload)
              digest.update("_au".getBytes("UTF-8"))
              val h = digest.digest()
              val peak = (((h(0) & 0xff) << 8) | (h(1) & 0xff)) % 32768
              val nFrames = r.payload.length.toLong
              AudioProfile(r.doc_id, 8000, 1, nFrames,
                nFrames * 1000L / 8000L, peak, peak / 2L, nFrames / 4L,
                decoded = false)
          }
        }
      }
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
    // a zero/negative box (typo'd config) would silently degrade the
    // whole corpus to 1x1 — fail at plan time with an actionable
    // message, not mid-scan (the sampleFrames stride convention)
    require(maxDim >= 1, s"maxDim must be >= 1, got $maxDim")
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
          // stub kernel: keep bytes proportional to the area change
          def stubResize(): ResizedMedia = {
            val nBytes = math.max(1,
              (r.payload.length * (nw.toLong * nh) / math.max(1L, w.toLong * h)).toInt)
            ResizedMedia(r.doc_id, nw, nh, r.payload.take(nBytes))
          }
          decoded match {
            case Some(img) =>
              // resample under the same degrade-per-row contract as
              // decodeImage: a payload that decodes but trips the
              // kernel (encoder failure, pathological geometry) falls
              // back to the stub instead of aborting the scan
              try {
                val out = new java.awt.image.BufferedImage(
                  nw, nh, java.awt.image.BufferedImage.TYPE_INT_RGB)
                var y = 0
                while (y < nh) {
                  // source indices in Long: an extreme-aspect image
                  // inside the total-pixel bound (e.g. 16777216x4 at
                  // maxDim 256) overflows x*w in Int and getRGB throws
                  val sy = (y.toLong * h / nh).toInt
                  var x = 0
                  while (x < nw) {
                    out.setRGB(x, y, img.getRGB((x.toLong * w / nw).toInt, sy))
                    x += 1
                  }
                  y += 1
                }
                val baos = new java.io.ByteArrayOutputStream()
                javax.imageio.ImageIO.write(out, "bmp", baos)
                ResizedMedia(r.doc_id, nw, nh, baos.toByteArray)
              } catch {
                case scala.util.control.NonFatal(_) => stubResize()
              }
            case None => stubResize()
          }
        }
      }
  }
}
