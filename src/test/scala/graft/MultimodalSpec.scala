package graft

import org.apache.spark.sql.functions._

import graft.multimodal.Multimodal

/** Multimodal plumbing: binary columns, mapPartitions batch decode,
  * frame-sampling explode. The decode kernel is the documented
  * deterministic stub; what's under test is the Spark-side contract.
  */
class MultimodalSpec extends SparkTestBase {
  import spark.implicits._

  private val docs = Seq(
    (1L, "hello world"),
    (2L, "a much longer document body with many more bytes in it"),
    (3L, "x")
  ).toDF("doc_id", "text")

  test("withBinaryPayload produces a binary column of the utf-8 bytes") {
    val df = Multimodal.withBinaryPayload(docs)
    assert(df.schema("payload").dataType.typeName === "binary")
    val r = rows(df.filter(col("doc_id") === 1L)).head
    assert(new String(r.getAs[Array[Byte]]("payload"), "UTF-8") === "hello world")
  }

  test("decodeMeta: one metadata row per payload, deterministic dims, real sha256") {
    val meta = Multimodal.decodeMeta(spark, Multimodal.withBinaryPayload(docs))
    val m = meta.collect().map(x => x.doc_id -> x).toMap
    assert(m.size === 3)
    assert(m(1L).n_bytes === 11)
    assert(m(1L).width === 64 + 11 % 512 && m(1L).n_frames === 1 + 11 % 16)
    // sha256 of "hello world" (well-known digest)
    assert(m(1L).sha256_hex ===
      "b94d27b9934d3e08a52e52d7da7dabfac484efe37a5380ee9088f7ace2efcde9")
  }

  test("resize fits the bounding box, preserves aspect, scales bytes with area") {
    val out = Multimodal.resize(spark, Multimodal.withBinaryPayload(docs), maxDim = 64)
      .collect().map(r => r.doc_id -> r).toMap
    assert(out.size === 3)
    docs.collect().foreach { d =>
      val n = d.getString(1).getBytes("UTF-8").length
      val (w, h, _) = Multimodal.fakeDecode(d.getString(1).getBytes("UTF-8"))
      val r = out(d.getLong(0))
      assert(math.max(r.width, r.height) <= 64) // fits the box either way
      assert(r.width <= w && r.height <= h)     // never upscales
      assert(r.payload.length ===
        math.max(1, (n.toLong * r.width * r.height / (w.toLong * h)).toInt))
    }
    // payload is a prefix of the original bytes (stub kernel contract)
    val one = out(1L)
    assert(new String(one.payload, "UTF-8") ===
      "hello world".take(one.payload.length))
  }

  test("sampleFrames explodes stride-sampled frame indices") {
    val meta = Multimodal.decodeMeta(spark, Multimodal.withBinaryPayload(docs))
    val frames = Multimodal.sampleFrames(meta, stride = 4)
    val byDoc = rows(frames).groupBy(_.getLong(0)).view
      .mapValues(_.map(_.getInt(1)).sorted).toMap
    assert(byDoc(1L) === Seq(0, 4, 8)) // n_frames = 12 -> 0,4,8
    assert(byDoc(3L) === Seq(0))       // n_frames = 2  -> 0
  }

  test("extractFeatures: fixed-dim unit-range vectors, deterministic, ANN-composable") {
    import org.apache.spark.sql.functions.col
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val feats = Multimodal.extractFeatures(
      spark, Multimodal.withBinaryPayload(docs), dim = 8).toDF()
    val rowsA = feats.collect().map(r =>
      r.getLong(0) -> r.getSeq[Float](1).toSeq).toMap
    assert(rowsA.nonEmpty && rowsA.values.forall(v =>
      v.length == 8 && v.forall(x => x >= 0.0f && x < 1.0f)))
    // pure function of the payload: identical under repartitioning
    val rowsB = Multimodal.extractFeatures(
      spark, Multimodal.withBinaryPayload(docs.repartition(7)), dim = 8)
      .toDF().collect().map(r => r.getLong(0) -> r.getSeq[Float](1).toSeq).toMap
    assert(rowsB === rowsA)
    // the output conforms to the embedding contract: feed it straight
    // into the similarity tier (multimodal -> embedding -> ANN)
    val corpus = feats.select(col("doc_id").as("id"), col("features").as("vec"))
    val probes = corpus.filter(col("id") < 2)
      .select(col("id").as("probe_id"), col("vec"))
    val nn = graft.operators.Similarity.bruteForceTopK(corpus, probes, 5)
    val counts = nn.groupBy(col("probe_id")).count().collect()
    assert(counts.length === 2 && counts.forall(_.getLong(1) === 5L))
  }
  test("perceptualHash is 63-bit deterministic; duplicates pair at hamming 0") {
    import spark.implicits._
    val docs = Seq((1L, "alpha beta"), (2L, "alpha beta"), (3L, "gamma"),
      (4L, "delta epsilon zeta")).toDF("doc_id", "text")
    val h = rows(Multimodal.perceptualHash(
      spark, Multimodal.withBinaryPayload(docs)).toDF().orderBy(col("doc_id")))
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(h.forall(_._2 >= 0L))            // bit 63 never set
    assert(h(0)._2 === h(1)._2)             // same payload, same hash
    assert(h(0)._2 !== h(2)._2)
    val again = rows(Multimodal.perceptualHash(
      spark, Multimodal.withBinaryPayload(docs.repartition(3))).toDF()
      .orderBy(col("doc_id"))).map(r => (r.getLong(0), r.getLong(1)))
    assert(again === h)                     // layout-independent
    val pairs = rows(Multimodal.nearDuplicateMedia(
      spark, Multimodal.withBinaryPayload(docs), maxHamming = 3))
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(pairs === Seq((1L, 2L, 0)))      // only the true duplicate pair
  }

  // -- real-pixel image path (committed BMP fixtures) -----------------

  private def fixtureImages = {
    import spark.implicits._
    new java.io.File("/root/repo/fixtures/media_img").listFiles()
      .filter(_.getName.endsWith(".bmp")).sortBy(_.getName)
      .map { f =>
        (f.getName.replaceAll("\\D", "").toLong,
          java.nio.file.Files.readAllBytes(f.toPath))
      }.toSeq.toDF("doc_id", "payload")
  }

  test("decodeMeta reads REAL dimensions for decodable images") {
    val m = Multimodal.decodeMeta(spark, fixtureImages)
      .collect().map(x => x.doc_id -> x).toMap
    assert(m.size === 5)
    m.values.foreach { x =>
      assert(x.width === 24 && x.height === 16 && x.n_frames === 1)
    }
  }

  test("perceptualHash on real pixels: brightness shift invariant, tweak flips one bit") {
    val h = Multimodal.perceptualHash(spark, fixtureImages)
      .collect().map(x => x.doc_id -> x.phash).toMap
    assert(h(0L) === h(1L))                                // +6 uniform: same order
    assert(java.lang.Long.bitCount(h(0L) ^ h(2L)) === 1)   // local tweak: 1 bit
    assert(java.lang.Long.bitCount(h(0L) ^ h(3L)) > 3)     // checkerboard: far
    // pinned against the independent pure-python BMP decoder's values
    assert(h(0L) === 36170086419038336L)
    assert(h(3L) === 3086560954303228629L)
  }

  test("nearDuplicateMedia over real pixels finds exactly the planted pairs") {
    val pairs = rows(Multimodal.nearDuplicateMedia(spark, fixtureImages, maxHamming = 3)
      .orderBy(col("doc_a"), col("doc_b")))
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(pairs === Seq((0L, 1L, 0), (0L, 2L, 1), (1L, 2L, 1)))
  }

  test("resize on a real image: nearest-neighbor pixels, BMP round-trip") {
    val out = Multimodal.resize(spark, fixtureImages, maxDim = 12)
      .collect().map(r => r.doc_id -> r).toMap
    val r0 = out(0L)
    assert(r0.width === 12 && r0.height === 8) // 24x16 halved into the box
    val back = Multimodal.decodeImage(r0.payload).get
    assert(back.getWidth === 12 && back.getHeight === 8)
    val orig = Multimodal.decodeImage(
      java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get("/root/repo/fixtures/media_img/img_000.bmp"))).get
    // every output pixel is the exact nearest-neighbor source pick
    for (y <- 0 until 8; x <- 0 until 12)
      assert((back.getRGB(x, y) & 0xffffff) ===
        (orig.getRGB(x * 24 / 12, y * 16 / 8) & 0xffffff))
  }

  test("resize: extreme-aspect image inside the pixel budget resamples for real") {
    import spark.implicits._
    // 8500000x4 = 34M px, admitted by the 64M MaxTotalPixels bound, but
    // dst x=255 picks source column 255*8500000/256 — Int arithmetic
    // wraps negative there (255*8500000 > Int.MaxValue), getRGB throws,
    // and the NonFatal fallback would hand back the STUB slice instead
    // of a decodable 256x1 BMP. Long source indices keep it real.
    val w = 8500000; val h = 4
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val g = img.createGraphics()
    try {
      g.setColor(java.awt.Color.BLACK); g.fillRect(0, 0, w, h)
      g.setColor(java.awt.Color.WHITE)
      // dst col 255's source band — Long math (the very overflow under test)
      g.fillRect((255L * w / 256).toInt, 0, w / 256 + 1, h)
    } finally g.dispose()
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "bmp", baos)
    val out = Multimodal.resize(spark,
        Seq((1L, baos.toByteArray)).toDF("doc_id", "payload"), maxDim = 256)
      .collect().head
    assert(out.width === 256 && out.height === 1)
    val back = Multimodal.decodeImage(out.payload)
      .getOrElse(fail("resize fell back to the stub — real resample aborted"))
    assert(back.getWidth === 256 && back.getHeight === 1)
    assert((back.getRGB(255, 0) & 0xffffff) === 0xffffff) // marker survived
    assert((back.getRGB(0, 0) & 0xffffff) === 0x000000)
  }

  test("frameHashes stub agrees with decodeMeta on rejected-but-readable frame counts") {
    import spark.implicits._
    // hand-built GIF89a declaring TWO 60000x60000 frames: the header is
    // readable (n_frames=2 without allocating a raster) but decodeFrames
    // refuses the pixel budget — the stub row must report the REAL frame
    // count, not a hardcoded 1 contradicting decodeMeta on the same blob
    def u16(v: Int) = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
    val frame = Array[Byte](0x2c) ++ u16(0) ++ u16(0) ++
      u16(60000) ++ u16(60000) ++
      Array[Byte](0x00, 0x02, 0x02, 0x4c, 0x01, 0x00)
    val gif2 = "GIF89a".getBytes("US-ASCII") ++
      u16(60000) ++ u16(60000) ++ Array[Byte](0x00, 0, 0) ++
      frame ++ frame ++ Array[Byte](0x3b)
    assert(Multimodal.imageHeader(gif2).map(_._3) === Some(2))
    assert(Multimodal.decodeFrames(gif2).isEmpty)
    val df = Seq((1L, gif2)).toDF("doc_id", "payload")
    val fh = Multimodal.frameHashes(spark, df).collect()
    assert(fh.length === 1 && fh.head.frame_idx === 0)
    assert(fh.head.n_frames === 2)
    assert(Multimodal.decodeMeta(spark, df).collect().head.n_frames === 2)
  }

  test("non-image payloads still take the deterministic stub path") {
    // text bytes decode via no ImageIO reader -> md5 stub (unchanged
    // from the pre-image-path behavior pinned by q_media_phash)
    assert(Multimodal.decodeImage("not an image".getBytes("UTF-8")).isEmpty)
    val h = Multimodal.perceptualHash(spark, Multimodal.withBinaryPayload(docs))
      .collect()
    assert(h.length === 3) // and decodeMeta's stub dims asserted above
  }

  test("decodeAudio reads REAL PCM samples from a committed WAV fixture") {
    val payload = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("/root/repo/fixtures/media_audio/au_000.wav"))
    val a = Multimodal.decodeAudio(payload).get
    assert(a.sampleRate === 8000 && a.channels === 1)
    assert(a.samples.length === 800)
    // square wave, period 20, amp 12000: first half-period positive
    assert(a.samples.take(10).forall(_ === 12000))
    assert(a.samples.slice(10, 20).forall(_ === -12000))
    // garbage and truncated payloads degrade, never throw
    assert(Multimodal.decodeAudio("not audio".getBytes("UTF-8")).isEmpty)
    assert(Multimodal.decodeAudio(payload.take(30)).isEmpty)
  }

  test("WAV sample-rate gate: exact boundary values accept/reject (8 Hz .. 10 MHz)") {
    // minimal canonical 44-byte PCM WAV with a parametric fmt rate +
    // 4 16-bit samples — the r10 fuzz fix gated the raw uint32 rate
    // field; this pins the gate's exact edges.
    def wav(rate: Long): Array[Byte] = {
      def le32(v: Long) = Array[Byte](
        (v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
        ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
      def le16(v: Int) = Array[Byte]((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
      val data = Array[Byte](0, 1, 0, 2, 0, 3, 0, 4)
      val fmt = le16(1) ++ le16(1) ++ le32(rate) ++ le32(rate * 2) ++
        le16(2) ++ le16(16)
      val body = "WAVE".getBytes("US-ASCII") ++
        "fmt ".getBytes("US-ASCII") ++ le32(16) ++ fmt ++
        "data".getBytes("US-ASCII") ++ le32(data.length.toLong) ++ data
      "RIFF".getBytes("US-ASCII") ++ le32(body.length.toLong) ++ body
    }
    assert(Multimodal.decodeAudio(wav(8L)).exists(_.sampleRate == 8),
      "8 Hz is the inclusive lower edge")
    assert(Multimodal.decodeAudio(wav(7L)).isEmpty, "7 Hz below the gate")
    assert(Multimodal.decodeAudio(wav(10000000L)).exists(_.sampleRate == 10000000),
      "10 MHz is the inclusive upper edge")
    // NOT 10_000_001: the gate compares the JDK's FLOAT rate, and
    // 10000001f rounds to exactly 1e7 (float spacing is 2 up here) —
    // 10000002 is the smallest representable value above the edge
    assert(Multimodal.decodeAudio(wav(10000002L)).isEmpty,
      "first representable rate above 10 MHz rejects")
    assert(Multimodal.decodeAudio(wav(0L)).isEmpty, "zero rate rejects")
    // full-uint32 rate: the float->int overflow shape the fuzz sweep
    // caught (reads as a huge/negative float) must reject, not crash
    assert(Multimodal.decodeAudio(wav(0xFFFFFFFFL)).isEmpty)
  }

  test("isqrt equals floor sqrt on exact squares, off-by-one bands, big longs") {
    val isqrtMax = 3037000499L // floor sqrt of Long.MaxValue
    for (n <- Seq(0L, 1L, 2L, 3L, 4L, 8L, 9L, 10L, 24L, 25L, 26L,
        (1L << 31) * (1L << 31) - 1, (1L << 31) * (1L << 31),
        // the x*x-overflow band a multiply-based correction wraps on
        isqrtMax * isqrtMax - 1, isqrtMax * isqrtMax,
        isqrtMax * isqrtMax + 1, Long.MaxValue)) {
      val r = Multimodal.isqrt(n)
      // division-form floor contract — (r+1)² itself overflows up here
      assert(r >= 0 && (r == 0 || r <= n / r) && (r + 1) > n / (r + 1),
        s"isqrt($n) = $r")
    }
    assert(Multimodal.isqrt(Long.MaxValue) === isqrtMax)
  }

  test("audioProfile: real WAVs profile decoded=true, stereo zc reads channel 0") {
    val fx = graft.sources.Sources
      .readBinaryFiles(spark, "/root/repo/fixtures/media_audio", glob = "*.wav")
      .select(
        regexp_extract(element_at(split(col("path"), "/"), -1), "au_(\\d+)", 1)
          .cast("long").as("doc_id"),
        col("content").as("payload"))
    val p = Multimodal.audioProfile(spark, fx).collect()
      .map(x => x.doc_id -> x).toMap
    assert(p.size === 5 && p.values.forall(_.decoded))
    // au_001 is au_000 at half amplitude: same zero crossings, half rms
    assert(p(0L).zero_crossings === p(1L).zero_crossings)
    assert(p(0L).rms === 12000L && p(1L).rms === 6000L)
    // silence: all-zero features
    assert(p(2L).peak === 0 && p(2L).rms === 0L && p(2L).zero_crossings === 0L)
    // stereo: n_frames halves the interleaved count; the constant-1000
    // right channel never flips sign, so zc counts the left sawtooth only
    assert(p(3L).channels === 2 && p(3L).n_frames === 600L)
    assert(p(3L).zero_crossings === 5L)
  }

  test("decodeFrames reads every GIF frame's REAL pixels") {
    val payload = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("/root/repo/fixtures/media_gif/vid_000.gif"))
    val frames = Multimodal.decodeFrames(payload).get
    assert(frames.length === 4)
    assert(frames.forall(f => f.getWidth === 16 && f.getHeight === 16))
    // frame 0: bright 8x8 block top-left (gray 224), background gray 32
    assert((frames(0).getRGB(0, 0) & 0xffffff) === 0xe0e0e0)
    assert((frames(0).getRGB(15, 15) & 0xffffff) === 0x202020)
    // frame 2: block at bottom-right
    assert((frames(2).getRGB(15, 15) & 0xffffff) === 0xe0e0e0)
    assert((frames(2).getRGB(0, 0) & 0xffffff) === 0x202020)
    // single-frame formats come back as one frame; garbage degrades
    val bmp = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("/root/repo/fixtures/media_img/img_000.bmp"))
    assert(Multimodal.decodeFrames(bmp).get.length === 1)
    assert(Multimodal.decodeFrames("not media".getBytes("UTF-8")).isEmpty)
  }

  // Minimal RIFF/AVI muxer mirroring fixtures/media_avi's python
  // writer: raw-DIB ('00db', BGR24 bottom-up) or arbitrary codec
  // chunks ('00dc'), so tests can assemble MJPEG and crafted-header
  // containers without committing more fixtures.
  private def le32(v: Long): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
  private def le16(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
  private def chunk(id: String, data: Array[Byte]): Array[Byte] =
    id.getBytes("US-ASCII") ++ le32(data.length.toLong) ++ data ++
      (if (data.length % 2 == 1) Array(0.toByte) else Array.empty[Byte])
  private def list(tpe: String, payload: Array[Byte]): Array[Byte] =
    chunk("LIST", tpe.getBytes("US-ASCII") ++ payload)
  private def buildAvi(
      w: Int, h: Int, declaredFrames: Int, handler: String,
      biCompression: Long, biBitCount: Int,
      frameChunks: Seq[(String, Array[Byte])],
      strfDims: Option[(Int, Int)] = None,
      secondVideoStream: Boolean = false): Array[Byte] = {
    val avih = le32(100000) ++ le32(0) ++ le32(0) ++ le32(0) ++
      le32(declaredFrames.toLong) ++ le32(0) ++ le32(1) ++ le32(0) ++
      le32(w.toLong) ++ le32(h.toLong) ++ Array.fill(16)(0.toByte)
    def strhOf(hd: String) =
      "vids".getBytes("US-ASCII") ++ hd.getBytes("US-ASCII") ++
        Array.fill(40)(0.toByte) ++ le16(0) ++ le16(0) ++ le16(w) ++ le16(h)
    val (bw, bh) = strfDims.getOrElse((w, h))
    val strf = le32(40) ++ le32(bw.toLong) ++ le32(bh.toLong) ++ le16(1) ++
      le16(biBitCount) ++ le32(biCompression) ++ Array.fill(20)(0.toByte)
    val strl0 = list("strl", chunk("strh", strhOf(handler)) ++ chunk("strf", strf))
    val strl1 =
      if (!secondVideoStream) Array.empty[Byte]
      else {
        val strf1 = le32(40) ++ le32(8L) ++ le32(8L) ++ le16(1) ++
          le16(24) ++ le32(0L) ++ Array.fill(20)(0.toByte)
        list("strl", chunk("strh", strhOf("DIB ")) ++ chunk("strf", strf1))
      }
    val hdrl = list("hdrl", chunk("avih", avih) ++ strl0 ++ strl1)
    val movi = list("movi",
      frameChunks.flatMap { case (id, d) => chunk(id, d) }.toArray)
    val payload = "AVI ".getBytes("US-ASCII") ++ hdrl ++ movi
    "RIFF".getBytes("US-ASCII") ++ le32(payload.length.toLong) ++ payload
  }

  test("decodeFrames reads every raw-DIB AVI frame's REAL pixels") {
    val payload = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("/root/repo/fixtures/media_avi/avi_000.avi"))
    val frames = Multimodal.decodeFrames(payload).get
    assert(frames.length === 3)
    assert(frames.forall(f => f.getWidth === 16 && f.getHeight === 16))
    // frame 0: bright block spans x 0-4, y 4-11 (r200 g220 b180) over
    // dark red (r90 g10 b20) — the generator's arrays, read back
    assert((frames(0).getRGB(0, 4) & 0xffffff) === 0xc8dcb4)
    assert((frames(0).getRGB(15, 15) & 0xffffff) === 0x5a0a14)
    // frame 2: block at the right edge
    assert((frames(2).getRGB(15, 4) & 0xffffff) === 0xc8dcb4)
    assert((frames(2).getRGB(0, 0) & 0xffffff) === 0x5a0a14)
    // header probe agrees without decoding
    assert(Multimodal.imageHeader(payload) === Some((16, 16, 3)))
  }

  test("MJPEG-in-AVI decodes through the JDK JPEG codec, bit-equal to the bare JPEG path") {
    // Encode two real frames as JPEG with the JDK's own writer, mux
    // them as 00dc chunks: decodeFrames must hand back frames whose
    // cells equal decodeImage's on the same JPEG bytes — one codec,
    // two container paths, no drift.
    def jpegOf(seed: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        16, 16, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 16; x <- 0 until 16)
        img.setRGB(x, y, if ((x + seed) % 16 < 8) 0xffffff else 0x000000)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", bos)
      bos.toByteArray
    }
    val (j0, j1) = (jpegOf(0), jpegOf(4))
    val avi = buildAvi(16, 16, 2, "MJPG", 0x47504a4dL, 24,
      Seq("00dc" -> j0, "00dc" -> j1))
    val frames = Multimodal.decodeFrames(avi).get
    assert(frames.length === 2)
    val bare = Seq(j0, j1).map(b =>
      Multimodal.imageCells(Multimodal.decodeImage(b).get).toSeq)
    val inAvi = frames.map(f => Multimodal.imageCells(f).toSeq)
    assert(inAvi === bare, "container path must not perturb decoded cells")
  }

  test("AVI guards: crafted-huge header, frame-count bomb, truncation all degrade") {
    // declared 30000x30000 single frame: 9e8 pixels > MaxTotalPixels —
    // must refuse BEFORE any raster allocates
    val huge = buildAvi(30000, 30000, 1, "DIB ", 0L, 24,
      Seq("00db" -> Array.fill(8)(0.toByte)))
    assert(Multimodal.decodeFrames(huge).isEmpty)
    // but the header probe still reads it (frameHashes' stub n_frames)
    assert(Multimodal.imageHeader(huge) === Some((30000, 30000, 1)))
    // MaxFrames+1 tiny chunks: refused by count, not decoded one by one
    val bomb = buildAvi(4, 4, 0, "DIB ", 0L, 24,
      (0 to Multimodal.MaxFrames).map(_ => "00db" -> Array.fill(2)(0.toByte)))
    assert(Multimodal.decodeFrames(bomb).isEmpty)
    // truncated mid-chunk and non-AVI RIFF: None, never a throw
    val good = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("/root/repo/fixtures/media_avi/avi_000.avi"))
    assert(Multimodal.decodeFrames(good.take(good.length / 2)).isEmpty)
    assert(Multimodal.decodeFrames("RIFFxxxxWAVE".getBytes("US-ASCII")).isEmpty)
    // a 00db chunk too short for the declared raster degrades the payload
    val short = buildAvi(16, 16, 1, "DIB ", 0L, 24,
      Seq("00db" -> Array.fill(10)(0.toByte)))
    assert(Multimodal.decodeFrames(short).isEmpty)
  }

  test("MJPEG cumulative budget: small container cannot smuggle huge per-frame JPEGs") {
    // each JPEG declares 4000x4000 = 16M px — under decodeImage's
    // PER-frame cap, but five of them total 80M > MaxTotalPixels; the
    // per-chunk header probe must reject BEFORE any raster allocates
    // (trusting the 16x16 avih header read 1280 px and decoded ~1.2 GB)
    val big = new java.awt.image.BufferedImage(
      4000, 4000, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(big, "jpg", bos)
    val jpeg = bos.toByteArray
    val bomb = buildAvi(16, 16, 5, "MJPG", 0x47504a4dL, 24,
      Seq.fill(5)("00dc" -> jpeg))
    assert(Multimodal.decodeFrames(bomb).isEmpty)
    // three of them (48M px) fit the budget and decode for real
    val okAvi = buildAvi(16, 16, 3, "MJPG", 0x47504a4dL, 24,
      Seq.fill(3)("00dc" -> jpeg))
    assert(Multimodal.decodeFrames(okAvi).map(_.length) === Some(3))
  }

  test("top-down DIB (negative strf biHeight) decodes rows first-to-last") {
    // white top row, black rest, stored in TOP-DOWN chunk order: the
    // bottom-up default would land the white row at y=15
    val stride = (16 * 3 + 3) / 4 * 4
    val frame = Array.tabulate(16 * stride) { i =>
      if (i < 16 * 3) 0xff.toByte else 0x00.toByte
    }
    val avi = buildAvi(16, 16, 1, "DIB ", 0L, 24,
      Seq("00db" -> frame), strfDims = Some((16, -16)))
    val f = Multimodal.decodeFrames(avi).get.head
    assert((f.getRGB(0, 0) & 0xffffff) === 0xffffff, "top row is white")
    assert((f.getRGB(0, 15) & 0xffffff) === 0x000000, "bottom row is black")
    // same bytes as BOTTOM-up (positive biHeight): white lands at y=15
    val up = buildAvi(16, 16, 1, "DIB ", 0L, 24, Seq("00db" -> frame))
    val g = Multimodal.decodeFrames(up).get.head
    assert((g.getRGB(0, 15) & 0xffffff) === 0xffffff)
  }

  test("avih/strf geometry disagreement degrades instead of hashing misaligned rows") {
    val frame = Array.fill(16 * ((16 * 3 + 3) / 4 * 4))(0.toByte)
    val lied = buildAvi(16, 16, 1, "DIB ", 0L, 24,
      Seq("00db" -> frame), strfDims = Some((8, 8)))
    assert(Multimodal.decodeFrames(lied).isEmpty,
      "one of the two headers lies — do not pick a side")
  }

  test("stream ids past 9 decode under BOTH muxer renderings (hex '0Adb', decimal '10db')") {
    // The two-char stream prefix diverges by muxer: avifil32's ToHex
    // writes HEX (stream 10 = '0Adb'), ffmpeg writes DECIMAL ('10db').
    // The parser keeps the raw prefix and matches the captured video
    // stream's number in either rendering — a decimal-only parser
    // skipped '0Adb' files entirely, a hex-only one broke ffmpeg's.
    val stride = (16 * 3 + 3) / 4 * 4
    val frame = Array.fill(16 * stride)(0x40.toByte)
    def aviWithVidAt10(frameId: String): Array[Byte] = {
      val avih = le32(100000) ++ le32(0) ++ le32(0) ++ le32(0) ++
        le32(1L) ++ le32(0) ++ le32(1) ++ le32(0) ++
        le32(16L) ++ le32(16L) ++ Array.fill(16)(0.toByte)
      // ten audio streams first, so the vids stream lands at index 10
      val audStrl = list("strl", chunk("strh",
        "auds".getBytes("US-ASCII") ++ Array.fill(52)(0.toByte)))
      val vidStrh = "vids".getBytes("US-ASCII") ++
        "DIB ".getBytes("US-ASCII") ++ Array.fill(40)(0.toByte) ++
        le16(0) ++ le16(0) ++ le16(16) ++ le16(16)
      val vidStrf = le32(40) ++ le32(16L) ++ le32(16L) ++ le16(1) ++
        le16(24) ++ le32(0L) ++ Array.fill(20)(0.toByte)
      val vidStrl = list("strl", chunk("strh", vidStrh) ++ chunk("strf", vidStrf))
      val hdrl = list("hdrl",
        chunk("avih", avih) ++ Array.fill(10)(audStrl).flatten ++ vidStrl)
      // '0Bdb' = stream 11 in both renderings — never stream 10; must
      // be excluded whichever rendering the real frame uses
      val movi = list("movi",
        chunk(frameId, frame) ++ chunk("0Bdb", Array.fill(32)(0x7f.toByte)))
      val payload = "AVI ".getBytes("US-ASCII") ++ hdrl ++ movi
      "RIFF".getBytes("US-ASCII") ++ le32(payload.length.toLong) ++ payload
    }
    for (id <- Seq("0Adb", "10db")) {
      val frames = Multimodal.decodeFrames(aviWithVidAt10(id)).get
      assert(frames.length === 1, s"$id: stream 10's one real frame")
      assert((frames.head.getRGB(0, 0) & 0xffffff) === 0x404040, id)
    }
  }

  test("frame chunks are pinned to the captured video stream, not pooled across streams") {
    val stride = (16 * 3 + 3) / 4 * 4
    val f0 = Array.fill(16 * stride)(0x40.toByte)
    val other = Array.fill(32)(0x7f.toByte) // stream 1's 8x8-ish junk
    val avi = buildAvi(16, 16, 1, "DIB ", 0L, 24,
      Seq("00db" -> f0, "01db" -> other, "01db" -> other),
      secondVideoStream = true)
    val frames = Multimodal.decodeFrames(avi).get
    assert(frames.length === 1, "stream 1's chunks must not join stream 0's sequence")
    assert(Multimodal.imageHeader(avi) === Some((16, 16, 1)))
  }

  test("decode guards: declared-huge GIF and oversized audio degrade, never allocate") {
    // hand-built GIF89a declaring ONE 60000x60000 frame (3.6e9 pixels,
    // ~14 GB as ARGB) with only a few bytes of LZW data — the
    // declared-dimensions guard must refuse it BEFORE reader.read
    // allocates the raster (OutOfMemoryError would escape NonFatal)
    def u16(v: Int) = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
    val hugeGif =
      "GIF89a".getBytes("US-ASCII") ++
        u16(60000) ++ u16(60000) ++ Array[Byte](0x00, 0, 0) ++ // LSD, no GCT
        Array[Byte](0x2c) ++ u16(0) ++ u16(0) ++               // image desc
        u16(60000) ++ u16(60000) ++ Array[Byte](0x00) ++       // no LCT
        Array[Byte](0x02, 0x02, 0x4c, 0x01, 0x00) ++           // stub LZW
        Array[Byte](0x3b)                                      // trailer
    // sanity: the structure itself parses (a reader claims it)...
    val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
      new java.io.ByteArrayInputStream(hugeGif))
    assert(javax.imageio.ImageIO.getImageReaders(iis).hasNext)
    iis.close()
    // ...and the guard still refuses it
    assert(Multimodal.decodeFrames(hugeGif).isEmpty)

    // audio: the byte-length cap routes to the stub before any decode
    val oversized = new Array[Byte](Multimodal.MaxAudioBytes + 1)
    assert(Multimodal.decodeAudio(oversized).isEmpty)
  }

  test("frameHashes: per-frame real hashes; palette shift is invariant") {
    val fx = graft.sources.Sources
      .readBinaryFiles(spark, "/root/repo/fixtures/media_gif", glob = "*.gif")
      .select(
        regexp_extract(element_at(split(col("path"), "/"), -1), "vid_(\\d+)", 1)
          .cast("long").as("doc_id"),
        col("content").as("payload"))
    val h = Multimodal.frameHashes(spark, fx).collect()
      .groupBy(_.doc_id).view.mapValues(_.sortBy(_.frame_idx)).toMap
    assert(h(0L).map(_.n_frames).toSeq === Seq.fill(4)(4))
    assert(h(2L).length === 6)
    // vid_001 = vid_000 under an order-preserving brightness shift
    assert(h(0L).map(_.phash).toSeq === h(1L).map(_.phash).toSeq)
    // the rotating gradient hashes all differ
    assert(h(2L).map(_.phash).distinct.length === 6)
  }

  test("frameHashes: undecodable payloads emit one stub row matching perceptualHash") {
    val withPayload = Multimodal.withBinaryPayload(docs)
    val stub = Multimodal.frameHashes(spark, withPayload).collect()
    assert(stub.length === 3)
    assert(stub.forall(f => f.frame_idx === 0 && f.n_frames === 1))
    val whole = Multimodal.perceptualHash(spark, withPayload).collect()
      .map(m => m.doc_id -> m.phash).toMap
    stub.foreach(f => assert(f.phash === whole(f.doc_id)))
  }

  test("audioProfile: non-audio payloads take the md5 stub, decoded=false") {
    val p = Multimodal.audioProfile(spark, Multimodal.withBinaryPayload(docs))
      .collect().map(x => x.doc_id -> x).toMap
    assert(p.size === 3 && p.values.forall(!_.decoded))
    val one = p(1L) // "hello world": 11 bytes
    assert(one.sample_rate === 8000 && one.channels === 1)
    assert(one.n_frames === 11L && one.duration_ms === 1L)
    assert(one.rms === one.peak / 2L && one.zero_crossings === 2L)
  }
}
