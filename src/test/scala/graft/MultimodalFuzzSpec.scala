package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.Multimodal

/** Corruption fuzz over the binary decode kernels.
  *
  * The targeted specs pin CRAFTED attacks (header bombs, truncation,
  * geometry disagreement); this spec pins the same contract in BREADTH:
  * for ANY mutation of a real container — bit flips, truncations,
  * random little-endian field stomps, appended garbage — and for pure
  * random bytes (including RIFF/AVI-magic-prefixed ones, which force
  * the chunk walk deep into garbage), every decoder either returns a
  * decoded value INSIDE its declared budgets or returns None. Never a
  * throw, never a budget breach: at corpus scale every corruption
  * exists, and a single escaping exception class turns one bad blob
  * into a dead 100 TB scan stage (the mapPartitions callers treat None
  * as the per-row stub path — an uncaught throw has no such row-local
  * containment).
  *
  * Seeded and replayable: every case derives from `Seed`; a failure
  * message names the fixture, mutation kind, and case index, which
  * regenerates the exact payload.
  */
class MultimodalFuzzSpec extends AnyFunSuite {

  private val Seed = 0x20260816L

  private def read(sub: String): Seq[(String, Array[Byte])] = {
    val dir = new java.io.File(s"${graft.queries.QueryUtil.fixtureRoot}/$sub")
    dir.listFiles().filter(f => !f.getName.startsWith("_")).sortBy(_.getName)
      .map(f => f.getName -> java.nio.file.Files.readAllBytes(f.toPath)).toSeq
  }

  /** Deterministic mutations of one payload: `flips` single-bit flips,
    * `truncs` truncations, `stomps` 4-byte little-endian field
    * overwrites (the chunk-size/geometry fields every container parser
    * trusts first), and `appends` garbage tails (a valid prefix with
    * trailing junk is the commonest real-world corruption).
    */
  private def mutations(
      orig: Array[Byte], rnd: scala.util.Random): Seq[(String, Array[Byte])] = {
    val flips = (0 until 40).map { i =>
      val m = orig.clone()
      val off = rnd.nextInt(m.length)
      m(off) = (m(off) ^ (1 << rnd.nextInt(8))).toByte
      (s"bitflip#$i@$off", m)
    }
    val truncs = (0 until 10).map { i =>
      val n = rnd.nextInt(orig.length)
      (s"trunc#$i@$n", orig.take(n))
    }
    val stomps = (0 until 15).map { i =>
      val m = orig.clone()
      val off = rnd.nextInt(math.max(1, m.length - 4))
      val v = rnd.nextInt()
      var j = 0
      while (j < 4 && off + j < m.length) {
        m(off + j) = ((v >>> (8 * j)) & 0xff).toByte; j += 1
      }
      (s"stomp#$i@$off=$v", m)
    }
    val appends = (0 until 5).map { i =>
      val tail = new Array[Byte](rnd.nextInt(512))
      rnd.nextBytes(tail)
      (s"append#$i+${tail.length}", orig ++ tail)
    }
    // Deterministic HEADER-REGION sweep (r9 verdict asked whether
    // truncations inside the strf header are exercised — the random
    // truncations above only hit it by luck): every container header
    // these fixtures carry (RIFF/avih/strh/strf, GIF LSD, BMP
    // BITMAPINFOHEADER, WAV fmt) sits in the first few hundred bytes,
    // so cut at EVERY 4-byte offset there, and stomp a random word at
    // every 8-byte offset — a parser that trusts any header field
    // without re-bounding against the real array fails one of these
    // seeds reproducibly, not probabilistically.
    val headerTruncs = (0 until math.min(orig.length, 512) by 4)
      .map(n => (s"htrunc@$n", orig.take(n)))
    val headerStomps = (0 until math.min(math.max(0, orig.length - 4), 256) by 8)
      .map { off =>
        val m = orig.clone()
        val v = rnd.nextInt()
        var j = 0
        while (j < 4) { m(off + j) = ((v >>> (8 * j)) & 0xff).toByte; j += 1 }
        (s"hstomp@$off=$v", m)
      }
    flips ++ truncs ++ stomps ++ appends ++ headerTruncs ++ headerStomps
  }

  private def assertFramesContract(label: String, payload: Array[Byte]): Unit = {
    val out =
      try Multimodal.decodeFrames(payload)
      catch {
        case e: Throwable =>
          fail(s"decodeFrames threw on $label: ${e.getClass.getName}: ${e.getMessage}")
      }
    out.foreach { frames =>
      assert(frames.length <= Multimodal.MaxFrames,
        s"$label decoded ${frames.length} frames past MaxFrames")
      val px = frames.iterator.map(f => f.getWidth.toLong * f.getHeight).sum
      assert(px <= Multimodal.MaxTotalPixels,
        s"$label materialized $px pixels past MaxTotalPixels")
    }
  }

  private def assertAudioContract(label: String, payload: Array[Byte]): Unit = {
    val out =
      try Multimodal.decodeAudio(payload)
      catch {
        case e: Throwable =>
          fail(s"decodeAudio threw on $label: ${e.getClass.getName}: ${e.getMessage}")
      }
    out.foreach { a =>
      // PCM passthrough cannot mint samples: 16-bit frames over at most
      // the payload's own bytes (a declared-but-absent data length must
      // not allocate past what the blob really carries)
      assert(a.samples.length * 2 <= payload.length,
        s"$label decoded ${a.samples.length} samples from ${payload.length} bytes")
      assert(a.channels >= 1 && a.sampleRate > 0, s"$label degenerate format")
    }
  }

  test("decodeFrames survives mutated AVI/GIF/BMP fixtures inside its budgets") {
    val media = read("media_avi") ++ read("media_gif") ++ read("media_img")
    assert(media.size >= 11) // the committed fixture inventory
    media.foreach { case (name, bytes) =>
      val rnd = new scala.util.Random(Seed ^ name.hashCode.toLong)
      mutations(bytes, rnd).foreach { case (kind, m) =>
        assertFramesContract(s"$name/$kind", m)
      }
    }
  }

  test("decodeAudio survives mutated WAV fixtures, samples bounded by payload") {
    read("media_audio").foreach { case (name, bytes) =>
      val rnd = new scala.util.Random(Seed ^ name.hashCode.toLong)
      mutations(bytes, rnd).foreach { case (kind, m) =>
        assertAudioContract(s"$name/$kind", m)
      }
    }
  }

  test("decoders survive pure random bytes and AVI-magic-prefixed garbage") {
    val rnd = new scala.util.Random(Seed)
    (0 until 150).foreach { i =>
      val b = new Array[Byte](rnd.nextInt(4096))
      rnd.nextBytes(b)
      assertFramesContract(s"random#$i", b)
      assertAudioContract(s"random#$i", b)
    }
    // force the RIFF walk: a correct 12-byte AVI magic over a random
    // tail, with the RIFF size field itself random — the chunk loop
    // must bound every read by the REAL array, not the declared size
    (0 until 50).foreach { i =>
      val tail = new Array[Byte](rnd.nextInt(8192))
      rnd.nextBytes(tail)
      val b = new Array[Byte](12 + tail.length)
      System.arraycopy("RIFF".getBytes("US-ASCII"), 0, b, 0, 4)
      val sz = rnd.nextInt()
      var j = 0
      while (j < 4) { b(4 + j) = ((sz >>> (8 * j)) & 0xff).toByte; j += 1 }
      System.arraycopy("AVI ".getBytes("US-ASCII"), 0, b, 8, 4)
      System.arraycopy(tail, 0, b, 12, tail.length)
      assertFramesContract(s"avimagic#$i", b)
    }
  }
}
