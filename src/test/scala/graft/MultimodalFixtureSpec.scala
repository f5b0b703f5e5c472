package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.MultimodalOps.{MagicDecoder, MediaContainers, Thumbnailer}

/** Guards the multimodal family's content-dependent edges:
  *
  *   1. The m1/m3/m4 oracles pin modality by doc_id % 3 while the decoder
  *      dispatches on actual bytes — sound only while no bare-bytes document
  *      (doc_id % 3 == 2) happens to start with a BMP/WAV signature. That is
  *      a property of the fixture CONTENT, so it is asserted here rather
  *      than assumed (see the scaladoc on [[MediaContainers.payloadFor]]).
  *   2. Thumbnailer.resize does TRUE 2-D nearest-neighbor over the
  *      bottom-up padded raster — pinned against an independent
  *      image-space reference implementation (build pixel grid, sample
  *      (x, y), re-serialize), including a non-trivial-padding width.
  *   3. Malformed containers (body is not a consistent w×h padded raster)
  *      must pass through untouched, never fabricate pixels.
  */
class MultimodalFixtureSpec extends AnyFunSuite {
  private lazy val spark = GraftTestSpark.spark

  test("media_modality kernel agrees with MagicDecoder on every fixture payload") {
    import spark.implicits._
    // the SQL-facing sniff (functions.MediaKernel, behind media_modality)
    // and the decode path must never drift — m6's gate answers from the
    // former, m1/m3/m4 from the latter. Also covered: the truncated-media
    // shapes m6 injects (sub-floor headers must sniff 'binary' in BOTH).
    val disagreements = graft.multimodal.MultimodalOps.withPayloads(spark, GraftTestSpark.sf)
      .as[(Long, Array[Byte])]
      .flatMap { case (id, p) =>
        val variants = Seq(p, p.take(20), p.take(45))
        variants.flatMap { v =>
          val sql = graft.functions.MediaKernel.modality(v).toString
          val dec = MagicDecoder.decode(id, v).modality
          if (sql != dec) Some((id, v.length, sql, dec)) else None
        }
      }
      .collect()
    assert(disagreements.isEmpty, disagreements.take(5).mkString(", "))
  }

  test("no bare-bytes fixture payload collides with a BMP/WAV magic signature") {
    import spark.implicits._
    val collisions = graft.multimodal.MultimodalOps.withPayloads(spark, GraftTestSpark.sf)
      .filter($"doc_id" % 3 === 2)
      .as[(Long, Array[Byte])]
      .map { case (id, p) => (id, MagicDecoder.decode(id, p).modality) }
      .filter(_._2 != "binary")
      .collect()
    assert(collisions.isEmpty,
      s"fixture text collides with a container signature: ${collisions.take(5).mkString(",")} — " +
        "the doc_id%3-keyed oracles are unsound for these rows")
  }

  test("PNG writer/decoder round-trip: signature, big-endian IHDR dims, chunk CRCs") {
    val body = MediaContainers.raster(41L, 33, 17)
    val p = MediaContainers.png(640, 480, body)
    assert(p.length == 57 + body.length, "PNG framing overhead must be 57 bytes")
    val f = MagicDecoder.decode(41L, p)
    assert(f.modality == "image_png" && f.width.contains(640L) &&
      f.height.contains(480L) && f.n_frames == 1L, f.toString)
    // every chunk's CRC32 must verify over type||data (real PNG framing)
    def be32(off: Int): Int =
      ((p(off) & 0xff) << 24) | ((p(off + 1) & 0xff) << 16) |
        ((p(off + 2) & 0xff) << 8) | (p(off + 3) & 0xff)
    var off = 8
    var chunks = List.empty[String]
    while (off < p.length) {
      val len = be32(off)
      val crc = new java.util.zip.CRC32()
      crc.update(p, off + 4, 4 + len)
      assert(crc.getValue.toInt == be32(off + 8 + len),
        s"bad CRC for chunk at $off")
      chunks ::= new String(p.slice(off + 4, off + 8), "US-ASCII")
      off += 12 + len
    }
    assert(chunks.reverse == List("IHDR", "IDAT", "IEND"))
    // a truncated PNG (below the 33-byte signature+IHDR floor) is binary
    assert(MagicDecoder.decode(41L, p.take(20)).modality == "binary")
  }

  /** Independent reference: decode the raster to an image-space (y)(x)(c)
    * grid, 2-D NN sample in image space, re-serialize bottom-up + padded.
    */
  private def refResize(docId: Long, w: Int, h: Int, thumbMax: Int): Array[Byte] = {
    val grid = Array.tabulate(h, w, 3)((y, x, c) => ((docId + 7L * x + 13L * y + 31L * c) % 256).toByte)
    val longest = math.max(w, h)
    val (nw, nh) =
      if (longest <= thumbMax) (w, h)
      else (math.max(w * thumbMax / longest, 1), math.max(h * thumbMax / longest, 1))
    val sampled = Array.tabulate(nh, nw, 3)((ty, tx, c) =>
      grid(ty * h / nh)(tx * w / nw)(c))
    val st = MediaContainers.stride(nw)
    val body = new Array[Byte](st * nh)
    for (r <- 0 until nh; tx <- 0 until nw; c <- 0 until 3)
      body(r * st + tx * 3 + c) = sampled(nh - 1 - r)(tx)(c)
    MediaContainers.bmp(nw, nh, body)
  }

  test("thumbnailer equals the image-space 2-D reference (padding widths included)") {
    // widths chosen so nw*3 % 4 != 0 (real row padding on BOTH sides of the
    // resize), plus a tall-then-wide pair to catch axis swaps
    for ((docId, w, h) <- Seq((3L, 106, 70), (6L, 97, 33), (9L, 30, 78), (12L, 111, 79))) {
      val src = MediaContainers.bmp(w, h, MediaContainers.raster(docId, w, h))
      val got = Thumbnailer.resize(src)
      val want = refResize(docId, w, h, graft.multimodal.MultimodalOps.ThumbMax)
      assert(got.toSeq === want.toSeq, s"docId=$docId ${w}x$h")
    }
  }

  test("thumbnailer equals the 2-D reference on randomized and extreme-aspect shapes") {
    val rng = new scala.util.Random(0x2d5a8b1L)
    val cases = (1 to 12).map(_ =>
      (rng.nextInt(1000).toLong, 1 + rng.nextInt(130), 1 + rng.nextInt(90))) ++
      // extreme aspect ratios: the short axis clamps at max(.., 1)
      Seq((7L, 200, 3), (8L, 2, 180), (9L, 1, 100), (10L, 128, 1))
    for ((docId, w, h) <- cases) {
      val src = MediaContainers.bmp(w, h, MediaContainers.raster(docId, w, h))
      val got = Thumbnailer.resize(src)
      val want = refResize(docId, w, h, graft.multimodal.MultimodalOps.ThumbMax)
      assert(got.toSeq === want.toSeq, s"docId=$docId ${w}x$h")
    }
  }

  test("PCM writer/decoder round-trip equals the closed-form sample statistics") {
    import graft.multimodal.MultimodalOps.AudioFeatures
    // independent reference: compute peak/energy straight from the closed
    // form, never touching bytes — catches interleave, endianness, and
    // sign-extension bugs in either the writer or the reader
    def ref(docId: Long, frames: Int, channels: Int): Seq[(Long, Long, Long, Long, Long)] =
      (0 until channels).map { c =>
        val samples = (0 until frames).map(f =>
          ((docId * 31L + 7L * f + 13L * c) % 4096L) - 2048L)
        (docId, c.toLong, frames.toLong,
          samples.map(math.abs).max, samples.map(v => v * v).sum)
      }
    val rng = new scala.util.Random(0x9e37L)
    val cases = (1 to 10).map(_ =>
      (rng.nextInt(100000).toLong, 1 + rng.nextInt(200), 1 + rng.nextInt(2))) ++
      Seq((0L, 1, 1), (4096L, 32, 2), (65L, 128, 2)) // edge: min frames, doc_id mod boundary
    for ((docId, frames, channels) <- cases) {
      val payload = MediaContainers.wav(8000, channels, 16,
        MediaContainers.pcm(docId, frames, channels))
      val got = AudioFeatures.channelStats(docId, payload)
        .map(a => (a.doc_id, a.channel, a.n_frames, a.peak, a.energy)).toSeq
      assert(got === ref(docId, frames, channels), s"docId=$docId f=$frames ch=$channels")
    }
    // non-audio payloads contribute nothing
    assert(AudioFeatures.channelStats(1L, "just text".getBytes("UTF-8")).isEmpty)
    assert(AudioFeatures.channelStats(3L,
      MediaContainers.bmp(16, 16, MediaContainers.raster(3L, 16, 16))).isEmpty)
  }

  test("small images pass through unchanged; malformed bodies pass through unchanged") {
    val small = MediaContainers.bmp(64, 40, MediaContainers.raster(1L, 64, 40))
    assert(Thumbnailer.resize(small) eq small)
    // a BMP header whose body is NOT stride*h (the old text-body shape)
    val malformed = MediaContainers.bmp(256, 16, "not a raster".getBytes("UTF-8"))
    assert(Thumbnailer.resize(malformed) eq malformed)
  }
}
