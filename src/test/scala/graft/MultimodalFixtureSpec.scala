package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.MultimodalOps.{MagicDecoder, MediaContainers, Thumbnailer}

/** Guards the multimodal family's two content-dependent edges called out in
  * round-5 review:
  *
  *   1. The m1/m3/m4 oracles pin modality by doc_id % 3 while the decoder
  *      dispatches on actual bytes — sound only while no bare-bytes document
  *      (doc_id % 3 == 2) happens to start with a BMP/WAV signature. That is
  *      a property of the fixture CONTENT, so it is asserted here rather
  *      than assumed (see the scaladoc on [[MediaContainers.payloadFor]]).
  *   2. Thumbnailer.resize on an empty-body BMP: newLen is floored at 1 but
  *      there are no bytes to sample — must emit a zero-filled byte, not
  *      throw ArrayIndexOutOfBounds.
  */
class MultimodalFixtureSpec extends AnyFunSuite {
  private lazy val spark = GraftTestSpark.spark

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

  test("thumbnailer handles an empty BMP body (oracle expects a 1-byte result)") {
    // width 256 forces a resize (longest side > ThumbMax=64)
    val emptyBody = MediaContainers.bmp(256, 16, Array.emptyByteArray)
    val out = Thumbnailer.resize(emptyBody)
    val feats = MagicDecoder.decode(0L, out)
    assert(feats.modality === "image")
    assert(feats.width === Some(64L))
    assert(feats.height === Some(4L))
    assert(out.length === 54 + 1, "zero-filled 1-byte body per the oracle's 54 + greatest(...,1)")
  }
}
