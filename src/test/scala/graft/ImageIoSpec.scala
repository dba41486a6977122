package graft

import org.apache.spark.sql.functions._
import graft.multimodal.Multimodal

/** Pins [[Multimodal.ImageIoCodec]] — the REAL image decoder behind the
  * codec seam — on committed fixture images (src/test/resources/
  * fixtures, generated deterministically with ImageIO itself):
  *
  *   tiny.png / tiny.bmp : 5×3, rgb(x,y) = (x·40, y·80, (x+y)·20)
  *   big.png             : 40×20, rgb(x,y) = (x·6, y·12, (x xor y)·3)
  *
  * Everything runs through the same DataFrame operators the oracle
  * queries use (q_multimodal_decode / _features / _resize paths), only
  * with the real codec plugged into the seam — proving a StubCodec →
  * real-codec swap needs no plan, schema, or partitioning change.
  */
class ImageIoSpec extends SparkSpec {
  import spark.implicits._

  private def fixture(name: String): Array[Byte] = {
    val in = getClass.getResourceAsStream(s"/fixtures/$name")
    assert(in != null, s"missing test resource fixtures/$name")
    try in.readAllBytes() finally in.close()
  }

  private def mediaDf(rows: (Long, Array[Byte])*) =
    rows.toSeq.toDF("media_id", "content")

  test("decode reads real PNG and BMP dimensions through the operator path") {
    val df = mediaDf(1L -> fixture("tiny.png"), 2L -> fixture("tiny.bmp"),
      3L -> "not an image".getBytes("UTF-8"))
    val out = Multimodal.decode(df, Multimodal.ImageIoCodec)
      .select($"media_id", $"decoded.width", $"decoded.height", $"decoded.duration_ms")
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getInt(3)))).toMap
    assert(out(1L) == ((5, 3, 0)))
    assert(out(2L) == ((5, 3, 0)))
    assert(out(3L) == ((-1, -1, -1))) // undecodable payload stays visible
  }

  test("features is an exact luminance histogram of the decoded pixels") {
    // expected bins derived from the fixture's GENERATING pattern (not
    // from the codec): luma = (77r + 150g + 29b) >> 8, bin = luma*k/256
    val k = 8
    val expected = new Array[Float](k)
    for (y <- 0 until 3; x <- 0 until 5) {
      val luma = ((x * 40 * 77 + y * 80 * 150 + (x + y) * 20 * 29) >> 8).min(255)
      expected(luma * k / 256) += 1f
    }
    val out = Multimodal.extractFeatures(
        mediaDf(1L -> fixture("tiny.png")), "media_id", "content", k,
        Multimodal.ImageIoCodec)
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(out(1L).sum == 15f) // every pixel lands in exactly one bin
    assert(out(1L) == expected.toSeq)
    // PNG and BMP encode the same pixels → identical features
    val bmp = Multimodal.extractFeatures(
        mediaDf(1L -> fixture("tiny.bmp")), "media_id", "content", k,
        Multimodal.ImageIoCodec)
      .collect()(0).getSeq[Float](1)
    assert(bmp == expected.toSeq)
  }

  test("resize downscales to the pixel budget with nearest-neighbor sampling") {
    val out = Multimodal.resize(
        mediaDf(1L -> fixture("big.png"), 2L -> fixture("tiny.png")),
        "media_id", "content", targetBytes = 200, Multimodal.ImageIoCodec)
      .collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]]("resized")).toMap
    // 40×20 = 800 px, budget 200 → scale 0.5 → 20×10 = 200 px
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(out(1L)))
    assert(img.getWidth == 20 && img.getHeight == 10)
    // nearest-neighbor: out(x, y) = in(2x, 2y) of the generating pattern
    for (y <- Seq(0, 4, 9); x <- Seq(0, 7, 19)) {
      val rgb = img.getRGB(x, y) & 0xffffff
      val exp = ((2 * x * 6) << 16) | ((2 * y * 12) << 8) | (((2 * x) ^ (2 * y)) * 3)
      assert(rgb == exp, s"pixel ($x,$y)")
    }
    // 5×3 = 15 px is already within budget → byte-identical pass-through
    assert(out(2L).sameElements(fixture("tiny.png")))
  }
}
