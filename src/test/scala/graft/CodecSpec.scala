package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.{Codec, Media}
import graft.multimodal.Codec.Pixels

/** Real byte→pixel decoding: golden fixtures assembled by hand (independent
  * of the encoder), round-trips, strict-parse rejection, and the corpus
  * integration (image payloads ARE real BMPs). */
class CodecSpec extends AnyFunSuite {

  /** A 3×2 24-bpp BMP assembled byte-by-byte from the spec: little-endian
    * headers, BGR samples, 12-byte rows (3 bytes padding), bottom-up. */
  private def goldenBmp: (Array[Byte], Pixels) = {
    // top-down RGB raster we expect back:
    // row 0: red, green, blue ; row 1: white, black, (10,20,30)
    val expected = Array[Byte](
      255.toByte, 0, 0, 0, 255.toByte, 0, 0, 0, 255.toByte,
      255.toByte, 255.toByte, 255.toByte, 0, 0, 0, 10, 20, 30)
    val b = java.nio.ByteBuffer.allocate(54 + 24)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put('B'.toByte).put('M'.toByte).putInt(78).putInt(0).putInt(54)
    b.putInt(40).putInt(3).putInt(2).putShort(1).putShort(24)
      .putInt(0).putInt(24).putInt(0).putInt(0).putInt(0).putInt(0)
    // bottom row first (= expected row 1), BGR + 3 pad bytes
    b.put(Array[Byte](255.toByte, 255.toByte, 255.toByte, 0, 0, 0, 30, 20, 10, 0, 0, 0))
    // top row (= expected row 0)
    b.put(Array[Byte](0, 0, 255.toByte, 0, 255.toByte, 0, 255.toByte, 0, 0, 0, 0, 0))
    (b.array(), Pixels(3, 2, expected))
  }

  test("golden BMP decodes byte-exactly (bottom-up rows, BGR, padding)") {
    val (blob, want) = goldenBmp
    val got = Codec.decodeBmp(blob)
    assert(got.isDefined)
    assert(got.get.width === 3 && got.get.height === 2)
    assert(got.get.data.toSeq === want.data.toSeq)
  }

  test("golden PPM with comments and odd whitespace decodes byte-exactly") {
    val raster = Array[Byte](1, 2, 3, 4, 5, 6)
    val blob = "P6 # a comment right here\n# another\n 2\t1 # dims done\n255\n"
      .getBytes("US-ASCII") ++ raster
    val got = Codec.decodePpm(blob)
    assert(got.isDefined && got.get.width === 2 && got.get.height === 1)
    assert(got.get.data.toSeq === raster.toSeq)
  }

  test("BMP and PPM round-trip byte-exactly across 20 random rasters") {
    val rnd = new scala.util.Random(20260817L)
    for (_ <- 1 to 20) {
      val w = 1 + rnd.nextInt(37)
      val h = 1 + rnd.nextInt(23)
      val data = Array.fill[Byte](w * h * 3)(rnd.nextInt().toByte)
      val p = Pixels(w, h, data)
      val viaBmp = Codec.decodeImage(Codec.encodeBmp(p))
      val viaPpm = Codec.decodeImage(Codec.encodePpm(p))
      assert(viaBmp.exists(q => q.width == w && q.height == h &&
        q.data.toSeq == data.toSeq), s"bmp $w x $h")
      assert(viaPpm.exists(q => q.width == w && q.height == h &&
        q.data.toSeq == data.toSeq), s"ppm $w x $h")
    }
  }

  test("strict parsers reject near-misses instead of emitting garbage") {
    val (blob, _) = goldenBmp
    assert(Codec.decodeBmp(blob.dropRight(1)).isEmpty, "truncated file")
    val wrongSize = blob.clone(); wrongSize(2) = 99 // fileSize mismatch
    assert(Codec.decodeBmp(wrongSize).isEmpty)
    val junk = "BM then absolutely not a bitmap at all........".getBytes
    assert(Codec.decodeImage(junk).isEmpty)
    val ppmTrailing = "P6\n1 1\n255\n".getBytes("US-ASCII") ++
      Array[Byte](1, 2, 3, 4) // one byte too many
    assert(Codec.decodePpm(ppmTrailing).isEmpty)
    // maxval != 255 would need rescaling — strict reject, never a
    // wrong-scale raster
    val ppmMaxval = "P6\n1 1\n15\n".getBytes("US-ASCII") ++ Array[Byte](15, 15, 15)
    assert(Codec.decodePpm(ppmMaxval).isEmpty)
    assert(Codec.decodeImage(null).isEmpty)
  }

  test("corpus image payloads are real BMPs whose decode returns the seeded raster") {
    // regenerate blob 0 (kind 0 = image) exactly as Media.corpus does,
    // WITHOUT Spark: the payload must be a decodable BMP and the decoded
    // raster must equal the seeded byte stream that went in
    val i = 0L; val seed = 3L
    val w = 16 + (i % 48).toInt; val h = 16 + (i % 32).toInt
    val stream = new Array[Byte](w * h * 3)
    var s = graft.ops.Hashing.splitmix64(seed * 31 + i)
    var j = 0
    while (j < stream.length) { s = graft.ops.Hashing.splitmix64(s); stream(j) = s.toByte; j += 1 }
    val payload = Codec.encodeBmp(Pixels(w, h, stream))
    val meta = Media.MediaMeta(s"media://$seed/0", Media.KIND_IMAGE, w, h,
      payload.length.toLong, valid = true)
    val decoded = Media.decode(meta, payload)
    assert(decoded.length === w * h * 3, "real decode, not the stub's w*h buffer")
    assert(decoded.toSeq === stream.toSeq)
    // and an unrecognized payload still reaches the documented stub
    val stubbed = Media.decode(meta.copy(kind = Media.KIND_AUDIO), Array[Byte](7, 7, 7))
    assert(stubbed.length === w * h)
  }
}
