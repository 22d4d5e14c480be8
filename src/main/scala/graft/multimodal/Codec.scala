package graft.multimodal

import java.nio.{ByteBuffer, ByteOrder}

/** Self-contained REAL image codecs — no native libraries, pure byte→pixel
  * arithmetic — for the two classic uncompressed formats:
  *
  *  - BMP, 24-bpp uncompressed `BITMAPINFOHEADER` (the Windows-bitmap core:
  *    little-endian headers, BGR samples, rows padded to 4 bytes, stored
  *    bottom-up);
  *  - binary PPM (`P6`, maxval 255 exactly — other maxvals would need
  *    sample rescaling, breaking the byte-exact contract, so they reject:
  *    ASCII header with `#` comments, then raw RGB).
  *
  * Decoders are STRICT — magic, header fields, and exact byte counts must
  * all agree with the blob length — so arbitrary payloads (the synthetic
  * GRFT audio/video streams, truncated files) fail cleanly to `None` and
  * [[Media.decode]] falls back to its documented stub rather than producing
  * garbage pixels. Encoders exist for fixture generation and round-trip
  * proofs.
  */
object Codec {

  /** Decoded raster: RGB, 3 bytes per pixel, row-major, TOP-DOWN — the
    * orientation every downstream consumer expects regardless of the
    * container's storage order. */
  final case class Pixels(width: Int, height: Int, data: Array[Byte])

  /** Dimension sanity bound: one decoded raster stays ≤ ~768 MB and a
    * corrupt header cannot trigger a multi-GB allocation on an executor. */
  private val MaxDim = 16384

  // ------------------------------------------------------------------ BMP

  def encodeBmp(p: Pixels): Array[Byte] = {
    require(p.data.length == p.width * p.height * 3, "pixels must be RGB24")
    val rowSize = (p.width * 3 + 3) & ~3
    val imgSize = rowSize * p.height
    val b = ByteBuffer.allocate(54 + imgSize).order(ByteOrder.LITTLE_ENDIAN)
    b.put('B'.toByte).put('M'.toByte).putInt(54 + imgSize)
      .putInt(0).putInt(54) // reserved, pixel-data offset
    b.putInt(40).putInt(p.width).putInt(p.height) // BITMAPINFOHEADER
      .putShort(1).putShort(24).putInt(0).putInt(imgSize)
      .putInt(2835).putInt(2835).putInt(0).putInt(0)
    var y = p.height - 1 // stored bottom-up
    while (y >= 0) {
      var x = 0
      while (x < p.width) {
        val i = (y * p.width + x) * 3
        b.put(p.data(i + 2)).put(p.data(i + 1)).put(p.data(i)) // BGR on disk
        x += 1
      }
      var pad = p.width * 3
      while (pad < rowSize) { b.put(0.toByte); pad += 1 }
      y -= 1
    }
    b.array()
  }

  def decodeBmp(blob: Array[Byte]): Option[Pixels] = {
    if (blob == null || blob.length < 54 || blob(0) != 'B' || blob(1) != 'M') return None
    val b = ByteBuffer.wrap(blob).order(ByteOrder.LITTLE_ENDIAN)
    val fileSize = b.getInt(2)
    val dataOffset = b.getInt(10)
    val hdrSize = b.getInt(14)
    val width = b.getInt(18)
    val height = b.getInt(22)
    val planes = b.getShort(26).toInt
    val bpp = b.getShort(28).toInt
    val compression = b.getInt(30)
    if (fileSize != blob.length || hdrSize < 40 || planes != 1 || bpp != 24 ||
      compression != 0 || width <= 0 || height <= 0 ||
      width > MaxDim || height > MaxDim) return None
    val rowSize = (width * 3 + 3) & ~3
    if (dataOffset < 54 || dataOffset.toLong + rowSize.toLong * height > blob.length) return None
    val out = new Array[Byte](width * height * 3)
    var y = 0
    while (y < height) {
      val src = dataOffset + (height - 1 - y) * rowSize // bottom-up → top-down
      var x = 0
      while (x < width) {
        val d = (y * width + x) * 3
        out(d) = blob(src + x * 3 + 2)     // R
        out(d + 1) = blob(src + x * 3 + 1) // G
        out(d + 2) = blob(src + x * 3)     // B
        x += 1
      }
      y += 1
    }
    Some(Pixels(width, height, out))
  }

  // ------------------------------------------------------------------ PPM

  def encodePpm(p: Pixels): Array[Byte] = {
    require(p.data.length == p.width * p.height * 3, "pixels must be RGB24")
    s"P6\n${p.width} ${p.height}\n255\n".getBytes("US-ASCII") ++ p.data
  }

  def decodePpm(blob: Array[Byte]): Option[Pixels] = {
    if (blob == null || blob.length < 9 || blob(0) != 'P' || blob(1) != '6') return None
    var pos = 2
    // three header ints (width, height, maxval), whitespace-separated with
    // `#`-to-EOL comments anywhere whitespace is legal (netpbm spec)
    def nextInt(): Int = {
      while (pos < blob.length &&
        (blob(pos) == ' ' || blob(pos) == '\t' || blob(pos) == '\n' ||
          blob(pos) == '\r' || blob(pos) == '#')) {
        if (blob(pos) == '#') { while (pos < blob.length && blob(pos) != '\n') pos += 1 }
        else pos += 1
      }
      var v = -1
      while (pos < blob.length && blob(pos) >= '0' && blob(pos) <= '9') {
        v = (if (v < 0) 0 else v) * 10 + (blob(pos) - '0')
        if (v > 0xffffff) return -1
        pos += 1
      }
      v
    }
    val width = nextInt(); val height = nextInt(); val maxval = nextInt()
    // maxval != 255 would need sample rescaling to stay meaningful — this
    // decoder's contract is BYTE-exact rasters, so anything else is
    // rejected rather than silently copied at the wrong scale
    if (width <= 0 || height <= 0 || width > MaxDim || height > MaxDim ||
      maxval != 255) return None
    pos += 1 // exactly ONE whitespace byte separates maxval from the raster
    val need = width * height * 3
    if (pos + need != blob.length) return None // strict: no trailing junk
    val out = new Array[Byte](need)
    System.arraycopy(blob, pos, out, 0, need)
    Some(Pixels(width, height, out))
  }

  /** Sniff + decode whichever real format the blob is; None for anything
    * else (strictness makes misdetection of arbitrary bytes practically
    * impossible — both parsers cross-check header arithmetic against the
    * exact blob length). */
  def decodeImage(blob: Array[Byte]): Option[Pixels] =
    if (blob == null || blob.length < 2) None
    else if (blob(0) == 'B' && blob(1) == 'M') decodeBmp(blob)
    else if (blob(0) == 'P' && blob(1) == '6') decodePpm(blob)
    else None
}
