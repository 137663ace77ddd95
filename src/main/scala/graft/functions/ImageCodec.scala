package graft.functions

/** Pure-JVM raster codecs for two uncompressed formats whose byte layouts
  * are public knowledge — binary PPM ("P6", maxval <= 255) and 24-bit
  * uncompressed (BI_RGB) Windows BMP — plus the matching encoders the
  * synthetic media table uses. No codec jars exist in this container, so
  * these are real header parsers + pixel walks, not library calls: given
  * any valid P6/BMP payload from any producer they return the true
  * dimensions and exact per-channel sums, and given arbitrary bytes they
  * return None instead of throwing (a decoder in a 100 TB ingest path must
  * be total — one corrupt blob cannot kill a task).
  *
  * PPM (netpbm): ASCII header "P6 <w> <h> <maxval>" with '#' comments and
  * arbitrary whitespace between tokens, ONE whitespace byte after maxval,
  * then w*h raw RGB triplets. BMP: 14-byte file header ("BM", pixel-array
  * offset at byte 10), BITMAPINFOHEADER (size >= 40 at byte 14; width,
  * height, bpp=24, compression=0), rows padded to 4 bytes, BGR byte
  * order, bottom-up when height > 0 (row order does not affect channel
  * sums; both signs are accepted).
  */
object ImageCodec {

  /** Exact decode result: dimensions + per-channel pixel-value sums (sums
    * are integers, so downstream means are bit-stable doubles).
    */
  final case class Decoded(format: String, width: Int, height: Int,
      channels: Int, sumR: Long, sumG: Long, sumB: Long)

  def decode(b: Array[Byte]): Option[Decoded] =
    if (b == null || b.length < 2) None
    else if (b(0) == 'P' && b(1) == '6') decodePpm(b)
    else if (b(0) == 'B' && b(1) == 'M') decodeBmp(b)
    else None

  private def isWs(c: Byte): Boolean =
    c == ' ' || c == '\n' || c == '\r' || c == '\t' || c == 0x0b || c == '\f'

  /** PPM P6 header parse with all the bounds guards: (w, h, pixel
    * offset), or None on anything unparseable/oversized.
    */
  private def ppmHeader(b: Array[Byte]): Option[(Int, Int, Int)] = {
    var i = 2
    // netpbm token scan: whitespace separates tokens, '#' starts a
    // comment running to end-of-line
    def nextInt(): Long = {
      while (i < b.length && (isWs(b(i)) || b(i) == '#')) {
        if (b(i) == '#') { while (i < b.length && b(i) != '\n') i += 1 }
        else i += 1
      }
      var v = -1L
      while (i < b.length && b(i) >= '0' && b(i) <= '9') {
        v = (if (v < 0) 0L else v) * 10 + (b(i) - '0')
        if (v > Int.MaxValue) return -1L
        i += 1
      }
      v
    }
    val w = nextInt(); val h = nextInt(); val maxv = nextInt()
    if (w <= 0 || h <= 0 || maxv <= 0 || maxv > 255) return None
    // a >2G-pixel claim cannot fit in a JVM byte array — reject before the
    // w*h*3 arithmetic can overflow Long on crafted headers
    if (w * h > Int.MaxValue) return None
    if (i >= b.length || !isWs(b(i))) return None // single post-maxval ws
    i += 1
    if (b.length - i < w * h * 3) return None
    Some((w.toInt, h.toInt, i))
  }

  private def decodePpm(b: Array[Byte]): Option[Decoded] =
    ppmHeader(b).map { case (w, h, off) =>
      val pixels = w.toLong * h
      var (sr, sg, sb) = (0L, 0L, 0L)
      var p = off
      var n = 0L
      while (n < pixels) {
        sr += b(p) & 0xff; sg += b(p + 1) & 0xff; sb += b(p + 2) & 0xff
        p += 3; n += 1
      }
      Decoded("ppm", w, h, 3, sr, sg, sb)
    }

  /** BMP header parse with all the bounds guards: (w, hRaw, pixel
    * offset, row stride); hRaw < 0 means top-down row order.
    */
  private def bmpHeader(b: Array[Byte]): Option[(Int, Int, Int, Int)] = {
    if (b.length < 54) return None
    def le32(o: Int): Int =
      (b(o) & 0xff) | (b(o + 1) & 0xff) << 8 |
        (b(o + 2) & 0xff) << 16 | (b(o + 3) & 0xff) << 24
    def le16(o: Int): Int = (b(o) & 0xff) | (b(o + 1) & 0xff) << 8
    val off = le32(10)
    if (le32(14) < 40) return None // DIB header must be BITMAPINFOHEADER+
    val w = le32(18)
    val hRaw = le32(22)
    val h = math.abs(hRaw)
    if (w <= 0 || h <= 0 || le16(28) != 24 || le32(30) != 0) return None
    // reject dimension claims that cannot fit a JVM byte array BEFORE the
    // row arithmetic: w*3 overflows Int past ~715M and rowSize*h can
    // overflow Long on crafted headers, which would corrupt the bounds
    // check below and turn "total on arbitrary bytes" into an
    // out-of-bounds crash
    if (w > (Int.MaxValue - 3) / 3 || w.toLong * h > Int.MaxValue) return None
    val rowSize = ((w * 3 + 3) / 4) * 4
    if (off < 54 || off.toLong + rowSize.toLong * h > b.length) return None
    Some((w, hRaw, off, rowSize))
  }

  private def decodeBmp(b: Array[Byte]): Option[Decoded] =
    bmpHeader(b).map { case (w, hRaw, off, rowSize) =>
      val h = math.abs(hRaw) // sums are row-order-free
      var (sr, sg, sb) = (0L, 0L, 0L)
      var row = 0
      while (row < h) {
        val base = off + row * rowSize
        var x = 0
        while (x < w) {
          val p = base + x * 3
          sb += b(p) & 0xff; sg += b(p + 1) & 0xff; sr += b(p + 2) & 0xff
          x += 1
        }
        row += 1
      }
      Decoded("bmp", w, h, 3, sr, sg, sb)
    }

  /** Full-pixel decode result: top-down row-major RGB triplets — the
    * uniform in-memory layout whatever the container's row order or
    * channel order was.
    */
  final case class DecodedPixels(format: String, width: Int, height: Int,
      pix: Array[Byte])

  /** Decode to full pixels (top-down RGB), with the same total-on-
    * arbitrary-bytes guards as [[decode]]. Allocates width*height*3 —
    * meant for the thumbnail-scale transform path, where the decoded
    * frame feeds a resize/feature step rather than a streaming sum.
    */
  def decodePixels(b: Array[Byte]): Option[DecodedPixels] =
    if (b == null || b.length < 2) None
    else if (b(0) == 'P' && b(1) == '6')
      ppmHeader(b).map { case (w, h, off) =>
        val pix = new Array[Byte](w * h * 3)
        System.arraycopy(b, off, pix, 0, w * h * 3)
        DecodedPixels("ppm", w, h, pix)
      }
    else if (b(0) == 'B' && b(1) == 'M')
      bmpHeader(b).map { case (w, hRaw, off, rowSize) =>
        val h = math.abs(hRaw)
        val pix = new Array[Byte](w * h * 3)
        var row = 0
        while (row < h) {
          // positive height = bottom-up storage; negative = top-down
          val destRow = if (hRaw > 0) h - 1 - row else row
          val base = off + row * rowSize
          var x = 0
          while (x < w) {
            val s = base + x * 3
            val d = (destRow * w + x) * 3
            pix(d) = b(s + 2)     // R (BMP stores BGR)
            pix(d + 1) = b(s + 1) // G
            pix(d + 2) = b(s)     // B
            x += 1
          }
          row += 1
        }
        DecodedPixels("bmp", w, h, pix)
      }
    else None

  /** Nearest-neighbor resize to ow×oh: output pixel (x, y) samples
    * source pixel (floor(x*w/ow), floor(y*h/oh)) — the integer mapping
    * an ANSI-SQL oracle can recompute exactly, and the deterministic
    * downsample a frame-thumbnail pipeline runs before feature
    * extraction.
    */
  def resizeNearest(src: DecodedPixels, ow: Int, oh: Int): Array[Byte] = {
    require(ow > 0 && oh > 0, s"resize target must be positive, got ${ow}x$oh")
    val out = new Array[Byte](ow * oh * 3)
    var y = 0
    while (y < oh) {
      val sy = (y.toLong * src.height / oh).toInt
      var x = 0
      while (x < ow) {
        val sx = (x.toLong * src.width / ow).toInt
        val s = (sy * src.width + sx) * 3
        val d = (y * ow + x) * 3
        out(d) = src.pix(s); out(d + 1) = src.pix(s + 1)
        out(d + 2) = src.pix(s + 2)
        x += 1
      }
      y += 1
    }
    out
  }

  // ---- encoders (used by the synthetic media table + specs) ----

  /** Binary PPM from row-major RGB triplets (pix.length == w*h*3). */
  def encodePpm(w: Int, h: Int, pix: Array[Byte]): Array[Byte] = {
    require(pix.length == w * h * 3, "pix must be w*h RGB triplets")
    val header = s"P6\n$w $h\n255\n".getBytes("US-ASCII")
    val out = new Array[Byte](header.length + pix.length)
    System.arraycopy(header, 0, out, 0, header.length)
    System.arraycopy(pix, 0, out, header.length, pix.length)
    out
  }

  /** Bottom-up 24-bit BI_RGB BMP from row-major RGB triplets (top row
    * first in `pix`; rows are flipped and re-ordered to BGR here).
    */
  def encodeBmp(w: Int, h: Int, pix: Array[Byte]): Array[Byte] = {
    require(pix.length == w * h * 3, "pix must be w*h RGB triplets")
    val rowSize = ((w * 3 + 3) / 4) * 4
    val size = 54 + rowSize * h
    val out = new Array[Byte](size)
    def le32(o: Int, v: Int): Unit = {
      out(o) = v.toByte; out(o + 1) = (v >> 8).toByte
      out(o + 2) = (v >> 16).toByte; out(o + 3) = (v >> 24).toByte
    }
    def le16(o: Int, v: Int): Unit = {
      out(o) = v.toByte; out(o + 1) = (v >> 8).toByte
    }
    out(0) = 'B'; out(1) = 'M'
    le32(2, size); le32(10, 54)
    le32(14, 40); le32(18, w); le32(22, h)
    le16(26, 1); le16(28, 24); le32(30, 0); le32(34, rowSize * h)
    var row = 0
    while (row < h) {
      val srcRow = h - 1 - row // bottom-up
      val base = 54 + row * rowSize
      var x = 0
      while (x < w) {
        val s = (srcRow * w + x) * 3
        out(base + x * 3) = pix(s + 2)     // B
        out(base + x * 3 + 1) = pix(s + 1) // G
        out(base + x * 3 + 2) = pix(s)     // R
        x += 1
      }
      row += 1
    }
    out
  }
}
