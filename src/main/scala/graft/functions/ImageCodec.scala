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

  private def decodePpm(b: Array[Byte]): Option[Decoded] = {
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
    val pixels = w * h
    if (b.length - i < pixels * 3) return None
    var (sr, sg, sb) = (0L, 0L, 0L)
    var p = i
    var n = 0L
    while (n < pixels) {
      sr += b(p) & 0xff; sg += b(p + 1) & 0xff; sb += b(p + 2) & 0xff
      p += 3; n += 1
    }
    Some(Decoded("ppm", w.toInt, h.toInt, 3, sr, sg, sb))
  }

  private def decodeBmp(b: Array[Byte]): Option[Decoded] = {
    if (b.length < 54) return None
    def le32(o: Int): Int =
      (b(o) & 0xff) | (b(o + 1) & 0xff) << 8 |
        (b(o + 2) & 0xff) << 16 | (b(o + 3) & 0xff) << 24
    def le16(o: Int): Int = (b(o) & 0xff) | (b(o + 1) & 0xff) << 8
    val off = le32(10)
    if (le32(14) < 40) return None // DIB header must be BITMAPINFOHEADER+
    val w = le32(18)
    val hRaw = le32(22) // negative height = top-down; sums are order-free
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
    Some(Decoded("bmp", w, h, 3, sr, sg, sb))
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
