package graft.functions

/** Minimal deterministic video container ("GVID") for the multimodal
  * frame-sampling tier (q269): a 7-byte header — magic `GVID`, then
  * unsigned width, height, frame count — followed by `nframes`
  * grayscale frames of `w*h` bytes each. Stands in for a real codec the
  * way ImageCodec's PPM/BMP stand in for JPEG: the container parse,
  * bounds checking, frame addressing, and the Spark-side plumbing
  * (binary column → mapPartitions codec → typed features) are real;
  * only the compression is absent, which keeps every decoded pixel
  * ANSI-SQL-recomputable so the WHOLE chain grades against a full
  * DuckDB oracle instead of a frozen golden.
  */
object VideoCodec {

  final case class Gvid(width: Int, height: Int, nFrames: Int,
      pixels: Array[Byte]) {
    /** Pixel value (0-255) of frame f at (x, y). */
    def at(f: Int, x: Int, y: Int): Int =
      pixels(f * width * height + y * width + x) & 0xff
  }

  private val Magic = Array[Byte]('G', 'V', 'I', 'D')

  /** Encode `nFrames` frames whose pixel at (f, x, y) is `pixel(f,x,y)`
    * (caller returns 0-255).
    */
  def encode(w: Int, h: Int, nFrames: Int,
      pixel: (Int, Int, Int) => Int): Array[Byte] = {
    require(w > 0 && w < 256 && h > 0 && h < 256 &&
      nFrames > 0 && nFrames < 256, s"out of GVID range: $w x $h x $nFrames")
    val out = new Array[Byte](7 + nFrames * w * h)
    Magic.copyToArray(out)
    out(4) = w.toByte
    out(5) = h.toByte
    out(6) = nFrames.toByte
    var i = 7
    var f = 0
    while (f < nFrames) {
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          out(i) = pixel(f, x, y).toByte
          i += 1
          x += 1
        }
        y += 1
      }
      f += 1
    }
    out
  }

  /** Total decode: None on null, bad magic, or a payload whose length
    * disagrees with its header (the truncated-upload case) — corrupt
    * blobs become graded 'corrupt' rows, never failed tasks.
    */
  def decode(b: Array[Byte]): Option[Gvid] =
    if (b == null || b.length < 7 ||
      b(0) != Magic(0) || b(1) != Magic(1) ||
      b(2) != Magic(2) || b(3) != Magic(3)) None
    else {
      val w = b(4) & 0xff
      val h = b(5) & 0xff
      val nf = b(6) & 0xff
      if (w == 0 || h == 0 || nf == 0 || b.length != 7 + nf * w * h) None
      else Some(Gvid(w, h, nf, java.util.Arrays.copyOfRange(b, 7, b.length)))
    }
}
