package graft.functions

import java.nio.{ByteBuffer, ByteOrder}

/** Decoded 16-bit PCM WAV facts: header fields plus exact integer
  * payload statistics (peak = max |sample|, sumSq = Σ sample² — both
  * order-independent, so any partitioning reports identical values).
  */
final case class WavData(
    sampleRate: Int,
    channels: Int,
    bitsPerSample: Int,
    nSamples: Int,
    peak: Int,
    sumSq: Long)

/** Pure-JVM RIFF/WAVE codec (mono 16-bit PCM): header + chunk walk +
  * sample scan, no audio jars — the audio sibling of [[ImageCodec]].
  * The decoder is TOTAL on arbitrary bytes (None instead of a task
  * failure) and walks unknown chunks (LIST/INFO metadata, word-aligned
  * per the RIFF spec) instead of assuming fmt/data adjacency — real
  * in-the-wild WAV files carry such chunks before the payload.
  */
object AudioCodec {

  private val Ascii = java.nio.charset.StandardCharsets.US_ASCII

  /** Encode mono 16-bit PCM; `junkChunk` inserts a LIST/INFO chunk
    * between fmt and data to exercise the decoder's chunk walk.
    */
  def encodeWav(
      sampleRate: Int,
      samples: Array[Short],
      junkChunk: Boolean = false): Array[Byte] = {
    require(sampleRate > 0, s"sampleRate must be positive, got $sampleRate")
    val dataLen = samples.length * 2
    val junkLen = if (junkChunk) 8 + 4 else 0
    val riffLen = 4 + (8 + 16) + junkLen + (8 + dataLen)
    val buf = ByteBuffer.allocate(8 + riffLen).order(ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes(Ascii)).putInt(riffLen).put("WAVE".getBytes(Ascii))
    buf.put("fmt ".getBytes(Ascii)).putInt(16)
      .putShort(1) // PCM
      .putShort(1) // mono
      .putInt(sampleRate)
      .putInt(sampleRate * 2) // byte rate
      .putShort(2)            // block align
      .putShort(16)           // bits per sample
    if (junkChunk)
      buf.put("LIST".getBytes(Ascii)).putInt(4).put("INFO".getBytes(Ascii))
    buf.put("data".getBytes(Ascii)).putInt(dataLen)
    var i = 0
    while (i < samples.length) { buf.putShort(samples(i)); i += 1 }
    buf.array()
  }

  /** Shared RIFF chunk walk: validates the header, enforces mono 16-bit
    * PCM, and hands the positioned data chunk (sample count + buffer) to
    * `onData` together with the fmt facts. Total on arbitrary bytes.
    */
  private def walk[A](bytes: Array[Byte])(
      onData: (Int, Int, Int, Int, ByteBuffer) => A): Option[A] = {
    if (bytes == null || bytes.length < 12) return None
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    def tag(): String = {
      val b = new Array[Byte](4); buf.get(b); new String(b, Ascii)
    }
    try {
      if (tag() != "RIFF") return None
      buf.getInt // riff size (trust actual buffer bounds instead)
      if (tag() != "WAVE") return None
      var fmt: Option[(Int, Int, Int)] = None // (channels, rate, bits)
      while (buf.remaining() >= 8) {
        val id = tag()
        val len = buf.getInt
        if (len < 0 || len > buf.remaining()) return None
        id match {
          case "fmt " =>
            if (len < 16) return None
            val p = buf.position()
            val audioFormat = buf.getShort
            val channels = buf.getShort.toInt
            val rate = buf.getInt
            buf.getInt   // byte rate
            buf.getShort // block align
            val bits = buf.getShort.toInt
            if (audioFormat != 1 || channels != 1 || bits != 16) return None
            fmt = Some((channels, rate, bits))
            buf.position(p + len + (len & 1)) // chunks are word-aligned
          case "data" =>
            val (channels, rate, bits) = fmt.getOrElse(return None)
            return Some(onData(channels, rate, bits, len / 2, buf))
          case _ =>
            buf.position(buf.position() + len + (len & 1))
        }
      }
      None // no data chunk
    } catch {
      case _: RuntimeException => None // BufferUnderflow et al: corrupt bytes
    }
  }

  /** Total decode: None on null/truncated/non-WAV bytes. */
  def decode(bytes: Array[Byte]): Option[WavData] =
    walk(bytes) { (channels, rate, bits, n, buf) =>
      var peak = 0
      var sumSq = 0L
      var i = 0
      while (i < n) {
        val s = buf.getShort.toInt
        val a = math.abs(s)
        if (a > peak) peak = a
        sumSq += s.toLong * s
        i += 1
      }
      WavData(rate, channels, bits, n, peak, sumSq)
    }

  /** Per-window energy decode for segmentation: Σ sample² over each
    * `win`-sample window (tail window partial). Exact integer energies —
    * any partitioning and any engine reports identical values.
    */
  def decodeWindows(bytes: Array[Byte], win: Int): Option[(Int, Int, Array[Long])] = {
    require(win > 0, s"win must be positive, got $win")
    walk(bytes) { (_, rate, _, n, buf) =>
      val energies = new Array[Long]((n + win - 1) / win)
      var i = 0
      while (i < n) {
        val s = buf.getShort.toLong
        energies(i / win) += s * s
        i += 1
      }
      (rate, n, energies)
    }
  }
}
