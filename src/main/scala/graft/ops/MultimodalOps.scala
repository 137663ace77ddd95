package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.QueryDef
import graft.util.Tables._

/** Multimodal-column plumbing (SURVEY §7.4): media payloads are opaque
  * `binary` columns with typed metadata alongside, decoded partition-wise
  * into a feature struct. The decode is REAL: [[graft.functions.ImageCodec]]
  * parses binary PPM (P6) and 24-bit BI_RGB BMP — header + pixel walk,
  * pure JVM, no codec jars — and returns true dimensions and exact
  * per-channel means; arbitrary bytes degrade to a format='unknown' row
  * instead of a task failure. Only the media ACQUISITION is synthetic
  * (the test tables carry no binary column, so [[mediaTable]] renders a
  * deterministic valid image per document); on a cluster that one
  * generator UDF is replaced by the real blob column and the decode path
  * runs unchanged.
  */
object MultimodalOps {

  /** Decoded media features. Means are exact integer channel sums divided
    * as doubles — bit-stable across partitionings and engines.
    */
  final case class MediaFeatures(
      doc_id: Long,
      n_bytes: Int,
      format: String,
      width: Int,
      height: Int,
      channels: Int,
      mean_r: Double,
      mean_g: Double,
      mean_b: Double)

  /** Synthetic media acquisition: render each document a small real image
    * (alternating P6 PPM / BMP by doc parity), sized and pixel-filled by a
    * splitmix-style generator seeded from the text bytes — deterministic,
    * so the golden oracle freezes a reproducible table. Null text yields a
    * null payload (the corrupt-blob path stays graded).
    */
  def mediaTable(docs: DataFrame): DataFrame = {
    val render = udf((id: Long, text: String) =>
      if (text == null) null
      else {
        val seed = text.getBytes("UTF-8")
          .foldLeft(17L)((a, b) => (a * 31 + (b & 0xff)) % 1000003L)
        val w = 4 + (seed % 9).toInt
        val h = 4 + ((seed / 9) % 7).toInt
        var x = seed * 6364136223846793005L + 1442695040888963407L
        val pix = Array.fill(w * h * 3) {
          x = x * 6364136223846793005L + 1442695040888963407L
          (x >>> 56).toByte
        }
        if (id % 2 == 0) graft.functions.ImageCodec.encodePpm(w, h, pix)
        else graft.functions.ImageCodec.encodeBmp(w, h, pix)
      }: Array[Byte])
    docs.select(col("doc_id"),
      render(col("doc_id"), col("text")).as("payload"))
  }

  /** Partition-wise decode: one iterator pass per partition, no collect —
    * the exact shape a mapInPandas/JNI codec call takes at scale. Total on
    * arbitrary bytes: unparseable payloads become format='unknown' rows
    * with zeroed features rather than failed tasks.
    */
  def decodeFeatures(spark: SparkSession, media: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, bytes) =>
          val n = if (bytes == null) 0 else bytes.length
          graft.functions.ImageCodec.decode(bytes) match {
            case Some(d) =>
              val px = d.width.toLong * d.height
              MediaFeatures(id, n, d.format, d.width, d.height, d.channels,
                d.sumR.toDouble / px, d.sumG.toDouble / px, d.sumB.toDouble / px)
            case None =>
              MediaFeatures(id, n, "unknown", 0, 0, 0, 0.0, 0.0, 0.0)
          }
        }
      }
  }

  /** Decoded audio facts for the graded output: header fields the
    * acquisition derived from SQL-visible metadata (so a full DuckDB
    * oracle can recompute them) plus exact integer payload statistics.
    */
  final case class AudioFeatures(
      doc_id: Long,
      format: String,
      sample_rate: Int,
      n_samples: Int,
      duration_us: Long,
      peak: Int,
      sum_sq: Long)

  /** Synthetic audio acquisition: a mono 16-bit PCM square wave per
    * document whose header/payload parameters are functions of
    * SQL-visible metadata ONLY — rate = 8000 + 1000·(doc_id mod 4),
    * n_samples = 50 + (n_chars mod 100), amplitude = 1000 + 3000·(doc_id
    * mod 7) — so unlike the image tier's seeded-noise golden, the WAV
    * decode grades against a FULL DuckDB oracle: peak must equal the
    * amplitude and sum_sq must equal n·amp² or the parse is wrong. Odd
    * doc_ids get a LIST/INFO chunk between fmt and data, putting the
    * decoder's chunk walk inside the graded path. Null text → null
    * payload (the corrupt-blob row stays graded as format='unknown').
    */
  def audioTable(docs: DataFrame): DataFrame = {
    val render = udf((id: Long, nChars: Long, hasText: Boolean) =>
      if (!hasText) null
      else {
        val rate = (8000 + 1000 * (id % 4)).toInt
        val n = (50 + (nChars % 100)).toInt
        val amp = (1000 + (id % 7) * 3000).toShort
        val samples = Array.tabulate(n)(i =>
          if ((i / 4) % 2 == 0) amp else (-amp).toShort)
        graft.functions.AudioCodec.encodeWav(rate, samples,
          junkChunk = id % 2 == 1)
      }: Array[Byte])
    docs.select(col("doc_id"),
      render(col("doc_id"), coalesce(col("n_chars"), lit(0L)),
        col("text").isNotNull).as("payload"))
  }

  /** Partition-wise audio decode — same iterator shape as the image
    * tier (one pass, no collect; the slot a JNI/ffmpeg call takes at
    * scale). duration_us is integer microseconds (BIGINT floor divide,
    * engine-identical).
    */
  def decodeAudio(spark: SparkSession, media: DataFrame): Dataset[AudioFeatures] = {
    import spark.implicits._
    media.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, bytes) =>
          graft.functions.AudioCodec.decode(bytes) match {
            case Some(w) =>
              AudioFeatures(id, "wav16", w.sampleRate, w.nSamples,
                w.nSamples.toLong * 1000000L / w.sampleRate, w.peak, w.sumSq)
            case None => AudioFeatures(id, "unknown", 0, 0, 0L, 0, 0L)
          }
        }
      }
  }

  /** One voiced segment of a decoded waveform (q280). */
  final case class AudioSegment(
      doc_id: Long,
      seg_idx: Int,
      start_us: Long,
      end_us: Long,
      n_windows: Int)

  /** Synthetic GAPPED audio acquisition (q280): the q189 square wave
    * with a silence pattern — every third 16-sample phase is zeroed
    * ((i div 16) mod 3 = 2) — so segmentation has real work to do and
    * the segment list stays a pure function of SQL-visible metadata
    * (rate, n_chars): a full DuckDB oracle replays it, no golden.
    */
  def gappedAudioTable(docs: DataFrame): DataFrame = {
    val render = udf((id: Long, nChars: Long, hasText: Boolean) =>
      if (!hasText) null
      else {
        val rate = (8000 + 1000 * (id % 4)).toInt
        val n = (50 + (nChars % 100)).toInt
        val amp = (1000 + (id % 7) * 3000).toShort
        val samples = Array.tabulate(n)(i =>
          if ((i / 16) % 3 == 2) 0.toShort
          else if ((i / 4) % 2 == 0) amp else (-amp).toShort)
        graft.functions.AudioCodec.encodeWav(rate, samples,
          junkChunk = id % 2 == 1)
      }: Array[Byte])
    docs.select(col("doc_id"),
      render(col("doc_id"), coalesce(col("n_chars"), lit(0L)),
        col("text").isNotNull).as("payload"))
  }

  /** q280 body: voice-activity segmentation — the speech-corpus chunking
    * pass (split recordings at silence before transcription/training).
    * Per-window Σsample² energies come from ONE codec pass
    * ([[graft.functions.AudioCodec.decodeWindows]]), and the
    * gaps-and-islands merge of voiced windows into segments runs
    * ROW-LOCALLY over the per-doc energy array (bounded by the clip
    * length) — no explode, no per-window shuffle, no window function:
    * a billion clips segment at scan speed, one row in, k segment rows
    * out. Timestamps are exact integer microseconds (BIGINT floor
    * divide); the tail window clamps end_us to the true sample count.
    * Corrupt/null payloads yield NO segments (the decoder is total).
    */
  def audioSegments(spark: SparkSession, media: DataFrame,
      win: Int = 16): Dataset[AudioSegment] = {
    import spark.implicits._
    media.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        graft.functions.AudioCodec.decodeWindows(bytes, win) match {
          case None => Iterator.empty
          case Some((rate, n, en)) =>
            val segs = Iterator.unfold(0) { w0 =>
              var a = w0
              while (a < en.length && en(a) == 0L) a += 1
              if (a >= en.length) None
              else {
                var b = a
                while (b < en.length && en(b) > 0L) b += 1
                Some(((a, b), b))
              }
            }
            segs.zipWithIndex.map { case ((a, b), k) =>
              AudioSegment(id, k + 1,
                a.toLong * win * 1000000L / rate,
                math.min(b.toLong * win, n.toLong) * 1000000L / rate,
                b - a)
            }
        }
      }
  }

  /** Resized-thumbnail facts for the graded transform output: container
    * dims plus the exact integer sum of every byte of the 4×4
    * nearest-neighbor thumbnail.
    */
  final case class ThumbFeatures(
      doc_id: Long,
      format: String,
      width: Int,
      height: Int,
      resized_sum: Long)

  /** Synthetic PATTERN image acquisition (q215): unlike [[mediaTable]]'s
    * seeded noise, every pixel is a pure integer function of SQL-visible
    * metadata — dims w = 4 + id mod 9, h = 4 + id mod 7, and channel
    * values (x·7 + y·13 + id) / (x·3 + y·5 + 2id) / (x·11 + y + 3id)
    * mod 256 — so the decode→resize path grades against a FULL DuckDB
    * oracle that replays the sampling arithmetic: a real bug anywhere in
    * the header parse, row un-flipping, BGR swap, or the resize index
    * map cannot hash-match. Even ids encode as PPM, odd as BMP, putting
    * both container walks inside the graded path.
    */
  def patternImageTable(docs: DataFrame): DataFrame = {
    val render = udf((id: Long) => {
      val w = (4 + id % 9).toInt
      val h = (4 + id % 7).toInt
      val pix = new Array[Byte](w * h * 3)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val o = (y * w + x) * 3
          pix(o) = ((x * 7 + y * 13 + id) % 256).toByte
          pix(o + 1) = ((x * 3 + y * 5 + 2 * id) % 256).toByte
          pix(o + 2) = ((x * 11 + y + 3 * id) % 256).toByte
          x += 1
        }
        y += 1
      }
      if (id % 2 == 0) graft.functions.ImageCodec.encodePpm(w, h, pix)
      else graft.functions.ImageCodec.encodeBmp(w, h, pix)
    })
    docs.select(col("doc_id"), render(col("doc_id")).as("payload"))
  }

  /** q293 body: media-binary deduplication — the missing third leg next
    * to text dedup (q23+) and embedding dedup (q43/q118): cluster
    * decoded images by their exact thumbnail fingerprint
    * (format, w, h, 4×4 resized byte sum — the q215 signature, computed
    * by the REAL decode+resize path). Equal pixels ⇒ equal signature,
    * so re-uploads collapse no matter what id/filename they arrived
    * under; distinct-but-similar images stay apart (exact media dedup —
    * a perceptual near-dup tier would quantize the grid before hashing,
    * same plan shape). The acquisition keys the q215 pattern render on
    * doc_id mod 97, so every 97th document "uploads" a byte-identical
    * image — the re-upload population a media lake actually carries.
    *
    * Scale shape: the decode (the codec slot) runs once per DISTINCT
    * payload, not per document — signatures join back to documents on
    * the narrow media key, the dedup pass is ONE shuffle on the
    * signature tuple, and the output is cluster-bounded. Full SQL
    * oracle: q215's pixel-replay arithmetic wrapped in the dedup
    * GROUP BY. Output: one row per non-singleton cluster with the
    * canonical (min) member.
    */
  def mediaDedup(spark: SparkSession, docs: DataFrame): DataFrame = {
    val keyed = docs.select(col("doc_id"), (col("doc_id") % 97).as("media_key"))
    val payloads = patternImageTable(
      keyed.select(col("media_key").as("doc_id")).distinct())
    val sigs = thumbnailFeatures(spark, payloads).toDF()
      .select(col("doc_id").as("media_key"), col("format"),
        col("width"), col("height"), col("resized_sum"))
    keyed.join(sigs, Seq("media_key"))
      .groupBy("format", "width", "height", "resized_sum")
      .agg(min(col("doc_id")).as("canonical_id"),
        count(lit(1)).as("n_members"))
      .where(col("n_members") >= 2)
      .orderBy("canonical_id")
  }

  /** The q293 oracle parameterized by a survivor predicate on
    * `documents` — TRUE gives the full-corpus oracle; the takedown
    * replays (q380) grade against the survivors-only rebuild.
    */
  private[graft] def mediaDedupSqlOn(pred: String): String =
    s"""WITH g AS (
      |  SELECT gx.range AS ox, gy.range AS oy
      |  FROM range(4) gx, range(4) gy),
      |d AS (
      |  SELECT doc_id, doc_id % 97 AS k,
      |    4 + (doc_id % 97) % 9 AS w, 4 + (doc_id % 97) % 7 AS h
      |  FROM documents WHERE $pred),
      |px AS (
      |  SELECT doc_id, k, w, h,
      |    (ox * w) // 4 AS sx, (oy * h) // 4 AS sy
      |  FROM d, g),
      |v AS (
      |  SELECT doc_id, k, w, h,
      |    (sx * 7 + sy * 13 + k) % 256
      |      + (sx * 3 + sy * 5 + 2 * k) % 256
      |      + (sx * 11 + sy + 3 * k) % 256 AS s
      |  FROM px),
      |sig AS (
      |  SELECT doc_id,
      |    CASE WHEN k % 2 = 0 THEN 'ppm' ELSE 'bmp' END AS format,
      |    CAST(w AS INT) AS width, CAST(h AS INT) AS height,
      |    CAST(SUM(s) AS BIGINT) AS resized_sum
      |  FROM v GROUP BY doc_id, k, w, h)
      |SELECT format, width, height, resized_sum,
      |  CAST(MIN(doc_id) AS BIGINT) AS canonical_id,
      |  CAST(COUNT(*) AS BIGINT) AS n_members
      |FROM sig GROUP BY 1, 2, 3, 4
      |HAVING COUNT(*) >= 2 ORDER BY canonical_id""".stripMargin

  private[graft] val mediaDedupSql: String = mediaDedupSqlOn("TRUE")

  /** Partition-wise decode → nearest-neighbor 4×4 thumbnail → exact
    * byte-sum fingerprint. Same iterator shape as [[decodeFeatures]];
    * this is the frame-sample/resize step of a media pipeline, with the
    * resize's integer index map (floor(x·w/4)) chosen so ANSI SQL can
    * recompute the thumbnail exactly.
    */
  def thumbnailFeatures(spark: SparkSession, media: DataFrame): Dataset[ThumbFeatures] = {
    import spark.implicits._
    media.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, bytes) =>
          graft.functions.ImageCodec.decodePixels(bytes) match {
            case Some(d) =>
              val thumb = graft.functions.ImageCodec.resizeNearest(d, 4, 4)
              var s = 0L
              var i = 0
              while (i < thumb.length) { s += thumb(i) & 0xff; i += 1 }
              ThumbFeatures(id, d.format, d.width, d.height, s)
            case None => ThumbFeatures(id, "unknown", 0, 0, 0L)
          }
        }
      }
  }

  /** One perceptually-hashed media payload variant: vb identifies the
    * distinct (pattern, brightness) payload, phash is the 32-bit
    * (16 cells × 2 bits) quantized-grid code.
    */
  final case class PerceptualHash(vb: Long, format: String, phash: Long)

  /** Synthetic BRIGHTNESS-VARIANT image acquisition (q300): the q215
    * pattern family with channel values bounded to [0, 195] and a flat
    * brightness offset b ∈ {0, 30, 60} added to every channel (195 + 60
    * = 255 — never wraps, so "brighter" stays a pure luminance shift,
    * exactly what a re-exported/re-graded upload looks like). Every
    * pixel stays a pure integer function of (k, b), so the whole
    * decode → resize → quantize chain grades against a FULL DuckDB
    * oracle. Even k encode as PPM, odd as BMP.
    */
  def brightnessImageTable(variants: DataFrame): DataFrame = {
    val render = udf((k: Long, b: Long) => {
      val w = (4 + k % 9).toInt
      val h = (4 + k % 7).toInt
      val pix = new Array[Byte](w * h * 3)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val o = (y * w + x) * 3
          pix(o) = ((x * 7 + y * 13 + k) % 196 + b).toByte
          pix(o + 1) = ((x * 3 + y * 5 + 2 * k) % 196 + b).toByte
          pix(o + 2) = ((x * 11 + y + 3 * k) % 196 + b).toByte
          x += 1
        }
        y += 1
      }
      if (k % 2 == 0) graft.functions.ImageCodec.encodePpm(w, h, pix)
      else graft.functions.ImageCodec.encodeBmp(w, h, pix)
    })
    variants.select(col("vb"), render(col("k"), col("b")).as("payload"))
  }

  /** Partition-wise perceptual hash: REAL decode → 4×4 nearest-neighbor
    * thumbnail → per-cell luma (R+G+B, 0..765) → MEAN-CENTERED 2-bit
    * quantization → 32-bit grid code. The mean-centering is the whole
    * point: a flat brightness shift b adds 3b to every cell and 48b to
    * the 16-cell sum, so `16·luma vs S ± 16T` is invariant — shifted
    * re-uploads collapse to the SAME code while structurally different
    * images (different spatial pattern) land elsewhere. All integer
    * (the only "division" is cross-multiplied away), T = 48 luma units.
    */
  def perceptualHashes(spark: SparkSession, media: DataFrame): Dataset[PerceptualHash] = {
    import spark.implicits._
    media.select(col("vb"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, bytes) =>
          graft.functions.ImageCodec.decodePixels(bytes) match {
            case Some(d) =>
              val thumb = graft.functions.ImageCodec.resizeNearest(d, 4, 4)
              val luma = Array.tabulate(16)(i =>
                (thumb(3 * i) & 0xff) + (thumb(3 * i + 1) & 0xff) +
                  (thumb(3 * i + 2) & 0xff))
              val s = luma.sum.toLong
              var code = 0L
              var i = 0
              while (i < 16) {
                val v16 = 16L * luma(i)
                val lvl =
                  if (v16 < s - 768L) 0L
                  else if (v16 < s) 1L
                  else if (v16 < s + 768L) 2L
                  else 3L
                code |= lvl << (2 * i)
                i += 1
              }
              PerceptualHash(id, d.format, code)
            case None => PerceptualHash(id, "unknown", -1L)
          }
        }
      }
  }

  /** Synthetic SENSOR-NOISE image acquisition (q317): the q300 pattern
    * family at channel bound [0, 195], with variant n = 1 adding +48 to
    * all three channels of pixel (0, 0) ONLY (196 − 1 + 48 = 243 —
    * never wraps) — the single-hot-pixel / re-crop-corner damage a
    * perceptual matcher must absorb. Pixel (0, 0) is always sampled by
    * thumbnail cell 0, so the noisy twin's grid code shifts by a few
    * bits (cell 0's level, plus any cell the +144 mean shift pushes
    * across a quantization boundary) instead of collapsing exactly —
    * the population Hamming-radius matching exists for. Every pixel
    * stays a pure integer function of (k, n): full DuckDB pixel-replay
    * oracle, the q300 doctrine.
    */
  def noiseImageTable(variants: DataFrame): DataFrame = {
    val render = udf((k: Long, n: Long) => {
      val w = (4 + k % 9).toInt
      val h = (4 + k % 7).toInt
      val pix = new Array[Byte](w * h * 3)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val o = (y * w + x) * 3
          val bump = if (n == 1L && x == 0 && y == 0) 48 else 0
          pix(o) = ((x * 7 + y * 13 + k) % 196 + bump).toByte
          pix(o + 1) = ((x * 3 + y * 5 + 2 * k) % 196 + bump).toByte
          pix(o + 2) = ((x * 11 + y + 3 * k) % 196 + bump).toByte
          x += 1
        }
        y += 1
      }
      if (k % 2 == 0) graft.functions.ImageCodec.encodePpm(w, h, pix)
      else graft.functions.ImageCodec.encodeBmp(w, h, pix)
    })
    variants.select(col("vb"), render(col("k"), col("n")).as("payload"))
  }

  /** q317 body: Hamming-RADIUS perceptual matching via multi-index
    * hashing (Norouzi et al. 2012 — the pHash-at-scale search
    * structure): q300 collapses byte-shifted re-uploads whose codes are
    * IDENTICAL, but a hot pixel / corner crop lands the code a few bits
    * off, and matching within Hamming radius r over 100 TB cannot be an
    * all-pairs scan. MIH splits the 32-bit code into 4 disjoint 8-bit
    * bands; by PIGEONHOLE, two codes within Hamming distance r ≤ 3
    * agree exactly on at least one band, so candidates come from 4
    * band-keyed equi-joins (bucket joins, never a cross product) and a
    * row-local bit_count(xor) ≤ r verify trims them. With r = m − 1 the
    * structure is EXACT — and that theorem is what the grade checks:
    * the engine runs MIH, the DuckDB oracle brute-forces all pairs on
    * the variant-bounded code relation, and the hash match IS the
    * no-missed-pair proof. Output: every unordered variant pair within
    * radius 3, its distance, and whether the two variants share a
    * pattern (the ground-truth label a matcher is tuned against).
    *
    * Scale shape: the codec pass runs once per DISTINCT (k, n) variant;
    * the band relation is 4 rows per code; candidates are bounded by
    * band-bucket populations (the known MIH trade — code-space skew
    * concentrates buckets; band count is the knob) and dedup + verify
    * are candidate-bounded. No stage is quadratic in the corpus.
    */
  def hammingNearDup(spark: SparkSession, docs: DataFrame,
      radius: Int = 3): DataFrame = {
    require(radius <= 3, s"4 bands are exact only to radius 3, got $radius")
    val keyed = docs.select(col("doc_id"),
      (col("doc_id") % 89).as("k"), (col("doc_id") % 2).as("n"),
      ((col("doc_id") % 89) * 2 + col("doc_id") % 2).as("vb"))
    val variants = keyed.select(col("vb"), col("k"), col("n")).distinct()
    val hashes = perceptualHashes(spark, noiseImageTable(variants))
      .toDF().select(col("vb"), col("phash"))
    val coded = variants.join(hashes, Seq("vb"))
      .select(col("vb"), col("k"), col("phash"))
    val bands = coded
      .select(col("vb"), col("k"), col("phash"),
        explode(typedLit(Seq(0, 1, 2, 3))).as("band"))
      .withColumn("bv", expr(
        """CASE band WHEN 0 THEN phash & 255
          |  WHEN 1 THEN shiftright(phash, 8) & 255
          |  WHEN 2 THEN shiftright(phash, 16) & 255
          |  ELSE shiftright(phash, 24) & 255 END""".stripMargin))
    bands.as("a").join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.bv") === col("b.bv") &&
          col("a.vb") < col("b.vb"))
      .select(col("a.vb").as("vb_a"), col("b.vb").as("vb_b"),
        col("a.phash").as("pa"), col("b.phash").as("pb"),
        col("a.k").as("k_a"), col("b.k").as("k_b"))
      .dropDuplicates("vb_a", "vb_b")
      .withColumn("hamming", expr("CAST(bit_count(pa ^ pb) AS INT)"))
      .where(col("hamming") <= radius)
      .select(col("vb_a"), col("vb_b"), col("hamming"),
        (col("k_a") === col("k_b")).as("same_pattern"))
      .orderBy("vb_a", "vb_b")
  }

  private val hammingNearDupSql: String =
    """WITH g AS (
      |  SELECT gx.range AS ox, gy.range AS oy
      |  FROM range(4) gx, range(4) gy),
      |d AS (
      |  SELECT doc_id, doc_id % 89 AS k, doc_id % 2 AS n
      |  FROM documents),
      |var AS (SELECT DISTINCT k, n, k * 2 + n AS vb FROM d),
      |px AS (
      |  SELECT k, n, vb, oy * 4 + ox AS i,
      |    (ox * (4 + k % 9)) // 4 AS sx, (oy * (4 + k % 7)) // 4 AS sy
      |  FROM var, g),
      |v AS (
      |  SELECT k, n, vb, i,
      |    (sx * 7 + sy * 13 + k) % 196
      |      + (sx * 3 + sy * 5 + 2 * k) % 196
      |      + (sx * 11 + sy + 3 * k) % 196
      |      + CASE WHEN n = 1 AND sx = 0 AND sy = 0 THEN 144 ELSE 0 END
      |      AS luma
      |  FROM px),
      |s AS (SELECT vb, SUM(luma) AS s FROM v GROUP BY 1),
      |lev AS (
      |  SELECT v.vb, v.k, v.i,
      |    CASE WHEN 16 * v.luma < s.s - 768 THEN 0
      |         WHEN 16 * v.luma < s.s THEN 1
      |         WHEN 16 * v.luma < s.s + 768 THEN 2
      |         ELSE 3 END AS lvl
      |  FROM v JOIN s ON s.vb = v.vb),
      |ph AS (
      |  SELECT vb, k,
      |    CAST(SUM(CAST(lvl AS BIGINT) << (2 * i)) AS BIGINT) AS phash
      |  FROM lev GROUP BY 1, 2)
      |SELECT a.vb AS vb_a, b.vb AS vb_b,
      |  CAST(bit_count(xor(a.phash, b.phash)) AS INT) AS hamming,
      |  a.k = b.k AS same_pattern
      |FROM ph a, ph b
      |WHERE a.vb < b.vb AND bit_count(xor(a.phash, b.phash)) <= 3
      |ORDER BY vb_a, vb_b""".stripMargin

  /** q300 body: PERCEPTUAL image near-dup — the tier q293's exact
    * signature dedup deliberately stops short of (its own doc names this
    * as the next leg): recompressed/brightness-shifted re-uploads carry
    * DIFFERENT bytes and different exact signatures, but the same
    * mean-centered quantized thumbnail grid. Acquisition: pattern key
    * k = doc_id mod 89, brightness b = 30·(doc_id mod 3) — every pattern
    * arrives at three brightness grades, the population a media lake
    * holds after users run "auto-enhance". The dedup clusters on the
    * perceptual code; `n_payloads` counts DISTINCT byte-level payload
    * variants per cluster, so the graded output itself proves the
    * brightness twins collapsed (clusters with n_payloads ≥ 2) — while
    * TextMultimodalSpec additionally pins that a structurally different
    * pattern does NOT join the cluster.
    *
    * Scale shape: q293's plan — the codec pass runs once per DISTINCT
    * (k, b) payload, not per document; signatures join back on the
    * narrow variant key; the dedup is ONE shuffle on the code; output is
    * cluster-bounded. Full SQL oracle replays every sampled pixel, the
    * luma sums, and the 2-bit quantization.
    */
  def perceptualDedup(spark: SparkSession, docs: DataFrame): DataFrame = {
    val keyed = docs.select(col("doc_id"),
      (col("doc_id") % 89).as("k"), (lit(30) * (col("doc_id") % 3)).as("b"),
      ((col("doc_id") % 89) * 3 + col("doc_id") % 3).as("vb"))
    val variants = keyed.select(col("vb"), col("k"), col("b")).distinct()
    val hashes = perceptualHashes(spark, brightnessImageTable(variants))
      .toDF().select(col("vb"), col("phash"))
    keyed.join(hashes, Seq("vb"))
      .groupBy("phash")
      .agg(count(lit(1)).as("n_members"),
        countDistinct(col("vb")).as("n_payloads"),
        min(col("doc_id")).as("canonical_id"))
      .where(col("n_members") >= 2)
      .select(col("phash"), col("n_members"), col("n_payloads"),
        col("canonical_id"))
      .orderBy("canonical_id")
  }

  private val perceptualDedupSql: String =
    """WITH g AS (
      |  SELECT gx.range AS ox, gy.range AS oy
      |  FROM range(4) gx, range(4) gy),
      |d AS (
      |  SELECT doc_id, doc_id % 89 AS k, 30 * (doc_id % 3) AS b
      |  FROM documents),
      |var AS (SELECT DISTINCT k, b FROM d),
      |px AS (
      |  SELECT k, b, oy * 4 + ox AS i,
      |    (ox * (4 + k % 9)) // 4 AS sx, (oy * (4 + k % 7)) // 4 AS sy
      |  FROM var, g),
      |v AS (
      |  SELECT k, b, i,
      |    (sx * 7 + sy * 13 + k) % 196
      |      + (sx * 3 + sy * 5 + 2 * k) % 196
      |      + (sx * 11 + sy + 3 * k) % 196 + 3 * b AS luma
      |  FROM px),
      |s AS (SELECT k, b, SUM(luma) AS s FROM v GROUP BY 1, 2),
      |lev AS (
      |  SELECT v.k, v.b, v.i,
      |    CASE WHEN 16 * v.luma < s.s - 768 THEN 0
      |         WHEN 16 * v.luma < s.s THEN 1
      |         WHEN 16 * v.luma < s.s + 768 THEN 2
      |         ELSE 3 END AS lvl
      |  FROM v JOIN s ON s.k = v.k AND s.b = v.b),
      |ph AS (
      |  SELECT k, b,
      |    CAST(SUM(CAST(lvl AS BIGINT) << (2 * i)) AS BIGINT) AS phash
      |  FROM lev GROUP BY 1, 2)
      |SELECT ph.phash, CAST(COUNT(*) AS BIGINT) AS n_members,
      |  CAST(COUNT(DISTINCT d.k * 3 + d.b // 30) AS BIGINT) AS n_payloads,
      |  CAST(MIN(d.doc_id) AS BIGINT) AS canonical_id
      |FROM d JOIN ph ON ph.k = d.k AND ph.b = d.b
      |GROUP BY ph.phash HAVING COUNT(*) >= 2
      |ORDER BY canonical_id""".stripMargin

  private val thumbOracle: String =
    """WITH g AS (
      |  SELECT gx.range AS ox, gy.range AS oy
      |  FROM range(4) gx, range(4) gy),
      |d AS (
      |  SELECT doc_id, 4 + doc_id % 9 AS w, 4 + doc_id % 7 AS h
      |  FROM documents),
      |px AS (
      |  SELECT doc_id, w, h,
      |    (ox * w) // 4 AS sx, (oy * h) // 4 AS sy
      |  FROM d, g),
      |v AS (
      |  SELECT doc_id, w, h,
      |    (sx * 7 + sy * 13 + doc_id) % 256
      |      + (sx * 3 + sy * 5 + 2 * doc_id) % 256
      |      + (sx * 11 + sy + 3 * doc_id) % 256 AS s
      |  FROM px)
      |SELECT doc_id,
      |  CASE WHEN doc_id % 2 = 0 THEN 'ppm' ELSE 'bmp' END AS format,
      |  CAST(w AS INT) AS width, CAST(h AS INT) AS height,
      |  CAST(SUM(s) AS BIGINT) AS resized_sum
      |FROM v GROUP BY doc_id, w, h ORDER BY doc_id""".stripMargin

  /** q225 body: the same decode→thumbnail pass as q215, but ingested
    * through Spark's `binaryFile` SOURCE — the actual shape of a media
    * lake (a directory of image files), not an in-plan synthetic
    * column. Acquisition materializes each pattern image as a real
    * .ppm/.bmp file from a `foreachPartition` (executor-side writes, no
    * driver collect; on a cluster the files simply already exist on
    * shared storage and this step disappears); the read is
    * `format("binaryFile")` with a `pathGlobFilter`, doc identity
    * recovered from the file name, and the decode runs on the source's
    * `content` column unchanged. Same full SQL oracle as q215: the
    * whole file write → source scan → parse → resize chain must
    * hash-match the metadata arithmetic.
    */
  def binaryFileThumbnails(spark: SparkSession, docs: DataFrame, dir: String): Dataset[ThumbFeatures] = {
    import spark.implicits._
    // Materialize through the Hadoop FileSystem resolved from the scratch
    // Path, never java.io.File on URI.getPath (which silently yields a
    // wrong local path for an hdfs:// or s3:// warehouse). Driver-side
    // mkdirs uses the session's Hadoop conf; executor-side writes resolve
    // the FS from the dir URI with the classpath-default Configuration —
    // the standard pattern for side-output from a partition task.
    val dirPath = new org.apache.hadoop.fs.Path(dir)
    dirPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .mkdirs(dirPath)
    patternImageTable(docs).select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .foreachPartition { rows: Iterator[(Long, Array[Byte])] =>
        // Scheme-checked fast path: for a LOCAL warehouse, write with
        // java.nio directly — Hadoop's local create() without native
        // libs forks a chmod process per file (measured ~5ms × one file
        // per document = the slowest query in the bench). The java.nio
        // branch is correct precisely BECAUSE the scheme was checked;
        // any non-local scheme (hdfs://, s3a://) goes through the
        // FileSystem API resolved from the Path.
        val dirPath = new org.apache.hadoop.fs.Path(dir)
        val scheme = dirPath.toUri.getScheme
        if (scheme == null || scheme == "file") {
          val base = java.nio.file.Paths.get(dirPath.toUri.getPath)
          rows.foreach { case (id, bytes) =>
            val ext = if (id % 2 == 0) "ppm" else "bmp"
            java.nio.file.Files.write(base.resolve(s"doc_$id.$ext"), bytes)
          }
        } else {
          val fs = dirPath.getFileSystem(
            new org.apache.hadoop.conf.Configuration())
          rows.foreach { case (id, bytes) =>
            val ext = if (id % 2 == 0) "ppm" else "bmp"
            val out = fs.create(
              new org.apache.hadoop.fs.Path(dir, s"doc_$id.$ext"), true)
            try out.write(bytes) finally out.close()
          }
        }
      }
    thumbnailFeatures(spark,
      spark.read.format("binaryFile")
        .option("pathGlobFilter", "doc_*.{ppm,bmp}")
        .load(dir)
        .select(
          regexp_extract(col("path"), "doc_(\\d+)\\.", 1).cast("long")
            .as("doc_id"),
          col("content").as("payload")))
  }

  /** One fingerprinted audio payload variant: vb identifies the distinct
    * (rhythm key, amplitude) payload; fp is the voiced-window bitmask,
    * nw the window count.
    */
  final case class AudioFingerprint(vb: Long, fp: Long, nw: Int)

  /** Synthetic RHYTHM audio acquisition (q302): the q280 gapped square
    * wave with a per-key silence RHYTHM — phase p (16 samples) is silent
    * iff bit (p mod 7) of the rhythm key k is set — and an amplitude
    * grade amp = 1000 + 3000·par. Same rhythm at different amplitude is
    * the "re-encoded at another volume" twin an audio lake carries; all
    * parameters are pure functions of (k, par), so the whole
    * decode → window-energy → fingerprint chain grades against a FULL
    * DuckDB oracle. rate = 8000 + 1000·(k mod 4), n = 50 + (k·7 mod 100)
    * samples; odd keys carry the LIST/INFO junk chunk (the chunk walk
    * stays graded).
    */
  def rhythmAudioTable(variants: DataFrame): DataFrame = {
    val render = udf((k: Long, par: Long) => {
      val rate = (8000 + 1000 * (k % 4)).toInt
      val n = (50 + (k * 7 % 100)).toInt
      val amp = (1000 + 3000 * par).toShort
      val samples = Array.tabulate(n) { i =>
        val p = i / 16
        if (((k >> (p % 7)) & 1L) == 1L) 0.toShort
        else if ((i / 4) % 2 == 0) amp else (-amp).toShort
      }
      graft.functions.AudioCodec.encodeWav(rate, samples,
        junkChunk = k % 2 == 1)
    })
    variants.select(col("vb"), render(col("k"), col("par")).as("payload"))
  }

  /** Partition-wise audio fingerprint: REAL decode → per-16-sample-window
    * Σsample² energies (ONE codec pass, q280's machinery) → the
    * AMPLITUDE-INVARIANT voiced-pattern fingerprint: bit w of fp is set
    * iff window w has nonzero energy, plus the window count. Volume
    * changes scale every energy by amp² but never flip zero/nonzero, so
    * re-encoded-louder twins share (fp, nw); a different silence rhythm
    * or clip length lands elsewhere. Corrupt payloads → fp = −1 (never
    * a real mask, which is ≥ 0).
    */
  def audioFingerprints(spark: SparkSession, media: DataFrame): Dataset[AudioFingerprint] = {
    import spark.implicits._
    media.select(col("vb"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, bytes) =>
          graft.functions.AudioCodec.decodeWindows(bytes, 16) match {
            case Some((_, _, en)) =>
              var fp = 0L
              var w = 0
              while (w < en.length) {
                if (en(w) > 0L) fp |= 1L << w
                w += 1
              }
              AudioFingerprint(id, fp, en.length)
            case None => AudioFingerprint(id, -1L, 0)
          }
        }
      }
  }

  /** q302 body: audio fingerprint dedup — the audio leg next to q293's
    * image dedup and q300's perceptual tier (VERDICT r10 #5): cluster
    * clips by the decoded voiced-window pattern (fp, nw), which is
    * invariant to the amplitude grade — so the same rhythm uploaded at
    * two volumes (par = doc_id mod 2) collapses, while clips with a
    * different silence rhythm or length survive. Acquisition keys the
    * rhythm on k = doc_id mod 83 (7 rhythm bits + 100 length grades).
    *
    * Scale shape: the q293/q300 plan — the codec pass runs once per
    * DISTINCT (k, par) payload; fingerprints join back on the narrow
    * variant key; the dedup is ONE shuffle on (fp, nw); output is
    * cluster-bounded. Full SQL oracle replays window count and the
    * silence-bit arithmetic from metadata.
    */
  def audioFingerprintDedup(spark: SparkSession, docs: DataFrame): DataFrame = {
    val keyed = docs.select(col("doc_id"),
      (col("doc_id") % 83).as("k"), (col("doc_id") % 2).as("par"),
      ((col("doc_id") % 83) * 2 + col("doc_id") % 2).as("vb"))
    val variants = keyed.select(col("vb"), col("k"), col("par")).distinct()
    val prints = audioFingerprints(spark, rhythmAudioTable(variants))
      .toDF().select(col("vb"), col("fp"), col("nw"))
    keyed.join(prints, Seq("vb"))
      .groupBy("fp", "nw")
      .agg(count(lit(1)).as("n_members"),
        countDistinct(col("vb")).as("n_variants"),
        min(col("doc_id")).as("canonical_id"))
      .where(col("n_members") >= 2)
      .select(col("fp"), col("nw"), col("n_members"), col("n_variants"),
        col("canonical_id"))
      .orderBy("canonical_id")
  }

  private val audioDedupSql: String =
    """WITH d AS (
      |  SELECT doc_id, doc_id % 83 AS k, doc_id % 2 AS par
      |  FROM documents),
      |var AS (SELECT DISTINCT k, par FROM d),
      |nn AS (
      |  SELECT k, par, (50 + (k * 7 % 100) + 15) // 16 AS nw FROM var),
      |w AS (
      |  SELECT k, par, nw, wr.range AS w
      |  FROM nn, range(10) wr WHERE wr.range < nw),
      |fp AS (
      |  SELECT k, par, MAX(nw) AS nw,
      |    CAST(SUM(CASE WHEN ((k >> (w % 7)) & 1) = 0
      |      THEN CAST(1 AS BIGINT) << w ELSE 0 END) AS BIGINT) AS fp
      |  FROM w GROUP BY 1, 2)
      |SELECT fp.fp, CAST(fp.nw AS INT) AS nw,
      |  CAST(COUNT(*) AS BIGINT) AS n_members,
      |  CAST(COUNT(DISTINCT d.k * 2 + d.par) AS BIGINT) AS n_variants,
      |  CAST(MIN(d.doc_id) AS BIGINT) AS canonical_id
      |FROM d JOIN fp ON fp.k = d.k AND fp.par = d.par
      |GROUP BY fp.fp, fp.nw HAVING COUNT(*) >= 2
      |ORDER BY canonical_id""".stripMargin

  /** One fingerprinted video payload variant: vb identifies the
    * distinct (pattern, variant) payload; vhash is the per-sampled-frame
    * mean-centered 2-bit grid code (8 bits per fingerprinted frame).
    */
  final case class VideoFingerprint(
      vb: Long, format: String, width: Int, height: Int, vhash: Long)

  /** Synthetic VARIANT video acquisition (q304): the q269 pattern GVID
    * with the channel values bounded to [0, 195] and two twin axes a
    * video lake actually carries — variant 1 adds a flat brightness
    * offset 40 to every pixel of every frame ("re-graded" re-encode;
    * 195 + 40 < 256, never wraps), variant 2 drops the last 3 frames
    * ("truncated-tail" upload). Frames below the cut are byte-identical
    * across variants by construction. nf = 8 + k mod 9 (≥ 8, so the
    * truncated variant still holds both fingerprinted frames), dims
    * w = 3 + k mod 5, h = 3 + k mod 4 — every pixel a pure integer
    * function of (k, variant), so the decode → sample → quantize chain
    * grades against a FULL DuckDB oracle.
    */
  def variantVideoTable(variants: DataFrame): DataFrame = {
    val render = udf((k: Long, vr: Long) => {
      val w = (3 + k % 5).toInt
      val h = (3 + k % 4).toInt
      val nf = (8 + k % 9).toInt - (if (vr == 2) 3 else 0)
      val b = if (vr == 1) 40 else 0
      // the pattern key must vary the spatial GRADIENT, not just add a
      // constant — (c + k) % 196 would make every key a near-uniform
      // shift of every other, which is exactly the class the mean-
      // centered hash is built to ignore
      graft.functions.VideoCodec.encode(w, h, nf,
        (f, x, y) => (((x * (7 + k % 11) + y * (13 + k % 7)
          + f * 29 + k) % 196) + b).toInt)
    })
    variants.select(col("vb"), render(col("k"), col("vr")).as("payload"))
  }

  /** Partition-wise video fingerprint: REAL decode → for each of the
    * first `frames` stride-sampled frames, a 3×3 nearest-neighbor pixel
    * grid (q300's index map at grid 3) → per-frame MEAN-CENTERED 2-bit
    * quantization (9·p vs S ± 9·thr — a flat brightness shift adds
    * +b to every sampled pixel and +9b to the frame sum, so the
    * comparison is invariant) → 18 bits per frame packed into vhash.
    * Only the first `frames` sampled frames participate, so dropping
    * TAIL frames beyond them cannot move the code — that is the
    * truncated-twin collapse, by construction rather than by fuzzy
    * matching. A sampled frame past nFrames contributes a zero slot
    * (distinguishable: a real frame's code is never 0 — the cell at or
    * above the frame mean quantizes to ≥ 2). Corrupt payloads →
    * vhash = −1 (never a real code, which is ≥ 0).
    */
  def videoFingerprints(spark: SparkSession, media: DataFrame,
      stride: Int = 3, frames: Int = 2, thr: Int = 16): Dataset[VideoFingerprint] = {
    import spark.implicits._
    media.select(col("vb"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, bytes) =>
          graft.functions.VideoCodec.decode(bytes) match {
            case Some(v) =>
              var vhash = 0L
              var fi = 0
              while (fi < frames) {
                val f = fi * stride
                if (f < v.nFrames) {
                  val p = Array.tabulate(9) { i =>
                    v.at(f, (i % 3) * v.width / 3, (i / 3) * v.height / 3)
                  }
                  val s = p.sum
                  var fc = 0L
                  var i = 0
                  while (i < 9) {
                    val v9 = 9 * p(i)
                    val lvl =
                      if (v9 < s - 9 * thr) 0L
                      else if (v9 < s) 1L
                      else if (v9 < s + 9 * thr) 2L
                      else 3L
                    fc |= lvl << (2 * i)
                    i += 1
                  }
                  vhash |= fc << (18 * fi)
                }
                fi += 1
              }
              VideoFingerprint(id, "gvid", v.width, v.height, vhash)
            case None => VideoFingerprint(id, "corrupt", 0, 0, -1L)
          }
        }
      }
  }

  /** q304 body: video fingerprint dedup — the leg that completes the
    * multimodal dedup matrix (images: exact q293 + perceptual q300;
    * audio: q302; video: this): cluster clips by (width, height, vhash),
    * where vhash is the per-sampled-frame mean-centered grid code of
    * [[videoFingerprints]]. Brightness-regraded re-encodes collapse
    * because the per-frame quantization is mean-centered; truncated-tail
    * re-uploads collapse because only the first fingerprinted frames
    * participate; different footage (different pattern key) lands
    * elsewhere on dims or code. Acquisition keys the pattern on
    * k = doc_id mod 79 with variant = doc_id mod 3.
    *
    * Scale shape: the q293/q300/q302 plan — the codec pass runs once
    * per DISTINCT (k, variant) payload; fingerprints join back on the
    * narrow variant key; the dedup is ONE shuffle on (w, h, vhash);
    * output is cluster-bounded. Full SQL oracle replays the sampled
    * pixels, frame sums, and 2-bit quantization from metadata.
    */
  def videoFingerprintDedup(spark: SparkSession, docs: DataFrame): DataFrame = {
    val keyed = docs.select(col("doc_id"),
      (col("doc_id") % 79).as("k"), (col("doc_id") % 3).as("vr"),
      ((col("doc_id") % 79) * 3 + col("doc_id") % 3).as("vb"))
    val variants = keyed.select(col("vb"), col("k"), col("vr")).distinct()
    val prints = videoFingerprints(spark, variantVideoTable(variants))
      .toDF().select(col("vb"), col("width"), col("height"), col("vhash"))
    keyed.join(prints, Seq("vb"))
      .groupBy("width", "height", "vhash")
      .agg(count(lit(1)).as("n_members"),
        countDistinct(col("vb")).as("n_variants"),
        min(col("doc_id")).as("canonical_id"))
      .where(col("n_members") >= 2)
      .select(col("vhash"), col("width"), col("height"), col("n_members"),
        col("n_variants"), col("canonical_id"))
      .orderBy("canonical_id")
  }

  private val videoDedupSql: String =
    """WITH d AS (
      |  SELECT doc_id, doc_id % 79 AS k, doc_id % 3 AS vr
      |  FROM documents),
      |var AS (SELECT DISTINCT k, vr FROM d),
      |dim AS (
      |  SELECT k, vr, 3 + k % 5 AS w, 3 + k % 4 AS h,
      |    CASE WHEN vr = 1 THEN 40 ELSE 0 END AS b
      |  FROM var),
      |p AS (
      |  SELECT k, vr, w, h, fr.fi AS fi, oy.range * 3 + ox.range AS i,
      |    ((ox.range * w) // 3 * (7 + k % 11)
      |      + (oy.range * h) // 3 * (13 + k % 7)
      |      + fr.f * 29 + k) % 196 + b AS p
      |  FROM dim, (VALUES (0, 0), (3, 1)) fr(f, fi),
      |    range(3) ox, range(3) oy),
      |s AS (SELECT k, vr, fi, SUM(p) AS s FROM p GROUP BY 1, 2, 3),
      |lev AS (
      |  SELECT p.k, p.vr, p.fi, p.i,
      |    CASE WHEN 9 * p.p < s.s - 144 THEN 0
      |         WHEN 9 * p.p < s.s THEN 1
      |         WHEN 9 * p.p < s.s + 144 THEN 2
      |         ELSE 3 END AS lvl
      |  FROM p JOIN s ON s.k = p.k AND s.vr = p.vr AND s.fi = p.fi),
      |ph AS (
      |  SELECT k, vr,
      |    CAST(SUM(CAST(lvl AS BIGINT) << (2 * i + 18 * fi)) AS BIGINT)
      |      AS vhash
      |  FROM lev GROUP BY 1, 2),
      |sig AS (
      |  SELECT dim.k, dim.vr, dim.w, dim.h, ph.vhash
      |  FROM dim JOIN ph ON ph.k = dim.k AND ph.vr = dim.vr)
      |SELECT sig.vhash, CAST(sig.w AS INT) AS width,
      |  CAST(sig.h AS INT) AS height,
      |  CAST(COUNT(*) AS BIGINT) AS n_members,
      |  CAST(COUNT(DISTINCT d.k * 3 + d.vr) AS BIGINT) AS n_variants,
      |  CAST(MIN(d.doc_id) AS BIGINT) AS canonical_id
      |FROM d JOIN sig ON sig.k = d.k AND sig.vr = d.vr
      |GROUP BY sig.vhash, sig.w, sig.h HAVING COUNT(*) >= 2
      |ORDER BY canonical_id""".stripMargin

  /** Decoded frame-sample features: all-integer (sums of 0-255 pixels
    * and absolute frame diffs), so the row is bit-stable everywhere.
    */
  final case class VideoFeatures(
      doc_id: Long,
      format: String,
      width: Int,
      height: Int,
      n_frames: Int,
      n_sampled: Int,
      luma_sum: Long,
      motion_sum: Long)

  /** Synthetic PATTERN video acquisition (q269): the q215 doctrine
    * lifted to the time axis. Every GVID pixel is a pure integer
    * function of SQL-visible metadata — dims w = 3 + id mod 5,
    * h = 3 + id mod 4, frames nf = 4 + id mod 9, pixel
    * (x·7 + y·13 + f·29 + id) mod 256 — so frame addressing and the
    * sampling stride grade against a FULL DuckDB oracle. Ids ≡ 5
    * mod 97 upload TRUNCATED (the last 5 bytes lost in transit): the
    * codec's length check must turn them into graded 'corrupt' rows.
    */
  def patternVideoTable(docs: DataFrame): DataFrame = {
    val render = udf((id: Long) => {
      val w = (3 + id % 5).toInt
      val h = (3 + id % 4).toInt
      val nf = (4 + id % 9).toInt
      val full = graft.functions.VideoCodec.encode(w, h, nf,
        (f, x, y) => ((x * 7 + y * 13 + f * 29 + id) % 256).toInt)
      if (id % 97 == 5) java.util.Arrays.copyOf(full, full.length - 5)
      else full
    })
    docs.select(col("doc_id"), render(col("doc_id")).as("payload"))
  }

  /** Partition-wise frame sampling (q269): decode the container, keep
    * every `stride`-th frame (the keyframe-sample step of a video
    * pipeline — decoding 1/stride of the frames is the whole point at
    * scale), and reduce each document to exact integer features: summed
    * luma over sampled frames and summed absolute pixel motion between
    * CONSECUTIVE SAMPLED frames. Same iterator shape as the image/audio
    * codecs — one pass per partition, total on corrupt payloads.
    */
  def frameSampleFeatures(spark: SparkSession, media: DataFrame,
      stride: Int = 3): Dataset[VideoFeatures] = {
    require(stride >= 1, s"stride must be >= 1, got $stride")
    import spark.implicits._
    media.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, bytes) =>
          graft.functions.VideoCodec.decode(bytes) match {
            case Some(v) =>
              var luma = 0L
              var motion = 0L
              var sampled = 0
              var f = 0
              while (f < v.nFrames) {
                var y = 0
                while (y < v.height) {
                  var x = 0
                  while (x < v.width) {
                    luma += v.at(f, x, y)
                    if (f >= stride)
                      motion += math.abs(v.at(f, x, y) - v.at(f - stride, x, y))
                    x += 1
                  }
                  y += 1
                }
                sampled += 1
                f += stride
              }
              VideoFeatures(id, "gvid", v.width, v.height, v.nFrames,
                sampled, luma, motion)
            case None => VideoFeatures(id, "corrupt", 0, 0, 0, 0, 0L, 0L)
          }
        }
      }
  }

  private val videoOracle: String =
    """WITH d AS (
      |  SELECT doc_id, 3 + doc_id % 5 AS w, 3 + doc_id % 4 AS h,
      |    4 + doc_id % 9 AS nf
      |  FROM documents),
      |f AS (
      |  SELECT d.*, fr.range AS f FROM d, range(13) fr
      |  WHERE fr.range < nf AND fr.range % 3 = 0),
      |px AS (
      |  SELECT doc_id, nf, f, gx.range AS x, gy.range AS y
      |  FROM f, range(8) gx, range(7) gy
      |  WHERE gx.range < w AND gy.range < h),
      |v AS (
      |  SELECT doc_id, nf, f,
      |    (x*7 + y*13 + f*29 + doc_id) % 256 AS p,
      |    CASE WHEN f >= 3 THEN ABS(
      |      (x*7 + y*13 + f*29 + doc_id) % 256 -
      |      (x*7 + y*13 + (f-3)*29 + doc_id) % 256) ELSE 0 END AS m
      |  FROM px),
      |agg AS (
      |  SELECT v.doc_id, MAX(d.w) AS w, MAX(d.h) AS h, MAX(v.nf) AS nf,
      |    COUNT(DISTINCT v.f) AS n_sampled,
      |    SUM(v.p) AS luma, SUM(v.m) AS motion
      |  FROM v JOIN d ON v.doc_id = d.doc_id
      |  GROUP BY v.doc_id)
      |SELECT doc_id,
      |  CASE WHEN doc_id % 97 = 5 THEN 'corrupt' ELSE 'gvid' END AS format,
      |  CAST(CASE WHEN doc_id % 97 = 5 THEN 0 ELSE w END AS INT) AS width,
      |  CAST(CASE WHEN doc_id % 97 = 5 THEN 0 ELSE h END AS INT) AS height,
      |  CAST(CASE WHEN doc_id % 97 = 5 THEN 0 ELSE nf END AS INT) AS n_frames,
      |  CAST(CASE WHEN doc_id % 97 = 5 THEN 0 ELSE n_sampled END AS INT)
      |    AS n_sampled,
      |  CAST(CASE WHEN doc_id % 97 = 5 THEN 0 ELSE luma END AS BIGINT)
      |    AS luma_sum,
      |  CAST(CASE WHEN doc_id % 97 = 5 THEN 0 ELSE motion END AS BIGINT)
      |    AS motion_sum
      |FROM agg ORDER BY doc_id""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    // Video tier: container parse + stride-3 keyframe sampling over
    // pattern GVID blobs, truncated-upload corrupt path included; the
    // full SQL oracle replays every sampled pixel and frame diff.
    QueryDef("q269_video_frames", Some(videoOracle),
      (spark, dir) =>
        frameSampleFeatures(spark, patternVideoTable(t(spark, dir, "documents")))
          .toDF().orderBy("doc_id")),

    // The media-lake ingestion path: real files on disk read back
    // through the binaryFile source, decoded and resized, graded by the
    // same metadata-replay oracle as q215.
    QueryDef("q225_binary_source", Some(thumbOracle),
      (spark, dir) => {
        val scratch = graft.sources.TextFormats.scratch(spark, "graft_q225_bin")
        binaryFileThumbnails(spark, t(spark, dir, "documents"), scratch)
          .toDF().orderBy("doc_id")
      }),

    // REAL decode → resize over metadata-parameterized pattern images:
    // the full SQL oracle replays the nearest-neighbor sampling, so the
    // whole binary path (header parse, BMP row flip + BGR swap, index
    // map) is inside the hash-graded surface.
    QueryDef("q215_image_thumbnail", Some(thumbOracle),
      (spark, dir) =>
        thumbnailFeatures(spark, patternImageTable(t(spark, dir, "documents")))
          .toDF().orderBy("doc_id")),

    // Media-binary dedup over REAL decode+resize signatures; the full
    // SQL oracle replays the pixel arithmetic inside the dedup GROUP BY.
    QueryDef("q293_media_dedup", Some(mediaDedupSql),
      (spark, dir) => mediaDedup(spark, t(spark, dir, "documents"))),

    // Perceptual near-dup tier over q293: mean-centered 2-bit thumbnail
    // grid hashing collapses brightness-shifted re-uploads; the full SQL
    // oracle replays decode, resize, luma, and quantization per variant.
    QueryDef("q300_perceptual_dedup", Some(perceptualDedupSql),
      (spark, dir) => perceptualDedup(spark, t(spark, dir, "documents"))),

    // Hamming-radius perceptual matching via multi-index hashing: band
    // equi-joins + bit_count verify; the oracle brute-forces the
    // variant-bounded code relation, so the hash match proves the
    // pigeonhole exactness of the banded plan.
    QueryDef("q317_hamming_mih", Some(hammingNearDupSql),
      (spark, dir) => hammingNearDup(spark, t(spark, dir, "documents"))),

    // Audio fingerprint dedup: amplitude-invariant voiced-window masks
    // from the REAL WAV decode; the full SQL oracle replays the rhythm
    // bits and window counts from metadata.
    QueryDef("q302_audio_dedup", Some(audioDedupSql),
      (spark, dir) => audioFingerprintDedup(spark, t(spark, dir, "documents"))),

    // Video fingerprint dedup: per-sampled-frame mean-centered grid
    // codes collapse brightness-regraded and truncated-tail re-uploads;
    // the full SQL oracle replays every sampled pixel and quantization.
    QueryDef("q304_video_dedup", Some(videoDedupSql),
      (spark, dir) => videoFingerprintDedup(spark, t(spark, dir, "documents"))),

    // REAL WAV decode (RIFF chunk walk + PCM sample scan) of the
    // metadata-parameterized synthetic audio table, graded by a full
    // SQL oracle that recomputes every field from documents metadata.
    QueryDef(
      "q189_audio_decode",
      Some("""SELECT doc_id,
        |  CASE WHEN text IS NULL THEN 'unknown' ELSE 'wav16' END AS format,
        |  CAST(CASE WHEN text IS NULL THEN 0
        |    ELSE 8000 + 1000 * (doc_id % 4) END AS INT) AS sample_rate,
        |  CAST(CASE WHEN text IS NULL THEN 0
        |    ELSE 50 + (n_chars % 100) END AS INT) AS n_samples,
        |  CAST(CASE WHEN text IS NULL THEN 0
        |    ELSE ((50 + (n_chars % 100)) * 1000000)
        |      // (8000 + 1000 * (doc_id % 4)) END AS BIGINT) AS duration_us,
        |  CAST(CASE WHEN text IS NULL THEN 0
        |    ELSE 1000 + (doc_id % 7) * 3000 END AS INT) AS peak,
        |  CAST(CASE WHEN text IS NULL THEN 0
        |    ELSE (50 + (n_chars % 100)) * (1000 + (doc_id % 7) * 3000)
        |      * (1000 + (doc_id % 7) * 3000) END AS BIGINT) AS sum_sq
        |FROM documents ORDER BY doc_id""".stripMargin),
      (spark, dir) =>
        decodeAudio(spark, audioTable(t(spark, dir, "documents")))
          .toDF().orderBy("doc_id")),

    // REAL per-window energy decode + row-local silence segmentation of
    // the gapped synthetic waveform; the full SQL oracle replays the
    // segment list (every third 16-sample phase silent) from metadata.
    QueryDef(
      "q280_audio_segments",
      Some("""WITH d AS (SELECT doc_id,
        |    8000 + 1000 * (doc_id % 4) AS rate,
        |    50 + (n_chars % 100) AS n,
        |    (50 + (n_chars % 100) + 15) // 16 AS nw
        |  FROM documents WHERE text IS NOT NULL),
        |k(k) AS (VALUES (0), (1), (2), (3))
        |SELECT doc_id, CAST(k + 1 AS INT) AS seg_idx,
        |  CAST((3 * k * 16 * 1000000) // rate AS BIGINT) AS start_us,
        |  CAST((LEAST(LEAST(3 * k + 2, nw) * 16, n) * 1000000) // rate
        |    AS BIGINT) AS end_us,
        |  CAST(LEAST(3 * k + 2, nw) - 3 * k AS INT) AS n_windows
        |FROM d, k WHERE 3 * k < nw
        |ORDER BY doc_id, seg_idx""".stripMargin),
      (spark, dir) =>
        audioSegments(spark, gappedAudioTable(t(spark, dir, "documents")))
          .toDF().orderBy("doc_id", "seg_idx")),

    // Metadata extraction stays in codegen'd built-ins: byte length and a
    // "magic bytes" hex prefix straight off the binary column.
    QueryDef(
      "q37_multimodal_meta",
      Some("""SELECT doc_id, CAST(octet_length(encode(text)) AS INT) AS n_bytes,
        |  hex(encode(substr(text, 1, 8))) AS magic_hex
        |FROM documents ORDER BY doc_id""".stripMargin),
      (spark, dir) =>
        t(spark, dir, "documents")
          .select(col("doc_id"),
            octet_length(col("text")).as("n_bytes"),
            hex(substring(encode(col("text"), "UTF-8"), 1, 8)).as("magic_hex"))
          .orderBy("doc_id")),

    // Partition-wise REAL decode (PPM/BMP header+pixel parse) of the
    // deterministic synthetic media table: binary -> feature struct.
    // Generator + decode are engine-side -> literal golden oracle;
    // TextMultimodalSpec pins the decoder against hand-built images
    // (known pixels, BMP row padding, truncation/corruption) and
    // determinism under repartitioning.
    QueryDef("q38_multimodal_decode", literalOracle("q38_multimodal_decode"),
      (spark, dir) => {
        val feats = decodeFeatures(spark, mediaTable(t(spark, dir, "documents")))
        feats.toDF().orderBy("doc_id")
      }))
}
