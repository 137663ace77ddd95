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

  val defs: Seq[QueryDef] = Seq(
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
