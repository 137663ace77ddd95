package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.QueryDef
import graft.util.Tables._

/** Multimodal-column plumbing (SURVEY §7.4): media payloads are opaque
  * `binary` columns with typed metadata alongside. The container has no
  * image/audio codecs, so the DECODE step is a clearly-marked deterministic
  * stub — but the Spark-side plumbing (binary schema, partition-wise batch
  * decode via mapPartitions, feature-struct output) is real and tested.
  * On a cluster the stub body is the only thing that changes (JNI/codec
  * call), not the plan shape.
  */
object MultimodalOps {

  /** Decoded "media" features (stubbed). */
  final case class MediaFeatures(
      doc_id: Long,
      n_bytes: Int,
      width: Int,
      height: Int,
      channels: Int,
      checksum: Long)

  /** Simulated media table: the document text bytes standing in for an
    * opaque payload (binary column + metadata columns).
    */
  def mediaTable(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      encode(col("text"), "UTF-8").as("payload"),
      octet_length(col("text")).as("n_bytes"))

  /** STUB decoder: a real implementation would hand `payload` to an image
    * codec here. The fake is deterministic in the payload bytes so tests
    * can pin it. Runs partition-wise (one iterator pass, no collect) —
    * the exact shape a Pandas-UDF/mapInPandas decode takes in PySpark.
    */
  def decodeFeatures(spark: SparkSession, media: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, bytes) =>
          // ---- STUB: deterministic fake decode (no codecs in container) ----
          val checksum = bytes.foldLeft(17L)((a, b) => (a * 31 + (b & 0xff)) % 1000003L)
          val w = 16 + (checksum % 64).toInt
          val h = 16 + ((checksum / 64) % 64).toInt
          MediaFeatures(id, bytes.length, w, h, channels = 3, checksum)
        }
      }
  }

  val defs: Seq[QueryDef] = Seq(
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

    // Partition-wise stub decode: binary -> feature struct. JVM-side stub
    // logic is deterministic in the payload bytes -> literal golden oracle;
    // TextMultimodalSpec additionally pins determinism + schema.
    QueryDef("q38_multimodal_decode", literalOracle("q38_multimodal_decode"),
      (spark, dir) => {
        val feats = decodeFeatures(spark, mediaTable(t(spark, dir, "documents")))
        feats.toDF().orderBy("doc_id")
      }))
}
