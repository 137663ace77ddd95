package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.QueryDef
import graft.util.Tables._

/** Text-format sources/sinks — JSONL and CSV, the two formats raw
  * corpora actually arrive in before they ever become parquet (web-crawl
  * dumps and API exports are JSONL; legacy warehouse extracts are CSV).
  * The reference pipeline ingests via managed tables only (SURVEY §1.3),
  * so this is §7.4 extension surface: a training-data engine that cannot
  * ingest JSONL cannot start.
  *
  * Both queries grade round-trip fidelity through the driver's hash
  * compare: documents (plus planted hazard docs — the raw corpus carries
  * no quotes/newlines/backslashes/nulls, so without planting the escaping
  * paths would be vacuously green) are written to the text format, read
  * back with an EXPLICIT schema (schema-on-read; inference is a full
  * extra pass over 100 TB and is banned from the scale path), and the
  * read-back frame is compared against the parquet truth via the oracle.
  *
  * Scale shape: JSONL is the production path — line-delimited, so splits
  * land on line boundaries and a 100 TB directory fans out to one task
  * per 128 MB block with zero coordination. CSV with embedded newlines
  * needs `multiLine`, which makes each FILE one task (non-splittable) —
  * the CSV query documents that caveat and exists for interop fidelity,
  * not throughput; newline-bearing text belongs in JSONL or parquet.
  */
object TextFormats {

  /** Planted hazard docs exercising every escaping path: embedded
    * newline, CR, tab, double quote, backslash, comma (CSV delimiter),
    * non-ASCII (Latin-1 accent, CJK, astral-plane emoji → surrogate
    * pairs in the JSON writer), a leading/trailing-space field, a null
    * text, and an empty-string text (the classic CSV null-vs-empty
    * trap). Ids sit above every real doc_id. The oracle unions the same
    * literals (control chars via chr(n) so the SQL text stays on one
    * line for the driver's JSON dump).
    */
  private[sources] def hazardDocs(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq(
      (3000000000051L, Some("line one\nline two\rline three"), Some("en"), Some("web"), Some(28L)),
      (3000000000052L, Some("tab\there \"quoted\" and back\\slash"), Some("en"), Some("web"), Some(31L)),
      (3000000000053L, Some("comma, separated, values, inside"), Some("fr"), Some("api"), Some(32L)),
      (3000000000054L, Some("unicode café 日本語 😀 end"), Some("ja"), Some("web"), Some(17L)),
      (3000000000055L, Some("  padded with spaces  "), Some("de"), Some("feed"), Some(22L)),
      (3000000000056L, Option.empty[String], Some("en"), Some("web"), Option.empty[Long]),
      (3000000000057L, Some(""), Some("en"), Some("api"), Some(0L))
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
  }

  /** The same literals as [[hazardDocs]] on the DuckDB side. Control
    * characters are spelled chr(10)/chr(13)/chr(9) so the SQL survives
    * the driver's one-line JSON dump; the emoji is a UTF-8 literal (the
    * dump is UTF-8 end to end).
    */
  private val hazardValuesSql =
    """VALUES
      |  (3000000000051, 'line one' || chr(10) || 'line two' || chr(13) || 'line three', 'en', 'web', 28),
      |  (3000000000052, 'tab' || chr(9) || 'here "quoted" and back\slash', 'en', 'web', 31),
      |  (3000000000053, 'comma, separated, values, inside', 'fr', 'api', 32),
      |  (3000000000054, 'unicode café 日本語 😀 end', 'ja', 'web', 17),
      |  (3000000000055, '  padded with spaces  ', 'de', 'feed', 22),
      |  (3000000000056, NULL, 'en', 'web', NULL),
      |  (3000000000057, '', 'en', 'api', 0)""".stripMargin

  private[sources] def roundtripOracle: String =
    s"""WITH all_docs(doc_id, text, lang, source, n_chars) AS (
       |  SELECT doc_id, text, lang, source, n_chars FROM documents
       |  UNION ALL
       |  $hazardValuesSql)
       |SELECT doc_id, text, lang, source, n_chars
       |FROM all_docs ORDER BY doc_id""".stripMargin

  /** Scratch directory under the session warehouse (same reclaim dance
    * as q42: a previous run's directory may survive on disk).
    */
  def scratch(spark: SparkSession, name: String): String = {
    val loc = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), name)
    loc.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(loc, true)
    loc.toString
  }

  /** documents + hazards → JSONL on disk → read back with the explicit
    * schema → full-width projection. The JSON writer escapes control
    * chars and quotes, keeps one document per line regardless of
    * embedded newlines (that is the format's whole point), and omits
    * null fields (reader restores them as null).
    */
  def jsonlRoundtrip(spark: SparkSession, docs: DataFrame): DataFrame = {
    val dir = scratch(spark, "graft_q110_jsonl")
    docs.write.mode(SaveMode.Overwrite).json(dir)
    spark.read.schema(docs.schema).json(dir)
      .select(col("doc_id"), col("text"), col("lang"), col("source"), col("n_chars"))
      .orderBy("doc_id")
  }

  /** documents + hazards → RFC-4180 CSV (quote-doubling escape, header)
    * → read back with the explicit schema. `multiLine=true` because the
    * hazard set embeds newlines — correct but NON-SPLITTABLE (one task
    * per file), which is exactly why the 100 TB ingest path is JSONL;
    * this query grades that the CSV corner cases (quote doubling,
    * delimiter-in-field, null-vs-empty) survive, not that CSV is fast.
    * Null is spelled `\N` (the Hive sentinel) so it stays distinguishable
    * from the empty string, which the writer emits quoted (`""`).
    */
  def csvRoundtrip(spark: SparkSession, docs: DataFrame): DataFrame = {
    val dir = scratch(spark, "graft_q111_csv")
    docs.write.mode(SaveMode.Overwrite)
      .option("header", "true")
      .option("escape", "\"")
      .option("nullValue", "\\N")
      .option("emptyValue", "\"\"")
      // the CSV WRITER trims whitespace by default — fidelity first
      .option("ignoreLeadingWhiteSpace", "false")
      .option("ignoreTrailingWhiteSpace", "false")
      .csv(dir)
    spark.read.schema(docs.schema)
      .option("header", "true")
      .option("escape", "\"")
      .option("nullValue", "\\N")
      .option("emptyValue", "")
      .option("multiLine", "true")
      .csv(dir)
      .select(col("doc_id"), col("text"), col("lang"), col("source"), col("n_chars"))
      .orderBy("doc_id")
  }

  private[sources] def withHazards(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .select(col("doc_id"), col("text"), col("lang"), col("source"), col("n_chars"))
      .unionByName(hazardDocs(spark))

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q110_jsonl_roundtrip", Some(roundtripOracle),
      (spark, dir) => jsonlRoundtrip(spark, withHazards(spark, dir))),

    QueryDef("q111_csv_roundtrip", Some(roundtripOracle),
      (spark, dir) => csvRoundtrip(spark, withHazards(spark, dir))))
}

/** ORC — the other columnar format Spark carries natively, and the one a
  * migration from a Hive-era warehouse actually arrives in. Same planted
  * hazard corpus and oracle as q110/q111: columnar formats store strings
  * as raw bytes so the escaping hazards are trivially safe, but the
  * roundtrip still grades the type mapping (nullable longs, null-vs-empty
  * strings, non-ASCII) and the explicit-schema read path.
  *
  * Scale shape: ORC stripes are splittable like parquet row groups —
  * one task per split, predicate pushdown and column pruning both
  * supported by Spark's vectorized ORC reader — so unlike the CSV path
  * there is no non-splittable caveat; it is a first-class 100 TB format.
  */
object ColumnarFormats {

  def orcRoundtrip(spark: SparkSession, docs: DataFrame): DataFrame = {
    val dir = TextFormats.scratch(spark, "graft_q117_orc")
    docs.write.mode(SaveMode.Overwrite).orc(dir)
    spark.read.schema(docs.schema).orc(dir)
      .select(col("doc_id"), col("text"), col("lang"), col("source"), col("n_chars"))
      .orderBy("doc_id")
  }

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q117_orc_roundtrip", Some(TextFormats.roundtripOracle),
      (spark, dir) => orcRoundtrip(spark, TextFormats.withHazards(spark, dir))))
}

/** XML — the enterprise-feed format Spark 4 reads natively (the
  * spark-xml connector merged into core in 4.0). Same hazard corpus and
  * grading idea as q110/q111/q117, with ONE documented infidelity: XML
  * 1.0 end-of-line normalization — a parser MUST convert a literal
  * carriage return in element content to a line feed — so the writer
  * emits CR as the `&#13;` character reference (`charset`-independent),
  * which survives parsing; this query grades that Spark's writer does
  * exactly that (a writer emitting a raw CR would hash-mismatch the
  * oracle's chr(13)).
  *
  * Scale shape: like multiLine CSV, an XML document is one parse unit —
  * the reader splits on `rowTag` boundaries within a file but a
  * malformed-tolerant scan cannot blindly split mid-entity; XML is an
  * interop format here, not the 100 TB path (that's JSONL/parquet/ORC).
  */
object XmlFormat {

  def xmlRoundtrip(spark: SparkSession, docs: DataFrame): DataFrame = {
    val dir = TextFormats.scratch(spark, "graft_q224_xml")
    docs.write.mode(SaveMode.Overwrite)
      .option("rootTag", "docs").option("rowTag", "doc")
      .option("declaration", "")
      .xml(dir)
    spark.read.schema(docs.schema)
      .option("rowTag", "doc")
      // the XML reader trims element-content whitespace by default —
      // fidelity first (same stance as the CSV reader options)
      .option("ignoreSurroundingSpaces", "false")
      .xml(dir)
      .select(col("doc_id"), col("text"), col("lang"), col("source"), col("n_chars"))
      .orderBy("doc_id")
  }

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q224_xml_roundtrip", Some(TextFormats.roundtripOracle),
      (spark, dir) => xmlRoundtrip(spark, TextFormats.withHazards(spark, dir))))
}

/** Poison-line handling on the JSONL ingest path (q234): a 100 TB crawl
  * delivery ALWAYS contains some malformed lines, and the job must
  * quarantine them, not die (the ANSI-off philosophy of q107 applied to
  * the parser). PERMISSIVE mode + `columnNameOfCorruptRecord` routes
  * every unparseable line into a quarantine column — truncated JSON,
  * non-JSON garbage, and type-mismatched fields all land there with
  * their raw text (Spark treats an unconvertible field as a malformed
  * ROW: doc_id stays null and the raw line is preserved) — while every
  * well-formed line parses normally. The audit reports totals the
  * oracle recomputes from the documents table plus the planted poison
  * constants.
  */
object CorruptRecords {

  /** The three planted poison lines: truncated JSON, plain garbage,
    * and valid JSON whose doc_id cannot convert to BIGINT.
    */
  private[sources] val poison = Seq(
    """{"doc_id": 123, "text": "trunc""",
    """utter garbage, not json""",
    """{"doc_id": "not-a-number", "text": "typed wrong"}""")

  def corruptAudit(spark: SparkSession, docs: DataFrame): DataFrame = {
    val dir = TextFormats.scratch(spark, "graft_q234_corrupt")
    docs.write.mode(SaveMode.Overwrite).json(dir)
    // Write the poison file through the Hadoop FileSystem resolved from
    // the scratch Path — java.io.File on URI.getPath silently maps a
    // non-local warehouse (hdfs://, s3://) to a bogus local path.
    val poisonPath = new org.apache.hadoop.fs.Path(dir, "part-poison.json")
    val fs = poisonPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(poisonPath, true)
    try out.write((poison.mkString("\n") + "\n").getBytes("UTF-8"))
    finally out.close()
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "doc_id BIGINT, text STRING, lang STRING, source STRING, " +
        "n_chars BIGINT, _corrupt_record STRING")
    val read = spark.read.schema(schema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(dir)
    read.agg(
      count(lit(1)).as("n_lines"),
      count(col("_corrupt_record")).as("n_quarantined"),
      // a malformed row may still carry its successfully-parsed field
      // prefix (the truncated poison line parses doc_id 123 before the
      // failure) — "parsed" means CLEAN rows only
      count(when(col("_corrupt_record").isNull, col("doc_id")))
        .as("n_parsed_ids"),
      max(when(col("_corrupt_record").isNull, col("doc_id"))).as("max_clean_id"))
  }

  private val corruptOracle: String =
    """SELECT CAST(COUNT(*) + 3 AS BIGINT) AS n_lines,
      |  CAST(3 AS BIGINT) AS n_quarantined,
      |  CAST(COUNT(*) AS BIGINT) AS n_parsed_ids,
      |  CAST(MAX(doc_id) AS BIGINT) AS max_clean_id
      |FROM documents""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q234_corrupt_records", Some(corruptOracle),
      (spark, dir) => corruptAudit(spark,
        graft.util.Tables.t(spark, dir, "documents")
          .select(col("doc_id"), col("text"), col("lang"),
            col("source"), col("n_chars")))))
}
