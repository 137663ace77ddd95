package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.gen.SalesGen
import graft.model.Sales

/** Source/sink format coverage beyond parquet: the bronze sales batch
  * round-trips through CSV, JSON, and ORC with the pinned schema — same
  * rows back in all three (CSV/JSON read with the explicit StructType, no
  * inference, mirroring the deterministic-ingest posture of SURVEY §1.2).
  */
class SourcesSpec extends SparkSpec {

  private lazy val batch =
    SalesGen.initialBatch(spark, n = 120, seed = 11L).toDF()

  private def assertSameRows(a: org.apache.spark.sql.DataFrame): Unit = {
    assert(a.count() == 120)
    assert(a.except(batch).isEmpty && batch.except(a).isEmpty)
  }

  test("csv round-trip with explicit schema and header") {
    val dir = Files.createTempDirectory("graft-csv").resolve("out").toString
    batch.write.option("header", "true").csv(dir)
    val back = spark.read.schema(Sales.bronzeSchema)
      .option("header", "true").csv(dir)
    assertSameRows(back)
  }

  test("json round-trip with explicit schema") {
    val dir = Files.createTempDirectory("graft-json").resolve("out").toString
    batch.write.json(dir)
    val back = spark.read.schema(Sales.bronzeSchema).json(dir)
    assertSameRows(back)
  }

  test("orc round-trip") {
    val dir = Files.createTempDirectory("graft-orc").resolve("out").toString
    batch.write.orc(dir)
    assertSameRows(spark.read.orc(dir))
  }

  test("malformed csv rows surface as nulls in PERMISSIVE mode, not crashes") {
    val dir = Files.createTempDirectory("graft-badcsv")
    Files.writeString(dir.resolve("bad.csv"),
      "order_id,customer_id,product_name,category,quantity,price,order_date,city,payment_method\n" +
        "ORD_0001,CUST_001,Laptop,Elettronica,notanumber,99.9,01-08-2025,Milano,PayPal\n")
    val back = spark.read.schema(Sales.bronzeSchema)
      .option("header", "true").option("mode", "PERMISSIVE")
      .csv(dir.toString)
    val row = back.collect()(0)
    assert(row.getAs[String]("order_id") == "ORD_0001")
    assert(row.isNullAt(back.columns.indexOf("quantity")))
  }

  // Hazard corpus for the graded q110/q111 text-format roundtrips: every
  // escaping path the bland synthetic corpus never exercises.
  private def hazardFrame = {
    import spark.implicits._
    Seq(
      (1L, Some("line one\nline two\rline three"), Some("en"), Some("web"), Some(28L)),
      (2L, Some("tab\there \"quoted\" and back\\slash"), Some("en"), Some("web"), Some(31L)),
      (3L, Some("comma, separated, values, inside"), Some("fr"), Some("api"), Some(32L)),
      (4L, Some("unicode café 日本語 😀 end"), Some("ja"), Some("web"), Some(17L)),
      (5L, Some("  padded with spaces  "), Some("de"), Some("feed"), Some(22L)),
      (6L, Option.empty[String], Some("en"), Some("web"), Option.empty[Long]),
      (7L, Some(""), Some("en"), Some("api"), Some(0L))
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
  }

  private def assertHazardsSurvive(back: org.apache.spark.sql.DataFrame): Unit = {
    val out = back.collect()
      .map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(out(1L) == Some("line one\nline two\rline three"), s"newline/CR: ${out(1L)}")
    assert(out(2L) == Some("tab\there \"quoted\" and back\\slash"), s"tab/quote/backslash: ${out(2L)}")
    assert(out(4L) == Some("unicode café 日本語 😀 end"), s"unicode incl. surrogate pair: ${out(4L)}")
    assert(out(5L) == Some("  padded with spaces  "), s"whitespace preserved: ${out(5L)}")
    assert(out(6L).isEmpty, "null text stays null")
    assert(out(7L) == Some(""), "empty string stays empty, NOT null")
    // non-text columns: null n_chars survives too
    val nchars = back.collect().map(r =>
      r.getLong(0) -> (if (r.isNullAt(4)) None else Some(r.getLong(4)))).toMap
    assert(nchars(6L).isEmpty && nchars(7L) == Some(0L))
  }

  test("jsonl roundtrip preserves every hazard byte-for-byte") {
    assertHazardsSurvive(graft.sources.TextFormats.jsonlRoundtrip(spark, hazardFrame))
  }

  test("csv roundtrip preserves hazards incl. the null-vs-empty distinction") {
    assertHazardsSurvive(graft.sources.TextFormats.csvRoundtrip(spark, hazardFrame))
  }

  test("orc roundtrip preserves hazards (columnar path, same contract)") {
    assertHazardsSurvive(graft.sources.ColumnarFormats.orcRoundtrip(spark, hazardFrame))
  }
}
