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
}
