package graft

import org.apache.spark.sql.functions._

import graft.etl.Pipeline
import graft.model.Sales._

/** SURVEY §2.3 catalog/metadata ops (M1-M3) and the K3 mergeSchema read
  * path — not SQL-oracle-expressible, so pinned here.
  */
class CatalogSpec extends SparkSpec {

  test("M1/M2: SHOW TABLES lists the medallion tables, DESCRIBE reads schema") {
    Pipeline.initialLoad(spark, n = 50, seed = 3L)
    val tables = spark.sql("SHOW TABLES").collect().map(_.getString(1)).toSet
    assert(Set(bronzeTable, silverTable, goldCategoryTable, goldCityTable,
      goldKpiTable).subsetOf(tables))
    val desc = spark.sql(s"DESCRIBE $silverTable").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(desc("order_date") == "date")
    assert(desc("total_amount") == "double")
    assert(desc("quantity") == "bigint")
  }

  test("M3: columns/schema introspection matches the pinned bronze schema") {
    Pipeline.initialLoad(spark, n = 20, seed = 4L)
    val bronze = spark.table(bronzeTable)
    assert(bronze.columns.toSeq == bronzeSchema.map(_.name))
    assert(bronze.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
      bronzeSchema.fields.map(f => (f.name, f.dataType)).toSeq)
  }

  test("K3: parquet mergeSchema absorbs an additive column rename on read") {
    val dir = java.nio.file.Files.createTempDirectory("graft-merge").toString
    import spark.implicits._
    Seq((1L, 10.0)).toDF("id", "fatturato_medio")
      .write.parquet(s"$dir/part=a")
    Seq((2L, 20.0)).toDF("id", "ordine_medio")
      .write.parquet(s"$dir/part=b")
    val merged = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(merged.columns.toSet == Set("id", "fatturato_medio", "ordine_medio", "part"))
    assert(merged.count() == 2)
    assert(merged.where(col("fatturato_medio").isNotNull).count() == 1)
    assert(merged.where(col("ordine_medio").isNotNull).count() == 1)
  }
}
