package graft.tools
import org.apache.spark.sql.SparkSession
/** Regenerates the golden CSV for PropertySpec's seeded pipeline test. */
object GoldenGen {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val silver = graft.etl.Pipeline.silverTransform(
      graft.gen.SalesGen.initialBatch(spark, n = 200, seed = 42L).toDF())
    val rows = graft.etl.Pipeline.goldAnalytics(silver, "category").collect()
      .map(r => s"${r.getString(0)},${r.getLong(1)},${r.getDouble(2)},${r.getDouble(3)},${r.getLong(4)}")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("src/test/resources/golden_category.csv"),
      rows.mkString("\n") + "\n")
    println(rows.mkString("\n"))
    spark.stop()
  }
}
