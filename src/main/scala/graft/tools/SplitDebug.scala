package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.{AnnIndexOps, SimilarityOps}

/** Scratch: reproduce AnnIndexSpec's drift fixture and print the cell
  * census around splitFatCells, to inspect seeding behavior per round.
  */
object SplitDebug {
  def main(args: Array[String]): Unit = {
    val sf = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val corpus = SimilarityOps.vectors(spark, sf)
    AnnIndexOps.buildResidualIndex(spark, corpus, "graft_splitdbg")
    val shifted = corpus
      .crossJoin(spark.range(3).select(col("id").as("copy")))
      .select((col("vec_id") + lit(9200000000L) + col("copy") * lit(1000000L))
        .as("vec_id"),
        expr("transform(v, (x, i) -> 0.05D * x + IF(i = 0, 0.95D, 0D))")
          .as("v"))
    AnnIndexOps.appendToIndex(spark, shifted, "graft_splitdbg")
    println("=== census BEFORE split ===")
    AnnIndexOps.indexCellCensus(spark, "graft_splitdbg").show(200, false)
    val split = AnnIndexOps.splitFatCells(spark, "graft_splitdbg")
    println(s"=== split cells: $split ===")
    println("=== census AFTER split ===")
    AnnIndexOps.indexCellCensus(spark, "graft_splitdbg").show(200, false)
    spark.stop()
  }
}
