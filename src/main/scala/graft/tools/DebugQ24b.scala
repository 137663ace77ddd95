package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object DebugQ24b {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.codegen.wholeStage", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[T](n: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$n: ${(System.nanoTime()-t0)/1e9}%.2fs"); r
    }
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    time("q24 full, codegen off")(
      println(graft.ops.DedupOps.minhashAssign(docs).count()))
    time("q24 again")(
      println(graft.ops.DedupOps.minhashAssign(docs).count()))
    spark.stop()
  }
}
