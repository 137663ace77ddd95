package graft.tools
import org.apache.spark.sql.SparkSession
/** Dev helper: run one query N times in a single JVM to see warm timings. */
object BenchRep {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    (1 to 3).foreach { i =>
      val t0 = System.nanoTime()
      val n = graft.SparkEntry.queries(args(0))(spark, sfDir).count()
      println(f"rep$i: ${(System.nanoTime() - t0) / 1e9}%.2fs rows=$n")
    }
    spark.stop()
  }
}
