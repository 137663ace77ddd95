package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object DebugQ24 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    def time[T](n: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$n: ${(System.nanoTime()-t0)/1e9}%.2fs"); r
    }
    val sh = graft.ops.DedupOps.shingles(docs)
    val ex = sh.select(col("doc_id"), explode(col("shingles")).as("s"))
    time("explode")(println(ex.count()))
    val mins = (1 to 64).map(j => min(xxhash64(col("s"), lit(j))).as(s"h$j"))
    val agg = ex.groupBy("doc_id").agg(mins.head, mins.tail: _*)
    time("64-min agg")(println(agg.count()))
    val sigs = agg.select(col("doc_id"), array((1 to 64).map(j => col(s"h$j")): _*).as("sig"))
    val bucketed = sigs.select(col("doc_id"), explode(expr(
        """transform(sequence(0, 7),
          |  b -> named_struct('band', b,
          |    'bhash', xxhash64(concat_ws(',', slice(sig, b * 8 + 1, 8)))))""".stripMargin)).as("bk"))
      .select(col("doc_id"), col("bk.band").as("band"), col("bk.bhash").as("bhash"))
    time("bucketed (no cache)")(println(bucketed.count()))
    val b2 = bucketed.cache()
    time("bucketed cache build")(println(b2.count()))
    val bucketMin = b2.groupBy("band", "bhash").agg(min(col("doc_id")).as("bucket_min"))
    val out = b2.join(bucketMin, Seq("band", "bhash")).groupBy("doc_id")
      .agg(min(col("bucket_min")).as("canonical_id"))
    time("assign from cache")(println(out.count()))
    spark.stop()
  }
}
