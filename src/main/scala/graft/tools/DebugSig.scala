package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
object DebugSig {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[T](n: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$n: ${(System.nanoTime()-t0)/1e9}%.2fs"); r
    }
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    // tall minhash sigs alone
    val sigs = graft.ops.DedupOps.minhashSignatures(docs, 64)
    time("tall sigs count")(println(sigs.count()))
    time("tall sigs count warm")(println(sigs.count()))
    // window-based assign, single consumption
    val bucketed = sigs.select(col("doc_id"), explode(expr(
        """transform(sequence(0, 7),
          |  b -> named_struct('band', b,
          |    'bhash', xxhash64(concat_ws(',', slice(sig, b * 8 + 1, 8)))))""".stripMargin)).as("bk"))
      .select(col("doc_id"), col("bk.band").as("band"), col("bk.bhash").as("bhash"))
    val assigned = bucketed
      .withColumn("bucket_min", min(col("doc_id")).over(Window.partitionBy("band", "bhash")))
      .groupBy("doc_id").agg(min(col("bucket_min")).as("canonical_id"))
    time("window assign")(println(assigned.count()))
    // simhash tall
    val ssig = graft.ops.DedupOps.simhashSignatures(docs)
    time("simhash sigs")(println(ssig.count()))
    spark.stop()
  }
}
