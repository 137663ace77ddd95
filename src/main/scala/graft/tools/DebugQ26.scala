package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object DebugQ26 {
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
    time("shingles count")(println(sh.count()))
    val ex = sh.select(col("doc_id"), explode(col("shingles")).as("s"))
    time("explode count")(println(ex.count()))
    val rare = ex.groupBy("s").agg(count(lit(1)).as("df"))
      .where(col("df").between(2, 5)).select("s")
    time("rare count")(println(rare.count()))
    val rareEx = ex.join(rare, "s")
    time("rareEx count")(println(rareEx.count()))
    val cand = rareEx.as("a").join(rareEx.as("b"),
        col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b")).distinct()
    time("cand count")(println(cand.count()))
    val withSets = cand
      .join(sh.select(col("doc_id").as("doc_a"), col("shingles").as("sa")), "doc_a")
      .join(sh.select(col("doc_id").as("doc_b"), col("shingles").as("sb")), "doc_b")
    time("withSets+intersect")(println(withSets
      .select(col("doc_a"), col("doc_b"),
        size(array_intersect(col("sa"), col("sb"))).as("common"),
        size(col("sa")).as("n_a"), size(col("sb")).as("n_b"))
      .where(expr("10 * common >= 3 * (n_a + n_b - common)")).count()))
    spark.stop()
  }
}
