package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.QueryDef
import graft.util.Tables._

/** Deterministic, reproducible sampling for training-data curation
  * (SURVEY §7.4): balanced per-stratum quotas selected by hash order, so
  * the same corpus always yields the same sample regardless of
  * partitioning, and re-runs over a grown corpus keep previously-selected
  * docs stable except where new docs hash earlier.
  */
object SampleOps {

  private val Buckets = 1000000L

  private def bucket(c: Column): Column = pmod(xxhash64(c), lit(Buckets))

  /** First-k-by-hash per stratum, two-phase so it survives 100 TB:
    *
    * A naive `row_number() OVER (PARTITION BY stratum ORDER BY hash)` sorts
    * every row of every stratum through one reducer per stratum — a
    * scale-killer when strata are few and huge. Instead:
    *
    *   1. count each stratum (partial-agg'd) and broadcast a per-stratum
    *      hash-bucket cutoff that keeps ~8k of the n_total rows
    *      (`cut = Buckets * 8k / n`, capped at all buckets);
    *   2. filter to surviving rows (scan-speed, no shuffle of the corpus)
    *      and run the exact top-k window over just those ~8k rows.
    *
    * Because the window orders by the same (bucket, doc_id) key the cutoff
    * filters on, the k smallest keys of each stratum all survive phase 2
    * whenever at least k rows do — so the two-phase result is identical to
    * the naive global window. With an 8x oversample the per-stratum
    * survivor count is Poisson-concentrated around 8k; shortfall odds at
    * k = 20 are ~e^-100. Strata smaller than 8k rows keep every row and
    * degrade gracefully to "all of it, exactly ordered".
    */
  def balancedSample(docs: DataFrame, k: Int, strata: String): DataFrame = {
    val withB = docs.select(col(strata).as("stratum"), col("doc_id"))
      .withColumn("b", bucket(col("doc_id")))
    val cuts = withB.groupBy("stratum").agg(count(lit(1)).as("n_total"))
      .withColumn("cut",
        least(lit(Buckets), lit(Buckets) * lit(8L * k) / col("n_total") + 1))
      .select("stratum", "cut")
    val survivors = withB
      .join(broadcast(cuts), Seq("stratum"))
      .where(col("b") < col("cut"))
    val w = Window.partitionBy("stratum").orderBy(col("b"), col("doc_id"))
    survivors.withColumn("rnk", row_number().over(w))
      .where(col("rnk") <= k)
      .select(col("stratum"), col("rnk"), col("doc_id"))
      .orderBy("stratum", "rnk")
  }

  val defs: Seq[QueryDef] = Seq(
    // Balanced corpus construction: k docs per language, hash-ordered.
    // xxhash64 is engine-specific -> literal golden oracle; SampleSpec
    // proves the two-phase plan equals the naive global window.
    QueryDef("q53_balanced_sample", literalOracle("q53_balanced_sample"),
      (spark, dir) => balancedSample(t(spark, dir, "documents"), k = 20, strata = "lang")))
}
