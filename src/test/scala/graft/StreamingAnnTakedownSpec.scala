package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import graft.ops.{AnnIndexOps, SimilarityOps}
import graft.streaming.StreamingAnnTakedown

/** Streamed takedown service (q356): tombstones make deleted vectors
  * unservable immediately, compaction (applyTombstones) is invisible
  * to readers, redelivered deletion batches are no-ops, and the swept
  * index equals a frozen-quantizer rebuild on the survivors.
  */
class StreamingAnnTakedownSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType.fromDDL("vec_id BIGINT")

  test("tombstone serve == compacted serve == rebuild; redelivery adds nothing") {
    val v = SimilarityOps.vectors(spark, sf)
    AnnIndexOps.buildResidualIndex(spark, v, "graft_atdspec")
    val q = v.where(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("v").as("qv"))
    val dels = v.where(col("vec_id") % 7 === 0).select(col("vec_id"))

    val landing = Files.createTempDirectory("graft-anntd-landing").toString
    dels.where(col("vec_id") % 2 === 0).coalesce(1)
      .write.mode("append").parquet(landing)
    dels.where(col("vec_id") % 2 =!= 0).coalesce(1)
      .write.mode("append").parquet(landing)
    def run(cp: String): Unit =
      StreamingAnnTakedown.takedownAvailableNow(spark, landing,
        "graft_atdspec", cp, schema, maxFilesPerTrigger = Some(1))
        .awaitTermination(120000)
    run(Files.createTempDirectory("graft-anntd-ckpt").toString)

    // deleted vectors are unservable the moment tombstones land —
    // BEFORE any physical rewrite
    val tombServe = AnnIndexOps.serveTopK(spark, q, "graft_atdspec")
      .collect().toSeq
    assert(!tombServe.exists(r => r.getLong(2) % 7 == 0),
      "a tombstoned vector must never be served")
    val nTomb = spark.table("graft_atdspec_tombstones").count()
    assert(nTomb === dels.count(), "every requested id tombstoned once")

    // redelivery with a wiped checkpoint re-adds nothing
    run(Files.createTempDirectory("graft-anntd-ckpt2").toString)
    assert(spark.table("graft_atdspec_tombstones").count() === nTomb,
      "redelivered deletion batches must not duplicate tombstones")

    // compaction is invisible to readers
    AnnIndexOps.applyTombstones(spark, "graft_atdspec")
    assert(!spark.catalog.tableExists("graft_atdspec_tombstones"),
      "applyTombstones must truncate the pending set")
    val applied = AnnIndexOps.serveTopK(spark, q, "graft_atdspec")
      .collect().toSeq
    assert(applied === tombServe,
      "tombstone-filtered serve must equal the physically swept serve")
    assert(spark.table("graft_atdspec_vectors")
      .where(col("vec_id") % 7 === 0).isEmpty, "zero residue after apply")

    // and the swept index is the frozen rebuild on survivors
    AnnIndexOps.rebuildWithFrozen(spark, v.where(col("vec_id") % 7 =!= 0),
      "graft_atdspec", "graft_atdspecrb")
    val rb = AnnIndexOps.serveTopK(spark, q, "graft_atdspecrb")
      .collect().toSeq
    assert(applied === rb, "swept serve must equal the rebuild's serve")
  }

  test("a rebuilt index starts clean: stale tombstones never filter a fresh serve") {
    val v = SimilarityOps.vectors(spark, sf)
    AnnIndexOps.buildResidualIndex(spark, v, "graft_atdspec2")
    AnnIndexOps.addTombstones(spark, "graft_atdspec2",
      Seq(3L, 4L).toDF("vec_id"))
    // rebuild the same prefix: the pending set must be dropped
    AnnIndexOps.buildResidualIndex(spark, v, "graft_atdspec2")
    assert(!spark.catalog.tableExists("graft_atdspec2_tombstones"),
      "a rebuild must drop stale tombstones")
    val q = v.where(col("vec_id") === 3L)
      .select(col("vec_id").as("q_id"), col("v").as("qv"))
    val served = AnnIndexOps.serveTopK(spark, q, "graft_atdspec2")
    assert(served.count() > 0, "vector 3's serve must be unfiltered")
  }
}
