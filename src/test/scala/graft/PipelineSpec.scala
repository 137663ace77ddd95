package graft

import java.time.LocalDate

import org.apache.spark.sql.functions._

import graft.etl.Pipeline
import graft.gen.SalesGen
import graft.model.Sales._

/** C1-C4 composite semantics + the reference's data-quality invariants
  * (SURVEY §5, FIXTURES §A.4) as real assertions.
  */
class PipelineSpec extends SparkSpec {

  test("initial load -> silver count equals bronze count (no-drop)") {
    val n = Pipeline.initialLoad(spark, n = 500, seed = 42L)
    assert(n == 500)
    assert(spark.table(bronzeTable).count() == 500)
    assert(spark.table(silverTable).count() == 500)
  }

  test("quality invariants: no nulls, no dup ids, amount range, 5 categories") {
    Pipeline.initialLoad(spark, n = 500, seed = 42L)
    val rep = Pipeline.qualityReport(spark.table(silverTable))
    assert(rep.rowCount == 500)
    assert(rep.nullCounts.values.forall(_ == 0L))
    assert(rep.duplicateOrderIds == 0)
    assert(rep.minAmount >= 10.0 && rep.maxAmount <= 2000.0)
    assert(rep.categoryCount == 5)
  }

  test("daily run appends, ids continue from high-watermark, gold refreshes") {
    Pipeline.initialLoad(spark, n = 200, seed = 42L)
    val hw = Pipeline.maxOrderId(spark)
    assert(hw == 200)
    val silverCount = Pipeline.dailyRun(spark, LocalDate.of(2025, 8, 9), n = 15)
    assert(silverCount == 215)
    assert(Pipeline.maxOrderId(spark) == 215)
    // gold partitions the grand total
    val goldSum = spark.table(goldCategoryTable).agg(sum("fatturato")).first().getDouble(0)
    val silverSum = spark.table(silverTable)
      .agg(round(sum(col("total_amount").cast("decimal(18,2)")), 2).cast("double"))
      .first().getDouble(0)
    assert(math.abs(goldSum - silverSum) < 0.05)
    // KPI snapshot has exactly the 4 metrics, overwritten (no history)
    val kpis = spark.table(goldKpiTable).collect()
    assert(kpis.length == 4)
  }

  test("append-then-recompute == recompute of union (C1 idempotence)") {
    Pipeline.initialLoad(spark, n = 100, seed = 1L)
    Pipeline.dailyRun(spark, LocalDate.of(2025, 8, 9), n = 10, seed = 2L)
    val viaPipeline = spark.table(goldCategoryTable)
    // independent recompute from bronze union
    val direct = Pipeline.goldAnalytics(
      Pipeline.silverTransform(spark.table(bronzeTable)), "category")
    assert(viaPipeline.except(direct).isEmpty && direct.except(viaPipeline).isEmpty)
  }

  test("silver incremental append equals full recompute") {
    Pipeline.initialLoad(spark, n = 100, seed = 1L)
    val batch = SalesGen.dailyBatch(spark, LocalDate.of(2025, 8, 9),
      startId = 101, n = 10, seed = 2L).toDF()
    Pipeline.writeBronze(batch, org.apache.spark.sql.SaveMode.Append)
    Pipeline.silverIncrement(spark, batch) // incremental path
    val incremental = spark.table(silverTable)
    val full = Pipeline.silverTransform(spark.table(bronzeTable))
    assert(incremental.count() == 110)
    assert(incremental.except(full).isEmpty && full.except(incremental).isEmpty)
  }

  test("generator is deterministic for a fixed seed") {
    val a = SalesGen.initialBatch(spark, n = 50, seed = 9L).collect()
    val b = SalesGen.initialBatch(spark, n = 50, seed = 9L).collect()
    assert(a.sameElements(b))
    assert(a.map(_.order_id).distinct.length == 50)
    assert(a.forall(o => o.quantity >= 1 && o.quantity <= 4))
    assert(a.forall(o => o.price >= 10.0 && o.price <= 500.0))
  }

  test("monitoring reports layer counts + last-7 days") {
    Pipeline.initialLoad(spark, n = 100, seed = 42L)
    val m = Pipeline.monitoring(spark).collect()
    val metrics = m.map(_.getString(0))
    assert(metrics.contains("bronze_rows") && metrics.contains("silver_rows"))
    assert(metrics.count(_.startsWith("day_")) <= 7)
  }

  test("q42 write roundtrip survives a stale warehouse location") {
    val q42 = graft.ops.ReferenceOps.defs.find(_.name == "q42_write_roundtrip").get
    val first = q42.fn(spark, sf).collect()
    // Simulate the cross-session failure mode: a fresh in-memory catalog has
    // no entry for the table, but the previous run's warehouse directory is
    // still on disk — Overwrite alone cannot reclaim an unregistered
    // location (LOCATION_ALREADY_EXISTS).
    spark.sql("DROP TABLE IF EXISTS graft_q42_roundtrip")
    val dir = java.nio.file.Paths.get(
      spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"),
      "graft_q42_roundtrip")
    java.nio.file.Files.createDirectories(dir)
    java.nio.file.Files.writeString(dir.resolve("stale.parquet"), "junk")
    val second = q42.fn(spark, sf).collect()
    assert(first.sameElements(second))
  }

  test("dynamic partition overwrite: only the batch's day is replaced, replay idempotent") {
    Pipeline.initialLoad(spark, n = 300, seed = 5L)
    val tbl = s"${silverTable}_dynov"
    Pipeline.rebuildSilverPartitioned(spark, tbl)
    val dates = spark.table(tbl).select("order_date").distinct()
      .collect().map(_.getDate(0)).sortBy(_.getTime)
    assert(dates.length >= 2, "fixture needs at least two date partitions")
    val target = dates.head
    val others = dates.tail.toSet

    def partFiles: Map[String, Long] = {
      val loc = java.nio.file.Paths.get(new java.net.URI(
        spark.sessionState.catalog
          .getTableMetadata(org.apache.spark.sql.catalyst.TableIdentifier(tbl))
          .location.toString).getPath)
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(loc).iterator().asScala
        .filter(p => p.toString.endsWith(".parquet"))
        .map(p => p.toString -> java.nio.file.Files.getLastModifiedTime(p).toMillis)
        .toMap
    }
    val before = partFiles
    val untouchedBefore = before.filter(!_._1.contains(s"order_date=$target"))
    assert(untouchedBefore.nonEmpty)

    // replacement batch for ONE day (materialized — Spark rejects
    // overwriting a table that the write plan also reads)
    val batchRows = spark.table(tbl)
      .where(col("order_date") === lit(target))
      .withColumn("total_amount", round(col("total_amount") * 2, 2))
      .collect()
    val origTargetCount = batchRows.length
    assert(origTargetCount > 0)
    val batch = spark.createDataFrame(
      spark.sparkContext.parallelize(batchRows.toIndexedSeq),
      spark.table(tbl).schema)

    Pipeline.overwriteDayPartitions(spark, batch, tbl)

    // untouched partitions: the very same files, byte-for-byte (mtimes)
    val after = partFiles
    val untouchedAfter = after.filter(!_._1.contains(s"order_date=$target"))
    assert(untouchedAfter == untouchedBefore,
      "files outside the replaced partition must not be rewritten")
    // replaced partition carries the new content; the rest still reads
    assert(spark.table(tbl).count() == 300)
    val doubled = spark.table(tbl)
      .where(col("order_date") === lit(target)).count()
    assert(doubled == origTargetCount)
    assert(spark.table(tbl).select("order_date").distinct().count()
      == others.size + 1)

    // replay the same batch: content converges (idempotent)
    val snapshot = spark.table(tbl).orderBy("order_id").collect()
    Pipeline.overwriteDayPartitions(spark, batch, tbl)
    val replay = spark.table(tbl).orderBy("order_id").collect()
    assert(snapshot.sameElements(replay), "replaying a day must be a no-op")
  }

  test("observed quality metrics ride the write pass and match the two-pass report") {
    Pipeline.initialLoad(spark, n = 400, seed = 11L)
    val silver = spark.table(silverTable)
    val (observed, obs) = Pipeline.observedQuality(silver)
    // ONE action: the parquet write the pipeline runs anyway
    val outDir = java.nio.file.Files.createTempDirectory("graft-obs-out").toString
    observed.write.mode("overwrite").parquet(outDir)
    val m = obs.get
    val direct = Pipeline.qualityReport(silver)
    assert(m("_rows") == direct.rowCount)
    assert(m("_min") == direct.minAmount && m("_max") == direct.maxAmount)
    assert(m("_avg") == direct.avgAmount)
    silver.columns.foreach { c =>
      assert(m(s"null_$c") == direct.nullCounts(c), s"null count drift on $c")
    }
    // and the written data is untouched by the observation
    assert(spark.read.parquet(outDir).count() == direct.rowCount)
  }
}
