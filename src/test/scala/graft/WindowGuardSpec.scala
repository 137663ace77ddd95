package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.AnnIndexOps
import graft.ops.SimilarityOps
import graft.plans.WindowGuard

/** The RUNTIME unpartitioned-window guard (VERDICT r15 #2): PlanSpec's
  * static sweep inspects each graded query's RETURNED plan, so a window
  * that executes eagerly inside the body (localCheckpoint, table write)
  * is invisible to it — exactly how q363's single-task seeding escaped
  * for a round. These tests pin (a) that the listener layer catches the
  * planted escape shape, (b) attribution/allowlist mechanics, and
  * (c) that the repaired splitFatCells runs clean at every layer.
  */
class WindowGuardSpec extends SparkSpec {

  test("the guard catches an unpartitioned window hidden behind an eager localCheckpoint") {
    WindowGuard.reset()
    WindowGuard.install(spark)
    try {
      WindowGuard.begin(spark, "planted_query")
      // the q363 escape shape: the offending window executes at plan-
      // BUILD time (eager checkpoint), never in the returned frame's
      // optimized plan — the static sweep cannot see it
      val planted = spark.range(1000).toDF("id")
        .withColumn("rk", row_number().over(
          Window.orderBy(col("id"))))
        .localCheckpoint(true)
      val returned = planted.groupBy(col("rk") % 7).count()
      assert(returned.queryExecution.optimizedPlan.collectWithSubqueries {
          case w: org.apache.spark.sql.catalyst.plans.logical.Window
              if w.partitionSpec.isEmpty => w
        }.isEmpty,
        "fixture drift: the planted window must NOT be visible in the " +
          "returned plan, or this test stops proving the runtime layer")
      returned.count()
      val rec = WindowGuard.recorded(spark)
      assert(rec.get("planted_query").exists(_.exists(_.contains("rk"))),
        s"the eager planted window must be recorded and attributed: $rec")
      assert(WindowGuard.offenders(spark).contains("planted_query"),
        "an unallowlisted query with a recorded window must be an offender")
    } finally WindowGuard.reset()
  }

  test("allowlisted queries are recorded but not offenders; attribution follows begin()") {
    WindowGuard.reset()
    WindowGuard.install(spark)
    try {
      // q72_daily_delta is allowlisted (calendar frame); run a window
      // under its name, then a second one under a fresh offender name —
      // each must attribute to its own begin() scope
      // the windowed column must be CONSUMED: a bare count() lets
      // Catalyst prune the (cardinality-preserving) window away and
      // nothing executes to record
      WindowGuard.begin(spark, "q72_daily_delta")
      spark.range(100).toDF("id")
        .withColumn("cum", sum(col("id")).over(
          Window.orderBy(col("id"))))
        .agg(sum(col("cum"))).collect()
      WindowGuard.begin(spark, "second_query")
      spark.range(100).toDF("id")
        .withColumn("lagv", lag(col("id"), 1).over(
          Window.orderBy(col("id"))))
        .agg(sum(col("lagv"))).collect()
      val rec = WindowGuard.recorded(spark)
      assert(rec.get("q72_daily_delta").exists(_.exists(_.contains("cum"))),
        s"first window must attribute to the first begin scope: $rec")
      assert(rec.get("second_query").exists(_.exists(_.contains("lagv"))),
        s"second window must attribute to the second begin scope: $rec")
      val off = WindowGuard.offenders(spark)
      assert(!off.contains("q72_daily_delta"),
        "an allowlisted query must not be an offender")
      assert(off.contains("second_query"))
    } finally WindowGuard.reset()
  }

  test("splitFatCells runs NO unpartitioned window at any execution layer (q363 fix pin)") {
    // build + drift-append OUTSIDE the guarded scope (their own internal
    // windows are not under test), then guard exactly the repair
    val corpus = SimilarityOps.vectors(spark, sf)
    AnnIndexOps.buildResidualIndex(spark, corpus, "graft_wgspec")
    val shifted = corpus
      .crossJoin(spark.range(3).select(col("id").as("copy")))
      .select(
        (col("vec_id") + lit(9200000000L) + col("copy") * lit(1000000L))
          .as("vec_id"),
        expr("transform(v, (x, i) -> 0.05D * x + IF(i = 0, 0.95D, 0D))")
          .as("v"))
    AnnIndexOps.appendToIndex(spark, shifted, "graft_wgspec")
    WindowGuard.reset()
    WindowGuard.install(spark)
    try {
      WindowGuard.begin(spark, "split_pin")
      val split = AnnIndexOps.splitFatCells(spark, "graft_wgspec")
      assert(split.nonEmpty, "fixture drift: the planted pile must split")
      val rec = WindowGuard.recorded(spark)
      assert(!rec.contains("split_pin"),
        "the repaired split must not execute any unpartitioned window " +
          s"(the r15 single-task seeding regression): ${rec.get("split_pin")}")
    } finally WindowGuard.reset()
  }

  test("the runtime allowlist documents every static-allowlisted query (static subset of runtime)") {
    // anything in PlanSpec's static set executes its window at runtime
    // too, so a static entry missing here would fail Verify's gate
    val staticSet = Set(
      "q72_daily_delta", "q92_global_index", "q145_concentration",
      "q151_chi_square_cells", "q161_revenue_trend",
      "q177_cusum_changepoint", "q188_hist_quantiles",
      "q196_epoch_shuffle", "q198_budget_mix", "q204_adoption_curve",
      "q205_open_orders", "q206_rolling_zscore", "q220_ks_drift",
      "q240_forecast_baselines", "q285_rolling_hll", "q311_unimax_budget",
      "q320_budget_select", "q327_bpe_budget", "q337_zipf_slope",
      "q364_hybrid_retrieval")
    val missing = staticSet -- WindowGuard.allowed.keySet
    assert(missing.isEmpty,
      s"static allowlist entries missing from the runtime allowlist: $missing")
  }
}
