package graft.plans

import java.util.concurrent.ConcurrentHashMap

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.logical.{Window => LogicalWindow}
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** RUNTIME unpartitioned-window guard (VERDICT r15 #2).
  *
  * PlanSpec's static sweep collects `optimizedPlan` of each graded
  * query's RETURNED frame — but lifecycle internals that execute
  * EAGERLY inside the query body (localCheckpoint fits, saveAsTable
  * rewrites) never appear in that plan, which is exactly how q363's
  * single-task seeding window escaped for a round. This guard closes
  * the hole at the only layer that sees every execution: a
  * QueryExecutionListener records, for EVERY action the session runs
  * (count/collect/checkpoint/write), any logical Window with an empty
  * partitionSpec in that action's optimized plan, attributed to the
  * query the harness is currently running.
  *
  * An unpartitioned window funnels its whole input through ONE task,
  * so it is legal only over frames bounded by CONSTRUCTION (a
  * calendar/grid/catalog frame whose cardinality cannot grow with the
  * data). [[allowed]] is the runtime allowlist: query name → the
  * documented bound. It is a SUPERSET of PlanSpec's static list
  * because eager internals fire here that the static sweep cannot see.
  * Attribution caveat: memoized builds execute under the FIRST query
  * that triggers them, so an internal bounded window of a shared build
  * may attribute to any of its family — allowlist every graded entry
  * of the family, not just the one that "owns" the helper.
  *
  * Listener callbacks are delivered on the async listener bus, so
  * [[drain]] (reflective LiveListenerBus.waitUntilEmpty — package-
  * private in Spark, public at the bytecode level) must run between
  * queries or attributions smear across boundaries.
  */
object WindowGuard {

  /** Runtime allowlist: graded query name → documented bound for every
    * unpartitioned window that EXECUTES while the query runs. Keep in
    * step with PlanSpec's static map (static ⊂ runtime: anything in
    * the returned plan also executes).
    */
  val allowed: Map[String, String] = Map(
    // ---- PlanSpec's static set: the returned plan executes too ----
    "q72_daily_delta" -> "calendar frame: one row per day after a date agg",
    "q92_global_index" -> "256-row md5-prefix shard-count frame",
    "q145_concentration" -> "<=8192-row log-grid shard-count frame",
    "q151_chi_square_cells" -> "cohort x event_type contingency cells",
    "q161_revenue_trend" -> "calendar frame: one row per month",
    "q177_cusum_changepoint" -> "calendar frame: one row per day",
    "q188_hist_quantiles" -> "64-row bin frame",
    "q196_epoch_shuffle" -> "q92's 256-row md5-prefix shard frame",
    "q198_budget_mix" -> "source-dimension catalog frame",
    "q204_adoption_curve" -> "calendar frame: one row per day",
    "q205_open_orders" -> "calendar frame: one row per day",
    "q206_rolling_zscore" -> "calendar frame: one row per day",
    "q220_ks_drift" -> "<=8192-row log-grid shard-count frame",
    "q240_forecast_baselines" -> "calendar frame: one row per day",
    "q285_rolling_hll" -> "calendar frame: one row per day",
    "q311_unimax_budget" -> "one row per language vocabulary frame",
    "q320_budget_select" -> "<=1001-row permille density grid frame",
    "q327_bpe_budget" -> "q320's <=1001-row density grid frame",
    "q337_zipf_slope" -> "<=256-row top-rank frame after limit(256)",
    "q364_hybrid_retrieval" ->
      "query-catalog frame: one row per retrieval query",
    // ---- runtime-only: eager internals the static sweep can't see ----
    "q273_seasonal_decomp" ->
      ("calendar frame (one row per day) behind an eager localCheckpoint" +
        " — the round-10 hardening moved it out of the returned plan"),
    "q373_stack_takedown" ->
      ("query-catalog frame: the q364 serve's synthetic q_id ranking" +
        " (one row per retrieval query) executes eagerly inside the" +
        " certification's stored-stack serves"),
    "q375_hybrid_eval" ->
      ("query-catalog frame: the q364 serve ranking over one row per" +
        " retrieval query, executed eagerly while assembling the eval"))

  private val hits = new ConcurrentHashMap[String, java.util.Set[String]]()
  @volatile private var current: String = "<outside-query>"

  final class Listener extends QueryExecutionListener {
    override def onSuccess(funcName: String, qe: QueryExecution,
        durationNs: Long): Unit = record(qe)
    override def onFailure(funcName: String, qe: QueryExecution,
        exception: Exception): Unit = record(qe)
    private def record(qe: QueryExecution): Unit =
      try {
        val unpart = qe.optimizedPlan.collectWithSubqueries {
          case w: LogicalWindow if w.partitionSpec.isEmpty =>
            w.windowExpressions.map(_.name).mkString("window[", ",", "]")
        }
        if (unpart.nonEmpty) {
          val set = hits.computeIfAbsent(current,
            _ => ConcurrentHashMap.newKeySet[String]())
          unpart.foreach(set.add)
        }
      } catch { case _: Throwable => () } // a guard must never kill a job
  }

  def install(spark: SparkSession): Unit =
    spark.listenerManager.register(new Listener)

  /** Flush the async listener bus so pending events attribute to the
    * query that actually ran them. `listenerBus`/`waitUntilEmpty` are
    * private[spark] (public bytecode) — reflection, tooling-only.
    */
  def drain(spark: SparkSession): Unit =
    try {
      val sc = spark.sparkContext
      val bus = sc.getClass.getMethod("listenerBus").invoke(sc)
      val m = bus.getClass.getMethods
        .filter(_.getName == "waitUntilEmpty")
        .minBy(_.getParameterCount)
      if (m.getParameterCount == 0) m.invoke(bus)
      else m.invoke(bus, java.lang.Long.valueOf(10000L))
      ()
    } catch { case _: Throwable => () }

  /** Mark the start of a graded query; call [[drain]] first so the
    * previous query's stragglers don't attribute here.
    */
  def begin(spark: SparkSession, name: String): Unit = {
    drain(spark); current = name
  }

  /** All recorded (query → unpartitioned-window fragments). */
  def recorded(spark: SparkSession): Map[String, Set[String]] = {
    drain(spark)
    hits.asScala.map { case (k, v) => k -> v.asScala.toSet }.toMap
  }

  /** Queries that ran an unpartitioned window and are NOT allowlisted. */
  def offenders(spark: SparkSession): Map[String, Set[String]] =
    recorded(spark).filterNot { case (k, _) => allowed.contains(k) }

  def reset(): Unit = { hits.clear(); current = "<outside-query>" }
}
