package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.QueryDef
import graft.util.Tables._

/** Experimentation analytics beyond q141's Welch t-test: CUPED
  * variance reduction — the standard pre-experiment-covariate
  * adjustment every mature A/B platform applies before reading a
  * metric. The reference has no experimentation tier; this extends the
  * engine's statistical surface with the one technique that routinely
  * halves experiment runtimes.
  */
object ExperimentOps {

  /** q219 body: CUPED-adjusted experiment means. The events window
    * splits at min_day + 15 into pre-period (covariate X = per-user
    * purchase cents before the cut) and experiment period (metric Y =
    * per-user purchase cents after); arms by user parity (the q151
    * cohort convention). θ = cov(X,Y)/var(X) from POOLED moments, and
    * each arm reports mean(Y) and mean(Y) − θ·(mean(X) − mean(X)_all).
    *
    * Exactness: X/Y are integer cents; all moments (n, Σx, Σy, Σxy,
    * Σx²) accumulate in DECIMAL(38,0) — order-independent under any
    * partitioning — and doubles appear only in the final shared
    * expression tree (one cast per moment, one division per mean, the
    * θ ratio), with the SAME parenthesization in the DuckDB oracle so
    * the IEEE results are bit-identical. Plan: one fact scan collapsing
    * to a per-user row, one user-level aggregate for the pooled moments
    * (a broadcast one-row frame), one per-arm aggregate. The cutoff
    * rides in as a broadcast scalar, never a collect.
    */
  def cupedAdjustment(ev: DataFrame): DataFrame = {
    val cut = ev.agg(date_add(min(to_date(col("ts"))), 15).as("cut"))
    val user = ev.crossJoin(broadcast(cut))
      .select(col("user_id"),
        to_date(col("ts")).as("day"), col("cut"), col("event_type"),
        round(col("value") * 100, 0).cast("long").as("cents"))
      .groupBy("user_id")
      .agg(
        coalesce(sum(when(col("event_type") === "purchase"
          && col("day") < col("cut"), col("cents"))), lit(0L))
          .cast("decimal(38,0)").as("x"),
        coalesce(sum(when(col("event_type") === "purchase"
          && col("day") >= col("cut"), col("cents"))), lit(0L))
          .cast("decimal(38,0)").as("y"))
    val pooled = user.agg(
      count(lit(1)).cast("decimal(38,0)").as("n"),
      sum(col("x")).as("sx"), sum(col("y")).as("sy"),
      sum(col("x") * col("y")).as("sxy"),
      sum(col("x") * col("x")).as("sxx"))
      .select(
        ((col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
          (col("n") * col("sxx") - col("sx") * col("sx")).cast("double"))
          .as("theta"),
        (col("sx").cast("double") / col("n").cast("double")).as("mean_x_all"))
    user
      .withColumn("arm",
        when(col("user_id") % 2 === 0, "A").otherwise("B"))
      .groupBy("arm")
      .agg(count(lit(1)).as("n_users"),
        sum(col("x")).as("sxa"), sum(col("y")).as("sya"))
      .crossJoin(broadcast(pooled))
      .select(col("arm"), col("n_users"),
        (col("sya").cast("double") / col("n_users").cast("double"))
          .as("mean_y"),
        (col("sxa").cast("double") / col("n_users").cast("double"))
          .as("mean_x"),
        ((col("sya").cast("double") / col("n_users").cast("double"))
          - col("theta") *
            ((col("sxa").cast("double") / col("n_users").cast("double"))
              - col("mean_x_all"))).as("mean_y_adj"))
      .orderBy("arm")
  }

  private val cupedOracle: String =
    """WITH cutoff AS (
      |  SELECT MIN(CAST(ts AS DATE)) + 15 AS cut FROM events),
      |u AS (
      |  SELECT user_id,
      |    CAST(COALESCE(SUM(CASE WHEN event_type = 'purchase'
      |        AND CAST(ts AS DATE) < cut
      |      THEN CAST(ROUND(value * 100, 0) AS BIGINT) END), 0)
      |      AS HUGEINT) AS x,
      |    CAST(COALESCE(SUM(CASE WHEN event_type = 'purchase'
      |        AND CAST(ts AS DATE) >= cut
      |      THEN CAST(ROUND(value * 100, 0) AS BIGINT) END), 0)
      |      AS HUGEINT) AS y
      |  FROM events, cutoff GROUP BY user_id),
      |pooled AS (
      |  SELECT CAST(n * sxy - sx * sy AS DOUBLE)
      |      / CAST(n * sxx - sx * sx AS DOUBLE) AS theta,
      |    CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) AS mean_x_all
      |  FROM (SELECT CAST(COUNT(*) AS HUGEINT) AS n, SUM(x) AS sx,
      |      SUM(y) AS sy, SUM(x * y) AS sxy, SUM(x * x) AS sxx
      |    FROM u)),
      |arms AS (
      |  SELECT CASE WHEN user_id % 2 = 0 THEN 'A' ELSE 'B' END AS arm,
      |    CAST(COUNT(*) AS BIGINT) AS n_users,
      |    SUM(x) AS sxa, SUM(y) AS sya
      |  FROM u GROUP BY 1)
      |SELECT arm, n_users,
      |  CAST(sya AS DOUBLE) / CAST(n_users AS DOUBLE) AS mean_y,
      |  CAST(sxa AS DOUBLE) / CAST(n_users AS DOUBLE) AS mean_x,
      |  (CAST(sya AS DOUBLE) / CAST(n_users AS DOUBLE))
      |    - theta * ((CAST(sxa AS DOUBLE) / CAST(n_users AS DOUBLE))
      |      - mean_x_all) AS mean_y_adj
      |FROM arms, pooled ORDER BY arm""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q219_cuped", Some(cupedOracle),
      (spark, dir) => cupedAdjustment(EventOps.events(spark, dir))))
}
