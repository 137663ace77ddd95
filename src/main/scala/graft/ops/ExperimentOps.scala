package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
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
        // NULLIF guards var(X)=0 (all users share one pre-period value):
        // both engines then agree on NULL instead of diverging on their
        // zero-divisor conventions.
        ((col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
          nullif((col("n") * col("sxx") - col("sx") * col("sx")), lit(0))
            .cast("double"))
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
      |      / CAST(NULLIF(n * sxx - sx * sx, 0) AS DOUBLE) AS theta,
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

  /** q220 body: EXACT two-sample Kolmogorov–Smirnov distance between
    * the order-value distributions of urgent vs non-urgent orders —
    * the standard drift test between two samples, integer-exact: at
    * every distinct value v, the ECDF gap |F_A(v) − F_B(v)| equals
    * |cumA·n_B − cumB·n_A| / (n_A·n_B), so the argmax and the KS
    * numerator are pure BIGINT comparisons; the only double is the
    * final ratio (one shared division).
    *
    * Scale shape: the ECDF needs a GLOBAL cumulative sum over the
    * distinct-value relation, which grows with the data — the q145
    * hazard. Same cure: the log-grid shard (`floor(log1p(cents)·64)`,
    * monotonic in cents, ≤8192 cells, data-independent cut points), so
    * per-shard cumsums run in parallel and the one unpartitioned window
    * covers the bounded shard-count frame only (PlanSpec allowlists the
    * class). The top-1 argmax is a TakeOrdered, never a global sort.
    */
  def ksDrift(orders: DataFrame): DataFrame = {
    val dec = "decimal(38,0)"
    val byValue = orders
      .select(round(col("o_totalprice") * 100, 0).cast("long").as("cents"),
        when(col("o_orderpriority").startsWith("1"), 1L).otherwise(0L).as("isa"))
      .groupBy("cents")
      .agg(sum(col("isa")).as("a_cnt"), sum(lit(1L) - col("isa")).as("b_cnt"))
      .withColumn("shard",
        least(lit(8191), greatest(lit(0),
          floor(log1p(col("cents").cast("double")) * 64))).cast("int"))
    val offsets = byValue.groupBy("shard")
      .agg(sum(col("a_cnt")).as("sa"), sum(col("b_cnt")).as("sb"))
      .select(col("shard"),
        coalesce(sum(col("sa")).over(
          Window.orderBy("shard").rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)).as("off_a"),
        coalesce(sum(col("sb")).over(
          Window.orderBy("shard").rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)).as("off_b"),
        sum(col("sa")).over(Window.partitionBy()).as("n_a"),
        sum(col("sb")).over(Window.partitionBy()).as("n_b"))
    val wIn = Window.partitionBy("shard").orderBy("cents")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    byValue.join(broadcast(offsets), Seq("shard"))
      .withColumn("cum_a", col("off_a") + sum(col("a_cnt")).over(wIn))
      .withColumn("cum_b", col("off_b") + sum(col("b_cnt")).over(wIn))
      .withColumn("ks_num",
        abs(col("cum_a").cast(dec) * col("n_b").cast(dec)
          - col("cum_b").cast(dec) * col("n_a").cast(dec)))
      .orderBy(col("ks_num").desc, col("cents").asc)
      .limit(1)
      .select(col("n_a"), col("n_b"), col("cents").as("at_cents"),
        col("ks_num").cast("long").as("ks_num"),
        (col("ks_num").cast("double") /
          (col("n_a").cast("double") * col("n_b").cast("double"))).as("ks"))
  }

  private val ksOracle: String =
    """WITH v AS (
      |  SELECT CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS cents,
      |    CASE WHEN o_orderpriority LIKE '1%' THEN 1 ELSE 0 END AS isa
      |  FROM orders),
      |g AS (
      |  SELECT cents, SUM(isa) AS a_cnt, SUM(1 - isa) AS b_cnt
      |  FROM v GROUP BY 1),
      |t AS (SELECT CAST(SUM(a_cnt) AS HUGEINT) AS na,
      |  CAST(SUM(b_cnt) AS HUGEINT) AS nb FROM g),
      |c AS (
      |  SELECT cents,
      |    SUM(a_cnt) OVER (ORDER BY cents) AS ca,
      |    SUM(b_cnt) OVER (ORDER BY cents) AS cb
      |  FROM g),
      |d AS (SELECT cents, ABS(ca * nb - cb * na) AS diff, na, nb
      |  FROM c, t)
      |SELECT CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
      |  cents AS at_cents, CAST(diff AS BIGINT) AS ks_num,
      |  CAST(diff AS DOUBLE) / (CAST(na AS DOUBLE) * CAST(nb AS DOUBLE))
      |    AS ks
      |FROM d ORDER BY diff DESC, cents LIMIT 1""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q219_cuped", Some(cupedOracle),
      (spark, dir) => cupedAdjustment(EventOps.events(spark, dir))),

    QueryDef("q220_ks_drift", Some(ksOracle),
      (spark, dir) => ksDrift(t(spark, dir, "orders"))))
}
