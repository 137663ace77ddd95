package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.QueryDef
import graft.util.Tables._

/** Round-9 time-series tier: seasonality anomalies, CUSUM changepoint
  * scan, gap-aware autocorrelation, inter-order gap distribution, and
  * last-touch attribution — the monitoring-on-a-pipeline surface
  * (`03:141-152` extended per SURVEY §7.4).
  *
  * Bit-stability doctrine (shared with StatOps): every statistic is
  * computed from EXACT integer sums (counts, scaled residuals), with
  * doubles entering only in a final, identically-shaped expression tree —
  * each IEEE op is correctly rounded, so identical trees over exact
  * integer inputs produce identical bits in Spark and DuckDB. No double
  * is ever AGGREGATED (that would be partition-order dependent).
  */
object TimeSeriesOps {

  /** Daily order counts — the shared base series. One shuffle on the
    * day key; the frame is calendar-bounded from then on.
    */
  private def dailyOrders(orders: DataFrame): DataFrame =
    orders.groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(count(lit(1)).as("cnt"))

  /** Day-of-week seasonality anomalies: the 10 days that deviate most
    * from their weekday's mean, by z-score. The per-weekday moments
    * (n, Σc, Σc²) are exact BIGINT sums over the day-aggregated series;
    * z = (n·c − Σc) / (n · σ) is assembled in ONE shared expression tree
    * (cast → divide → sqrt → multiply → divide), so both engines emit
    * identical bits. (At 100 TB the BIGINT Σc² would move to
    * DECIMAL(38,0); counts here keep n·Σc² far below 2^63.)
    *
    * Scale shape: one shuffle to the day grain, then a 7-row weekday
    * aggregate broadcast back over the calendar-bounded day frame.
    */
  def dowAnomalies(orders: DataFrame): DataFrame = {
    val daily = dailyOrders(orders)
      // Spark dayofweek: 1=Sunday..7=Saturday; DuckDB dayofweek:
      // 0=Sunday..6=Saturday — subtract 1 so the texts agree.
      .withColumn("dow", (dayofweek(col("day")) - lit(1)).cast("int"))
    val stats = daily.groupBy("dow").agg(
      count(lit(1)).as("n"),
      sum(col("cnt")).as("s"),
      sum(col("cnt") * col("cnt")).as("ss"))
    daily.join(broadcast(stats), Seq("dow"))
      .withColumn("z",
        (col("n") * col("cnt") - col("s")).cast("double") /
          (col("n").cast("double") *
            sqrt((col("n") * col("ss") - col("s") * col("s")).cast("double") /
              (col("n") * (col("n") - lit(1))).cast("double"))))
      .select(col("day"), col("dow"), col("cnt"), col("z"))
      .orderBy(abs(col("z")).desc, col("day"))
      .limit(10)
  }

  private val dowAnomaliesOracle: String =
    """WITH daily AS (
      |  SELECT CAST(o_orderdate AS DATE) AS day,
      |    CAST(COUNT(*) AS BIGINT) AS cnt
      |  FROM orders GROUP BY 1),
      |d2 AS (SELECT day, CAST(dayofweek(day) AS INT) AS dow, cnt FROM daily),
      |stats AS (
      |  SELECT dow, CAST(COUNT(*) AS BIGINT) AS n,
      |    CAST(SUM(cnt) AS BIGINT) AS s,
      |    CAST(SUM(cnt * cnt) AS BIGINT) AS ss
      |  FROM d2 GROUP BY dow)
      |SELECT d2.day, d2.dow, d2.cnt,
      |  CAST(n * cnt - s AS DOUBLE) /
      |    (CAST(n AS DOUBLE) *
      |      SQRT(CAST(n * ss - s * s AS DOUBLE) /
      |           CAST(n * (n - 1) AS DOUBLE))) AS z
      |FROM d2 JOIN stats ON stats.dow = d2.dow
      |ORDER BY ABS(CAST(n * cnt - s AS DOUBLE) /
      |  (CAST(n AS DOUBLE) *
      |    SQRT(CAST(n * ss - s * s AS DOUBLE) /
      |         CAST(n * (n - 1) AS DOUBLE)))) DESC, d2.day
      |LIMIT 10""".stripMargin

  /** CUSUM changepoint scan over the daily order-count series: the
    * running sum of scaled deviations N·c_t − T (N days, T total orders —
    * integers, so the cusum is EXACT and order-independent), reporting
    * the 5 days where |cusum| peaks. A level shift in the series puts
    * its onset at the global |cusum| maximum — the classic
    * mean-change estimator.
    *
    * Scale shape: the cumulative window is unpartitioned BUT runs over
    * the day-aggregated frame — one row per calendar day, bounded by the
    * span of time, not data volume (PlanSpec allowlists it under that
    * justification, like q72).
    */
  def cusumChangepoint(orders: DataFrame): DataFrame = {
    val daily = dailyOrders(orders)
    val tot = daily.agg(
      count(lit(1)).as("n_days"), sum(col("cnt")).as("total"))
    val w = Window.orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    daily.crossJoin(broadcast(tot))
      .withColumn("dev", col("n_days") * col("cnt") - col("total"))
      .withColumn("cusum", sum(col("dev")).over(w))
      .select(col("day"), col("cnt"), col("cusum"))
      .orderBy(abs(col("cusum")).desc, col("day"))
      .limit(5)
  }

  private val cusumOracle: String =
    """WITH daily AS (
      |  SELECT CAST(o_orderdate AS DATE) AS day,
      |    CAST(COUNT(*) AS BIGINT) AS cnt
      |  FROM orders GROUP BY 1),
      |tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
      |  CAST(SUM(cnt) AS BIGINT) AS total FROM daily),
      |c AS (
      |  SELECT day, cnt,
      |    CAST(SUM(n_days * cnt - total) OVER (ORDER BY day
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |      AS cusum
      |  FROM daily CROSS JOIN tot)
      |SELECT day, cnt, cusum FROM c
      |ORDER BY ABS(cusum) DESC, day
      |LIMIT 5""".stripMargin

  /** Gap-aware autocorrelation of the daily order-count series at lags
    * 1 and 7 days. Pairing is a SELF-JOIN on day = day + lag (not a
    * positional window), so calendar gaps pair nothing instead of
    * pairing wrong neighbours, and the plan needs no unpartitioned
    * window at all. Pearson r is assembled from six exact BIGINT sums
    * in one shared expression tree — bit-identical across engines.
    *
    * Scale shape: the day-grain series is calendar-bounded, so both
    * join sides broadcast; each lag collapses to a single-row aggregate
    * map-side.
    */
  def dailyAutocorr(orders: DataFrame): DataFrame = {
    val daily = dailyOrders(orders)
    def lagCorr(k: Int): DataFrame = {
      val a = daily.select(col("day"), col("cnt").as("x"))
      val b = daily.select(col("day").as("day2"), col("cnt").as("y"))
      a.join(broadcast(b), date_add(col("day"), k) === col("day2"))
        .agg(
          count(lit(1)).as("n"), sum(col("x")).as("sx"),
          sum(col("y")).as("sy"), sum(col("x") * col("y")).as("sxy"),
          sum(col("x") * col("x")).as("sxx"),
          sum(col("y") * col("y")).as("syy"))
        .select(
          lit(k).as("lag"), col("n").as("n_pairs"),
          ((col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
            (sqrt((col("n") * col("sxx") - col("sx") * col("sx")).cast("double")) *
              sqrt((col("n") * col("syy") - col("sy") * col("sy")).cast("double"))))
            .as("acf"))
    }
    lagCorr(1).unionByName(lagCorr(7)).orderBy("lag")
  }

  private val autocorrOracle: String =
    """WITH daily AS (
      |  SELECT CAST(o_orderdate AS DATE) AS day,
      |    CAST(COUNT(*) AS BIGINT) AS cnt
      |  FROM orders GROUP BY 1),
      |pairs AS (
      |  SELECT k.lag, a.cnt AS x, b.cnt AS y
      |  FROM (VALUES (1), (7)) k(lag)
      |  JOIN daily a ON TRUE
      |  JOIN daily b ON b.day = a.day + CAST(k.lag AS INT)),
      |m AS (
      |  SELECT lag, CAST(COUNT(*) AS BIGINT) AS n,
      |    CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
      |    CAST(SUM(x * y) AS BIGINT) AS sxy,
      |    CAST(SUM(x * x) AS BIGINT) AS sxx,
      |    CAST(SUM(y * y) AS BIGINT) AS syy
      |  FROM pairs GROUP BY lag)
      |SELECT CAST(lag AS INT) AS lag, n AS n_pairs,
      |  CAST(n * sxy - sx * sy AS DOUBLE) /
      |    (SQRT(CAST(n * sxx - sx * sx AS DOUBLE)) *
      |     SQRT(CAST(n * syy - sy * sy AS DOUBLE))) AS acf
      |FROM m ORDER BY lag""".stripMargin

  /** Inter-order gap distribution: per-customer days-between-orders via
    * LAG over (customer, date) — the window partitions on the CUSTOMER
    * key, so frames are per-customer order counts (data-bounded per key,
    * parallel across keys) — then a week-bucket histogram with an exact
    * integer mean (Σgap / n, one IEEE divide).
    */
  def orderGapHistogram(orders: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    orders
      .withColumn("prev", lag(col("o_orderdate"), 1).over(w))
      .where(col("prev").isNotNull)
      .withColumn("gap", datediff(to_date(col("o_orderdate")), to_date(col("prev"))))
      .withColumn("gap_wk", least(floor(col("gap") / 7).cast("int"), lit(8)))
      .groupBy("gap_wk")
      .agg(count(lit(1)).as("n"),
        sum(col("gap")).as("gap_days"),
        (sum(col("gap")).cast("double") / count(lit(1))).as("mean_gap"))
      .orderBy("gap_wk")
  }

  private val orderGapOracle: String =
    """WITH g AS (
      |  SELECT date_diff('day',
      |      CAST(LAG(o_orderdate, 1) OVER (PARTITION BY o_custkey
      |        ORDER BY o_orderdate, o_orderkey) AS DATE),
      |      CAST(o_orderdate AS DATE)) AS gap
      |  FROM orders),
      |b AS (SELECT LEAST(CAST(FLOOR(gap / 7) AS INT), 8) AS gap_wk, gap
      |  FROM g WHERE gap IS NOT NULL)
      |SELECT gap_wk, CAST(COUNT(*) AS BIGINT) AS n,
      |  CAST(SUM(gap) AS BIGINT) AS gap_days,
      |  CAST(SUM(gap) AS DOUBLE) / COUNT(*) AS mean_gap
      |FROM b GROUP BY gap_wk ORDER BY gap_wk""".stripMargin

  /** Last-touch attribution: each purchase event is attributed to the
    * same user's most recent STRICTLY PRIOR click, bucketed by
    * click-to-purchase lag. The "most recent prior click" is a running
    * MAX(CASE) over a (user, time)-ordered window with a 1-PRECEDING
    * upper bound — per-user frames, parallel across users; no self-join
    * of the event stream against itself.
    */
  def lastTouchAttribution(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    events
      .withColumn("last_click",
        max(when(col("event_type") === "click", col("ts"))).over(w))
      .where(col("event_type") === "purchase")
      .withColumn("bucket",
        when(col("last_click").isNull, "never_clicked")
          .when(col("ts") <= col("last_click") + expr("INTERVAL '1' HOUR"),
            "within_1h")
          .when(col("ts") <= col("last_click") + expr("INTERVAL '24' HOUR"),
            "within_1d")
          .when(col("ts") <= col("last_click") + expr("INTERVAL '168' HOUR"),
            "within_7d")
          .otherwise("stale"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_purchases"),
        countDistinct(col("user_id")).as("n_users"))
      .orderBy("bucket")
  }

  private val attributionOracle: String =
    """WITH e AS (
      |  SELECT user_id, event_id, ts, event_type,
      |    MAX(CASE WHEN event_type = 'click' THEN ts END)
      |      OVER (PARTITION BY user_id ORDER BY ts, event_id
      |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
      |      AS last_click
      |  FROM events),
      |p AS (
      |  SELECT CASE
      |      WHEN last_click IS NULL THEN 'never_clicked'
      |      WHEN ts <= last_click + INTERVAL 1 HOUR THEN 'within_1h'
      |      WHEN ts <= last_click + INTERVAL 24 HOUR THEN 'within_1d'
      |      WHEN ts <= last_click + INTERVAL 168 HOUR THEN 'within_7d'
      |      ELSE 'stale' END AS bucket,
      |    user_id
      |  FROM e WHERE event_type = 'purchase')
      |SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_purchases,
      |  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
      |FROM p GROUP BY bucket ORDER BY bucket""".stripMargin

  /** Position-based (U-shaped, 40/20/40) multi-touch attribution — the
    * credit-splitting sibling of q181's last-touch: each purchase
    * distributes its value across the user's clicks in the preceding 7
    * days in integer BASIS POINTS (first 4000, last 4000, middles share
    * 2000 with the division remainder pinned to the first middle), so
    * every credit is exact BIGINT arithmetic that sums identically under
    * any partitioning — the q97/q141 doctrine applied to money splits
    * (a double 0.4 split would leak ulps per touch).
    *
    * Scale shape: ONE user-keyed shuffle joins purchases to clicks with
    * the 7-day bound as a residual range predicate (q152's SCD2 shape —
    * per-user frames are retention-bounded); the rank/size windows
    * partition by purchase id (touch lists are session-sized). Channel
    * comes from the click's JSON props (q44's extraction, k mod 5).
    */
  def positionAttribution(events: DataFrame): DataFrame = {
    val p = events.where(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("user_id"),
        col("ts").as("p_ts"),
        round(col("value") * 100).cast("long").as("cents"))
    val c = events.where(col("event_type") === "click")
      .select(col("event_id").as("c_id"), col("user_id").as("c_user"),
        col("ts").as("c_ts"),
        concat(lit("ch"),
          get_json_object(col("props"), "$.k").cast("int") % 5).as("channel"))
    val j = p.join(c, col("user_id") === col("c_user") &&
      col("c_ts") < col("p_ts") &&
      col("c_ts") >= col("p_ts") - expr("INTERVAL '7' DAY"))
    val byPurchase = Window.partitionBy(col("p_id"))
    val r = j
      .withColumn("rnk", row_number().over(
        byPurchase.orderBy(col("c_ts"), col("c_id"))))
      .withColumn("m", count(lit(1)).over(byPurchase))
    val b = r.withColumn("bp", expr(
      """CASE WHEN m = 1 THEN 10000
        |     WHEN m = 2 THEN 5000
        |     WHEN rnk = 1 OR rnk = m THEN 4000
        |     ELSE 2000 div (m - 2)
        |       + CASE WHEN rnk = 2 THEN 2000 % (m - 2) ELSE 0 END
        |END""".stripMargin))
    b.groupBy("channel")
      .agg(count(lit(1)).as("n_touches"),
        sum(when(col("rnk") === 1, 1L).otherwise(0L)).as("n_first"),
        sum(when(col("rnk") === col("m"), 1L).otherwise(0L)).as("n_last"),
        sum(expr("(cents * bp) div 10000")).as("attributed_cents"),
        sum(col("bp")).as("sum_bp"))
      .orderBy("channel")
  }

  private val positionAttributionOracle: String =
    """WITH p AS (SELECT event_id AS p_id, user_id, ts AS p_ts,
      |    CAST(round(value * 100) AS BIGINT) AS cents
      |  FROM events WHERE event_type = 'purchase'),
      |c AS (SELECT event_id AS c_id, user_id, ts AS c_ts,
      |    'ch' || CAST(CAST(json_extract_string(props, '$.k') AS INT) % 5
      |      AS VARCHAR) AS channel
      |  FROM events WHERE event_type = 'click'),
      |j AS (SELECT p.p_id, p.cents, c.c_id, c.c_ts, c.channel
      |  FROM p JOIN c ON p.user_id = c.user_id
      |    AND c.c_ts < p.p_ts AND c.c_ts >= p.p_ts - INTERVAL 7 DAY),
      |r AS (SELECT *,
      |    ROW_NUMBER() OVER (PARTITION BY p_id ORDER BY c_ts, c_id) AS rnk,
      |    COUNT(*) OVER (PARTITION BY p_id) AS m
      |  FROM j),
      |b AS (SELECT channel, cents, rnk, m,
      |    CASE WHEN m = 1 THEN 10000
      |         WHEN m = 2 THEN 5000
      |         WHEN rnk = 1 OR rnk = m THEN 4000
      |         ELSE 2000 // (m - 2)
      |           + CASE WHEN rnk = 2 THEN 2000 % (m - 2) ELSE 0 END
      |    END AS bp
      |  FROM r)
      |SELECT channel, CAST(COUNT(*) AS BIGINT) AS n_touches,
      |  CAST(SUM(CASE WHEN rnk = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_first,
      |  CAST(SUM(CASE WHEN rnk = m THEN 1 ELSE 0 END) AS BIGINT) AS n_last,
      |  CAST(SUM((cents * bp) // 10000) AS BIGINT) AS attributed_cents,
      |  CAST(SUM(bp) AS BIGINT) AS sum_bp
      |FROM b GROUP BY channel ORDER BY channel""".stripMargin

  /** Group-wise least-squares trend (q195): per-nation revenue slope
    * over calendar months, computed as AGGREGATION — the five exact
    * integer sums (n, Σx, Σy, Σxy, Σx²) with x = months since 1995-01
    * and y = month-revenue cents, then ONE closed-form projection:
    * slope = (nΣxy − ΣxΣy)/(nΣx² − (Σx)²). No per-group sort, no
    * window, no iterative solver: regression over a trillion rows is
    * two map-side-combining shuffles (day grid → month grid → nation
    * sums) and a 25-row final projection. Doubles appear only in that
    * final shared expression tree (the q97/q141 doctrine); all sums
    * cross shuffles as BIGINT on the cents grid.
    */
  def trendSlopes(
      orders: DataFrame, customer: DataFrame, nation: DataFrame): DataFrame = {
    val monthly = orders
      .join(customer, col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"),
        ((year(col("o_orderdate")) - 1995) * 12 + month(col("o_orderdate")) - 1)
          .cast("long").as("x"))
      .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("y"))
    monthly.groupBy("n_name")
      .agg(count(lit(1)).as("n_months"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("y")).as("sxy"), sum(col("x") * col("x")).as("sxx"))
      .select(col("n_name"), col("n_months"),
        ((col("n_months") * col("sxy") - col("sx") * col("sy")).cast("double") /
          (col("n_months") * col("sxx") - col("sx") * col("sx")).cast("double"))
          .as("slope_cents_per_month"),
        col("sy").as("total_cents"))
      .orderBy("n_name")
  }

  private val trendSlopesOracle: String =
    """WITH monthly AS (
      |  SELECT n.n_name,
      |    CAST((year(o.o_orderdate) - 1995) * 12
      |      + month(o.o_orderdate) - 1 AS BIGINT) AS x,
      |    SUM(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS y
      |  FROM orders o
      |  JOIN customer c ON o.o_custkey = c.c_custkey
      |  JOIN nation n ON c.c_nationkey = n.n_nationkey
      |  GROUP BY 1, 2),
      |s AS (SELECT n_name, CAST(COUNT(*) AS BIGINT) AS n_months,
      |    SUM(x) AS sx, SUM(y) AS sy, SUM(x * y) AS sxy, SUM(x * x) AS sxx
      |  FROM monthly GROUP BY n_name)
      |SELECT n_name, n_months,
      |  CAST(n_months * sxy - sx * sy AS DOUBLE)
      |    / CAST(n_months * sxx - sx * sx AS DOUBLE) AS slope_cents_per_month,
      |  CAST(sy AS BIGINT) AS total_cents
      |FROM s ORDER BY n_name""".stripMargin

  /** q278 body: Theil–Sen robust trend — the median of all pairwise
    * slopes over the trailing `windowDays` of the daily order series,
    * the estimator that shrugs off the outlier days that drag q195's
    * least-squares slope (breakdown point 29% vs 0%).
    *
    * Plan shape: Theil–Sen is inherently O(points²), so the points MUST
    * be a calendar-bounded grain (the q273 argument): the fact table
    * collapses to ≤ `windowDays` (day, cnt) rows in one
    * map-side-combined shuffle, and the pair fan-out happens ROW-LOCALLY
    * inside one bounded array via nested `transform` HOFs — no self-join
    * (a `di < dj` theta-join would plan a nested loop), no
    * unpartitioned window (the median is `element_at(array_sort(...))`
    * inside the row). ≤ 365 points → ≤ 66 795 slopes ≈ 0.5 MB of
    * doubles in one task, a constant independent of data volume.
    *
    * Exactness: each slope is ONE IEEE division of two exact BIGINTs —
    * bit-identical across engines — and selecting the k-th VALUE of the
    * sorted slopes is tie-insensitive, so the oracle may rank with
    * ROW_NUMBER while Spark sorts an array: equal values give an equal
    * k-th element. Lower median at even counts (q231's convention).
    */
  def theilSenTrend(orders: DataFrame, windowDays: Int = 365): DataFrame = {
    require(windowDays >= 2, s"windowDays must be >= 2, got $windowDays")
    val daily = orders.groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(count(lit(1)).as("cnt"))
    val mx = daily.agg(max(col("day")).as("mx"))
    daily.crossJoin(broadcast(mx))
      .where(col("day") > date_sub(col("mx"), windowDays))
      .select(datediff(col("day"), col("mx")).cast("long").as("di"),
        col("cnt"))
      .agg(array_sort(collect_list(struct(col("di"), col("cnt"))))
        .as("pts"))
      .select(size(col("pts")).cast("long").as("n_days"),
        expr("""CASE WHEN size(pts) < 2 THEN CAST(array() AS ARRAY<DOUBLE>)
          |ELSE flatten(transform(sequence(0, size(pts) - 2), i ->
          |  transform(sequence(i + 1, size(pts) - 1), j ->
          |    CAST(pts[j].cnt - pts[i].cnt AS DOUBLE) /
          |      CAST(pts[j].di - pts[i].di AS DOUBLE)))) END"""
          .stripMargin).as("slopes"))
      // a <2-day window has no pairs: emit NO row (matching the oracle's
      // empty join result) rather than feeding element_at an index of 0
      .where(size(col("slopes")) > 0)
      .select(col("n_days"),
        size(col("slopes")).cast("long").as("n_pairs"),
        expr("element_at(array_sort(slopes), CAST((size(slopes) + 1) DIV 2 AS INT))")
          .as("slope_per_day"))
  }

  private val theilSenOracle: String =
    """WITH daily AS (
      |  SELECT CAST(o_orderdate AS DATE) AS day,
      |    CAST(COUNT(*) AS BIGINT) AS cnt
      |  FROM orders GROUP BY 1),
      |mx AS (SELECT MAX(day) AS mx FROM daily),
      |win AS (
      |  SELECT CAST(date_diff('day', mx.mx, day) AS BIGINT) AS di, cnt
      |  FROM daily, mx WHERE day > mx.mx - 365),
      |pairs AS (
      |  SELECT CAST(b.cnt - a.cnt AS DOUBLE) / CAST(b.di - a.di AS DOUBLE)
      |    AS slope
      |  FROM win a JOIN win b ON b.di > a.di),
      |r AS (SELECT slope, ROW_NUMBER() OVER (ORDER BY slope) AS rn,
      |    COUNT(*) OVER () AS np
      |  FROM pairs),
      |d AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_days FROM win)
      |SELECT d.n_days, CAST(r.np AS BIGINT) AS n_pairs,
      |  r.slope AS slope_per_day
      |FROM r, d WHERE rn = (np + 1) // 2""".stripMargin

  /** Rolling z-score anomaly scan (q206): each day's order count
    * against the TRAILING 7-day window (rows between 7 preceding and 1
    * preceding — the day itself excluded, so a spike can't deflate its
    * own baseline). Mean and variance come from exact integer Σx and
    * Σx² inside the frame; z = (x − μ)/σ is one shared double tree over
    * those integers. Complements q176 (day-of-week baseline) and q177
    * (global CUSUM): this is the local-baseline alert. The window runs
    * over the daily series (calendar-bounded — the fact table collapsed
    * to one row per day first).
    */
  def rollingZscore(orders: DataFrame): DataFrame = {
    val daily = dailyOrders(orders)
    val w = Window.orderBy("day").rowsBetween(-7, -1)
    daily
      .withColumn("n_prev", count(lit(1)).over(w))
      .withColumn("sx", sum(col("cnt")).over(w))
      .withColumn("sxx", sum(col("cnt") * col("cnt")).over(w))
      .where(col("n_prev") === 7)
      .select(date_format(col("day"), "yyyy-MM-dd").as("day"),
        col("cnt").as("n"),
        (col("sx").cast("double") / 7.0).as("mean7"),
        // sigma = 0 (a perfectly flat trailing week) is an explicit NULL
        // in BOTH engines: Spark's ANSI divide rejects /0 and DuckDB
        // would emit inf — neither is the alert semantics we want
        when(col("sxx") * 7 - col("sx") * col("sx") === 0,
          lit(null).cast("double"))
          .otherwise((col("cnt") * 7 - col("sx")).cast("double") /
            sqrt((col("sxx") * 7 - col("sx") * col("sx")).cast("double")))
          .as("z"))
      .orderBy("day")
  }

  private val rollingZscoreOracle: String =
    """WITH d AS (SELECT CAST(o_orderdate AS DATE) AS day,
      |    CAST(COUNT(*) AS BIGINT) AS n
      |  FROM orders GROUP BY 1),
      |r AS (SELECT day, n,
      |    COUNT(*) OVER w AS n_prev,
      |    SUM(n) OVER w AS sx,
      |    SUM(n * n) OVER w AS sxx
      |  FROM d
      |  WINDOW w AS (ORDER BY day ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING))
      |SELECT strftime(day, '%Y-%m-%d') AS day, n,
      |  CAST(sx AS DOUBLE) / 7.0 AS mean7,
      |  CASE WHEN sxx * 7 - sx * sx = 0 THEN NULL
      |       ELSE CAST(n * 7 - sx AS DOUBLE)
      |         / sqrt(CAST(sxx * 7 - sx * sx AS DOUBLE)) END AS z
      |FROM r WHERE n_prev = 7 ORDER BY day""".stripMargin

  /** SLO error-budget burn (q207): per-hour error share against a 1%
    * budget, in integer basis points of budget burned — rate/budget as
    * (errors · 10000 · 100) div (events · 1), so the burn multiple is
    * exact BIGINT and the alert flag (burn ≥ 2x budget) cannot straddle
    * a float boundary. The pipeline-health sibling of C3's monitoring
    * rollup, at the granularity paging actually happens. One shuffle on
    * the hour key; CASE sums combine map-side.
    */
  def sloBurn(events: DataFrame): DataFrame =
    events
      .groupBy(date_format(col("ts"), "yyyy-MM-dd HH").as("hour"))
      .agg(count(lit(1)).as("n_events"),
        sum(when(col("event_type") === "error", 1L).otherwise(0L))
          .as("n_errors"))
      .select(col("hour"), col("n_events"), col("n_errors"),
        expr("(n_errors * 1000000) div n_events").as("burn_bp"),
        (expr("(n_errors * 1000000) div n_events") >= 20000)
          .cast("int").as("page"))
      .orderBy("hour")

  private val sloBurnOracle: String =
    """SELECT strftime(ts, '%Y-%m-%d %H') AS hour,
      |  CAST(COUNT(*) AS BIGINT) AS n_events,
      |  CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
      |    AS BIGINT) AS n_errors,
      |  CAST((SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
      |    * 1000000) // COUNT(*) AS BIGINT) AS burn_bp,
      |  CAST((SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
      |    * 1000000) // COUNT(*) >= 20000 AS INT) AS page
      |FROM events GROUP BY 1 ORDER BY hour""".stripMargin

  /** q273 body: classic additive seasonal decomposition of the daily
    * order series — trend (centered 7-day moving average), per-weekday
    * seasonal index (mean detrended deviation), and remainder — with
    * every statistic carried as EXACT scaled integers until one final
    * double expression per output column (the q176/q97 doctrine).
    * detrended·7 = 7·cnt − Σwindow is an integer; remainder·(7·n_dow)
    * is an integer; so the per-dow seasonal index and mean absolute
    * remainder are each ONE exact-integer division, bit-identical
    * across engines and partitionings. Windows touching a calendar gap
    * (fewer than 7 rows, or 7 rows spanning more than 6 days) are
    * excluded from the fit — the same honesty rule as q178's gap-aware
    * autocorrelation.
    *
    * Scale shape: one shuffle to the day grain; the moving average is a
    * single bounded ROWS frame over the calendar-bounded series; the
    * seasonal fit is a 7-row aggregate. Nothing global beyond the
    * day-grain series itself.
    */
  def seasonalDecomposition(orders: DataFrame): DataFrame = {
    val w = Window.orderBy("day").rowsBetween(-3, 3)
    val daily = dailyOrders(orders)
      .withColumn("wsum", sum(col("cnt")).over(w))
      .withColumn("wn", count(lit(1)).over(w))
      .withColumn("span", datediff(max(col("day")).over(w),
        min(col("day")).over(w)))
      .where(col("wn") === 7 && col("span") === 6)
      .withColumn("dow", (dayofweek(col("day")) - lit(1)).cast("int"))
      // detrended deviation on the ×7 integer grid
      .withColumn("dev7", lit(7) * col("cnt") - col("wsum"))
      // both sides of the self-join below read this frame; materialize
      // the (calendar-bounded) series once so the single-partition MA
      // window runs once, not twice
      .localCheckpoint()
    daily
      .groupBy("dow")
      .agg(count(lit(1)).as("n_days"), sum(col("dev7")).as("sdev7"))
      .join(daily.select(col("dow").as("d2"), col("dev7")),
        col("dow") === col("d2"))
      // remainder ×(7·n_dow) integer grid: 7·n·cnt−n·wsum−sdev7 ≡
      // n·dev7 − sdev7
      .groupBy(col("dow"), col("n_days"), col("sdev7"))
      .agg(sum(abs(col("n_days") * col("dev7") - col("sdev7")))
        .as("absrem"))
      .select(col("dow"), col("n_days"),
        (col("sdev7").cast("double") / (lit(7) * col("n_days")))
          .as("seasonal"),
        (col("absrem").cast("double") /
          (lit(7) * col("n_days") * col("n_days")))
          .as("mean_abs_remainder"))
      .orderBy("dow")
  }

  private val seasonalOracle: String =
    """WITH daily AS (
      |  SELECT CAST(o_orderdate AS DATE) AS day,
      |    CAST(COUNT(*) AS BIGINT) AS cnt
      |  FROM orders GROUP BY 1),
      |ma AS (
      |  SELECT day, cnt,
      |    SUM(cnt) OVER w AS wsum,
      |    COUNT(*) OVER w AS wn,
      |    date_diff('day', MIN(day) OVER w, MAX(day) OVER w) AS span
      |  FROM daily
      |  WINDOW w AS (ORDER BY day ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
      |dev AS (
      |  SELECT day, cnt, CAST(dayofweek(day) AS INT) AS dow,
      |    7 * cnt - wsum AS dev7
      |  FROM ma WHERE wn = 7 AND span = 6),
      |s AS (
      |  SELECT dow, CAST(COUNT(*) AS BIGINT) AS n_days,
      |    CAST(SUM(dev7) AS BIGINT) AS sdev7
      |  FROM dev GROUP BY dow)
      |SELECT s.dow, s.n_days,
      |  CAST(s.sdev7 AS DOUBLE) / (7 * s.n_days) AS seasonal,
      |  CAST(SUM(ABS(s.n_days * d.dev7 - s.sdev7)) AS DOUBLE) /
      |    (7 * s.n_days * s.n_days) AS mean_abs_remainder
      |FROM s JOIN dev d ON d.dow = s.dow
      |GROUP BY s.dow, s.n_days, s.sdev7
      |ORDER BY s.dow""".stripMargin

  /** Journey transition counts for q267: per-user event sequences
    * ordered by (ts, event_id), truncated at the FIRST purchase (the
    * conversion absorbs the journey), with 'start' prepended, purchase
    * mapped to the absorbing 'conv', and journeys that never convert
    * closed into the absorbing 'null'. One window pass per user — no
    * self-join of the event stream; the output is channel²-bounded.
    */
  def journeyTransitions(ev: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val ranked = ev
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
      .withColumn("rn", row_number().over(w))
    val firstPurchase = ranked.where(col("event_type") === "purchase")
      .groupBy("user_id").agg(min(col("rn")).as("prn"))
    val kept = ranked.join(firstPurchase, Seq("user_id"), "left")
      .where(col("prn").isNull || col("rn") <= col("prn"))
    val w2 = Window.partitionBy("user_id").orderBy("rn")
    val steps = kept
      .withColumn("nxt", lead(col("event_type"), 1).over(w2))
      .select(col("event_type").as("src"),
        when(col("nxt") === "purchase", lit("conv"))
          .when(col("nxt").isNull,
            when(col("event_type") === "purchase", lit(null).cast("string"))
              .otherwise(lit("null")))
          .otherwise(col("nxt")).as("dst"))
      .where(col("dst").isNotNull)
    val starts = kept.where(col("rn") === 1)
      .select(lit("start").as("src"),
        when(col("event_type") === "purchase", lit("conv"))
          .otherwise(col("event_type")).as("dst"))
    steps.unionByName(starts)
      .groupBy("src", "dst").agg(count(lit(1)).as("cnt"))
  }

  /** q267 body: Markov removal-effect attribution (Anderl et al.'s
    * data-driven model) — how much of the conversion probability each
    * channel is responsible for, measured by DELETING the channel from
    * the journey graph and re-solving the chain. Extends q147's
    * transition matrix with absorbing states and an iterated
    * absorption-probability solve, entirely on the integer micro-unit
    * grid (q186's PageRank doctrine): transition probabilities are
    * `cnt*1e6 div total`, each of the `iters` value-iteration rounds is
    * BIGINT multiply-sum-floor, so every engine computes bit-identical
    * chains; the only doubles are the final per-channel effect ratios
    * (one exact-integer subtraction, one multiply, one divide —
    * correctly rounded, identical trees). Removing channel c = dropping
    * c's row and letting mass into c fall into the absorbing 'null'
    * (p(null)=0, so dropped rows model the redirect exactly).
    *
    * Scale shape: the journey pass is one per-user window; everything
    * after lives on a channel²-bounded relation (≤ ~40 rows regardless
    * of corpus size) — the value iteration is broadcast-trivial at any
    * scale, deliberately expressed as dataframe ops so the same code
    * runs when "channels" are thousands of campaigns.
    */
  def markovAttribution(ev: DataFrame, iters: Int = 12): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    // 'base'/'start'/'conv'/'null' are reserved state names: a channel
    // carrying one of them would silently merge with a scenario or an
    // absorbing state and produce plausible-but-wrong effects. Fail
    // fast; the check reads the channel vocabulary only (one tiny agg).
    val clash = ev.select(col("event_type")).distinct()
      .where(col("event_type").isin("base", "start", "conv", "null"))
      .limit(1).collect()
    require(clash.isEmpty,
      s"event_type '${clash.headOption.map(_.getString(0)).getOrElse("")}' " +
        "collides with a reserved Markov state (base/start/conv/null); " +
        "rename the channel before attribution")
    val trans = journeyTransitions(ev)
    val probs = trans
      .withColumn("tot", sum(col("cnt")).over(Window.partitionBy("src")))
      .withColumn("prob", expr("cnt * 1000000 div tot"))
      .select("src", "dst", "prob")
    val scenarios = ev.select(col("event_type").as("scenario"))
      .where(col("scenario") =!= "purchase").distinct()
      .unionByName(ev.sparkSession.range(1).select(lit("base").as("scenario")))
    val sp = scenarios.crossJoin(probs)
      .where(col("src") =!= col("scenario") && col("dst") =!= col("scenario"))
    // The value iteration folds INSIDE one codegen'd expression over the
    // collected per-scenario edge list (channel²-bounded by construction,
    // ≤ ~40 structs) — a dataframe-level loop would schedule 2·iters tiny
    // shuffle stages whose fixed cost dwarfs the arithmetic. Same trade
    // as q218's broadcast iteration, taken one step further because the
    // state here is bounded by the CHANNEL vocabulary, not the data.
    // Integer adds commute, so the fold is list-order independent.
    val p = sp.groupBy("scenario")
      .agg(collect_list(struct(col("src"), col("dst"), col("prob")))
        .as("edges"))
      .withColumn("pmap", expr(
        s"""aggregate(sequence(1, $iters),
           |  map_from_entries(transform(
           |    array_distinct(transform(edges, e -> e.src)),
           |    s -> struct(s AS state, 0L AS p))),
           |  (acc, i) -> map_from_entries(transform(
           |    array_distinct(transform(edges, e -> e.src)),
           |    s -> struct(s AS state,
           |      aggregate(filter(edges, e -> e.src = s), 0L,
           |        (a, e) -> a + e.prob *
           |          (CASE WHEN e.dst = 'conv' THEN 1000000L
           |                WHEN e.dst = 'null' THEN 0L
           |                ELSE coalesce(acc[e.dst], 0L) END))
           |      div 1000000 AS p))))""".stripMargin))
      .select(col("scenario"), col("pmap").getItem("start").as("p"))
      // both output branches (base scalar + per-channel rows) read this
      // 5-row frame; materialize it once so the journey pass runs once
      .localCheckpoint()
    val base = p.where(col("scenario") === "base")
      .select(col("p").as("p_base_ppm"))
    p.where(col("scenario") =!= "base")
      .select(col("scenario").as("channel"), col("p").as("p_removed_ppm"))
      .crossJoin(broadcast(base))
      .select(col("channel"), col("p_base_ppm"), col("p_removed_ppm"),
        when(col("p_base_ppm") > 0,
          (col("p_base_ppm") - col("p_removed_ppm")).cast("double")
            * 10000d / col("p_base_ppm"))
          .as("removal_effect_bp"))
      .orderBy("channel")
  }

  /** Oracle generated from the SAME iteration count as the graded body
    * (the q180/q263 doctrine: parameter and oracle cannot drift).
    */
  private def markovOracle(iters: Int): String = {
    val chain = (1 to iters).map { k =>
      s"""p$k AS (
         |  SELECT t.scenario, t.src AS state,
         |    SUM(t.prob * CASE WHEN t.dst = 'conv' THEN 1000000
         |      WHEN t.dst = 'null' THEN 0
         |      ELSE COALESCE(q.p, 0) END) // 1000000 AS p
         |  FROM sp t LEFT JOIN p${k - 1} q
         |    ON q.scenario = t.scenario AND q.state = t.dst
         |  GROUP BY t.scenario, t.src)""".stripMargin
    }.mkString(",\n")
    s"""WITH ranked AS (
       |  SELECT user_id, event_type, ROW_NUMBER() OVER (
       |      PARTITION BY user_id ORDER BY ts, event_id) AS rn
       |  FROM events),
       |fp AS (SELECT user_id, MIN(rn) AS prn FROM ranked
       |  WHERE event_type = 'purchase' GROUP BY user_id),
       |kept AS (
       |  SELECT r.user_id, r.event_type, r.rn
       |  FROM ranked r LEFT JOIN fp ON r.user_id = fp.user_id
       |  WHERE fp.prn IS NULL OR r.rn <= fp.prn),
       |nx AS (
       |  SELECT event_type, rn, LEAD(event_type) OVER (
       |      PARTITION BY user_id ORDER BY rn) AS nxt
       |  FROM kept),
       |steps AS (
       |  SELECT event_type AS src,
       |    CASE WHEN nxt = 'purchase' THEN 'conv'
       |      WHEN nxt IS NULL THEN
       |        CASE WHEN event_type = 'purchase' THEN NULL ELSE 'null' END
       |      ELSE nxt END AS dst
       |  FROM nx),
       |starts AS (
       |  SELECT 'start' AS src,
       |    CASE WHEN event_type = 'purchase' THEN 'conv'
       |      ELSE event_type END AS dst
       |  FROM kept WHERE rn = 1),
       |trans AS (
       |  SELECT src, dst, COUNT(*) AS cnt FROM (
       |    SELECT * FROM steps WHERE dst IS NOT NULL
       |    UNION ALL SELECT * FROM starts)
       |  GROUP BY src, dst),
       |probs AS (
       |  SELECT src, dst,
       |    cnt * 1000000 // SUM(cnt) OVER (PARTITION BY src) AS prob
       |  FROM trans),
       |scen AS (
       |  SELECT DISTINCT event_type AS scenario FROM events
       |  WHERE event_type <> 'purchase'
       |  UNION ALL SELECT 'base'),
       |sp AS (
       |  SELECT s.scenario, p.src, p.dst, p.prob
       |  FROM scen s JOIN probs p
       |    ON p.src <> s.scenario AND p.dst <> s.scenario),
       |p0 AS (
       |  SELECT scenario, src AS state, CAST(0 AS BIGINT) AS p
       |  FROM sp GROUP BY scenario, src),
       |$chain
       |SELECT c.scenario AS channel,
       |  CAST(b.p AS BIGINT) AS p_base_ppm,
       |  CAST(c.p AS BIGINT) AS p_removed_ppm,
       |  CASE WHEN b.p > 0
       |    THEN CAST(b.p - c.p AS DOUBLE) * 10000 / b.p
       |    ELSE NULL END AS removal_effect_bp
       |FROM p$iters c
       |JOIN (SELECT p FROM p$iters
       |      WHERE scenario = 'base' AND state = 'start') b ON TRUE
       |WHERE c.scenario <> 'base' AND c.state = 'start'
       |ORDER BY channel""".stripMargin
  }

  private val markovIters = 12

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q267_markov_attribution", Some(markovOracle(markovIters)),
      (spark, dir) => markovAttribution(
        EventOps.events(spark, dir), iters = markovIters)),

    QueryDef("q273_seasonal_decomp", Some(seasonalOracle),
      (spark, dir) => seasonalDecomposition(t(spark, dir, "orders"))),

    // q240: forecast-baseline evaluation — before any model ships, its
    // error must beat the free baselines, and the two canonical ones
    // are naive (yesterday's value) and seasonal-naive (same weekday
    // last week). This reports both MAEs over daily revenue and their
    // ratio in exact basis points (a ratio < 10000 says the series has
    // real weekly structure a model must capture to earn its keep —
    // MASE's denominator reasoning). All-integer cents over the
    // calendar-bounded daily frame; lag windows over one row per day;
    // days lacking a lag-7 reference are excluded from BOTH MAEs so
    // the comparison is paired.
    QueryDef(
      "q240_forecast_baselines",
      Some("""WITH d AS (
        |  SELECT CAST(o_orderdate AS DATE) AS day,
        |    SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) AS cents
        |  FROM orders GROUP BY 1),
        |l AS (
        |  SELECT day, cents,
        |    LAG(cents, 1) OVER (ORDER BY day) AS prev1,
        |    LAG(cents, 7) OVER (ORDER BY day) AS prev7
        |  FROM d)
        |SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
        |  CAST(SUM(ABS(cents - prev1)) // COUNT(*) AS BIGINT)
        |    AS mae_naive_cents,
        |  CAST(SUM(ABS(cents - prev7)) // COUNT(*) AS BIGINT)
        |    AS mae_seasonal_cents,
        |  CAST(SUM(ABS(cents - prev7)) * 10000 // SUM(ABS(cents - prev1))
        |    AS BIGINT) AS seasonal_vs_naive_bp
        |FROM l WHERE prev7 IS NOT NULL""".stripMargin),
      (spark, dir) => {
        val daily = t(spark, dir, "orders")
          .groupBy(to_date(col("o_orderdate")).as("day"))
          .agg(sum(round(col("o_totalprice") * 100, 0).cast("long"))
            .as("cents"))
        val byDay = Window.orderBy("day")
        daily
          .withColumn("prev1", lag(col("cents"), 1).over(byDay))
          .withColumn("prev7", lag(col("cents"), 7).over(byDay))
          .where(col("prev7").isNotNull)
          .agg(count(lit(1)).as("n_days"),
            expr("CAST(SUM(ABS(cents - prev1)) div COUNT(*) AS BIGINT)")
              .as("mae_naive_cents"),
            expr("CAST(SUM(ABS(cents - prev7)) div COUNT(*) AS BIGINT)")
              .as("mae_seasonal_cents"),
            expr("""CAST(SUM(ABS(cents - prev7)) * 10000
              | div SUM(ABS(cents - prev1)) AS BIGINT)""".stripMargin)
              .as("seasonal_vs_naive_bp"))
      }),

    QueryDef("q206_rolling_zscore", Some(rollingZscoreOracle),
      (spark, dir) => rollingZscore(t(spark, dir, "orders"))),

    QueryDef("q207_slo_burn", Some(sloBurnOracle),
      (spark, dir) => sloBurn(EventOps.events(spark, dir))),

    QueryDef("q278_theil_sen", Some(theilSenOracle),
      (spark, dir) => theilSenTrend(t(spark, dir, "orders"))),

    QueryDef("q195_trend_slopes", Some(trendSlopesOracle),
      (spark, dir) => trendSlopes(t(spark, dir, "orders"),
        t(spark, dir, "customer"), t(spark, dir, "nation"))),

    QueryDef("q193_position_attribution", Some(positionAttributionOracle),
      (spark, dir) => positionAttribution(EventOps.events(spark, dir))),

    QueryDef("q176_dow_anomalies", Some(dowAnomaliesOracle),
      (spark, dir) => dowAnomalies(t(spark, dir, "orders"))),

    QueryDef("q177_cusum_changepoint", Some(cusumOracle),
      (spark, dir) => cusumChangepoint(t(spark, dir, "orders"))),

    QueryDef("q178_daily_autocorr", Some(autocorrOracle),
      (spark, dir) => dailyAutocorr(t(spark, dir, "orders"))),

    QueryDef("q181_last_touch", Some(attributionOracle),
      (spark, dir) => lastTouchAttribution(EventOps.events(spark, dir))),

    QueryDef("q182_order_gaps", Some(orderGapOracle),
      (spark, dir) => orderGapHistogram(t(spark, dir, "orders"))))
}
