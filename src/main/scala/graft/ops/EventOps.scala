package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.QueryDef
import graft.util.Tables._

/** Event-time operators over `events` (SURVEY §7.4): tumbling-window
  * aggregation and gap-based sessionization. Batch here; EventStreamSpec
  * drives the same aggregations through Structured Streaming
  * (readStream + watermark) to prove the streaming path.
  *
  * `value` is an arbitrary double, so window sums go through an exact
  * DECIMAL(18,6) cast (order-independent, DuckDB-identical). Window starts
  * are emitted as formatted strings — timestamp codecs differ (µs vs ns)
  * between the engines but second-precision strings do not.
  */
object EventOps {

  /** Events loader, adaptive to the driver's data vintage. Earlier
    * generations stored `ts` as parquet TIMESTAMP(NANOS), which Spark's
    * vectorized reader rejects — those are read as a nanos-since-epoch
    * long (`spark.sql.legacy.parquet.nanosAsLong=true`, still set in
    * every harness builder for compatibility) and converted with exact
    * integer division. Current generations store native timestamp[us],
    * which both Spark and DuckDB read directly. Dispatch on the actual
    * column type so either vintage works.
    */
  def events(spark: org.apache.spark.sql.SparkSession, dir: String): DataFrame = {
    val df = t(spark, dir, "events")
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case org.apache.spark.sql.types.TimestampNTZType =>
        // native timestamp[us] without UTC adjustment reads as NTZ; cast
        // to the session-zone TIMESTAMP (session tz is UTC in every
        // harness) so downstream LTZ-only functions (unix_micros, window
        // bucketing) and timestamp-literal comparisons keep working
        // unchanged across data vintages
        df.withColumn("ts", col("ts").cast("timestamp"))
      case _ => df
    }
  }

  def hourlyWindow(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value").cast(DecimalType(18, 6))), 2).cast("double").as("total_value"))
      .select(date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("hour_start"),
        col("n_events"), col("total_value"))
      .orderBy("hour_start")

  def sessions(events: DataFrame, gap: String = "30 minutes"): DataFrame =
    events
      .groupBy(col("user_id"), session_window(col("ts"), gap))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value").cast(DecimalType(18, 6))), 2).cast("double").as("total_value"))
      .select(col("user_id"),
        date_format(col("session_window.start"), "yyyy-MM-dd HH:mm:ss").as("session_start"),
        col("n_events"), col("total_value"))
      .orderBy("user_id", "session_start")

  /** Ordered conversion funnel view -> click -> purchase: a user counts at
    * stage k only if stage k's first event is AT OR AFTER their first
    * stage-(k-1) event — the product-analytics query proper sequencing
    * makes non-trivial (a purchase before any click must not count).
    *
    * Scale shape: one filtered groupBy per stage (map-side combined, one
    * shuffle each on user_id), each stage joining the previous stage's
    * per-user frame on the same user_id key — co-keyed shuffles a cluster
    * co-partitions, never a window over the raw stream. Stage frames are
    * one row per user, monotonically shrinking down the funnel.
    */
  def funnel(ev: DataFrame): DataFrame = {
    val v = ev.where(col("event_type") === "view")
      .groupBy("user_id").agg(min(col("ts")).as("v_ts"))
    val c = ev.where(col("event_type") === "click")
      .join(v, Seq("user_id"))
      .where(col("ts") >= col("v_ts"))
      .groupBy("user_id").agg(min(col("ts")).as("c_ts"))
    val p = ev.where(col("event_type") === "purchase")
      .join(c, Seq("user_id"))
      .where(col("ts") >= col("c_ts"))
      .groupBy("user_id").agg(min(col("ts")).as("p_ts"))
    ev.agg(countDistinct(col("user_id")).as("users_total"))
      .crossJoin(broadcast(v.agg(count(lit(1)).as("users_view"))))
      .crossJoin(broadcast(c.agg(count(lit(1)).as("users_click"))))
      .crossJoin(broadcast(p.agg(count(lit(1)).as("users_purchase"))))
  }

  /** Weekly cohort retention: cohort = ISO week of a user's first event,
    * cell (cohort, weeks_since) = distinct users of that cohort active in
    * that week — the engagement matrix behind every retention curve.
    * date_trunc('week') is Monday-based in both engines, so the week keys
    * agree; weeks_since is exact integer day arithmetic.
    *
    * Scale shape: two shuffles on user_id (first-event agg + the distinct
    * user-week frame), then one co-keyed join and a small (cohorts x
    * weeks) aggregate. No windows.
    */
  def retention(ev: DataFrame): DataFrame = {
    val first = ev.groupBy("user_id")
      .agg(date_trunc("week", min(col("ts"))).as("cw"))
    val active = ev
      .select(col("user_id"), date_trunc("week", col("ts")).as("w"))
      .distinct()
    active.join(first, Seq("user_id"))
      .groupBy(date_format(col("cw"), "yyyy-MM-dd").as("cohort_week"),
        expr("datediff(CAST(w AS DATE), CAST(cw AS DATE)) div 7")
          .cast("int").as("weeks_since"))
      .agg(count(lit(1)).as("n_users"))
      .orderBy("cohort_week", "weeks_since")
  }

  /** q286 body: out-of-orderness (lateness) histogram — the measurement
    * every Structured Streaming deployment needs BEFORE choosing a
    * watermark delay: too tight drops real events, too loose bloats
    * state. Arrival order is q270's bitemporal ingest model (the events
    * table itself is stored in event-time order, so the log order IS
    * the arrival order there): arrival_ts = ts + (event_id mod 5) days.
    * An event's lateness is how far the per-user running-max EVENT time
    * had already advanced when the event ARRIVED:
    * late_ms = runmax_by_arrival(ts) − ts. Bucketed on fixed day-scale
    * thresholds with exact basis-point shares; the `gt_3d` row is the
    * mass a 3-day watermark would drop.
    *
    * Scale shape: one user-keyed window (per-key frames), a 6-key
    * grouped count, and a broadcast one-row total — scan speed.
    */
  def latenessHistogram(ev: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id")
      .orderBy(col("arrival_ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val late = ev
      .withColumn("arrival_ts", expr("ts + make_dt_interval(event_id % 5)"))
      .withColumn("ms", expr("unix_millis(ts)"))
      .withColumn("late_ms", max(col("ms")).over(w) - col("ms"))
      .withColumn("bucket_idx",
        when(col("late_ms") === 0, 0)
          .when(col("late_ms") <= 3600000L, 1)
          .when(col("late_ms") <= 86400000L, 2)
          .when(col("late_ms") <= 2 * 86400000L, 3)
          .when(col("late_ms") <= 3 * 86400000L, 4)
          .otherwise(5))
    val total = late.agg(count(lit(1)).as("tot"))
    late.groupBy("bucket_idx")
      .agg(count(lit(1)).as("n_events"), max(col("late_ms")).as("max_late_ms"))
      .crossJoin(broadcast(total))
      .select(col("bucket_idx"),
        expr("""element_at(array('in_order', 'le_1h', 'le_1d', 'le_2d',
          |  'le_3d', 'gt_3d'), bucket_idx + 1)""".stripMargin)
          .as("bucket"),
        col("n_events"),
        expr("n_events * 10000 div tot").as("share_bp"),
        col("max_late_ms"))
      .orderBy("bucket_idx")
  }

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "q286_lateness_histogram",
      Some("""WITH a AS (SELECT user_id, event_id, epoch_ms(ts) AS ms,
        |    ts + (event_id % 5) * INTERVAL 1 DAY AS arrival_ts
        |  FROM events),
        |l AS (SELECT
        |    MAX(ms) OVER (PARTITION BY user_id
        |      ORDER BY arrival_ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      - ms AS late_ms
        |  FROM a),
        |b AS (SELECT late_ms,
        |    CASE WHEN late_ms = 0 THEN 0 WHEN late_ms <= 3600000 THEN 1
        |         WHEN late_ms <= 86400000 THEN 2
        |         WHEN late_ms <= 172800000 THEN 3
        |         WHEN late_ms <= 259200000 THEN 4 ELSE 5 END AS bucket_idx
        |  FROM l),
        |t AS (SELECT CAST(COUNT(*) AS BIGINT) AS tot FROM b)
        |SELECT CAST(bucket_idx AS INT) AS bucket_idx,
        |  CASE bucket_idx WHEN 0 THEN 'in_order' WHEN 1 THEN 'le_1h'
        |    WHEN 2 THEN 'le_1d' WHEN 3 THEN 'le_2d' WHEN 4 THEN 'le_3d'
        |    ELSE 'gt_3d' END AS bucket,
        |  CAST(COUNT(*) AS BIGINT) AS n_events,
        |  CAST(COUNT(*) * 10000 // tot AS BIGINT) AS share_bp,
        |  CAST(MAX(late_ms) AS BIGINT) AS max_late_ms
        |FROM b, t GROUP BY bucket_idx, tot ORDER BY bucket_idx""".stripMargin),
      (spark, dir) => latenessHistogram(events(spark, dir))),

    QueryDef(
      "q94_funnel",
      Some("""WITH v AS (SELECT user_id, MIN(ts) AS v_ts FROM events
        |    WHERE event_type = 'view' GROUP BY 1),
        |c AS (SELECT e.user_id, MIN(e.ts) AS c_ts FROM events e JOIN v USING (user_id)
        |    WHERE e.event_type = 'click' AND e.ts >= v.v_ts GROUP BY 1),
        |p AS (SELECT e.user_id, MIN(e.ts) AS p_ts FROM events e JOIN c USING (user_id)
        |    WHERE e.event_type = 'purchase' AND e.ts >= c.c_ts GROUP BY 1)
        |SELECT (SELECT COUNT(DISTINCT user_id) FROM events) AS users_total,
        |  (SELECT COUNT(*) FROM v) AS users_view,
        |  (SELECT COUNT(*) FROM c) AS users_click,
        |  (SELECT COUNT(*) FROM p) AS users_purchase""".stripMargin),
      (spark, dir) => funnel(events(spark, dir))),

    QueryDef(
      "q95_retention",
      Some("""WITH f AS (SELECT user_id, date_trunc('week', MIN(ts)) AS cw
        |    FROM events GROUP BY 1),
        |a AS (SELECT DISTINCT user_id, date_trunc('week', ts) AS w FROM events)
        |SELECT strftime(f.cw, '%Y-%m-%d') AS cohort_week,
        |  CAST((CAST(a.w AS DATE) - CAST(f.cw AS DATE)) // 7 AS INT) AS weeks_since,
        |  CAST(COUNT(*) AS BIGINT) AS n_users
        |FROM a JOIN f USING (user_id)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin),
      (spark, dir) => retention(events(spark, dir))),

    QueryDef(
      "q33_event_window",
      Some("""SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour_start,
        |  COUNT(*) AS n_events,
        |  CAST(ROUND(SUM(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE) AS total_value
        |FROM events GROUP BY 1 ORDER BY hour_start""".stripMargin),
      (spark, dir) => hourlyWindow(events(spark, dir))),

    // Per-day bounce rate (q235): share of sessions with exactly one
    // event — the product-health metric a sessionized event lake reports
    // daily. Rides q34's sessionization (one user-keyed shuffle) and
    // rolls up to the calendar (day of session start); exact basis
    // points via integer division. The oracle replays the gap
    // sessionization with lag + running sum (q34's strict-gap contract).
    QueryDef(
      "q235_bounce_rate",
      Some("""WITH marked AS (
        |  SELECT user_id, ts,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |      OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_s
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |sess AS (
        |  SELECT user_id, ts,
        |    SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
        |                     ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM marked),
        |per_session AS (
        |  SELECT user_id, sid, COUNT(*) AS n_events,
        |    CAST(MIN(ts) AS DATE) AS day
        |  FROM sess GROUP BY 1, 2)
        |SELECT STRFTIME(day, '%Y-%m-%d') AS day,
        |  CAST(COUNT(*) AS BIGINT) AS n_sessions,
        |  CAST(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_bounces,
        |  CAST(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) * 10000
        |    // COUNT(*) AS BIGINT) AS bounce_bp
        |FROM per_session GROUP BY day ORDER BY day""".stripMargin),
      (spark, dir) => {
        val perSession = events(spark, dir)
          .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
          .agg(count(lit(1)).as("n_events"))
          .select(to_date(col("session_window.start")).as("day"),
            col("n_events"))
        perSession.groupBy("day")
          .agg(count(lit(1)).as("n_sessions"),
            sum(when(col("n_events") === 1, 1L).otherwise(0L)).cast("long")
              .as("n_bounces"))
          .withColumn("bounce_bp", expr("n_bounces * 10000 div n_sessions"))
          .select(date_format(col("day"), "yyyy-MM-dd").as("day"),
            col("n_sessions"), col("n_bounces"), col("bounce_bp"))
          .orderBy("day")
      }),

    // DAU/WAU stickiness (q236): the engagement ratio product teams
    // live by — per day, distinct daily actives over distinct trailing-
    // 7-day actives, in exact basis points. Composes q131's rolling-
    // distinct machinery at two widths (width 1 degenerates to the
    // plain per-day distinct); both sides are (user, day)-collapsed
    // before any fan-out, so the fact table is touched once per side.
    QueryDef(
      "q236_stickiness",
      Some("""WITH ud AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day
        |            FROM events),
        |b AS (SELECT MAX(day) AS max_day FROM ud),
        |dau AS (SELECT day, COUNT(DISTINCT user_id) AS dau
        |        FROM ud GROUP BY 1),
        |w AS (SELECT user_id, day + CAST(i AS INT) AS win_day
        |      FROM ud, UNNEST(range(0, 7)) t(i)),
        |wau AS (SELECT win_day, COUNT(DISTINCT user_id) AS wau
        |        FROM w, b WHERE win_day <= max_day GROUP BY 1)
        |SELECT STRFTIME(dau.day, '%Y-%m-%d') AS day,
        |  CAST(dau AS BIGINT) AS dau, CAST(wau AS BIGINT) AS wau,
        |  CAST(dau * 10000 // wau AS BIGINT) AS stickiness_bp
        |FROM dau JOIN wau ON wau.win_day = dau.day
        |ORDER BY day""".stripMargin),
      (spark, dir) => {
        val ev = events(spark, dir)
        val dau = rollingDistinctUsers(ev, 1)
          .select(col("win_day").as("day"), col("n_users_7d").as("dau"))
        val wau = rollingDistinctUsers(ev, 7)
          .select(col("win_day").as("day"), col("n_users_7d").as("wau"))
        dau.join(wau, Seq("day"))
          .withColumn("stickiness_bp", expr("dau * 10000 div wau"))
          .select(date_format(col("day"), "yyyy-MM-dd").as("day"),
            col("dau"), col("wau"), col("stickiness_bp"))
          .orderBy("day")
      }),

    // Sessionization: session_window in Spark; gaps-and-islands (lag +
    // running sum) in the DuckDB oracle. Spark merges an event at exactly
    // `prev + gap` into the session (EventStreamSpec pins this), so a new
    // session starts only when the gap is STRICTLY greater than 30 min.
    QueryDef(
      "q34_sessionize",
      Some("""WITH marked AS (
        |  SELECT user_id, ts, event_id, value,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |      OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_s
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |sessions AS (
        |  SELECT user_id, ts, value,
        |    SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                     ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM marked)
        |SELECT user_id,
        |  strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
        |  COUNT(*) AS n_events,
        |  CAST(ROUND(SUM(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE) AS total_value
        |FROM sessions GROUP BY user_id, sid
        |ORDER BY user_id, session_start""".stripMargin),
      (spark, dir) => sessions(events(spark, dir))),

    // Rolling 7-day distinct users per day — the DAU/WAU-style engagement
    // metric. A window function can't express a sliding DISTINCT, and
    // re-scanning the fact table once per day can't scale; instead each
    // (user, day) contributes itself to the 7 window-end days it falls in.
    QueryDef(
      "q131_rolling_distinct",
      Some("""WITH ud AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day
        |            FROM events),
        |b AS (SELECT MAX(day) AS max_day FROM ud),
        |c AS (SELECT user_id, day + CAST(i AS INT) AS win_day
        |      FROM ud, UNNEST(range(0, 7)) t(i))
        |SELECT win_day, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users_7d
        |FROM c, b WHERE win_day <= b.max_day
        |GROUP BY win_day ORDER BY win_day""".stripMargin),
      (spark, dir) => rollingDistinctUsers(events(spark, dir))),

    // Data-freshness report: how far each event stream lags the most
    // recent arrival — the staleness monitor every ingest pipeline pages
    // on. Whole-minute lag via integer epoch-millisecond division
    // (exact, engine-identical); the global high-water mark rides in as
    // a broadcast one-row frame. Scan-speed, type-cardinality output.
    QueryDef(
      "q142_freshness",
      Some("""WITH t AS (SELECT event_type, MAX(ts) AS latest
        |            FROM events GROUP BY event_type),
        |g AS (SELECT MAX(latest) AS global_latest FROM t)
        |SELECT t.event_type,
        |  strftime(t.latest, '%Y-%m-%d %H:%M:%S') AS latest,
        |  (epoch_ms(g.global_latest) - epoch_ms(t.latest)) // 60000
        |    AS minutes_behind
        |FROM t, g ORDER BY t.event_type""".stripMargin),
      (spark, dir) => {
        val perType = events(spark, dir)
          .groupBy("event_type").agg(max(col("ts")).as("latest"))
        val global = perType.agg(max(col("latest")).as("global_latest"))
        perType.crossJoin(broadcast(global))
          .select(col("event_type"),
            date_format(col("latest"), "yyyy-MM-dd HH:mm:ss").as("latest"),
            expr("(unix_millis(global_latest) - unix_millis(latest)) div 60000")
              .as("minutes_behind"))
          .orderBy("event_type")
      }),

    // Session path mining: the top navigation sequences across gap-based
    // sessions — the product-analytics primitive behind "how do users
    // reach purchase". Reuses q34's session rule (a session breaks when
    // the gap is STRICTLY over 30 minutes, integer epoch-ms arithmetic so
    // the boundary is exact); each session contributes its first 8 event
    // types joined '>' (the cap bounds path cardinality AND row width —
    // no unbounded collect). Scale shape: one shuffle on user_id for the
    // session windows, one on the bounded path string for the count; the
    // top-k is TakeOrdered, never a global sort.
    QueryDef(
      "q150_session_paths",
      Some("""WITH s AS (SELECT user_id, ts, event_id, event_type,
        |    epoch_ms(ts) - lag(epoch_ms(ts)) OVER
        |      (PARTITION BY user_id ORDER BY ts, event_id) AS gap
        |  FROM events),
        |x AS (SELECT user_id, ts, event_id, event_type,
        |    SUM(CASE WHEN gap IS NULL OR gap > 1800000 THEN 1 ELSE 0 END)
        |      OVER (PARTITION BY user_id ORDER BY ts, event_id
        |            ROWS UNBOUNDED PRECEDING) AS sess
        |  FROM s),
        |r AS (SELECT user_id, sess, ts, event_id, event_type,
        |    row_number() OVER (PARTITION BY user_id, sess
        |                       ORDER BY ts, event_id) AS rn
        |  FROM x),
        |p AS (SELECT user_id, sess,
        |    string_agg(event_type, '>' ORDER BY ts, event_id) AS path
        |  FROM r WHERE rn <= 8 GROUP BY user_id, sess)
        |SELECT path, CAST(COUNT(*) AS BIGINT) AS n_sessions
        |FROM p GROUP BY path
        |ORDER BY n_sessions DESC, path LIMIT 20""".stripMargin),
      (spark, dir) => sessionPaths(events(spark, dir))),

    // q271: MATCH_RECOGNIZE-style prioritized pattern census over the
    // same sessionization; see sessionPatternCensus.
    QueryDef(
      "q271_session_patterns",
      Some("""WITH s AS (SELECT user_id, ts, event_id, event_type,
        |    epoch_ms(ts) - lag(epoch_ms(ts)) OVER
        |      (PARTITION BY user_id ORDER BY ts, event_id) AS gap
        |  FROM events),
        |x AS (SELECT user_id, ts, event_id, event_type,
        |    SUM(CASE WHEN gap IS NULL OR gap > 1800000 THEN 1 ELSE 0 END)
        |      OVER (PARTITION BY user_id ORDER BY ts, event_id
        |            ROWS UNBOUNDED PRECEDING) AS sess
        |  FROM s),
        |r AS (SELECT user_id, sess, ts, event_id, event_type,
        |    row_number() OVER (PARTITION BY user_id, sess
        |                       ORDER BY ts, event_id) AS rn
        |  FROM x),
        |p AS (SELECT user_id, sess,
        |    string_agg(substr(event_type, 1, 1), '' ORDER BY ts, event_id)
        |      AS sig
        |  FROM r WHERE rn <= 64 GROUP BY user_id, sess),
        |c AS (SELECT CASE
        |    WHEN regexp_matches(sig, '^[vcs]*p') THEN 'clean_convert'
        |    WHEN regexp_matches(sig, '^[vcse]*p') THEN 'error_then_convert'
        |    WHEN regexp_matches(sig, '^[vcs]+$') THEN 'browse_only'
        |    ELSE 'errored_no_convert' END AS pattern_class,
        |    LENGTH(sig) AS n
        |  FROM p)
        |SELECT pattern_class, CAST(COUNT(*) AS BIGINT) AS n_sessions,
        |  CAST(SUM(n) AS BIGINT) AS n_events
        |FROM c GROUP BY pattern_class ORDER BY pattern_class""".stripMargin),
      (spark, dir) => sessionPatternCensus(events(spark, dir))),

    // SLIDING (overlapping) time windows — the hopping-window mode q33's
    // tumbling windows don't exercise: a 1-hour window every 15 minutes,
    // each event landing in exactly width/slide = 4 windows. Spark's
    // `window(ts, width, slide)` plans this as a bounded row-local
    // Expand (4 rows per event) followed by a normal hash aggregate —
    // no self-join, no range join, and the fan-out constant is fixed by
    // the window spec, not the data. The oracle reproduces the same
    // epoch-aligned window starts with generate_series.
    QueryDef(
      "q160_sliding_window",
      Some("""WITH e AS (SELECT epoch_ms(ts) AS ms, value FROM events),
        |w AS (SELECT (ms // 900000) * 900000 AS aligned, value FROM e),
        |x AS (SELECT unnest(generate_series(aligned - 2700000, aligned,
        |         900000)) AS ws, value FROM w)
        |SELECT strftime(make_timestamp(ws * 1000), '%Y-%m-%d %H:%M:%S')
        |    AS win_start,
        |  CAST(COUNT(*) AS BIGINT) AS n_events,
        |  CAST(ROUND(SUM(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE)
        |    AS total_value
        |FROM x GROUP BY win_start ORDER BY win_start""".stripMargin),
      (spark, dir) =>
        events(spark, dir)
          .groupBy(window(col("ts"), "1 hour", "15 minutes"))
          .agg(count(lit(1)).as("n_events"),
            round(sum(col("value").cast(DecimalType(18, 6))), 2)
              .cast("double").as("total_value"))
          .select(
            date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss")
              .as("win_start"),
            col("n_events"), col("total_value"))
          .orderBy("win_start")))

  /** Distinct users over a trailing `width`-day window, one row per
    * calendar day up to the last observed day. Scale shape: the raw event
    * stream first collapses to DISTINCT (user, day) — one shuffle that
    * shrinks the data to user-day granularity — then each row fans out
    * exactly `width` times (bounded, row-local explode) and collapses
    * again via count-distinct on the window day. No window function runs
    * over fact-sized data and no day-by-day rescan happens; the trailing
    * cutoff rides in as a broadcast one-row frame, not a driver collect.
    */
  def rollingDistinctUsers(ev: DataFrame, width: Int = 7): DataFrame = {
    require(width > 0, s"window width must be positive, got $width")
    val ud = ev.select(col("user_id"), to_date(col("ts")).as("day")).distinct()
    val maxDay = ud.agg(max(col("day")).as("max_day"))
    ud.select(col("user_id"),
        explode(expr(s"sequence(day, date_add(day, ${width - 1}))")).as("win_day"))
      .crossJoin(broadcast(maxDay))
      .where(col("win_day") <= col("max_day"))
      .groupBy("win_day")
      .agg(countDistinct(col("user_id")).as("n_users_7d"))
      .orderBy("win_day")
  }

  /** Shared q150/q271 sessionizer: strict 30-minute-gap sessions over
    * integer epoch-ms, each session's events capped at `maxLen` BEFORE
    * collecting (the row_number window shares the (user_id, sess) hash
    * partitioning with the groupBy, and a pathological million-event
    * bot session contributes `maxLen` rows, not a million-element
    * array) and collected as (ts, event_id, type) structs whose
    * array_sort reproduces the window order — event_id is unique so the
    * trailing type field never decides. ONE definition of the gap rule:
    * both graded session queries consume this, so the rule cannot
    * silently diverge between them.
    */
  def sessionizedEvents(ev: DataFrame, gapMs: Long, maxLen: Int): DataFrame = {
    require(gapMs > 0 && maxLen > 0,
      s"positive gapMs/maxLen required, got $gapMs/$maxLen")
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    ev.withColumn("ms", expr("unix_millis(ts)"))
      .withColumn("gap", col("ms") - lag(col("ms"), 1).over(w))
      .withColumn("new_s",
        when(col("gap").isNull || col("gap") > gapMs, 1).otherwise(0))
      .withColumn("sess", sum(col("new_s"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("rn", row_number().over(
        Window.partitionBy("user_id", "sess").orderBy(col("ts"), col("event_id"))))
      .where(col("rn") <= maxLen)
      .groupBy("user_id", "sess")
      .agg(collect_list(struct(col("ts"), col("event_id"), col("event_type")))
        .as("evs"))
  }

  /** q271 body: sequence-pattern census over sessions — the
    * MATCH_RECOGNIZE workload expressed Spark-first. Each session
    * (q150's strict 30-minute gap rule, via [[sessionizedEvents]]) is
    * folded to a one-char-per-event signature string (event types have
    * distinct initials), and a PRIORITIZED pattern list classifies it —
    * first match wins, exactly MATCH_RECOGNIZE's
    * deterministic-alternative semantics: `^[vcs]*p` (converted before
    * any error), `^[vcse]*p` (converted, but an error intervened),
    * `^[vcs]+$` (browsed clean, never converted), else
    * errored-and-lost. Anchored prefix regexes over `[vcsep]` behave
    * identically in Java regex and RE2, which is what makes the census
    * cross-engine gradeable.
    *
    * Scale shape: identical to q150 — the signature build shares the
    * (user, sess) partitioning, sessions cap at `maxLen` chars BEFORE
    * collecting, the regex sweep is row-local codegen, and the output
    * is bounded by the pattern list.
    */
  def sessionPatternCensus(ev: DataFrame, gapMs: Long = 1800000L,
      maxLen: Int = 64): DataFrame =
    sessionizedEvents(ev, gapMs, maxLen)
      .select(expr(
        "array_join(transform(array_sort(evs)," +
          " e -> substring(e.event_type, 1, 1)), '')").as("sig"))
      .select(
        when(col("sig").rlike("^[vcs]*p"), "clean_convert")
          .when(col("sig").rlike("^[vcse]*p"), "error_then_convert")
          .when(col("sig").rlike("^[vcs]+$"), "browse_only")
          .otherwise("errored_no_convert").as("pattern_class"),
        length(col("sig")).cast("long").as("n"))
      .groupBy("pattern_class")
      .agg(count(lit(1)).as("n_sessions"), sum(col("n")).as("n_events"))
      .orderBy("pattern_class")

  /** q150 body (shared with EventStreamSpec-style fixtures in
    * AnalyticsSpec): gap-based sessions (STRICT 30-minute rule, via
    * [[sessionizedEvents]]), each truncated to its first `maxLen` event
    * types and joined '>', counted, top `topK` by (count desc, path).
    */
  def sessionPaths(ev: DataFrame, gapMs: Long = 1800000L, maxLen: Int = 8,
      topK: Int = 20): DataFrame = {
    require(topK > 0, s"positive topK required, got $topK")
    sessionizedEvents(ev, gapMs, maxLen)
      .select(expr(
        s"array_join(slice(transform(array_sort(evs), e -> e.event_type), 1, $maxLen), '>')")
        .as("path"))
      .groupBy("path").agg(count(lit(1)).as("n_sessions"))
      .orderBy(desc("n_sessions"), col("path"))
      .limit(topK)
  }
}
