package graft.ops

import org.apache.spark.sql.DataFrame
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

  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark's vectorized
    * reader rejects. Read it as a nanos-since-epoch long and convert with
    * exact integer division (a double division would lose precision at
    * 1e18 ns) — sub-microsecond truncation is irrelevant to hour windows
    * and 30-minute session gaps.
    *
    * Requires `spark.sql.legacy.parquet.nanosAsLong=true` on the session
    * (set in every harness builder: Bench, Verify, tools, TestSpark). Set
    * at session construction, not here — a query function mutating session
    * config would surprise a caller sharing the session concurrently.
    */
  def events(spark: org.apache.spark.sql.SparkSession, dir: String): DataFrame =
    t(spark, dir, "events")
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))

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

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "q33_event_window",
      Some("""SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour_start,
        |  COUNT(*) AS n_events,
        |  CAST(ROUND(SUM(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE) AS total_value
        |FROM events GROUP BY 1 ORDER BY hour_start""".stripMargin),
      (spark, dir) => hourlyWindow(events(spark, dir))),

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
      (spark, dir) => sessions(events(spark, dir))))
}
