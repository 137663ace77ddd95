package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.QueryDef
import graft.util.Tables._

/** Round-9 scale-shape tier: three plan patterns that matter at 100 TB
  * and were not yet graded — VARIANT semi-structured ingestion (the
  * Spark 4 path that replaces per-query JSON string parsing), an
  * interval self-overlap join without a nested loop, and rank-within-
  * group via the two-phase distributed rank (q92's pattern generalized
  * to grouped frames, for when single groups outgrow one reducer).
  */
object ScaleShapeOps {

  /** q212 body: ingest the event payload through Spark 4's VARIANT type
    * — `parse_json` once per row into the binary variant encoding, then
    * typed `variant_get` extraction. At 100 TB this is the
    * semi-structured plan: parse ONCE at ingest (or store VARIANT in
    * the table), extract with codegen'd accessors — vs q44's
    * `get_json_object`, which re-parses the string per access. The
    * aggregate itself is an ordinary two-key partial+final hash agg.
    */
  def variantIngest(ev: DataFrame): DataFrame =
    ev.select(col("event_type"),
        expr("variant_get(parse_json(props), '$.k', 'int')").as("k"))
      .groupBy(col("event_type"), expr("k div 10").as("k_band"))
      .agg(count(lit(1)).as("n"), sum(col("k")).cast("long").as("sum_k"))
      .orderBy("event_type", "k_band")

  private val variantOracle: String =
    """SELECT event_type,
      |  CAST(CAST(json_extract(props, '$.k') AS INT) // 10 AS BIGINT)
      |    AS k_band,
      |  CAST(COUNT(*) AS BIGINT) AS n,
      |  CAST(SUM(CAST(json_extract(props, '$.k') AS INT)) AS BIGINT)
      |    AS sum_k
      |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** q213 body: orders of the same customer whose `windowDays`-day
    * fulfillment windows overlap — the interval self-join. The naive
    * form is an inequality join (per-customer cross product on heavy
    * customers); instead each interval lands in the ≤2 width-`windowDays`
    * time buckets it can touch, the join is EQUI on (customer, bucket)
    * with the exact overlap predicate as a residual filter, and the
    * distinct collapses pairs that met in both shared buckets. Fan-out
    * is bounded by per-bucket occupancy — the q60 bucketization applied
    * to interval×interval. All-integer day arithmetic.
    */
  def overlappingOrders(orders: DataFrame, windowDays: Int = 7): DataFrame = {
    require(windowDays > 0, s"windowDays must be positive, got $windowDays")
    val o = orders.select(col("o_custkey"), col("o_orderkey"),
        datediff(to_date(col("o_orderdate")),
          lit("1970-01-01").cast("date")).as("s"))
      .withColumn("e", col("s") + windowDays)
      .withColumn("bucket", explode(array_distinct(array(
        expr(s"s div $windowDays"), expr(s"e div $windowDays")))))
    val a = o.select(col("o_custkey"), col("bucket"),
      col("o_orderkey").as("a_orderkey"), col("s").as("a_s"), col("e").as("a_e"))
    val b = o.select(col("o_custkey"), col("bucket"),
      col("o_orderkey").as("b_orderkey"), col("s").as("b_s"), col("e").as("b_e"))
    a.join(b, Seq("o_custkey", "bucket"))
      .where(col("a_orderkey") < col("b_orderkey")
        && col("b_s") <= col("a_e") && col("a_s") <= col("b_e"))
      .select(col("o_custkey"), col("a_orderkey"), col("b_orderkey"),
        (least(col("a_e"), col("b_e")) - greatest(col("a_s"), col("b_s")))
          .cast("int").as("overlap_days"))
      .distinct()
      .orderBy("o_custkey", "a_orderkey", "b_orderkey")
  }

  private val overlapOracle: String =
    """WITH o AS (
      |  SELECT o_custkey, o_orderkey,
      |    (CAST(o_orderdate AS DATE) - DATE '1970-01-01') AS s,
      |    (CAST(o_orderdate AS DATE) - DATE '1970-01-01') + 7 AS e
      |  FROM orders)
      |SELECT a.o_custkey, a.o_orderkey AS a_orderkey,
      |  b.o_orderkey AS b_orderkey,
      |  CAST(LEAST(a.e, b.e) - GREATEST(a.s, b.s) AS INT) AS overlap_days
      |FROM o a JOIN o b
      |  ON a.o_custkey = b.o_custkey AND a.o_orderkey < b.o_orderkey
      |  AND b.s <= a.e AND a.s <= b.e
      |ORDER BY a.o_custkey, a_orderkey, b_orderkey""".stripMargin

  /** q214 body: per-language document-length deciles through the
    * TWO-PHASE grouped rank. A plain `row_number() OVER (PARTITION BY
    * lang ORDER BY ...)` sorts each whole language through one reducer —
    * with few, huge groups (the real shape of a web corpus: one language
    * is half the data) that's the q145-class scale killer inside a
    * partitioned window. Instead: shard each language by a PREFIX of its
    * sort key (`n_chars div 64` — equal lengths can never straddle a
    * shard), aggregate per-shard counts, prefix-sum shard offsets over
    * the bounded (lang × shard) frame, then rank LOCALLY within each
    * (lang, shard) and add the offset. Provably equal to the naive
    * grouped window (ScaleShapeSpec pins it); per-reducer sort cost
    * drops by the shard fan-out. Decile assignment and the final
    * roll-up are exact integer arithmetic.
    */
  def langLengthDeciles(docs: DataFrame): DataFrame = {
    val d = docs.select(col("lang"), col("doc_id"), col("n_chars"))
      .withColumn("shard", expr("n_chars div 64"))
    val counts = d.groupBy("lang", "shard").agg(count(lit(1)).as("cnt"))
    val wOff = Window.partitionBy("lang").orderBy("shard")
      .rowsBetween(Window.unboundedPreceding, -1)
    val shardMeta = counts
      .withColumn("off", coalesce(sum(col("cnt")).over(wOff), lit(0L)))
      .withColumn("lang_n", sum(col("cnt")).over(Window.partitionBy("lang")))
      .select("lang", "shard", "off", "lang_n")
    val wLocal = Window.partitionBy("lang", "shard")
      .orderBy(col("n_chars"), col("doc_id"))
    d.withColumn("local_rn", row_number().over(wLocal))
      .join(broadcast(shardMeta), Seq("lang", "shard"))
      .withColumn("rnk", col("off") + col("local_rn"))
      .groupBy(col("lang"), expr("(10 * (rnk - 1)) div lang_n").as("decile"))
      .agg(count(lit(1)).as("n_docs"),
        min(col("n_chars")).as("min_chars"),
        max(col("n_chars")).as("max_chars"))
      .orderBy("lang", "decile")
  }

  /** The naive single-window form of q214 — the equality witness the
    * spec pins the two-phase plan against (never shipped as the graded
    * plan; its per-language sort is the scale hazard).
    */
  def langLengthDecilesNaive(docs: DataFrame): DataFrame = {
    val w = Window.partitionBy("lang").orderBy(col("n_chars"), col("doc_id"))
    docs.select(col("lang"), col("doc_id"), col("n_chars"))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .withColumn("lang_n",
        count(lit(1)).over(Window.partitionBy("lang")))
      .groupBy(col("lang"), expr("(10 * (rnk - 1)) div lang_n").as("decile"))
      .agg(count(lit(1)).as("n_docs"),
        min(col("n_chars")).as("min_chars"),
        max(col("n_chars")).as("max_chars"))
      .orderBy("lang", "decile")
  }

  private val decilesOracle: String =
    """WITH r AS (
      |  SELECT lang, n_chars,
      |    ROW_NUMBER() OVER (PARTITION BY lang ORDER BY n_chars, doc_id)
      |      AS rnk,
      |    COUNT(*) OVER (PARTITION BY lang) AS lang_n
      |  FROM documents)
      |SELECT lang, CAST((10 * (rnk - 1)) // lang_n AS BIGINT) AS decile,
      |  CAST(COUNT(*) AS BIGINT) AS n_docs,
      |  CAST(MIN(n_chars) AS BIGINT) AS min_chars,
      |  CAST(MAX(n_chars) AS BIGINT) AS max_chars
      |FROM r GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** q216 body: leakage-safe label attachment — for every feature row
    * (view event) attach the FIRST label (purchase) of the same user
    * STRICTLY after it and within `horizonHours`, or mark it a negative
    * example. This is the forward as-of join with horizon, the
    * point-in-time-correct label join a supervised training pipeline
    * runs (q46's backward as-of looks at the past for features; labels
    * must come from the future, and never from ≤ the feature timestamp
    * — that's target leakage). ZERO joins, like q46: union both event
    * sets, one shuffle on user_id, one descending linear scan per user
    * where a running `last(..., ignoreNulls)` carries the earliest
    * eligible label backwards; the (ts DESC, is_label ASC, event_id
    * DESC) sort order makes an equal-timestamp label invisible to its
    * feature row (the leakage boundary) and breaks label ties toward
    * the smallest (ts, event_id). The horizon is an exact microsecond
    * interval comparison. Per-user frames are bounded by that user's
    * history; the oracle recomputes via LEFT JOIN + first-row window.
    */
  def labelAsofJoin(ev: DataFrame, horizonHours: Int = 24): DataFrame = {
    require(horizonHours > 0, s"horizon must be positive, got $horizonHours")
    val base = ev.select(col("user_id"), col("ts"), col("event_id"),
      col("event_type"), round(col("value") * 100, 0).cast("long").as("cents"))
    val views = base.where(col("event_type") === "view")
      .select(col("user_id"), col("ts"), col("event_id"),
        lit(0).as("is_label"), lit(null).cast("long").as("l_cents"))
    val labels = base.where(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id"),
        lit(1).as("is_label"), col("cents").as("l_cents"))
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts").desc, col("is_label").asc, col("event_id").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    def carry(c: org.apache.spark.sql.Column) =
      last(when(col("is_label") === 1, c), ignoreNulls = true).over(w)
    views.unionByName(labels)
      .withColumn("next_lts", carry(col("ts")))
      .withColumn("next_lcents", carry(col("l_cents")))
      .where(col("is_label") === 0)
      .withColumn("ok", col("next_lts").isNotNull &&
        col("next_lts") <= col("ts") + expr(s"INTERVAL $horizonHours HOURS"))
      .select(col("event_id"), col("user_id"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("view_ts"),
        when(col("ok"),
          date_format(col("next_lts"), "yyyy-MM-dd HH:mm:ss")).as("label_ts"),
        when(col("ok"), col("next_lcents")).as("label_cents"),
        when(col("ok"), 1).otherwise(0).as("has_label"))
      .orderBy("event_id")
  }

  private val labelAsofOracle: String =
    """WITH v AS (
      |  SELECT event_id, user_id, ts FROM events WHERE event_type = 'view'),
      |p AS (
      |  SELECT user_id, ts, event_id,
      |    CAST(ROUND(value * 100, 0) AS BIGINT) AS cents
      |  FROM events WHERE event_type = 'purchase'),
      |j AS (
      |  SELECT v.event_id, v.user_id, v.ts AS vts, p.ts AS pts, p.cents,
      |    ROW_NUMBER() OVER (PARTITION BY v.event_id
      |      ORDER BY p.ts ASC, p.event_id ASC) AS rn
      |  FROM v LEFT JOIN p
      |    ON p.user_id = v.user_id AND p.ts > v.ts
      |    AND p.ts <= v.ts + INTERVAL 24 HOUR)
      |SELECT event_id, user_id,
      |  STRFTIME(vts, '%Y-%m-%d %H:%M:%S') AS view_ts,
      |  CASE WHEN pts IS NOT NULL
      |    THEN STRFTIME(pts, '%Y-%m-%d %H:%M:%S') END AS label_ts,
      |  CASE WHEN pts IS NOT NULL THEN cents END AS label_cents,
      |  CAST(CASE WHEN pts IS NOT NULL THEN 1 ELSE 0 END AS INT)
      |    AS has_label
      |FROM j WHERE rn = 1
      |ORDER BY event_id""".stripMargin

  /** q226 body: the hybrid (differentiated-broadcast) skew join — the
    * third skew weapon next to q39/q54's salting and AQE's runtime
    * split. When a handful of join keys dominate the probe side, route
    * them down a BROADCAST branch (the hot slice of the build side is
    * tiny by definition) and let only the cold remainder shuffle —
    * hot keys never cross the wire at all, where salting still moves
    * them (spread over reducers) and AQE only re-splits after the skew
    * materializes. Hot-key detection is a partial-agg count with a
    * threshold; the hot set broadcasts into semi/anti routers on both
    * sides. Provably row-identical to the plain join (the oracle IS the
    * plain join; ScaleShapeSpec pins the pre-aggregate relation too).
    */
  def hybridSkewJoin(
      lineitem: DataFrame,
      orders: DataFrame,
      hotThreshold: Int = 6): DataFrame = {
    require(hotThreshold > 0, s"hotThreshold must be positive, got $hotThreshold")
    val hot = lineitem.groupBy("l_orderkey").agg(count(lit(1)).as("n"))
      .where(col("n") >= hotThreshold)
      .select(col("l_orderkey").as("hk"))
    def route(df: DataFrame, key: String, keep: String): DataFrame =
      df.join(broadcast(hot), col(key) === col("hk"), keep)
    val hotSide = route(lineitem, "l_orderkey", "left_semi")
      .join(broadcast(route(orders, "o_orderkey", "left_semi")),
        col("l_orderkey") === col("o_orderkey"))
    val coldSide = route(lineitem, "l_orderkey", "left_anti")
      .join(route(orders, "o_orderkey", "left_anti"),
        col("l_orderkey") === col("o_orderkey"))
    hotSide.unionByName(coldSide)
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_lines"), moneySum(revenue).as("revenue"))
      .orderBy("o_orderpriority")
  }

  private val hybridOracle: String =
    """SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_lines,
      |  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
      |    * (1.0 - CAST(l_discount AS DECIMAL(18,4)))), 2) AS DOUBLE)
      |    AS revenue
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  /** q227: LATERAL correlated subquery — "for each customer, their
    * single highest-value order" as the SQL-standard lateral join both
    * engines parse from the same text. Catalyst DECORRELATES the
    * per-row subquery (ORDER BY + LIMIT 1 becomes a per-key window/
    * group-limit under the hood) — the naive reading, one subquery
    * execution per customer row, never happens; inner-lateral
    * semantics drop orderless customers in both engines.
    */
  private val lateralSql: String =
    """SELECT c.c_custkey, t.o_orderkey AS best_order,
      |  t.o_totalprice AS best_total
      |FROM customer c,
      |LATERAL (SELECT o_orderkey, o_totalprice FROM orders
      |         WHERE o_custkey = c.c_custkey
      |         ORDER BY o_totalprice DESC, o_orderkey LIMIT 1) t
      |ORDER BY c.c_custkey""".stripMargin

  /** q228: parameterized SQL — `spark.sql(text, args)` with named
    * parameter markers, the injection-safe way a pipeline templates
    * per-tenant/per-day variants of one query. The marker text is the
    * SHARED artifact; the oracle binds the same values as literals.
    */
  private val paramSqlText: String =
    """SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_orders,
      |  CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,4))), 2) AS DOUBLE)
      |    AS total
      |FROM orders
      |WHERE o_orderstatus = :status AND o_totalprice >= :minTotal
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  private val paramOracle: String =
    paramSqlText
      .replace(":status", "'F'")
      .replace(":minTotal", "100000.0")

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q226_hybrid_skew_join", Some(hybridOracle),
      (spark, dir) => hybridSkewJoin(
        t(spark, dir, "lineitem"), t(spark, dir, "orders"))),

    QueryDef("q227_lateral_topk", Some(lateralSql),
      (spark, dir) => {
        withViews(spark, dir, "customer", "orders")
        spark.sql(lateralSql)
      }),

    QueryDef("q228_param_sql", Some(paramOracle),
      (spark, dir) => {
        withViews(spark, dir, "orders")
        spark.sql(paramSqlText,
          Map("status" -> "F", "minTotal" -> 100000.0))
      }),

    QueryDef("q216_label_asof", Some(labelAsofOracle),
      (spark, dir) => labelAsofJoin(EventOps.events(spark, dir))),

    QueryDef("q212_variant_ingest", Some(variantOracle),
      (spark, dir) => variantIngest(EventOps.events(spark, dir))),

    QueryDef("q213_overlap_orders", Some(overlapOracle),
      (spark, dir) => overlappingOrders(t(spark, dir, "orders"))),

    QueryDef("q214_lang_deciles", Some(decilesOracle),
      (spark, dir) => langLengthDeciles(t(spark, dir, "documents"))))
}
