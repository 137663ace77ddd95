package graft.ops

import org.apache.spark.sql.functions._

import graft.QueryDef
import graft.util.Tables._

/** Relational-shape and scalar-function surface the other graded queries
  * don't exercise: wide->tall UNPIVOT (the inverse of q48's pivot),
  * higher-order array functions (lambda transform/filter/fold — the
  * codegen'd alternative to a UDF for per-row collection logic), the
  * date-arithmetic family, and null-safe equality joins. All four are
  * exactly SQL-expressible — full DuckDB oracles, no goldens.
  */
object ShapeOps {

  val defs: Seq[QueryDef] = Seq(
    // UNPIVOT / melt — the inverse reshaping of q48's pivot, as the real
    // Dataset.unpivot operator (plans as a single Expand over the scan:
    // each row fans out to one row per measure with NO shuffle and no
    // join; column pruning still reaches the scan). Measures share one
    // double type, the id column rides along, and output order is pinned
    // by the unique (o_orderkey, metric) pair.
    QueryDef(
      "q87_unpivot",
      Some("""SELECT o_orderkey, metric, value FROM (
        |  SELECT o_orderkey, 'totalprice' AS metric, o_totalprice AS value FROM orders
        |  UNION ALL
        |  SELECT o_orderkey, 'custkey', CAST(o_custkey AS DOUBLE) FROM orders)
        |ORDER BY o_orderkey, metric""".stripMargin),
      (spark, dir) =>
        t(spark, dir, "orders")
          .select(col("o_orderkey"), col("o_totalprice").as("totalprice"),
            col("o_custkey").cast("double").as("custkey"))
          .unpivot(Array(col("o_orderkey")),
            Array(col("totalprice"), col("custkey")), "metric", "value")
          .orderBy("o_orderkey", "metric")),

    // Higher-order array functions over the tokenized corpus: lambda
    // filter / transform / aggregate (fold) — per-row collection logic
    // that stays inside whole-stage codegen instead of a UDF. Every
    // output is integer or string (token arithmetic), so the cross-engine
    // hash cannot drift on float representation. Scale shape: row-local,
    // scan-speed, zero shuffles beyond the presentation sort.
    QueryDef(
      "q88_array_hof",
      Some("""WITH d AS (SELECT doc_id, string_split(text, ' ') AS l
        |  FROM documents WHERE text IS NOT NULL)
        |SELECT doc_id,
        |  CAST(len(l) AS BIGINT) AS n_tokens,
        |  CAST(len(list_filter(l, x -> len(x) > 6)) AS BIGINT) AS n_long,
        |  CAST(list_sum(list_transform(l, x -> len(x))) AS BIGINT) AS sum_len,
        |  CAST(list_max(list_transform(l, x -> len(x))) AS BIGINT) AS max_len,
        |  upper(list_filter(l, x -> len(x) > 6)[1]) AS first_long_upper
        |FROM d ORDER BY doc_id""".stripMargin),
      (spark, dir) =>
        t(spark, dir, "documents")
          .where(col("text").isNotNull)
          .select(col("doc_id"), split(col("text"), " ").as("l"))
          .select(col("doc_id"),
            size(col("l")).cast("long").as("n_tokens"),
            expr("size(filter(l, x -> length(x) > 6))").cast("long").as("n_long"),
            expr("aggregate(l, 0L, (acc, x) -> acc + length(x))").as("sum_len"),
            expr("array_max(transform(l, x -> length(x)))").cast("long").as("max_len"),
            // get() is 0-based and null-on-missing (element_at throws
            // under ANSI when no long token exists)
            expr("upper(get(filter(l, x -> length(x) > 6), 0))")
              .as("first_long_upper"))
          .orderBy("doc_id")),

    // Date-arithmetic family over the order calendar: add-days, diff-days,
    // month boundaries (trunc / last_day), quarter, and a PORTABLE
    // day-of-week (days since a pre-data Monday, mod 7 — both engines'
    // native dayofweek disagree on numbering, so the formula is the
    // cross-engine contract). Grouped to the distinct calendar first:
    // the per-date derivations run on ~365 rows, not the fact table.
    QueryDef(
      "q89_date_funcs",
      Some("""WITH c AS (SELECT CAST(o_orderdate AS DATE) AS d,
        |    CAST(COUNT(*) AS BIGINT) AS n_orders
        |  FROM orders GROUP BY 1)
        |SELECT d, n_orders,
        |  d + 30 AS plus30,
        |  CAST(DATE '2002-06-01' - d AS BIGINT) AS days_to_anchor,
        |  CAST(date_trunc('month', d) AS DATE) AS month_start,
        |  last_day(d) AS month_end,
        |  CAST(quarter(d) AS INT) AS q,
        |  CAST((d - DATE '1990-01-01') % 7 AS INT) AS dow_monday0
        |FROM c ORDER BY d""".stripMargin),
      (spark, dir) =>
        t(spark, dir, "orders")
          .groupBy(col("o_orderdate").cast("date").as("d"))
          .agg(count(lit(1)).as("n_orders"))
          .select(col("d"), col("n_orders"),
            date_add(col("d"), 30).as("plus30"),
            datediff(lit("2002-06-01").cast("date"), col("d")).cast("long")
              .as("days_to_anchor"),
            trunc(col("d"), "MM").as("month_start"),
            last_day(col("d")).as("month_end"),
            quarter(col("d")).as("q"),
            pmod(datediff(col("d"), lit("1990-01-01").cast("date")), lit(7))
              .cast("int").as("dow_monday0"))
          .orderBy("d")),

    // Null-safe equality join (<=> / IS NOT DISTINCT FROM): the join
    // class where NULL keys MATCH each other instead of vanishing —
    // needed whenever a derived key is legitimately null (here
    // NULLIF(status, 'F'): the F stratum becomes the null key). Both
    // sides pre-aggregate to one row per key before the join, so the
    // null-safe comparison runs over a handful of rows; at scale the
    // same plan shuffles on the key with nulls co-located (null-safe
    // equality hashes null as a regular value — no stray-null skew
    // beyond what the key distribution already has).
    QueryDef(
      "q90_nullsafe_join",
      Some(s"""WITH a AS (SELECT NULLIF(o_orderstatus, 'F') AS k,
        |    CAST(COUNT(*) AS BIGINT) AS n_orders
        |  FROM orders GROUP BY 1),
        |b AS (SELECT NULLIF(o_orderstatus, 'F') AS k,
        |    ${sqlMoneySum("o_totalprice")} AS revenue
        |  FROM orders GROUP BY 1)
        |SELECT a.k, n_orders, revenue
        |FROM a JOIN b ON a.k IS NOT DISTINCT FROM b.k
        |ORDER BY a.k NULLS FIRST""".stripMargin),
      (spark, dir) => {
        val o = t(spark, dir, "orders")
          .select(expr("NULLIF(o_orderstatus, 'F')").as("k"),
            col("o_totalprice"))
        val a = o.groupBy("k").agg(count(lit(1)).as("n_orders"))
        val b = o.groupBy(col("k").as("bk"))
          .agg(moneySum(col("o_totalprice")).as("revenue"))
        a.join(b, a("k") <=> b("bk"))
          .select(col("k"), col("n_orders"), col("revenue"))
          .orderBy(col("k").asc_nulls_first)
      }),

    // Regex function family — extract / replace / count with patterns
    // both engines' regex dialects (Java util.regex vs RE2) evaluate
    // identically: anchored capture groups, character classes, digit
    // runs. Row-local, codegen'd, scan-speed; the group-by bounds the
    // output by the (brand, first-token) domain, not the table.
    QueryDef(
      "q96_regex_stats",
      Some("""SELECT regexp_extract(p_brand, '([0-9]+)', 1) AS brand_num,
        |  regexp_extract(p_name, '^([a-z]+)', 1) AS first_word,
        |  CAST(COUNT(*) AS BIGINT) AS n_parts,
        |  CAST(SUM(len(regexp_extract_all(p_name, '[aeiou]'))) AS BIGINT) AS n_vowels,
        |  MIN(regexp_replace(p_name, '[aeiou]', '*', 'g')) AS sample_masked
        |FROM part GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin),
      (spark, dir) =>
        t(spark, dir, "part")
          .groupBy(regexp_extract(col("p_brand"), "([0-9]+)", 1).as("brand_num"),
            regexp_extract(col("p_name"), "^([a-z]+)", 1).as("first_word"))
          .agg(count(lit(1)).as("n_parts"),
            sum(expr("regexp_count(p_name, '[aeiou]')")).as("n_vowels"),
            min(regexp_replace(col("p_name"), "[aeiou]", "*")).as("sample_masked"))
          .orderBy("brand_num", "first_word")))
}
