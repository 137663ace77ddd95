package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.QueryDef
import graft.util.Tables._

/** Data-selection operators (SURVEY §7.4 extension surface): the
  * "which documents should a training run actually consume" layer that
  * sits between curation (q191's drop reasons) and mixing (q67/q198's
  * quotas). Two public designs re-expressed Spark-first:
  *
  *   - DSIR-style importance resampling (Xie et al. 2023, "Data
  *     Selection for Language Models via Importance Resampling"):
  *     hashed n-gram features, a target-vs-raw distribution ratio, and
  *     per-document importance weights (q295).
  *   - C4 line-level cleaning (Raffel et al. 2020, the C4 appendix
  *     rules): terminal-punctuation / short-line / boilerplate line
  *     drops plus page-level lorem-ipsum and brace kills (q296).
  *
  * Both are exactly SQL-expressible (md5 is the shared hash; the line
  * rules are string predicates), so both grade against full DuckDB
  * oracles.
  */
object SelectionOps {

  /** q295: DSIR-style importance weights over hashed unigram features.
    *
    * The public recipe: featurize each document as a bag of hashed
    * n-grams, fit target and raw unigram distributions over the hash
    * buckets, and weight each document by how much more likely its
    * features are under the TARGET distribution than the raw one —
    * then resample by that weight. Here the target domain is the
    * English slice (`lang = 'en'`), features are unigrams hashed to
    * 256 buckets by md5 hex prefix (engine-independent, so the oracle
    * recomputes everything), and the per-bucket ratio is kept EXACT:
    *
    *   w(b) = floor( (T_b + 1) * (R + 256) * 10000
    *               / ((R_b + 1) * (T + 256)) )        [basis points]
    *
    * — the Laplace-smoothed likelihood ratio in integer basis points
    * instead of log space, so per-document scores (the sum of w(b)
    * over token occurrences) are BIGINTs and the oracle hash cannot
    * drift on libm. Monotonicity vs the log formulation is not global
    * (sum-of-ratios vs sum-of-logs), but the selection signal — docs
    * whose vocabulary looks like the target score high — is the same,
    * and the arithmetic is reproducible on any engine. Magnitude
    * audit: at sf0.1 the corpus is ~3e5 tokens, so the widest product
    * (T_b+1)*(R+256)*1e4 < 1e15 « 2^63; a petascale corpus would hoist
    * the same arithmetic to DECIMAL(38,0) — same plan, wider lanes.
    *
    * Output: one row per language — doc count, total score, and how
    * many docs beat the GLOBAL mean score (exact cross-multiplied
    * compare `score * n > s`, no double division).
    *
    * Scale shape: tokens shuffle once to build the 256-row bucket
    * distributions (map-side combine collapses each partition to ≤256
    * rows first); the weight table and the two scalar total frames are
    * broadcast back; per-doc scoring is a broadcast join plus one
    * doc-keyed aggregate. Nothing sorts, nothing windows, no driver
    * collect.
    */
  def dsirWeights(docs: DataFrame): DataFrame = {
    val toks = docs.where(col("text").isNotNull)
      .select(col("doc_id"), col("lang"),
        explode(split(col("text"), " ")).as("term"))
      .withColumn("b", substring(md5(col("term")), 1, 2))
    val raw = toks.groupBy("b").agg(count(lit(1)).as("rc"))
    val tgt = toks.where(col("lang") === "en")
      .groupBy("b").agg(count(lit(1)).as("tc"))
    val tot = toks.agg(count(lit(1)).as("rt"),
      sum(when(col("lang") === "en", 1L).otherwise(0L)).as("tt"))
    val w = raw.join(tgt, Seq("b"), "left")
      .na.fill(0L, Seq("tc"))
      .crossJoin(broadcast(tot))
      .select(col("b"),
        expr("((tc + 1) * (rt + 256) * 10000L) div ((rc + 1) * (tt + 256))")
          .as("wbp"))
    val scores = toks.join(broadcast(w), Seq("b"))
      .groupBy("doc_id", "lang")
      .agg(sum(col("wbp")).as("score"))
    val g = scores.agg(sum(col("score")).as("s"), count(lit(1)).as("n"))
    scores.crossJoin(broadcast(g))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("score")).as("sum_score"),
        sum(when(col("score") * col("n") > col("s"), 1L).otherwise(0L))
          .as("n_above_mean"))
      .orderBy("lang")
  }

  private val dsirSql: String =
    """WITH tok AS (SELECT doc_id, lang, substr(md5(term), 1, 2) AS b
      |  FROM (SELECT doc_id, lang, unnest(string_split(text, ' ')) AS term
      |        FROM documents WHERE text IS NOT NULL)),
      |raw AS (SELECT b, COUNT(*) AS rc FROM tok GROUP BY b),
      |tgt AS (SELECT b, COUNT(*) AS tc FROM tok WHERE lang = 'en' GROUP BY b),
      |tot AS (SELECT COUNT(*) AS rt,
      |    CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS tt
      |  FROM tok),
      |w AS (SELECT raw.b,
      |    ((COALESCE(tgt.tc, 0) + 1) * (tot.rt + 256) * 10000)
      |      // ((raw.rc + 1) * (tot.tt + 256)) AS wbp
      |  FROM raw LEFT JOIN tgt ON raw.b = tgt.b CROSS JOIN tot),
      |ds AS (SELECT doc_id, lang, CAST(SUM(wbp) AS BIGINT) AS score
      |  FROM tok JOIN w USING (b) GROUP BY doc_id, lang),
      |g AS (SELECT CAST(SUM(score) AS BIGINT) AS s, COUNT(*) AS n FROM ds)
      |SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
      |  CAST(SUM(score) AS BIGINT) AS sum_score,
      |  CAST(SUM(CASE WHEN score * g.n > g.s THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_above_mean
      |FROM ds CROSS JOIN g GROUP BY lang ORDER BY lang""".stripMargin

  /** q296: C4-style line-level cleaning census.
    *
    * The C4 cleaning pass (public appendix of Raffel et al. 2020)
    * removes LINES, not just documents: keep only lines that end in
    * terminal punctuation and have at least 3 words, drop lines that
    * mention javascript (cookie/JS boilerplate), and kill whole pages
    * containing "lorem ipsum" or a curly brace (code). The corpus
    * tables are single-line, so the graded input unions planted
    * multi-line pages (mirrored VALUES in the oracle, q76's pattern)
    * that exercise every rule.
    *
    * Per line: terminal = trimmed line ends in . ! ? or " ; words =
    * non-empty space-separated tokens; js = contains 'javascript'
    * (case-folded). Per doc: brace/lorem kill the whole page; a kept
    * doc needs >= 1 surviving line, and the C4 ">= 3 sentences" page
    * gate is reported alongside (n_docs_ge3_kept).
    *
    * Output: one global census row, all BIGINT.
    *
    * Scale shape: every rule is a row-local string predicate over the
    * exploded lines; the census is one partial-aggregated global agg.
    * No shuffle moves more than per-partition partial sums.
    */
  def lineRules(docs: DataFrame): DataFrame = {
    val lines = docs.where(col("text").isNotNull)
      .select(col("doc_id"),
        (lower(col("text")).contains("lorem ipsum")).as("lorem"),
        col("text").contains("{").as("brace"),
        explode(split(col("text"), "\n")).as("line"))
      .withColumn("terminal",
        expr("right(trim(line), 1)").isin(".", "!", "?", "\""))
      .withColumn("words",
        size(filter(split(col("line"), " "), x => x =!= "")))
      .withColumn("js", lower(col("line")).contains("javascript"))
      .withColumn("doc_killed", col("lorem") || col("brace"))
      .withColumn("kept",
        col("terminal") && col("words") >= 3 && !col("js") &&
          !col("doc_killed"))
    val perDoc = lines.groupBy("doc_id")
      .agg(max(when(col("doc_killed"), 1L).otherwise(0L)).as("killed"),
        sum(when(col("kept"), 1L).otherwise(0L)).as("kept_lines"))
    val docCensus = perDoc.agg(
      count(lit(1)).as("n_docs"),
      sum(col("killed")).as("n_docs_killed"),
      sum(when(col("kept_lines") >= 1, 1L).otherwise(0L)).as("n_docs_kept"),
      sum(when(col("kept_lines") >= 3, 1L).otherwise(0L))
        .as("n_docs_ge3_kept"))
    val lineCensus = lines.agg(
      count(lit(1)).as("n_lines"),
      sum(when(!col("terminal"), 1L).otherwise(0L)).as("n_no_punct"),
      sum(when(col("words") < 3, 1L).otherwise(0L)).as("n_short_line"),
      sum(when(col("js"), 1L).otherwise(0L)).as("n_js"),
      sum(when(col("kept"), 1L).otherwise(0L)).as("n_kept_lines"))
    docCensus.crossJoin(lineCensus)
      .select("n_docs", "n_lines", "n_no_punct", "n_short_line", "n_js",
        "n_docs_killed", "n_kept_lines", "n_docs_kept", "n_docs_ge3_kept")
  }

  /** Planted multi-line pages for q296 — every rule gets a witness:
    * clean kept lines, a no-punct line, a short line, a javascript
    * line, a brace-killed page, and a lorem-ipsum page. Mirrored
    * verbatim (via chr(10)) in [[lineRulesSql]].
    */
  private[graft] def c4Docs(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq(
      (4000000000051L, Some("This page keeps three full sentences intact." +
        "\nEach of them ends with terminal punctuation!" +
        "\nSo the page survives the sentence gate?" +
        "\nshort one\nthis line has no terminal punctuation at all")),
      (4000000000052L, Some("Enable JavaScript to view this page." +
        "\nOnly one real sentence survives here.")),
      (4000000000053L, Some("function f() { return 1; }" +
        "\nA fine sentence that the brace kill still removes.")),
      (4000000000054L, Some("Lorem ipsum dolor sit amet." +
        "\nAnother casualty of the lorem filter.")),
      (4000000000055L, Option.empty[String])
    ).toDF("doc_id", "text")
  }

  private val lineRulesSql: String =
    """WITH all_docs(doc_id, text) AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL
      |  VALUES
      |    (4000000000051, 'This page keeps three full sentences intact.'
      |      || chr(10) || 'Each of them ends with terminal punctuation!'
      |      || chr(10) || 'So the page survives the sentence gate?'
      |      || chr(10) || 'short one'
      |      || chr(10) || 'this line has no terminal punctuation at all'),
      |    (4000000000052, 'Enable JavaScript to view this page.'
      |      || chr(10) || 'Only one real sentence survives here.'),
      |    (4000000000053, 'function f() { return 1; }'
      |      || chr(10) || 'A fine sentence that the brace kill still removes.'),
      |    (4000000000054, 'Lorem ipsum dolor sit amet.'
      |      || chr(10) || 'Another casualty of the lorem filter.'),
      |    (4000000000055, NULL)),
      |lines AS (SELECT doc_id,
      |    contains(lower(text), 'lorem ipsum') AS lorem,
      |    contains(text, '{') AS brace,
      |    unnest(string_split(text, chr(10))) AS line
      |  FROM all_docs WHERE text IS NOT NULL),
      |f AS (SELECT doc_id, lorem, brace, line,
      |    right(trim(line), 1) IN ('.', '!', '?', '"') AS terminal,
      |    len(list_filter(string_split(line, ' '), x -> x != ''))
      |      AS words,
      |    contains(lower(line), 'javascript') AS js,
      |    (lorem OR brace) AS doc_killed
      |  FROM lines),
      |k AS (SELECT *,
      |    (terminal AND words >= 3 AND NOT js AND NOT doc_killed) AS kept
      |  FROM f),
      |pd AS (SELECT doc_id,
      |    MAX(CASE WHEN doc_killed THEN 1 ELSE 0 END) AS killed,
      |    SUM(CASE WHEN kept THEN 1 ELSE 0 END) AS kept_lines
      |  FROM k GROUP BY doc_id),
      |dc AS (SELECT COUNT(*) AS n_docs, SUM(killed) AS n_docs_killed,
      |    SUM(CASE WHEN kept_lines >= 1 THEN 1 ELSE 0 END) AS n_docs_kept,
      |    SUM(CASE WHEN kept_lines >= 3 THEN 1 ELSE 0 END)
      |      AS n_docs_ge3_kept
      |  FROM pd),
      |lc AS (SELECT COUNT(*) AS n_lines,
      |    SUM(CASE WHEN NOT terminal THEN 1 ELSE 0 END) AS n_no_punct,
      |    SUM(CASE WHEN words < 3 THEN 1 ELSE 0 END) AS n_short_line,
      |    SUM(CASE WHEN js THEN 1 ELSE 0 END) AS n_js,
      |    SUM(CASE WHEN kept THEN 1 ELSE 0 END) AS n_kept_lines
      |  FROM k)
      |SELECT CAST(n_docs AS BIGINT) AS n_docs,
      |  CAST(n_lines AS BIGINT) AS n_lines,
      |  CAST(n_no_punct AS BIGINT) AS n_no_punct,
      |  CAST(n_short_line AS BIGINT) AS n_short_line,
      |  CAST(n_js AS BIGINT) AS n_js,
      |  CAST(n_docs_killed AS BIGINT) AS n_docs_killed,
      |  CAST(n_kept_lines AS BIGINT) AS n_kept_lines,
      |  CAST(n_docs_kept AS BIGINT) AS n_docs_kept,
      |  CAST(n_docs_ge3_kept AS BIGINT) AS n_docs_ge3_kept
      |FROM dc CROSS JOIN lc""".stripMargin

  /** q320 body: QUALITY-PER-TOKEN budget selection — the greedy
    * knapsack every data-pruning recipe reduces to ("fill a token
    * budget with the highest-quality-density documents"): rank
    * documents by q262's integer quality density (score·1000 div
    * (10⁶·n_toks) — the permille ratio, ties on doc_id) and take the
    * prefix whose cumulative token count fits budget = corpus tokens
    * div 10. Greedy-by-ratio is the exact fractional-knapsack optimum
    * and the standard integral approximation; the graded output is the
    * census a run actually consumes — per selected/rejected side the
    * doc count, token mass, total quality score, and the boundary
    * density (the knapsack's dual price: what a token must "pay" to
    * make the cut).
    *
    * Scale shape: the prefix is NOT one global window sort (a single
    * reducer over the corpus — the q53 scale-killer). The density grid
    * is BOUNDED (≤ 1001 permille values), so: (1) one partial-agged
    * shuffle to per-density (n_docs, token) sums; (2) a window over
    * that ≤ 1001-row frame finds each density's starting offset,
    * making every density bucket wholesale-in (offset + mass ≤ budget)
    * or wholesale-out — EXCEPT the one straddling bucket; (3) only the
    * straddler's rows get a per-doc running sum (window over one
    * density key, with the q63 doc_id-bucket two-phase available
    * inside it if a single density ever dominates the corpus).
    * VocabSampleSpec pins two-phase == the naive global window.
    */
  def budgetSelect(docs: DataFrame): DataFrame = {
    val s = VocabModelOps.classifierScores(docs)
      .select(col("doc_id"), col("score"), col("n_toks"),
        expr("score * 1000 div (1000000 * n_toks)").as("rprm"))
      .localCheckpoint() // bucket agg + straddle resolve share the scan
    val tot = s.agg(expr("sum(n_toks) div 10").as("budget"))
    val wD = Window.orderBy(col("rprm").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val buckets = s.groupBy("rprm")
      .agg(sum(col("n_toks")).as("ts"))
      .crossJoin(broadcast(tot))
      .withColumn("before", coalesce(sum(col("ts")).over(wD), lit(0L)))
      .select(col("rprm"), col("ts"), col("before"), col("budget"))
    val withB = s.join(broadcast(buckets), Seq("rprm"))
    val wholesale = withB
      .where(col("before") + col("ts") <= col("budget") ||
        col("before") >= col("budget"))
      .withColumn("selected", col("before") + col("ts") <= col("budget"))
    val wIn = Window.partitionBy("rprm").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val straddle = withB
      .where(col("before") < col("budget") &&
        col("before") + col("ts") > col("budget"))
      .withColumn("selected",
        col("before") + sum(col("n_toks")).over(wIn) <= col("budget"))
    wholesale.unionByName(straddle)
      .groupBy("selected")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_toks")).as("tokens"),
        sum(col("score")).as("score_sum"),
        when(max(col("selected")), min(col("rprm")))
          .otherwise(max(col("rprm"))).as("boundary_rprm"))
      .orderBy(col("selected").desc)
  }

  /** q335 body: the GOPHER quality-rule battery (Rae et al. 2021,
    * Appendix A1.1) — the other standard rule set next to q296's C4
    * line rules, applied per document and censused: word count in
    * [50, 100k]; mean word length in [3, 10]; hash/ellipsis
    * symbol-to-word ratio ≤ 0.1 each; ≤ 90% bullet-point lines; ≤ 30%
    * ellipsis-ending lines; ≥ 80% words containing an alphabetic
    * character; ≥ 2 distinct words from the 8-word stop list. Every
    * ratio is CROSS-MULTIPLIED into exact integers (10·n_hash > w, not
    * a double division), so the full DuckDB oracle hash-matches.
    * Null-text docs evaluate as empty (fail the word-count gate; every
    * vacuous mean/ratio passes — both engines share the formula).
    * Planted witnesses (one per rule, plus an all-rules-pass doc) ride
    * the corpus, mirrored into the oracle from the SAME Scala strings.
    *
    * Scale shape: every rule is a row-local string/HOF predicate over
    * the scan; the census is one partial-aggregated global row.
    */
  def gopherRules(docs: DataFrame): DataFrame = {
    val verdicts = docs.select(
      expr("filter(split(coalesce(text, ''), ' '), x -> x <> '')").as("ws"),
      expr("split(coalesce(text, ''), '\n')").as("ls"),
      coalesce(col("text"), lit("")).as("t"))
      .select(
        size(col("ws")).cast("long").as("w"),
        expr("CAST(aggregate(ws, 0, (a, x) -> a + length(x)) AS BIGINT)")
          .as("sumlen"),
        expr("CAST(length(t) - length(replace(t, '#', '')) AS BIGINT)")
          .as("n_hash"),
        expr("CAST((length(t) - length(replace(t, '...', ''))) div 3 AS BIGINT)")
          .as("n_ell"),
        size(col("ls")).cast("long").as("n_lines"),
        expr("""CAST(size(filter(ls, l -> startswith(ltrim(l), '- ')
          | OR startswith(ltrim(l), '•')
          | OR startswith(ltrim(l), '*'))) AS BIGINT)""".stripMargin)
          .as("n_bullet"),
        expr("CAST(size(filter(ls, l -> endswith(rtrim(l), '...'))) AS BIGINT)")
          .as("n_ell_ln"),
        expr("CAST(size(filter(ws, x -> x RLIKE '[A-Za-z]')) AS BIGINT)")
          .as("n_alpha"),
        expr("""CAST(size(array_intersect(array_distinct(ws),
          | array('the','be','to','of','and','that','have','with')))
          | AS BIGINT)""".stripMargin).as("n_stop"))
      .select(
        (col("w") < 50L || col("w") > 100000L).as("f_wordcount"),
        (col("sumlen") < lit(3L) * col("w") ||
          col("sumlen") > lit(10L) * col("w")).as("f_meanlen"),
        (lit(10L) * col("n_hash") > col("w") ||
          lit(10L) * col("n_ell") > col("w")).as("f_symbol"),
        (lit(10L) * col("n_bullet") > lit(9L) * col("n_lines"))
          .as("f_bullets"),
        (lit(10L) * col("n_ell_ln") > lit(3L) * col("n_lines"))
          .as("f_ellipsis"),
        (lit(10L) * col("n_alpha") < lit(8L) * col("w")).as("f_alpha"),
        (col("n_stop") < 2L).as("f_stop"))
    def cnt(c: String): Column = sum(when(col(c), 1L).otherwise(0L)).as(c)
    verdicts.agg(
      count(lit(1)).as("n_docs"),
      cnt("f_wordcount"), cnt("f_meanlen"), cnt("f_symbol"),
      cnt("f_bullets"), cnt("f_ellipsis"), cnt("f_alpha"), cnt("f_stop"),
      sum(when(!col("f_wordcount") && !col("f_meanlen") &&
        !col("f_symbol") && !col("f_bullets") && !col("f_ellipsis") &&
        !col("f_alpha") && !col("f_stop"), 1L).otherwise(0L)).as("n_pass"))
  }

  /** Planted Gopher witnesses — one failing doc per rule plus one doc
    * passing every rule; mirrored VERBATIM into [[gopherRulesSql]] from
    * these same strings (no hand-duplicated literals to drift).
    */
  private[graft] val gopherTexts: Seq[(Long, String)] = Seq(
    // passes all: 54 words, 3-6 letters, alphabetic, 4 stop words
    4600000000001L -> ((1 to 50).map(i => s"word${('a' + i % 26).toChar}")
      .mkString(" ") + " the and of have"),
    // word count: 4 words (passes everything else)
    4600000000002L -> "tiny doc the and",
    // mean word length: 55 two-letter words incl stop words be/to
    4600000000003L -> ((1 to 53).map(i =>
      f"${('a' + i % 26).toChar}${('a' + (i / 26) % 26).toChar}")
      .mkString(" ") + " be to"),
    // symbol ratio: 6 hashes over 54 words
    4600000000004L -> ((1 to 44).map(i => s"tok${('a' + i % 26).toChar}")
      .mkString(" ") + " a# b# c# d# e# f# the and of have"),
    // bullet lines: 10 of 10 lines bulleted (alpha stays >= 80%,
    // stop words the/and ride every line)
    4600000000005L -> (1 to 10).map(i =>
      s"- item${('a' + i).toChar} alpha beta gamma the and")
      .mkString("\n"),
    // ellipsis lines: 4 of 10 lines end with ... (w = 60 keeps symbol ok)
    4600000000006L -> (1 to 10).map(i =>
      s"line${('a' + i).toChar} alpha beta gamma the and" +
        (if (i <= 4) "..." else "")).mkString("\n"),
    // alpha: 15 numeric words of 50 (70% alphabetic)
    4600000000007L -> ((1 to 35).map(i => s"word${('a' + i % 26).toChar}")
      .mkString(" ") + " " + (1 to 13).map(i => s"${100 + i}")
      .mkString(" ") + " the and"),
    // stop words: 50 alphabetic words, zero stop-list hits
    4600000000008L -> (1 to 50).map(i =>
      s"lex${('a' + i % 26).toChar}${('a' + (i / 26) % 26).toChar}")
      .mkString(" "))

  private[graft] def gopherDocs(spark: SparkSession): DataFrame = {
    import spark.implicits._
    (gopherTexts :+ (4600000000009L -> null.asInstanceOf[String]))
      .toDF("doc_id", "text")
  }

  /** SQL text literal for a planted doc: quotes escaped, newlines
    * rebuilt via chr(10) (the q296 mirroring pattern, generated instead
    * of hand-written).
    */
  private def sqlText(s: String): String =
    s.split("\n", -1).map(p => "'" + p.replace("'", "''") + "'")
      .mkString(" || chr(10) || ")

  private val gopherRulesSql: String = {
    val planted = (gopherTexts.map { case (id, txt) =>
      s"    ($id, ${sqlText(txt)})"
    } :+ "    (4600000000009, NULL)").mkString(",\n")
    s"""WITH all_docs(doc_id, text) AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL
      |  VALUES
      |$planted),
      |m AS (
      |  SELECT
      |    list_filter(string_split(COALESCE(text, ''), ' '), x -> x <> '')
      |      AS ws,
      |    string_split(COALESCE(text, ''), chr(10)) AS ls,
      |    COALESCE(text, '') AS t
      |  FROM all_docs),
      |v AS (
      |  SELECT
      |    CAST(len(ws) AS BIGINT) AS w,
      |    CAST(COALESCE(list_sum(list_transform(ws, x -> length(x))), 0)
      |      AS BIGINT) AS sumlen,
      |    CAST(length(t) - length(replace(t, '#', '')) AS BIGINT) AS n_hash,
      |    CAST((length(t) - length(replace(t, '...', ''))) // 3 AS BIGINT)
      |      AS n_ell,
      |    CAST(len(ls) AS BIGINT) AS n_lines,
      |    CAST(len(list_filter(ls, l -> starts_with(ltrim(l), '- ')
      |      OR starts_with(ltrim(l), '•')
      |      OR starts_with(ltrim(l), '*'))) AS BIGINT) AS n_bullet,
      |    CAST(len(list_filter(ls, l -> ends_with(rtrim(l), '...')))
      |      AS BIGINT) AS n_ell_ln,
      |    CAST(len(list_filter(ws, x -> regexp_matches(x, '[A-Za-z]')))
      |      AS BIGINT) AS n_alpha,
      |    CAST(len(list_intersect(list_distinct(ws),
      |      ['the','be','to','of','and','that','have','with']))
      |      AS BIGINT) AS n_stop
      |  FROM m),
      |f AS (
      |  SELECT
      |    (w < 50 OR w > 100000) AS f_wordcount,
      |    (sumlen < 3 * w OR sumlen > 10 * w) AS f_meanlen,
      |    (10 * n_hash > w OR 10 * n_ell > w) AS f_symbol,
      |    (10 * n_bullet > 9 * n_lines) AS f_bullets,
      |    (10 * n_ell_ln > 3 * n_lines) AS f_ellipsis,
      |    (10 * n_alpha < 8 * w) AS f_alpha,
      |    (n_stop < 2) AS f_stop
      |  FROM v)
      |SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
      |  CAST(SUM(CASE WHEN f_wordcount THEN 1 ELSE 0 END) AS BIGINT)
      |    AS f_wordcount,
      |  CAST(SUM(CASE WHEN f_meanlen THEN 1 ELSE 0 END) AS BIGINT)
      |    AS f_meanlen,
      |  CAST(SUM(CASE WHEN f_symbol THEN 1 ELSE 0 END) AS BIGINT)
      |    AS f_symbol,
      |  CAST(SUM(CASE WHEN f_bullets THEN 1 ELSE 0 END) AS BIGINT)
      |    AS f_bullets,
      |  CAST(SUM(CASE WHEN f_ellipsis THEN 1 ELSE 0 END) AS BIGINT)
      |    AS f_ellipsis,
      |  CAST(SUM(CASE WHEN f_alpha THEN 1 ELSE 0 END) AS BIGINT)
      |    AS f_alpha,
      |  CAST(SUM(CASE WHEN f_stop THEN 1 ELSE 0 END) AS BIGINT) AS f_stop,
      |  CAST(SUM(CASE WHEN NOT (f_wordcount OR f_meanlen OR f_symbol
      |    OR f_bullets OR f_ellipsis OR f_alpha OR f_stop)
      |    THEN 1 ELSE 0 END) AS BIGINT) AS n_pass
      |FROM f""".stripMargin
  }

  /** q327 body: the q320 budget knapsack re-priced in REAL tokenizer
    * tokens (VERDICT r12 #3) — quality per BPE token instead of per
    * whitespace word. Whitespace counts misprice documents whose words
    * fragment under the tokenizer (rare/long words cost several BPE
    * tokens each; boilerplate-heavy words that made the merge table
    * cost one), and a token budget is what an LLM training run
    * actually buys. The per-doc BPE token count is q217's application
    * doctrine: tokenizing a corpus is a JOIN — the merge loop already
    * produced the final tokenization of every DISTINCT word, so the
    * per-doc count is the word stream equi-joined to that broadcast
    * vocabulary (KBs at any corpus scale, Heaps-law sublinear) and
    * summed per doc. No per-document re-derivation of the merges.
    *
    * Selection then follows q320's exact two-phase shape on the
    * rebased density rprm = score·1000 div (10⁶·bpe_toks) (≤ 1000,
    * since every word is ≥ 1 BPE token and weights are ≤ 10⁶ per
    * distinct word): bounded density grid, wholesale buckets, only the
    * straddler resolved per-doc. Budget = corpus BPE tokens div 10.
    * Census mirrors q320 with the token masses in BPE tokens.
    */
  def bpeBudgetSelect(docs: DataFrame, rounds: Int = 3): DataFrame = {
    val (vocab, _) = VocabModelOps.bpeRounds(docs, rounds)
    val words = docs.where(col("text").isNotNull)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      .where(col("w") =!= "")
    val bpe = words
      .join(broadcast(vocab.select(col("w"), size(col("toks")).as("wt"))),
        Seq("w"))
      .groupBy("doc_id").agg(sum(col("wt")).cast("long").as("bpe_toks"))
    val s = VocabModelOps.classifierScores(docs)
      .select(col("doc_id"), col("score"))
      .join(bpe, Seq("doc_id"))
      .withColumn("rprm", expr("score * 1000 div (1000000 * bpe_toks)"))
      .localCheckpoint() // bucket agg + straddle resolve share the scan
    val tot = s.agg(expr("sum(bpe_toks) div 10").as("budget"))
    val wD = Window.orderBy(col("rprm").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val buckets = s.groupBy("rprm")
      .agg(sum(col("bpe_toks")).as("ts"))
      .crossJoin(broadcast(tot))
      .withColumn("before", coalesce(sum(col("ts")).over(wD), lit(0L)))
      .select(col("rprm"), col("ts"), col("before"), col("budget"))
    val withB = s.join(broadcast(buckets), Seq("rprm"))
    val wholesale = withB
      .where(col("before") + col("ts") <= col("budget") ||
        col("before") >= col("budget"))
      .withColumn("selected", col("before") + col("ts") <= col("budget"))
    val wIn = Window.partitionBy("rprm").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val straddle = withB
      .where(col("before") < col("budget") &&
        col("before") + col("ts") > col("budget"))
      .withColumn("selected",
        col("before") + sum(col("bpe_toks")).over(wIn) <= col("budget"))
    wholesale.unionByName(straddle)
      .groupBy("selected")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("bpe_toks")).as("bpe_tokens"),
        sum(col("score")).as("score_sum"),
        when(max(col("selected")), min(col("rprm")))
          .otherwise(max(col("rprm"))).as("boundary_rprm"))
      .orderBy(col("selected").desc)
  }

  // The oracle replays the 3-round merge chain (the q217 SQL, shared
  // via bpeChainSql), prices every doc in BPE tokens through the same
  // vocabulary join, and checks the census against the NAIVE global
  // prefix window — the semantics the two-phase plan must reproduce.
  private val bpeBudgetSql: String =
    s"""WITH ${VocabModelOps.bpeChainSql(3)},
      |dwords AS (
      |  SELECT doc_id, w FROM (
      |    SELECT doc_id, unnest(string_split(text, ' ')) AS w
      |    FROM documents WHERE text IS NOT NULL)
      |  WHERE w <> ''),
      |bpe AS (
      |  SELECT dwords.doc_id, CAST(SUM(len(v3.toks)) AS BIGINT) AS bpe_toks
      |  FROM dwords JOIN v3 ON v3.w = dwords.w GROUP BY dwords.doc_id),
      |doc_tokens AS (
      |  SELECT DISTINCT doc_id, lang = 'en' AS is_en,
      |    unnest(string_split(text, ' ')) AS tok
      |  FROM documents),
      |toks AS (SELECT * FROM doc_tokens WHERE tok <> ''),
      |weights AS (
      |  SELECT tok,
      |    SUM(CASE WHEN is_en THEN 1 ELSE 0 END) * 1000000
      |      // COUNT(*) AS w
      |  FROM toks GROUP BY tok),
      |scored AS (
      |  SELECT t.doc_id, SUM(w.w) AS score
      |  FROM toks t JOIN weights w ON t.tok = w.tok
      |  GROUP BY 1),
      |r AS (SELECT scored.doc_id, scored.score, bpe.bpe_toks,
      |    scored.score * 1000 // (1000000 * bpe.bpe_toks) AS rprm
      |  FROM scored JOIN bpe ON scored.doc_id = bpe.doc_id),
      |b AS (SELECT CAST(SUM(bpe_toks) // 10 AS BIGINT) AS budget FROM r),
      |o AS (SELECT r.*, b.budget,
      |    SUM(bpe_toks) OVER (ORDER BY rprm DESC, doc_id
      |      ROWS UNBOUNDED PRECEDING) AS cum
      |  FROM r, b)
      |SELECT cum <= budget AS selected,
      |  CAST(COUNT(*) AS BIGINT) AS n_docs,
      |  CAST(SUM(bpe_toks) AS BIGINT) AS bpe_tokens,
      |  CAST(SUM(score) AS BIGINT) AS score_sum,
      |  CAST(CASE WHEN cum <= budget THEN MIN(rprm) ELSE MAX(rprm) END
      |    AS BIGINT) AS boundary_rprm
      |FROM o GROUP BY 1 ORDER BY selected DESC""".stripMargin

  private val budgetSelectSql: String =
    """WITH doc_tokens AS (
      |  SELECT DISTINCT doc_id, lang = 'en' AS is_en,
      |    unnest(string_split(text, ' ')) AS tok
      |  FROM documents),
      |toks AS (SELECT * FROM doc_tokens WHERE tok <> ''),
      |weights AS (
      |  SELECT tok,
      |    SUM(CASE WHEN is_en THEN 1 ELSE 0 END) * 1000000
      |      // COUNT(*) AS w
      |  FROM toks GROUP BY tok),
      |scored AS (
      |  SELECT t.doc_id, SUM(w.w) AS score, COUNT(*) AS n_toks
      |  FROM toks t JOIN weights w ON t.tok = w.tok
      |  GROUP BY 1),
      |r AS (SELECT doc_id, score, n_toks,
      |    score * 1000 // (1000000 * n_toks) AS rprm
      |  FROM scored),
      |b AS (SELECT CAST(SUM(n_toks) // 10 AS BIGINT) AS budget FROM r),
      |o AS (SELECT r.*, b.budget,
      |    SUM(n_toks) OVER (ORDER BY rprm DESC, doc_id
      |      ROWS UNBOUNDED PRECEDING) AS cum
      |  FROM r, b)
      |SELECT cum <= budget AS selected,
      |  CAST(COUNT(*) AS BIGINT) AS n_docs,
      |  CAST(SUM(n_toks) AS BIGINT) AS tokens,
      |  CAST(SUM(score) AS BIGINT) AS score_sum,
      |  CAST(CASE WHEN cum <= budget THEN MIN(rprm) ELSE MAX(rprm) END
      |    AS BIGINT) AS boundary_rprm
      |FROM o GROUP BY 1 ORDER BY selected DESC""".stripMargin

  /** q352 body: SEQUENCE PACKING priced in BPE tokens (VERDICT r13
    * #4) — q63's greedy contiguous fill with the per-doc weight
    * replaced by the REAL tokenizer cost from q327's pricing join, so
    * packed training batches speak the same unit the training run
    * buys. A context window holds `cap` BPE tokens, not `cap`
    * whitespace words: a doc whose rare/long words fragment under the
    * tokenizer fills a pack faster than its whitespace count claims,
    * which shifts every later pack boundary in its language — the
    * mispricing VocabSampleSpec's planted doc makes exact.
    *
    * Scale shape unchanged from q63: per-doc BPE counts come from one
    * equi-join of the word stream against the broadcast merge
    * vocabulary (KBs at any scale, q217's doctrine — never a per-doc
    * re-derivation), and the running total is the same distributed
    * prefix sum (per-(lang, bucket) partials → tiny bucket-offset
    * window → parallel within-bucket windows). Docs with no words
    * (null or whitespace-only text) have no BPE cost and are absent,
    * exactly as they are absent from q327's pricing.
    */
  def bpeSequencePack(docs: DataFrame, cap: Long, rounds: Int = 3,
      bucketWidth: Long = 100L): DataFrame = {
    val (vocab, _) = VocabModelOps.bpeRounds(docs, rounds)
    val words = docs.where(col("text").isNotNull)
      .select(col("doc_id"), col("lang"),
        explode(split(col("text"), " ")).as("w"))
      .where(col("w") =!= "")
    val base = words
      .join(broadcast(vocab.select(col("w"), size(col("toks")).as("wt"))),
        Seq("w"))
      .groupBy("doc_id", "lang")
      .agg(sum(col("wt")).cast("long").as("n_tokens"))
      .withColumn("bucket", expr(s"doc_id div ${bucketWidth}L"))
    val wB = Window.partitionBy("lang").orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = base.groupBy("lang", "bucket")
      .agg(sum(col("n_tokens")).as("bsum"))
      .withColumn("boff", coalesce(sum(col("bsum")).over(wB), lit(0L)))
      .select("lang", "bucket", "boff")
    val wIn = Window.partitionBy("lang", "bucket").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    base.join(broadcast(offsets), Seq("lang", "bucket"))
      .withColumn("cum", col("boff") + sum(col("n_tokens")).over(wIn))
      .select(col("doc_id"), col("lang"), col("n_tokens"),
        expr(s"(cum - n_tokens) div ${cap}L").as("pack_id"))
      .orderBy("doc_id")
  }

  // Oracle replays the shared 3-round merge chain, prices each doc via
  // the same vocabulary join, and packs with the NAIVE per-language
  // global prefix window — the semantics the distributed two-phase
  // prefix sum must reproduce exactly.
  private val bpePackSql: String =
    s"""WITH ${VocabModelOps.bpeChainSql(3)},
      |dwords AS (
      |  SELECT doc_id, lang, w FROM (
      |    SELECT doc_id, lang, unnest(string_split(text, ' ')) AS w
      |    FROM documents WHERE text IS NOT NULL)
      |  WHERE w <> ''),
      |bpe AS (
      |  SELECT dwords.doc_id, dwords.lang,
      |    CAST(SUM(len(v3.toks)) AS BIGINT) AS n_tokens
      |  FROM dwords JOIN v3 ON v3.w = dwords.w GROUP BY 1, 2),
      |o AS (
      |  SELECT doc_id, lang, n_tokens,
      |    SUM(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
      |      ROWS UNBOUNDED PRECEDING) AS cum
      |  FROM bpe)
      |SELECT doc_id, lang, n_tokens,
      |  CAST((cum - n_tokens) // 4096 AS BIGINT) AS pack_id
      |FROM o ORDER BY doc_id""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q352_bpe_pack", Some(bpePackSql),
      (spark, dir) => bpeSequencePack(t(spark, dir, "documents"),
        cap = 4096L)),

    QueryDef("q320_budget_select", Some(budgetSelectSql),
      (spark, dir) => budgetSelect(t(spark, dir, "documents"))),

    QueryDef("q327_bpe_budget", Some(bpeBudgetSql),
      (spark, dir) => bpeBudgetSelect(t(spark, dir, "documents"))),

    QueryDef("q335_gopher_rules", Some(gopherRulesSql),
      (spark, dir) => gopherRules(t(spark, dir, "documents")
        .select(col("doc_id"), col("text"))
        .unionByName(gopherDocs(spark)))),

    QueryDef("q295_dsir_weights", Some(dsirSql),
      (spark, dir) => dsirWeights(t(spark, dir, "documents"))),

    QueryDef("q296_line_rules", Some(lineRulesSql),
      (spark, dir) => lineRules(t(spark, dir, "documents")
        .select(col("doc_id"), col("text"))
        .unionByName(c4Docs(spark)))))
}
