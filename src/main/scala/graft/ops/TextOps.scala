package graft.ops

import org.apache.spark.sql.functions._

import graft.QueryDef
import graft.util.Tables._

/** Text-analysis operators over the `documents` table: language-ID
  * heuristic, quality scoring, token stats, document fingerprinting
  * (training-data-pipeline surface, SURVEY §7.4).
  *
  * The first three are written in a dialect-neutral SQL subset and run
  * VERBATIM in both Spark and the DuckDB oracle — logic parity is the
  * correctness contract. Counts stay integer (CAST .. AS INT/BIGINT) so
  * hashes can't drift on float formatting.
  */
object TextOps {

  /** Occurrence count of a padded marker word, exact in both engines:
    * each removed occurrence deletes length(w)+2 chars, and the division
    * is always exact (numerator divisible by denominator).
    */
  private def hits(w: String): String =
    s"(length(p) - length(replace(p, ' $w ', ''))) / ${w.length + 2}.0"

  /** Language-ID by marker-word scoring with a deterministic argmax
    * tiebreak. (The synthetic corpus shares one vocabulary across langs,
    * so the GRADED oracle pins logic parity; label accuracy is pinned
    * separately by LangIdSpec on a disjoint-marker-vocabulary fixture.)
    */
  private val langIdSql =
    s"""SELECT lang, predicted, COUNT(*) AS n FROM (
       |  SELECT lang, CASE
       |    WHEN s_en >= s_de AND s_en >= s_fr AND s_en >= s_es AND s_en >= s_zh THEN 'en'
       |    WHEN s_de >= s_fr AND s_de >= s_es AND s_de >= s_zh THEN 'de'
       |    WHEN s_fr >= s_es AND s_fr >= s_zh THEN 'fr'
       |    WHEN s_es >= s_zh THEN 'es'
       |    ELSE 'zh' END AS predicted
       |  FROM (
       |    SELECT lang,
       |      ${hits("the")} AS s_en,
       |      ${hits("table")} AS s_de,
       |      ${hits("fast")} AS s_fr,
       |      ${hits("slow")} AS s_es,
       |      ${hits("merge")} AS s_zh
       |    FROM (SELECT lang, ' ' || text || ' ' AS p FROM documents)))
       |GROUP BY lang, predicted ORDER BY lang, predicted""".stripMargin

  /** Per-document quality signals: all-integer output. */
  private val qualitySql =
    s"""SELECT doc_id,
       |  CAST(nc AS INT) AS n_chars,
       |  CAST(nt AS INT) AS n_tokens,
       |  CAST(nc - nt + 1 AS INT) AS n_letter_chars,
       |  CASE WHEN nt BETWEEN 30 AND 120 THEN 1 ELSE 0 END AS len_ok,
       |  CASE WHEN stop_hits >= 1 THEN 1 ELSE 0 END AS has_stopword
       |FROM (
       |  SELECT doc_id, length(text) AS nc,
       |    length(text) - length(replace(text, ' ', '')) + 1 AS nt,
       |    (length(' ' || text || ' ') - length(replace(' ' || text || ' ', ' the ', ''))) / 5.0 AS stop_hits
       |  FROM documents)
       |ORDER BY doc_id""".stripMargin

  /** Corpus token statistics per source. */
  private val tokenStatsSql =
    """SELECT source, COUNT(*) AS n_docs,
      |  CAST(SUM(nt) AS BIGINT) AS total_tokens,
      |  CAST(MIN(nt) AS INT) AS min_tokens,
      |  CAST(MAX(nt) AS INT) AS max_tokens
      |FROM (SELECT source, length(text) - length(replace(text, ' ', '')) + 1 AS nt
      |      FROM documents)
      |GROUP BY source ORDER BY source""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q29_lang_id", Some(langIdSql), (spark, dir) => {
      withViews(spark, dir, "documents")
      spark.sql(langIdSql)
    }),
    QueryDef("q30_quality_score", Some(qualitySql), (spark, dir) => {
      withViews(spark, dir, "documents")
      spark.sql(qualitySql)
    }),
    QueryDef("q31_token_stats", Some(tokenStatsSql), (spark, dir) => {
      withViews(spark, dir, "documents")
      spark.sql(tokenStatsSql)
    }),

    // Rolling polynomial fingerprint over tokens, kept inside a bounded
    // modulus so ANSI-mode Spark never overflows; same fold replicated in
    // DuckDB via list_reduce.
    QueryDef(
      "q32_fingerprint",
      Some("""SELECT doc_id, list_reduce(
        |  list_prepend(CAST(0 AS BIGINT),
        |    list_transform(string_split(text, ' '),
        |      t -> CAST(length(t) * 131 + ascii(t) AS BIGINT))),
        |  (a, b) -> (a * 31 + b) % 1000003) AS fp
        |FROM documents ORDER BY doc_id""".stripMargin),
      (spark, dir) =>
        t(spark, dir, "documents")
          .withColumn("codes", expr(
            "transform(split(text, ' '), t -> CAST(length(t) * 131 + ascii(t) AS BIGINT))"))
          .withColumn("fp", expr(
            "aggregate(codes, CAST(0 AS BIGINT), (a, b) -> (a * 31 + b) % 1000003)"))
          .select(col("doc_id"), col("fp"))
          .orderBy("doc_id")),

    // Vocabulary building: top document-frequency terms per language — the
    // tokenizer-vocab / stopword-list step of a training-data pipeline.
    // All-integer output with a deterministic (df DESC, term) tiebreak, so
    // the DuckDB oracle hash-matches exactly.
    QueryDef(
      "q52_vocab_top_terms",
      Some("""WITH tk AS (
        |  SELECT DISTINCT lang, doc_id, tt.term
        |  FROM documents, UNNEST(string_split(text, ' ')) AS tt(term)
        |  WHERE text IS NOT NULL),
        |dfreq AS (SELECT lang, term, CAST(COUNT(*) AS BIGINT) AS df
        |          FROM tk GROUP BY lang, term),
        |r AS (SELECT lang, term, df,
        |        CAST(row_number() OVER (PARTITION BY lang ORDER BY df DESC, term) AS INT) AS rnk
        |      FROM dfreq)
        |SELECT lang, rnk, term, df FROM r WHERE rnk <= 10
        |ORDER BY lang, rnk""".stripMargin),
      (spark, dir) => vocabTopTerms(t(spark, dir, "documents"), k = 10)),

    // TF-IDF term weighting with LINEAR idf (idf = N/df, the unsmoothed
    // inverse-frequency variant): per-doc top-k distinguishing terms — the
    // keyword-extraction / doc-representation step of a training-data
    // pipeline. Linear idf is chosen deliberately over log idf for the
    // ORACLE's sake: tf*N is an exact integer in a double (< 2^53) and the
    // single division is correctly rounded by IEEE 754 in both engines, so
    // the scores — and therefore the rank order — are bit-identical between
    // Spark and DuckDB, where ln() parity is only within 1 ulp.
    QueryDef(
      "q61_tfidf_top_terms",
      Some("""WITH toks AS (
        |  SELECT doc_id, tt.term
        |  FROM documents, UNNEST(string_split(text, ' ')) AS tt(term)
        |  WHERE text IS NOT NULL),
        |tf AS (SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
        |       FROM toks GROUP BY doc_id, term),
        |dfreq AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df
        |          FROM tf GROUP BY term),
        |n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents WHERE text IS NOT NULL),
        |r AS (SELECT doc_id, term, tf, df,
        |        CAST(tf * n AS DOUBLE) / df AS tfidf,
        |        CAST(row_number() OVER (PARTITION BY doc_id
        |          ORDER BY CAST(tf * n AS DOUBLE) / df DESC, term) AS INT) AS rnk
        |      FROM tf JOIN dfreq USING (term) CROSS JOIN n)
        |SELECT doc_id, rnk, term, tf, df, tfidf FROM r WHERE rnk <= 3
        |ORDER BY doc_id, rnk""".stripMargin),
      (spark, dir) => tfidfTopTerms(t(spark, dir, "documents"), k = 3)),

    // Out-of-vocabulary rate against a corpus-derived top-K vocabulary —
    // the tokenizer-coverage / gibberish-detection gate of a training-data
    // pipeline (a doc whose tokens mostly fall outside the learned vocab is
    // either foreign, corrupted, or machine noise). The synthetic corpus
    // shares one 31-term vocabulary, so planted rare-token docs (the q116
    // pattern) make the OOV tail non-vacuous; the rate is an int/int
    // division cast to double — one IEEE op, bit-stable.
    QueryDef(
      "q129_oov_rate",
      Some(oovRateSql),
      (spark, dir) =>
        oovRate(t(spark, dir, "documents").select(col("doc_id"), col("text"))
          .unionByName(oovPlantedDocs(spark)))))

  /** Tokens that exist nowhere in the base corpus (which only generates
    * lowercase dictionary words) — planted so the OOV tail is graded, not
    * vacuous: one all-gibberish doc (rate 1.0), one half-and-half, one doc
    * of common words only, one single-token doc. Same literals in the
    * oracle's UNION ALL.
    */
  private def oovPlantedDocs(spark: org.apache.spark.sql.SparkSession): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    Seq(
      (2000000000061L, Some("zxqv wqpk jjxr qqzt mvvw")),
      (2000000000062L, Some("join hash row zxqv wqpk qqzt")),
      (2000000000063L, Some("join hash row scan batch")),
      (2000000000064L, Some("xylophoneqz"))
    ).toDF("doc_id", "text")
  }

  /** Per-doc OOV stats against the top-`vocabSize` corpus terms (count
    * DESC, term ASC tiebreak — a total order, so the vocabulary boundary
    * is deterministic). Scale shape: the vocabulary is
    * vocabulary-bounded (a top-K over term partial aggs, a
    * TakeOrderedAndProject, never a corpus-sized sort) and rides to every
    * executor as a BROADCAST hash side, so the token stream is scanned
    * once, joined map-side with zero extra shuffle, and collapses to
    * per-doc counts via one shuffle on doc_id.
    */
  def oovRate(docs: org.apache.spark.sql.DataFrame, vocabSize: Int = 20): org.apache.spark.sql.DataFrame = {
    require(vocabSize > 0, s"vocabSize must be positive, got $vocabSize")
    val tok = docs.where(col("text").isNotNull)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
    val vocab = tok.groupBy("term").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("term").asc)
      .limit(vocabSize)
      .select(col("term"), lit(1).as("in_vocab"))
    tok.join(broadcast(vocab), Seq("term"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("in_vocab").isNull, 1L).otherwise(0L)).as("n_oov"))
      .withColumn("oov_rate",
        col("n_oov").cast("double") / col("n_tokens").cast("double"))
      .orderBy("doc_id")
  }

  // def, not val: referenced from `defs` above it (declaration-order init)
  private def oovRateSql: String =
    """WITH all_docs(doc_id, text) AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL
      |  VALUES
      |  (2000000000061, 'zxqv wqpk jjxr qqzt mvvw'),
      |  (2000000000062, 'join hash row zxqv wqpk qqzt'),
      |  (2000000000063, 'join hash row scan batch'),
      |  (2000000000064, 'xylophoneqz')),
      |tok AS (SELECT doc_id, tt.term
      |        FROM all_docs, UNNEST(string_split(text, ' ')) AS tt(term)
      |        WHERE text IS NOT NULL),
      |vocab AS (SELECT term FROM (
      |  SELECT term, COUNT(*) AS cnt FROM tok GROUP BY term
      |  ORDER BY cnt DESC, term LIMIT 20)),
      |j AS (SELECT tok.doc_id, tok.term, v.term AS vterm
      |      FROM tok LEFT JOIN vocab v ON v.term = tok.term)
      |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
      |  CAST(SUM(CASE WHEN vterm IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
      |  CAST(SUM(CASE WHEN vterm IS NULL THEN 1 ELSE 0 END) AS DOUBLE)
      |    / CAST(COUNT(*) AS DOUBLE) AS oov_rate
      |FROM j GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** Per-doc top-k terms by TF-IDF with linear idf (score = tf * N / df).
    * Scale shape: one explode that collapses straight back down to
    * (doc, term, tf) partial aggs; document frequency comes from a
    * whole-partition window over the term key (count over partitionBy(term),
    * no orderBy) instead of a groupBy+self-join — the plan stays a straight
    * line (no diamond, no cache): shuffle (doc_id, term) -> shuffle (term)
    * -> shuffle (doc_id), each linear in the token count. N rides in as a
    * broadcast 1-row cross join, not a driver-side collect.
    */
  def tfidfTopTerms(docs: org.apache.spark.sql.DataFrame, k: Int): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val live = docs.where(col("text").isNotNull)
    val tf = live
      .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val n = live.agg(count(lit(1)).as("n"))
    val scored = tf
      .withColumn("df", count(lit(1)).over(Window.partitionBy("term")))
      .crossJoin(broadcast(n))
      .withColumn("tfidf", (col("tf") * col("n")).cast("double") / col("df"))
    val w = Window.partitionBy("doc_id").orderBy(col("tfidf").desc, col("term"))
    scored.withColumn("rnk", row_number().over(w)).where(col("rnk") <= k)
      .select(col("doc_id"), col("rnk"), col("term"), col("tf"), col("df"), col("tfidf"))
      .orderBy("doc_id", "rnk")
  }

  /** Top-k terms per language by DOCUMENT frequency (per-doc distinct
    * tokens, so a term repeated inside one doc counts once). Scale shape:
    * the explode fans out but aggregates straight back down with map-side
    * partial aggs to (lang, term, df) — vocabulary-bounded cardinality, not
    * corpus-bounded — so the per-lang top-k window runs over term counts,
    * never documents.
    */
  def vocabTopTerms(docs: org.apache.spark.sql.DataFrame, k: Int): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tk = docs.where(col("text").isNotNull)
      .select(col("lang"),
        explode(array_distinct(split(col("text"), " "))).as("term"))
    val dfreq = tk.groupBy("lang", "term").agg(count(lit(1)).as("df"))
    val w = Window.partitionBy("lang").orderBy(col("df").desc, col("term"))
    dfreq.withColumn("rnk", row_number().over(w)).where(col("rnk") <= k)
      .select(col("lang"), col("rnk"), col("term"), col("df"))
      .orderBy("lang", "rnk")
  }
}
