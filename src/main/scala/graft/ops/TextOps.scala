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

  /** Mojibake artifact digraphs (UTF-8 read as Latin-1, the ftfy bug
    * class), built from unicode escapes so no editor/encoding step can
    * corrupt the fixture: A_TILDE ("\u00c3", the prefix of every
    * mangled accented letter, e.g. "\u00c3\u00a9" for e-acute),
    * A_CIRC_EURO ("\u00e2\u20ac", the prefix of every mangled curly
    * quote/dash), and A_CIRC ("\u00c2", the stray NBSP artifact).
    */
  private val A_TILDE = "\u00c3"
  private val A_CIRC_EURO = "\u00e2\u20ac"
  private val A_CIRC = "\u00c2"

  /** Planted mojibake witnesses for q341: accented-letter artifacts,
    * curly-punctuation artifacts, NBSP artifacts, one clean doc and one
    * clean source for the zero path. Mirrored into the oracle from
    * these SAME strings.
    */
  private[graft] val mojibakeTexts: Seq[(Long, String, String)] = Seq(
    (4700000000001L, "srcM",
      s"the caf$A_TILDE\u00a9 and cr$A_TILDE\u00a8me br$A_TILDE\u00bbl$A_TILDE\u00a9e daily"),
    (4700000000002L, "srcM",
      s"she said $A_CIRC_EURO\u0153hello$A_CIRC_EURO\u009d and that${A_CIRC_EURO}\u2122s it"),
    (4700000000003L, "srcM", s"price${A_CIRC} 100$A_CIRC eur plus tax"),
    (4700000000004L, "srcM", "a perfectly clean line of text"),
    (4700000000005L, "srcN", "another clean source entirely"))

  private def mojibakeDocs(spark: org.apache.spark.sql.SparkSession)
      : org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    mojibakeTexts.toDF("doc_id", "source", "text")
  }

  /** q341 body: MOJIBAKE census — UTF-8 text decoded as Latin-1 leaves
    * unmistakable digraph artifacts ([[A_TILDE]] + continuation for
    * accented letters, [[A_CIRC_EURO]] + continuation for curly
    * punctuation, stray [[A_CIRC]] from non-breaking spaces), and
    * production pipelines (ftfy et al.) scrub them before training.
    * Counted EXACTLY by char-length deltas under replace (both engines
    * count characters, not bytes), censused per source: affected docs
    * and total artifact occurrences — the ingest-feed encoding-health
    * dashboard. Full SQL oracle; planted witnesses mirrored from the
    * same Scala strings.
    *
    * Scale shape: three row-local replace() probes per doc, one
    * partial-agged per-source census row.
    */
  def mojibakeCensus(docs: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val t0 = coalesce(col("text"), lit(""))
    def occ(needle: String): org.apache.spark.sql.Column =
      ((length(t0) - length(regexp_replace(t0, needle, ""))) /
        needle.length).cast("long")
    val probes = docs.select(col("source"),
      (occ(A_TILDE) + occ(A_CIRC_EURO) + occ(A_CIRC)).as("n_art"))
    probes.groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("n_art") > 0L, 1L).otherwise(0L))
          .as("n_mojibake_docs"),
        sum(col("n_art")).as("n_artifacts"))
      .orderBy("source")
  }

  private def sqlTextLit(x: String): String =
    "'" + x.replace("'", "''") + "'"

  private val mojibakeSql: String = {
    val planted = mojibakeTexts.map { case (id, src, txt) =>
      s"    ($id, ${sqlTextLit(src)}, ${sqlTextLit(txt)})"
    }.mkString(",\n")
    def occ(needle: String): String =
      s"(length(COALESCE(text, '')) - length(replace(COALESCE(text, ''), ${sqlTextLit(needle)}, ''))) // ${needle.length}"
    s"""WITH all_docs(doc_id, source, text) AS (
      |  SELECT doc_id, source, text FROM documents
      |  UNION ALL
      |  VALUES
      |$planted),
      |probes AS (
      |  SELECT source,
      |    CAST(${occ(A_TILDE)}
      |      + ${occ(A_CIRC_EURO)}
      |      + ${occ(A_CIRC)} AS BIGINT) AS n_art
      |  FROM all_docs)
      |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
      |  CAST(SUM(CASE WHEN n_art > 0 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_mojibake_docs,
      |  CAST(SUM(n_art) AS BIGINT) AS n_artifacts
      |FROM probes GROUP BY source ORDER BY source""".stripMargin
  }

  /** q342 body: CHARACTER-ENTROPY gibberish/spam bands — the
    * training-free quality signal next to q328's trained LM: a
    * document's empirical character entropy H = Σ c·(log2 n − log2 c)
    * / n collapses toward 0 for repeated-character/keyboard-mash spam
    * and sits near log2(alphabet) for natural text. Computed in EXACT
    * integer micro-bits through the shared literal log2 mantissa table
    * (the q328/q337 no-libm doctrine), censused by half-bit bands.
    *
    * Scale shape: the char explode partial-aggregates on (doc, char) —
    * ≤ alphabet rows per doc survive the map side; the per-doc fold and
    * band census are (docs × alphabet)-bounded. Magnitude: term ≤
    * n·45·10⁶ ≤ 4.5·10¹³ per doc at 10⁶ chars — Long-safe.
    */
  def charEntropyBands(docs: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val chars = docs.where(col("text").isNotNull && length(col("text")) >= 1)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(1, length(text)), i -> substring(text, i, 1))"))
        .as("ch"))
    val counts = chars.groupBy("doc_id", "ch")
      .agg(count(lit(1)).as("cnt"))
    val tot = counts.groupBy("doc_id").agg(sum(col("cnt")).as("n"))
    val perDoc = counts.join(tot, Seq("doc_id"))
      .select(col("doc_id"), col("n"),
        (col("cnt") * (expr(VocabModelOps.microLog2Spark("n")) -
          expr(VocabModelOps.microLog2Spark("cnt")))).as("term"))
      .groupBy("doc_id")
      .agg(expr("sum(term) div max(n)").as("h"))
    perDoc.groupBy(expr("h div 500000").as("band"))
      .agg(count(lit(1)).as("n_docs"),
        min(col("h")).as("min_h_microbits"),
        max(col("h")).as("max_h_microbits"))
      .orderBy("band")
  }

  private val charEntropySql: String =
    s"""WITH ch AS (
      |  SELECT doc_id, unnest(list_transform(
      |    generate_series(1, length(text)),
      |    i -> substring(text, CAST(i AS INT), 1))) AS ch
      |  FROM documents WHERE text IS NOT NULL AND length(text) >= 1),
      |c AS (SELECT doc_id, ch, CAST(COUNT(*) AS BIGINT) AS cnt
      |  FROM ch GROUP BY doc_id, ch),
      |tot AS (SELECT doc_id, CAST(SUM(cnt) AS BIGINT) AS n
      |  FROM c GROUP BY doc_id),
      |terms AS (
      |  SELECT c.doc_id, tot.n,
      |    c.cnt * (${graft.ops.VocabModelOps.microLog2Duck("tot.n")}
      |      - ${graft.ops.VocabModelOps.microLog2Duck("c.cnt")}) AS term
      |  FROM c JOIN tot ON c.doc_id = tot.doc_id),
      |pd AS (SELECT terms.doc_id,
      |    CAST(SUM(terms.term) // MAX(terms.n) AS BIGINT) AS h
      |  FROM terms GROUP BY terms.doc_id)
      |SELECT CAST(pd.h // 500000 AS BIGINT) AS band,
      |  CAST(COUNT(*) AS BIGINT) AS n_docs,
      |  CAST(MIN(pd.h) AS BIGINT) AS min_h_microbits,
      |  CAST(MAX(pd.h) AS BIGINT) AS max_h_microbits
      |FROM pd GROUP BY 1 ORDER BY band""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q341_mojibake_census", Some(mojibakeSql),
      (spark, dir) => mojibakeCensus(t(spark, dir, "documents")
        .select(col("doc_id"), col("source"), col("text"))
        .unionByName(mojibakeDocs(spark)))),

    QueryDef("q342_char_entropy", Some(charEntropySql),
      (spark, dir) => charEntropyBands(t(spark, dir, "documents"))),

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
