package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.QueryDef
import graft.util.Tables._

/** Corpus-statistics operators a training-data pipeline runs between
  * ingest and sampling: distribution-drift detection between two corpus
  * slices, and inverted-index (posting-list) construction for term lookup
  * / contamination tracing (SURVEY §7.4 extension surface over the
  * reference's grouped-count analytics family, aggregazioni 02:61-96).
  */
object CorpusStatsOps {

  /** Term-distribution drift between two halves of the corpus (split by
    * doc_id parity — deterministic, engine-independent). The divergence
    * score per term is the CROSS-MULTIPLIED rate difference
    * |c_a·n_b − c_b·n_a| (equivalent in ordering to |c_a/n_a − c_b/n_b|
    * scaled by n_a·n_b): with both products computed in DECIMAL(38,0)
    * the score is EXACT integer arithmetic in both engines — no float
    * division, no rounding step, bit-identical grading. Scale shape:
    * token explode collapses map-side to (term, side) partials before one
    * vocabulary-bounded shuffle; the two corpus totals ride in as a
    * broadcast one-row frame; top-k is a TakeOrderedAndProject with a
    * total (drift DESC, term) order.
    */
  def termDrift(docs: DataFrame, k: Int = 50): DataFrame = {
    val tok = docs.where(col("text").isNotNull)
      .select((col("doc_id") % 2 === 0).as("side_a"),
        explode(split(col("text"), " ")).as("term"))
    val counts = tok.groupBy("term")
      .agg(sum(when(col("side_a"), 1L).otherwise(0L)).as("c_a"),
        sum(when(!col("side_a"), 1L).otherwise(0L)).as("c_b"))
    val totals = counts.agg(sum(col("c_a")).as("n_a"), sum(col("c_b")).as("n_b"))
    val dec = DecimalType(19, 0)
    counts.crossJoin(broadcast(totals))
      .withColumn("drift",
        abs(col("c_a").cast(dec) * col("n_b").cast(dec) -
          col("c_b").cast(dec) * col("n_a").cast(dec)).cast("long"))
      .select(col("term"), col("c_a"), col("c_b"), col("drift"))
      .orderBy(col("drift").desc, col("term").asc)
      .limit(k)
  }

  private def termDriftSql =
    """WITH tok AS (SELECT (doc_id % 2 = 0) AS side_a, tt.term
      |            FROM documents, UNNEST(string_split(text, ' ')) AS tt(term)
      |            WHERE text IS NOT NULL),
      |counts AS (SELECT term,
      |    CAST(SUM(CASE WHEN side_a THEN 1 ELSE 0 END) AS BIGINT) AS c_a,
      |    CAST(SUM(CASE WHEN side_a THEN 0 ELSE 1 END) AS BIGINT) AS c_b
      |  FROM tok GROUP BY term),
      |totals AS (SELECT SUM(c_a) AS n_a, SUM(c_b) AS n_b FROM counts)
      |SELECT term, c_a, c_b,
      |  CAST(ABS(CAST(c_a AS DECIMAL(19,0)) * CAST(n_b AS DECIMAL(19,0)) -
      |           CAST(c_b AS DECIMAL(19,0)) * CAST(n_a AS DECIMAL(19,0)))
      |    AS BIGINT) AS drift
      |FROM counts CROSS JOIN totals
      |ORDER BY drift DESC, term LIMIT 50""".stripMargin

  /** Inverted index: per term, document frequency plus the first
    * `maxPostings` doc ids (sorted) as a comma-joined string — the lookup
    * structure behind contamination tracing and per-term sampling.
    * Scale shape: the (term, doc) relation is ranked with a
    * row_number <= maxPostings filter that Spark's WindowGroupLimit
    * rewrite pushes into a per-partition top-k (bounded state per term,
    * never a full per-term sort at the reducer — the q115 pattern), so
    * the collect_list only ever aggregates <= maxPostings rows per term;
    * df comes from a separate vocabulary-bounded count aggregate sharing
    * the same shuffle key. Postings are emitted as a STRING because the
    * driver hash-compares scalar columns; both engines join the same
    * sorted ids with the same separator.
    */
  def invertedIndex(docs: DataFrame, maxPostings: Int = 10): DataFrame = {
    require(maxPostings > 0, s"maxPostings must be positive, got $maxPostings")
    val td = docs.where(col("text").isNotNull)
      .select(col("doc_id"), explode(array_distinct(split(col("text"), " "))).as("term"))
    val dfreq = td.groupBy("term").agg(count(lit(1)).as("df"))
    val w = Window.partitionBy("term").orderBy(col("doc_id").asc)
    val postings = td.withColumn("rn", row_number().over(w))
      .where(col("rn") <= maxPostings)
      .groupBy("term")
      .agg(concat_ws(",", sort_array(collect_list(col("doc_id")))).as("postings"))
    dfreq.join(postings, Seq("term"))
      .select(col("term"), col("df"), col("postings"))
      .orderBy("term")
  }

  private def invertedIndexSql =
    """WITH td AS (SELECT DISTINCT doc_id, tt.term
      |            FROM documents, UNNEST(string_split(text, ' ')) AS tt(term)
      |            WHERE text IS NOT NULL),
      |r AS (SELECT term, doc_id,
      |        row_number() OVER (PARTITION BY term ORDER BY doc_id) AS rn
      |      FROM td),
      |p AS (SELECT term, array_to_string(list(doc_id ORDER BY doc_id), ',') AS postings
      |      FROM r WHERE rn <= 10 GROUP BY term),
      |d AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM td GROUP BY term)
      |SELECT d.term, d.df, p.postings
      |FROM d JOIN p USING (term) ORDER BY d.term""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q132_term_drift", Some(termDriftSql),
      (spark, dir) => termDrift(t(spark, dir, "documents"))),
    QueryDef("q133_inverted_index", Some(invertedIndexSql),
      (spark, dir) => invertedIndex(t(spark, dir, "documents"))))
}
