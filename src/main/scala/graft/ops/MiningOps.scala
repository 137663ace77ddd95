package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.QueryDef
import graft.util.Tables._

/** Pattern-mining surface: market-basket co-occurrence over the sales
  * tables and corpus-statistics mining over `documents` — the adjacent
  * token-pair counts that drive the first iteration of BPE vocabulary
  * induction, and lift-scored collocations built from the same pair and
  * unigram frames. All three are exactly SQL-expressible (full DuckDB
  * oracles, no goldens): counts are integers, and the one real-valued
  * output (lift) is a single identically-parenthesized chain of IEEE
  * double multiply/divide over exact integers, so it is bit-stable
  * across engines without rounding.
  *
  * Reference surface mapped: the grouped-count analytics family
  * (aggregazioni 02:61-96) extended to self-join mining shapes the
  * reference's single-table notebooks never reach but a real pipeline
  * over the same schema would (SURVEY §7.4).
  */
object MiningOps {

  /** Distinct (order, brand) pairs — the "basket items" relation.
    * The part dimension is broadcast (25 brands, |part| ≪ |lineitem|);
    * the distinct collapses multi-line orders before any pairing.
    */
  private def orderBrands(li: DataFrame, part: DataFrame): DataFrame =
    li.select(col("l_orderkey").as("okey"), col("l_partkey"))
      .join(broadcast(part.select(col("p_partkey"), col("p_brand"))),
        col("l_partkey") === col("p_partkey"))
      .select(col("okey"), col("p_brand").as("brand"))
      .distinct()

  /** Market-basket co-occurrence: support counts for unordered brand
    * pairs bought within the same order. Scale shape: the self-join is
    * keyed on the order (one shuffle; both sides are the SAME deduped
    * frame), and per-order fan-out is bounded by C(items-per-order, 2)
    * — TPC-H orders carry ≤ 7 lines, so ≤ 21 pair rows per order at ANY
    * corpus scale. Output is bounded by the brand-pair lattice (≤ C(25,2)
    * = 300 rows), so the top-k sort is a TakeOrderedAndProject, never a
    * global sort of fact-table-sized data.
    */
  def brandPairs(li: DataFrame, part: DataFrame, k: Int = 100): DataFrame = {
    val ob = orderBrands(li, part)
    val a = ob.select(col("okey"), col("brand").as("brand_a"))
    val b = ob.select(col("okey"), col("brand").as("brand_b"))
    a.join(b, Seq("okey"))
      .where(col("brand_a") < col("brand_b"))
      .groupBy("brand_a", "brand_b")
      .agg(count(lit(1)).as("support"))
      .orderBy(col("support").desc, col("brand_a").asc, col("brand_b").asc)
      .limit(k)
  }

  /** 3-itemset support: unordered brand TRIPLES bought within one order —
    * the next Apriori lattice level above q121's pairs (the support
    * counts that seed association-rule mining). Scale shape identical to
    * q121 with one more self-join arm: all three sides are the SAME
    * deduped (order, brand) frame keyed on the order (co-partitioned
    * after one shuffle), per-order fan-out is bounded by
    * C(items-per-order, 3) <= 35 at TPC-H's <= 7 lines/order, and the
    * output lattice by C(|brands|, 3) — the top-k is a
    * TakeOrderedAndProject over a dimension-bounded relation at any
    * corpus scale.
    */
  def brandTriples(li: DataFrame, part: DataFrame, k: Int = 50): DataFrame = {
    val ob = orderBrands(li, part)
    val a = ob.select(col("okey"), col("brand").as("brand_a"))
    val b = ob.select(col("okey"), col("brand").as("brand_b"))
    val c = ob.select(col("okey"), col("brand").as("brand_c"))
    a.join(b, Seq("okey")).where(col("brand_a") < col("brand_b"))
      .join(c, Seq("okey")).where(col("brand_b") < col("brand_c"))
      .groupBy("brand_a", "brand_b", "brand_c")
      .agg(count(lit(1)).as("support"))
      .orderBy(col("support").desc, col("brand_a").asc,
        col("brand_b").asc, col("brand_c").asc)
      .limit(k)
  }

  /** Tokenized corpus (documents with text, split on single spaces —
    * the same tokenization q88/q29-q31 grade, identical to the oracle's
    * string_split).
    */
  private def tokenArrays(docs: DataFrame): DataFrame =
    docs.where(col("text").isNotNull)
      .select(split(col("text"), " ").as("l"))

  /** Adjacent (term_a, term_b) bigram occurrences — one row per adjacent
    * token pair, order preserved. Row-local (slice + zip_with, inside
    * whole-stage codegen), bounded fan-out: a doc of n tokens emits
    * exactly n-1 rows. Docs with < 2 tokens emit nothing; the size guard
    * also keeps the slice lengths non-negative under ANSI mode.
    */
  def adjacentPairs(docs: DataFrame): DataFrame =
    tokenArrays(docs)
      .where(size(col("l")) >= 2)
      .select(explode(zip_with(
        expr("slice(l, 1, size(l) - 1)"),
        expr("slice(l, 2, size(l) - 1)"),
        (a, b) => struct(a.as("term_a"), b.as("term_b")))).as("p"))
      .select(col("p.term_a"), col("p.term_b"))

  /** Adjacent-pair frequency table — the merge-candidate statistic the
    * first BPE iteration ranks (count every adjacent symbol pair, merge
    * the most frequent). Scale shape: partial aggregation collapses
    * repeated pairs map-side BEFORE the one shuffle on the pair key, and
    * the shuffled relation is vocabulary-bounded (distinct pairs), not
    * corpus-sized; the top-k is a TakeOrderedAndProject. The (cnt desc,
    * pair asc) order is total, so the k-boundary is deterministic.
    */
  def bpePairs(docs: DataFrame, k: Int = 50): DataFrame =
    adjacentPairs(docs)
      .select(concat_ws(" ", col("term_a"), col("term_b")).as("pair"))
      .groupBy("pair")
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("pair").asc)
      .limit(k)

  /** Lift-scored collocations: how much more often the bigram (a, b)
    * occurs than independence predicts — lift = P(a,b) / (P(a)·P(b))
    * with P(a,b) over the bigram total and P(·) over the unigram total.
    * Scale shape: the ≥ minSupport filter shrinks the pair side to the
    * frequent tail BEFORE any join; both join keys are single tokens
    * (vocabulary-bounded sides, sublinear in corpus size); the two
    * scalar totals ride in as broadcast one-row frames. The lift chain
    * is written with explicit parentheses in BOTH engines so the IEEE
    * double operations apply in the same order — bit-identical without
    * rounding.
    */
  def collocationLift(docs: DataFrame, minSupport: Long = 10, k: Int = 100): DataFrame = {
    val pairs = adjacentPairs(docs)
      .groupBy("term_a", "term_b").agg(count(lit(1)).as("c_ab"))
    val uni = tokenArrays(docs)
      .select(explode(col("l")).as("term"))
      .groupBy("term").agg(count(lit(1)).as("c"))
    val nUni = uni.agg(sum(col("c")).as("n_uni"))
    val nPair = pairs.agg(sum(col("c_ab")).as("n_pair"))
    pairs.where(col("c_ab") >= minSupport)
      .join(uni.select(col("term").as("term_a"), col("c").as("c_a")), Seq("term_a"))
      .join(uni.select(col("term").as("term_b"), col("c").as("c_b")), Seq("term_b"))
      .crossJoin(broadcast(nUni))
      .crossJoin(broadcast(nPair))
      .select(col("term_a"), col("term_b"), col("c_ab"),
        expr("(CAST(c_ab AS DOUBLE) * CAST(n_uni AS DOUBLE) * CAST(n_uni AS DOUBLE)) / " +
          "(CAST(c_a AS DOUBLE) * CAST(c_b AS DOUBLE) * CAST(n_pair AS DOUBLE))").as("lift"))
      .orderBy(col("c_ab").desc, col("term_a").asc, col("term_b").asc)
      .limit(k)
  }

  val defs: Seq[QueryDef] = Seq(
    // q241: skip-gram context-pair extraction — the word2vec-style
    // training-pair generator (q122's ADJACENT bigrams are the window-1
    // special case; embedding training wants every forward pair within
    // a window). Pair generation is ROW-LOCAL — each token's contexts
    // come from a bounded slice() of its own document's token array, no
    // self-join anywhere — so the fan-out is ≤ window per token at scan
    // speed, and map-side combine collapses repeated pairs before the
    // one vocabulary-bounded shuffle. The oracle replays with a
    // positional self-join (the relational formulation of the same
    // window); top-k is a TakeOrdered with a total tiebreak.
    QueryDef(
      "q241_skipgram_pairs",
      Some("""WITH d AS (
        |  SELECT doc_id, list_filter(string_split(text, ' '),
        |    t -> t <> '') AS ts
        |  FROM documents WHERE text IS NOT NULL),
        |x AS (
        |  SELECT doc_id, unnest(ts) AS term,
        |    generate_subscripts(ts, 1) AS i
        |  FROM d),
        |p AS (
        |  SELECT a.term AS center, b.term AS context
        |  FROM x a JOIN x b ON a.doc_id = b.doc_id
        |    AND b.i BETWEEN a.i + 1 AND a.i + 5)
        |SELECT center, context, CAST(COUNT(*) AS BIGINT) AS n
        |FROM p GROUP BY 1, 2
        |ORDER BY n DESC, center, context LIMIT 20""".stripMargin),
      (spark, dir) =>
        t(spark, dir, "documents")
          .where(col("text").isNotNull)
          .select(expr("filter(split(text, ' '), t -> t <> '')").as("ts"))
          .select(col("ts"), posexplode(col("ts")).as(Seq("i", "center")))
          .select(col("center"),
            explode(expr("slice(ts, i + 2, 5)")).as("context"))
          .groupBy("center", "context").agg(count(lit(1)).as("n"))
          .orderBy(col("n").desc, col("center"), col("context"))
          .limit(20)),

    QueryDef(
      "q121_cooccur_brands",
      Some("""WITH ob AS (SELECT DISTINCT l.l_orderkey AS okey, p.p_brand AS brand
        |  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey)
        |SELECT a.brand AS brand_a, b.brand AS brand_b,
        |  CAST(COUNT(*) AS BIGINT) AS support
        |FROM ob a JOIN ob b ON a.okey = b.okey AND a.brand < b.brand
        |GROUP BY 1, 2
        |ORDER BY support DESC, brand_a, brand_b LIMIT 100""".stripMargin),
      (spark, dir) =>
        brandPairs(t(spark, dir, "lineitem"), t(spark, dir, "part"))),

    QueryDef(
      "q140_brand_triples",
      Some("""WITH ob AS (SELECT DISTINCT l.l_orderkey AS okey, p.p_brand AS brand
        |  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey)
        |SELECT a.brand AS brand_a, b.brand AS brand_b, c.brand AS brand_c,
        |  CAST(COUNT(*) AS BIGINT) AS support
        |FROM ob a
        |JOIN ob b ON a.okey = b.okey AND a.brand < b.brand
        |JOIN ob c ON b.okey = c.okey AND b.brand < c.brand
        |GROUP BY 1, 2, 3
        |ORDER BY support DESC, brand_a, brand_b, brand_c LIMIT 50""".stripMargin),
      (spark, dir) =>
        brandTriples(t(spark, dir, "lineitem"), t(spark, dir, "part"))),

    QueryDef(
      "q122_bpe_pairs",
      Some("""WITH d AS (SELECT string_split(text, ' ') AS l
        |    FROM documents WHERE text IS NOT NULL),
        |p AS (SELECT l[i] || ' ' || l[i + 1] AS pair
        |  FROM d, UNNEST(range(1, len(l))) AS t(i) WHERE len(l) >= 2)
        |SELECT pair, CAST(COUNT(*) AS BIGINT) AS cnt
        |FROM p GROUP BY 1
        |ORDER BY cnt DESC, pair LIMIT 50""".stripMargin),
      (spark, dir) => bpePairs(t(spark, dir, "documents"))),

    QueryDef(
      "q123_collocation_lift",
      Some("""WITH d AS (SELECT string_split(text, ' ') AS l
        |    FROM documents WHERE text IS NOT NULL),
        |pr AS (SELECT l[i] AS term_a, l[i + 1] AS term_b
        |  FROM d, UNNEST(range(1, len(l))) AS t(i) WHERE len(l) >= 2),
        |pc AS (SELECT term_a, term_b, COUNT(*) AS c_ab FROM pr GROUP BY 1, 2),
        |uni AS (SELECT term, COUNT(*) AS c
        |  FROM (SELECT unnest(l) AS term FROM d) GROUP BY 1),
        |tot AS (SELECT (SELECT SUM(c) FROM uni) AS n_uni,
        |               (SELECT SUM(c_ab) FROM pc) AS n_pair)
        |SELECT pc.term_a, pc.term_b, CAST(pc.c_ab AS BIGINT) AS c_ab,
        |  (CAST(pc.c_ab AS DOUBLE) * CAST(tot.n_uni AS DOUBLE) * CAST(tot.n_uni AS DOUBLE)) /
        |  (CAST(ua.c AS DOUBLE) * CAST(ub.c AS DOUBLE) * CAST(tot.n_pair AS DOUBLE)) AS lift
        |FROM pc
        |JOIN uni ua ON ua.term = pc.term_a
        |JOIN uni ub ON ub.term = pc.term_b
        |CROSS JOIN tot
        |WHERE pc.c_ab >= 10
        |ORDER BY c_ab DESC, term_a, term_b LIMIT 100""".stripMargin),
      (spark, dir) => collocationLift(t(spark, dir, "documents"))))
}
