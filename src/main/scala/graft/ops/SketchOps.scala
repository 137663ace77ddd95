package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.QueryDef
import graft.util.Tables._

/** Count-Min sketch as a BOUNDED RELATION (SURVEY §7.4 sketch tier,
  * next to q41/q58's HLL and q156's exact bitmaps): approximate term
  * frequencies over an unbounded vocabulary in a fixed footprint. The
  * sketch is the (row, cell) → count relation — at most depth×width
  * rows REGARDLESS of vocabulary size (collisions fold into shared
  * cells), built by one partial-agged corpus pass, and mergeable across
  * days/shards by plain (row, cell) addition — the q157 daily-state
  * pattern for domains too large to count exactly. Estimates read back
  * as the MIN over the depth rows; the classic guarantees hold: an
  * estimate can never undercount, and overcounts are bounded by the
  * fold-in of colliding mass.
  *
  * Hash family: `xxhash64(term, row_index)` — a Spark codegen'd
  * expression, so build and probe share the exact text and a JVM-side
  * reimplementation (with its drift risk) never exists.
  */
object SketchOps {

  /** The (row, cell, cnt) sketch relation: ≤ depth·width rows. */
  def cmsBuild(terms: DataFrame, depth: Int, width: Int): DataFrame = {
    require(depth > 0 && width > 0,
      s"depth/width must be positive, got $depth/$width")
    terms
      .select(posexplode(expr(
        s"transform(sequence(0, ${depth - 1}), i -> pmod(xxhash64(term, i), $width))"))
        .as(Seq("row", "cell")))
      .groupBy("row", "cell").agg(count(lit(1)).as("cnt"))
  }

  /** Point estimates for `probes` (must carry a `term` column): min
    * over the depth rows of the probed cells. The sketch side is a
    * ≤ depth·width relation and broadcasts.
    */
  def cmsEstimate(sketch: DataFrame, probes: DataFrame,
      depth: Int, width: Int): DataFrame =
    probes
      .select(col("*"), posexplode(expr(
        s"transform(sequence(0, ${depth - 1}), i -> pmod(xxhash64(term, i), $width))"))
        .as(Seq("row", "cell")))
      .join(broadcast(sketch), Seq("row", "cell"), "left_outer")
      .groupBy(probes.columns.map(col): _*)
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est"))

  /** q229 body: build a 4×1024 sketch over the corpus terms, probe the
    * exact top-10 heavy hitters, and grade the CONTRACT (the estimate
    * itself is hash-dependent, so the oracle checks the guarantees, not
    * the value — the q58/q70 sketch-grading pattern): `est ≥ true`
    * always (CMS never undercounts), and `est ≤ true + 4·(N div width)`
    * (collision mass bounded by 4× the average cell load — generous
    * deterministic slack over the expected N/width).
    */
  /** Slack multiplier of the upper contract: est ≤ true + SLACK·(N/width).
    * By Markov each row overshoots 4× its expected collision mass with
    * p ≤ 1/4, so the min over depth rows fails with p ≤ 4^-depth — the
    * TRUE-valued oracle therefore requires depth ≥ 4 (p ≤ 0.4%), which
    * the require below pins so a shallower sketch can't silently grade
    * against a contract it doesn't satisfy. Width may vary freely: the
    * bound scales with it inside the expression.
    */
  private val CmsSlack = 4

  def cmsContract(docs: DataFrame, depth: Int = 4, width: Int = 1024): DataFrame = {
    require(depth >= 4,
      s"depth must be >= 4 for the graded TRUE contract (see CmsSlack doc), got $depth")
    val terms = docs.where(col("text").isNotNull)
      .select(explode(split(col("text"), " ")).as("term"))
      .where(col("term") =!= "")
    val sketch = cmsBuild(terms, depth, width)
    val totals = terms.agg(count(lit(1)).as("n_terms"))
    val top = terms.groupBy("term").agg(count(lit(1)).as("true_cnt"))
      .orderBy(col("true_cnt").desc, col("term")).limit(10)
    cmsEstimate(sketch, top, depth, width)
      .crossJoin(broadcast(totals))
      .select(col("term"), col("true_cnt"),
        (col("est") >= col("true_cnt")).as("within_lower"),
        (col("est") <= col("true_cnt")
          + lit(CmsSlack) * expr(s"n_terms div $width")).as("within_upper"))
      .orderBy("term")
  }

  private val cmsOracle: String =
    """WITH terms AS (
      |  SELECT term FROM (
      |    SELECT unnest(string_split(text, ' ')) AS term
      |    FROM documents WHERE text IS NOT NULL)
      |  WHERE term <> ''),
      |tc AS (SELECT term, COUNT(*) AS cnt FROM terms GROUP BY 1),
      |top10 AS (
      |  SELECT term, CAST(cnt AS BIGINT) AS true_cnt
      |  FROM tc ORDER BY cnt DESC, term LIMIT 10)
      |SELECT term, true_cnt, TRUE AS within_lower, TRUE AS within_upper
      |FROM top10 ORDER BY term""".stripMargin

  /** q272 body: sketch-based AUDIENCE OVERLAP — the |A ∩ B| question
    * (viewers who also purchase) answered from mergeable HLL state via
    * inclusion–exclusion: est(A) + est(B) − est(A ∪ B). This is the
    * estimator every sketch warehouse ships for overlap (HLL has no
    * native intersect — only union merges losslessly), and its known
    * weakness is the point: the error envelope grows with the UNION's
    * size, not the intersection's, so the contract asserts the estimate
    * against an envelope of 4 × rsd × (estA + estB + estU) — three
    * estimator deviations stacked, each bounded by its own size — while
    * the exact overlap comes from plain SQL for the grade.
    *
    * Scale shape: two single-pass sketch aggregations (fixed 2^12-bucket
    * state, partial-agged map-side) + one union of two sketch blobs;
    * the exact branch is one distinct-shuffle. Nothing retains row data.
    */
  def sketchOverlap(ev: DataFrame): DataFrame = {
    val viewers = ev.where(col("event_type") === "view")
    val buyers = ev.where(col("event_type") === "purchase")
    val skA = viewers.agg(expr("hll_sketch_agg(user_id, 12)").as("ska"))
    val skB = buyers.agg(expr("hll_sketch_agg(user_id, 12)").as("skb"))
    val ests = skA.crossJoin(broadcast(skB))
      .select(
        expr("hll_sketch_estimate(ska)").as("est_a"),
        expr("hll_sketch_estimate(skb)").as("est_b"),
        expr("hll_sketch_estimate(hll_union(ska, skb))").as("est_u"))
      .select((col("est_a") + col("est_b") - col("est_u")).as("est_inter"),
        // rsd of an lgConfigK=12 HLL is 1.04/sqrt(2^12), not a rounded
        // 0.016 — an understated constant makes the contract tighter
        // than the estimator's documented envelope (flaky near 4 sigma)
        (lit(4 * 1.04 / math.sqrt(1 << 12)) *
          (col("est_a") + col("est_b") + col("est_u")))
          .as("envelope"))
    val exact = viewers.select(col("user_id"))
      .intersect(buyers.select(col("user_id")))
      .agg(count(lit(1)).as("exact_overlap"))
    exact.crossJoin(broadcast(ests))
      .select(col("exact_overlap"),
        (abs(col("est_inter") - col("exact_overlap")) <= col("envelope"))
          .cast("int").as("inter_within_bound"))
  }

  /** q285 body: ROLLING 7-day distinct users from mergeable HLL state —
    * the sketch twin of q131's exact fan-out and q157's exact bitmap
    * OR-merge. One fixed-size sketch per day (single pass, map-side
    * partial agg), then a calendar-RANGE window union of the trailing 7
    * day-sketches: per window the work is 7 blob merges of 2^12-bucket
    * state, independent of user cardinality — the shape that still
    * works when a day's audience no longer fits an exact bitmap. The
    * RANGE frame runs on an epoch-day index so calendar gaps widen the
    * window correctly (a ROWS frame would silently span more than 7
    * calendar days across a gap).
    *
    * Graded q84-style: the exact WAU comes from q131's machinery
    * (hash-graded against plain SQL), the estimate is bound-checked
    * engine-side against the 4 × rsd envelope (exact lgK=12 rsd).
    */
  def rollingSketchWau(ev: DataFrame): DataFrame = {
    val exact = EventOps.rollingDistinctUsers(ev, 7)
      .select(col("win_day").as("day"), col("n_users_7d").as("exact_wau"))
    val est = ev
      .select(to_date(col("ts")).as("day"), col("user_id"))
      .groupBy("day").agg(expr("hll_sketch_agg(user_id, 12)").as("sk"))
      .withColumn("di", datediff(col("day"), lit("1970-01-01").cast("date")))
      .select(col("day"), expr(
        """hll_sketch_estimate(hll_union_agg(sk) OVER
          |  (ORDER BY di RANGE BETWEEN 6 PRECEDING AND CURRENT ROW))"""
          .stripMargin).as("est"))
    // inner join: the graded spine is event days (the sketch side has a
    // row only where a day saw events; exact gap-day rows drop)
    exact.join(est, Seq("day"))
      .select(col("day"), col("exact_wau"),
        (abs(col("est") - col("exact_wau")) <=
          lit(4 * 1.04 / math.sqrt(1 << 12)) * col("exact_wau"))
          .cast("int").as("within_bound"))
      .orderBy("day")
  }

  /** q312 body: GUARANTEED-exact heavy hitters in two bounded passes —
    * the production answer to "which items exceed φ = 1/(k+1) of a
    * 100 TB stream" when the full GROUP BY would carry the unbounded
    * vocabulary through the shuffle. Pass 1 runs the Misra-Gries typed
    * Aggregator ([[graft.functions.MisraGries]], capacity k = 64):
    * every partition's contribution to the exchange is ONE ≤ 64-entry
    * summary, and the merged candidate set provably contains every item
    * with true frequency > N/(k+1). Pass 2 recounts ONLY the candidates
    * exactly (a broadcast semi-join keeps the shuffle candidate-bounded)
    * and filters on the cross-multiplied integer threshold
    * cnt·(k+1) > N. The candidate SET is merge-order-dependent; the
    * final output is NOT — the recount intersects it down to exactly
    * the true heavy-hitter set, so the full DuckDB oracle (plain
    * GROUP BY ... HAVING over the same stream) hash-matches.
    *
    * The stream models the real boilerplate-detection workload the
    * synthetic corpus is too uniform for: corpus tokens (the head),
    * one `docid_<id>` token per document (the Heaps-law unique tail
    * that makes the sketch genuinely lossy — vocabulary ≫ k at every
    * scale, growing with the corpus), and a 3-token boilerplate banner
    * per document (the cross-document heavy structure a cleaning
    * pipeline hunts). All shares are ratios of per-document quantities,
    * so the heavy set is scale-invariant by construction.
    */
  def heavyHitters(docs: DataFrame, k: Int = 64): DataFrame = {
    val stream = docs.where(col("text").isNotNull)
      .select(explode(concat(
        split(col("text"), " "),
        array(concat(lit("docid_"), col("doc_id").cast("string"))),
        typedLit(Seq("cookie", "policy", "accepted")))).as("term"))
      .where(col("term") =!= "")
    val mg = graft.functions.MisraGries.misraGries(k)
    val summary = stream.agg(mg(col("term")).as("s"))
      .select(col("s.candidates").as("candidates"),
        col("s.n_stream").as("n_stream"))
      .localCheckpoint() // 2 consumers (candidate set + stream length)
    val cand = summary.select(explode(col("candidates")).as("term"))
    stream.join(broadcast(cand), Seq("term"))
      .groupBy("term").agg(count(lit(1)).as("cnt"))
      .crossJoin(broadcast(summary.select(col("n_stream"))))
      .where(col("cnt") * (k + 1) > col("n_stream"))
      .orderBy("term")
  }

  private val heavyHittersOracle =
    """WITH stream AS (
      |  SELECT unnest(string_split(text, ' ')) AS term
      |  FROM documents WHERE text IS NOT NULL
      |  UNION ALL
      |  SELECT 'docid_' || CAST(doc_id AS VARCHAR)
      |  FROM documents WHERE text IS NOT NULL
      |  UNION ALL
      |  SELECT unnest(['cookie', 'policy', 'accepted'])
      |  FROM documents WHERE text IS NOT NULL),
      |s AS (SELECT term FROM stream WHERE term <> ''),
      |n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_stream FROM s),
      |f AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS cnt FROM s GROUP BY term)
      |SELECT term, cnt, n.n_stream
      |FROM f, n WHERE cnt * 65 > n.n_stream ORDER BY term""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q312_heavy_hitters", Some(heavyHittersOracle),
      (spark, dir) => heavyHitters(t(spark, dir, "documents"))),

    QueryDef("q229_cms_contract", Some(cmsOracle),
      (spark, dir) => cmsContract(t(spark, dir, "documents"))),

    QueryDef("q285_rolling_hll",
      Some("""WITH ud AS (SELECT DISTINCT CAST(ts AS DATE) AS day, user_id
        |            FROM events),
        |days AS (SELECT DISTINCT day FROM ud)
        |SELECT d.day, CAST(COUNT(DISTINCT u.user_id) AS BIGINT) AS exact_wau,
        |  CAST(1 AS INT) AS within_bound
        |FROM days d JOIN ud u ON u.day BETWEEN d.day - 6 AND d.day
        |GROUP BY d.day ORDER BY d.day""".stripMargin),
      (spark, dir) => rollingSketchWau(EventOps.events(spark, dir))),

    QueryDef("q272_sketch_overlap",
      Some("""SELECT CAST(COUNT(*) AS BIGINT) AS exact_overlap,
        |  CAST(1 AS INT) AS inter_within_bound
        |FROM (SELECT DISTINCT user_id FROM events WHERE event_type = 'view'
        |      INTERSECT
        |      SELECT DISTINCT user_id FROM events
        |      WHERE event_type = 'purchase')""".stripMargin),
      (spark, dir) => sketchOverlap(EventOps.events(spark, dir))))
}
