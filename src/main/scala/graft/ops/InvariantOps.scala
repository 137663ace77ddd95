package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.QueryDef
import graft.util.Tables._

/** Output-invariant gates for the golden-graded operators (dedup, ANN,
  * sampling, sketches). The literal goldens (resources/oracle/) prove
  * determinism and regression-freedom but are frozen from the engine's own
  * output, so a semantics bug present at freeze time would be perpetuated.
  * These queries break that circularity: each computes, ENGINE-SIDE,
  * violation counts of properties the output must satisfy under any correct
  * hash family / seed choice (one caveat below), and their oracles are
  * plain DuckDB SQL over the source tables (constants + table counts) —
  * fully independent of the engine. A hash-family bug (the r3 null-text
  * collapse, an all-merge signature bug, a threshold inversion, a lost
  * stratum) flips a violation count to nonzero and fails the hash gate.
  *
  * Invariants chosen are exactly the ones the algorithms guarantee:
  *   - 1-hop canonical assignments: canonical <= id, canonical is a real id,
  *     one row per id, is_dup consistent, and every merged pair must be
  *     *explainable* — share a shingle (MinHash), share a 16-bit signature
  *     chunk (SimHash), or re-verify >= threshold under exact cosine
  *     (embedding near-dup). Docs that cannot band (null text / too short)
  *     must stay canonical = self.
  *   - Transitive clusters: labels are fixpoints (label(label(d)) =
  *     label(d)), never coarser than the 1-hop labels they refine, and
  *     never split a 1-hop class (same 1-hop canonical => same cluster).
  *   - Exact-duplicate text groups (SQL-computable) must collapse in every
  *     dedup tier; identical embedding vectors must share a canonical.
  *   - ANN top-k: every query returns exactly k rows, dense distinct ranks,
  *     distinct neighbors, never itself. CAVEAT: unlike every other check,
  *     the all-queries-return-k expectation is a recall *floor of the
  *     current family/seed at the graded scales*, not a universal law — a
  *     different correct LSH family could legitimately leave a sparse query
  *     with fewer than k candidates. Changing the family/seed may require
  *     re-vetting that expectation.
  *
  * The raw sf0.01/sf0.1 corpora happen to contain no null-text, <3-token,
  * or exact-duplicate documents (and no identical or null vectors), so on
  * those inputs alone the corresponding violation counts would be
  * trivially zero even if a regression reappeared. The GRADED gates
  * therefore union a small planted hazard set into the corpus before
  * checking — null texts, short texts, an exact-duplicate group, an
  * identical-vector triple, a null vector — with the oracle expectations
  * offset by the planted constants, so every regression path is exercised
  * at grading time, not only in InvariantFixtureSpec (which additionally
  * pins merge-positive corpora and the exclusion boundaries).
  */
object InvariantOps {

  /** One-row wide frame of BIGINT metrics -> (check_name, value) rows. */
  private def stackChecks(df: DataFrame): DataFrame = {
    val cols = df.columns
    val args = cols.map(c => s"'$c', $c").mkString(", ")
    df.selectExpr(s"stack(${cols.length}, $args) AS (check_name, value)")
  }

  private def zsum(c: Column): Column = coalesce(sum(c.cast("long")), lit(0L))

  /** Count of ids in `out(col)` that are not document/vector ids. */
  private def notMember(out: DataFrame, c: String, ids: DataFrame,
      idCol: String, name: String): DataFrame =
    out.select(col(c).as(idCol)).distinct()
      .join(ids, Seq(idCol), "left_anti")
      .agg(count(lit(1)).as(name))

  /** Planted doc ids start far above every real/rehearsal id (ScaleRehearsal
    * tops out near 1e8), so planted rows can never become the canonical of a
    * real doc and never collide with a real id.
    */
  private val PlantBase = 1000000000000L

  /** Seven hazard docs the raw corpora lack: 2 null texts, a 1-token and a
    * 2-token short text, and a 3-member exact-duplicate group (>= 3 tokens,
    * so it MUST band and collapse). Tokens are corpus-disjoint (`zzq`
    * prefix) so planted docs can only merge among themselves.
    */
  private def plantedDocs(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val dup = "zzqdup zzqone zzqtwo zzqthree"
    Seq(
      (PlantBase + 1, Option.empty[String]),
      (PlantBase + 2, Option.empty[String]),
      (PlantBase + 3, Some("zzqshort")),
      (PlantBase + 4, Some("zzqa zzqb")),
      (PlantBase + 5, Some(dup)),
      (PlantBase + 6, Some(dup)),
      (PlantBase + 7, Some(dup))
    ).toDF("doc_id", "text")
      .select(col("doc_id"), col("text"), lit("xx").as("lang"),
        lit("planted").as("source"),
        coalesce(length(col("text")).cast("long"), lit(0L)).as("n_chars"))
  }

  /** Invariants over [[DedupOps.minhashAssign]], [[DedupOps.simhashAssign]]
    * and [[DedupOps.minhashClusters]] on the `documents` table plus the
    * planted hazard docs (see [[plantedDocs]] — the oracle expectations are
    * offset by the 7 planted rows / 1 planted exact-dup group).
    */
  def dedupInvariants(spark: SparkSession, dir: String): DataFrame =
    dedupInvariants(t(spark, dir, "documents")
      .unionByName(plantedDocs(spark)))

  /** Frame-based core of [[dedupInvariants]] — the fixture spec runs it on
    * a planted corpus (nulls / shorts / exact dups) the graded tables lack.
    */
  def dedupInvariants(docsIn: DataFrame): DataFrame = {
    val docs = docsIn.cache()
    val ids = docs.select(col("doc_id"))
    // one banded pass feeds both MinHash tiers (pre-materialized inside);
    // rerunning minhashAssign + minhashClusters separately would pay the
    // signature scan + bucket window twice. sortResult = false: this gate
    // only joins/aggregates the frames, so the q51-style global sort
    // would be a wasted range exchange + sampling job
    val (mh, cl) = DedupOps.minhashTiers(docs, sortResult = false)
    // eager, not a lazy cache: the final single action evaluates the
    // simhash-consuming branches (stats, pairs, chunk re-verify)
    // concurrently, and concurrent stages racing an unmaterialized cache
    // each recompute the signature scan — measured ~2x on this gate
    val sh = DedupOps.simhashAssign(docs, sort = false).localCheckpoint(eager = true)

    val nDocs = docs.agg(count(lit(1)).as("n_docs"))

    // Docs that cannot band (null text or < 3 tokens -> null signature ->
    // private singleton bucket) must come out canonical = self in every
    // tier. NOTE: the graded corpora contain no such docs, so at sf0.01/0.1
    // these counts are trivially zero — the r3 null-collapse regression is
    // actually exercised by InvariantFixtureSpec's planted corpus; here the
    // check guards future corpora, not the current ones. The shortness
    // columns ride along in the SAME aggregation pass as the per-tier
    // structural stats (one join + one agg per tier, not two of each).
    val shortness = docs.select(col("doc_id"),
      (col("text").isNull || size(split(col("text"), " ")) < 3).as("is_short"),
      col("text").isNull.as("is_null"))
    // ONE tall union + ONE shortness join + ONE grouped aggregate for all
    // three tiers' structural stats, re-pivoted to the tier-specific
    // check names afterwards — three separate join+agg subtrees cost
    // ~6 extra exchanges of per-stage scheduling latency inside the
    // gate's single action (the dominant cost at gate scale, measured:
    // partition count is irrelevant, stage count is not)
    val tall = mh.select(lit("minhash").as("tier"), col("doc_id"),
        col("canonical_id").as("label"), col("is_dup").cast("long").as("is_dup"))
      .unionByName(sh.select(lit("simhash").as("tier"), col("doc_id"),
        col("canonical_id").as("label"), lit(null).cast("long").as("is_dup")))
      .unionByName(cl.select(lit("clusters").as("tier"), col("doc_id"),
        col("cluster_id").as("label"), col("is_dup").cast("long").as("is_dup")))
    // LEFT join (ADVICE r11): a tier row whose doc_id is not a document
    // must still be COUNTED — an inner join would silently drop it from
    // rows/distinct_docs and the count-vs-COUNT(*)+7 oracle check would
    // pass on a corrupt tier. Missing shortness rows read as not-short /
    // not-null, so the phantom row fails the count checks instead.
    val tierChecks = tall.join(shortness, Seq("doc_id"), "left")
      .groupBy("tier")
      .agg(count(lit(1)).as("rows"),
        countDistinct(col("doc_id")).as("distinct_docs"),
        zsum(col("label") > col("doc_id")).as("label_gt"),
        zsum(col("is_dup") =!= (col("label") < col("doc_id")).cast("long"))
          .as("isdup_wrong"),
        zsum(coalesce(col("is_short"), lit(false)) &&
          col("label") =!= col("doc_id")).as("short_merged"),
        zsum(coalesce(col("is_null"), lit(false)) &&
          col("label") =!= col("doc_id")).as("null_merged"))
      .selectExpr(
        """explode(CASE tier
          |  WHEN 'minhash' THEN array(
          |    named_struct('check_name', 'minhash_rows', 'value', rows),
          |    named_struct('check_name', 'minhash_distinct_docs', 'value', distinct_docs),
          |    named_struct('check_name', 'minhash_canonical_gt_doc', 'value', label_gt),
          |    named_struct('check_name', 'minhash_isdup_wrong', 'value', isdup_wrong),
          |    named_struct('check_name', 'minhash_short_or_null_merged', 'value', short_merged))
          |  WHEN 'simhash' THEN array(
          |    named_struct('check_name', 'simhash_rows', 'value', rows),
          |    named_struct('check_name', 'simhash_distinct_docs', 'value', distinct_docs),
          |    named_struct('check_name', 'simhash_canonical_gt_doc', 'value', label_gt),
          |    named_struct('check_name', 'simhash_null_text_merged', 'value', null_merged))
          |  ELSE array(
          |    named_struct('check_name', 'clusters_rows', 'value', rows),
          |    named_struct('check_name', 'clusters_distinct_docs', 'value', distinct_docs),
          |    named_struct('check_name', 'clusters_label_gt_doc', 'value', label_gt),
          |    named_struct('check_name', 'clusters_isdup_wrong', 'value', isdup_wrong))
          |END) AS kv""".stripMargin)
      .select(col("kv.check_name").as("check_name"), col("kv.value").as("value"))

    // Every MinHash merge must be explainable: a doc and its canonical
    // co-banded, and two docs with disjoint shingle sets have independent
    // 64-bit min-hashes (equal-slice probability ~2^-512) — so a merged
    // pair sharing ZERO shingles means the banding is broken. Left joins:
    // a merged doc missing from the shingle relation (too short to
    // shingle) is itself a violation.
    val mhPairs = mh.where(col("canonical_id") < col("doc_id"))
      .select(col("doc_id").as("a"), col("canonical_id").as("b"))
    // shingle sets are needed only for the (few) merged-pair members, not
    // the corpus — semi-join docs down before the shingle transform; a
    // too-short pair member still yields no shingle row => counted below
    val pairIds = mhPairs.select(col("a").as("doc_id"))
      .unionByName(mhPairs.select(col("b").as("doc_id"))).distinct()
    val shingleSets = DedupOps.shingles(docs.join(pairIds, Seq("doc_id"), "left_semi"))
    val mhOverlap = mhPairs
      .join(shingleSets.select(col("doc_id").as("a"), col("shingles").as("sa")), Seq("a"), "left")
      .join(shingleSets.select(col("doc_id").as("b"), col("shingles").as("sb")), Seq("b"), "left")
      .agg(zsum(col("sa").isNull || col("sb").isNull ||
          size(array_intersect(col("sa"), col("sb"))) === 0)
        .as("minhash_merged_no_shared_shingle"))

    // A SimHash merge happens only via an equal 16-bit chunk at the same
    // band position — recomputable from the output's own simhash column.
    val shPairs = sh.where(col("canonical_id") < col("doc_id"))
      .select(col("doc_id").as("a"), col("canonical_id").as("b"))
    val shChunk = shPairs
      .join(sh.select(col("doc_id").as("a"), col("simhash").as("ha")), Seq("a"))
      .join(sh.select(col("doc_id").as("b"), col("simhash").as("hb")), Seq("b"))
      .agg(zsum(col("ha").isNull || col("hb").isNull ||
          !expr("""exists(sequence(0, 3),
                  |  b -> (shiftright(ha, b * 16) & 65535) = (shiftright(hb, b * 16) & 65535))""".stripMargin))
        .as("simhash_merged_no_shared_chunk"))

    // The lattice and exact-dup checks all ride the SAME doc-keyed
    // mh ⋈ cl join (plus the label-of-label lookup and the text column)
    // — build it ONCE, checkpoint flat, and run the three checks as
    // aggregation branches over it. Second leg of the tier-stats fusion:
    // the three former join subtrees were ~6 exchanges of per-stage
    // scheduling latency inside the gate's single action; a regression
    // this fusion could mask (an mh row vanishing for a doc cl still
    // labels) already fails the rows/distinct_docs counts above.
    val fused = mh.select(col("doc_id"), col("canonical_id"))
      .join(cl.select(col("doc_id"), col("cluster_id")), Seq("doc_id"))
      .join(cl.select(col("doc_id").as("cluster_id"),
        col("cluster_id").as("label_of_label")), Seq("cluster_id"))
      .join(docs.select(col("doc_id"), col("text")), Seq("doc_id"), "left")
      .localCheckpoint(eager = true)

    // Transitive-closure lattice: labels are fixpoints, refine the 1-hop
    // assignment (never coarser), and never split a 1-hop class.
    val clFix = fused.agg(
      zsum(col("label_of_label") =!= col("cluster_id")).as("clusters_nonfixpoint"))
    // coarser + split share one two-level aggregation
    val clLattice = fused
      .groupBy("canonical_id")
      .agg(countDistinct(col("cluster_id")).as("nc"),
        zsum(col("cluster_id") > col("canonical_id")).as("coarser"))
      .agg(coalesce(sum(col("coarser")), lit(0L)).as("clusters_coarser_than_1hop"),
        zsum(col("nc") > 1).as("clusters_split_1hop_class"))

    // Exact-duplicate text groups (independently SQL-computable) must
    // collapse in both the 1-hop and the transitive tier: identical text
    // -> identical signature -> identical buckets -> same canonical.
    // Restricted on BOTH sides (engine + oracle) to shingleable texts
    // (>= 3 tokens): shorter duplicate texts band into private singleton
    // buckets and stay canonical = self BY DESIGN, so counting them would
    // fail the gate on correct behavior if such docs ever enter a corpus.
    val exStats = fused
      .where(col("text").isNotNull && size(split(col("text"), " ")) >= 3)
      .groupBy("text")
      .agg(count(lit(1)).as("c"),
        countDistinct(col("canonical_id")).as("km"),
        countDistinct(col("cluster_id")).as("kc"))
      .agg(
        zsum(col("c") > 1).as("exact_dup_groups"),
        zsum(col("km") > 1).as("exact_dup_split_minhash"),
        zsum(col("kc") > 1).as("exact_dup_split_clusters"))

    // one anti-join for all three tiers' membership checks instead of
    // three separate distinct+anti-join subtrees: tag each tier's
    // referenced ids, anti-join the union once, and re-pivot the surviving
    // tags to the three named counts (zeros preserved by the crossJoin
    // with the constant tag frame)
    val members = {
      val tagged = mh.select(col("canonical_id").as("doc_id"),
          lit("minhash_canonical_not_member").as("tag"))
        .unionByName(sh.select(col("canonical_id").as("doc_id"),
          lit("simhash_canonical_not_member").as("tag")))
        .unionByName(cl.select(col("cluster_id").as("doc_id"),
          lit("clusters_label_not_member").as("tag")))
        .distinct()
      val bad = tagged.join(ids, Seq("doc_id"), "left_anti")
        .groupBy("tag").agg(count(lit(1)).as("bad"))
      docsIn.sparkSession.range(1).selectExpr(
          """explode(array('minhash_canonical_not_member',
            |'simhash_canonical_not_member',
            |'clusters_label_not_member')) AS tag""".stripMargin.replace("\n", " "))
        .join(bad, Seq("tag"), "left")
        .select(col("tag").as("check_name"),
          coalesce(col("bad"), lit(0L)).as("value"))
    }

    val result = (Seq(nDocs,
        mhOverlap, shChunk, clFix, clLattice, exStats)
      .map(stackChecks) ++ Seq(tierChecks, members))
      .reduce(_ unionByName _)
      // materialize before dropping the caches the plan was built from
      .localCheckpoint(eager = true)
      .orderBy("check_name")
    docs.unpersist()
    result
  }

  // +7 = the planted hazard docs; +1 = the planted exact-dup group. The
  // planted docs are what make the zero-expectation rows non-vacuous: a
  // null/short-merge or exact-dup-split regression now flips a count ON
  // THE GRADED INPUT, not only in the fixture spec.
  private def dedupInvariantsSql: String =
    """WITH expected(check_name, value) AS (VALUES
      |  ('clusters_coarser_than_1hop', 0),
      |  ('clusters_distinct_docs', (SELECT COUNT(*) + 7 FROM documents)),
      |  ('clusters_isdup_wrong', 0),
      |  ('clusters_label_gt_doc', 0),
      |  ('clusters_label_not_member', 0),
      |  ('clusters_nonfixpoint', 0),
      |  ('clusters_rows', (SELECT COUNT(*) + 7 FROM documents)),
      |  ('clusters_split_1hop_class', 0),
      |  ('exact_dup_groups', (SELECT COUNT(*) + 1 FROM (SELECT text FROM documents WHERE text IS NOT NULL AND length(text) - length(replace(text, ' ', '')) + 1 >= 3 GROUP BY text HAVING COUNT(*) > 1) g)),
      |  ('exact_dup_split_clusters', 0),
      |  ('exact_dup_split_minhash', 0),
      |  ('minhash_canonical_gt_doc', 0),
      |  ('minhash_canonical_not_member', 0),
      |  ('minhash_distinct_docs', (SELECT COUNT(*) + 7 FROM documents)),
      |  ('minhash_isdup_wrong', 0),
      |  ('minhash_merged_no_shared_shingle', 0),
      |  ('minhash_rows', (SELECT COUNT(*) + 7 FROM documents)),
      |  ('minhash_short_or_null_merged', 0),
      |  ('n_docs', (SELECT COUNT(*) + 7 FROM documents)),
      |  ('simhash_canonical_gt_doc', 0),
      |  ('simhash_canonical_not_member', 0),
      |  ('simhash_distinct_docs', (SELECT COUNT(*) + 7 FROM documents)),
      |  ('simhash_merged_no_shared_chunk', 0),
      |  ('simhash_null_text_merged', 0),
      |  ('simhash_rows', (SELECT COUNT(*) + 7 FROM documents)))
      |SELECT check_name, CAST(value AS BIGINT) AS value
      |FROM expected ORDER BY check_name""".stripMargin

  /** Four hazard vectors the raw table lacks: an identical triple (must be
    * mutual candidates under ANY hyperplane family, verify at cosine = 1,
    * and share one canonical) and a null vector (must survive every guard
    * and stay canonical = self). Ids sit above [[PlantBase]] — never query
    * ids (queries are vec_id < 20) and never a real vector's canonical.
    */
  private def plantedVecs(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val a = Seq.tabulate(64)(i => math.sin(i + 1))
    Seq(
      (PlantBase + 1, Some(a)),
      (PlantBase + 2, Some(a)),
      (PlantBase + 3, Some(a)),
      (PlantBase + 4, Option.empty[Seq[Double]])
    ).toDF("vec_id", "v")
      .select(col("vec_id"), lit(0).as("label"), col("v"))
  }

  /** Invariants over [[SimilarityOps.embedNearDup]], [[SimilarityOps.lshTopK]]
    * and [[SimilarityOps.ivfTopK]] on the `embeddings` table plus the
    * planted hazard vectors (see [[plantedVecs]] — oracle expectations are
    * offset by the 4 planted rows / 3 identical pairs).
    */
  def embedInvariants(spark: SparkSession, dir: String): DataFrame =
    embedInvariants(SimilarityOps.vectors(spark, dir)
      .unionByName(plantedVecs(spark)))

  /** Frame-based core of [[embedInvariants]] over (vec_id, v) rows —
    * the fixture spec runs it on planted identical/null vectors.
    */
  def embedInvariants(vIn: DataFrame): DataFrame = {
    val v = vIn.cache()
    val ids = v.select(col("vec_id"))
    val queries = v.where(col("vec_id") < 20)
      .select(col("vec_id").as("q_id"), col("v").as("qv"))
    // forced eagerly for the same reason as q56's sh: three branches
    // (stats, the cosine re-verify, the identical-vector lattice) would
    // race the lazy cache and recompute the bucket self-join + verify pass
    val nd = SimilarityOps.embedNearDup(v, threshold = 0.95, sort = false).cache()
    nd.count()
    // sort = false: the gate only aggregates per-query shape, so the
    // graded q28/q47 global sorts would be wasted range exchanges here
    val lsh = SimilarityOps.lshTopK(v, queries, k = 5, sort = false)
    val ivf = SimilarityOps.ivfTopK(v, queries, k = 5, sort = false)

    val nVecs = v.agg(count(lit(1)).as("n_vecs"))

    val ndStats = nd.agg(
      count(lit(1)).as("neardup_rows"),
      countDistinct(col("vec_id")).as("neardup_distinct_vecs"),
      zsum(col("canonical_id") > col("vec_id")).as("neardup_canonical_gt_id"),
      zsum(col("is_dup") =!= (col("canonical_id") < col("vec_id")).cast("int"))
        .as("neardup_isdup_wrong"))

    // Every near-dup merge must re-verify under exact cosine: canonical(v)
    // is v's min verified neighbor, so cosine(v, canonical(v)) >= threshold
    // by construction — a below-threshold merged pair means the candidate
    // verification is broken.
    val ndPairs = nd.where(col("canonical_id") < col("vec_id"))
      .select(col("vec_id").as("a"), col("canonical_id").as("b"))
    val ndVerify = ndPairs
      .join(v.select(col("vec_id").as("a"), col("v").as("va")), Seq("a"), "left")
      .join(v.select(col("vec_id").as("b"), col("v").as("vb")), Seq("b"), "left")
      .agg(zsum(col("va").isNull || col("vb").isNull ||
          SimilarityOps.cosine("va", "vb") < 0.95)
        .as("neardup_merged_below_threshold"))

    // Identical (non-null) vectors have identical buckets in every table,
    // so they are always candidates, verify at cosine = 1, and end up with
    // the same canonical (their neighbor sets coincide) — under ANY
    // hyperplane family. Pair count is SQL-computable from the table.
    val vecGroups = v.where(col("v").isNotNull)
      .join(nd.select(col("vec_id"), col("canonical_id")), Seq("vec_id"))
      .groupBy(col("v"))
      .agg(count(lit(1)).as("c"), countDistinct(col("canonical_id")).as("k"))
    val identStats = vecGroups.agg(
      zsum(expr("c * (c - 1) div 2")).as("identical_vec_pairs"),
      zsum(col("k") > 1).as("identical_vec_split"))

    // ANN output shape: every query must return exactly k rows with dense
    // distinct ranks 1..k, k distinct neighbors, never itself.
    def okQueries(out: DataFrame, name: String): DataFrame =
      out.groupBy("q_id").agg(
          count(lit(1)).as("n"),
          countDistinct(col("vec_id")).as("nv"),
          countDistinct(col("rnk")).as("nr"),
          max(col("rnk")).as("mx"), min(col("rnk")).as("mn"),
          zsum(col("vec_id") === col("q_id")).as("selfs"))
        .where(col("n") === 5 && col("nv") === 5 && col("nr") === 5 &&
          col("mx") === 5 && col("mn") === 1 && col("selfs") === 0)
        .agg(count(lit(1)).as(name))

    val result = Seq(nVecs, ndStats, ndVerify, identStats,
        okQueries(lsh, "lsh_ok_queries"), okQueries(ivf, "ivf_ok_queries"),
        notMember(nd, "canonical_id", ids, "vec_id", "neardup_canonical_not_member"))
      .map(stackChecks)
      .reduce(_ unionByName _)
      .localCheckpoint(eager = true)
      .orderBy("check_name")
    v.unpersist(); nd.unpersist()
    result
  }

  // +4 = planted hazard vectors; +3 = the planted identical triple's pairs.
  /** Gate over [[DedupOps.incrementalAssign]] (delta dedup of a new batch
    * against an existing corpus). Batch split is doc_id % 10 == 7 (the
    * "new" side). Planted: one exact-duplicate pair straddling the split
    * (PlantBase+11 existing, PlantBase+17 new — corpus-disjoint tokens),
    * so the must-match path is exercised at grading time. Checks:
    *   - n_new / incr_rows: one output row per new-batch doc;
    *   - matched_not_existing: every matched_id is an existing doc (0);
    *   - exact_dup_missed: a new doc whose (>= 3-token) text equals an
    *     existing doc's text MUST be matched — identical text gives
    *     identical band keys (0);
    *   - unexplained_match: every matched pair shares a shingle (0);
    *   - null_or_short_matched: unbandable new docs stay unmatched (0).
    */
  def incrInvariants(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val dup = "zzqinc zzqalpha zzqbeta zzqgamma zzqdelta"
    val planted = Seq(
      (PlantBase + 11, Some(dup)), // % 10 == 1 -> existing side
      (PlantBase + 17, Some(dup))  // % 10 == 7 -> new side
    ).toDF("doc_id", "text")
    val docs = t(spark, dir, "documents").select(col("doc_id"), col("text"))
      .unionByName(planted)
      .cache()
    val existing = docs.where(col("doc_id") % 10 =!= 7)
    val newB = docs.where(col("doc_id") % 10 === 7)
    // eager: five check branches consume it in the one final action
    val out = DedupOps.incrementalAssign(existing, newB)
      .localCheckpoint(eager = true)

    val nNew = newB.agg(count(lit(1)).as("n_new"))
    val shortness = newB.select(col("doc_id"),
      (col("text").isNull || size(split(col("text"), " ")) < 3).as("is_short"))
    val outStats = out.join(shortness, "doc_id").agg(
      count(lit(1)).as("incr_rows"),
      countDistinct(col("doc_id")).as("incr_distinct_docs"),
      zsum(col("is_known_dup") =!= col("matched_id").isNotNull.cast("int"))
        .as("incr_flag_wrong"),
      zsum(col("is_short") && col("matched_id").isNotNull)
        .as("null_or_short_matched"))

    // exact cross-split dups must be matched (identical signature ⇒
    // identical band keys ⇒ bucket collision)
    val exactMissed = newB
      .where(col("text").isNotNull && size(split(col("text"), " ")) >= 3)
      .join(existing.select(col("text")).distinct(), Seq("text"), "left_semi")
      .join(out, Seq("doc_id"))
      .agg(zsum(col("matched_id").isNull).as("exact_dup_missed"))

    // every match must be explainable by a shared shingle (same argument
    // as q56's minhash_merged_no_shared_shingle)
    val pairs = out.where(col("matched_id").isNotNull)
      .select(col("doc_id").as("a"), col("matched_id").as("b"))
    val pairIds = pairs.select(col("a").as("doc_id"))
      .unionByName(pairs.select(col("b").as("doc_id"))).distinct()
    val shingleSets = DedupOps.shingles(docs.join(pairIds, Seq("doc_id"), "left_semi"))
    val overlap = pairs
      .join(shingleSets.select(col("doc_id").as("a"), col("shingles").as("sa")), Seq("a"), "left")
      .join(shingleSets.select(col("doc_id").as("b"), col("shingles").as("sb")), Seq("b"), "left")
      .agg(zsum(col("sa").isNull || col("sb").isNull ||
          size(array_intersect(col("sa"), col("sb"))) === 0)
        .as("unexplained_match"))

    val result = Seq(nNew, outStats, exactMissed, overlap,
        notMember(out.where(col("matched_id").isNotNull), "matched_id",
          existing.select(col("doc_id")), "doc_id", "matched_not_existing"))
      .map(stackChecks)
      .reduce(_ unionByName _)
      .localCheckpoint(eager = true)
      .orderBy("check_name")
    docs.unpersist()
    result
  }

  // +1 on the new-batch counts = the planted new-side doc.
  private def incrInvariantsSql: String =
    """WITH expected(check_name, value) AS (VALUES
      |  ('exact_dup_missed', 0),
      |  ('incr_distinct_docs', (SELECT COUNT(*) + 1 FROM documents WHERE doc_id % 10 = 7)),
      |  ('incr_flag_wrong', 0),
      |  ('incr_rows', (SELECT COUNT(*) + 1 FROM documents WHERE doc_id % 10 = 7)),
      |  ('matched_not_existing', 0),
      |  ('n_new', (SELECT COUNT(*) + 1 FROM documents WHERE doc_id % 10 = 7)),
      |  ('null_or_short_matched', 0),
      |  ('unexplained_match', 0))
      |SELECT check_name, CAST(value AS BIGINT) AS value
      |FROM expected ORDER BY check_name""".stripMargin

  private def embedInvariantsSql: String =
    """WITH expected(check_name, value) AS (VALUES
      |  ('identical_vec_pairs', (SELECT COALESCE(SUM((c * (c - 1)) // 2), 0) + 3
      |     FROM (SELECT COUNT(*) AS c FROM embeddings WHERE embedding IS NOT NULL GROUP BY embedding) g
      |     WHERE c > 1)),
      |  ('identical_vec_split', 0),
      |  ('ivf_ok_queries', (SELECT COUNT(*) FROM embeddings WHERE vec_id < 20)),
      |  ('lsh_ok_queries', (SELECT COUNT(*) FROM embeddings WHERE vec_id < 20)),
      |  ('n_vecs', (SELECT COUNT(*) + 4 FROM embeddings)),
      |  ('neardup_canonical_gt_id', 0),
      |  ('neardup_canonical_not_member', 0),
      |  ('neardup_distinct_vecs', (SELECT COUNT(*) + 4 FROM embeddings)),
      |  ('neardup_isdup_wrong', 0),
      |  ('neardup_merged_below_threshold', 0),
      |  ('neardup_rows', (SELECT COUNT(*) + 4 FROM embeddings)))
      |SELECT check_name, CAST(value AS BIGINT) AS value
      |FROM expected ORDER BY check_name""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q56_dedup_invariants", Some(dedupInvariantsSql),
      (spark, dir) => dedupInvariants(spark, dir)),

    QueryDef("q57_embed_invariants", Some(embedInvariantsSql),
      (spark, dir) => embedInvariants(spark, dir)),

    QueryDef("q73_incr_dedup", Some(incrInvariantsSql),
      (spark, dir) => incrInvariants(spark, dir)),

    // q41 grades the sketch's contract (bound + merge determinism); this
    // gate grades the exact count against plain SQL and bounds the
    // sketch's relative error in the oracle-checked output itself
    // — kept separate so the §2.6 A6 surface row and the invariant-gate
    // layer fail independently. The graded bound is derived from
    // the configured rsd (4x = a ~4-sigma envelope), not a hand-picked
    // constant: a 1-sigma bound is deterministic for the frozen corpus
    // (measured 0.4% at sf0.01) but could legitimately flip on a
    // regenerated corpus or new scale factor without any engine bug.
    QueryDef(
      "q58_approx_distinct_bound",
      Some("""SELECT COUNT(DISTINCT o_custkey) AS exact_customers,
        |  CAST(1 AS INT) AS approx_within_bound
        |FROM orders""".stripMargin),
      (spark, dir) => {
        val rsd = 0.02
        t(spark, dir, "orders")
          .agg(countDistinct(col("o_custkey")).as("exact_customers"),
            approx_count_distinct(col("o_custkey"), rsd).as("approx"))
          .select(col("exact_customers"),
            (abs(col("approx") - col("exact_customers")) <=
              lit(4 * rsd) * col("exact_customers")).cast("int").as("approx_within_bound"))
      }),

    // approx_percentile graded the q58 way: the exact quantiles come from
    // plain SQL (q49 proved percentile/quantile_cont interpolate
    // bit-identically), and the sketch is graded through its CONTRACT —
    // approx_percentile(acc) returns an input value whose rank is within
    // n/acc of the target rank. The engine recomputes the returned value's
    // actual rank with a second bounded pass and checks it against a 4x
    // slack of that bound, so the graded output carries the exact values
    // plus a bound flag that no correct sketch execution can flip.
    QueryDef(
      "q70_approx_quantile_bound",
      Some("""SELECT quantile_cont(o_totalprice, 0.5) AS exact_median,
        |  quantile_cont(o_totalprice, 0.99) AS exact_p99,
        |  CAST(1 AS INT) AS median_within_bound,
        |  CAST(1 AS INT) AS p99_within_bound
        |FROM orders""".stripMargin),
      (spark, dir) => {
        val acc = 1000L
        val o = t(spark, dir, "orders").select("o_totalprice")
        val stats = o.agg(
          expr("percentile(o_totalprice, 0.5)").as("exact_median"),
          expr("percentile(o_totalprice, 0.99)").as("exact_p99"),
          expr(s"approx_percentile(o_totalprice, 0.5, $acc)").as("am"),
          expr(s"approx_percentile(o_totalprice, 0.99, $acc)").as("ap"),
          count(lit(1)).as("n"))
        o.crossJoin(broadcast(stats))
          .agg(first(col("exact_median")).as("exact_median"),
            first(col("exact_p99")).as("exact_p99"),
            first(col("n")).as("n"),
            zsum(col("o_totalprice") <= col("am")).as("rank_m"),
            zsum(col("o_totalprice") <= col("ap")).as("rank_p"))
          .select(col("exact_median"), col("exact_p99"),
            (abs(col("rank_m") - lit(0.5) * col("n")) <=
              lit(4.0) * col("n") / acc).cast("int").as("median_within_bound"),
            (abs(col("rank_p") - lit(0.99) * col("n")) <=
              lit(4.0) * col("n") / acc).cast("int").as("p99_within_bound"))
      }),

    // q53 grades the sampler's contract + rerun determinism; this gate
    // grades the same shape CONTRACT in SQL (every stratum yields exactly
    // min(k, |stratum|) distinct members of that stratum with dense
    // ranks) over the single-run output, so the two fail independently.
    QueryDef(
      "q59_sample_invariants",
      Some("""SELECT lang AS stratum,
        |  CAST(LEAST(20, COUNT(*)) AS BIGINT) AS n_sampled,
        |  CAST(LEAST(20, COUNT(*)) AS BIGINT) AS max_rnk,
        |  CAST(LEAST(20, COUNT(*)) AS BIGINT) AS n_distinct_docs,
        |  CAST(0 AS BIGINT) AS bad_members
        |FROM documents GROUP BY lang ORDER BY stratum""".stripMargin),
      (spark, dir) => {
        val docs = t(spark, dir, "documents")
        SampleOps.balancedSample(docs, k = 20, strata = "lang")
          .join(docs.select(col("doc_id"), col("lang")), Seq("doc_id"))
          .groupBy("stratum")
          .agg(count(lit(1)).as("n_sampled"),
            max(col("rnk")).cast("long").as("max_rnk"),
            countDistinct(col("doc_id")).as("n_distinct_docs"),
            zsum(col("lang") =!= col("stratum")).as("bad_members"))
          .orderBy("stratum")
      }))
}
