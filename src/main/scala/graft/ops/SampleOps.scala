package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.QueryDef
import graft.util.Tables._

/** Deterministic, reproducible sampling for training-data curation
  * (SURVEY §7.4): balanced per-stratum quotas selected by hash order, so
  * the same corpus always yields the same sample regardless of
  * partitioning, and re-runs over a grown corpus keep previously-selected
  * docs stable except where new docs hash earlier.
  */
object SampleOps {

  private val Buckets = 1000000L

  private def bucket(c: Column): Column = pmod(xxhash64(c), lit(Buckets))

  /** First-k-by-hash per stratum, two-phase so it survives 100 TB:
    *
    * A naive `row_number() OVER (PARTITION BY stratum ORDER BY hash)` sorts
    * every row of every stratum through one reducer per stratum — a
    * scale-killer when strata are few and huge. Instead:
    *
    *   1. count each stratum (partial-agg'd) and broadcast a per-stratum
    *      hash-bucket cutoff that keeps ~8k of the n_total rows
    *      (`cut = Buckets * 8k / n`, capped at all buckets);
    *   2. filter to surviving rows (scan-speed, no shuffle of the corpus)
    *      and run the exact top-k window over just those ~8k rows.
    *
    * Because the window orders by the same (bucket, doc_id) key the cutoff
    * filters on, the k smallest keys of each stratum all survive phase 2
    * whenever at least k rows do — so the two-phase result is identical to
    * the naive global window. With an 8x oversample the per-stratum
    * survivor count is Poisson-concentrated around 8k; shortfall odds at
    * k = 20 are ~e^-100. Strata smaller than 8k rows keep every row and
    * degrade gracefully to "all of it, exactly ordered".
    */
  def balancedSample(docs: DataFrame, k: Int, strata: String): DataFrame = {
    val withB = docs.select(col(strata).as("stratum"), col("doc_id"))
      .withColumn("b", bucket(col("doc_id")))
    val cuts = withB.groupBy("stratum").agg(count(lit(1)).as("n_total"))
      .withColumn("cut",
        least(lit(Buckets), lit(Buckets) * lit(8L * k) / col("n_total") + 1))
      .select("stratum", "cut")
    val survivors = withB
      .join(broadcast(cuts), Seq("stratum"))
      .where(col("b") < col("cut"))
    val w = Window.partitionBy("stratum").orderBy(col("b"), col("doc_id"))
    survivors.withColumn("rnk", row_number().over(w))
      .where(col("rnk") <= k)
      .select(col("stratum"), col("rnk"), col("doc_id"))
      .orderBy("stratum", "rnk")
  }

  /** Sequence packing (context-window assembly): assign each doc to the
    * pack whose running token total its START offset falls in —
    * `pack_id = floor(tokens_before_doc / cap)` per language, docs taken
    * in doc_id order. The greedy contiguous fill every training-data
    * pipeline runs before writing examples.
    *
    * Scale shape: the global running sum is NOT one window sort per
    * language (one reducer per stratum — the q53 scale-killer). It is a
    * distributed prefix sum: (1) coarse doc_id ranges are partially
    * aggregated to per-(lang, bucket) token sums; (2) a window over the
    * tiny bucket-level frame produces each bucket's starting offset;
    * (3) the within-bucket running sum runs in parallel across buckets
    * and adds the broadcast offset. Because addition is associative the
    * result is exactly the single global window's (VocabSampleSpec pins
    * two-phase == naive), but no reducer ever sorts more than one
    * bucket's rows. `bucketWidth` sizes the bucket frame: pick it so
    * corpus/bucketWidth rows broadcast comfortably.
    */
  def sequencePack(docs: DataFrame, cap: Long, bucketWidth: Long = 100L): DataFrame = {
    // token count via the same length arithmetic the oracle uses
    val nt = expr("CAST(length(text) - length(replace(text, ' ', '')) + 1 AS BIGINT)")
    val base = docs.where(col("text").isNotNull)
      .select(col("doc_id"), col("lang"), nt.as("n_tokens"),
        expr(s"doc_id div ${bucketWidth}L").as("bucket"))
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

  /** Deterministic train/val/test split as a pure function of doc_id
    * (first hex digit of md5): membership never changes when the corpus
    * grows, is repartitioned, or is re-run — the leakage-proof way to
    * split at any scale, and md5 hex is identical across engines so the
    * oracle is plain SQL. 12/16 train, 2/16 val, 2/16 test.
    */
  def hashSplit(docs: DataFrame): DataFrame = {
    val h = substring(md5(col("doc_id").cast("string")), 1, 1)
    docs.select(col("doc_id"), col("lang"),
        when(h <= "b", "train").when(h <= "d", "val").otherwise("test").as("split"))
      .groupBy("split", "lang")
      .agg(count(lit(1)).as("n_docs"), sum(col("doc_id")).as("id_sum"))
      .orderBy("split", "lang")
  }

  /** Cluster-aware train/val/test split — the leakage-correct refinement
    * of [[hashSplit]]: when the corpus contains duplicate or
    * trivially-variant documents, splitting by doc_id hash puts copies of
    * the SAME content on both sides of the train/eval fence (the classic
    * eval-contamination bug), so the split key must be the DUP-CLUSTER
    * key, not the doc. Here the cluster key is the normalized text (the
    * q113 canonicalize transform — catches exact and case/punct/spacing
    * dups, and is engine-recomputable so this stays a FULL SQL oracle);
    * for NEAR-dup awareness swap in minhashClusters' cluster id as the
    * key — same split arithmetic, spec-pinned (SampleSpec) since minhash
    * is engine-side. Split = first two md5 hex chars of the salted
    * cluster key: 'cd'/256ths ~ 80% train, 26/256 ~ 10% val, rest test;
    * every member of a cluster lands in the same split BY CONSTRUCTION
    * (the split is a pure function of the cluster key).
    *
    * Scale shape: row-local key + hash arithmetic, one shuffle for the
    * per-split aggregate; nothing iterative. Planted variant clusters
    * (the q113 fixture) make the copies-stay-together property
    * non-vacuous: a doc-keyed split scatters them (SampleSpec proves the
    * planted cluster straddles under [[hashSplit]]'s key but not here),
    * and here they move per-split counts the oracle recomputes exactly.
    */
  /** 80/10/10 split as a pure function of an arbitrary cluster key —
    * byte thresholds on the first two salted-md5 hex chars. Shared by
    * [[clusterAwareSplit]] and the minhash-cluster variant in SampleSpec.
    */
  def splitOf(key: Column): Column = {
    val h = substring(md5(concat(lit("graft-split:"), key)), 1, 2)
    when(h < "cd", "train").when(h < "e7", "val").otherwise("test")
  }

  /** Per-doc (doc_id, ckey, split) assignment — the q119 body before its
    * per-split aggregate, factored out so SampleSpec pins the
    * copies-stay-together semantics on the exact graded logic.
    */
  def clusterSplitAssign(docs: DataFrame): DataFrame = {
    val ckey = trim(regexp_replace(
      regexp_replace(lower(col("text")), "[^a-z0-9 ]", ""), " +", " "))
    docs.where(col("text").isNotNull)
      .select(col("doc_id"), ckey.as("ckey"))
      .withColumn("split", splitOf(col("ckey")))
  }

  def clusterAwareSplit(docs: DataFrame): DataFrame =
    clusterSplitAssign(docs)
      .groupBy("split")
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("ckey")).as("n_clusters"),
        sum(col("doc_id")).as("id_sum"))
      .orderBy("split")

  /** Weighted sampling WITHOUT replacement (per-stratum top-k by weight):
    * the quality-weighted subset selection step — "keep the k best-ish
    * docs per language, where better-scored docs win proportionally
    * more often" — via the exponential race: doc i draws
    * e_i = -ln(u_i) / w_i ~ Exp(w_i) with u_i a pure hash function of
    * doc_id, and the k SMALLEST e_i win. This is the classic
    * weighted-reservoir formulation, deterministic here (seeded by
    * doc_id), so re-runs and repartitionings select the same docs.
    *
    * Scale shape (the q53 two-phase trick adapted to weights): a naive
    * per-stratum window sorts every row through one reducer per stratum.
    * Instead phase 1 broadcasts a per-stratum cutoff t = 16k / W
    * (W = stratum weight sum): expected survivors = sum(1 - e^(-w_i t))
    * <= t * W = 16k regardless of the weight distribution, and the k-th
    * smallest e beats t with overwhelming probability when no single
    * weight dominates (for max w_i / W <= 1/(32k) the survivor count
    * concentrates at ~16k; the k-th arrival of the superposed race is
    * Gamma-concentrated near k/W << t). Phase 2 runs the exact window
    * over the ~16k survivors. The precondition is ENFORCED, not assumed:
    * the cuts frame also aggregates max(w), and a stratum of <= 8k rows
    * OR with a dominant weight (max w_i / W > 1/(32k)) skips the cutoff
    * and runs the exact window over everything — so no weight
    * distribution can under-fill phase 2. The q102 contract oracle
    * additionally fails loudly if any stratum ever yields fewer than
    * min(k, n) rows.
    */
  def weightedSample(docs: DataFrame, k: Int, strata: String,
      weight: Column): DataFrame = {
    val M = 1L << 40
    val u = (pmod(xxhash64(col("doc_id")), lit(M)).cast("double") + 0.5) / M
    val keyed = docs
      .select(col(strata).as("stratum"), col("doc_id"), weight.cast("double").as("w"))
      .where(col("w") > 0)
      .withColumn("e", -log(u) / col("w"))
    // the cutoff's concentration argument needs max w_i / W <= 1/(32k);
    // rather than trusting callers to check it, the cuts frame aggregates
    // max(w) too and any stratum violating the precondition (one dominant
    // weight) routes to the exact-window path, same as small strata —
    // the guard costs one extra agg column on an already-tiny frame
    val cuts = keyed.groupBy("stratum")
      .agg(count(lit(1)).as("n"), sum(col("w")).as("tw"), max(col("w")).as("mw"))
      .withColumn("cut",
        when(col("n") <= 8L * k || col("mw") * lit(32.0 * k) > col("tw"),
          lit(Double.MaxValue))
          .otherwise(lit(16.0 * k) / col("tw")))
      .select("stratum", "cut")
    val survivors = keyed.join(broadcast(cuts), Seq("stratum"))
      .where(col("e") <= col("cut"))
    val w = Window.partitionBy("stratum").orderBy(col("e"), col("doc_id"))
    survivors.withColumn("rnk", row_number().over(w))
      .where(col("rnk") <= k)
      .select(col("stratum"), col("rnk"), col("doc_id"))
      .orderBy("stratum", "rnk")
  }

  /** Global training-order enumeration (distributed zipWithIndex): every
    * doc gets a dense 1..n position in a deterministic shuffled order
    * (md5 of the id — engine-independent, so the oracle is plain SQL).
    *
    * A naive `row_number() OVER (ORDER BY md5)` funnels the corpus
    * through ONE reducer. Instead the md5's first two hex digits shard
    * the order into 256 ranges: per-shard row_numbers run in parallel,
    * a 256-row offset frame (cumulative shard counts) broadcasts back,
    * and position = shard offset + within-shard rank. Because the shard
    * key is a PREFIX of the sort key, (shard, h, id) order equals
    * (h, id) order — the result is exactly the single global window's,
    * but no reducer ever sorts more than ~1/256 of the corpus.
    */
  def globalIndex(docs: DataFrame): DataFrame = {
    val keyed = docs.select(col("doc_id"),
        md5(col("doc_id").cast("string")).as("h"))
      .withColumn("shard", substring(col("h"), 1, 2))
    val offsets = keyed.groupBy("shard").agg(count(lit(1)).as("cnt"))
      .withColumn("off", coalesce(sum(col("cnt")).over(
        Window.orderBy("shard").rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
      .select("shard", "off")
    val wIn = Window.partitionBy("shard").orderBy("h", "doc_id")
    keyed.join(broadcast(offsets), Seq("shard"))
      .withColumn("global_idx", col("off") + row_number().over(wIn))
      .select(col("doc_id"), col("global_idx"))
      .orderBy("doc_id")
  }

  /** Multi-epoch training shuffle (q196): epoch e's order is the affine
    * permutation pos = ((i−1)·A + e·B) mod n over the q92 global index —
    * a full reshuffle per epoch WITHOUT re-sorting the corpus (the
    * classic LCG-permutation trick): computing any epoch's order is
    * row-local arithmetic over the one index the corpus was enumerated
    * with once. A = 1000003 (prime — a bijection whenever A ∤ n, i.e.
    * always while n < A; a trillion-doc corpus picks the next prime
    * above n from a fixed ladder, same arithmetic), B = 7919 offsets
    * epochs from each other. The graded output pins each epoch's first
    * k positions — fetched with the bounded top-k AGGREGATE on the
    * negated position (map-side k-trim, q187's plan), never an
    * epoch-partitioned window (3 partitions would each sort the whole
    * corpus) — plus the Σpos = n(n−1)/2 bijection witness.
    */
  def epochShuffle(docs: DataFrame, epochs: Int = 3, k: Int = 5): DataFrame = {
    require(epochs > 0 && k > 0, s"epochs/k must be positive: $epochs/$k")
    val idx = globalIndex(docs)
    val nRow = idx.agg(count(lit(1)).as("n"))
    val eps = docs.sparkSession.range(epochs)
      .select(col("id").cast("int").as("epoch"))
    val p = idx.crossJoin(broadcast(nRow)).crossJoin(broadcast(eps))
      .withColumn("pos",
        expr("((global_idx - 1) * 1000003L + epoch * 7919L) % n"))
    val topk = graft.functions.TopKAggregate.topK(k)
    p.groupBy("epoch")
      .agg(max(col("n")).as("n_docs"),
        sum(col("pos")).as("sum_pos"),
        topk(-col("pos"), col("doc_id")).as("top"))
      .select(col("epoch"),
        posexplode(arrays_zip(col("top.values"), col("top.ids"))),
        col("n_docs"), col("sum_pos"))
      .select(col("epoch"), (col("pos") + 1).cast("int").as("rnk"),
        (-col("col.values")).as("pos"), col("col.ids").as("doc_id"),
        col("n_docs"),
        expr("CAST(sum_pos = (n_docs * (n_docs - 1)) div 2 AS INT)")
          .as("perm_ok"))
      .orderBy("epoch", "rnk")
  }

  private val epochShuffleOracle: String =
    """WITH idx AS (SELECT doc_id,
      |    row_number() OVER (ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id)
      |      - 1 AS i,
      |    COUNT(*) OVER () AS n
      |  FROM documents),
      |e(epoch) AS (VALUES (0), (1), (2)),
      |p AS (SELECT epoch, doc_id, (i * 1000003 + epoch * 7919) % n AS pos, n
      |      FROM idx, e),
      |r AS (SELECT epoch, doc_id, pos, n,
      |    ROW_NUMBER() OVER (PARTITION BY epoch ORDER BY pos) AS rnk,
      |    SUM(pos) OVER (PARTITION BY epoch) AS sum_pos
      |  FROM p)
      |SELECT epoch, CAST(rnk AS INT) AS rnk, pos, doc_id,
      |  CAST(n AS BIGINT) AS n_docs,
      |  CAST(CASE WHEN sum_pos = n * (n - 1) // 2 THEN 1 ELSE 0 END AS INT)
      |    AS perm_ok
      |FROM r WHERE rnk <= 5 ORDER BY epoch, rnk""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    // q239: deterministic negative sampling for contrastive training —
    // k pseudo-random partners per anchor document via the Knuth
    // multiplicative ring hash (q67's SQL-replayable family: pure
    // integer arithmetic, so the pairing is identical under any
    // partitioning, engine, or replay — a training run can regenerate
    // its exact negatives from doc ids alone). Row-local arithmetic +
    // a bounded k-way explode at scan speed; accidental self-pairs are
    // filtered (slot kept, so consumers see WHICH slot collapsed); the
    // partner's language joins on for hard/easy-negative accounting.
    QueryDef(
      "q239_negative_pairs",
      // the multiply runs in HUGEINT/DECIMAL(38,0): in int64 the Knuth
      // product wraps past doc_id ~3.47e9 — Spark silently, DuckDB with
      // an error — exactly where the replay-anywhere guarantee is
      // supposed to hold. A hashed partner id landing in a doc_id GAP
      // (sparse id spaces after deletes) keeps its row with a NULL
      // neg_lang, so consumers can always see which slots lack a live
      // partner (only self-pairs drop).
      Some("""WITH ring AS (SELECT MAX(doc_id) + 1 AS m FROM documents),
        |pairs AS (
        |  SELECT doc_id, CAST(i AS INT) AS slot,
        |    CAST((CAST(doc_id + 1 AS HUGEINT) * 2654435761 + i * 40503) % m
        |      AS BIGINT) AS neg_id
        |  FROM documents, ring, UNNEST(range(0, 4)) t(i))
        |SELECT p.doc_id, p.slot, p.neg_id, d.lang AS neg_lang
        |FROM pairs p LEFT JOIN documents d ON d.doc_id = p.neg_id
        |WHERE p.neg_id <> p.doc_id
        |ORDER BY p.doc_id, p.slot""".stripMargin),
      (spark, dir) => {
        val docs = t(spark, dir, "documents")
        val ring = docs.agg((max(col("doc_id")) + 1).as("m"))
        val pairs = docs.select(col("doc_id")).crossJoin(broadcast(ring))
          .select(col("doc_id"), posexplode(expr(
            "transform(sequence(0, 3), " +
              "i -> CAST((CAST(doc_id + 1 AS DECIMAL(38,0)) * 2654435761" +
              " + i * 40503) % m AS BIGINT))"))
            .as(Seq("slot", "neg_id")))
          .where(col("neg_id") =!= col("doc_id"))
        pairs.join(broadcast(docs.select(col("doc_id").as("neg_id"),
            col("lang").as("neg_lang"))), Seq("neg_id"), "left_outer")
          .select(col("doc_id"), col("slot"), col("neg_id"), col("neg_lang"))
          .orderBy("doc_id", "slot")
      }),

    QueryDef("q196_epoch_shuffle", Some(epochShuffleOracle),
      (spark, dir) => epochShuffle(t(spark, dir, "documents"))),

    // Oracle = the naive single-window global order; the engine runs the
    // sharded two-phase form (provably identical — shard is a prefix of
    // the sort key).
    QueryDef(
      "q92_global_index",
      Some("""SELECT doc_id,
        |  CAST(row_number() OVER (ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS BIGINT)
        |    AS global_idx
        |FROM documents ORDER BY doc_id""".stripMargin),
      (spark, dir) => globalIndex(t(spark, dir, "documents"))),

    // Balanced corpus construction: k docs per language, hash-ordered.
    // xxhash64 is engine-side, so the oracle grades the CONTRACT the
    // retired golden used to freeze: exact per-stratum counts, dense
    // ranks, stratum-pure membership, and — the property the frozen
    // output really pinned — DETERMINISM: re-running the sampler on a
    // differently-partitioned copy of the corpus selects the identical
    // (doc, rank) set, graded as a zero mismatch count over a full outer
    // join of the two runs. VocabSampleSpec additionally proves the
    // two-phase plan equals the naive global window.
    QueryDef(
      "q53_balanced_sample",
      Some("""SELECT lang AS stratum,
        |  CAST(LEAST(20, COUNT(*)) AS BIGINT) AS n_sampled,
        |  CAST(LEAST(20, COUNT(*)) AS BIGINT) AS max_rnk,
        |  CAST(LEAST(20, COUNT(*)) AS BIGINT) AS n_distinct_docs,
        |  CAST(0 AS BIGINT) AS bad_members,
        |  CAST(0 AS BIGINT) AS rerun_mismatch
        |FROM documents GROUP BY lang ORDER BY stratum""".stripMargin),
      (spark, dir) => {
        val docs = t(spark, dir, "documents")
        val a = balancedSample(docs, k = 20, strata = "lang")
        val b = balancedSample(docs.repartition(7, col("doc_id")),
            k = 20, strata = "lang")
          .withColumnRenamed("rnk", "rnk_b")
        a.join(b, Seq("stratum", "doc_id"), "full_outer")
          .join(docs.select(col("doc_id"), col("lang")), Seq("doc_id"), "left")
          .groupBy("stratum")
          .agg(
            coalesce(sum(col("rnk").isNotNull.cast("long")), lit(0L)).as("n_sampled"),
            max(col("rnk")).cast("long").as("max_rnk"),
            countDistinct(when(col("rnk").isNotNull, col("doc_id"))).as("n_distinct_docs"),
            coalesce(sum((col("lang") =!= col("stratum")).cast("long")), lit(0L))
              .as("bad_members"),
            coalesce(sum((coalesce(col("rnk"), lit(-1)) =!=
              coalesce(col("rnk_b"), lit(-2))).cast("long")), lit(0L))
              .as("rerun_mismatch"))
          .orderBy("stratum")
      }),

    // Oracle = the naive single-window prefix sum; the engine runs the
    // distributed two-phase form (provably identical, see sequencePack).
    QueryDef(
      "q63_sequence_pack",
      Some("""WITH d AS (SELECT doc_id, lang,
        |    CAST(length(text) - length(replace(text, ' ', '')) + 1 AS BIGINT) AS n_tokens
        |  FROM documents WHERE text IS NOT NULL)
        |SELECT doc_id, lang, n_tokens,
        |  CAST((SUM(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens) // 4096 AS BIGINT) AS pack_id
        |FROM d ORDER BY doc_id""".stripMargin),
      (spark, dir) => sequencePack(t(spark, dir, "documents"), cap = 4096L)),

    // The weighted analogue of q59: hash/ln values are engine-side, so
    // the oracle grades the CONTRACT — every stratum yields exactly
    // min(k, |stratum|) distinct members of that stratum with dense
    // ranks (weighted selection bias is pinned by VocabSampleSpec's
    // planted heavy-weight fixture and naive-window equivalence).
    QueryDef(
      "q102_weighted_sample",
      Some("""SELECT lang AS stratum,
        |  CAST(LEAST(20, COUNT(*)) AS BIGINT) AS n_sampled,
        |  CAST(LEAST(20, COUNT(*)) AS BIGINT) AS max_rnk,
        |  CAST(LEAST(20, COUNT(*)) AS BIGINT) AS n_distinct_docs,
        |  CAST(0 AS BIGINT) AS bad_members
        |FROM documents WHERE n_chars > 0 GROUP BY lang ORDER BY stratum""".stripMargin),
      (spark, dir) => {
        val docs = t(spark, dir, "documents")
        weightedSample(docs, k = 20, strata = "lang", weight = col("n_chars"))
          .join(docs.select(col("doc_id"), col("lang")), Seq("doc_id"))
          .groupBy("stratum")
          .agg(count(lit(1)).as("n_sampled"),
            max(col("rnk")).cast("long").as("max_rnk"),
            countDistinct(col("doc_id")).as("n_distinct_docs"),
            coalesce(sum((col("lang") =!= col("stratum")).cast("long")), lit(0L))
              .as("bad_members"))
          .orderBy("stratum")
      }),

    QueryDef(
      "q64_hash_split",
      Some("""SELECT split, lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(doc_id) AS BIGINT) AS id_sum
        |FROM (SELECT doc_id, lang, CASE
        |    WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) <= 'b' THEN 'train'
        |    WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) <= 'd' THEN 'val'
        |    ELSE 'test' END AS split
        |  FROM documents)
        |GROUP BY split, lang ORDER BY split, lang""".stripMargin),
      (spark, dir) => hashSplit(t(spark, dir, "documents"))),

    QueryDef(
      "q119_cluster_split",
      Some("""WITH all_docs(doc_id, text) AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  VALUES (2000000000031, 'The quick brown fox jumps over the lazy dog'),
        |         (2000000000032, 'The QUICK, brown fox... jumps over the LAZY dog!!'),
        |         (2000000000033, 'the   quick brown fox jumps over the lazy dog'),
        |         (2000000000034, 'Deduplicate the corpus before training'),
        |         (2000000000035, 'DEDUPLICATE the corpus, before training?!'),
        |         (2000000000036, 'An unpaired document stands alone.')),
        |k AS (SELECT doc_id,
        |        trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'),
        |          ' +', ' ', 'g')) AS ckey
        |      FROM all_docs WHERE text IS NOT NULL),
        |s AS (SELECT doc_id, ckey, CASE
        |        WHEN substr(md5('graft-split:' || ckey), 1, 2) < 'cd' THEN 'train'
        |        WHEN substr(md5('graft-split:' || ckey), 1, 2) < 'e7' THEN 'val'
        |        ELSE 'test' END AS split
        |      FROM k)
        |SELECT split, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(COUNT(DISTINCT ckey) AS BIGINT) AS n_clusters,
        |  CAST(SUM(doc_id) AS BIGINT) AS id_sum
        |FROM s GROUP BY split ORDER BY split""".stripMargin),
      (spark, dir) => clusterAwareSplit(t(spark, dir, "documents")
        .select(col("doc_id"), col("text"))
        .unionByName(CurationOps.variantDocs(spark)))))
}
