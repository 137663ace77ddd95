package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.QueryDef
import graft.util.Tables._

/** Entity resolution / record linkage (SURVEY §7.4 extension tier): the
  * "match a dirty registry against the master table" primitive every
  * large-scale ingest runs when a feed arrives without stable keys. The
  * reference pipeline joins on exact keys only (02:44-58); this tier adds
  * the approximate-key path: candidate generation by BLOCKING (never
  * all-pairs), a bounded edit-distance verifier, and a deterministic
  * best-match resolution — the same candidates-then-verify doctrine as
  * the MinHash/prefix-filter dedup family (DedupOps), applied to entity
  * keys instead of documents.
  *
  * Scale shape: the only wire cost is one hash shuffle of each side on
  * the block key. Blocking here is on the name SUFFIX (last 6 id
  * digits) — for id-like strings the suffix is the high-entropy end, so
  * blocks stay near-singleton until the key space exceeds 1e6 and grow
  * only as |keys|/1e6 after that; per-block pair fan-out is bounded with
  * no quadratic blow-up. The best-match window partitions by registry id
  * (one more bounded shuffle); levenshtein is row-local codegen. The
  * audit's final left join keyed on r_id counts the registry rows whose
  * typo broke the block key — the recall hole a blocking design review
  * has to surface, not hide.
  */
object LinkageOps {

  /** One-digit substitution at `back` positions from the END of the
    * master name (digit d → (d + 7) mod 10, always a real change).
    * End-relative arithmetic, not literal positions: names grow with
    * the key space (10+ digit custkeys at the 100 TB tier), and a
    * hard-coded offset would silently truncate the tail and break every
    * planted tier's advertised edit distance.
    */
  private def sub(name: org.apache.spark.sql.Column, back: Int) = {
    val pos = length(name) - back
    concat(
      substring(name, lit(1), pos - 1),
      ((substring(name, pos, lit(1)).cast("int") + 7) % 10).cast("string"),
      substring(name, pos + 1, length(name)))
  }

  private def substring(c: org.apache.spark.sql.Column,
      pos: org.apache.spark.sql.Column,
      len: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    c.substr(pos, len)

  /** Deterministic "dirty registry" derived from the master: custkeys
    * ≢ 2 (mod 3) enter with r_id in a disjoint 9e6 space (so match
    * correctness is checkable), and a typo tier keyed on custkey mod 9:
    * 0/3 exact; 1/6 one leading-digit typo (dist 1); 4 two leading-digit
    * typos (dist 2); 7 a LAST-digit typo that breaks the suffix block
    * key — deliberately unmatched, to grade the audit's recall column.
    */
  def dirtyRegistry(customer: DataFrame): DataFrame = {
    val name = col("c_name")
    val m = col("c_custkey") % 9
    customer
      .where(col("c_custkey") % 3 =!= 2)
      .select(
        (col("c_custkey") + 9000000L).as("r_id"),
        when(m === 1 || m === 6, sub(name, back = 7))
          .when(m === 4, sub(sub(name, back = 7), back = 6))
          .when(m === 7,
            concat(name.substr(lit(1), length(name) - 1), lit("X")))
          .otherwise(name).as("r_name"))
  }

  /** Last-6-char suffix block key (end-relative, so it tracks the name
    * length as the key space grows).
    */
  private def blockKey(name: org.apache.spark.sql.Column) =
    name.substr(length(name) - 5, lit(6))

  /** q261 body: block on the 6-char name suffix (stable under the
    * planted leading-digit typos), verify candidates with
    * levenshtein ≤ 2, resolve each registry row to its best master by
    * (min distance, min custkey) — a total order, so the pick is
    * engine-deterministic even if a typo collides with another master.
    * Output is the per-distance match audit (dist -1 = unmatched): how
    * many registry rows resolved at each edit distance and how many
    * resolved to their true parent.
    */
  def recordLinkage(customer: DataFrame): DataFrame = {
    val master = customer.select(col("c_custkey"), col("c_name"),
      blockKey(col("c_name")).as("blk"))
    val registry = dirtyRegistry(customer)
      .withColumn("blk", blockKey(col("r_name")))
    val candidates = master.join(registry, "blk")
      .withColumn("dist", levenshtein(col("c_name"), col("r_name")))
      .where(col("dist") <= 2)
    val best = Window.partitionBy(col("r_id"))
      .orderBy(col("dist").asc, col("c_custkey").asc)
    val resolved = candidates
      .withColumn("rnk", row_number().over(best))
      .where(col("rnk") === 1)
      .select(col("r_id").as("m_rid"), col("c_custkey"), col("dist"))
    dirtyRegistry(customer)
      .join(resolved, col("r_id") === col("m_rid"), "left")
      .groupBy(coalesce(col("dist").cast("long"), lit(-1L)).as("dist"))
      .agg(
        count(lit(1)).as("n_rows"),
        sum(when(col("c_custkey") === col("r_id") - 9000000L, 1L)
          .otherwise(0L)).as("n_correct"))
      .orderBy(col("dist"))
  }

  private val registrySql: String =
    """registry AS (
      |  SELECT c_custkey + 9000000 AS r_id,
      |    CASE
      |      WHEN c_custkey % 9 IN (1, 6) THEN
      |        substr(c_name, 1, length(c_name) - 8) ||
      |        CAST((CAST(substr(c_name, length(c_name) - 7, 1) AS INTEGER)
      |          + 7) % 10 AS VARCHAR) ||
      |        substr(c_name, length(c_name) - 6, 7)
      |      WHEN c_custkey % 9 = 4 THEN
      |        substr(c_name, 1, length(c_name) - 8) ||
      |        CAST((CAST(substr(c_name, length(c_name) - 7, 1) AS INTEGER)
      |          + 7) % 10 AS VARCHAR) ||
      |        CAST((CAST(substr(c_name, length(c_name) - 6, 1) AS INTEGER)
      |          + 7) % 10 AS VARCHAR) ||
      |        substr(c_name, length(c_name) - 5, 6)
      |      WHEN c_custkey % 9 = 7 THEN
      |        substr(c_name, 1, length(c_name) - 1) || 'X'
      |      ELSE c_name END AS r_name
      |  FROM customer WHERE c_custkey % 3 <> 2)""".stripMargin

  private val linkageSql: String =
    s"""WITH $registrySql,
      |candidates AS (
      |  SELECT m.c_custkey, r.r_id,
      |    levenshtein(m.c_name, r.r_name) AS dist
      |  FROM customer m
      |  JOIN registry r
      |    ON substr(m.c_name, length(m.c_name) - 5, 6)
      |     = substr(r.r_name, length(r.r_name) - 5, 6)
      |  WHERE levenshtein(m.c_name, r.r_name) <= 2),
      |resolved AS (
      |  SELECT c_custkey, r_id, dist FROM (
      |    SELECT *, ROW_NUMBER() OVER (PARTITION BY r_id
      |        ORDER BY dist ASC, c_custkey ASC) AS rnk
      |    FROM candidates)
      |  WHERE rnk = 1)
      |SELECT COALESCE(CAST(s.dist AS BIGINT), -1) AS dist,
      |  CAST(COUNT(*) AS BIGINT) AS n_rows,
      |  CAST(COALESCE(SUM(CASE WHEN s.c_custkey = g.r_id - 9000000
      |    THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_correct
      |FROM registry g LEFT JOIN resolved s ON g.r_id = s.r_id
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** Deterministic secondary feed for the survivorship merge: every even
    * custkey arrives from a second system with (a) a drifted balance,
    * corrupted outright for keys ≡ 0 mod 11 (the validity rule's prey),
    * (b) a lowercased segment (a normalization conflict to audit), (c) a
    * phone number the master lacks entirely (the completeness rule's
    * win), absent for keys ≡ 2 mod 8, and (d) a recency flag (keys ≡ 0
    * mod 3 are newer than the master).
    */
  def secondaryFeed(customer: DataFrame): DataFrame =
    customer.where(col("c_custkey") % 2 === 0)
      .select(
        col("c_custkey").as("f_custkey"),
        when(col("c_custkey") % 11 === 0, lit(-999999.0d))
          .otherwise(col("c_acctbal") + (col("c_custkey") % 7 - 3))
          .as("f_acctbal"),
        when(col("c_custkey") % 5 === 0, lit(null).cast("string"))
          .otherwise(lower(col("c_mktsegment"))).as("f_mktsegment"),
        when(col("c_custkey") % 8 === 2, lit(null).cast("string"))
          .otherwise(concat(lit("P-"), col("c_custkey"))).as("f_phone"),
        (col("c_custkey") % 3 === 0).as("f_newer"))

  /** q268 body: golden-record construction — the survivorship step an
    * MDM pipeline runs after matching (q261): one row per entity,
    * fields merged across sources by explicit, auditable rules.
    * Balance: RECENCY wins (the newer feed value) unless it fails the
    * VALIDITY gate (the corrupt sentinel), in which case the master
    * survives; provenance says which source won. Phone: COMPLETENESS —
    * the master has none, so any feed phone enriches. Segment: the
    * master is canonical; a differing non-null feed value is not taken
    * but IS counted (`seg_conflict`) — the drift signal a stewardship
    * queue consumes. Pure per-key merge: one equi-join on the entity
    * key, scan-speed rules, no windows; at 100 TB this is one
    * co-partitioned join keyed on the golden id.
    */
  def goldenRecords(customer: DataFrame): DataFrame =
    customer
      .join(secondaryFeed(customer), col("c_custkey") === col("f_custkey"),
        "left")
      .select(
        col("c_custkey"),
        col("c_name"),
        when(coalesce(col("f_newer"), lit(false)) &&
            col("f_acctbal") > -900000.0d, col("f_acctbal"))
          .otherwise(col("c_acctbal")).as("golden_bal"),
        when(coalesce(col("f_newer"), lit(false)) &&
            col("f_acctbal") > -900000.0d, lit("feed"))
          .otherwise(lit("master")).as("bal_source"),
        coalesce(col("f_phone"), lit("missing")).as("phone"),
        (col("f_mktsegment").isNotNull &&
          col("f_mktsegment") =!= col("c_mktsegment")).as("seg_conflict"))
      .orderBy("c_custkey")

  private val goldenSql: String =
    """WITH feed AS (
      |  SELECT c_custkey AS f_custkey,
      |    CASE WHEN c_custkey % 11 = 0 THEN -999999.0
      |      ELSE c_acctbal + (c_custkey % 7 - 3) END AS f_acctbal,
      |    CASE WHEN c_custkey % 5 = 0 THEN NULL
      |      ELSE lower(c_mktsegment) END AS f_mktsegment,
      |    CASE WHEN c_custkey % 8 = 2 THEN NULL
      |      ELSE 'P-' || c_custkey END AS f_phone,
      |    c_custkey % 3 = 0 AS f_newer
      |  FROM customer WHERE c_custkey % 2 = 0)
      |SELECT c_custkey, c_name,
      |  CASE WHEN COALESCE(f_newer, FALSE) AND f_acctbal > -900000.0
      |    THEN f_acctbal ELSE c_acctbal END AS golden_bal,
      |  CASE WHEN COALESCE(f_newer, FALSE) AND f_acctbal > -900000.0
      |    THEN 'feed' ELSE 'master' END AS bal_source,
      |  COALESCE(f_phone, 'missing') AS phone,
      |  f_mktsegment IS NOT NULL AND f_mktsegment <> c_mktsegment
      |    AS seg_conflict
      |FROM customer LEFT JOIN feed ON c_custkey = f_custkey
      |ORDER BY c_custkey""".stripMargin

  /** q283 body: the fat-finger census — adjacent TRANSPOSITION (the
    * single most common human typo) vs substitution, scored by plain
    * levenshtein AND the native Damerau–Levenshtein expression
    * (graft.functions.DamerauLevenshtein, whole-stage codegen, also
    * SQL-installable via GraftExtensions). Plain levenshtein charges a
    * swap 2 edits and throws every dist<=1 linkage threshold off by 2×
    * on swap typos; the census proves the native expression fixes the
    * tier: swaps land at (lev 2, dl 1), substitutions at (1, 1),
    * equal-digit swaps collapse to (0, 0). End-relative positions (the
    * q261 doctrine); the oracle scores the same derived registry with
    * DuckDB's built-in damerau_levenshtein — exact integer parity with
    * the custom expression across the whole corpus.
    *
    * Scale shape: row-local derivation + one 3×-ish-key grouped count —
    * scan-speed; the DP is O(len²) on bounded name strings.
    */
  def typoDistanceCensus(customer: DataFrame): DataFrame = {
    val name = col("c_name")
    val m = col("c_custkey") % 3
    val len = length(name)
    val swapped = concat(
      name.substr(lit(1), len - 2),
      name.substr(len, lit(1)),
      name.substr(len - 1, lit(1)))
    val substituted = concat(
      name.substr(lit(1), len - 1),
      ((name.substr(len, lit(1)).cast("int") + 7) % 10).cast("string"))
    customer
      .select(name,
        when(m === 1, swapped)
          .when(m === 2, substituted)
          .otherwise(name).as("r_name"))
      .select(
        levenshtein(col("c_name"), col("r_name")).as("lev"),
        graft.functions.StringFunctions
          .damerauLevenshtein(col("c_name"), col("r_name")).as("dl"))
      .groupBy("lev", "dl")
      .agg(count(lit(1)).as("n"))
      .orderBy("lev", "dl")
  }

  private val typoCensusSql: String =
    """WITH reg AS (SELECT c_name,
      |  CASE WHEN c_custkey % 3 = 1 THEN
      |    substr(c_name, 1, length(c_name) - 2) ||
      |    substr(c_name, length(c_name), 1) ||
      |    substr(c_name, length(c_name) - 1, 1)
      |  WHEN c_custkey % 3 = 2 THEN
      |    substr(c_name, 1, length(c_name) - 1) ||
      |    CAST((CAST(substr(c_name, length(c_name), 1) AS INTEGER) + 7) % 10
      |      AS VARCHAR)
      |  ELSE c_name END AS r_name
      |  FROM customer)
      |SELECT CAST(levenshtein(c_name, r_name) AS INT) AS lev,
      |  CAST(damerau_levenshtein(c_name, r_name) AS INT) AS dl,
      |  CAST(COUNT(*) AS BIGINT) AS n
      |FROM reg GROUP BY 1, 2 ORDER BY lev, dl""".stripMargin

  /** q288 body: a dl ≤ 1 fuzzy-match census run WITH the
    * [[graft.plans.EditDistancePrefilter]] optimizer rule installed —
    * the graded proof that the rule is semantics-preserving on a real
    * threshold filter (the oracle knows nothing about the guard). Three
    * planted tiers: unchanged (dist 0, matches), adjacent swap (dl 1 —
    * matches, though plain levenshtein scores it 2 and would lose the
    * tier), and a NON-adjacent double substitution (dl 2 — correctly
    * excluded; transpositions don't bridge a gap). PlanSpec-style
    * assertions (LinkageSpec) pin that the optimized plan carries the
    * length guard and that the rule is a fixpoint (idempotent).
    *
    * extraOptimizations is session-global and the rule is
    * semantics-preserving by construction, so installing it here leaves
    * every other graded plan's RESULTS unchanged. One other graded query
    * does filter on an edit distance — q261's levenshtein ≤ 2 verify —
    * and once q288 has run in a session it gains the length guard too:
    * an intended (and beneficial) plan change, but it makes q261's
    * optimized PLAN order-dependent within a session, which is why no
    * plan-shape assertion anywhere keys on q261's filter condition.
    */
  def fuzzyThresholdCensus(spark: org.apache.spark.sql.SparkSession,
      customer: DataFrame): DataFrame = {
    // synchronized: the check-then-append below is not atomic, and
    // Verify-style harnesses may build queries from multiple threads
    LinkageOps.synchronized {
      if (!spark.experimental.extraOptimizations
          .contains(graft.plans.EditDistancePrefilter))
        spark.experimental.extraOptimizations =
          spark.experimental.extraOptimizations :+
            graft.plans.EditDistancePrefilter
    }
    val name = col("c_name")
    val len = length(name)
    val m = col("c_custkey") % 3
    val swapped = concat(
      name.substr(lit(1), len - 2),
      name.substr(len, lit(1)),
      name.substr(len - 1, lit(1)))
    val doubleSub = concat(
      name.substr(lit(1), len - 3),
      ((name.substr(len - 2, lit(1)).cast("int") + 7) % 10).cast("string"),
      name.substr(len - 1, lit(1)),
      ((name.substr(len, lit(1)).cast("int") + 7) % 10).cast("string"))
    customer
      .select(m.cast("int").as("tier"), name,
        when(m === 1, swapped)
          .when(m === 2, doubleSub)
          .otherwise(name).as("r_name"))
      .where(graft.functions.StringFunctions
        .damerauLevenshtein(col("c_name"), col("r_name")) <= 1)
      .groupBy("tier")
      .agg(count(lit(1)).as("n_match"))
      .orderBy("tier")
  }

  private val fuzzyThresholdSql: String =
    """WITH reg AS (SELECT CAST(c_custkey % 3 AS INT) AS tier, c_name,
      |  CASE WHEN c_custkey % 3 = 1 THEN
      |    substr(c_name, 1, length(c_name) - 2) ||
      |    substr(c_name, length(c_name), 1) ||
      |    substr(c_name, length(c_name) - 1, 1)
      |  WHEN c_custkey % 3 = 2 THEN
      |    substr(c_name, 1, length(c_name) - 3) ||
      |    CAST((CAST(substr(c_name, length(c_name) - 2, 1) AS INTEGER) + 7)
      |      % 10 AS VARCHAR) ||
      |    substr(c_name, length(c_name) - 1, 1) ||
      |    CAST((CAST(substr(c_name, length(c_name), 1) AS INTEGER) + 7)
      |      % 10 AS VARCHAR)
      |  ELSE c_name END AS r_name
      |  FROM customer)
      |SELECT tier, CAST(COUNT(*) AS BIGINT) AS n_match
      |FROM reg WHERE damerau_levenshtein(c_name, r_name) <= 1
      |GROUP BY tier ORDER BY tier""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q261_record_linkage", Some(linkageSql),
      (spark, dir) => recordLinkage(t(spark, dir, "customer"))),

    QueryDef("q268_golden_record", Some(goldenSql),
      (spark, dir) => goldenRecords(t(spark, dir, "customer"))),

    QueryDef("q283_typo_census", Some(typoCensusSql),
      (spark, dir) => typoDistanceCensus(t(spark, dir, "customer"))),

    QueryDef("q288_fuzzy_threshold", Some(fuzzyThresholdSql),
      (spark, dir) =>
        fuzzyThresholdCensus(spark, t(spark, dir, "customer"))))

}
