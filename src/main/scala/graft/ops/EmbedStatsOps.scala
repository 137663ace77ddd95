package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.QueryDef
import graft.util.Tables._

/** Embedding-matrix analytics (SURVEY §7.4 extension tier): the
  * dominant principal direction of the corpus embedding matrix by
  * power iteration over the Gram matrix — the primitive behind
  * anisotropy checks ("is one direction eating the space?"),
  * all-but-the-top post-processing, and drift monitoring between
  * embedding model versions.
  *
  * Exactness doctrine: embeddings quantize to integer milli-units
  * (float→double cast is exact; `floor(x*1000 + 0.5)` is the same
  * IEEE-defined expression in both engines), and EVERYTHING after is
  * integer — Gram entries are Σxᵢxⱼ in BIGINT, the un-normalized power
  * rounds multiply through DECIMAL(38,0)/HUGEINT, and the reported
  * loadings are exact basis points of the max-|component|, with the
  * negative branch made explicit so Spark's truncating `div` and
  * DuckDB's flooring `//` can never disagree. Three rounds keep the
  * un-normalized magnitudes under 10^33; a cluster-scale run rescales
  * (right-shifts) between rounds instead of normalizing — same
  * direction, still exact.
  */
object EmbedStatsOps {

  /** Quantized elements: one (vec_id, d, xq) row per component. The
    * corpus-side fan-out is dim-bounded per row and collapses map-side
    * in every aggregate below.
    */
  private def elems(emb: DataFrame): DataFrame =
    emb.where(col("embedding").isNotNull)
      .select(col("vec_id"), posexplode(col("embedding")).as(Seq("d", "e")))
      .select(col("vec_id"), col("d"),
        expr("CAST(floor(CAST(e AS DOUBLE) * 1000 + 0.5d) AS BIGINT)").as("xq"))

  /** q218 body: dominant eigenvector loadings (exact basis points of
    * the max component) after `rounds` un-normalized power iterations
    * from the all-ones start. One corpus pass builds the Gram matrix —
    * the (d1, d2) partial aggregate collapses the n·dim² products to
    * dim² rows per partition before the one shuffle — and each round is
    * a broadcast join against the dim-sized vector. At 100 TB the Gram
    * build is the only corpus-touching stage; the iteration is free.
    */
  /** Shared by the graded body's default and the generated oracle so the
    * two can never silently diverge (the bpeChainSql doctrine).
    */
  val PcaRounds = 3

  def pcaPowerLoadings(emb: DataFrame, rounds: Int = PcaRounds): DataFrame = {
    require(rounds >= 1 && rounds <= 3,
      s"rounds must be in [1,3] (decimal38 headroom, see doc), got $rounds")
    val dec = "decimal(38,0)"
    val x = elems(emb)
    // operands cast to decimal BEFORE the multiply: the oracle computes
    // in HUGEINT from the source, and a Long product would silently
    // wrap past ~3e13 vectors (ANSI-off multiplication does not throw)
    val gram = x.as("a").join(x.as("b"), col("a.vec_id") === col("b.vec_id"))
      .groupBy(col("a.d").as("d1"), col("b.d").as("d2"))
      .agg(sum(col("a.xq").cast(dec) * col("b.xq").cast(dec)).cast(dec).as("g"))
      .localCheckpoint() // 3 rounds otherwise replay the corpus pass each
    var v = gram.select(col("d1").as("d")).distinct()
      .withColumn("vv", lit(1).cast("decimal(38,0)"))
    for (_ <- 1 to rounds)
      v = gram.join(broadcast(v), gram("d2") === v("d"))
        .groupBy(col("d1").as("d"))
        .agg(sum(col("g") * col("vv")).cast("decimal(38,0)").as("vv"))
    val mx = v.agg(max(abs(col("vv"))).as("mx"))
    v.crossJoin(broadcast(mx))
      .select(col("d"),
        // NULLIF guards the all-zero-embedding degenerate (mx = 0):
        // Spark's ANSI-off div would return NULL while DuckDB's // 0
        // raises — with the guard both engines agree on NULL.
        expr("""CASE WHEN vv < 0
          | THEN -CAST((-vv) * 10000 div nullif(mx, 0) AS BIGINT)
          | ELSE CAST(vv * 10000 div nullif(mx, 0) AS BIGINT) END""".stripMargin)
          .as("loading_bp"))
      .orderBy("d")
  }

  /** Oracle generated from the SAME round count as the graded body (the
    * bpeChainSql doctrine): v1..vN CTE chain, one per power iteration.
    */
  private def pcaOracle(rounds: Int): String = {
    require(rounds >= 1 && rounds <= 3,
      s"rounds must be in [1,3] (decimal38 headroom), got $rounds")
    val chain = (1 to rounds).map { i =>
      s"""v$i AS (SELECT g.d1 AS d, SUM(g.g * v${i - 1}.vv) AS vv
         |  FROM g JOIN v${i - 1} ON v${i - 1}.d = g.d2 GROUP BY 1)""".stripMargin
    }.mkString(",\n")
    s"""WITH x AS (
      |  SELECT vec_id,
      |    CAST(generate_subscripts(embedding, 1) - 1 AS INT) AS d,
      |    CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000 + 0.5)
      |      AS HUGEINT) AS xq
      |  FROM embeddings WHERE embedding IS NOT NULL),
      |g AS (
      |  SELECT a.d AS d1, b.d AS d2, SUM(a.xq * b.xq) AS g
      |  FROM x a JOIN x b USING (vec_id) GROUP BY 1, 2),
      |v0 AS (SELECT DISTINCT d1 AS d, CAST(1 AS HUGEINT) AS vv FROM g),
      |$chain,
      |m AS (SELECT MAX(abs(vv)) AS mx FROM v$rounds)
      |SELECT d, CAST(CASE WHEN vv < 0
      |    THEN -((-vv) * 10000 // NULLIF(mx, 0))
      |    ELSE (vv * 10000 // NULLIF(mx, 0)) END AS BIGINT) AS loading_bp
      |FROM v$rounds, m ORDER BY d""".stripMargin
  }

  /** q221 body: the inter-label centroid distance matrix — clustering
    * QA for a labeled embedding table (labels whose centroids collapse
    * toward each other flag leaky classes or a degenerate encoder).
    * Exactness: centroids are rationals (Σx/n), so instead of dividing,
    * every pairwise difference is cross-multiplied —
    * Σ_d (n₂·sx₁ − n₁·sx₂)² is exact integer arithmetic equal to
    * (n₁n₂)²·‖c₁−c₂‖², and the only doubles are one IEEE sqrt + one
    * division at the end (both correctly rounded, engine-identical).
    * Scale: the per-(label, dim) sums collapse the corpus map-side to a
    * |labels|·dim relation before the one shuffle; the pair join is
    * label²·dim — dimension-bounded however large the corpus.
    */
  def labelCentroidDists(emb: DataFrame): DataFrame = {
    val dec = "decimal(38,0)"
    val x = emb.where(col("embedding").isNotNull)
      .select(col("label"), posexplode(col("embedding")).as(Seq("d", "e")))
      .select(col("label"), col("d"),
        expr("CAST(floor(CAST(e AS DOUBLE) * 1000 + 0.5d) AS BIGINT)").as("xq"))
    val s = x.groupBy("label", "d").agg(sum(col("xq")).as("sx"))
    val n = emb.where(col("embedding").isNotNull)
      .groupBy("label").agg(count(lit(1)).as("n"))
    val a = s.select(col("label").as("l1"), col("d"), col("sx").as("sx1"))
    val b = s.select(col("label").as("l2"), col("d"), col("sx").as("sx2"))
    a.join(b, Seq("d")).where(col("l1") < col("l2"))
      .join(broadcast(n.select(col("label").as("l1"), col("n").as("n1"))), Seq("l1"))
      .join(broadcast(n.select(col("label").as("l2"), col("n").as("n2"))), Seq("l2"))
      // decimal operands BEFORE the multiply (oracle is HUGEINT from
      // the source; Long n2*sx1 wraps past ~1e9-vector labels)
      .withColumn("diff",
        col("n2").cast(dec) * col("sx1").cast(dec)
          - col("n1").cast(dec) * col("sx2").cast(dec))
      .groupBy("l1", "l2")
      .agg(max(col("n1")).as("n1"), max(col("n2")).as("n2"),
        sum(col("diff") * col("diff")).as("d2"))
      .select(col("l1"), col("l2"), col("n1"), col("n2"),
        (sqrt(col("d2").cast("double")) /
          (col("n1").cast(dec) * col("n2").cast(dec) * lit(1000).cast(dec))
            .cast("double"))
          .as("centroid_dist"))
      .orderBy("l1", "l2")
  }

  private val centroidOracle: String =
    """WITH x AS (
      |  SELECT label,
      |    CAST(generate_subscripts(embedding, 1) - 1 AS INT) AS d,
      |    CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000 + 0.5)
      |      AS HUGEINT) AS xq
      |  FROM embeddings WHERE embedding IS NOT NULL),
      |s AS (SELECT label, d, SUM(xq) AS sx FROM x GROUP BY 1, 2),
      |n AS (SELECT label, CAST(COUNT(*) AS HUGEINT) AS n
      |  FROM embeddings WHERE embedding IS NOT NULL GROUP BY 1),
      |p AS (
      |  SELECT a.label AS l1, b.label AS l2,
      |    SUM((nb.n * a.sx - na.n * b.sx) * (nb.n * a.sx - na.n * b.sx))
      |      AS d2
      |  FROM s a JOIN s b ON a.d = b.d AND a.label < b.label
      |  JOIN n na ON na.label = a.label
      |  JOIN n nb ON nb.label = b.label
      |  GROUP BY 1, 2)
      |SELECT l1, l2, CAST(na.n AS BIGINT) AS n1, CAST(nb.n AS BIGINT) AS n2,
      |  sqrt(CAST(d2 AS DOUBLE))
      |    / CAST(na.n * nb.n * 1000 AS DOUBLE) AS centroid_dist
      |FROM p JOIN n na ON na.label = p.l1 JOIN n nb ON nb.label = p.l2
      |ORDER BY l1, l2""".stripMargin

  /** q233 body: incremental index maintenance — assign a DELTA batch of
    * vectors to the nearest existing label centroid (broadcast
    * centroids, map-side scoring — the nightly "index the new data
    * without re-clustering the corpus" pass), then report per-cell
    * drift so the pipeline knows when a real re-cluster is due. The
    * corpus splits old/delta by `vec_id mod 5`.
    *
    * Exactness: centroids are rationals s/n, never divided — the
    * squared distance from vector v to centroid l scales to the integer
    * Σ_d (n_l·v_d − s_l d)², and the cross-label argmin divides by n_l²
    * in ONE shared double expression (identical text in the oracle, so
    * the IEEE comparison can't diverge); ties break by label. Drift of
    * cell l after absorbing m vectors with component sums t is the
    * integer Σ_d (n·t_d − m·s_d)² — equal to (n(n+m))²·‖c_new − c_old‖²
    * — with one sqrt/divide at the end. The per-delta-vector argmin
    * window is a ≤|labels|-row frame.
    */
  /** Quantized (vec_id, d, xq) elements of a raw (vec_id, embedding)
    * frame — [[elems]] made public for the q307 streaming component,
    * whose micro-batches must quantize with the IDENTICAL expression.
    */
  def quantElems(emb: DataFrame): DataFrame = elems(emb)

  /** Rational (cl, d, s, n) centroids of a LABELED element frame
    * (vec_id, label, d, xq) — the q233 centroid build, extracted so the
    * q307 streaming component scores micro-batches against the same
    * relation.
    */
  def ratCentroids(oldElems: DataFrame): DataFrame = {
    val cent = oldElems.groupBy(col("label").as("cl"), col("d"))
      .agg(sum(col("xq")).as("s"))
    val n = oldElems.select(col("label").as("cl"), col("vec_id")).distinct()
      .groupBy("cl").agg(count(lit(1)).as("n"))
    cent.join(broadcast(n), Seq("cl"))
  }

  /** Nearest-centroid (vec_id, cl) assignment of an element frame
    * against broadcast rational centroids — q233's exact scoring
    * (cross-multiplied integer distance, ONE shared double divide, ties
    * by cl), shared verbatim with the q307 streaming component so the
    * continuous and batch paths cannot drift.
    */
  def assignToCentroids(elemsIn: DataFrame, centN: DataFrame): DataFrame = {
    val dec = "decimal(38,0)"
    val scored = elemsIn.join(broadcast(centN), Seq("d"))
      .withColumn("diff",
        col("n").cast(dec) * col("xq").cast(dec) - col("s").cast(dec))
      .groupBy(col("vec_id"), col("cl"), col("n"))
      .agg(sum(col("diff") * col("diff")).as("d2"))
      .withColumn("score",
        col("d2").cast("double") / (col("n") * col("n")).cast("double"))
    val byScore = Window.partitionBy("vec_id")
      .orderBy(col("score"), col("cl"))
    scored
      .withColumn("rn", row_number().over(byScore)).where(col("rn") === 1)
      .select(col("vec_id"), col("cl"))
  }

  def centroidAssignDrift(emb: DataFrame): DataFrame = {
    val dec = "decimal(38,0)"
    val x = emb.where(col("embedding").isNotNull)
      .select(col("vec_id"), col("label"),
        posexplode(col("embedding")).as(Seq("d", "e")))
      .select(col("vec_id"), col("label"), col("d"),
        expr("CAST(floor(CAST(e AS DOUBLE) * 1000 + 0.5d) AS BIGINT)").as("xq"))
    val old = x.where(col("vec_id") % 5 =!= 0)
    val delta = x.where(col("vec_id") % 5 === 0)
    val cent = old.groupBy(col("label").as("cl"), col("d"))
      .agg(sum(col("xq")).as("s"))
    val n = old.select(col("label").as("cl"), col("vec_id")).distinct()
      .groupBy("cl").agg(count(lit(1)).as("n"))
    val centN = cent.join(broadcast(n), Seq("cl"))
    val assigned = assignToCentroids(
      delta.select(col("vec_id"), col("d"), col("xq")), centN)
    val absorbed = delta.join(broadcast(assigned), Seq("vec_id"))
      .groupBy(col("cl"), col("d")).agg(sum(col("xq")).as("t"),
        countDistinct(col("vec_id")).as("m"))
    cent.join(broadcast(n), Seq("cl"))
      .join(absorbed, Seq("cl", "d"), "left_outer")
      .withColumn("t", coalesce(col("t"), lit(0L)))
      .withColumn("m", coalesce(col("m"), lit(0L)))
      .withColumn("dd",
        col("n").cast(dec) * col("t").cast(dec)
          - col("m").cast(dec) * col("s").cast(dec))
      .groupBy(col("cl").as("label"))
      .agg(max(col("n")).cast("long").as("n_old"),
        max(col("m")).cast("long").as("n_assigned"),
        sum(col("dd") * col("dd")).as("drift2"))
      .withColumn("drift",
        sqrt(col("drift2").cast("double")) /
          (col("n_old").cast(dec)
            * (col("n_old") + col("n_assigned")).cast(dec)
            * lit(1000).cast(dec))
            .cast("double"))
      .select(col("label"), col("n_old"), col("n_assigned"), col("drift"))
      .orderBy("label")
  }

  private val assignOracle: String =
    """WITH x AS (
      |  SELECT vec_id, label,
      |    CAST(generate_subscripts(embedding, 1) - 1 AS INT) AS d,
      |    CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000 + 0.5)
      |      AS HUGEINT) AS xq
      |  FROM embeddings WHERE embedding IS NOT NULL),
      |old AS (SELECT * FROM x WHERE vec_id % 5 <> 0),
      |delta AS (SELECT * FROM x WHERE vec_id % 5 = 0),
      |cent AS (SELECT label AS cl, d, SUM(xq) AS s FROM old GROUP BY 1, 2),
      |nn AS (SELECT label AS cl, CAST(COUNT(DISTINCT vec_id) AS HUGEINT)
      |  AS n FROM old GROUP BY 1),
      |scored AS (
      |  SELECT delta.vec_id, cent.cl, nn.n,
      |    SUM((nn.n * delta.xq - cent.s) * (nn.n * delta.xq - cent.s))
      |      AS d2
      |  FROM delta JOIN cent ON cent.d = delta.d
      |  JOIN nn ON nn.cl = cent.cl
      |  GROUP BY 1, 2, 3),
      |ranked AS (
      |  SELECT vec_id, cl,
      |    ROW_NUMBER() OVER (PARTITION BY vec_id
      |      ORDER BY CAST(d2 AS DOUBLE) / CAST(n * n AS DOUBLE), cl)
      |      AS rn
      |  FROM scored),
      |assigned AS (SELECT vec_id, cl FROM ranked WHERE rn = 1),
      |absorbed AS (
      |  SELECT a.cl, delta.d, SUM(delta.xq) AS t,
      |    CAST(COUNT(DISTINCT delta.vec_id) AS HUGEINT) AS m
      |  FROM delta JOIN assigned a ON a.vec_id = delta.vec_id
      |  GROUP BY 1, 2),
      |dr AS (
      |  SELECT cent.cl, nn.n,
      |    COALESCE(ab.m, 0) AS m,
      |    (nn.n * COALESCE(ab.t, 0) - COALESCE(ab.m, 0) * cent.s) AS dd
      |  FROM cent JOIN nn ON nn.cl = cent.cl
      |  LEFT JOIN absorbed ab ON ab.cl = cent.cl AND ab.d = cent.d)
      |SELECT cl AS label, CAST(MAX(n) AS BIGINT) AS n_old,
      |  CAST(MAX(m) AS BIGINT) AS n_assigned,
      |  sqrt(CAST(SUM(dd * dd) AS DOUBLE))
      |    / CAST(MAX(n) * (MAX(n) + MAX(m)) * 1000 AS DOUBLE) AS drift
      |FROM dr GROUP BY cl ORDER BY label""".stripMargin

  /** q242 body: per-label cohesion — the mean squared distance of a
    * label's vectors to their own centroid, the within-cluster half of
    * the separation/cohesion pair (q221 reports the between half; their
    * ratio is the Fisher-style cluster-quality score). Exact: the
    * textbook identity Σᵢ‖xᵢ − c‖² = Σᵢ‖xᵢ‖² − ‖Σᵢxᵢ‖²/n cross-
    * multiplies to the integer n·Σᵢ‖xᵢ‖² − Σ_d(Σᵢx_d)², divided once at
    * the end (by n² milli-units²) in a shared double expression. One
    * corpus pass for both moment relations; everything after is
    * label-bounded.
    */
  def labelCohesion(emb: DataFrame): DataFrame = {
    val dec = "decimal(38,0)"
    val x = emb.where(col("embedding").isNotNull)
      .select(col("vec_id"), col("label"),
        posexplode(col("embedding")).as(Seq("d", "e")))
      .select(col("vec_id"), col("label"), col("d"),
        expr("CAST(floor(CAST(e AS DOUBLE) * 1000 + 0.5d) AS BIGINT)").as("xq"))
    val sq = x.groupBy("label")
      .agg(sum(col("xq").cast(dec) * col("xq").cast(dec)).as("ssq"),
        countDistinct(col("vec_id")).as("n"))
    val cent = x.groupBy("label", "d").agg(sum(col("xq")).as("sx"))
      .groupBy("label")
      .agg(sum(col("sx").cast(dec) * col("sx").cast(dec)).as("cnorm2"))
    sq.join(cent, Seq("label"))
      .select(col("label"), col("n"),
        ((col("n").cast(dec) * col("ssq") - col("cnorm2")).cast("double") /
          (col("n").cast(dec) * col("n").cast(dec) * lit(1000000).cast(dec))
            .cast("double"))
          .as("mean_sq_dist"))
      .orderBy("label")
  }

  private val cohesionOracle: String =
    """WITH x AS (
      |  SELECT vec_id, label,
      |    CAST(generate_subscripts(embedding, 1) - 1 AS INT) AS d,
      |    CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000 + 0.5)
      |      AS HUGEINT) AS xq
      |  FROM embeddings WHERE embedding IS NOT NULL),
      |sq AS (
      |  SELECT label, SUM(xq * xq) AS ssq,
      |    CAST(COUNT(DISTINCT vec_id) AS HUGEINT) AS n
      |  FROM x GROUP BY 1),
      |cent AS (
      |  SELECT label, SUM(sx * sx) AS cnorm2 FROM (
      |    SELECT label, d, SUM(xq) AS sx FROM x GROUP BY 1, 2)
      |  GROUP BY 1)
      |SELECT sq.label AS label, CAST(sq.n AS BIGINT) AS n,
      |  CAST(sq.n * sq.ssq - cent.cnorm2 AS DOUBLE)
      |    / CAST(sq.n * sq.n * 1000000 AS DOUBLE) AS mean_sq_dist
      |FROM sq JOIN cent ON cent.label = sq.label
      |ORDER BY sq.label""".stripMargin

  /** q297 body: two full Lloyd rounds of k-means (k = 8, seeds =
    * `vec_id < 8`) — the clustering step itself, where q233 only
    * maintains an EXISTING clustering. The part naive ports get wrong
    * at scale is centroid division: means are floats, so re-runs and
    * repartitionings drift. Here centroids stay RATIONAL end to end
    * (q233's doctrine):
    *
    *   round 1: seeds are single vectors, so the squared distance is
    *     the plain integer Σ_d (x_d − c_d)² — argmin over k integer
    *     scores, ties by seed id; no division exists at all.
    *   round 2: cluster l's centroid is the rational (s_l / n_l) per
    *     dimension; distance cross-multiplies to the integer
    *     Σ_d (n_l·x_d − s_l d)² and the cross-cluster argmin divides by
    *     n_l² in ONE shared double expression (identical text in the
    *     oracle), ties by cluster id.
    *
    * Graded output per surviving cluster: member count after round 2,
    * how many members CHANGED assignment between rounds (the Lloyd
    * convergence signal), and the round-2 inertia — the cluster's
    * summed integer Σ(n·x−s)² divided ONCE by n²·10⁶ (milli-units² →
    * units²), so the only double op is one division per output row.
    *
    * Scale shape: two corpus passes (one per round), each a ≤k-bounded
    * broadcast fan-out per element row with map-side combine down to
    * (vec, cluster) partials; the argmin windows are ≤k-row frames
    * partitioned by vec_id; centroids (k·dim rows) broadcast back. At
    * 100 TB each round is one scan + one n·k-row shuffle — the
    * textbook distributed Lloyd plan.
    */
  def kmeansLloyd(emb: DataFrame, k: Int = 8): DataFrame = {
    val x = elems(emb)
    lloydFromSeeds(x, x.where(col("vec_id") < k)
      .select(col("vec_id").as("cl"), col("d"), col("xq").as("cq")))
  }

  /** Shared Lloyd rounds over a (cl, d, cq) single-vector seed frame —
    * the q297 body from "round 1" on, extracted so q299's D²-seeded run
    * and q297's naive-seeded run grade the SAME clustering code.
    */
  private def lloydFromSeeds(x: DataFrame, seeds: DataFrame): DataFrame = {
    val dec = "decimal(38,0)"
    // round 1: integer distance to single-vector seeds
    val d1 = x.join(broadcast(seeds), Seq("d"))
      .withColumn("diff", col("xq").cast(dec) - col("cq").cast(dec))
      .groupBy(col("vec_id"), col("cl"))
      .agg(sum(col("diff") * col("diff")).as("d2"))
    val w1 = Window.partitionBy("vec_id").orderBy(col("d2"), col("cl"))
    val a1 = d1.withColumn("rn", row_number().over(w1))
      .where(col("rn") === 1).select(col("vec_id"), col("cl").as("cl1"))
    // round-1 centroids as rationals (component sums + counts)
    val cent = x.join(broadcast(a1), Seq("vec_id"))
      .groupBy(col("cl1").as("cl"), col("d"))
      .agg(sum(col("xq")).as("s"))
    val n = a1.groupBy(col("cl1").as("cl")).agg(count(lit(1)).as("n"))
    val centN = cent.join(broadcast(n), Seq("cl"))
    // round 2: cross-multiplied distance to rational centroids
    val d2r = x.join(broadcast(centN), Seq("d"))
      .withColumn("diff",
        col("n").cast(dec) * col("xq").cast(dec) - col("s").cast(dec))
      .groupBy(col("vec_id"), col("cl"), col("n"))
      .agg(sum(col("diff") * col("diff")).as("d2"))
      .withColumn("score",
        col("d2").cast("double") / (col("n") * col("n")).cast("double"))
    val w2 = Window.partitionBy("vec_id").orderBy(col("score"), col("cl"))
    val a2 = d2r.withColumn("rn", row_number().over(w2))
      .where(col("rn") === 1)
      .select(col("vec_id"), col("cl"), col("n"), col("d2"))
    a2.join(broadcast(a1), Seq("vec_id"))
      .groupBy(col("cl").as("cluster"))
      .agg(count(lit(1)).as("n_members"),
        sum(when(col("cl") =!= col("cl1"), 1L).otherwise(0L))
          .as("n_changed"),
        max(col("n")).cast("long").as("n_r1"),
        sum(col("d2")).as("sum_d2"))
      .withColumn("inertia",
        col("sum_d2").cast("double") /
          (col("n_r1").cast(dec) * col("n_r1").cast(dec)
            * lit(1000000L).cast(dec)).cast("double"))
      .select(col("cluster"), col("n_members"), col("n_changed"),
        col("inertia"))
      .orderBy("cluster")
  }

  private val kmeansOracle: String =
    """WITH x AS (
      |  SELECT vec_id,
      |    CAST(generate_subscripts(embedding, 1) - 1 AS INT) AS d,
      |    CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000 + 0.5)
      |      AS HUGEINT) AS xq
      |  FROM embeddings WHERE embedding IS NOT NULL),
      |seeds AS (SELECT vec_id AS cl, d, xq AS cq FROM x WHERE vec_id < 8),
      |d1 AS (SELECT x.vec_id, s.cl,
      |    SUM((x.xq - s.cq) * (x.xq - s.cq)) AS d2
      |  FROM x JOIN seeds s ON s.d = x.d GROUP BY 1, 2),
      |a1 AS (SELECT vec_id, cl AS cl1 FROM (
      |    SELECT vec_id, cl,
      |      ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, cl) AS rn
      |    FROM d1) WHERE rn = 1),
      |cent AS (SELECT a1.cl1 AS cl, x.d, SUM(x.xq) AS s
      |  FROM x JOIN a1 ON a1.vec_id = x.vec_id GROUP BY 1, 2),
      |nn AS (SELECT cl1 AS cl, CAST(COUNT(*) AS HUGEINT) AS n
      |  FROM a1 GROUP BY 1),
      |d2r AS (SELECT x.vec_id, cent.cl, nn.n,
      |    SUM((nn.n * x.xq - cent.s) * (nn.n * x.xq - cent.s)) AS d2
      |  FROM x JOIN cent ON cent.d = x.d JOIN nn ON nn.cl = cent.cl
      |  GROUP BY 1, 2, 3),
      |a2 AS (SELECT vec_id, cl, n, d2 FROM (
      |    SELECT vec_id, cl, n, d2,
      |      ROW_NUMBER() OVER (PARTITION BY vec_id
      |        ORDER BY CAST(d2 AS DOUBLE) / CAST(n * n AS DOUBLE), cl)
      |        AS rn
      |    FROM d2r) WHERE rn = 1)
      |SELECT a2.cl AS cluster, CAST(COUNT(*) AS BIGINT) AS n_members,
      |  CAST(SUM(CASE WHEN a2.cl <> a1.cl1 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_changed,
      |  CAST(SUM(a2.d2) AS DOUBLE)
      |    / CAST(MAX(a2.n) * MAX(a2.n) * 1000000 AS DOUBLE) AS inertia
      |FROM a2 JOIN a1 ON a1.vec_id = a2.vec_id
      |GROUP BY a2.cl ORDER BY cluster""".stripMargin

  /** Shared by the q299 body and its generated oracle (the PcaRounds /
    * bpeChainSql doctrine): number of D²-seeded clusters.
    */
  val PpK = 8

  /** q299 body: deterministic k-means++/D² (farthest-point) seeding in
    * front of the SAME two Lloyd rounds as q297 — the clustering-quality
    * step q297 stops short of (VERDICT r10 #1): naive `vec_id < k` seeds
    * can all land in one dense region and Lloyd inherits the bad start;
    * D² seeding spreads seeds by construction, which is what SemDeDup
    * cell quality (q118) and hard-negative mining (q289) actually lean
    * on. The seeding is the deterministic maximin variant of k-means++
    * (argmax-D² instead of D²-proportional sampling — no RNG to match
    * across engines): seed 0 is the min-vec_id vector; each next seed is
    * the vector maximizing its squared distance to the nearest chosen
    * seed, ties broken by min vec_id. All distances are the plain
    * integer Σ_d (x_d − c_d)² of the q297 doctrine — seeds are corpus
    * vectors, so no centroid division exists during seeding at all.
    *
    * Scale shape: k−1 seeding passes, each one corpus scan against ONE
    * broadcast dim-row seed vector with map-side combine to a vec-keyed
    * partial, a LEAST merge into the running per-vector D² frame (kept
    * flat via localCheckpoint — k frames of n rows, never deeper), and a
    * TakeOrdered(1) argmax (per-partition heaps, one row to the driver's
    * plan — no collect in the data path). At 100 TB that is k scans —
    * the known cost of sequential D² seeding; the scalable refinement
    * (k-means‖ oversampling, which trades the k passes for O(log k))
    * keeps this exact plan shape per pass. Lloyd after seeding is
    * byte-identical to q297's.
    *
    * EmbedStatsSpec pins the quality claim: on a planted
    * two-blobs-plus-outlier fixture the D²-seeded inertia is ≤ the
    * naive-seeded inertia (strictly < on the planted geometry).
    */
  def kmeansPlusPlus(emb: DataFrame, k: Int = PpK): DataFrame = {
    require(k >= 2, s"k must be >= 2, got $k")
    // flat base for the k re-scans (and Lloyd): one parquet read + explode
    val x = elems(emb).localCheckpoint()
    lloydFromSeeds(x, maximinSeeds(x, k))
  }

  /** Sequential deterministic D² (maximin) seed selection over a
    * (vec_id, d, xq) element frame — q299's seeding, extracted so
    * q306's k-means‖ run can apply it to the oversampled CANDIDATE set
    * (where it costs k−1 scans of a candidates-sized frame, not the
    * corpus). Degenerate note (ADVICE r11): with k greater than the
    * number of distinct vectors, every dmin reaches 0 and the argmax
    * re-picks the min-vec_id vector — duplicate seeds under distinct cl
    * ids, mirrored exactly by the generated oracle; callers wanting k
    * real clusters must supply k distinct vectors.
    */
  private def maximinSeeds(x: DataFrame, k: Int): DataFrame = {
    val dec = "decimal(38,0)"
    val first = x.join(
      broadcast(x.groupBy().agg(min(col("vec_id")).as("vec_id"))),
      Seq("vec_id"))
    var latest = first.select(col("d"), col("xq").as("cq"))
    var seeds = latest.select(lit(0L).as("cl"), col("d"), col("cq"))
    var dmin: DataFrame = null
    for (j <- 1 until k) {
      val dist = x.join(broadcast(latest), Seq("d"))
        .withColumn("diff", col("xq").cast(dec) - col("cq").cast(dec))
        .groupBy("vec_id")
        .agg(sum(col("diff") * col("diff")).as("dist"))
      dmin = (if (dmin == null) dist.select(col("vec_id"), col("dist").as("dmin"))
        else dmin.join(dist, Seq("vec_id"))
          .select(col("vec_id"), least(col("dmin"), col("dist")).as("dmin")))
        .localCheckpoint()
      val pick = dmin.orderBy(col("dmin").desc, col("vec_id")).limit(1)
        .select("vec_id")
      latest = x.join(broadcast(pick), Seq("vec_id"))
        .select(col("d"), col("xq").as("cq")).localCheckpoint()
      seeds = seeds.unionByName(
        latest.select(lit(j.toLong).as("cl"), col("d"), col("cq")))
    }
    seeds
  }

  /** Shared by the q306 body and its generated oracle: oversampling
    * factor ℓ (candidates taken per round) and round count.
    */
  val ParL = 4
  val ParRounds = 3

  /** q306 body: k-means‖ oversampled seeding (Bahmani et al. 2012,
    * VLDB — "Scalable k-means++") in front of the SAME Lloyd rounds —
    * the at-scale refinement q299's own doc names: sequential D² costs
    * k−1 corpus scans, one per seed; k-means‖ collapses that to
    * `rounds` scans by taking ℓ candidates per round, then runs the
    * cheap seed selection over the candidate set only.
    *
    * Determinization (no RNG to match across engines): Bahmani samples
    * each point with probability ℓ·d²(x)/φ; here a round instead takes
    * the ℓ points with the LARGEST current D² (ties by min vec_id) —
    * thresholding on the ℓ-th largest exact integer D², the maximin
    * analog of the expected-ℓ sample, batched. A point already chosen
    * has D² = 0 and can never be re-taken. After `rounds` rounds the
    * ≤ 1 + ℓ·rounds candidates are reduced to k seeds by the SAME
    * sequential-D² machinery as q299 ([[maximinSeeds]]) — now over a
    * candidates-sized frame, where its k−1 passes are free — and Lloyd
    * from there is byte-identical to q297/q299's.
    *
    * Scale shape: `rounds` corpus scans, each one broadcast join
    * against the ≤ ℓ previous-round candidate vectors with map-side
    * combine to (vec, cand) partials, a LEAST merge into the flat
    * checkpointed D² frame, and a TakeOrdered(ℓ) pick (per-partition
    * heaps — no driver collect). At 100 TB: 3 scans instead of q299's
    * k−1, the whole point of the algorithm.
    */
  def kmeansParallel(emb: DataFrame, k: Int = PpK, l: Int = ParL,
      rounds: Int = ParRounds): DataFrame = {
    require(k >= 2, s"k must be >= 2, got $k")
    require(l >= 1 && rounds >= 1 && 1 + l * rounds >= k,
      s"need 1 + l*rounds >= k candidates, got l=$l rounds=$rounds k=$k")
    val dec = "decimal(38,0)"
    val x = elems(emb).localCheckpoint()
    // candidate 0: the min-vec_id vector (q299's start)
    var newCand = x.join(
      broadcast(x.groupBy().agg(min(col("vec_id")).as("vec_id"))),
      Seq("vec_id")).localCheckpoint()
    var candIds = newCand.select(col("vec_id")).distinct()
    var dmin: DataFrame = null
    for (_ <- 1 to rounds) {
      // one scan: distance of every vector to EVERY new candidate,
      // min over candidates, LEAST-merged into the running D² frame
      val dist = x.join(broadcast(newCand.select(col("vec_id").as("cid"),
          col("d"), col("xq").as("cq"))), Seq("d"))
        .withColumn("diff", col("xq").cast(dec) - col("cq").cast(dec))
        .groupBy(col("vec_id"), col("cid"))
        .agg(sum(col("diff") * col("diff")).as("dc"))
        .groupBy("vec_id").agg(min(col("dc")).as("dist"))
      dmin = (if (dmin == null) dist.select(col("vec_id"), col("dist").as("dmin"))
        else dmin.join(dist, Seq("vec_id"))
          .select(col("vec_id"), least(col("dmin"), col("dist")).as("dmin")))
        .localCheckpoint()
      val pick = dmin.orderBy(col("dmin").desc, col("vec_id")).limit(l)
        .select("vec_id")
      newCand = x.join(broadcast(pick), Seq("vec_id")).localCheckpoint()
      candIds = candIds.unionByName(newCand.select(col("vec_id")).distinct())
    }
    val cx = x.join(broadcast(candIds.distinct()), Seq("vec_id"))
      .localCheckpoint()
    lloydFromSeeds(x, maximinSeeds(cx, k))
  }

  /** The quantized-elements CTE shared by the generated seeding
    * oracles (identical to kmeansOracle's x).
    */
  private val xCteSql: String =
    """x AS MATERIALIZED (
      |  SELECT vec_id,
      |    CAST(generate_subscripts(embedding, 1) - 1 AS INT) AS d,
      |    CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000 + 0.5)
      |      AS HUGEINT) AS xq
      |  FROM embeddings WHERE embedding IS NOT NULL)""".stripMargin

  /** The sequential-D² seeding CTE chain of [[maximinSeeds]] over the
    * element relation `base`, producing the CTE `seeds` — shared by the
    * q299 oracle (base = x) and the q306 oracle (base = the candidate
    * relation cx).
    */
  private def maximinSql(base: String, k: Int): String = {
    val rounds = (1 until k).map { j =>
      val prev = if (j == 1) "" else s"dm${j - 1}"
      val dj =
        s"""dj$j AS MATERIALIZED (SELECT $base.vec_id,
           |    SUM(($base.xq - s.cq) * ($base.xq - s.cq)) AS dist
           |  FROM $base JOIN s${j - 1} s ON s.d = $base.d GROUP BY 1)""".stripMargin
      val dm =
        if (j == 1) s"dm1 AS MATERIALIZED (SELECT vec_id, dist AS dmin FROM dj1)"
        else
          s"""dm$j AS MATERIALIZED (SELECT $prev.vec_id, LEAST($prev.dmin, dj$j.dist) AS dmin
             |  FROM $prev JOIN dj$j USING (vec_id))""".stripMargin
      s"""$dj,
         |$dm,
         |p$j AS (SELECT vec_id FROM dm$j ORDER BY dmin DESC, vec_id LIMIT 1),
         |s$j AS MATERIALIZED (SELECT CAST($j AS BIGINT) AS cl, $base.d, $base.xq AS cq
         |  FROM $base JOIN p$j USING (vec_id))""".stripMargin
    }.mkString(",\n")
    val union = (0 until k).map(j => s"SELECT * FROM s$j")
      .mkString(" UNION ALL ")
    s"""m0 AS MATERIALIZED (SELECT MIN(vec_id) AS vid FROM $base),
       |s0 AS MATERIALIZED (SELECT CAST(0 AS BIGINT) AS cl, $base.d, $base.xq AS cq
       |  FROM $base JOIN m0 ON $base.vec_id = m0.vid),
       |$rounds,
       |seeds AS ($union)""".stripMargin
  }

  /** The verbatim q297 Lloyd SQL over `x` and the assembled `seeds`
    * CTE (the tail of kmeansOracle, shared by both seeded oracles).
    */
  private val lloydTailSql: String =
    """d1 AS (SELECT x.vec_id, s.cl,
      |    SUM((x.xq - s.cq) * (x.xq - s.cq)) AS d2
      |  FROM x JOIN seeds s ON s.d = x.d GROUP BY 1, 2),
      |a1 AS (SELECT vec_id, cl AS cl1 FROM (
      |    SELECT vec_id, cl,
      |      ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, cl) AS rn
      |    FROM d1) WHERE rn = 1),
      |cent AS (SELECT a1.cl1 AS cl, x.d, SUM(x.xq) AS s
      |  FROM x JOIN a1 ON a1.vec_id = x.vec_id GROUP BY 1, 2),
      |nn AS (SELECT cl1 AS cl, CAST(COUNT(*) AS HUGEINT) AS n
      |  FROM a1 GROUP BY 1),
      |d2r AS (SELECT x.vec_id, cent.cl, nn.n,
      |    SUM((nn.n * x.xq - cent.s) * (nn.n * x.xq - cent.s)) AS d2
      |  FROM x JOIN cent ON cent.d = x.d JOIN nn ON nn.cl = cent.cl
      |  GROUP BY 1, 2, 3),
      |a2 AS (SELECT vec_id, cl, n, d2 FROM (
      |    SELECT vec_id, cl, n, d2,
      |      ROW_NUMBER() OVER (PARTITION BY vec_id
      |        ORDER BY CAST(d2 AS DOUBLE) / CAST(n * n AS DOUBLE), cl)
      |        AS rn
      |    FROM d2r) WHERE rn = 1)
      |SELECT a2.cl AS cluster, CAST(COUNT(*) AS BIGINT) AS n_members,
      |  CAST(SUM(CASE WHEN a2.cl <> a1.cl1 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_changed,
      |  CAST(SUM(a2.d2) AS DOUBLE)
      |    / CAST(MAX(a2.n) * MAX(a2.n) * 1000000 AS DOUBLE) AS inertia
      |FROM a2 JOIN a1 ON a1.vec_id = a2.vec_id
      |GROUP BY a2.cl ORDER BY cluster""".stripMargin

  /** Oracle generated from the SAME k as the graded body: a CTE chain of
    * k−1 (distance, LEAST-merge, argmax, seed) rounds, then the verbatim
    * q297 Lloyd SQL over the assembled seed set.
    */
  private def ppOracle(k: Int): String =
    s"""WITH $xCteSql,
       |${maximinSql("x", k)},
       |$lloydTailSql""".stripMargin

  /** q306 oracle: `rounds` oversampling rounds (distance to the
    * previous round's candidates, LEAST merge, top-ℓ pick), candidate
    * union, then the SAME maximin chain over the candidate elements and
    * the SAME Lloyd tail.
    */
  private def parOracle(k: Int, l: Int, rounds: Int): String = {
    val overs = (1 to rounds).map { j =>
      val prev = if (j == 1) "" else s"om${j - 1}"
      val od =
        s"""od$j AS MATERIALIZED (SELECT vec_id, MIN(dc) AS dist FROM (
           |    SELECT x.vec_id, c.vec_id AS cid,
           |      SUM((x.xq - c.xq) * (x.xq - c.xq)) AS dc
           |    FROM x JOIN oc${j - 1} c ON c.d = x.d GROUP BY 1, 2)
           |  GROUP BY vec_id)""".stripMargin
      val om =
        if (j == 1) s"om1 AS MATERIALIZED (SELECT vec_id, dist AS dmin FROM od1)"
        else
          s"""om$j AS MATERIALIZED (SELECT $prev.vec_id, LEAST($prev.dmin, od$j.dist) AS dmin
             |  FROM $prev JOIN od$j USING (vec_id))""".stripMargin
      s"""$od,
         |$om,
         |op$j AS MATERIALIZED (SELECT vec_id FROM (
         |    SELECT vec_id, ROW_NUMBER() OVER (ORDER BY dmin DESC, vec_id)
         |      AS rn FROM om$j) WHERE rn <= $l),
         |oc$j AS MATERIALIZED (SELECT x.vec_id, x.d, x.xq FROM x JOIN op$j USING (vec_id))""".stripMargin
    }.mkString(",\n")
    val candUnion = (s"SELECT vec_id FROM oc0" +:
      (1 to rounds).map(j => s"SELECT vec_id FROM op$j")).mkString(" UNION ")
    s"""WITH $xCteSql,
       |om0 AS MATERIALIZED (SELECT MIN(vec_id) AS vid FROM x),
       |oc0 AS MATERIALIZED (SELECT x.vec_id, x.d, x.xq FROM x JOIN om0 ON x.vec_id = om0.vid),
       |$overs,
       |cand AS MATERIALIZED (SELECT DISTINCT vec_id FROM ($candUnion)),
       |cx AS MATERIALIZED (SELECT x.vec_id, x.d, x.xq FROM x JOIN cand USING (vec_id)),
       |${maximinSql("cx", k)},
       |$lloydTailSql""".stripMargin
  }

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q299_kmeans_pp", Some(ppOracle(PpK)),
      (spark, dir) => kmeansPlusPlus(t(spark, dir, "embeddings"))),

    QueryDef("q306_kmeans_parallel", Some(parOracle(PpK, ParL, ParRounds)),
      (spark, dir) => kmeansParallel(t(spark, dir, "embeddings"))),

    QueryDef("q297_kmeans_lloyd", Some(kmeansOracle),
      (spark, dir) => kmeansLloyd(t(spark, dir, "embeddings"))),

    QueryDef("q242_label_cohesion", Some(cohesionOracle),
      (spark, dir) => labelCohesion(t(spark, dir, "embeddings"))),

    QueryDef("q233_centroid_assign", Some(assignOracle),
      (spark, dir) => centroidAssignDrift(t(spark, dir, "embeddings"))),

    QueryDef("q218_pca_power", Some(pcaOracle(PcaRounds)),
      (spark, dir) => pcaPowerLoadings(t(spark, dir, "embeddings"))),

    QueryDef("q221_label_centroids", Some(centroidOracle),
      (spark, dir) => labelCentroidDists(t(spark, dir, "embeddings"))))
}
