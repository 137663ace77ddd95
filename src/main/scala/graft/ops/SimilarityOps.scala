package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.QueryDef
import graft.util.Tables._

/** Similarity search over `embeddings` (64-dim float vectors, SURVEY §7.4):
  * brute-force cosine top-k as the correctness baseline, and a
  * random-hyperplane LSH variant as the scale path (bucket join instead of
  * a full cross product). Dot products run through codegen'd higher-order
  * array expressions (`zip_with` + `aggregate`) — a strict left fold, so
  * the summation order is deterministic and matches DuckDB's
  * `list_cosine_similarity` loop bit-for-bit on the same doubles.
  */
object SimilarityOps {

  /** embeddings with the float vector widened to double. */
  def vectors(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "embeddings")
      .select(col("vec_id"), col("label"),
        expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("v"))

  /** Built-in-only cosine (higher-order functions). Interpreted per
    * element — kept as the reference implementation; the hot paths use the
    * codegen'd native expression below, which VectorFunctionsSpec proves
    * bit-identical (both are strict sequential folds).
    */
  def cosineHof(a: String, b: String): Column = {
    def dot(x: String, y: String): Column = expr(
      s"aggregate(zip_with($x, $y, (p, q) -> p * q), CAST(0 AS DOUBLE), (acc, v) -> acc + v)")
    def norm(x: String): Column =
      sqrt(expr(s"aggregate(transform($x, p -> p * p), CAST(0 AS DOUBLE), (acc, v) -> acc + v)"))
    dot(a, b) / (norm(a) * norm(b))
  }

  /** Native Catalyst expression (graft.functions.CosineSimilarity). */
  def cosine(a: String, b: String): Column =
    graft.functions.VectorFunctions.cosineSim(col(a), col(b))

  /** Exact top-k neighbors for the given query rows: broadcast the (small)
    * query side against the full corpus — one scan, no shuffle of the big
    * side before the per-query window.
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val joined = corpus.join(broadcast(queries), col("vec_id") =!= col("q_id"))
      .withColumn("sim", cosine("qv", "v"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("sim").desc, col("vec_id"))
    joined.withColumn("rnk", row_number().over(w))
      .where(col("rnk") <= k)
      .select(col("q_id"), col("rnk"), col("vec_id"))
      .orderBy("q_id", "rnk")
  }

  /** Deterministic random hyperplanes: `tables` independent 8-bit
    * signatures (4×8 planes), seeded driver-side.
    */
  private def planes(tables: Int, bitsPerTable: Int, dim: Int): Seq[Seq[Double]] = {
    val rng = new scala.util.Random(7L)
    Seq.fill(tables * bitsPerTable)(Seq.fill(dim)(rng.nextGaussian()))
  }

  /** Sign-pattern bucket ids, one per LSH table. The plane matrix rides in
    * the UDF closure (broadcast once per task with the serialized closure)
    * and the dot products run as tight JVM loops — the higher-order
    * `aggregate(zip_with(...))` formulation is interpreted per element and
    * measured ~10x slower at sf0.1 for identical output (same strict
    * ascending-index fold, so the doubles round identically).
    */
  private def bucketsUdf(tables: Int, bits: Int, dim: Int): Column => Column = {
    val pl: Array[Array[Double]] = planes(tables, bits, dim).map(_.toArray).toArray
    val f = udf((v: Seq[Double]) => {
      val x = v.toArray
      Array.tabulate(tables) { tb =>
        var acc = 0
        var b = 0
        while (b < bits) {
          val w = pl(tb * bits + b)
          var dot = 0.0
          var i = 0
          while (i < x.length) { dot += x(i) * w(i); i += 1 }
          acc = acc * 2 + (if (dot > 0) 1 else 0)
          b += 1
        }
        acc
      }
    })
    c => f(c)
  }

  /** LSH ANN: bucket each vector into `tables` sign-pattern buckets, join
    * queries to corpus on (table, bucket), rerank candidates by exact
    * cosine. Multiprobe: each query also probes the `bits` buckets at
    * Hamming distance 1 (single-bit flips), recovering near-misses where
    * one hyperplane fell on the wrong side — recall vs brute force is
    * pinned in SimilaritySpec. Scale path: the join fans out only within
    * buckets (~n/2^bits per table per probe), never the full corpus.
    */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      tables: Int = 8, bits: Int = 6, multiprobe: Boolean = true): DataFrame = {
    val buckets = bucketsUdf(tables, bits, 64)
    val corpusB = corpus
      .select(col("vec_id"), col("v"),
        posexplode(buckets(col("v"))).as(Seq("tbl", "bucket")))
    val probes =
      if (multiprobe)
        s"""flatten(transform(bks, b0 ->
           |  concat(array(b0), transform(sequence(0, ${bits - 1}), f -> b0 ^ shiftleft(1, f)))))""".stripMargin
      else "bks"
    val probesPerTable = if (multiprobe) bits + 1 else 1
    val queryB = queries
      .withColumn("bks", buckets(col("qv")))
      // probe index i maps back to its table as i div (probes per table)
      .select(col("q_id"), col("qv"), posexplode(expr(probes)).as(Seq("pi", "bucket")))
      .withColumn("tbl", expr(s"CAST(pi div $probesPerTable AS INT)"))
      .select(col("q_id"), col("qv"), col("tbl"), col("bucket"))
    val cand = corpusB.join(broadcast(queryB), Seq("tbl", "bucket"))
      .where(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("qv"), col("vec_id"), col("v"))
      .dropDuplicates("q_id", "vec_id")
      .withColumn("sim", cosine("qv", "v"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("sim").desc, col("vec_id"))
    cand.withColumn("rnk", row_number().over(w))
      .where(col("rnk") <= k)
      .select(col("q_id"), col("rnk"), col("vec_id"))
      .orderBy("q_id", "rnk")
  }

  /** IVF (inverted-file) ANN: partition the corpus into `cells` Voronoi
    * cells around k-means centroids (seeded on the first `cells` vectors,
    * `iters` Lloyd rounds), then answer queries by exact-reranking only the
    * `probes` nearest cells. The scale path when LSH's data-oblivious
    * buckets waste probes: centroids adapt to the data distribution.
    * All DataFrame ops — centroid recompute is a posexplode + (cell, dim)
    * mean + rebuild, assignment is a broadcast of the (tiny) centroid set.
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      cells: Int = 16, probes: Int = 3, iters: Int = 2): DataFrame = {
    def nearestCells(df: DataFrame, idCol: String, vcol: String,
        centroids: DataFrame, n: Int): DataFrame = {
      val withSim = df.join(broadcast(centroids))
        .withColumn("csim", cosine(vcol, "cv"))
      val w = Window.partitionBy(col(idCol)).orderBy(col("csim").desc, col("cell"))
      withSim.withColumn("crnk", row_number().over(w))
        .where(col("crnk") <= n)
        .drop("cv", "csim", "crnk")
    }

    // seed centroids on the first `cells` vectors, refine with Lloyd rounds
    var centroids = corpus.where(col("vec_id") < cells)
      .select(col("vec_id").cast("int").as("cell"), col("v").as("cv"))
    for (_ <- 1 to iters) {
      val assigned = nearestCells(corpus.select(col("vec_id"), col("v")),
        "vec_id", "v", centroids, 1)
      val means = assigned
        .select(col("vec_id"), posexplode(col("v")).as(Seq("dim", "x")),
          col("cell"))
        .groupBy("cell", "dim").agg(avg(col("x")).as("m"))
        .groupBy("cell")
        .agg(sort_array(collect_list(struct(col("dim"), col("m")))).as("dm"))
        .select(col("cell"), expr("transform(dm, e -> e.m)").as("cv"))
      centroids = means
    }
    centroids = centroids.cache()

    val corpusCells = nearestCells(corpus.select(col("vec_id"), col("v")),
        "vec_id", "v", centroids, 1)
      .select(col("vec_id"), col("v"), col("cell"))
    val queryCells = nearestCells(queries, "q_id", "qv", centroids, probes)
      .select(col("q_id"), col("qv"), col("cell"))
    val cand = corpusCells.join(broadcast(queryCells), Seq("cell"))
      .where(col("vec_id") =!= col("q_id"))
      .dropDuplicates("q_id", "vec_id")
      .withColumn("sim", cosine("qv", "v"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("sim").desc, col("vec_id"))
    cand.withColumn("rnk", row_number().over(w))
      .where(col("rnk") <= k)
      .select(col("q_id"), col("rnk"), col("vec_id"))
      .orderBy("q_id", "rnk")
  }

  private def queriesOf(v: DataFrame, n: Int): DataFrame =
    v.where(col("vec_id") < n).select(col("vec_id").as("q_id"), col("v").as("qv"))

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "q27_ann_bruteforce",
      Some("""WITH q AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id < 20),
        |s AS (SELECT q.vec_id AS q_id, e.vec_id AS vec_id,
        |        list_cosine_similarity(q.qv, CAST(e.embedding AS DOUBLE[])) AS sim
        |      FROM q CROSS JOIN embeddings e WHERE e.vec_id <> q.vec_id),
        |r AS (SELECT q_id, vec_id,
        |        row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, vec_id) AS rnk
        |      FROM s)
        |SELECT q_id, rnk, vec_id FROM r WHERE rnk <= 5 ORDER BY q_id, rnk""".stripMargin),
      (spark, dir) => {
        val v = vectors(spark, dir)
        bruteForceTopK(v, queriesOf(v, 20), k = 5)
      }),

    // Approximate variant: same output shape, no oracle (recall bounded in
    // SimilaritySpec against the brute-force baseline).
    QueryDef("q28_ann_lsh", None,
      (spark, dir) => {
        val v = vectors(spark, dir)
        lshTopK(v, queriesOf(v, 20), k = 5)
      }),

    // IVF variant: same output shape as q27/q28, data-adaptive cells
    // instead of random hyperplanes. No oracle (iterative centroids);
    // SimilaritySpec pins recall vs the brute-force baseline.
    QueryDef("q47_ann_ivf", None,
      (spark, dir) => {
        val v = vectors(spark, dir)
        ivfTopK(v, queriesOf(v, 20), k = 5)
      }),

    // Embedding-cosine near-duplicate assignment: LSH candidates verified
    // by exact cosine >= threshold, then the same 1-hop canonical-id
    // assignment as the text dedup ops (one row per vector, canonical =
    // self when nothing is near). No oracle; SimilaritySpec plants
    // duplicated vectors and checks they collapse.
    QueryDef("q43_embed_neardup", None,
      (spark, dir) => embedNearDup(vectors(spark, dir), threshold = 0.95)))

  def embedNearDup(corpus: DataFrame, threshold: Double,
      tables: Int = 4, bits: Int = 8): DataFrame = {
    val buckets = bucketsUdf(tables, bits, 64)
    val bucketed = corpus
      .select(col("vec_id"), col("v"),
        posexplode(buckets(col("v"))).as(Seq("tbl", "bucket")))
      .cache() // both sides of the self-join below
    val cand = bucketed.as("a")
      .join(bucketed.as("b"),
        col("a.tbl") === col("b.tbl") && col("a.bucket") === col("b.bucket") &&
          col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("vec_a"), col("a.v").as("va"),
        col("b.vec_id").as("vec_b"), col("b.v").as("vb"))
      .dropDuplicates("vec_a", "vec_b")
      .withColumn("sim", cosine("va", "vb"))
      .where(col("sim") >= threshold)
    // undirected edges -> per-vector min neighbor -> canonical
    val neighbors = cand.select(col("vec_a").as("vec_id"), col("vec_b").as("other"))
      .unionByName(cand.select(col("vec_b").as("vec_id"), col("vec_a").as("other")))
      .groupBy("vec_id").agg(min(col("other")).as("min_neighbor"))
    corpus.select(col("vec_id")).join(neighbors, Seq("vec_id"), "left")
      .select(col("vec_id"),
        least(col("vec_id"), coalesce(col("min_neighbor"), col("vec_id"))).as("canonical_id"))
      .withColumn("is_dup", (col("canonical_id") < col("vec_id")).cast("int"))
      .orderBy("vec_id")
  }
}
