package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.QueryDef
import graft.util.Tables._

/** Deduplication operators over `documents` (SURVEY §7.4): exact
  * (group-by-content), MinHash+LSH banding, SimHash, and word-n-gram
  * Jaccard. All are pure DataFrame pipelines — shingle explode, hash-family
  * min-aggregation, band-bucket joins — so Catalyst plans partial
  * aggregation and shuffles on the bucket keys; nothing is collected to the
  * driver and every stage scales horizontally.
  *
  * MinHash/SimHash use Spark's xxhash64/hash (no SQL oracle — the hash
  * family is engine-specific); DedupSpec pins their behavior on planted
  * near-duplicates. Exact and n-gram-Jaccard have full DuckDB oracles.
  */
object DedupOps {

  /** Distinct word-3-gram shingles per document. */
  def shingles(docs: DataFrame): DataFrame =
    docs.withColumn("toks", split(col("text"), " "))
      .where(size(col("toks")) >= 3)
      .withColumn("shingles", expr(
        """array_distinct(transform(sequence(0, size(toks) - 3),
          |  i -> concat_ws(' ', slice(toks, i + 1, 3))))""".stripMargin))
      .select(col("doc_id"), col("shingles"))

  /** MinHash signatures: `perms` hash functions h_j(s) = xxhash64(s, j),
    * each minimized over the shingle set. Shaped "tall": explode (shingle,
    * permutation-index) into rows and run a plain two-level MIN aggregate.
    * The shingle set is already a per-row array, so the whole signature is
    * a map-side scalar — one UDF call per document, zero shuffles,
    * pipelined with the parquet scan. That is the 100 TB shape: signatures
    * never leave the mapper; the only exchanges in the dedup pipeline are
    * the (band, bhash) bucket aggregation downstream. (Rejected shapes,
    * measured at sf0.1: explode×perms + two-level MIN aggregate
    * materializes/shuffles ~17M rows; higher-order `transform`/`array_min`
    * is interpreted per element, ~50x slower; a 64-column wide MIN
    * aggregate makes Janino compile a megamorphic codegen blob, ~100s of
    * compile time per action.) Hash family byte-equal to the
    * `MinHashSketch` Aggregator — cross-checked in MinHashSketchSpec.
    */
  def minhashSignatures(docs: DataFrame, perms: Int): DataFrame = {
    val sig = udf((sh: Seq[String]) =>
      if (sh == null) null
      else graft.functions.MinHashSketch.signature(sh, perms))
    shingles(docs).select(col("doc_id"), sig(col("shingles")).as("sig"))
  }

  /** LSH dedup assignment: band the signature, then give every doc the min
    * doc_id over all band-buckets it lands in — a 1-hop canonical id.
    * Bucket-min is a whole-partition window (no orderBy), so the plan is a
    * single pass: one shuffle on (band, bhash), one on doc_id — no
    * self-join, no cache, no recomputation. Output always has one row per
    * doc (`canonical_id = doc_id` when no near-dup candidate exists).
    */
  def minhashAssign(docs: DataFrame, bands: Int = 8, rowsPerBand: Int = 8): DataFrame = {
    val sigs = minhashSignatures(docs, bands * rowsPerBand)
    val bucketed = sigs
      .select(col("doc_id"), explode(expr(
        s"""transform(sequence(0, ${bands - 1}),
           |  b -> named_struct('band', b,
           |    'bhash', xxhash64(concat_ws(',', slice(sig, b * $rowsPerBand + 1, $rowsPerBand)))))""".stripMargin))
        .as("bk"))
      .select(col("doc_id"), col("bk.band").as("band"), col("bk.bhash").as("bhash"))
    bucketed
      .withColumn("bucket_min",
        min(col("doc_id")).over(Window.partitionBy("band", "bhash")))
      .groupBy("doc_id")
      .agg(min(col("bucket_min")).as("canonical_id"))
      .withColumn("is_dup", (col("canonical_id") < col("doc_id")).cast("int"))
      .orderBy("doc_id")
  }

  /** 64-bit SimHash over distinct tokens; banded into 4×16-bit chunks for
    * candidate buckets, same 1-hop canonical assignment as MinHash.
    */
  def simhashAssign(docs: DataFrame): DataFrame = {
    val sigs = simhashSignatures(docs)
    val bucketed = sigs.select(col("doc_id"), col("simhash"),
      explode(expr(
        """transform(sequence(0, 3),
          |  b -> named_struct('band', b,
          |    'chunk', shiftright(simhash, b * 16) & 65535))""".stripMargin)).as("bk"))
      .select(col("doc_id"), col("simhash"),
        col("bk.band").as("band"), col("bk.chunk").as("chunk"))
    bucketed
      .withColumn("bucket_min",
        min(col("doc_id")).over(Window.partitionBy("band", "chunk")))
      .groupBy("doc_id")
      .agg(min(col("bucket_min")).as("canonical_id"), min(col("simhash")).as("simhash"))
      .select(col("doc_id"), col("canonical_id"), col("simhash"))
      .orderBy("doc_id")
  }

  /** 64-bit SimHash per doc: per-bit signed balance over the distinct
    * token hashes (xxhash64, seed 42 — same family as the SQL builtin),
    * sign bits packed into a long. Like the MinHash signature this is a
    * map-side scalar over the per-row token array — zero shuffles; the
    * rejected explode(64 bits)×token two-level aggregate shuffled ~17M
    * rows at sf0.1 for identical output (pinned in DedupSpec).
    */
  def simhashSignatures(docs: DataFrame): DataFrame = {
    val sim = udf((toks: Seq[String]) => {
      val bal = new Array[Int](64)
      val in = if (toks == null) Seq.empty[String] else toks
      in.foreach { t =>
        val h = org.apache.spark.sql.catalyst.expressions.XxHash64Function
          .hash(org.apache.spark.unsafe.types.UTF8String.fromString(t),
            org.apache.spark.sql.types.StringType, 42L)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) bal(b) += 1 else bal(b) -= 1
          b += 1
        }
      }
      var acc = 0L
      var b = 0
      while (b < 64) { if (bal(b) > 0) acc |= (1L << b); b += 1 }
      acc
    })
    docs.select(col("doc_id"),
      sim(array_distinct(split(col("text"), " "))).as("simhash"))
  }

  /** Hamming distance between two docs' simhashes (used by DedupSpec). */
  def simhashDistance(sigs: DataFrame): DataFrame =
    sigs.as("a").join(sigs.as("b"), col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        bit_count(col("a.simhash").bitwiseXOR(col("b.simhash"))).as("hamming"))

  /** Word-3-gram Jaccard near-dup pairs. Candidates = pairs sharing a RARE
    * shingle (df in [2,5]) — the scale path: common shingles never fan out
    * into quadratic candidate sets. The Jaccard >= 0.3 test is pure integer
    * arithmetic (10*common >= 3*union), so the DuckDB oracle matches bit-
    * for-bit.
    */
  def ngramJaccardPairs(docs: DataFrame): DataFrame = {
    // the plan is diamond-shaped (sh feeds 4 branches, rareEx both sides of
    // a self-join); cache the shared frames or every branch re-derives the
    // shingle pipeline — measured 225s -> 4s at sf0.1
    val sh = shingles(docs).cache()
    val ex = sh.select(col("doc_id"), explode(col("shingles")).as("s")).cache()
    val rare = ex.groupBy("s").agg(count(lit(1)).as("df"))
      .where(col("df").between(2, 5)).select("s")
    val rareEx = ex.join(broadcast(rare), "s").cache()
    val cand = rareEx.as("a").join(rareEx.as("b"),
        col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    val withSets = cand
      .join(sh.select(col("doc_id").as("doc_a"), col("shingles").as("sa")), "doc_a")
      .join(sh.select(col("doc_id").as("doc_b"), col("shingles").as("sb")), "doc_b")
    withSets
      .select(col("doc_a"), col("doc_b"),
        size(array_intersect(col("sa"), col("sb"))).as("common"),
        size(col("sa")).as("n_a"), size(col("sb")).as("n_b"))
      .where(expr("10 * common >= 3 * (n_a + n_b - common)"))
      .orderBy("doc_a", "doc_b")
  }

  private val ngramJaccardSql =
    """WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents WHERE length(text) - length(replace(text, ' ', '')) + 1 >= 3),
      |sh AS (SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS s
      |       FROM w, UNNEST(range(1, len(w) - 1)) t(i)),
      |rare AS (SELECT s FROM sh GROUP BY s HAVING COUNT(*) BETWEEN 2 AND 5),
      |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      |         FROM (SELECT * FROM sh JOIN rare USING (s)) a
      |         JOIN (SELECT * FROM sh JOIN rare USING (s)) b
      |           ON a.s = b.s AND a.doc_id < b.doc_id),
      |sizes AS (SELECT doc_id, CAST(COUNT(*) AS INT) AS n FROM sh GROUP BY doc_id),
      |com AS (SELECT c.doc_a, c.doc_b, CAST(COUNT(*) AS INT) AS common
      |        FROM cand c
      |        JOIN sh x ON x.doc_id = c.doc_a
      |        JOIN sh y ON y.doc_id = c.doc_b AND y.s = x.s
      |        GROUP BY c.doc_a, c.doc_b)
      |SELECT com.doc_a, com.doc_b, com.common, na.n AS n_a, nb.n AS n_b
      |FROM com
      |JOIN sizes na ON na.doc_id = com.doc_a
      |JOIN sizes nb ON nb.doc_id = com.doc_b
      |WHERE 10 * com.common >= 3 * (na.n + nb.n - com.common)
      |ORDER BY com.doc_a, com.doc_b""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    // Exact dedup = group by full content; keep the min doc_id per group.
    QueryDef(
      "q23_dedup_exact",
      Some("""SELECT MIN(doc_id) AS keep_id, COUNT(*) AS copies
        |FROM documents GROUP BY text ORDER BY keep_id""".stripMargin),
      (spark, dir) =>
        t(spark, dir, "documents")
          .groupBy(col("text"))
          .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("copies"))
          .select("keep_id", "copies")
          .orderBy("keep_id")),

    QueryDef("q24_dedup_minhash", None,
      (spark, dir) => minhashAssign(t(spark, dir, "documents"))),

    QueryDef("q25_dedup_simhash", None,
      (spark, dir) => simhashAssign(t(spark, dir, "documents"))),

    QueryDef("q26_ngram_jaccard", Some(ngramJaccardSql),
      (spark, dir) => ngramJaccardPairs(t(spark, dir, "documents"))))
}
