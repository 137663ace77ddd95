package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.QueryDef
import graft.util.Tables._

/** Data-layout operators: multi-dimensional clustering via the Z-order
  * (Morton) space-filling curve. At 100 TB the win is file skipping —
  * sorting a fact table by interleave(x, y) before writing makes BOTH
  * `x` and `y` locally dense within every file, so parquet min/max
  * footer stats prune scans filtered on EITHER dimension; a plain sort
  * by x gives up all pruning on y. The curve math is pure bit
  * arithmetic (codegen'd, row-local); the layout step is
  * `repartitionByRange` on the z-value — the exact shape a writer would
  * run before `.write.parquet`, and the one range exchange IS the
  * clustering cost.
  *
  * The graded query (q124) pins the interleave math and its locality
  * consequence cross-engine: per z-range bucket, the count, the exact
  * z-min/max, and the per-dimension bounding boxes — computed by DuckDB
  * from the SAME bit formula (the oracle SQL is generated from one
  * Scala loop, so the two engines cannot drift). The skipping WIN
  * (z-sorted files carry far smaller per-file bounding boxes than
  * naturally-ordered files) is asserted in LayoutSpec, which compares
  * summed bounding-box areas across layouts.
  */
object LayoutOps {

  /** 2-D Morton interleave of the low `bits` bits of x and y: bit i of x
    * lands at position 2i, bit i of y at 2i+1. Long-typed, row-local,
    * whole-stage-codegen friendly (a fixed chain of shift/and/or).
    */
  def zValue(x: Column, y: Column, bits: Int = 16): Column = {
    require(bits > 0 && bits <= 31, s"bits must be in [1, 31], got $bits")
    (0 until bits).map { i =>
      shiftleft(shiftright(x, i).bitwiseAND(lit(1L)), 2 * i)
        .bitwiseOR(shiftleft(shiftright(y, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_ bitwiseOR _)
  }

  /** The same interleave as ANSI SQL text (DuckDB dialect shares the
    * shift/and/or operators) — generated from one loop so the oracle
    * formula cannot drift from [[zValue]].
    */
  def zValueSql(x: String, y: String, bits: Int = 16): String =
    (0 until bits).map { i =>
      s"((($x >> $i) & 1) << ${2 * i}) | ((($y >> $i) & 1) << ${2 * i + 1})"
    }.mkString(" | ")

  /** Cluster a frame along the curve: one range exchange on the z-value
    * plus an in-partition sort — the write-side layout pass. Files
    * written from the result carry tight min/max on both dimensions.
    */
  def zorderBy(df: DataFrame, x: Column, y: Column, numPartitions: Int,
      bits: Int = 16): DataFrame = {
    val z = zValue(pmod(x, lit(1L << bits)), pmod(y, lit(1L << bits)), bits)
    df.withColumn("__z", z)
      .repartitionByRange(numPartitions, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
  }

  /** The q124 body: 32 z-range buckets (top 5 bits of the 32-bit curve)
    * with exact z extents and per-dimension bounding boxes. One
    * partial-agged shuffle on a 5-bit key; the interleave itself never
    * leaves the scan stage.
    */
  def zBucketStats(li: DataFrame, bits: Int = 16): DataFrame = {
    val mask = (1L << bits) - 1
    val zv = zValue(col("l_partkey").bitwiseAND(lit(mask)),
      col("l_suppkey").bitwiseAND(lit(mask)), bits)
    li.select(col("l_partkey"), col("l_suppkey"), zv.as("zv"))
      .groupBy(shiftright(col("zv"), 2 * bits - 5).cast("int").as("bucket"))
      .agg(count(lit(1)).as("n"),
        min(col("zv")).as("z_min"), max(col("zv")).as("z_max"),
        min(col("l_partkey")).as("pk_min"), max(col("l_partkey")).as("pk_max"),
        min(col("l_suppkey")).as("sk_min"), max(col("l_suppkey")).as("sk_max"))
      .orderBy("bucket")
  }

  private val q124Sql: String = {
    val z = zValueSql("x", "y", 16)
    s"""WITH k AS (SELECT l_partkey, l_suppkey,
       |    l_partkey & 65535 AS x, l_suppkey & 65535 AS y FROM lineitem),
       |z AS (SELECT l_partkey, l_suppkey, ($z) AS zv FROM k)
       |SELECT CAST(zv >> 27 AS INT) AS bucket, CAST(COUNT(*) AS BIGINT) AS n,
       |  MIN(zv) AS z_min, MAX(zv) AS z_max,
       |  MIN(l_partkey) AS pk_min, MAX(l_partkey) AS pk_max,
       |  MIN(l_suppkey) AS sk_min, MAX(l_suppkey) AS sk_max
       |FROM z GROUP BY 1 ORDER BY bucket""".stripMargin
  }

  /** Hilbert counterpart of [[zorderBy]]: one range exchange on the
    * Hilbert index plus an in-partition sort. Same write-side cost as
    * z-ordering (the curve value is one codegen'd row-local call);
    * tighter per-file boxes on read (see
    * [[graft.functions.HilbertIndex]]).
    */
  def hilbertBy(df: DataFrame, x: Column, y: Column, numPartitions: Int,
      bits: Int = 16): DataFrame = {
    val h = graft.functions.HilbertFunctions.hilbertIndex(x, y, bits)
    df.withColumn("__h", h)
      .repartitionByRange(numPartitions, col("__h"))
      .sortWithinPartitions("__h")
      .drop("__h")
  }

  /** q315 body: q124's bucket census on the HILBERT curve — 32 curve
    * ranges (top 5 bits of the 32-bit index) with exact index extents
    * and per-dimension bounding boxes, so the graded rows surface the
    * locality the curve buys: every bucket's box is a tight tile of the
    * key plane (LayoutSpec compares summed box areas against the Morton
    * census). Unlike q124 (raw keys, which under-fill the grid at test
    * scale and land in one bucket), coordinates are NORMALIZED onto the
    * full 2^bits grid by exact integer scaling against the key maxima —
    * what a production curve-writer does with its key-domain stats, and
    * scale-free: the census populates all 32 buckets at every SF, and
    * the two maxima are one broadcast row. One partial-agged shuffle on
    * a 5-bit key; the curve math is one native codegen'd call in the
    * scan stage.
    */
  def hilbertBucketStats(li: DataFrame, bits: Int = 16): DataFrame = {
    val grid = 1L << bits
    val mx = li.agg(max(col("l_partkey")).as("mp"),
      max(col("l_suppkey")).as("ms"))
    val hv = graft.functions.HilbertFunctions.hilbertIndex(
      expr(s"l_partkey * $grid div (mp + 1)"),
      expr(s"l_suppkey * $grid div (ms + 1)"), bits)
    li.crossJoin(broadcast(mx))
      .select(col("l_partkey"), col("l_suppkey"), hv.as("hv"))
      .groupBy(shiftright(col("hv"), 2 * bits - 5).cast("int").as("bucket"))
      .agg(count(lit(1)).as("n"),
        min(col("hv")).as("h_min"), max(col("hv")).as("h_max"),
        min(col("l_partkey")).as("pk_min"), max(col("l_partkey")).as("pk_max"),
        min(col("l_suppkey")).as("sk_min"), max(col("l_suppkey")).as("sk_max"))
      .orderBy("bucket")
  }

  /** The Hilbert rounds as a DuckDB MATERIALIZED CTE chain, generated
    * from one Scala loop so the oracle's per-round algebra cannot drift
    * from [[graft.functions.HilbertIndex.compute]]. Each round is named
    * ONCE (hx/hy referenced twice by the next round — inlining would
    * double the expression tree per bit, which is also why the Spark
    * side is a native expression rather than a Column chain);
    * MATERIALIZED pins DuckDB to evaluate rounds once (the q306 CTE
    * doctrine). s·s rides as a precomputed literal so the arithmetic
    * stays BIGINT-typed in both engines.
    */
  private[ops] def hilbertRoundsSql(bits: Int): String = {
    val mask = (1L << bits) - 1
    val grid = 1L << bits
    val h0 =
      s"""m AS (SELECT MAX(l_partkey) AS mp, MAX(l_suppkey) AS ms
         |  FROM lineitem),
         |h0 AS MATERIALIZED (SELECT l_partkey, l_suppkey,
         |  (l_partkey * $grid // (mp + 1)) & $mask AS hx,
         |  (l_suppkey * $grid // (ms + 1)) & $mask AS hy,
         |  CAST(0 AS BIGINT) AS hd FROM lineitem, m)""".stripMargin
    // every reference is qualified with the source CTE name: DuckDB
    // resolves LATERAL column aliases, so a bare `hx` inside the hd
    // expression could bind to the freshly-rotated alias two items up
    // the same SELECT list instead of the incoming round's column
    val rounds = (0 until bits).map { i =>
      val s = 1L << (bits - 1 - i)
      val ss = s * s
      val (px, py, pd) = (s"h$i.hx", s"h$i.hy", s"h$i.hd")
      s"""h${i + 1} AS MATERIALIZED (SELECT l_partkey, l_suppkey,
         |  CASE WHEN ($py & $s) = 0
         |    THEN (CASE WHEN ($px & $s) > 0 THEN $mask - $py ELSE $py END)
         |    ELSE $px END AS hx,
         |  CASE WHEN ($py & $s) = 0
         |    THEN (CASE WHEN ($px & $s) > 0 THEN $mask - $px ELSE $px END)
         |    ELSE $py END AS hy,
         |  $pd + CAST($ss AS BIGINT)
         |    * xor(CASE WHEN ($px & $s) > 0 THEN 3 ELSE 0 END,
         |      CASE WHEN ($py & $s) > 0 THEN 1 ELSE 0 END) AS hd
         |  FROM h$i)""".stripMargin
    }
    (h0 +: rounds).mkString(",\n")
  }

  private val q315Sql: String = {
    val bits = 16
    s"""WITH ${hilbertRoundsSql(bits)}
       |SELECT CAST(hd >> ${2 * bits - 5} AS INT) AS bucket,
       |  CAST(COUNT(*) AS BIGINT) AS n,
       |  MIN(hd) AS h_min, MAX(hd) AS h_max,
       |  MIN(l_partkey) AS pk_min, MAX(l_partkey) AS pk_max,
       |  MIN(l_suppkey) AS sk_min, MAX(l_suppkey) AS sk_max
       |FROM h$bits GROUP BY 1 ORDER BY bucket""".stripMargin
  }

  /** q264 body: a zone-map (manifest) pruned scan — the file-skipping
    * read path of every table format (Iceberg/Delta/Hudi manifests,
    * parquet footer stats) made explicit as an operator. Three steps:
    * (1) lay the fact slice out as range-clustered files (the write
    * side every warehouse already runs; here `repartitionByRange` on
    * the ship date, 16 files); (2) build the zone map — per-file
    * min/max of the cluster column, ONE scan, collected to the planner
    * (O(files) METADATA, the same driver-side planning every table
    * format performs; never row data); (3) answer a range predicate by
    * reading ONLY the files whose [min,max] intersect it, with the
    * predicate re-applied as a residual filter — so the result is
    * EXACT regardless of how the range partitioner split the files,
    * and the oracle can grade it from the logical table alone.
    *
    * At 100 TB the win is the whole point: a year-sized predicate over
    * a decade of data plans ~10% of the files, and the pruned read
    * never touches the rest. LayoutSpec pins the skipping effect
    * itself (selective predicate ⇒ strictly fewer files read).
    */
  def zoneMapPrunedScan(
      spark: SparkSession,
      li: DataFrame,
      lo: String,
      hi: String,
      files: Int = 16): (Long, Long, DataFrame) = {
    // per-invocation temp layout (the replay ops' pattern): a fixed
    // shared warehouse path would let concurrent sessions clobber each
    // other's files between zone-map build and pruned read
    val loc = java.nio.file.Files
      .createTempDirectory("graft-zonemap").toString
    val slice = li.select(col("l_shipdate"), col("l_returnflag"),
      col("l_quantity"), col("l_extendedprice"))
    slice
      .repartitionByRange(files, col("l_shipdate"))
      .write.mode("overwrite").parquet(loc.toString)
    // l_shipdate is TIMESTAMP_NTZ (timezone-free by definition); its
    // fixed-format string rendering is order-isomorphic, so the zone
    // map lives on the string grid and pruning can never depend on a
    // JVM or session timezone
    val zoneMap = spark.read.parquet(loc.toString)
      .groupBy(input_file_name().as("file"))
      .agg(min(col("l_shipdate").cast("string")).as("zlo"),
        max(col("l_shipdate").cast("string")).as("zhi"))
      .collect() // O(files) planner metadata, not row data
    val (loS, hiS) = (lo + " 00:00:00", hi + " 00:00:00")
    val survivors = zoneMap
      .filter(r => r.getAs[String]("zhi") >= loS &&
        r.getAs[String]("zlo") <= hiS)
      .map(_.getAs[String]("file"))
    // a fully-pruned scan (every file's range misses the predicate) is
    // a SUCCESS that returns zero rows, not a failed read: an empty
    // path list would make spark.read.parquet throw on schema inference
    val pruned =
      if (survivors.isEmpty) slice.where(lit(false))
      else spark.read.parquet(survivors.toIndexedSeq: _*)
        .where(col("l_shipdate") >= lit(loS).cast("timestamp_ntz") &&
          col("l_shipdate") <= lit(hiS).cast("timestamp_ntz"))
    (zoneMap.length.toLong, survivors.length.toLong, pruned)
  }

  /** q276 body: the end-to-end payoff of the curve — a 2-D zone-map
    * pruned scan over a Z-ORDERED layout. q124 pins the interleave math
    * and q264 pins 1-D manifest pruning; this composes them the way a
    * production writer does (Delta/Iceberg OPTIMIZE ZORDER): (1) cluster
    * the fact slice along interleave(partkey, suppkey) and write it as
    * `files` parquet files; (2) build the 2-D zone map — per-file
    * min/max of BOTH dimensions, one scan, O(files) planner metadata;
    * (3) answer a 2-D box predicate by reading only the files whose
    * bounding boxes intersect it, residual-filtering so the result is
    * EXACT however the range partitioner cut the curve.
    *
    * Why the curve matters at 100 TB: a 1-D layout prunes its sort
    * dimension perfectly and the other dimension NOT AT ALL (every file
    * spans the full suppkey domain, so a suppkey predicate reads 100% of
    * the data); z-ordering makes every file a tight box in BOTH
    * dimensions, so the same manifest prunes predicates on either — the
    * "prune on EITHER dimension" property MiningLayoutSpec pins by
    * running the same box scan over both layouts. The box bounds are
    * derived from MAX(key)/4-style integer arithmetic (not literals), so
    * the predicate keeps its selectivity at any scale factor and the
    * oracle reproduces it from the logical table alone.
    *
    * Returns (layout file count, files actually read, pruned frame).
    */
  def zorderPrunedScan(
      spark: SparkSession,
      li: DataFrame,
      files: Int = 48,
      oneDLayout: Boolean = false,
      box: Option[(Long, Long, Long, Long)] = None,
      hilbert: Boolean = false): (Long, Long, DataFrame) = {
    val slice = li.select(col("l_partkey"), col("l_suppkey"),
      col("l_quantity"), col("l_extendedprice"))
    val loc = java.nio.file.Files
      .createTempDirectory("graft-zorder").toString
    val laid =
      if (oneDLayout)
        slice.repartitionByRange(files, col("l_partkey"))
          .sortWithinPartitions("l_partkey")
      else if (hilbert)
        hilbertBy(slice, col("l_partkey"), col("l_suppkey"), files)
      else zorderBy(slice, col("l_partkey"), col("l_suppkey"), files)
    laid.write.mode("overwrite").parquet(loc)
    val (loP, hiP, loS, hiS) = box.getOrElse(boxBounds(li))
    val zoneMap = spark.read.parquet(loc)
      .groupBy(input_file_name().as("file"))
      .agg(min(col("l_partkey")).as("pk_lo"), max(col("l_partkey")).as("pk_hi"),
        min(col("l_suppkey")).as("sk_lo"), max(col("l_suppkey")).as("sk_hi"))
      .collect() // O(files) planner metadata, not row data
    val survivors = zoneMap
      .filter(r => r.getAs[Long]("pk_hi") >= loP && r.getAs[Long]("pk_lo") <= hiP &&
        r.getAs[Long]("sk_hi") >= loS && r.getAs[Long]("sk_lo") <= hiS)
      .map(_.getAs[String]("file"))
    val pruned =
      if (survivors.isEmpty) slice.where(lit(false))
      else spark.read.parquet(survivors.toIndexedSeq: _*)
        .where(col("l_partkey").between(loP, hiP) &&
          col("l_suppkey").between(loS, hiS))
    (zoneMap.length.toLong, survivors.length.toLong, pruned)
  }

  /** The graded 2-D box: partkey in [max/4, 2·max/5], suppkey in
    * [max/4, 2·max/5] — scale-free integer arithmetic both engines
    * compute from the table (Scala Long division here, `//` in the
    * oracle; both floor on the positive key domain).
    */
  private def boxBounds(li: DataFrame): (Long, Long, Long, Long) = {
    val r = li.agg(max(col("l_partkey")).as("mp"),
      max(col("l_suppkey")).as("ms")).collect()(0)
    val (mp, ms) = (r.getAs[Long]("mp"), r.getAs[Long]("ms"))
    (mp / 4, 2 * mp / 5, ms / 4, 2 * ms / 5)
  }

  /** The graded q276 aggregate over the z-order-pruned read. */
  def zorderScanQuery(spark: SparkSession, li: DataFrame): DataFrame = {
    val (_, _, pruned) = zorderPrunedScan(spark, li)
    pruned.agg(count(lit(1)).as("n_lines"),
      countDistinct(col("l_partkey")).as("n_parts"),
      moneySum(col("l_extendedprice")).as("revenue"))
  }

  /** q316 body: q276's box scan over a HILBERT layout — the same 2-D
    * zone map, the same scale-free box predicate, the same exact
    * residual-filtered aggregate, with only the write-side curve
    * swapped. Graded against q276's OWN oracle text (the q308/q310
    * two-mechanisms-one-output doctrine): a pruned read is correct only
    * if the layout never changes answers, so holding both curves to one
    * SQL result IS the contract — while MiningLayoutSpec pins the part
    * the oracle can't see, that the Hilbert layout reads no MORE files
    * than z-order for the same box (tighter per-file boxes under the
    * quantile cuts a range partitioner makes).
    */
  def hilbertScanQuery(spark: SparkSession, li: DataFrame): DataFrame = {
    val (_, _, pruned) = zorderPrunedScan(spark, li, hilbert = true)
    pruned.agg(count(lit(1)).as("n_lines"),
      countDistinct(col("l_partkey")).as("n_parts"),
      moneySum(col("l_extendedprice")).as("revenue"))
  }

  private val q276Sql: String =
    s"""WITH b AS (SELECT MAX(l_partkey) // 4 AS lo_p,
       |    2 * MAX(l_partkey) // 5 AS hi_p,
       |    MAX(l_suppkey) // 4 AS lo_s, 2 * MAX(l_suppkey) // 5 AS hi_s
       |  FROM lineitem)
       |SELECT CAST(COUNT(*) AS BIGINT) AS n_lines,
       |  CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS n_parts,
       |  ${sqlMoneySum("l_extendedprice")} AS revenue
       |FROM lineitem, b
       |WHERE l_partkey BETWEEN b.lo_p AND b.hi_p
       |  AND l_suppkey BETWEEN b.lo_s AND b.hi_s""".stripMargin

  /** q323 body: CONSISTENT-HASHING shard placement and its rebalance
    * guarantee, graded — the placement layer under every distributed
    * store this engine would feed (Karger et al. 1997; Dynamo-style
    * virtual nodes): keys and vnodes hash onto the md5 ring (fixed-width
    * hex strings — lexicographic order IS numeric order on [0, 2¹²⁸)),
    * a key belongs to the first vnode clockwise, and ADDING a shard
    * moves only the keys whose ring successor the new vnodes capture —
    * ~1/(n+1) of them — where modulo placement reshuffles ~n/(n+1) of
    * the corpus. The graded census runs BOTH topologies (16 shards,
    * then +1 with 8 vnodes each) and emits per-shard before/after/
    * arrived counts, so the movement bound is in the hash-graded rows;
    * LayoutSpec pins the two theorems (consistent move-rate near 1/17,
    * modulo move-rate near 16/17) and that survivors never change
    * shards.
    *
    * Scale shape: the vnode ring is a bounded broadcast relation
    * (shards × vnodes rows); each key's successor is ONE
    * map-side-combinable min_by over the cross of (key, ring) — a scan,
    * no shuffle until the final shard-keyed census. Wrap-around rides a
    * coalesce to the ring's global minimum vnode (broadcast row).
    */
  def consistentShards(docs: DataFrame, shards: Int = 16,
      vnodes: Int = 8): DataFrame = {
    val spark = docs.sparkSession
    def ring(n: Int): DataFrame = spark.range(n.toLong * vnodes)
      .select(expr(s"CAST(id div $vnodes AS INT)").as("shard"),
        md5(concat(lit("shard:"),
          expr(s"CAST(id div $vnodes AS STRING)"),
          lit(":"), expr(s"CAST(id % $vnodes AS STRING)"))).as("rpos"))
    def assign(n: Int): DataFrame = {
      val r = ring(n)
      val wrap = r.orderBy("rpos").limit(1)
        .select(col("shard").as("wrap_shard"))
      docs.select(col("doc_id"),
          md5(concat(lit("doc:"), col("doc_id").cast("string"))).as("kpos"))
        .join(broadcast(r))
        .groupBy("doc_id", "kpos")
        .agg(min_by(col("shard"),
          when(col("rpos") >= col("kpos"), col("rpos"))).as("succ"))
        .crossJoin(broadcast(wrap))
        .select(col("doc_id"),
          coalesce(col("succ"), col("wrap_shard")).as("shard"))
    }
    val a = assign(shards).withColumnRenamed("shard", "shard_a")
    val b = assign(shards + 1).withColumnRenamed("shard", "shard_b")
    val joined = a.join(b, Seq("doc_id"))
    val grid = spark.range(shards + 1).select(col("id").cast("int").as("shard"))
    grid.join(joined.groupBy(col("shard_a").as("shard"))
        .agg(count(lit(1)).as("n_before")), Seq("shard"), "left")
      .join(joined.groupBy(col("shard_b").as("shard"))
        .agg(count(lit(1)).as("n_after"),
          sum(when(col("shard_a") =!= col("shard_b"), 1L).otherwise(0L))
            .as("n_arrived")), Seq("shard"), "left")
      .select(col("shard"),
        coalesce(col("n_before"), lit(0L)).as("n_before"),
        coalesce(col("n_after"), lit(0L)).as("n_after"),
        coalesce(col("n_arrived"), lit(0L)).as("n_arrived"))
      .orderBy("shard")
  }

  private val consistentShardsSql: String =
    """WITH ring_a AS (
      |  SELECT CAST(v.range // 8 AS INT) AS shard,
      |    md5('shard:' || CAST(v.range // 8 AS VARCHAR) || ':'
      |      || CAST(v.range % 8 AS VARCHAR)) AS rpos
      |  FROM range(128) v),
      |ring_b AS (
      |  SELECT CAST(v.range // 8 AS INT) AS shard,
      |    md5('shard:' || CAST(v.range // 8 AS VARCHAR) || ':'
      |      || CAST(v.range % 8 AS VARCHAR)) AS rpos
      |  FROM range(136) v),
      |k AS (SELECT doc_id, md5('doc:' || CAST(doc_id AS VARCHAR)) AS kpos
      |  FROM documents),
      |wa AS (SELECT shard FROM ring_a ORDER BY rpos LIMIT 1),
      |wb AS (SELECT shard FROM ring_b ORDER BY rpos LIMIT 1),
      |aa AS (
      |  SELECT k.doc_id, COALESCE(
      |      min_by(r.shard, CASE WHEN r.rpos >= k.kpos THEN r.rpos END),
      |      (SELECT shard FROM wa)) AS shard_a
      |  FROM k CROSS JOIN ring_a r GROUP BY k.doc_id, k.kpos),
      |bb AS (
      |  SELECT k.doc_id, COALESCE(
      |      min_by(r.shard, CASE WHEN r.rpos >= k.kpos THEN r.rpos END),
      |      (SELECT shard FROM wb)) AS shard_b
      |  FROM k CROSS JOIN ring_b r GROUP BY k.doc_id, k.kpos),
      |j AS (SELECT aa.doc_id, shard_a, shard_b
      |  FROM aa JOIN bb ON aa.doc_id = bb.doc_id),
      |g AS (SELECT CAST(v.range AS INT) AS shard FROM range(17) v)
      |SELECT g.shard,
      |  CAST(COALESCE(SUM(CASE WHEN j.shard_a = g.shard THEN 1 END), 0)
      |    AS BIGINT) AS n_before,
      |  CAST(COALESCE(SUM(CASE WHEN j.shard_b = g.shard THEN 1 END), 0)
      |    AS BIGINT) AS n_after,
      |  CAST(COALESCE(SUM(CASE WHEN j.shard_b = g.shard
      |      AND j.shard_a <> j.shard_b THEN 1 END), 0)
      |    AS BIGINT) AS n_arrived
      |FROM g LEFT JOIN j ON TRUE
      |GROUP BY g.shard ORDER BY g.shard""".stripMargin

  /** The graded q264 aggregate over the pruned read. */
  def zoneMapQuery(spark: SparkSession, li: DataFrame): DataFrame = {
    val (_, _, pruned) =
      zoneMapPrunedScan(spark, li, "1997-01-01", "1997-12-31")
    pruned.groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n_lines"),
        moneySum(col("l_extendedprice")).as("revenue"))
      .orderBy("l_returnflag")
  }

  private val q264Sql: String =
    s"""SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n_lines,
       |  ${sqlMoneySum("l_extendedprice")} AS revenue
       |FROM lineitem
       |WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
       |  AND l_shipdate <= TIMESTAMP '1997-12-31 00:00:00'
       |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "q124_zorder_stats",
      Some(q124Sql),
      (spark, dir) => zBucketStats(t(spark, dir, "lineitem"))),

    QueryDef(
      "q264_zonemap_scan",
      Some(q264Sql),
      (spark, dir) => zoneMapQuery(spark, t(spark, dir, "lineitem"))),

    QueryDef(
      "q276_zorder_scan",
      Some(q276Sql),
      (spark, dir) => zorderScanQuery(spark, t(spark, dir, "lineitem"))),

    QueryDef(
      "q315_hilbert_stats",
      Some(q315Sql),
      (spark, dir) => hilbertBucketStats(t(spark, dir, "lineitem"))),

    // Same oracle text as q276 BY DESIGN: the pruned-read contract is
    // that layout never changes answers; two curves, one result.
    QueryDef(
      "q316_hilbert_scan",
      Some(q276Sql),
      (spark, dir) => hilbertScanQuery(spark, t(spark, dir, "lineitem"))),

    QueryDef(
      "q323_consistent_hash",
      Some(consistentShardsSql),
      (spark, dir) => consistentShards(t(spark, dir, "documents"))))
}
