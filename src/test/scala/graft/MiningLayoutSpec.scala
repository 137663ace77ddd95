package graft

import org.apache.spark.sql.functions._

import graft.ops.{LayoutOps, MiningOps}

/** Fixture-backed pins for the mining (q121-q123) and layout (q124)
  * operators: tiny corpora with hand-computed answers, exact bit-level
  * checks of the Morton interleave, and the file-skipping consequence
  * the z-order layout exists for.
  */
class MiningLayoutSpec extends SparkSpec {
  import spark.implicits._

  test("brand pairs: support counts unordered pairs once per order") {
    val li = Seq(
      (1L, 101L), (1L, 102L), (1L, 102L), // order 1: brands A,B (dup line collapses)
      (2L, 101L), (2L, 103L),             // order 2: brands A,C
      (3L, 101L), (3L, 102L), (3L, 103L)  // order 3: A,B,C -> 3 pairs
    ).toDF("l_orderkey", "l_partkey")
    val part = Seq((101L, "A"), (102L, "B"), (103L, "C"))
      .toDF("p_partkey", "p_brand")
    val out = MiningOps.brandPairs(li, part).collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    assert(out == Map(("A", "B") -> 2L, ("A", "C") -> 2L, ("B", "C") -> 1L))
  }

  test("brand triples: only orders carrying all three brands count") {
    val li = Seq(
      (1L, 101L), (1L, 102L), (1L, 103L),              // A,B,C
      (2L, 101L), (2L, 102L), (2L, 103L), (2L, 103L),  // A,B,C (dup line)
      (3L, 101L), (3L, 102L),                          // pair only
      (4L, 101L), (4L, 102L), (4L, 103L), (4L, 104L)   // A,B,C,D -> 4 triples
    ).toDF("l_orderkey", "l_partkey")
    val part = Seq((101L, "A"), (102L, "B"), (103L, "C"), (104L, "D"))
      .toDF("p_partkey", "p_brand")
    val out = MiningOps.brandTriples(li, part).collect()
      .map(r => ((r.getString(0), r.getString(1), r.getString(2)), r.getLong(3)))
      .toMap
    assert(out == Map(
      ("A", "B", "C") -> 3L, ("A", "B", "D") -> 1L,
      ("A", "C", "D") -> 1L, ("B", "C", "D") -> 1L), s"got $out")
  }

  test("BPE pairs: adjacent counts, short and null docs contribute nothing") {
    val docs = Seq(
      (1L, Some("a b a b")), // pairs: "a b", "b a", "a b"
      (2L, Some("a b")),     // pair: "a b"
      (3L, Some("x")),       // single token -> nothing
      (4L, None)             // null text -> nothing
    ).toDF("doc_id", "text")
    val out = MiningOps.bpePairs(docs).collect()
      .map(r => r.getString(0) -> r.getLong(1))
    // top-k order: cnt desc, pair asc — deterministic
    assert(out.toSeq == Seq("a b" -> 3L, "b a" -> 1L))
  }

  test("collocation lift matches the hand-computed probability ratio") {
    // corpus: "a b" x2 and "c c" x1 -> unigrams a:2 b:2 c:2 (n_uni=6),
    // pairs "a b":2 "c c":1 (n_pair=3)
    // lift(a,b) = (2*6*6)/(2*2*3) = 6.0 ; lift(c,c) = (1*6*6)/(2*2*3) = 3.0
    val docs = Seq((1L, Some("a b")), (2L, Some("a b")), (3L, Some("c c")))
      .toDF("doc_id", "text")
    val out = MiningOps.collocationLift(docs, minSupport = 1).collect()
      .map(r => ((r.getString(0), r.getString(1)), (r.getLong(2), r.getDouble(3))))
      .toMap
    assert(out == Map(("a", "b") -> ((2L, 6.0)), ("c", "c") -> ((1L, 3.0))))
  }

  test("Morton interleave: known bit patterns") {
    val df = Seq((1L, 0L), (0L, 1L), (3L, 5L), (65535L, 65535L), (0L, 0L))
      .toDF("x", "y")
      .select(LayoutOps.zValue(col("x"), col("y")).as("z"))
    // x bits land at even positions, y bits at odd:
    // z(1,0)=1, z(0,1)=2, z(3,5)= (1+4) | (2+32) = 39,
    // z(65535,65535) = 2^32-1, z(0,0)=0
    assert(df.collect().map(_.getLong(0)).toSeq ==
      Seq(1L, 2L, 39L, (1L << 32) - 1, 0L))
  }

  test("z-value SQL text agrees with the Column implementation") {
    // the oracle formula is generated from the same loop; evaluate the
    // SQL text through Spark's parser on the same rows and compare
    val df = Seq((7L, 9L), (123L, 456L), (65535L, 0L)).toDF("x", "y")
    val both = df.select(
      LayoutOps.zValue(col("x"), col("y")).as("a"),
      expr(LayoutOps.zValueSql("x", "y")).as("b"))
    assert(both.collect().forall(r => r.getLong(0) == r.getLong(1)))
  }

  test("z-order layout prunes the secondary dimension; a plain sort cannot") {
    // 64x64 grid of points, 16 range partitions. After a z-order layout a
    // filter band on y (the dimension a plain x-sort ignores) overlaps only
    // the partitions whose curve tiles intersect the band; after an x-sort
    // every partition spans the full y range.
    val pts = spark.range(0, 64L * 64).select(
      (col("id") % 64).as("x"), (col("id") / 64).as("y"))
    def overlapping(df: org.apache.spark.sql.DataFrame): Long =
      df.withColumn("pid", spark_partition_id())
        .groupBy("pid").agg(min("y").as("y_min"), max("y").as("y_max"))
        .where(col("y_min") <= 7)  // partitions a y <= 7 scan must read
        .count()
    val zLayout = LayoutOps.zorderBy(pts, col("x"), col("y"), 16)
    val xLayout = pts.repartitionByRange(16, col("x"))
    val zHit = overlapping(zLayout)
    val xHit = overlapping(xLayout)
    assert(xHit == 16, s"x-sorted layout should leave every partition unpruned, got $xHit")
    assert(zHit <= 8, s"z-order should confine the y band to few partitions, got $zHit")
  }

  test("equi-depth bins: uniform 1..100 splits into ten bins of ten") {
    val vals = (1 to 100).map(_.toDouble).toDF("o_totalprice")
    val out = graft.ops.CurationOps.equidepthBins(vals).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(out.map(_._1).toSeq == (1 to 10))
    assert(out.forall(_._2 == 10L), s"expected 10 rows per bin: ${out.mkString(",")}")
    // bins tile the domain: each bin's max is below the next bin's min
    out.sliding(2).foreach {
      case Array((_, _, _, hi), (_, _, lo, _)) => assert(hi < lo)
      case _ => ()
    }
  }

  test("q124 bucket stats: 32 buckets, extents nested and consistent") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val rows = LayoutOps.zBucketStats(li).collect()
    assert(rows.nonEmpty && rows.length <= 32)
    rows.foreach { r =>
      val (b, zmin, zmax) = (r.getInt(0), r.getLong(2), r.getLong(3))
      assert(zmin <= zmax)
      // bucket id is exactly the top 5 bits of both extents
      assert((zmin >> 27) == b && (zmax >> 27) == b)
    }
    assert(rows.map(_.getLong(1)).sum == li.count())
  }

  test("zone-map scan skips files outside the predicate and stays exact") {
    import graft.util.Tables.t
    val li = t(spark, sf, "lineitem")
    val (total, read, pruned) =
      LayoutOps.zoneMapPrunedScan(spark, li, "1997-01-01", "1997-12-31")
    // a one-year predicate over a ~7-year span must skip files...
    assert(read < total, s"no files skipped: read $read of $total")
    assert(read > 0)
    // ...and the pruned read + residual filter is exactly the filtered table
    val expected = li.where(
      col("l_shipdate") >= lit("1997-01-01 00:00:00").cast("timestamp_ntz") &&
        col("l_shipdate") <= lit("1997-12-31 00:00:00").cast("timestamp_ntz"))
      .count()
    assert(pruned.count() === expected)
  }

  test("z-order 2-D pruned scan: exact result, and files were skipped") {
    import graft.util.Tables.t
    val li = t(spark, sf, "lineitem")
    val (total, read, pruned) = LayoutOps.zorderPrunedScan(spark, li)
    assert(read < total, s"expected skipping, read $read of $total")
    // exact despite pruning: residual filter over survivors == logical
    // table filtered directly (the q264 exactness contract, now 2-D)
    val r = li.agg(org.apache.spark.sql.functions.max("l_partkey"),
      org.apache.spark.sql.functions.max("l_suppkey")).collect()(0)
    val (mp, ms) = (r.getLong(0), r.getLong(1))
    val expected = li.where(
      li("l_partkey").between(mp / 4, 2 * mp / 5) &&
        li("l_suppkey").between(ms / 4, 2 * ms / 5)).count()
    assert(pruned.count() === expected)
  }

  test("z-order prunes the SECOND dimension where a 1-D layout cannot") {
    import graft.util.Tables.t
    val li = t(spark, sf, "lineitem")
    val ms = li.agg(org.apache.spark.sql.functions.max("l_suppkey"))
      .collect()(0).getLong(0)
    // suppkey-only box (partkey unconstrained): a partkey-sorted layout
    // has every file spanning the full suppkey domain -> reads ALL
    // files; the z-layout keeps suppkey locally dense -> skips files
    val box = Some((0L, Long.MaxValue, ms / 4, 2 * ms / 5))
    val (totalZ, readZ, prunedZ) =
      LayoutOps.zorderPrunedScan(spark, li, box = box)
    val (total1, read1, pruned1) =
      LayoutOps.zorderPrunedScan(spark, li, oneDLayout = true, box = box)
    assert(read1 === total1, "1-D partkey layout cannot prune a suppkey box")
    assert(readZ < totalZ, s"z layout should skip files, read $readZ/$totalZ")
    assert(prunedZ.count() === pruned1.count())
  }

  test("a fully-pruned zone-map scan returns empty, never a failed read") {
    import graft.util.Tables.t
    val li = t(spark, sf, "lineitem")
    val (total, read, pruned) =
      LayoutOps.zoneMapPrunedScan(spark, li, "2099-01-01", "2099-12-31")
    assert(read === 0L && total > 0L)
    assert(pruned.count() === 0L)
  }

  test("Hilbert index: the canonical 4x4 curve, cell by cell") {
    import graft.functions.HilbertIndex
    // the classic first-order layout (d counts along the U shapes);
    // also the fixture that catches the s-relative-flip bug (negative
    // coordinates at x=3)
    val expected = Map(
      (0, 0) -> 0, (1, 0) -> 1, (1, 1) -> 2, (0, 1) -> 3,
      (0, 2) -> 4, (0, 3) -> 5, (1, 3) -> 6, (1, 2) -> 7,
      (2, 2) -> 8, (2, 3) -> 9, (3, 3) -> 10, (3, 2) -> 11,
      (3, 1) -> 12, (2, 1) -> 13, (2, 0) -> 14, (3, 0) -> 15)
    for (((x, y), d) <- expected)
      assert(HilbertIndex.compute(x.toLong, y.toLong, 2) === d.toLong,
        s"xy2d($x, $y)")
  }

  test("Hilbert never jumps; Morton does — the locality the curve buys") {
    import graft.functions.HilbertIndex
    // over the full 32x32 grid: walking the Hilbert curve in d order,
    // every consecutive pair of cells is grid-adjacent (Manhattan
    // distance exactly 1). The Morton walk takes power-of-two jumps at
    // quadrant seams — the property that makes Hilbert-clustered files
    // carry tighter bounding boxes.
    val bits = 5
    val n = 1 << bits
    val cells = for (x <- 0 until n; y <- 0 until n) yield (x, y)
    val byH = cells.sortBy { case (x, y) =>
      HilbertIndex.compute(x.toLong, y.toLong, bits) }
    // d values are a permutation of 0..n^2-1 (the curve is a bijection)
    val ds = cells.map { case (x, y) =>
      HilbertIndex.compute(x.toLong, y.toLong, bits) }
    assert(ds.sorted == (0L until (n.toLong * n)).toSeq, "not a bijection")
    val hSteps = byH.sliding(2).map { case Seq((x1, y1), (x2, y2)) =>
      math.abs(x1 - x2) + math.abs(y1 - y2) }.toSeq
    assert(hSteps.forall(_ == 1), s"Hilbert jumped: max ${hSteps.max}")
    // Morton, same grid: interleave via the Scala mirror of zValue
    def morton(x: Int, y: Int): Long =
      (0 until bits).map(i =>
        (((x >> i) & 1).toLong << (2 * i)) |
          (((y >> i) & 1).toLong << (2 * i + 1))).reduce(_ | _)
    val zSteps = cells.sortBy { case (x, y) => morton(x, y) }
      .sliding(2).map { case Seq((x1, y1), (x2, y2)) =>
        math.abs(x1 - x2) + math.abs(y1 - y2) }.toSeq
    assert(zSteps.max > 1, "Morton unexpectedly adjacent everywhere")
  }

  test("q315 census: full grid coverage, nested extents, counts conserved") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val out = LayoutOps.hilbertBucketStats(li).collect()
    assert(out.length === 32, s"normalized grid must fill all buckets: ${out.length}")
    assert(out.map(_.getAs[Long]("n")).sum === li.count())
    // h extents nested: bucket b's index range sits inside [b, b+1) << 27
    out.foreach { r =>
      val b = r.getInt(0).toLong
      assert(r.getAs[Long]("h_min") >= (b << 27) &&
        r.getAs[Long]("h_max") < ((b + 1) << 27), s"extent escape: $r")
    }
  }

  test("Hilbert files carry tighter boxes than Morton under UNALIGNED range cuts") {
    // The honest version of the locality claim: on ALIGNED power-of-two
    // buckets Morton tiles are perfect rectangles and there is nothing
    // to win (the first draft of this test compared the 32 aligned
    // census buckets and measured a tie) — the Hilbert advantage is for
    // ARBITRARY curve ranges (Moon et al. 2001), which is exactly what
    // range-partitioned FILES are: repartitionByRange cuts the curve at
    // data quantiles, not quadrant seams. Dense 128x128 grid, 24 files
    // (deliberately not a power of four): summed per-file bounding-box
    // area must be strictly smaller under the Hilbert layout.
    val pts = spark.range(0, 128L * 128).select(
      (col("id") % 128).as("x"), (col("id") / 128).cast("long").as("y"))
    def boxSum(df: org.apache.spark.sql.DataFrame): Long =
      df.withColumn("pid", spark_partition_id())
        .groupBy("pid")
        .agg((max("x") - min("x") + 1).as("w"), (max("y") - min("y") + 1).as("h"))
        .agg(sum(col("w") * col("h"))).collect().head.getLong(0)
    val h = boxSum(LayoutOps.hilbertBy(pts, col("x"), col("y"), 24, bits = 7))
    val z = boxSum(LayoutOps.zorderBy(pts, col("x"), col("y"), 24, bits = 7))
    assert(h < z, s"Hilbert files must be tighter on unaligned cuts: $h vs $z")
  }

  test("q316 Hilbert pruned scan: exact result, files skipped, never more than z-order") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val (totalH, readH, prunedH) =
      LayoutOps.zorderPrunedScan(spark, li, hilbert = true)
    val (totalZ, readZ, _) = LayoutOps.zorderPrunedScan(spark, li)
    assert(readH < totalH, s"no files skipped: $readH of $totalH")
    assert(readH <= readZ,
      s"Hilbert must prune at least as hard as z-order: $readH vs $readZ")
    // the pruned read is exact regardless of layout: equal to the
    // logical-table box scan
    val (loP, hiP, loS, hiS) = {
      val r = li.agg(max(col("l_partkey")).as("mp"),
        max(col("l_suppkey")).as("ms")).collect()(0)
      (r.getLong(0) / 4, 2 * r.getLong(0) / 5,
        r.getLong(1) / 4, 2 * r.getLong(1) / 5)
    }
    val direct = li.where(col("l_partkey").between(loP, hiP) &&
      col("l_suppkey").between(loS, hiS)).count()
    assert(prunedH.count() === direct, "pruned read changed the answer")
  }

  test("consistent hashing: adding a shard only pulls keys to itself, ~1/(n+1)") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    for (d <- Seq(docs, docs.repartition(11))) {
      val out = LayoutOps.consistentShards(d).collect()
        .map(r => r.getInt(0) ->
          ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
      val total = out.values.map(_._1).sum
      assert(total === docs.count())
      assert(out.values.map(_._2).sum === total, "after-counts conserved")
      // THE theorem: survivors receive nothing; only the new shard does
      for (s <- 0 until 16)
        assert(out(s)._3 === 0L, s"survivor shard $s received keys: $out")
      val moved = out(16)._3
      assert(out(16)._2 === moved && out(16)._1 === 0L)
      // expected ~1/17 = 5.9%; allow [1%, 15%] for hash variance at n=500
      assert(moved * 100 >= total && moved * 100 <= 15 * total,
        s"consistent move rate out of band: $moved of $total")
      // contrast: modulo placement reshuffles the majority
      val modMoved = d.select((col("doc_id") % 16 =!=
        col("doc_id") % 17).cast("long").as("m"))
        .agg(sum("m")).collect().head.getLong(0)
      assert(modMoved * 2 > total,
        s"modulo rehash should move most keys: $modMoved of $total")
      assert(moved * 5 < modMoved,
        "consistent hashing must move far fewer keys than modulo")
    }
  }
}
