package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.{AnnIndexOps, SimilarityOps}

/** ANN index build/serve split (q326) + incremental append (q330):
  * stored-index serve must be byte-identical to the inline-fit q309
  * plan, the serve side must READ ONLY THE INDEX TABLES (partition-
  * pruned to the probed cells), and appending must leave the frozen
  * centroids/codebooks untouched while making the new vectors
  * discoverable.
  */
class AnnIndexSpec extends SparkSpec {
  import spark.implicits._

  private def corpus: DataFrame = SimilarityOps.vectors(spark, sf)
  private def queries(n: Int): DataFrame =
    corpus.where(col("vec_id") < n)
      .select(col("vec_id").as("q_id"), col("v").as("qv"))

  test("q326 stored-index serve == inline-fit q309, byte-identical") {
    val v = corpus
    AnnIndexOps.buildResidualIndex(spark, v, "graft_annspec")
    val stored = AnnIndexOps.serveTopK(spark, queries(20), "graft_annspec")
      .collect().toSeq
    val inline = SimilarityOps.ivfPqResidualTopK(v, queries(20))
      .collect().toSeq
    assert(stored === inline,
      "the persistence layer must not move a single row vs the inline fit")
  }

  test("serve is repeatable from the stored index (no refit, no mutation)") {
    // build once in the test above or here; serve twice must agree
    AnnIndexOps.buildResidualIndex(spark, corpus, "graft_annspec2")
    val a = AnnIndexOps.serveTopK(spark, queries(10), "graft_annspec2")
      .collect().toSeq
    val b = AnnIndexOps.serveTopK(spark, queries(10), "graft_annspec2")
      .collect().toSeq
    assert(a === b, "two serves against the same stored index must agree")
  }

  test("serve plan reads ONLY index tables, partition-pruned to probed cells") {
    AnnIndexOps.buildResidualIndex(spark, corpus, "graft_annspec3")
    // local (in-memory) query frame: every FILE scan in the serve plan
    // must then be an index table — a corpus scan would mean a refit
    val qLocal = queries(10).collect().toSeq
      .map(r => (r.getLong(0), r.getSeq[Double](1)))
      .toDF("q_id", "qv")
    val served = AnnIndexOps.serveTopK(spark, qLocal, "graft_annspec3",
      probes = 3)
    // AQE wraps the plan in an AdaptiveSparkPlan leaf, so match the
    // FileScan LINES of the full plan string instead of collectLeaves
    val scans = served.queryExecution.executedPlan.toString
      .linesIterator.filter(_.contains("FileScan")).toSeq
    assert(scans.nonEmpty, "expected file scans over the index tables")
    assert(scans.forall(_.contains("graft_annspec3_")),
      s"serve must scan only index tables, got:\n${scans.mkString("\n")}")
    // the codes/vectors scans must carry a cell partition filter (the
    // probed-inverted-lists read) — 3 probes over 16 cells prunes
    val pruned = scans.filter(s =>
      s.contains("_codes") || s.contains("_vectors"))
    assert(pruned.nonEmpty, "expected codes/vectors scans")
    assert(pruned.forall(s => s.contains("PartitionFilters: [cell")),
      s"codes/vectors scans must partition-prune on cell:\n${pruned.mkString("\n")}")
    // and the result itself is sane
    assert(served.count() > 0)
  }

  test("q330 append freezes centroids+codebooks and finds appended vectors") {
    val v = corpus
    val base = v.where(col("vec_id") % 5 =!= 0)
    val delta = v.where(col("vec_id") % 5 === 0)
    AnnIndexOps.buildResidualIndex(spark, base, "graft_annspec4")
    val centBefore = spark.table("graft_annspec4_centroids")
      .orderBy("cell").collect().toSeq
    val booksBefore = spark.table("graft_annspec4_codebooks")
      .orderBy("sub", "code").collect().toSeq
    val nBefore = spark.table("graft_annspec4_vectors").count()
    AnnIndexOps.appendToIndex(spark, delta, "graft_annspec4")
    assert(spark.table("graft_annspec4_centroids").orderBy("cell")
      .collect().toSeq === centBefore,
      "append must not refit the coarse quantizer")
    assert(spark.table("graft_annspec4_codebooks").orderBy("sub", "code")
      .collect().toSeq === booksBefore,
      "append must not refit the codebooks")
    assert(spark.table("graft_annspec4_vectors").count() ===
      nBefore + delta.count(), "appended vectors must land in the index")
    // discoverability: plant an exact twin of an indexed base vector,
    // append it, and the serve top-1 for that query must be the twin
    // (cosine 1.0 beats every other candidate; the twin shares the
    // query's cell by construction)
    val anchor = v.where(col("vec_id") === 1L)
      .select(col("vec_id"), col("v")).collect().head
    val twin = Seq((9100000001L, anchor.getSeq[Double](1)))
      .toDF("vec_id", "v")
    AnnIndexOps.appendToIndex(spark, twin, "graft_annspec4")
    val q = Seq((1L, anchor.getSeq[Double](1))).toDF("q_id", "qv")
    val top1 = AnnIndexOps.serveTopK(spark, q, "graft_annspec4", topK = 1)
      .collect().head.getLong(2)
    assert(top1 === 9100000001L,
      s"the appended exact twin must serve as top-1, got $top1")
  }

  test("q334 recall audit: exhaustive parameters give exactly 1000 permille") {
    // probes = all 16 cells and a corpus-sized shortlist make the ADC
    // stage a full scan and the exact rerank IS brute force — recall
    // must be identically 1000 at every k, integer-exactly
    AnnIndexOps.buildResidualIndex(spark, corpus, "graft_annspec6")
    val n = corpus.count().toInt
    val audit = AnnIndexOps.serveRecallAudit(spark, corpus, queries(10),
      "graft_annspec6", topK = 5, probes = 16, shortlist = n)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert((1 to 5).forall(k => audit(k.toLong) === 1000L),
      s"exhaustive serve must recall everything: $audit")
    // and at the graded parameters the family bar holds (q282's 0.9)
    val graded = AnnIndexOps.serveRecallAudit(spark, corpus, queries(10),
      "graft_annspec6")
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(graded(5L) >= 900L,
      s"recall@5 must clear the 0.9 family bar: $graded")
  }

  test("q339 filtered serve: exact among eligibles, full-depth pre-filter") {
    AnnIndexOps.buildResidualIndex(spark, corpus, "graft_annspec7")
    val allowed = Seq(0, 1, 2, 3, 4)
    // exhaustive parameters: filtered serve must equal brute force over
    // the FILTERED corpus, byte-identically
    val n = corpus.count().toInt
    val got = AnnIndexOps.serveTopK(spark, queries(10), "graft_annspec7",
      probes = 16, shortlist = n, labels = Some(allowed)).collect().toSeq
    val exact = SimilarityOps.bruteForceTopK(
      corpus.where(col("label").isin(allowed: _*)), queries(10), 5)
      .collect().toSeq
    assert(got === exact,
      "filtered serve at exhaustive params must equal filtered brute force")
    // graded params: every result is eligible and full-depth
    val graded = AnnIndexOps.serveTopK(spark, queries(10), "graft_annspec7",
      labels = Some(allowed))
    val labs = graded.join(
        corpus.select(col("vec_id"), col("label")), Seq("vec_id"))
      .select("label").collect().map(_.getInt(0)).toSet
    assert(labs.subsetOf(allowed.toSet),
      s"filtered serve leaked ineligible labels: $labs")
    // the PRE-filter pin: restricting to ONE label (~10% of the corpus)
    // still fills topK because the shortlist ranks among eligibles; the
    // post-filter alternative (filter AFTER an unfiltered top-5) comes
    // up short for almost every query
    val one = AnnIndexOps.serveTopK(spark, queries(10), "graft_annspec7",
      probes = 16, shortlist = n, labels = Some(Seq(7)))
      .groupBy("q_id").count().collect().map(_.getLong(1))
    assert(one.nonEmpty && one.forall(_ === 5L),
      s"pre-filter must return full depth per query: ${one.toSeq}")
    val post = AnnIndexOps.serveTopK(spark, queries(10), "graft_annspec7",
      probes = 16, shortlist = n)
      .join(corpus.select(col("vec_id"), col("label")), Seq("vec_id"))
      .where(col("label") === 7)
      .groupBy("q_id").count().collect().map(_.getLong(1))
    assert(post.isEmpty || post.exists(_ < 5L),
      s"fixture drift: post-filtering an unfiltered top-5 should under-fill: ${post.toSeq}")
  }

  test("q347 compaction shrinks file counts and moves no data") {
    val v = corpus
    val base = v.where(col("vec_id") % 5 =!= 0)
    val delta = v.where(col("vec_id") % 5 === 0)
    AnnIndexOps.buildResidualIndex(spark, base, "graft_annspec8")
    AnnIndexOps.appendToIndex(spark, delta, "graft_annspec8")
    AnnIndexOps.appendToIndex(spark,
      delta.select(col("vec_id") + lit(9400000000L) as "vec_id", col("v")),
      "graft_annspec8")
    val before = AnnIndexOps.serveTopK(spark, queries(10), "graft_annspec8")
      .collect().toSeq
    val filesBefore =
      AnnIndexOps.indexDataFiles(spark, "graft_annspec8_codes") +
        AnnIndexOps.indexDataFiles(spark, "graft_annspec8_vectors")
    val rowsBefore = spark.table("graft_annspec8_codes").count()
    AnnIndexOps.compactIndex(spark, "graft_annspec8")
    val filesAfter =
      AnnIndexOps.indexDataFiles(spark, "graft_annspec8_codes") +
        AnnIndexOps.indexDataFiles(spark, "graft_annspec8_vectors")
    assert(filesAfter < filesBefore,
      s"two appends then compaction must shrink files: $filesBefore -> $filesAfter")
    assert(spark.table("graft_annspec8_codes").count() === rowsBefore,
      "compaction must not add or drop a code row")
    val after = AnnIndexOps.serveTopK(spark, queries(10), "graft_annspec8")
      .collect().toSeq
    assert(after === before,
      "serving from the compacted index must be byte-identical")
  }

  test("fat-cell drift census fires on a planted shifted batch") {
    AnnIndexOps.buildResidualIndex(spark, corpus, "graft_annspec5")
    val before = AnnIndexOps.indexCellCensus(spark, "graft_annspec5")
      .where(col("fat")).count()
    // a tight planted lobe, all landing in one cell: 3x the corpus mass
    // concentrated near e0 (the q313 denseLobe shape, amplified)
    val shifted = corpus
      .crossJoin(spark.range(3).select(col("id").as("copy")))
      .select((col("vec_id") + lit(9200000000L) + col("copy") * lit(1000000L))
        .as("vec_id"),
        expr("transform(v, (x, i) -> 0.05D * x + IF(i = 0, 0.95D, 0D))")
          .as("v"))
    AnnIndexOps.appendToIndex(spark, shifted, "graft_annspec5")
    val after = AnnIndexOps.indexCellCensus(spark, "graft_annspec5")
    val fatAfter = after.where(col("fat")).count()
    assert(fatAfter >= 1,
      s"a 3x concentrated appended lobe must trip the fat flag: ${after.collect().mkString(",")}")
    assert(fatAfter >= before,
      "the drift census must not lose fat cells after the shifted append")
  }

  test("q363 fat-cell split: flag clears, rows conserved, non-split cells untouched, recall recovered") {
    // run the graded audit once; assert on its metric rows AND on the
    // two index states it leaves behind (_u = the unsplit twin == the
    // exact pre-split state, both grown from the same base + append)
    val out = AnnIndexOps.fatCellSplitAudit(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out("fat_cells")._1 >= 1L,
      "the planted drift must trip the census before the repair")
    assert(out("fat_cells")._2 === 0L,
      "the adaptive split must CLEAR the census flag")
    assert(out("n_code_rows")._1 === out("n_code_rows")._2,
      "the split moves list boundaries, never data: row conservation")
    assert(out("adc_candidates")._2 < out("adc_candidates")._1,
      "at equal probes the split index must read fewer ADC candidates")
    assert(out("recall@5")._2 >= out("recall@5")._1,
      s"recall@5 must not regress at equal probes: $out")

    // no vector enters or leaves
    val idsU = spark.table("graft_annsplit_u_vectors").select("vec_id")
    val idsS = spark.table("graft_annsplit_s_vectors").select("vec_id")
    assert(idsU.exceptAll(idsS).isEmpty && idsS.exceptAll(idsU).isEmpty,
      "the split must preserve the indexed vector set exactly")

    // cells surviving in BOTH centroid tables were not split: their
    // codes and vectors must be byte-identical
    val shared = spark.table("graft_annsplit_u_centroids").select("cell")
      .intersect(spark.table("graft_annsplit_s_centroids").select("cell"))
    def sharedRows(tbl: String) =
      spark.table(tbl).join(shared, Seq("cell"))
    val cu = sharedRows("graft_annsplit_u_codes")
    val cs = sharedRows("graft_annsplit_s_codes")
    assert(cu.exceptAll(cs).isEmpty && cs.exceptAll(cu).isEmpty,
      "non-split cells' code rows must be carried over verbatim")
    val vu = sharedRows("graft_annsplit_u_vectors")
    val vs = sharedRows("graft_annsplit_s_vectors")
    assert(vu.exceptAll(vs).isEmpty && vs.exceptAll(vu).isEmpty,
      "non-split cells' vector rows must be carried over verbatim")

    // shared (non-split) centroids byte-identical too
    val ceU = spark.table("graft_annsplit_u_centroids").join(shared, Seq("cell"))
    val ceS = spark.table("graft_annsplit_s_centroids").join(shared, Seq("cell"))
    assert(ceU.exceptAll(ceS).isEmpty && ceS.exceptAll(ceU).isEmpty,
      "unsplit centroids must not move")

    // a no-drift index has nothing to split: the repair is a no-op
    AnnIndexOps.buildResidualIndex(spark, corpus, "graft_annspec9")
    assert(AnnIndexOps.splitFatCells(spark, "graft_annspec9").isEmpty,
      "splitFatCells on a balanced index must be a no-op")
  }

  test("q364 RRF fusion: the consensus doc outranks BOTH legs' top-1, exact integers") {
    import graft.ops.AnnIndexOps
    // the classic RRF case: A is lexical-1st but vector-4th, B is
    // vector-1st but lexical-4th, C is 2nd on both — C must fuse to
    // top-1 (2·⌊10⁶/62⌋ = 32258 > ⌊10⁶/61⌋+⌊10⁶/64⌋ = 32018), so the
    // fused top-1 differs from both legs' own winners
    val legA = Seq(("q", 100L, 1), ("q", 300L, 2), ("q", 200L, 4),
      ("q", 400L, 3)).toDF("query_id", "doc_id", "rank_a")
    val legB = Seq(("q", 200L, 1), ("q", 300L, 2), ("q", 100L, 4),
      ("q", 500L, 3)).toDF("query_id", "doc_id", "rank_b")
    val fused = AnnIndexOps.rrfFuseInt(legA, legB, k = 5, rrfK = 60)
      .collect()
    val top1 = fused.find(_.getInt(1) == 1).get
    assert(top1.getLong(2) === 300L,
      s"the both-legs-2nd doc must fuse to top-1: ${fused.mkString(",")}")
    assert(top1.getLong(5) === 32258L, "2 * (1000000 div 62)")
    val a1 = fused.find(_.getLong(2) == 100L).get
    assert(a1.getLong(5) === 16393L + 15625L,
      "leg-A's winner scores div(61) + div(64) exactly")
    // docs shortlisted by only one leg contribute the missing leg as 0
    val solo = fused.find(_.getLong(2) == 400L).get
    assert(solo.isNullAt(4) && solo.getLong(5) === 1000000L / 63,
      "a one-leg doc's fused score is that leg's term alone")

    // integration: the graded hybrid output's arithmetic is internally
    // consistent (rrf_micro recomputes from the two rank columns)
    val out = AnnIndexOps.hybridRetrieval(spark, sf)
    val bad = out.where(col("rrf_micro") =!=
      coalesce(expr("1000000L div (60 + rank_bm25)"), lit(0L)) +
        coalesce(expr("1000000L div (60 + rank_ann)"), lit(0L))).count()
    assert(bad === 0L, "fused micro-scores must recompute from the ranks")
    assert(out.count() > 0)
  }

  test("q354 probes sweep: monotone at exhaustive shortlist, full probes reach 1000") {
    AnnIndexOps.buildResidualIndex(spark, corpus, "graft_annsweepspec")
    val n = corpus.count().toInt
    // exhaustive shortlist: candidate sets grow superset-wise in
    // probes, so recall is provably non-decreasing, and probing every
    // cell recovers the exact top-k (recall == 1000 permille)
    val sweep = AnnIndexOps.serveProbesSweep(spark, corpus, queries(10),
        "graft_annsweepspec", shortlist = n, probesGrid = Seq(1, 2, 4, 8, 16))
      .collect().map(r => r.getInt(0) -> r.getLong(3))
    assert(sweep.map(_._1).toSeq == Seq(1, 2, 4, 8, 16))
    val rec = sweep.map(_._2)
    assert(rec.zip(rec.tail).forall { case (a, b) => a <= b },
      s"recall must be monotone in probes at exhaustive shortlist: ${sweep.toSeq}")
    assert(rec.last == 1000L,
      s"probing every cell must recover the exact top-k: ${sweep.toSeq}")
  }

  test("q359: recall clears the family bar after a takedown sweep") {
    val v = corpus
    AnnIndexOps.buildResidualIndex(spark, v, "graft_tdrecspec")
    AnnIndexOps.takedownIndex(spark, "graft_tdrecspec",
      v.where(col("vec_id") % 11 === 0).select(col("vec_id")))
    val surv = v.where(col("vec_id") % 11 =!= 0)
    // exhaustive parameters: the swept index must still recover the
    // survivors' exact top-k perfectly — the strong certification that
    // the sweep deleted rows, not quality
    val exhaustive = AnnIndexOps.serveRecallAudit(spark, surv,
        queries(20), "graft_tdrecspec", probes = 16,
        shortlist = surv.count().toInt)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(exhaustive.values.forall(_ == 1000L),
      s"exhaustive post-takedown recall must be exactly 1000: $exhaustive")
    // graded parameters: the operational floor (q334 reads ~0.92 on
    // the full index at this SF; the sweep removes ~9% of candidates)
    val audit = AnnIndexOps.serveRecallAudit(spark, surv, queries(20),
        "graft_tdrecspec")
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(audit(5L) >= 850L,
      s"post-takedown recall@5 must clear the operational floor: $audit")
  }

  test("build memo: a memo-hit clone equals the cold build, tables and serve") {
    // two builds over the same corpus: the second is a memo-hit clone
    // of the first's library fit — every table row-identical, serve
    // byte-identical
    AnnIndexOps.buildResidualIndex(spark, corpus, "graft_annmemo1")
    AnnIndexOps.buildResidualIndex(spark, corpus, "graft_annmemo2")
    Seq("centroids", "codebooks", "codes", "vectors").foreach { t =>
      val a = spark.table(s"graft_annmemo1_$t")
      val b = spark.table(s"graft_annmemo2_$t")
      assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
        s"memo-hit clone must be row-identical on $t")
    }
    val sa = AnnIndexOps.serveTopK(spark, queries(10), "graft_annmemo1")
      .collect().toSeq
    val sb = AnnIndexOps.serveTopK(spark, queries(10), "graft_annmemo2")
      .collect().toSeq
    assert(sa === sb, "memo-hit serve must equal cold-build serve")
  }

  test("build memo: takedown changes the corpus fingerprint — no stale index served") {
    // build full, take down a vector set on the CLONE, then build over
    // the surviving corpus: the memo must key on the new fingerprint,
    // never hand back the full index, and never serve a deleted vector
    AnnIndexOps.buildResidualIndex(spark, corpus, "graft_annmemo3")
    val deleted = corpus.where(col("vec_id") % 7 === 0)
      .select(col("vec_id"))
    AnnIndexOps.takedownIndex(spark, "graft_annmemo3", deleted)
    val survivors = corpus.where(col("vec_id") % 7 =!= 0)
    AnnIndexOps.buildResidualIndex(spark, survivors, "graft_annmemo4")
    assert(spark.table("graft_annmemo4_vectors").count() ===
      survivors.count(),
      "a post-takedown build must index exactly the survivors")
    assert(spark.table("graft_annmemo4_vectors")
      .join(deleted, Seq("vec_id")).isEmpty,
      "the memo must not resurrect deleted vectors into a new build")
    val served = AnnIndexOps.serveTopK(spark, queries(10), "graft_annmemo4")
    assert(served.join(deleted, Seq("vec_id")).isEmpty,
      "a deleted vector must never be served from a post-takedown build")
  }

  test("incremental census: cellpops == vectors-scan ground truth across append/takedown/split, O(nlist) plan") {
    AnnIndexOps.buildResidualIndex(spark, corpus, "graft_annpops")
    def truth: Map[Int, Long] = spark.table("graft_annpops_vectors")
      .groupBy("cell").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    def census: Map[Int, Long] =
      AnnIndexOps.indexCellCensus(spark, "graft_annpops").collect()
        .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(census === truth, "census after build must match a vectors scan")
    // the census plan must read the maintained side relation, never the
    // vectors table — the O(index)-per-trigger observation is the exact
    // r16 `weak` this relation exists to close
    val scans = AnnIndexOps.indexCellCensus(spark, "graft_annpops")
      .queryExecution.executedPlan.toString
      .linesIterator.filter(_.contains("FileScan")).toSeq
    assert(scans.nonEmpty)
    assert(scans.forall(_.contains("graft_annpops_cellpops")),
      s"census must scan only the cellpops relation, got:\n${scans.mkString("\n")}")
    // append folds additively; the watermark tracks the max id
    val shifted = corpus
      .crossJoin(spark.range(3).select(col("id").as("copy")))
      .select(
        (col("vec_id") + lit(9200000000L) + col("copy") * lit(1000000L))
          .as("vec_id"), col("label"),
        expr("transform(v, (x, i) -> 0.05D * x + IF(i = 0, 0.95D, 0D))")
          .as("v"))
    AnnIndexOps.appendToIndex(spark, shifted, "graft_annpops")
    assert(census === truth, "census after append must match a vectors scan")
    assert(AnnIndexOps.maxIndexedId(spark, "graft_annpops") ===
      Some(spark.table("graft_annpops_vectors").agg(max(col("vec_id")))
        .head().getLong(0)),
      "the watermark must equal the true max indexed id")
    // split swaps parent rows for child counts
    AnnIndexOps.splitFatCells(spark, "graft_annpops")
    assert(census === truth, "census after split must match a vectors scan")
    // takedown subtracts; a fully-emptied cell loses its row
    AnnIndexOps.takedownIndex(spark, "graft_annpops",
      corpus.where(col("vec_id") % 3 === 0).select(col("vec_id")))
    assert(census === truth, "census after takedown must match a vectors scan")
  }
}
