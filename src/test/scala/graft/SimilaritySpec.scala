package graft

import org.apache.spark.sql.functions._

import graft.ops.SimilarityOps

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private lazy val v = SimilarityOps.vectors(spark, sf)
  private lazy val queries = v.where(col("vec_id") < 10)
    .select(col("vec_id").as("q_id"), col("v").as("qv"))

  test("cosine of a vector with itself is 1") {
    val selfSim = v.limit(5)
      .select(SimilarityOps.cosine("v", "v").as("s"))
      .collect().map(_.getDouble(0))
    assert(selfSim.forall(s => math.abs(s - 1.0) < 1e-12))
  }

  test("brute force returns k ranked neighbors per query") {
    val out = SimilarityOps.bruteForceTopK(v, queries, k = 5).collect()
    assert(out.length == 10 * 5)
    val byQ = out.groupBy(_.getLong(0))
    byQ.values.foreach { rows =>
      assert(rows.map(_.getInt(1)).sorted.sameElements(1 to 5))
    }
  }

  test("LSH recall vs brute force is reasonable on sf0.001") {
    val exact = SimilarityOps.bruteForceTopK(v, queries, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val approx = SimilarityOps.lshTopK(v, queries, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = exact.intersect(approx).size.toDouble / exact.size
    info(s"LSH multiprobe recall@5 = $recall")
    // 8 tables x 6 bits with distance-1 multiprobe on 500 random vectors
    assert(recall >= 0.5, s"recall was $recall")
  }

  test("IVF recall vs brute force on sf0.001") {
    val exact = SimilarityOps.bruteForceTopK(v, queries, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val approx = SimilarityOps.ivfTopK(v, queries, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = exact.intersect(approx).size.toDouble / exact.size
    info(s"IVF recall@5 = $recall (16 cells, 3 probes)")
    assert(recall >= 0.3, s"recall was $recall")
  }

  test("PQ encode: full 8x16 code grid, population conserved, errors finite") {
    val out = SimilarityOps.pqEncodeStats(v).collect()
    assert(out.forall(r => r.getInt(0) >= 0 && r.getInt(0) < 8))
    assert(out.forall(r => r.getInt(1) >= 0 && r.getInt(1) < 16))
    // every (vector, subspace) gets exactly one code
    assert(out.map(_.getLong(2)).sum === 8L * v.count())
    assert(out.forall(r => r.getDouble(3) >= 0.0))
  }

  test("PQ encode stats are repartition-invariant to the bit") {
    val a = SimilarityOps.pqEncodeStats(v).collect().toSeq
    val b = SimilarityOps.pqEncodeStats(v.repartition(7)).collect().toSeq
    assert(a === b, "decimal means/sums must make PQ bit-stable")
  }

  test("PQ ADC + exact rerank recall vs brute force on sf0.001") {
    val exact = SimilarityOps.bruteForceTopK(v, queries, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val approx = SimilarityOps.pqAdcRerank(v, queries)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = exact.intersect(approx).size.toDouble / exact.size
    info(s"PQ rerank recall@5 = $recall (m=8, 16 codes, shortlist 100)")
    assert(recall >= 0.9, s"recall was $recall")
    // codes-only ADC is documented as shortlist-grade, not result-grade
    val codesOnly = SimilarityOps.pqAdcTopK(v, queries)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val codesRecall = exact.intersect(codesOnly).size.toDouble / exact.size
    info(s"codes-only ADC recall@5 = $codesRecall")
    assert(codesRecall < recall, "rerank must beat raw code distances")
  }

  test("IVF-PQ composed search: recall >= 0.9 vs brute force (the q282 bar)") {
    val exact = SimilarityOps.bruteForceTopK(v, queries, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val approx = SimilarityOps.ivfPqTopK(v, queries, topK = 5)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = exact.intersect(approx).size.toDouble / exact.size
    info(s"IVF-PQ recall@5 = $recall (16 cells, 8 probes, shortlist 100)")
    assert(recall >= 0.9, s"recall was $recall")
    // output contract matches the q27/q282 family: 5 ranked rows/query
    val out = SimilarityOps.ivfPqTopK(v, queries, topK = 5).collect()
    out.groupBy(_.getLong(0)).values.foreach { rows =>
      assert(rows.map(_.getInt(1)).sorted.sameElements(1 to 5))
    }
  }

  test("residual IVF-PQ: tighter ADC shortlist than raw codes, family bar holds") {
    val exact = SimilarityOps.bruteForceTopK(v, queries, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    def rec(df: org.apache.spark.sql.DataFrame): Double = {
      val s = df.collect().map(r => (r.getLong(0), r.getLong(2))).toSet
      exact.intersect(s).size.toDouble / exact.size
    }
    // head-to-head at shortlist = topK, where the exact rerank cannot
    // repair the shortlist: the residual codes' ADC must rank better
    val raw5 = rec(SimilarityOps.ivfPqTopK(v, queries, shortlist = 5))
    val res5 = rec(SimilarityOps.ivfPqResidualTopK(v, queries, shortlist = 5))
    info(s"shortlist-5 recall: residual $res5 vs raw $raw5")
    assert(res5 > raw5,
      s"residual encoding must tighten the ADC shortlist: $res5 <= $raw5")
    // and at the graded config the family recall bar holds
    val full = rec(SimilarityOps.ivfPqResidualTopK(v, queries))
    info(s"residual IVF-PQ recall@5 = $full (shortlist 100)")
    assert(full >= 0.9, s"recall was $full")
  }

  test("hard negatives: wrong-label twin wins, same-label twin never chosen") {
    val a = Seq.tabulate(64)(i => math.sin(i + 1))
    val b = Seq.tabulate(64)(i => math.cos(2 * i + 1))
    val planted = Seq(
      (0L, 1, a),            // anchor (vec_id < nAnchors)
      (100L, 1, a),          // same-label twin: cosine 1 but INELIGIBLE
      (101L, 2, a.map(_ * 1.001)), // wrong-label near-twin: must win
      (102L, 2, b)           // wrong label, far away
    ).toDF("vec_id", "label", "v")
    val out = SimilarityOps.hardNegatives(planted, nAnchors = 1)
      .collect()
    assert(out.length === 1)
    val r = out.head
    assert(r.getLong(0) === 0L && r.getInt(1) === 1)
    assert(r.getLong(2) === 101L && r.getInt(3) === 2,
      s"hard negative must be the wrong-label near-twin: $r")
    assert(r.getDouble(4) > 0.999)
  }

  test("autoBits grows bucket count with corpus size, floored at test scale") {
    import SimilarityOps.autoBits
    assert(autoBits(500, 6) == 6, "LSH default unchanged at sf0.001")
    assert(autoBits(5000, 8) == 8, "near-dup default unchanged at sf0.1")
    assert(autoBits(1L << 20, 8) == 14, "2^20 vectors -> 2^14 buckets/table")
    assert(autoBits(1L << 26, 8) == 20)
    assert(autoBits(1000000000L, 8) == 24, "capped: bucket ids stay Int")
  }

  test("null and short vectors pass through LSH paths without failing") {
    val a = Seq.tabulate(64)(i => math.sin(i + 1))
    val planted = Seq((200L, a), (201L, a)).toDF("vec_id", "v")
      .unionByName(Seq(
        (202L, null.asInstanceOf[Seq[Double]]),
        (203L, Seq(1.0, 2.0, 3.0))).toDF("vec_id", "v"))
    val nd = SimilarityOps.embedNearDup(planted, threshold = 0.95)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(nd.size == 4, "null/short vectors keep their output row")
    assert(nd(202L) == 202L, "null vector is its own canonical")
    assert(nd(201L) == 200L, "planted dup still collapses")

    val corpusWithNull = v.select("vec_id", "v").unionByName(
      Seq((99999L, null.asInstanceOf[Seq[Double]]),
        (99998L, Seq(1.0, 2.0, 3.0))).toDF("vec_id", "v"))
    val out = SimilarityOps.lshTopK(corpusWithNull, queries, k = 5).collect()
    assert(out.nonEmpty)
    assert(!out.exists(_.getLong(2) == 99999L), "null vector never a candidate")
  }

  test("embed near-dup collapses planted duplicate vectors") {
    val a = Seq.tabulate(64)(i => math.sin(i + 1))
    val b = Seq.tabulate(64)(i => math.cos(2 * i + 1))
    val planted = Seq(
      (100L, a), (101L, a), // exact dup pair
      (102L, b), (103L, b.map(_ * 1.001)) // same direction
    ).toDF("vec_id", "v")
    val out = SimilarityOps.embedNearDup(planted, threshold = 0.95)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out(101L) == 100L)
    assert(out(103L) == 102L)
    assert(out(100L) == 100L)
  }

  test("semdedup: same-cell twins collapse, cross-cell near-dups are missed") {
    // seeds (vec_id < cells) pin 2 cells on orthogonal axes; a=[.8,.6]
    // joins cell 0 and b=[.6,.8] joins cell 1, yet cos(a,b)=0.96 >= 0.95
    // — the pair SemDeDup trades away. Twins identical to v0 share its
    // cell by construction and must both collapse onto vec 0.
    val rows = Seq(
      (0L, Seq(1.0, 0.0, 0.0, 0.0)),   // seed cell 0
      (1L, Seq(0.0, 1.0, 0.0, 0.0)),   // seed cell 1
      (2L, Seq(0.8, 0.6, 0.0, 0.0)),   // near-dup of 3, lands cell 0
      (3L, Seq(0.6, 0.8, 0.0, 0.0)),   // near-dup of 2, lands cell 1
      (10L, Seq(1.0, 0.0, 0.0, 0.0)),  // twin of 0
      (11L, Seq(1.0, 0.0, 0.0, 0.0))   // twin of 0
    ).toDF("vec_id", "v")
    val out = SimilarityOps.semDedup(rows, threshold = 0.95, cells = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(10L -> 0L, 11L -> 0L),
      s"twins collapse onto 0; the 2-3 cross-cell pair is missed: $out")
  }

  test("q93 quantization contract holds on the corpus (violations = 0)") {
    val row = SparkEntry.queries("q93_embed_quantize")(spark, sf).collect()(0)
    assert(row.getAs[Long]("n_vecs") > 0)
    assert(row.getAs[Long]("n_quantized") == row.getAs[Long]("n_vecs"))
    assert(row.getAs[Long]("range_violations") == 0L)
    assert(row.getAs[Long]("recon_violations") == 0L)
  }

  test("q298 margin scoring penalizes hubs: the hub outranks by raw " +
    "cosine but LOSES by margin") {
    def v(xs: Double*): Seq[Double] = xs ++ Seq.fill(64 - xs.length)(0.0)
    val corpus = Seq(
      // source side (even label, id < 40): two correlated queries
      (0L, 0, v(1.0, 0.0)),
      (2L, 0, v(0.8, 0.6)),
      // target side (odd label): a hub near BOTH queries, a twin near
      // only q1, and two orthogonal fillers
      (101L, 1, v(0.949, 0.316)), // cos ~0.949 to q1 AND q2 (hub)
      (102L, 1, v(0.94, -0.34)),  // cos ~0.940 to q1, ~0.548 to q2
      (103L, 1, v(0.0, 0.0, 1.0)),
      (104L, 1, v(0.0, 0.0, 0.0, 1.0))
    ).toDF("vec_id", "label", "v")
    val out = SimilarityOps.bitextMargin(corpus).collect()
    val q1 = out.filter(_.getLong(0) == 0L).sortBy(_.getInt(1))
    // raw cosine prefers the hub (0.949 > 0.940); margin must flip it
    assert(q1.head.getLong(2) == 102L,
      s"twin must outrank the hub under margin scoring: ${q1.toSeq}")
    assert(q1(1).getLong(2) == 101L)
    // margins are strictly decreasing down the ranking
    val ms = q1.map(_.getDouble(3)).toSeq
    assert(ms == ms.sorted.reverse && ms.distinct.size == ms.size)
  }

  test("q313 rebalance: fat two-lobe cell median-splits into exact halves") {
    // cell 0 (seeded by vec 0 = x-axis): 13 members — seed0, an 8-vector
    // lobe at y ≈ +0.10 and a 4-vector lobe at y ≈ −0.40. cell 1 (seeded
    // by vec 1 = y-axis): 4 members. With cells = 2 and a >mean threshold
    // only cell 0 is fat. Hand-computed split: seed A = the lobe-B
    // extreme (id 23, 18.5° off the centroid vs lobe A's 9.5°), seed B =
    // the lobe-A extreme (id 17), and the ascending A→B axis ranks
    // lobe B (t < 0) ahead of seed0 (t = 0.067) ahead of lobe A
    // (t ≥ 0.114) — so 'a' = {20..23, 0, 10, 11} (hash 107) and
    // 'b' = {12..17} (hash 87): the small lobe lands WHOLE on one side
    // and the halves are ⌈13/2⌉/⌊13/2⌋ by construction.
    def vec(y: Double) = Seq(1.0, y, 0.0, 0.0)
    val rows =
      Seq((0L, vec(0.0)), (1L, Seq(0.0, 1.0, 0.0, 0.0))) ++
        (0 until 8).map(j => (10L + j, vec(0.1 + 0.001 * j))) ++
        (0 until 4).map(j => (20L + j, vec(-0.4 - 0.001 * j))) ++
        (0 until 3).map(j => (30L + j, Seq(0.05 * j, 1.0, 0.0, 0.0)))
    val corpus = rows.toDF("vec_id", "v")
    for (c <- Seq(corpus, corpus.repartition(7))) {
      val out = SimilarityOps.ivfRebalance(c, cells = 2, iters = 2,
        fatNum = 1, fatDen = 1).collect()
        .map(r => (r.getInt(0), r.getString(1)) ->
          ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
      assert(out === Map(
        (0, "a") -> ((7L, 13L, 107L)),
        (0, "b") -> ((6L, 13L, 87L)),
        (1, "") -> ((4L, 4L, 94L))), s"unexpected split: $out")
    }
  }

  test("q319 MMR breaks out of a redundant cluster that plain top-k drowns in") {
    // query 0 = x-axis; cluster A: 8 near-copies at cos ~0.9 to the
    // query and ~1.0 to each other; cluster B: 4 vectors also at ~0.9
    // to the query but only ~0.62 to A. Plain top-5 is ALL A (the
    // redundancy failure); with lambda = 0.7 the rank-2 MMR pick must
    // defect to B: staying in A scores 0.7*0.9 - 0.3*1.0 = 0.33,
    // crossing scores 0.7*0.9 - 0.3*0.62 = 0.44.
    val fixture =
      Seq((0L, Seq(1.0, 0.0, 0.0, 0.0))) ++
        (0 until 8).map(j => (10L + j, Seq(0.9, 0.436 + 0.0002 * j, 0.0, 0.0))) ++
        (0 until 4).map(j => (20L + j, Seq(0.88, -0.45 - 0.0002 * j, 0.0, 0.0)))
    val corpus = fixture.toDF("vec_id", "v")
    val queries = corpus.where(col("vec_id") === 0L)
      .select(col("vec_id").as("q_id"), col("v").as("qv"))
    def clusters(rows: Array[org.apache.spark.sql.Row]): Set[String] =
      rows.map(r => if (r.getLong(1) < 20L) "A" else "B").toSet
    val plain = SimilarityOps.bruteForceTopK(corpus, queries, 5).collect()
    assert(clusters(plain.map(r =>
        org.apache.spark.sql.Row(r.getLong(0), r.getLong(2)))) === Set("A"),
      s"plain top-5 must drown in the redundant cluster: ${plain.toSeq}")
    for (c <- Seq(corpus, corpus.repartition(7))) {
      val mmr = SimilarityOps.mmrTopK(c, queries, k = 5).collect()
      assert(mmr.length === 5)
      assert(clusters(mmr) === Set("A", "B"),
        s"MMR must represent both clusters: ${mmr.toSeq}")
      assert(mmr.map(r => if (r.getLong(1) < 20L) "B" else "B").nonEmpty)
      // the defection happens exactly at rank 2, per the margin math
      val rank2 = mmr.find(_.getInt(2) === 2).get.getLong(1)
      val rank1 = mmr.find(_.getInt(2) === 1).get.getLong(1)
      assert((rank1 < 20L) != (rank2 < 20L),
        s"rank 2 must defect to the other cluster: ranks ${mmr.toSeq}")
      // margins strictly decrease down the ranking (greedy optimality)
      val ms = mmr.sortBy(_.getInt(2)).map(_.getDouble(3)).toSeq
      assert(ms == ms.sorted.reverse, s"margins must be monotone: $ms")
    }
  }

  test("q313 rebalance: uniform cells pass through unsplit, totals preserved") {
    val out = SimilarityOps.ivfRebalance(
      v.select(col("vec_id"), col("v")), cells = 16, iters = 2).collect()
    // sf0.001 embeddings are near-uniform over 16 cells: nothing is fat
    // at the 2x-mean default, every row is a pass-through parent
    assert(out.forall(_.getString(1) === ""), s"spurious split: ${out.toSeq}")
    assert(out.map(_.getLong(2)).sum === v.count())
    out.foreach(r => assert(r.getLong(2) === r.getLong(3)))
  }

  test("q349 binary ANN: packing bit-exact, Hamming identities, recall floor") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // hand-computed packing: dims 0 and 2 positive -> bits 0 and 2 ->
    // code 0b101 = 5; the all-positive vector sets all 64 bits -> -1L
    val tiny = Seq(
      (1L, Seq.tabulate(64)(i => if (i == 0 || i == 2) 1.0 else -1.0)),
      (2L, Seq.fill(64)(1.0)))
      .toDF("vec_id", "v")
      .select(col("vec_id"), graft.ops.SimilarityOps.signCode("v").as("c"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(tiny(1L) === 5L, s"sign packing drifted: $tiny")
    assert(tiny(2L) === -1L, s"all-positive must set all 64 bits: $tiny")

    // identical vectors -> Hamming 0 -> the twin is the top-1 rerank hit
    val v = graft.ops.SimilarityOps.vectors(spark, sf)
      .select(col("vec_id"), col("v"))
    val anchor = v.where(col("vec_id") === 3L).collect().head.getSeq[Double](1)
    val withTwin = v.unionByName(Seq((9500000001L, anchor)).toDF("vec_id", "v"))
    val q = Seq((3L, anchor)).toDF("q_id", "qv")
    val top1 = graft.ops.SimilarityOps.binaryAnnTopK(withTwin, q, topK = 1)
      .collect().head.getLong(2)
    assert(top1 === 9500000001L, s"the exact twin must rerank first: $top1")

    // exhaustive shortlist == brute force (the rerank sees everything);
    // the graded 100-shortlist holds a measured recall floor vs brute
    val queries = v.where(col("vec_id") < 10L)
      .select(col("vec_id").as("q_id"), col("v").as("qv"))
    val n = v.count().toInt
    val exhaustive = graft.ops.SimilarityOps
      .binaryAnnTopK(v, queries, topK = 5, shortlist = n).collect().toSeq
    val brute = graft.ops.SimilarityOps.bruteForceTopK(v, queries, 5)
      .collect().toSeq
    assert(exhaustive === brute,
      "exhaustive-shortlist binary ANN must equal brute force")
    val got = graft.ops.SimilarityOps.binaryAnnTopK(v, queries).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val hits = brute.map(r => (r.getLong(0), r.getLong(2)))
      .count(got.contains)
    assert(hits >= 30,
      s"1-bit codes at shortlist 100 must keep recall@5 >= 0.6: $hits/50")
  }
}
