package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.{SampleOps, TextOps}

/** Vocabulary building (q52) + balanced deterministic sampling (q53). */
class VocabSampleSpec extends SparkSpec {
  import spark.implicits._

  test("vocab top terms ranks by document frequency with term tiebreak") {
    val docs = Seq(
      (1L, "a b a", "en"), (2L, "a c", "en"), (3L, "b b", "en"),
      (4L, "x", "de"), (5L, null.asInstanceOf[String], "de")
    ).toDF("doc_id", "text", "lang")
    val out = TextOps.vocabTopTerms(docs, k = 10).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getString(2), r.getLong(3)))
    // en: a appears in docs 1,2 (df 2, once despite repeat in doc 1),
    // b in docs 1,3 (df 2), c in doc 2 (df 1); tie a-vs-b broken by term
    assert(out.filter(_._1 == "en").toSeq == Seq(
      ("en", 1, "a", 2L), ("en", 2, "b", 2L), ("en", 3, "c", 1L)))
    assert(out.filter(_._1 == "de").toSeq == Seq(("de", 1, "x", 1L)))
  }

  test("balanced sample: two-phase plan equals the naive global window") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val got = SampleOps.balancedSample(docs, k = 20, strata = "lang")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2)))

    val w = Window.partitionBy("lang")
      .orderBy(pmod(xxhash64(col("doc_id")), lit(1000000L)), col("doc_id"))
    val naive = docs.select(col("lang"), col("doc_id"))
      .withColumn("rnk", row_number().over(w))
      .where(col("rnk") <= 20)
      .orderBy("lang", "rnk")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2)))
      .map { case (l, d, r) => (l, r, d) }
    assert(got.toSeq == naive.toSeq)

    // exactly k per stratum (every lang has >= 20 docs at sf0.001),
    // ranks contiguous, and rerun is bit-identical
    val perLang = got.groupBy(_._1)
    assert(perLang.nonEmpty)
    assert(perLang.values.forall(_.length == 20))
    assert(perLang.values.forall(_.map(_._2).sorted.toSeq == (1 to 20)))
    val again = SampleOps.balancedSample(docs, k = 20, strata = "lang")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
    assert(again.toSeq == got.toSeq)
  }

  test("balanced sample keeps whole strata smaller than the quota") {
    val tiny = Seq((1L, "en"), (2L, "en"), (3L, "de"))
      .toDF("doc_id", "lang")
    val out = SampleOps.balancedSample(tiny, k = 20, strata = "lang")
      .collect().map(r => (r.getString(0), r.getLong(2)))
    assert(out.length == 3, "strata under the quota keep every row")
  }

  test("sequence pack: two-phase prefix sum equals the naive global window") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val got = SampleOps.sequencePack(docs, cap = 4096L, bucketWidth = 37L)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))

    val nt = expr("CAST(length(text) - length(replace(text, ' ', '')) + 1 AS BIGINT)")
    val naive = docs.where(col("text").isNotNull)
      .select(col("doc_id"), col("lang"), nt.as("n_tokens"))
      .withColumn("pack_id", expr("(sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens) div 4096L"))
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == naive.toSeq)
  }

  test("sequence pack boundaries: oversized doc owns its packs, fills are greedy") {
    val docs = Seq(
      (1L, Seq.fill(3000)("t").mkString(" "), "en"), // starts pack 0
      (2L, Seq.fill(2000)("t").mkString(" "), "en"), // starts at 3000 -> pack 0 (straddles)
      (3L, Seq.fill(9000)("t").mkString(" "), "en"), // starts at 5000 -> pack 1
      (4L, "a b", "en"),                             // starts at 14000 -> pack 3
      (5L, "x y z", "de"),                           // de restarts at 0 -> pack 0
      (6L, null.asInstanceOf[String], "de")          // excluded
    ).toDF("doc_id", "text", "lang")
    val out = SampleOps.sequencePack(docs, cap = 4096L, bucketWidth = 2L)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(out == Map(1L -> 0L, 2L -> 0L, 3L -> 1L, 4L -> 3L, 5L -> 0L))
  }

  test("bpe pack: tokenizer pricing shifts a boundary whitespace pricing cannot see") {
    // merge chain on this corpus (cnt-desc, pair-asc tiebreak):
    // r1 "a a" -> aaaa=[aa,aa]; r2 "z z" -> zzzz=[zz,zz];
    // r3 "aa aa" -> aaaa=[aaaa]. BPE costs: aaaa=1, zzzz=2, mm=nn=2.
    val docs = Seq(
      (1L, "aaaa aaaa aaaa", "en"), // ws 3, bpe 3
      (2L, "zzzz zzzz zzzz", "en"), // ws 3, bpe 6 — fragments 2x
      (3L, "mm nn", "en")           // ws 2, bpe 4
    ).toDF("doc_id", "text", "lang")
    val bpe = graft.ops.SelectionOps
      .bpeSequencePack(docs, cap = 4L, bucketWidth = 2L)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3))).toMap
    assert(bpe == Map(1L -> (3L, 0L), 2L -> (6L, 0L), 3L -> (4L, 2L)),
      s"got $bpe")
    // the whitespace packer prices doc 2 at 3 tokens and puts doc 3 in
    // pack 1; the tokenizer knows doc 2 costs 6 and pushes doc 3 to 2
    val ws = SampleOps.sequencePack(docs, cap = 4L, bucketWidth = 2L)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(ws(3L) == 1L && bpe(3L)._2 == 2L,
      "the planted fragmenting doc must shift the BPE pack boundary")
  }

  test("bpe pack: two-phase prefix sum equals the naive global window") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val got = graft.ops.SelectionOps
      .bpeSequencePack(docs, cap = 4096L, bucketWidth = 37L)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val (vocab, _) = graft.ops.VocabModelOps.bpeRounds(docs, 3)
    val naive = docs.where(col("text").isNotNull)
      .select(col("doc_id"), col("lang"),
        explode(split(col("text"), " ")).as("w"))
      .where(col("w") =!= "")
      .join(broadcast(vocab.select(col("w"), size(col("toks")).as("wt"))),
        Seq("w"))
      .groupBy("doc_id", "lang")
      .agg(sum(col("wt")).cast("long").as("n_tokens"))
      .withColumn("pack_id", expr("(sum(n_tokens) OVER (PARTITION BY " +
        "lang ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND " +
        "CURRENT ROW) - n_tokens) div 4096L"))
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == naive.toSeq)
  }

  test("global index: sharded two-phase equals the naive global window") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val got = SampleOps.globalIndex(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val naive = docs
      .withColumn("global_idx", row_number().over(
        Window.orderBy(md5(col("doc_id").cast("string")), col("doc_id"))).cast("long"))
      .select("doc_id", "global_idx").orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq == naive.toSeq)
    // dense 1..n enumeration
    assert(got.map(_._2).sorted.toSeq == (1L to docs.count()).toSeq)
  }

  test("weighted sample: two-phase cutoff equals the naive weighted window") {
    // 5000 rows / 2 strata so the fast path (cutoff + survivors) actually
    // runs (strata > 8k rows), with a 100x weight spread
    val docs = spark.range(5000)
      .select(col("id").as("doc_id"),
        when(col("id") % 2 === 0, "a").otherwise("b").as("lang"),
        (col("id") % 100 + 1).as("wt"))
    val got = SampleOps.weightedSample(docs, k = 20, strata = "lang", weight = col("wt"))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2)))

    val M = 1L << 40
    val u = (pmod(xxhash64(col("doc_id")), lit(M)).cast("double") + 0.5) / M
    val w = Window.partitionBy("lang")
      .orderBy((-log(u) / col("wt").cast("double")).asc, col("doc_id"))
    val naive = docs.withColumn("rnk", row_number().over(w))
      .where(col("rnk") <= 20)
      .select(col("lang"), col("rnk"), col("doc_id"))
      .orderBy("lang", "rnk")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
    assert(got.toSeq == naive.toSeq)
  }

  test("weighted sample: a dominant weight always wins its stratum") {
    val docs = ((1 to 30).map(i => (i.toLong, "en", 1L)) :+ (99L, "en", 1000000000L))
      .toDF("doc_id", "lang", "wt")
    val out = SampleOps.weightedSample(docs, k = 5, strata = "lang", weight = col("wt"))
      .collect().map(r => (r.getInt(1), r.getLong(2)))
    assert(out.length == 5)
    assert(out.contains((1, 99L)),
      s"the ~1e9-weight doc must rank first, got ${out.toSeq}")
  }

  test("hash split is exhaustive, disjoint, and a pure function of doc_id") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val out = SampleOps.hashSplit(docs).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(out.map(_._3).sum == docs.count(), "every doc in exactly one split")
    assert(out.map(_._1).distinct.sorted.toSeq == Seq("test", "train", "val"))
    // train dominates (12/16 of hash space)
    val bySplit = out.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    assert(bySplit("train") > bySplit("val") && bySplit("train") > bySplit("test"))
    // repartitioning the input changes nothing
    val again = SampleOps.hashSplit(docs.repartition(13)).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(again.toSeq.sorted == out.toSeq.sorted)
  }

  test("cluster split: variant copies stay together where doc-key scatters them") {
    import spark.implicits._
    // ids 1-4 chosen so their md5 first-hex differs (c,c,e,a) — a
    // doc-keyed 12/2/2 split scatters these four copies of one document
    // across val/test/train, the eval-contamination bug q119 exists to
    // prevent
    val docs = Seq(
      (1L, "Shared Content here"),
      (2L, "shared content HERE!!"),
      (3L, "shared,   content here"),
      (4L, "SHARED CONTENT... here"),
      (5L, "a different document entirely")
    ).toDF("doc_id", "text")
    val assigned = SampleOps.clusterSplitAssign(docs).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getString(2)))).toMap
    assert(assigned.sizeIs == 5)
    assert(Set(1L, 2L, 3L, 4L).map(assigned(_)._1).sizeIs == 1,
      "variants share one cluster key")
    assert(Set(1L, 2L, 3L, 4L).map(assigned(_)._2).sizeIs == 1,
      "cluster members always land in one split")
    // the doc-keyed split (q64's key) scatters the same four docs
    val docKeyed = docs.select(col("doc_id"),
        substring(md5(col("doc_id").cast("string")), 1, 1).as("h"))
      .withColumn("split", when(col("h") <= "b", "train")
        .when(col("h") <= "d", "val").otherwise("test"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("split")).toMap
    assert(Set(1L, 2L, 3L, 4L).map(docKeyed).size >= 2,
      s"doc-keyed split must demonstrate the straddle: $docKeyed")
  }

  test("cluster split: minhash cluster ids compose with splitOf for near-dups") {
    import spark.implicits._
    val base = "the training corpus must be deduplicated before any split " +
      "so that evaluation examples can never leak into the training side"
    val near = base.replace("examples", "samples")
    val docs = Seq(
      (1L, base), (2L, near), (3L, base + " as everyone knows"),
      (4L, "completely unrelated text about cooking pasta with fresh basil " +
        "and a generous amount of parmesan cheese on top of everything")
    ).toDF("doc_id", "text")
    val withSplit = graft.ops.DedupOps.minhashClusters(docs)
      .withColumn("split", SampleOps.splitOf(col("cluster_id").cast("string")))
    val byCluster = withSplit.groupBy("cluster_id")
      .agg(countDistinct("split").as("ns"), count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(byCluster.forall(_._2 == 1L), "no cluster straddles splits")
    assert(byCluster.exists(_._3 >= 2L),
      s"fixture must contain a real multi-member cluster: ${byCluster.mkString(",")}")
  }

  test("epoch shuffle: bijection witness, distinct epoch orders, affine arithmetic") {
    import graft.ops.SampleOps
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val out = SampleOps.epochShuffle(docs).collect()
    assert(out.length === 15, "3 epochs x top-5")
    assert(out.forall(_.getAs[Int]("perm_ok") == 1),
      "sum of positions must witness a bijection in every epoch")
    // the three epochs must START differently (B offsets the permutation)
    val firstByEpoch = out.filter(_.getAs[Int]("rnk") == 1)
      .map(r => r.getAs[Int]("epoch") -> r.getAs[Long]("doc_id")).toMap
    assert(firstByEpoch.size === 3)
    assert(firstByEpoch.values.toSet.size >= 2,
      s"epochs should not share a first doc: $firstByEpoch")
    // spot-check the arithmetic: epoch 0's rank-1 doc has the smallest
    // ((i-1) * 1000003) % n over the q92 index
    val n = docs.count()
    val idx = SampleOps.globalIndex(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expect = idx.toSeq
      .map { case (id, i) => (((i - 1) * 1000003L) % n, id) }.min
    val got = out.find(r => r.getAs[Int]("epoch") == 0 &&
      r.getAs[Int]("rnk") == 1).get
    assert((got.getAs[Long]("pos"), got.getAs[Long]("doc_id")) === expect)
  }

  test("negative pairs: exact ring hashes, self-pairs filtered with slot kept") {
    // ring m = 1 degenerates every partner to doc 0 == the anchor: the
    // self-pair filter must drop ALL pairs (the path the sf data never
    // exercises — no accidental self-collision at m = 500)
    val single = Seq((0L, "x", "en")).toDF("doc_id", "text", "lang")
    val qn = graft.SparkEntry.queries("q239_negative_pairs")
    // run the same pairing logic directly on fixtures via the ops body:
    // replicate the expression here would re-implement it, so drive the
    // graded query over a scratch dir holding the fixture as documents
    val dir = java.nio.file.Files.createTempDirectory("graft-negp").toString
    single.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    assert(qn(spark, dir).collect().isEmpty)

    // m = 5, ids 0..4: partners are hand-computable Knuth values
    val five = (0L to 4L).map(i => (i, "x", "en"))
      .toDF("doc_id", "text", "lang")
    five.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = qn(spark, dir).collect()
    val out = rows.map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    // doc 0, slot 0: ((0+1)*2654435761 + 0) % 5 = 2654435761 % 5 = 1
    assert(out((0L, 0)) === 1L)
    // doc 0, slot 1: (2654435761 + 40503) % 5 = 2654476264 % 5 = 4
    assert(out((0L, 1)) === 4L)
    // every surviving pair is a non-self pair
    assert(rows.forall(r => r.getLong(0) != r.getLong(2)))

    // sparse id space: ids {0,1,3}, ring m = 4 — partners hashing to
    // the missing id 2 KEEP their row with a NULL lang (the shortfall
    // is visible per slot), they don't silently vanish
    val sparse = Seq(0L, 1L, 3L).map(i => (i, "x", "en"))
      .toDF("doc_id", "text", "lang")
    sparse.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val sparseRows = qn(spark, dir).collect()
    val gapRows = sparseRows.filter(_.isNullAt(3))
    assert(gapRows.nonEmpty && gapRows.forall(_.getLong(2) === 2L))
  }

  test("budget select: two-phase bucket plan equals the naive global prefix") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val out = graft.ops.SelectionOps.budgetSelect(docs).collect()
      .map(r => r.getBoolean(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    // naive: ONE global window over (rprm desc, doc_id)
    val s = graft.ops.VocabModelOps.classifierScores(docs)
      .select(col("doc_id"), col("score"), col("n_toks"),
        expr("score * 1000 div (1000000 * n_toks)").as("rprm"))
    val budget = s.agg(expr("sum(n_toks) div 10")).collect().head.getLong(0)
    val w = Window.orderBy(col("rprm").desc, col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val naive = s.withColumn("cum", sum(col("n_toks")).over(w))
      .withColumn("selected", col("cum") <= lit(budget))
      .groupBy("selected")
      .agg(count(lit(1)).as("n"), sum("n_toks").as("t"), sum("score").as("sc"))
      .collect().map(r => r.getBoolean(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    for (sel <- Seq(true, false)) {
      assert(out(sel)._1 === naive(sel)._1 && out(sel)._2 === naive(sel)._2 &&
        out(sel)._3 === naive(sel)._3,
        s"two-phase drifted from naive at selected=$sel: ${out(sel)} vs ${naive(sel)}")
    }
    // the prefix fits the budget and both sides are populated
    assert(out(true)._2 <= budget, "selected token mass exceeds the budget")
    assert(out(true)._1 > 0 && out(false)._1 > 0,
      s"degenerate budget fixture: $out")
  }

  test("bpe budget: two-phase bucket plan equals the naive global prefix") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val out = graft.ops.SelectionOps.bpeBudgetSelect(docs).collect()
      .map(r => r.getBoolean(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    // naive: per-doc BPE counts via the same vocabulary join, then ONE
    // global window over (rprm desc, doc_id)
    val (vocab, _) = graft.ops.VocabModelOps.bpeRounds(docs, 3)
    val words = docs.where(col("text").isNotNull)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      .where(col("w") =!= "")
    val bpe = words
      .join(broadcast(vocab.select(col("w"), size(col("toks")).as("wt"))),
        Seq("w"))
      .groupBy("doc_id").agg(sum(col("wt")).cast("long").as("bpe_toks"))
    val s = graft.ops.VocabModelOps.classifierScores(docs)
      .select(col("doc_id"), col("score"))
      .join(bpe, Seq("doc_id"))
      .withColumn("rprm", expr("score * 1000 div (1000000 * bpe_toks)"))
    val budget = s.agg(expr("sum(bpe_toks) div 10")).collect().head.getLong(0)
    val w = Window.orderBy(col("rprm").desc, col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val naive = s.withColumn("cum", sum(col("bpe_toks")).over(w))
      .withColumn("selected", col("cum") <= lit(budget))
      .groupBy("selected")
      .agg(count(lit(1)).as("n"), sum("bpe_toks").as("t"),
        sum("score").as("sc"))
      .collect().map(r => r.getBoolean(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    for (sel <- Seq(true, false)) {
      assert(out(sel)._1 === naive(sel)._1 && out(sel)._2 === naive(sel)._2 &&
        out(sel)._3 === naive(sel)._3,
        s"two-phase drifted from naive at selected=$sel: ${out(sel)} vs ${naive(sel)}")
    }
    assert(out(true)._2 <= budget, "selected BPE token mass exceeds the budget")
    assert(out(true)._1 > 0 && out(false)._1 > 0,
      s"degenerate budget fixture: $out")
  }

  test("bpe budget: planted merges re-price what whitespace pricing cannot split") {
    // Hand-computed merge sequence (weights = sum over word positions of
    // word count): round 1 'a a' (18) -> aaaa = [aa,aa]; round 2 'aa aa'
    // (6) -> aaaa = [aaaa]; round 3 'b b' (3) -> bbbb = [bb,bb]. So BPE
    // costs: aaaa 1, bbbb 2, qrst/uvwx 4 (never merged), fillers 2/word.
    //   doc 1 (en, 6x aaaa):     score 1e6 (one distinct token), bpe 6
    //   doc 2 (en, qrst uvwx bbbb): score 3e6, bpe 10
    //   docs 3-5 (de, 17 2-char fillers each, every character PAIR
    //     globally unique so no filler pair outweighs the planted
    //     merges): score 0, bpe 34 each
    // WHITESPACE pricing (q320's distinct-token rprm) rates both en docs
    // identically (1000 permille); BPE fertility splits them: doc 2 at
    // 3000/10 = 300, doc 1 at 1000/6 = 166. Budget = 118 div 10 = 11:
    // doc 2 wholesale-in (10 <= 11), doc 1 straddles and misses
    // (10 + 6 > 11), fillers out.
    def filler(p1: Char, p2: Char): String =
      ((1 to 9).map(i => s"$p1$i") ++ (1 to 8).map(i => s"$p2$i"))
        .mkString(" ")
    val docs = Seq(
      (1L, "en", "aaaa aaaa aaaa aaaa aaaa aaaa"),
      (2L, "en", "qrst uvwx bbbb"),
      (3L, "de", filler('c', 'd')),
      (4L, "de", filler('e', 'f')),
      (5L, "de", filler('g', 'h')))
      .toDF("doc_id", "lang", "text")
    val out = graft.ops.SelectionOps.bpeBudgetSelect(docs).collect()
      .map(r => r.getBoolean(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(out(true) === ((1L, 10L, 3000000L, 300L)),
      s"selected must be exactly doc 2 at boundary 300: $out")
    assert(out(false) === ((4L, 108L, 1000000L, 166L)),
      s"rejected must be doc 1 + fillers at boundary 166: $out")
    // the q320 whitespace pricing indeed cannot split the two en docs
    val ws = graft.ops.VocabModelOps.classifierScores(docs)
      .select(col("doc_id"),
        expr("score * 1000 div (1000000 * n_toks)").as("rprm"))
      .where(col("doc_id") <= 2L).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(ws(1L) === 1000L && ws(2L) === 1000L,
      s"fixture drift: whitespace densities must tie at 1000: $ws")
  }

  test("q335 gopher rules: one planted witness per rule, hand-computed census") {
    // planted-only census: doc 1 passes all 7 rules; each other doc
    // fails exactly its target rule (the null doc fails wordcount AND
    // stopwords). See SelectionOps.gopherTexts for the constructions.
    val out = graft.ops.SelectionOps.gopherRules(
      graft.ops.SelectionOps.gopherDocs(spark)).collect().head
    assert(out.toSeq === Seq(9L, 2L, 1L, 1L, 1L, 1L, 1L, 2L, 1L),
      s"planted gopher census drifted: ${out.toSeq}")
  }

  test("budget select: straddling density bucket splits by doc_id, hand-computed") {
    // All-English docs 1-3 carry TWO distinct vocab tokens each
    // (weights 1e6 — every x-token is pure-en), so each has density
    // rprm = 1000 and 2 tokens: ONE density bucket of mass 6. The de
    // fillers carry 17 distinct zero-weight tokens each, so the corpus
    // totals 40 tokens and budget = 4. The 1000-bucket STRADDLES
    // (0 < 4 < 6) and the within-bucket doc_id order decides: docs 1
    // and 2 fit (cum 2, 4), doc 3 does not — the two-phase plan's hard
    // case, hand-computed.
    val docs = Seq(
      (1L, "en", "x1 x2"), (2L, "en", "x1 x3"), (3L, "en", "x1 x4"),
      (4L, "de", (1 to 17).map(i => s"y$i").mkString(" ")),
      (5L, "de", (1 to 17).map(i => s"z$i").mkString(" ")))
      .toDF("doc_id", "lang", "text")
    val out = graft.ops.SelectionOps.budgetSelect(docs).collect()
      .map(r => r.getBoolean(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(4)))).toMap
    assert(out(true) === ((2L, 4L, 1000L)),
      s"selected side must be docs 1-2 at boundary 1000: $out")
    assert(out(false) === ((3L, 36L, 1000L)),
      s"rejected side must be doc 3 + fillers: $out")
  }
}
