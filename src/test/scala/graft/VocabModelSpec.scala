package graft

import org.apache.spark.sql.Row

import graft.ops.VocabModelOps

/** Pins the vocabulary-model operators' semantics on hand-computable
  * fixtures — the cases where BPE implementations classically diverge
  * (greedy non-overlapping merge application) and the char-LM's
  * train/score split contract.
  */
class VocabModelSpec extends SparkSpec {

  import spark.implicits._

  test("BPE merge application is greedy left-to-right non-overlapping") {
    // "aaa" tokenizes to [a,a,a]: the pair (a,a) occurs at two positions
    // but greedy application merges only the FIRST, giving [aa,a] — an
    // all-positions replace would give the wrong round-2 statistics.
    val docs = Seq((0L, "aaa aaa b")).toDF("doc_id", "text")
    val merges = VocabModelOps.bpeMergeRounds(docs, rounds = 2).collect()
    assert(merges.toSeq == Seq(
      // round 1: "a a" seen twice per "aaa" occurrence, weighted 2 words
      Row(1, "a a", 4L),
      // round 2 only exists because round 1 under-merged: [aa, a]
      Row(2, "aa a", 2L)))
  }

  test("BPE merges compose: the merged symbol participates in later rounds") {
    val docs = Seq((0L, "abab abab abab cd")).toDF("doc_id", "text")
    val merges = VocabModelOps.bpeMergeRounds(docs, rounds = 3).collect()
    // round 1 merges (a,b) -> ab twice per word: [ab, ab];
    // round 2 merges (ab,ab) -> abab — only possible post-merge
    assert(merges(0).getString(1) == "a b" && merges(0).getLong(2) == 6L)
    assert(merges(1).getString(1) == "ab ab" && merges(1).getLong(2) == 3L)
  }

  test("BPE encode applies the final vocabulary and reports exact fertility") {
    // corpus vocab {aaa: 3, b: 3}; round 1 merges (a,a), round 2 (aa,a)
    // -> final tokenization aaa=[aaa] (1 token), b=[b]
    val docs = Seq(
      (0L, "en", "aaa aaa b"),
      (1L, "fr", "aaa b b"))
      .toDF("doc_id", "lang", "text")
    val out = VocabModelOps.bpeEncodeStats(docs, rounds = 2).collect()
    assert(out.toSeq === Seq(
      // en: 3 words, 3 tokens, 7 chars -> 3*10000 div 7 = 4285
      Row("en", 3L, 3L, 7L, 4285L),
      Row("fr", 3L, 3L, 5L, 6000L)))
  }

  test("char LM: a score doc fully covered by training has coverage 1.0") {
    val docs = Seq(
      (0L, "en", "abcdef"), // train (even doc_id)
      (1L, "en", "abcd")    // score (odd): trigrams abc, bcd ⊂ train
    ).toDF("doc_id", "lang", "text")
    val r = VocabModelOps.charTrigramScore(docs).collect()
    assert(r.length == 1)
    val row = r(0)
    assert(row.getAs[Long]("n_tri") == 2L)
    assert(row.getAs[Long]("n_known") == 2L)
    assert(row.getAs[Double]("coverage") == 1.0)
    assert(row.getAs[Double]("mean_known_freq") == 1.0)
  }

  test("char LM: unseen trigrams lower coverage, never the known mass") {
    val docs = Seq(
      (0L, "en", "abcdef"),
      (1L, "en", "abcxyz") // abc known; bcx, cxy, xyz unseen
    ).toDF("doc_id", "lang", "text")
    val row = VocabModelOps.charTrigramScore(docs).collect()(0)
    assert(row.getAs[Long]("n_tri") == 4L)
    assert(row.getAs[Long]("n_known") == 1L)
    assert(row.getAs[Double]("coverage") == 0.25)
  }

  test("quality classifier: integer weights, prior threshold, confusion cells") {
    // df: a -> en 2/3 (w=666666), b -> en 1/3 (w=333333); prior_bp=5000
    // doc 1 {a,b}: 999999*1e4 <  5000*1e6*2 -> pred false (knife edge)
    // doc 2 {a}:   666666*1e4 >= 5000*1e6*1 -> pred true
    // doc 3 {b} and doc 4 {b,a}: below -> pred false
    val docs = Seq(
      (1L, "en", "a b"),
      (2L, "en", "a"),
      (3L, "de", "b"),
      (4L, "de", "b a"))
      .toDF("doc_id", "lang", "text")
    val out = VocabModelOps.qualityClassifier(docs).collect().toSeq
    assert(out === Seq(
      org.apache.spark.sql.Row(false, false, 2L),
      org.apache.spark.sql.Row(true, false, 1L),
      org.apache.spark.sql.Row(true, true, 1L)))
  }

  test("calibration bins: hand-computed observed vs predicted basis points") {
    // same fixture as the classifier test; per-doc predictions:
    // doc1 999999/2e6 -> bin 499, doc2 666666/1e6 -> 666,
    // doc3 333333/1e6 -> 333, doc4 999999/2e6 -> 499
    val docs = Seq(
      (1L, "en", "a b"),
      (2L, "en", "a"),
      (3L, "de", "b"),
      (4L, "de", "b a"))
      .toDF("doc_id", "lang", "text")
    val out = VocabModelOps.calibrationBins(docs).collect().toSeq
    assert(out === Seq(
      org.apache.spark.sql.Row(333L, 1L, 0L, 0L, 3333L),
      org.apache.spark.sql.Row(499L, 2L, 1L, 5000L, 4999L),
      org.apache.spark.sql.Row(666L, 1L, 1L, 10000L, 6666L)))
  }

  test("q301 training: loss decreases strictly on a separable fixture") {
    // perfectly separable: every en token appears only in en docs
    // (weight 1e6 -> f1 = 1000) and every de token only in de docs
    // (weight 0 -> f1 = 0); balanced classes and equal token counts zero
    // the bias and length gradients, so epoch 1 moves ONLY the en-share
    // weight — and must move it positive, cutting the loss
    val docs = Seq(
      (1L, "en", "ea eb"), (2L, "en", "ec ed"),
      (3L, "en", "ee ef"), (4L, "en", "eg eh"),
      (5L, "de", "da db"), (6L, "de", "dc dd"),
      (7L, "de", "de df"), (8L, "de", "dg dh"))
      .toDF("doc_id", "lang", "text")
    val out = VocabModelOps.classifierTrain(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    val (w1e1, m1) = out((1L, 1L))
    val (w1e2, m2) = out((2L, 1L))
    assert(m1 === 250000L, "zero-start hard sigmoid loss is exactly 1/4")
    assert(m2 < m1, s"epoch-2 entering loss $m2 must be below $m1")
    assert(w1e1 > 0L, s"en-share weight must learn positive: $w1e1")
    assert(w1e2 >= w1e1, s"separable fixture keeps pushing: $w1e2 < $w1e1")
    // bias and length see zero gradient on the balanced fixture
    assert(out((1L, 0L))._1 === 0L && out((1L, 2L))._1 === 0L)
  }

  test("q305 mini-batch training: loss <= full-batch after equal data passes") {
    // the q301 separable fixture; 2 epochs x 4 md5-sliced batches = 8
    // sequential updates over the same data the full-batch run sees in
    // its 2 epochs — the mini-batch trajectory must end at least as low
    val docs = Seq(
      (1L, "en", "ea eb"), (2L, "en", "ec ed"),
      (3L, "en", "ee ef"), (4L, "en", "eg eh"),
      (5L, "de", "da db"), (6L, "de", "dc dd"),
      (7L, "de", "de df"), (8L, "de", "dg dh"))
      .toDF("doc_id", "lang", "text")
    val mb = VocabModelOps.classifierTrainMiniBatch(docs).collect()
    assert(mb.length === 2 * 4 * 3, "one row per (epoch, batch, feature)")
    val fw = mb.filter(r => r.getLong(0) == 2L && r.getLong(1) == 3L)
      .map(r => r.getLong(2) -> r.getLong(3)).toMap
    val fb = VocabModelOps.classifierTrain(docs).collect()
      .filter(_.getLong(0) == 2L)
      .map(r => r.getLong(1) -> r.getLong(2)).toMap
    val mbLoss = VocabModelOps.hardSigmoidMse(docs, fw(0L), fw(1L), fw(2L))
    val fbLoss = VocabModelOps.hardSigmoidMse(docs, fb(0L), fb(1L), fb(2L))
    info(s"mini-batch final loss $mbLoss vs full-batch $fbLoss (micro-units)")
    assert(mbLoss <= fbLoss,
      s"equal data passes: mini-batch $mbLoss must not exceed full-batch $fbLoss")
    assert(mbLoss < 250000L, "training must improve on the zero start")
    // the epoch's batch sizes partition the corpus (empty slices allowed)
    val nsum = mb.filter(r => r.getLong(0) == 1L && r.getLong(2) == 0L)
      .map(_.getLong(4)).sum
    assert(nsum === 8L, s"batch sizes must sum to the corpus: $nsum")
  }

  test("q305 mini-batch training is repartition-invariant (integer steps)") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val a = VocabModelOps.classifierTrainMiniBatch(docs).collect().toSeq
    val b = VocabModelOps.classifierTrainMiniBatch(docs.repartition(7))
      .collect().toSeq
    assert(a == b)
  }

  test("q301 training is repartition-invariant (integer gradients)") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val a = VocabModelOps.classifierTrain(docs).collect().toSeq
    val b = VocabModelOps.classifierTrain(docs.repartition(7)).collect().toSeq
    assert(a == b)
  }

  test("quality classifier counts repeated tokens once per document") {
    // without the distinct, doc 2 would double-count 'a' and flip cells
    val docs = Seq(
      (1L, "en", "a b"),
      (2L, "en", "a a a"),
      (3L, "de", "b"),
      (4L, "de", "b a"))
      .toDF("doc_id", "lang", "text")
    val out = VocabModelOps.qualityClassifier(docs).collect().toSeq
    assert(out === Seq(
      org.apache.spark.sql.Row(false, false, 2L),
      org.apache.spark.sql.Row(true, false, 1L),
      org.apache.spark.sql.Row(true, true, 1L)))
  }

  test("factored inference pipeline equals the inline classifierScores") {
    // the q314 components (tokenWeights + inferScores) applied to the
    // training corpus itself must reproduce classifierScores exactly —
    // the two formulations share one arithmetic by construction
    import org.apache.spark.sql.functions._
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val inline = VocabModelOps.classifierScores(docs)
      .select("doc_id", "score", "n_toks")
    val factored = VocabModelOps.inferScores(docs,
      VocabModelOps.tokenWeights(docs))
    assert(inline.exceptAll(factored).isEmpty &&
      factored.exceptAll(inline).isEmpty,
      "factored inference drifted from the graded inline pipeline")
    assert(factored.count() > 0)
  }

  test("bigram perplexity: hand-computed exact micro-bits on one bigram") {
    // train doc 0 "a b": c12(a,b) = 1, c1(a) = 1, V = 2. Scored doc 1
    // "a b": num = 2, den = 3. In the 6-bit-mantissa table arithmetic:
    // L(2) = 1e6 (e=1, mantissa 64 -> T[0] = 0), L(3) = 1e6 + T[32]
    // where T[32] = round(1e6*log2(96/64)) = 584963. Surprisal =
    // L(3) - L(2) = 584963 micro-bits over 1 bigram -> band 0.
    val docs = Seq((0L, "a b"), (1L, "a b")).toDF("doc_id", "text")
    val out = VocabModelOps.bigramPerplexity(docs).collect()
    assert(out.toSeq === Seq(Row(0L, 1L, 1L, 584963L, 584963L)),
      s"hand-computed micro-bits drifted: ${out.mkString(",")}")
  }

  test("bigram perplexity: planted gibberish bands far above fluent text") {
    // train: 10 copies of a fixed sentence (every scored-sentence
    // bigram has c12 = 10) + one 50-word vocabulary inflator, so
    // V = 55. Scored doc 1 repeats the sentence: avg surprisal ~2.65
    // bits (e.g. p(cat|the) = 11/75) -> band 2. Scored doc 3 is
    // gibberish with unseen prefixes: every bigram pays L(V) = L(55)
    // = 5781360 micro-bits -> band 5. Doc 5 has one token: no bigrams,
    // out of scope by contract.
    val sentence = "the cat sat on the mat"
    val train = (0 until 10).map(i => (2L * i, sentence)) :+
      (20L, (1 to 50).map(i => s"r$i").mkString(" "))
    val scored = Seq((1L, sentence),
      (3L, (1 to 7).map(i => s"g$i").mkString(" ")),
      (5L, "solo"))
    val docs = (train ++ scored).toDF("doc_id", "text")
    val out = VocabModelOps.bigramPerplexity(docs).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
    assert(out.length === 2 && out.map(_._2._1).sum === 2L,
      s"exactly the two scored multi-token docs must band: ${out.mkString(",")}")
    val (lowBand, low) = out.head
    val (highBand, high) = out.last
    assert(low._2 === 5L && high._2 === 6L,
      s"fluent doc has 5 bigrams, gibberish 6: ${out.mkString(",")}")
    assert(lowBand === 2L && highBand === 5L,
      s"fluent text must band at 2 bits/token, gibberish at 5 (log2(V)): ${out.mkString(",")}")
    assert(high._3 === 5781360L && high._4 === 5781360L,
      s"gibberish pays exactly L(55) = 5781360 micro-bits per bigram: ${out.mkString(",")}")
  }

  test("q362 unlearning: subtraction == retrain, V shrinks, the shift is real") {
    import org.apache.spark.sql.functions._
    // train (even ids): doc 0 anchors a fluent model; doc 26 (% 13 = 0,
    // the deletion set) is the ONLY doc containing "zebra quagga" — its
    // removal must retire both words from the vocabulary (V shrinks)
    // and flip the scored bigram from seen to unseen. Score doc 1
    // (survivor) carries "zebra quagga".
    val sentence = "the cat sat on the mat"
    val docs = Seq(
      (0L, s"$sentence $sentence"),
      (26L, "zebra quagga zebra quagga"),
      (1L, "zebra quagga")).toDF("doc_id", "text")
    val train = docs.where(col("doc_id") % 2 === 0)

    // pre-unlearn truth (the full model) for the non-vacuity check
    val preBands = VocabModelOps.bigramPerplexity(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

    val tn = VocabModelOps.lmMaterialize(spark, train, "graft_lmspec")
    val vBefore = spark.table(tn.cw).count()
    VocabModelOps.unlearnLm(spark,
      train.where(col("doc_id") % 13 === 0), "graft_lmspec")

    // relations equal a from-scratch retrain on the surviving train docs
    val surv = train.where(col("doc_id") % 13 =!= 0)
    val (r12, r1, rv) = VocabModelOps.bigramModel(surv)
    assert(spark.table(tn.c12).collect().toSet === r12.collect().toSet,
      "unlearned c12 must equal the retrained c12")
    val dc1 = spark.table(tn.c12).groupBy("w1")
      .agg(sum(col("c12")).as("c1"))
    assert(dc1.collect().toSet === r1.collect().toSet,
      "the DERIVED c1 must equal the retrained c1")
    val vAfter = spark.table(tn.cw).count()
    assert(vAfter === rv.head().getLong(0),
      "count-form vocabulary must shrink to the retrained V exactly")
    assert(vAfter < vBefore,
      "retiring the only doc holding a word must shrink V")
    assert(spark.table(tn.cw).where(col("w").isin("zebra", "quagga")).isEmpty,
      "the deleted doc's private words must leave the vocabulary")

    // scored census from the unlearned STORED model == retrain census
    val score = docs.where(col("doc_id") % 2 === 1 && col("doc_id") % 13 =!= 0)
    val vv = spark.table(tn.cw).agg(count(lit(1)).as("v"))
    val unlearned = VocabModelOps.pplCensus(VocabModelOps
        .scoreBigramsPerDoc(score, spark.table(tn.c12), dc1, vv))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val retrained = VocabModelOps.pplCensus(VocabModelOps
        .scoreBigramsPerDoc(score, r12, r1, rv))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(unlearned === retrained, "unlearned scores must equal a retrain's")
    assert(unlearned !== preBands,
      "the planted deletion must measurably shift the census — " +
        "a vacuous fixture would prove nothing")
  }

  test("q366 incremental learning: fold == retrain on the union, new words enter V") {
    import org.apache.spark.sql.functions._
    val base = Seq((0L, "the cat sat on the mat"))
      .toDF("doc_id", "text")
    val batch = Seq((2L, "zebra quagga zebra"), (4L, "the cat naps"))
      .toDF("doc_id", "text")
    val tn = VocabModelOps.lmTables("graft_lmaspec")
    VocabModelOps.lmMaterialize(spark, base, "graft_lmaspec")
    VocabModelOps.learnLm(spark, batch, "graft_lmaspec")
    val (r12, r1, rv) = VocabModelOps.bigramModel(base.unionByName(batch))
    assert(spark.table(tn.c12).collect().toSet === r12.collect().toSet,
      "folded c12 must equal the union retrain's")
    assert(spark.table(tn.c12).groupBy("w1").agg(sum(col("c12")).as("c1"))
      .collect().toSet === r1.collect().toSet,
      "the derived c1 must equal the union retrain's")
    assert(spark.table(tn.cw).count() === rv.head().getLong(0),
      "new words must enter the count-form vocabulary exactly")
    // overlapping counts summed, not overwritten: 'the cat' appears in
    // base AND batch
    val theCat = spark.table(tn.c12)
      .where(col("w1") === "the" && col("w2") === "cat").head().getLong(2)
    assert(theCat === 2L, "overlapping bigram counts must SUM across folds")

    // append-then-unlearn round-trips to the base model exactly
    VocabModelOps.unlearnLm(spark, batch, "graft_lmaspec")
    val (b12, _, bv) = VocabModelOps.bigramModel(base)
    assert(spark.table(tn.c12).collect().toSet === b12.collect().toSet,
      "learn then unlearn must be a perfect inverse")
    assert(spark.table(tn.cw).count() === bv.head().getLong(0))
  }

  test("q331 interpolation: common continuation rescues an unseen bigram") {
    // train doc 0 "c a c a c a c a c a": V = {c, a} = 2, N = 10,
    // cu(a) = 5. Scored doc 1 "q a" and doc 3 "q z" both have unseen
    // PREFIX q, so pure bigram add-one prices them identically at
    // 1/V = 1/2 (exactly 1e6 micro-bits). Interpolation separates them:
    //   den = 2*V*(N+V) = 48,
    //   num(q a) = 1*(N+V) + (cu(a)+1)*V = 12 + 12 = 24 -> exactly 1 bit
    //   num(q z) = 12 + 1*2 = 14 -> L(48) - L(14) = 5584963 - 3807355
    val docs = Seq((0L, "c a c a c a c a c a"),
      (1L, "q a"), (3L, "q z")).toDF("doc_id", "text")
    val bgOut = VocabModelOps.bigramPerplexityPerDoc(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(bgOut(1L) === 1000000L && bgOut(3L) === 1000000L,
      s"pure bigram cannot separate unseen bigrams: $bgOut")
    val out = VocabModelOps.interpolatedPerplexityPerDoc(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out(1L) === 1000000L,
      s"common continuation must cost exactly one bit (p = 1/2): $out")
    assert(out(3L) === 1777608L,
      s"unseen continuation pays the hand-computed L(48) - L(14): $out")
  }

  test("q346: per-source drilldown isolates the gibberish feed exactly") {
    // train (doc 0): the q328 sentence fixture with V = 55; source F
    // ships the fluent scored doc (band 2), source G the gibberish one
    // (exactly L(55) = 5781360 per bigram, >= the 5-bit line)
    val sentence = "the cat sat on the mat"
    val train = (0 until 10).map(i => (2L * i, "T", sentence)) :+
      (20L, "T", (1 to 50).map(i => s"r$i").mkString(" "))
    val scored = Seq((1L, "F", sentence),
      (3L, "G", (1 to 7).map(i => s"g$i").mkString(" ")))
    val docs = (train ++ scored).toDF("doc_id", "source", "text")
    val out = VocabModelOps.sourcePerplexity(docs).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out("G") === ((1L, 5781360L, 1L)),
      s"the gibberish feed must read exactly L(55) and trip the 5-bit line: $out")
    assert(out("F")._1 === 1L && out("F")._2 < 3000000L &&
      out("F")._3 === 0L,
      s"the fluent feed must stay under 3 bits and below the line: $out")
    assert(!out.contains("T"),
      s"train-slice sources must not appear in the scored census: $out")
  }

  test("q331 interpolation never exceeds the pure-bigram score by over a bit") {
    // p >= p_bigram / 2 pointwise, so exact surprisal <= bigram + 1 bit;
    // the 6-bit mantissa quantization adds at most one table step
    // (<= 22600 micro-bits) per L() call. Checked per doc on the corpus.
    import org.apache.spark.sql.functions._
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val bg = VocabModelOps.bigramPerplexityPerDoc(docs)
      .select(col("doc_id"), col("ppl").as("bg"))
    val ip = VocabModelOps.interpolatedPerplexityPerDoc(docs)
      .select(col("doc_id"), col("ppl").as("ip"))
    val joined = bg.join(ip, Seq("doc_id"))
    assert(joined.count() > 0)
    val viol = joined
      .where(col("ip") > col("bg") + lit(1000000L + 2 * 22600L))
      .count()
    assert(viol === 0L,
      "interpolated perplexity exceeded bigram + 1 bit (+ quantization) somewhere")
  }
}
