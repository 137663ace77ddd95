package graft

import org.apache.spark.sql.functions._

import graft.ops.CurationOps

/** Fixture-backed semantics pins for the curation operators (q65-q67):
  * planted repetitive / contaminated docs that the synthetic corpus may
  * not contain, so the graded oracles can't be the only line of defense.
  */
class CurationSpec extends SparkSpec {
  import spark.implicits._

  test("repetition stats flag planted repetitive docs and pass clean ones") {
    val docs = Seq(
      // top token 'x' is 5/7 of tokens -> repetitive
      (1L, "x x x x x y z"),
      // bigram "a b" repeats 3x: 6 of 7 bigrams are dup excess... (a b a b a b a b -> 7 bigrams, 'a b' c=4, 'b a' c=3 -> dup excess 5)
      (2L, "a b a b a b a b"),
      // all-distinct tokens -> clean
      (3L, "q w e r t y u"),
      (4L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    val out = CurationOps.repetitionStats(docs).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(!out.contains(4L)) // null text excluded
    val r1 = out(1L)
    assert(r1.getLong(1) == 7 && r1.getLong(2) == 3 && r1.getLong(3) == 5)
    assert(r1.getInt(6) == 1)
    val r2 = out(2L)
    // 8 tokens, 7 bigrams: "a b" x4 + "b a" x3 -> dup excess (4-1)+(3-1)=5
    assert(r2.getLong(4) == 7 && r2.getLong(5) == 5)
    assert(r2.getInt(6) == 1)
    val r3 = out(3L)
    assert(r3.getLong(2) == 7 && r3.getLong(5) == 0 && r3.getInt(6) == 0)
  }

  test("q246 homoglyph fold collapses Cyrillic/Greek lookalike spam the plain normalizer misses") {
    val docs = Seq(
      (1L, Some("jоin hаsh rоw sсan bаtch")), // Cyrillic о а с
      (2L, Some("join hash row scan batch")), // ASCII original
      (3L, Some("jοin hash rοw scan batch")), // Greek ο
      (4L, Some("unrelated text here")),
      (5L, Option.empty[String])
    ).toDF("doc_id", "text")
    val groups = CurationOps.homoglyphDedup(docs).collect()
    assert(groups.length == 1, s"exactly one dup group, got ${groups.toSeq}")
    assert(groups.head.getString(0) == "join hash row scan batch")
    assert(groups.head.getLong(1) == 3L && groups.head.getLong(2) == 1L)
    assert(groups.head.getString(3) == "1,2,3")
    // negative control: the q76 byte-level normalizer does NOT see the
    // collision — Cyrillic letters are non-[a-z0-9] and get STRIPPED,
    // leaving three distinct strings; the fold is what closes the evasion
    val plain = CurationOps.normalize(docs)
      .where(col("doc_id") <= 3).select("norm_text")
      .collect().map(_.getString(0)).toSet
    assert(plain.size == 3,
      s"plain normalization must leave the three spellings distinct: $plain")
  }

  test("single-token doc has zero bigrams and is not flagged by bigram rule") {
    val docs = Seq((1L, "solo")).toDF("doc_id", "text")
    val r = CurationOps.repetitionStats(docs).collect().head
    // top_tok(1)*5 >= n_tokens(1) -> flagged by the unigram rule; the
    // bigram columns must coalesce to 0 rather than null
    assert(r.getLong(4) == 0 && r.getLong(5) == 0 && r.getInt(6) == 1)
  }

  test("contamination flags exactly the docs sharing a 4-gram with the benchmark slice") {
    // doc 0 is the benchmark (0 % 17 == 0); doc 18 copies 4 consecutive
    // tokens from it, doc 19 shares only 3 consecutive tokens, doc 20 is
    // disjoint, doc 21 is too short to shingle.
    val docs = Seq(
      (0L, "alpha beta gamma delta epsilon", "src_a"),
      (18L, "x beta gamma delta epsilon y", "src_a"),
      (19L, "x beta gamma delta y z", "src_b"),
      (20L, "p q r s t u", "src_b"),
      (21L, "alpha beta", "src_b")
    ).toDF("doc_id", "text", "source")
    val out = CurationOps.contamination(docs).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out("src_a") == (1L, 1L)) // doc 18 contaminated; doc 0 excluded
    assert(out("src_b") == (3L, 0L)) // 19/20/21 all clean
  }

  test("mixture sample upsamples by rate and is deterministic") {
    val docs = (0L until 100L).map(i =>
      (i, Seq("en", "de", "fr", "es", "zh")(i.toInt % 5))).toDF("doc_id", "lang")
    val out = CurationOps.mixtureSample(docs).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
    val byLang = out.groupBy(_._2).view.mapValues(_.length).toMap
    // fr rate 2.5: every fr doc emits >= 2 copies, total in [2n, 3n]
    val frDocs = out.filter(_._2 == "fr").groupBy(_._1)
    assert(frDocs.values.forall(c => c.length == 2 || c.length == 3))
    assert(byLang("fr") >= 40 && byLang("fr") <= 60)
    // en rate 1.2: every en doc at least once
    assert(out.filter(_._2 == "en").map(_._1).distinct.length == 20)
    // zh rate 0.1: strictly subsampled
    assert(byLang.getOrElse("zh", 0) < 20)
    // copy numbers are dense 1..n per doc
    assert(out.groupBy(_._1).values.forall(cs =>
      cs.map(_._3).sorted.toSeq == (1 to cs.length)))
    val again = CurationOps.mixtureSample(docs).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
    assert(again.toSeq == out.toSeq)
  }

  test("fuzzy pairs respect (brand, first-token) blocking") {
    val parts = Seq(
      (1L, "B1", "red widget"),
      (2L, "B1", "red widgets"), // dist 1, same block as 1
      (3L, "B1", "blu widget"),  // dist 3 vs "red widget" but first token differs -> blocked out
      (4L, "B2", "red widget"),  // same name, different brand -> never paired with 1
      (5L, "B1", "red widget")   // exact dup of 1, same block
    ).toDF("p_partkey", "p_brand", "p_name")
    val out = CurationOps.fuzzyPairs(parts).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    // block (B1, red) = {1, 2, 5}: pairs (1,2) d1, (1,5) d0, (2,5) d1.
    // (1,3) is within distance but cross-block -> excluded BY DESIGN;
    // (1,4) is cross-brand -> excluded.
    assert(out("B1") == ((3L, 1L, 2L, 1L)),
      s"expected 3 pairs / 1 exact / 2 fuzzy / max dist 1, got $out")
    assert(!out.contains("B2"), "singleton blocks produce no pairs")
  }

  test("doc chunking: full coverage, correct overlap, exact reassembly") {
    val text40 = (1 to 40).map(i => s"t$i").mkString(" ")
    val docs = Seq(
      (1L, text40),                            // 40 tokens -> 2 chunks
      (2L, "a b c"),                           // n <= window -> 1 chunk
      (3L, (1 to 32).map(i => s"u$i").mkString(" ")), // exactly window -> 1 chunk
      (4L, (1 to 33).map(i => s"v$i").mkString(" ")), // window+1 -> 2 chunks
      (5L, null.asInstanceOf[String])          // excluded
    ).toDF("doc_id", "text")
    val out = CurationOps.chunkDocs(docs, window = 32, stride = 24).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getString(3)))
    val byDoc = out.groupBy(_._1)
    assert(!byDoc.contains(5L))
    assert(byDoc(2L).map(_._4).toSeq == Seq("a b c"))
    assert(byDoc(3L).length == 1 && byDoc(4L).length == 2)
    // doc 1: chunk 0 = tokens 1..32, chunk 1 = tokens 25..40 (8-token overlap)
    val c = byDoc(1L).sortBy(_._2)
    assert(c.map(_._3).toSeq == Seq(32L, 16L))
    assert(c(0)._4 == (1 to 32).map(i => s"t$i").mkString(" "))
    assert(c(1)._4 == (25 to 40).map(i => s"t$i").mkString(" "))
    // every token of every doc appears in at least one of its chunks
    assert(c.flatMap(_._4.split(" ")).distinct.length == 40)
  }

  test("exact-moment outliers flag the planted heavy tail only") {
    val docs = (1 to 9).map(i => (i.toLong, "en", 100L)) ++
      Seq((10L, "en", 1000L),   // ~2.8 sigma above the en mean -> flagged
        (11L, "de", 5000L))     // singleton stratum: n=1 degenerates to no outlier
    val out = CurationOps.lengthOutliers(
      docs.toDF("doc_id", "lang", "n_chars")).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out("en") == ((10L, 1L)), s"exactly the planted outlier: $out")
    assert(out("de") == ((1L, 0L)), s"singleton stratum has no outlier: $out")
  }

  test("pii redaction: counts on raw text, sequential redaction, nulls safe") {
    val docs = Seq(
      (1L, "mail a.b+c@x-y.co and z9@d.org now"),
      (2L, "hosts 10.0.0.1 192.168.100.200 call 555-867-5309"),
      (3L, "dotted 555.123.4567 spaced 555 123 4567"),
      (4L, "clean words, version 1.2 and number 12345"),
      (5L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    val out = CurationOps.piiRedact(docs).collect()
      .map(r => r.getLong(0) ->
        ((Option(r.getString(1)), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(out(1L) == ((Some("mail [EMAIL] and [EMAIL] now"), 2L, 0L, 0L)))
    assert(out(2L) == ((Some("hosts [IP] [IP] call [PHONE]"), 0L, 2L, 1L)))
    assert(out(3L) == ((Some("dotted [PHONE] spaced [PHONE]"), 0L, 0L, 2L)))
    // "1.2" is neither a 4-octet IP nor a phone; no false positives
    assert(out(4L) == ((Some("clean words, version 1.2 and number 12345"), 0L, 0L, 0L)))
    assert(out(5L) == ((None, 0L, 0L, 0L)), "null text: null redacted, zero counts")
  }

  test("domain stats: www-strip + case-fold merge variants, blocklist drops") {
    val docs = Seq(
      (1L, "see https://spam.example.com/offer and https://docs.example.org/g"),
      (2L, "links http://www.news-site.com/a/b then http://news-site.com/c"),
      (3L, "mixed https://News-Site.com/top https://tracker.bad.net/x"),
      (4L, "no links"),
      (5L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    val out = CurationOps.domainStats(docs).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // www./case variants of news-site.com merge: 3 urls across docs 2+3
    assert(out("news-site.com") == ((3L, 2L)), s"got $out")
    assert(out("docs.example.org") == ((1L, 1L)))
    assert(!out.contains("spam.example.com") && !out.contains("tracker.bad.net"),
      "blocklisted domains are dropped")
    assert(out.size == 2, s"nothing else surfaces: $out")
  }

  test("canonicalize: richest raw variant wins, singletons never surface") {
    val docs = Seq(
      (10L, "Hello world"),
      (11L, "HELLO, world!!"),          // same normalized, longer raw -> wins
      (12L, "hello   world"),
      (20L, "a lone document"),          // singleton
      (21L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    val out = CurationOps.canonicalize(docs).collect()
    assert(out.length == 1, s"only the variant cluster surfaces: ${out.mkString(",")}")
    assert(out.head.getAs[String]("norm_key") == "hello world")
    assert(out.head.getAs[Long]("keep_id") == 11L, "longest raw text wins")
    assert(out.head.getAs[Long]("n_variants") == 3L)
    assert(out.head.getAs[Long]("keep_chars") == 14L)
  }

  test("canonicalize: equal-length variants tiebreak on min doc_id") {
    val eq = Seq((30L, "Same; Length"), (31L, "same- length")) // both 12 chars
      .toDF("doc_id", "text")
    val out = CurationOps.canonicalize(eq).collect()
    assert(out.length == 1 && out.head.getAs[Long]("keep_id") == 30L,
      s"min doc_id wins the tie: ${out.mkString(",")}")
  }

  test("temperature mixture: rates sum to 1, sqrt upweights small sources") {
    val docs = Seq(
      (1L, "s_big", 900L), (2L, "s_big", 900L), (3L, "s_big", 900L),
      (4L, "s_big", 900L), (5L, "s_small", 400L)
    ).map { case (id, s, n) => (id, s, n) }
      .toDF("doc_id", "source", "n_chars")
    val out = CurationOps.temperatureMixture(docs, budgetChars = 1000000L)
      .collect().map(r => r.getAs[String]("source") ->
        ((r.getAs[Long]("n_chars_total"), r.getAs[Double]("rate"),
          r.getAs[Long]("alloc_chars")))).toMap
    val (bigMass, bigRate, bigAlloc) = out("s_big")
    val (smallMass, smallRate, smallAlloc) = out("s_small")
    assert(bigMass == 3600L && smallMass == 400L)
    // sqrt weighting: 60/(60+20)=0.75 vs proportional 0.9 — small source
    // rises from 0.1 to 0.25
    assert(math.abs(bigRate - 0.75) < 1e-12 && math.abs(smallRate - 0.25) < 1e-12)
    assert(math.abs(bigRate + smallRate - 1.0) < 1e-12, "rates sum to 1")
    assert(bigAlloc == 750000L && smallAlloc == 250000L)
  }

  test("quality mask: each planted doc trips exactly its designed reasons") {
    import graft.ops.CurationOps
    // letter-only tokens so the alpha ratio stays high by construction
    def toks(n: Int) = List.tabulate(n)(i => ("" + ('a' + i % 26).toChar) * 3)
    val long = ("wx" :: toks(50)).mkString(" ")  // len 202, 51 toks, alpha .75
    val short = ("wx" :: toks(30)).mkString(" ") // len 122 < 150, rest passes
    val digits = (1 to 30).map(i => i.toString * 3).mkString(" ") // alpha 0
    val docs = Seq(
      (1L, long, "en", "s0"),            // kept: mask 0
      (2L, short, "en", "s0"),           // short only: mask 1
      (3L, "a a a", "en", "s0"),         // short+few+alpha+repetitive: 15
      (4L, digits, "en", "s1"),          // low alpha only: mask 4
      (5L, long, "zh", "s1"),            // lang off-list only: mask 16
      (6L, null.asInstanceOf[String], "en", "s1")
    ).toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars",
        coalesce(length(col("text")).cast("long"), lit(0L)))
    val masks = CurationOps.qualityMask(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Int]("mask")).toMap
    assert(masks === Map(1L -> 0, 2L -> 1, 3L -> 15, 4L -> 4, 5L -> 16))
    val abl = CurationOps.filterAblation(docs).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(abl("short") === ((2L, 1L, 31L)))
    assert(abl("few_tokens") === ((1L, 0L, 0L)), "doc 3 multi-reason: not solely")
    assert(abl("low_alpha") === ((2L, 1L, 30L)))
    assert(abl("repetitive") === ((1L, 0L, 0L)))
    assert(abl("lang_offlist") === ((1L, 1L, 51L)))
  }

  test("budget mix: greedy order, partial last source, budget landed exactly") {
    import graft.ops.CurationOps
    // sources with kept-rates 1.0 (s_hi), 0.5 (s_mid), 0.0 (s_low);
    // kept chars: s_hi 300, s_mid 200. budget 400 -> s_hi whole (300),
    // s_mid partial (100), s_low never selected.
    def doc(id: Long, src: String, masked: Boolean) = {
      val good = ("wx" :: List.tabulate(50)(i => ("" + ('a' + i % 26).toChar) * 3))
        .mkString(" ")                     // 202 chars, passes every gate
      val text = if (masked) "a a a" else good
      (id, text, "en", src)
    }
    val rows = Seq(
      doc(1L, "s_hi", false), doc(2L, "s_hi", false),
      doc(3L, "s_mid", false), doc(4L, "s_mid", true),
      doc(5L, "s_low", true), doc(6L, "s_low", true))
    val docs = rows.toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars",
        when(col("text") === "a a a", 5L)
          .otherwise(lit(150L) + col("doc_id")))  // kept sizes 151,152,153
    val out = CurationOps.budgetMix(docs, budgetChars = 400L).collect()
      .map(r => r.getAs[String]("source") ->
        ((r.getAs[Int]("rnk"), r.getAs[Long]("kept_chars"),
          r.getAs[Long]("chars_taken"), r.getAs[Int]("is_partial")))).toMap
    // s_hi kept 151+152=303 rate 1.0 -> rank 1, whole; s_mid kept 153
    // rate 0.5 -> rank 2, takes 400-303=97 (partial); s_low rate 0 cut.
    assert(out === Map(
      "s_hi" -> ((1, 303L, 303L, 0)),
      "s_mid" -> ((2, 153L, 97L, 1))))
  }

  test("pipeline funnel: each stage drops exactly its designed docs") {
    import graft.ops.CurationOps
    val good = ("wx" :: List.tabulate(50)(i => ("" + ('a' + i % 26).toChar) * 3))
      .mkString(" ")   // 51 tokens, passes every quality gate
    val benchText = "held out benchmark probe sentence with unique tokens"
    val contaminated = good + " held out benchmark probe extra"
    // doc 17 is the holdout (17 % 17 == 0); corpus docs:
    //  18 good (survives), 19 dup of 18 (dedup drop), 20 masked short,
    //  21 contaminated (shares 4-gram 'held out benchmark probe')
    val docs = Seq(
      (17L, benchText), (18L, good), (19L, good), (20L, "a a a"),
      (21L, contaminated)
    ).toDF("doc_id", "text")
      .withColumn("lang", lit("en"))
      .withColumn("source", lit("s0"))
      .withColumn("n_chars", length(col("text")).cast("long"))
    val out = CurationOps.pipelineFunnel(docs).collect()
      .map(r => r.getAs[String]("name") ->
        ((r.getAs[Long]("n_docs"), r.getAs[Long]("n_tokens")))).toMap
    val gtok = 51L
    val ctok = 56L  // contaminated doc: 51 + 5 appended tokens
    assert(out("corpus") === ((4L, gtok * 2 + 3 + ctok)))
    assert(out("quality") === ((3L, gtok * 2 + ctok)))
    assert(out("deduped") === ((2L, gtok + ctok)))
    assert(out("decontaminated") === ((1L, gtok)))
    // 51 tokens, window 32 stride 24: chunks = (51-32+23) div 24 + 1 = 2
    assert(out("chunks") === ((2L, gtok)))
  }

  test("cdc chunks: histogram matches an independent md5 path; boundaries shift with content") {
    def md5hex(s: String): String = java.security.MessageDigest
      .getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    def cuts(toks: Vector[String]): Vector[Int] = {
      val n = toks.length
      if (n < 5) Vector(0, n)
      else 0 +: (2 to n - 3).filter(i =>
        md5hex(toks.slice(i - 1, i + 3).mkString(" ")).head == '0')
        .map(_ - 1).toVector :+ n
    }
    def hist(ts: Vector[String]): Map[Int, Long] = {
      val c = cuts(ts)
      c.sliding(2).map(p => math.min(p(1) - p(0), 64)).toVector
        .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    }
    val a = (0 until 200).map(i => s"w$i").toVector
    val b = "zzz" +: a
    // the content-defined property: every interior boundary of A
    // reappears in B shifted by exactly the insertion (fixed-stride
    // chunking would instead re-cut everything after the edit)
    val ia = cuts(a).drop(1).dropRight(1)
    val ib = cuts(b).drop(1).dropRight(1)
    assert(ia.nonEmpty && ia.map(_ + 1).toSet.subsetOf(ib.toSet),
      s"boundaries must shift with content: $ia vs $ib")
    val docs = Seq((1L, a.mkString(" ")), (2L, b.mkString(" ")))
      .toDF("doc_id", "text")
    val expect = (hist(a).toSeq ++ hist(b).toSeq)
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).sum }
    val got = graft.ops.CurationOps.cdcChunkHistogram(docs).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(got === expect, s"histogram: $got vs $expect")
  }

  test("unimax: tail languages epoch-capped, head absorbs the spill exactly") {
    // chars: a=10, b=20, c=1000; cap(2 epochs)=20/40/2000; budget=3*1030/2
    // =1545. Waterfill: a sat (20*3<=1545), b sat (40*2<=1525), c unsat
    // (2000>1485) -> alloc 1485 = 1.485 epochs. Sums land the budget
    // exactly (no floor remainder here: one unsaturated language).
    val docs = Seq(
      (1L, "a", 4L), (2L, "a", 6L),
      (3L, "b", 20L),
      (4L, "c", 500L), (5L, "c", 500L))
      .toDF("doc_id", "lang", "n_chars")
    val out = CurationOps.unimaxBudget(docs, epochCap = 2).collect()
      .map(r => r.getAs[String]("lang") ->
        ((r.getAs[Boolean]("saturated"), r.getAs[Long]("alloc_chars"),
          r.getAs[Long]("epochs_permille")))).toMap
    assert(out("a") === ((true, 20L, 2000L)))
    assert(out("b") === ((true, 40L, 2000L)))
    assert(out("c") === ((false, 1485L, 1485L)))
    assert(out.values.map(_._2).sum === 1545L, "budget landed exactly")
  }

  test("unimax: saturation needs the spill — a global fair share would miss it") {
    // caps (epochCap=1) 1,1,1,60,62; budget = 3*125/2 = 187. A global
    // B/n = 37 fair share calls the 60- and 62-char languages unsaturated;
    // the waterfill spills the three tiny languages' unused share onto
    // them (fair rises to 92) and saturates BOTH. Also the all-saturated
    // edge: the corpus is exhausted below budget, fair-branch hits m = 0.
    val docs = Seq(
      (1L, "t1", 1L), (2L, "t2", 1L), (3L, "t3", 1L),
      (4L, "mid", 60L), (5L, "big", 62L))
      .toDF("doc_id", "lang", "n_chars")
    val out = CurationOps.unimaxBudget(docs, epochCap = 1).collect()
    assert(out.forall(_.getAs[Boolean]("saturated")),
      s"all saturated via spill: ${out.toSeq}")
    assert(out.map(_.getAs[Long]("alloc_chars")).sum === 125L,
      "corpus exhausted at 1 epoch, below budget")
    assert(out.forall(_.getAs[Long]("epochs_permille") === 1000L))
  }

  test("unimax: waterfill invariants hold and survive repartition") {
    // Messier masses; assert the documented closed-form semantics: every
    // unsaturated language gets the SAME floored fair share, that share
    // stays below each unsaturated cap (else it should have saturated),
    // and the floor remainder is smaller than the unsaturated count.
    val docs = (1 to 40).map(i =>
      (i.toLong, s"l${i % 7}", (i * 37 % 211 + 5).toLong))
      .toDF("doc_id", "lang", "n_chars")
    for (d <- Seq(docs, docs.repartition(13))) {
      val rows = CurationOps.unimaxBudget(d, epochCap = 2).collect()
      val budget = rows.map(_.getAs[Long]("corpus_chars")).sum * 3 / 2
      val (sat, unsat) = rows.partition(_.getAs[Boolean]("saturated"))
      sat.foreach(r => assert(
        r.getAs[Long]("alloc_chars") === r.getAs[Long]("cap_chars")))
      val fairs = unsat.map(_.getAs[Long]("alloc_chars")).distinct
      assert(fairs.length <= 1, s"one shared fair share: ${fairs.toSeq}")
      unsat.foreach(r => assert(
        r.getAs[Long]("alloc_chars") < r.getAs[Long]("cap_chars"),
        s"unsaturated cap above fair: $r"))
      val total = rows.map(_.getAs[Long]("alloc_chars")).sum
      if (unsat.nonEmpty) {
        assert(total <= budget && budget - total < unsat.length,
          s"floor remainder bounded: $total vs $budget")
      } else assert(total <= budget)
    }
  }

  test("quality survivors: in-band member beats a lower-id out-of-band twin") {
    // 122 distinct tokens vs its first 118: Jaccard ~0.93, well above the
    // 8x8 banding threshold, so they cluster — and the LOWER-id member
    // is out of the [30, 120] band, so min-id would keep the wrong copy
    val toks = (1 to 122).map(i => s"tok$i")
    val long = toks.mkString(" ")             // 122 tokens, len_ok 0
    val short = toks.take(118).mkString(" ")  // 118 tokens, len_ok 1
    val docs = Seq(
      (10L, long), (20L, short),
      (30L, "an unrelated singleton document about nothing at all"))
      .toDF("doc_id", "text")
    val out = graft.ops.CurationOps.qualitySurvivors(docs).collect()
    assert(out.length === 1, s"one non-singleton cluster: ${out.toSeq}")
    val r = out.head
    assert(r.getLong(0) === 10L, "cluster id is still the member min")
    assert(r.getLong(1) === 20L, s"quality pick must beat min-id: $r")
    assert(r.getLong(2) === 2L && r.getLong(3) === 118L && r.getInt(4) === 1)
  }

  test("q348: the curated table holds exactly the gated, scrubbed survivors") {
    import graft.ops.{CurationOps, DedupOps}
    import org.apache.spark.sql.functions._
    import spark.implicits._
    def par(tag: String): String =
      (1 to 20).map(i => s"cm$tag$i").mkString(" ")
    // doc 1: two paragraphs, clean -> survives with both
    // doc 2: repeats doc 1's first paragraph -> survives SCRUBBED
    // doc 3: 2 tokens -> gated out entirely
    val docs = Seq(
      (1L, "en", s"${par("a")} ${par("b")}"),
      (2L, "en", s"${par("a")} ${par("c")}"),
      (3L, "en", "too short"))
      .toDF("doc_id", "lang", "text")
    val census = CurationOps.curatedMaterialize(spark, docs).collect()
    assert(census.length === 1 &&
      census.head.getLong(1) === 2L && census.head.getLong(2) === 60L,
      s"2 survivors with 60 scrubbed tokens expected: ${census.toSeq}")
    val tbl = spark.table("graft_curated").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap  // partition col lang is LAST on readback
    assert(tbl.keySet === Set(1L, 2L), s"gated doc leaked: ${tbl.keySet}")
    assert(tbl(1L) === s"${par("a")} ${par("b")}",
      "the clean doc must materialize unchanged")
    assert(tbl(2L) === par("c"),
      s"doc 2 must materialize with its duplicate paragraph scrubbed: ${tbl(2L)}")
    // idempotence: rerunning overwrites to the same census
    val again = CurationOps.curatedMaterialize(spark, docs).collect()
    assert(again.toSeq === census.toSeq, "materialization must be idempotent")
  }
}
