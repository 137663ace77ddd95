package graft

import org.apache.spark.sql.functions._

import graft.ops.{DedupOps, EventOps, RelationalOps, TextOps}
import graft.util.Tables.t

/** Targeted semantics for the round-8 additions: correlated-subquery
  * decorrelation (q126/q127), the market-share join pyramid (q128), and
  * the corpus ops on self-contained fixtures where the vocabulary /
  * containment / calendar structure is fully controlled (the graded
  * corpus runs are pinned by the DuckDB oracles; these pin the semantics
  * on planted edge cases the corpus may not contain at every sf).
  */
class RelationalCorpusSpec extends SparkSpec {
  import spark.implicits._

  private def planOf(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString

  test("q126 correlated EXISTS decorrelates to a semi join") {
    val plan = planOf("q126_exists_subquery")
    assert(plan.contains("LeftSemi"),
      s"EXISTS should plan as a left semi join, not per-row subqueries:\n$plan")
  }

  test("q127 correlated scalar subquery decorrelates to an aggregate+join") {
    val plan = planOf("q127_scalar_subquery")
    assert(!plan.contains("ScalarSubquery"),
      s"the per-part AVG must be decorrelated, not re-run per outer row:\n$plan")
    assert(plan.contains("Join"), s"expected the decorrelated join in:\n$plan")
  }

  test("q136 Q21 shape decorrelates to semi + anti joins") {
    val plan = planOf("q136_sole_late_supplier")
    assert(plan.contains("LeftSemi"), s"EXISTS arm must be a semi join:\n$plan")
    assert(plan.contains("LeftAnti"), s"NOT EXISTS arm must be an anti join:\n$plan")
  }

  test("q136 semantics: sole late shipper on a multi-supplier order") {
    // order 1 (status F): suppliers 10 (late) and 11 (on time) -> 10 counts.
    // order 2 (status F): both suppliers late -> nobody counts.
    // order 3 (status F): single-supplier, late -> no co-supplier, excluded.
    // order 4 (status O): late but not finalized, excluded.
    import java.sql.Timestamp
    def t(s: String) = Timestamp.valueOf(s + " 00:00:00")
    Seq(
      (1L, 10L, t("2024-01-01"), t("2024-06-01")),
      (1L, 11L, t("2024-01-01"), t("2024-01-15")),
      (2L, 10L, t("2024-01-01"), t("2024-06-01")),
      (2L, 11L, t("2024-01-01"), t("2024-06-02")),
      (3L, 12L, t("2024-01-01"), t("2024-06-01")),
      (4L, 13L, t("2024-01-01"), t("2024-06-01")))
      .toDF("l_orderkey", "l_suppkey", "odate", "l_shipdate")
      .createOrReplaceTempView("lineitem_fixture")
    spark.sql("SELECT l_orderkey, l_suppkey, l_shipdate FROM lineitem_fixture")
      .createOrReplaceTempView("lineitem")
    Seq((1L, "F", t("2024-01-01")), (2L, "F", t("2024-01-01")),
      (3L, "F", t("2024-01-01")), (4L, "O", t("2024-01-01")))
      .toDF("o_orderkey", "o_orderstatus", "o_orderdate")
      .createOrReplaceTempView("orders")
    Seq((10L, "S10"), (11L, "S11"), (12L, "S12"), (13L, "S13"))
      .toDF("s_suppkey", "s_name").createOrReplaceTempView("supplier")
    val out = spark.sql(RelationalOps.soleLateSupplierSql).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out == Map("S10" -> 1L), s"only the sole late shipper counts: $out")
  }

  test("q138 recursive calendar fills gap months with zero revenue") {
    import java.sql.Timestamp
    Seq((1L, Timestamp.valueOf("2024-01-15 00:00:00"), 10.0),
      (2L, Timestamp.valueOf("2024-04-02 00:00:00"), 20.5))
      .toDF("o_orderkey", "o_orderdate", "o_totalprice")
      .createOrReplaceTempView("orders")
    val out = spark.sql(RelationalOps.recursiveCalendarSql).collect()
      .map(r => (r.getInt(1), r.getInt(2)) -> r.getDouble(3)).toMap
    assert(out.size == 4, s"Jan..Apr inclusive: $out")
    assert(out((2024, 1)) == 10.0 && out((2024, 4)) == 20.5)
    assert(out((2024, 2)) == 0.0 && out((2024, 3)) == 0.0,
      s"silent months must appear with zero revenue: $out")
  }

  test("partition checksum is order-independent and mutation-sensitive") {
    val orders = t(spark, sf, "orders")
    val base = RelationalOps.partitionChecksum(orders).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val shuffled = RelationalOps.partitionChecksum(orders.repartition(13))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(base == shuffled, "checksum must not depend on partitioning/order")
    // flip one row's status: exactly that row's month must change
    val mutated = RelationalOps.partitionChecksum(
      orders.withColumn("o_orderstatus",
        when(col("o_orderkey") === orders.select(min(col("o_orderkey")))
          .collect().head.getLong(0), lit("MUTATED"))
          .otherwise(col("o_orderstatus")))).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val changed = base.keySet.filter(m => base(m) != mutated(m))
    assert(changed.size == 1,
      s"one mutated row must flip exactly its own month: $changed")
    assert(base(changed.head)._1 == mutated(changed.head)._1,
      "row count unchanged; only the checksum moves")
    // length-preserving edit past each field's first character — the
    // exact class a (length, first-char)-only fingerprint cannot see;
    // the full character fold must catch it
    val sneaky = RelationalOps.partitionChecksum(
      orders.withColumn("o_orderpriority",
        when(col("o_orderkey") === orders.select(min(col("o_orderkey")))
          .collect().head.getLong(0),
          // I/O/U: at least one occurs in every TPC-H priority value
          // (URGENT, HIGH, MEDIUM, NOT SPECIFIED, LOW), never position 1
          translate(col("o_orderpriority"), "IOU", "JPV"))
          .otherwise(col("o_orderpriority")))).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val sneakyChanged = base.keySet.filter(m => base(m) != sneaky(m))
    assert(sneakyChanged.size == 1,
      s"length-preserving mid-string edit must still flip its month: $sneakyChanged")
  }

  test("q127 threshold semantics: only below-half-average lines count") {
    // part 1: quantities 10, 20 -> avg 15, half 7.5 -> nothing qualifies.
    // part 2: quantities 2, 40 -> avg 21, half 10.5 -> the 2 qualifies.
    val li = Seq((1L, 10.0, 100.0), (1L, 20.0, 100.0),
      (2L, 2.0, 55.0), (2L, 40.0, 100.0))
      .toDF("l_partkey", "l_quantity", "l_extendedprice")
    li.createOrReplaceTempView("lineitem")
    Seq((1L, "Brand#12"), (2L, "Brand#12")).toDF("p_partkey", "p_brand")
      .createOrReplaceTempView("part")
    val out = spark.sql(RelationalOps.smallQtyRevenueSql).collect()
    assert(out.length == 1)
    assert(out.head.getLong(1) == 1L, "exactly one small-quantity line")
    assert(out.head.getDouble(0) == 55.0)
  }

  test("q128 broadcasts every dimension side of the join pyramid") {
    val plan = planOf("q128_market_share")
    val broadcasts = "BroadcastHashJoin".r.findAllIn(plan).size
    assert(broadcasts >= 3,
      s"part/region-nation-chain/supplier-nation should broadcast, got $broadcasts:\n$plan")
  }

  test("q128 share is numerator/denominator of the same decimal sums") {
    val rows = SparkEntry.queries("q128_market_share")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nat, tot, share) = (r.getDouble(1), r.getDouble(2), r.getDouble(3))
      assert(nat >= 0 && nat <= tot, s"nation_vol within total: $r")
      assert(share >= 0.0 && share <= 1.0, s"share in [0,1]: $r")
      // rounded vols are 2dp views of the exact sums; share must agree
      assert(math.abs(share - nat / tot) < 1e-2, s"share consistent: $r")
    }
  }

  test("oov rate on a controlled vocabulary fixture") {
    // vocab size 2 -> {aa, bb} (counts 3 and 2); cc and zz are OOV.
    val docs = Seq(
      (1L, Some("aa bb aa")), (2L, Some("aa bb cc")),
      (3L, Some("zz zz")), (4L, None: Option[String]))
      .toDF("doc_id", "text")
    val out = TextOps.oovRate(docs, vocabSize = 2).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    assert(out(1L) == ((3L, 0L, 0.0)), s"all in vocab: ${out(1L)}")
    assert(out(2L) == ((3L, 1L, 1.0 / 3.0)), s"one OOV token: ${out(2L)}")
    assert(out(3L) == ((2L, 2L, 1.0)), s"all OOV: ${out(3L)}")
    assert(!out.contains(4L), "null text excluded")
  }

  test("q129 planted gibberish docs surface with the expected rates") {
    val out = SparkEntry.queries("q129_oov_rate")(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(out(2000000000061L) == 1.0, "all-gibberish doc rates 1.0")
    assert(out(2000000000064L) == 1.0, "single gibberish token rates 1.0")
    assert(out(2000000000062L) >= 0.5, "half-gibberish doc rates >= 0.5")
  }

  test("containment finds the quote asymmetrically, jaccard-style pairs both ways") {
    val host = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11 w12 w13 w14 w15 w16"
    val docs = Seq(
      (1L, Some(host)),
      (2L, Some("w5 w6 w7 w8 w9")), // verbatim span of doc 1
      (3L, Some("x1 x2 x3 x4 x5")),
      (4L, Some("x1 x2 x3 x4 x5"))) // exact dup of doc 3
      .toDF("doc_id", "text")
    val rows = DedupOps.containmentPairs(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(rows.contains((2L, 1L)), s"quote contained in host: $rows")
    assert(!rows.contains((1L, 2L)), s"host not contained in quote: $rows")
    assert(rows.contains((3L, 4L)) && rows.contains((4L, 3L)),
      s"exact dups contain each other both ways: $rows")
  }

  test("q130 planted quote pair surfaces on the graded corpus") {
    val rows = SparkEntry.queries("q130_containment_pairs")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(rows.contains((2000000000072L, 2000000000071L)),
      s"planted quote pair missing from $rows")
    assert(!rows.contains((2000000000071L, 2000000000072L)),
      "host must not be reported as contained in the quote")
  }

  test("term drift is exact cross-multiplied integer arithmetic") {
    // side A (even ids): 'x' 3 of 4 tokens; side B (odd ids): 'x' 0 of 2.
    // n_a=4, n_b=2 -> drift(x) = |3*2 - 0*4| = 6; drift(y) = |1*2-2*4| = 6.
    val docs = Seq(
      (0L, Some("x x y")), (2L, Some("x")), (1L, Some("y y")))
      .toDF("doc_id", "text")
    val out = graft.ops.CorpusStatsOps.termDrift(docs).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out("x") == ((3L, 0L, 6L)), s"x drift: ${out("x")}")
    assert(out("y") == ((1L, 2L, 6L)), s"y drift: ${out("y")}")
  }

  test("inverted index truncates postings at the cap, df counts all docs") {
    val docs = (0L until 15L).map(i => (i, Some("common t" + (i % 3))))
      .toDF("doc_id", "text")
    val out = graft.ops.CorpusStatsOps.invertedIndex(docs, maxPostings = 10)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getString(2)))).toMap
    assert(out("common")._1 == 15L, "df counts every doc")
    assert(out("common")._2 == "0,1,2,3,4,5,6,7,8,9", "postings capped at 10 sorted ids")
    assert(out("t0") == ((5L, "0,3,6,9,12")), s"t0: ${out("t0")}")
  }

  test("q245 BM25 planted relevance: tf dominates at equal length, length normalizes at equal tf") {
    val docs = Seq(
      (1L, Some("dup dup dup")),                      // tf 3, dl 3
      (2L, Some("dup f f f f f f f f")),              // tf 1, dl 9
      (3L, Some("f f f")),                            // no match
      (4L, Some("dup dup other")),                    // tf 2, dl 3
      (5L, Some("dup x x x x x x x x x x x")))        // tf 1, dl 12
      .toDF("doc_id", "text")
    val out = graft.ops.CorpusStatsOps.bm25TopK(docs, Seq("q" -> "dup"), k = 10)
      .collect()
    val ranked = out.sortBy(_.getInt(1)).map(_.getLong(2)).toSeq
    // tf 3 > tf 2 at dl 3; then tf 1 with dl 9 beats tf 1 with dl 12
    // (the b-weighted length normalization)
    assert(ranked == Seq(1L, 4L, 2L, 5L), s"got $ranked")
    assert(out.forall(_.getLong(3) == 1L), "one hit term per doc")
    assert(!ranked.contains(3L), "non-matching docs never surface")
  }

  test("q251 incremental index merge equals a full rebuild (min-k merge lemma)") {
    // base (ids not % 10) and delta (ids % 10 = 0) both contribute to
    // 'common'; the merged posting list must be the first 10 of the
    // UNION even though each side was truncated to its own first 10 —
    // ids 0,10,20 come from the delta side, 1..9 from base, so the
    // merged head interleaves both sides
    val docs = (0L until 30L).map(i => (i, Some("common t" + (i % 3))))
      .toDF("doc_id", "text")
    val merged = graft.ops.CorpusStatsOps.indexDeltaMerge(docs).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getString(2)))).toMap
    val full = graft.ops.CorpusStatsOps.invertedIndex(docs).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getString(2)))).toMap
    assert(merged == full, s"merged=$merged full=$full")
    assert(merged("common") == ((30L, "0,1,2,3,4,5,6,7,8,9")))
    // and on the real corpus: delta-merge == rebuild, frame for frame
    val corpus = spark.read.parquet(s"$sf/documents.parquet")
    val m2 = graft.ops.CorpusStatsOps.indexDeltaMerge(corpus)
    val f2 = graft.ops.CorpusStatsOps.invertedIndex(corpus)
    assert(m2.exceptAll(f2).isEmpty && f2.exceptAll(m2).isEmpty,
      "incremental maintenance must be indistinguishable from a rebuild")
  }

  test("ngram diversity separates template spam from diverse text") {
    val docs = Seq(
      // 6 tokens -> 4 trigram occurrences, all identical -> diversity 1/4
      (1L, Some("spam spam spam spam spam spam"), "template"),
      // 6 distinct tokens -> 4 distinct trigrams -> diversity 1.0
      (2L, Some("one two three four five six"), "diverse"))
      .toDF("doc_id", "text", "source")
    val out = graft.ops.CorpusStatsOps.ngramDiversity(docs).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    assert(out("template") == ((4L, 1L, 0.25)), s"template: ${out("template")}")
    assert(out("diverse") == ((4L, 4L, 1.0)), s"diverse: ${out("diverse")}")
  }

  test("q135 planted mirrored docs produce the expected overlap matrix") {
    val rows = SparkEntry.queries("q135_source_overlap")(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(rows(("src0", "src3")) == 2L, s"two shared texts: $rows")
    assert(rows(("src1", "src2")) == 1L && rows(("src1", "src4")) == 1L &&
      rows(("src2", "src4")) == 1L, s"three-way syndication pairs: $rows")
  }

  test("rolling distinct users on a hand-computed calendar") {
    val ev = Seq(
      (100L, "2024-01-01 10:00:00"), (100L, "2024-01-01 11:00:00"),
      (200L, "2024-01-03 09:00:00"), (100L, "2024-01-09 08:00:00"))
      .toDF("user_id", "ts_s")
      .select(col("user_id"), col("ts_s").cast("timestamp").as("ts"))
    val out = EventOps.rollingDistinctUsers(ev).collect()
      .map(r => r.getDate(0).toString -> r.getLong(1)).toMap
    // day 1: {100}; day 3..7: {100, 200}; day 8: {200} (100's day-1 visit
    // aged out); day 9: {100, 200}
    assert(out("2024-01-01") == 1L)
    assert(out("2024-01-03") == 2L)
    assert(out("2024-01-07") == 2L)
    assert(out("2024-01-08") == 1L)
    assert(out("2024-01-09") == 2L)
    assert(!out.contains("2024-01-10"), "no days past the last observed day")
  }

  test("phrase match: planted corpus, index intersection finds exact adjacencies") {
    import graft.ops.CorpusStatsOps
    val docs = Seq(
      (1L, "red fox red fox red"),   // "red fox" x2, "fox red" x2
      (2L, "red fox"),               // "red fox" x1
      (3L, "fox red"),               // "fox red" x1
      (4L, "red red red"),           // "red red" x2 (overlapping adjacency)
      (5L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    val out = CorpusStatsOps.phraseMatch(docs, topPhrases = 3).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // counts: "red fox" 3, "fox red" 3, "red red" 2 -> top 3 by (n desc, phrase)
    assert(out.keySet === Set("red fox", "fox red", "red red"))
    assert(out("red fox") === ((2L, 3L, 1L)))
    assert(out("fox red") === ((2L, 3L, 1L)))
    assert(out("red red") === ((1L, 2L, 4L)))
  }

  test("proximity match: slop window counts both orders, adjacency excluded beyond slop") {
    import graft.ops.CorpusStatsOps
    // doc 1: "a b" adjacent (dist 1) and the reversed "b ... a" at dist 3;
    // doc 2: "a x x x b" -> dist 4, OUTSIDE slop 3;
    // doc 3: "b a" reversed adjacency -> counts under proximity
    val docs = Seq(
      (1L, "a b c a"),   // pairs (a@0,b@1) d1; (b@1,a@3) d2
      (2L, "a x x x b"), // d4: excluded
      (3L, "b a b a")    // (b0,a1) (a1,b2) (b2,a3) d1 each, (b0,a3) d3
    ).toDF("doc_id", "text")
    // bigram census: "a b" 2, "b a" 2, "x x" 2 -> tie broken by phrase
    // asc, "a b" wins the topPhrases=1 slot
    val out = CorpusStatsOps.proximityMatch(docs, topPhrases = 1, slop = 3)
      .collect().map(r =>
        r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // proximity pairs (a, b) within slop 3, any order:
    // doc1: (a0,b1) d1, (a3,b1) d2 -> 2; doc3: (a1,b0) d1, (a1,b2) d1,
    // (a3,b2) d1, (a3,b0) d3 -> 4; doc2's (a0,b4) is d4, excluded.
    assert(out === Map("a b" -> ((2L, 6L))), s"got $out")
  }

  test("snapshot diff: hand-built versions classify and count per column") {
    import graft.ops.RelationalOps
    val old = Seq(
      (1L, 10.0, "O", "1-URGENT"),
      (2L, 20.0, "F", "2-HIGH"),
      (3L, 30.0, "O", "3-MEDIUM"),
      (4L, 40.0, "F", "4-LOW")
    ).toDF("o_orderkey", "o_totalprice", "o_orderstatus", "o_orderpriority")
    val neu = Seq(
      (1L, 10.0, "O", "1-URGENT"),    // unchanged
      (2L, 21.0, "P", "2-HIGH"),      // changed: price + status
      (3L, 30.0, "O", "5-LOW"),       // changed: priority
      (5L, 50.0, "O", "1-URGENT")     // added; key 4 removed
    ).toDF("o_orderkey", "o_totalprice", "o_orderstatus", "o_orderpriority")
    val out = RelationalOps.snapshotDiff(old, neu).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(out === Map(
      "added" -> ((1L, 0L, 0L, 0L)),
      "removed" -> ((1L, 0L, 0L, 0L)),
      "changed" -> ((2L, 1L, 1L, 1L)),
      "unchanged" -> ((1L, 0L, 0L, 0L))))
  }

  test("trend slopes: a planted exact line recovers its slope bit-exactly") {
    import graft.ops.TimeSeriesOps
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    // nation A: revenue 100.00, 200.00, 300.00 cents over three months
    // -> slope exactly 10000 cents/month; nation B flat -> slope 0
    val orders = Seq(
      (1L, 1L, "O", 100.0, ts("1995-01-15 00:00:00"), "1-URGENT"),
      (2L, 1L, "O", 200.0, ts("1995-02-15 00:00:00"), "1-URGENT"),
      (3L, 1L, "O", 300.0, ts("1995-03-15 00:00:00"), "1-URGENT"),
      (4L, 2L, "O", 50.0, ts("1995-01-10 00:00:00"), "1-URGENT"),
      (5L, 2L, "O", 50.0, ts("1995-02-10 00:00:00"), "1-URGENT")
    ).toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
      "o_orderdate", "o_orderpriority")
    val customer = Seq((1L, "ca", 0, 0.0, "BUILDING"),
      (2L, "cb", 1, 0.0, "BUILDING"))
      .toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
    val nation = Seq((0, "ALPHA"), (1, "BETA")).toDF("n_nationkey", "n_name")
    val out = TimeSeriesOps.trendSlopes(orders, customer, nation).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2), r.getLong(3))))
      .toMap
    assert(out("ALPHA") === ((3L, 10000.0, 60000L)))
    assert(out("BETA") === ((2L, 0.0, 10000L)))
  }

  test("source similarity: identical sources hit cosine 1, disjoint sources absent") {
    import graft.ops.CorpusStatsOps
    val docs = Seq(
      (1L, "a b c", "s1"), (2L, "a b c", "s2"),   // identical vectors
      (3L, "x y z", "s3"),                        // disjoint vocabulary
      (4L, "a a b", "s4")                         // shares terms with s1/s2
    ).toDF("doc_id", "text", "source")
    val out = CorpusStatsOps.sourceSimilarity(docs).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getDouble(3)))).toMap
    // sqrt(3)*sqrt(3) = 3 - 1ulp, so the ratio is 1.0 + 1ulp — the
    // oracle computes the identical tree, which is what the hash grades
    assert(out(("s1", "s2"))._1 === 3L)
    assert(math.abs(out(("s1", "s2"))._2 - 1.0) < 1e-15)
    // s1 = (1,1,1), s4 = (2,1,0 over a,b,c): dot = 3, norms sqrt(3)*sqrt(5)
    val (dot, cos) = out(("s1", "s4"))
    assert(dot === 3L)
    assert(math.abs(cos - 3.0 / (math.sqrt(3) * math.sqrt(5))) < 1e-15)
    // disjoint s3 never pairs (no shared term -> no candidate row)
    assert(!out.keySet.exists(k => k._1 == "s3" || k._2 == "s3"))
  }

  test("rrf fusion: disagreeing rankers merge, missing rank coalesces to zero") {
    import graft.ops.CorpusStatsOps
    // doc 1: short with one hit -> BM25's length normalization ranks it
    // first; doc 2: long with three hits -> linear TF-IDF ranks IT
    // first. shortlist=1 forces each ranker to contribute exactly one
    // doc, so the fusion must full-outer them with a null missing rank
    // and equal rrf mass 1/61 on both -> tie broken by doc_id.
    val filler = "x y z " * 5
    val docs = Seq(
      (1L, "dup pad"),
      (2L, ("dup " * 3) + ("w " * 46).trim),
      (3L, filler.trim), (4L, filler.trim))
      .toDF("doc_id", "text")
    val q = Seq("q1" -> "dup")
    val a = CorpusStatsOps.bm25TopK(docs, q, 1).collect()
    assert(a.head.getLong(2) === 1L, s"precondition: BM25 top is doc 1: ${a.toSeq}")
    val out = CorpusStatsOps.rrfFusion(docs, q, shortlist = 1, k = 2)
      .collect()
    assert(out.length === 2, s"fusion rows: ${out.toSeq}")
    val r1 = out(0); val r2 = out(1)
    assert(r1.getLong(2) === 1L && r1.getInt(3) === 1 && r1.isNullAt(4))
    assert(r2.getLong(2) === 2L && r2.isNullAt(3) && r2.getInt(4) === 1)
    assert(r1.getDouble(5) === 1.0 / 61 && r2.getDouble(5) === 1.0 / 61)
  }

  test("retrieval ndcg: perfect single hit scores 1.0, zero-relevant query scores 0") {
    import graft.ops.CorpusStatsOps
    val docs = Seq(
      (1L, "alpha beta alpha beta"),       // the only all-terms doc for qa
      (2L, "alpha w w w w w w w w w w"),   // partial match, ranked but irrelevant
      (3L, "beta w w w w w w w w w w"),
      (4L, "gamma w w"), (5L, "delta w w") // qb's terms never co-occur
    ).toDF("doc_id", "text")
    val q = Seq("qa" -> "alpha", "qa" -> "beta", "qb" -> "gamma", "qb" -> "delta")
    val out = CorpusStatsOps.retrievalNdcg(docs, q).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(out("qa") === ((1L, 1L, 10000L, 1.0)), s"qa: ${out("qa")}")
    assert(out("qb") === ((0L, 0L, 0L, 0.0)), s"qb: ${out("qb")}")
  }

  test("split leakage: a duplicate straddling the split leaks all its grams") {
    import graft.ops.CorpusStatsOps
    // recompute the real split function driver-side to pick ids landing
    // on each side (the spec must not hardcode md5 outcomes)
    def splitOf(id: Long): String = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s"graft-split:$id".getBytes("UTF-8"))
      val h = d.take(1).map("%02x".format(_)).mkString
      if (h < "cd") "train" else if (h < "e7") "val" else "test"
    }
    val trainId = (1L to 500L).find(splitOf(_) == "train").get
    val testIds = (1L to 500L).filter(splitOf(_) == "test").take(2)
    val dup = "a b c d e f g h i j"           // 10 tokens -> 3 8-grams
    val fresh = "k l m n o p q r s t"
    val docs = Seq(
      (trainId, dup), (testIds(0), dup), (testIds(1), fresh))
      .toDF("doc_id", "text")
    val out = CorpusStatsOps.splitNgramLeakage(docs).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(out("test") === ((2L, 6L, 3L, 5000L)), s"leak: $out")
    assert(!out.contains("val"), "no val docs -> no val row")
  }

  test("simpson diversity: pure repetition hits 10000 bp, uniform spread floors") {
    val docs = Seq(
      (1L, "tpl", "x x x x"),          // ssq 16, n 4 -> conc 10000
      (2L, "mix", "a b c d"),          // ssq 4, n 4 -> conc 2500
      (3L, "skew", "a a a b"),         // ssq 10, n 4 -> conc 6250
      (4L, "skew", "a a"),             // pooled per SOURCE: a 5, b 1
      (5L, "mix", null))               // null text rows are ignored
      .toDF("doc_id", "source", "text")
    val out = graft.ops.CorpusStatsOps.simpsonDiversity(docs).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(out("tpl") === ((4L, 1L, 10000L, 0L)))
    assert(out("mix") === ((4L, 4L, 2500L, 7500L)))
    // skew pools both docs: n=6, ssq=25+1=26 -> 26*10000/36 = 7222
    assert(out("skew") === ((6L, 2L, 7222L, 2778L)))
  }

  test("source TVD: hand-computed distance, one-sided mass counted, bounds hit") {
    import graft.ops.CorpusStatsOps
    // A = {x:2, y:1}/3, B = {x:1, z:1}/2:
    // TVD = (|2/3-1/2| + |1/3-0| + |0-1/2|)/2 = (1/6 + 1/3 + 1/2)/2
    //     = 1/2 -> 500 permille. An inner join on tok would see only x
    // and report 500*1 // 6 = 83 — the y/z one-sided mass is the test.
    val docs = Seq(
      (1L, "A", "x x y"), (2L, "B", "x z"),
      (3L, "C", "x x y"),               // identical mix to A -> TVD 0
      (4L, "D", "q q r"))               // disjoint from A -> TVD 1000
      .toDF("doc_id", "source", "text")
    val out = CorpusStatsOps.sourceTvd(docs).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(4)).toMap
    assert(out(("A", "B")) === 500L, s"hand-computed TVD: $out")
    assert(out(("A", "C")) === 0L, "identical distributions must be 0")
    assert(out(("A", "D")) === 1000L, "disjoint vocabularies must be 1000")
    // symmetry of the metric is encoded by the src_a < src_b canonical
    // ordering: every unordered pair appears exactly once
    assert(out.size === 6)
    // and the token masses ride along for the dashboard
    val masses = CorpusStatsOps.sourceTvd(docs).collect()
      .map(r => (r.getString(0), r.getLong(2))).toMap
    assert(masses("A") === 3L)
  }

  test("source ablation: the dragging source is exposed by its LOO delta") {
    import graft.ops.CorpusStatsOps
    // source G: 2 docs at full quality (len in band + ' the ' present,
    // qp = 1000); source B: 2 docs failing both gates (qp = 0).
    // Overall mean = 2000/4 = 500. LOO(G) = 0/2 = 0 (delta −500: drop
    // G and quality collapses); LOO(B) = 2000/2 = 1000 (delta +500:
    // drop B and quality jumps) — the surgery signal, hand-computed.
    val good = ("w " * 20 + "the " + "w " * 20).trim // 41 tokens, has ' the '
    val bad = "short text only"                       // 3 tokens, no gate
    val docs = Seq(
      (1L, "G", good), (2L, "G", good),
      (3L, "B", bad), (4L, "B", bad))
      .toDF("doc_id", "source", "text")
    val out = CorpusStatsOps.sourceAblation(docs).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(out("G") === ((2L, 1000L, 0L, -500L)), s"good source: $out")
    assert(out("B") === ((2L, 0L, 1000L, 500L)), s"bad source: $out")
    // single-source edge: LOO undefined, NULL not a crash
    val solo = CorpusStatsOps.sourceAblation(
      Seq((1L, "X", good)).toDF("doc_id", "source", "text")).collect()
    assert(solo.length === 1 && solo.head.isNullAt(3) && solo.head.isNullAt(4))
  }

  test("q337 zipf slope: a planted exact power law fits slope -1000") {
    // counts 840/r for r = 1..8 are exact integers, so in log-log space
    // the 8 points sit on a line of slope exactly -1; the 6-bit-mantissa
    // quantization (max 1/64 bit per point over a 3-bit x-range) can
    // move the fitted slope by ~10 permille at most
    val text = (1 to 8).flatMap(r => Seq.fill(840 / r)(s"w$r")).mkString(" ")
    val docs = Seq((1L, text)).toDF("doc_id", "text")
    val out = graft.ops.CorpusStatsOps.zipfSlope(docs).collect().head
    assert(out.getLong(0) === 8L && out.getLong(1) === 840L &&
      out.getLong(2) === 105L, s"planted vocabulary drifted: $out")
    val slope = out.getLong(3)
    assert(slope >= -1015L && slope <= -985L,
      s"planted 1/r law must fit slope -1000 +- quantization, got $slope")
    // flat corpus control: equal counts -> slope exactly 0
    val flat = Seq((1L, (1 to 6).map(i => s"f$i f$i f$i").mkString(" ")))
      .toDF("doc_id", "text")
    val s0 = graft.ops.CorpusStatsOps.zipfSlope(flat).collect().head.getLong(3)
    assert(s0 === 0L, s"equal counts must fit slope 0 exactly, got $s0")
  }
}
