package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.ops.LinkageOps

/** Hand-computed fixtures for the record-linkage tier (q261). The
  * sf-data oracle grades engine parity; these pin the SEMANTICS on one
  * customer per typo tier, small enough to verify the edit distances
  * and the blocking recall hole by hand.
  */
class LinkageSpec extends SparkSpec {
  import spark.implicits._

  private def cust(keys: Long*) =
    keys.toSeq.toDF("c_custkey")
      .withColumn("c_name",
        concat(lit("Customer#"), lpad(col("c_custkey").cast("string"), 9, "0")))

  test("dirtyRegistry plants the documented typo per mod-9 tier") {
    val reg = LinkageOps.dirtyRegistry(cust(0L, 1L, 2L, 3L, 4L, 6L, 7L))
      .orderBy("r_id").collect()
    // key 2 (mod 3 == 2) never enters the registry
    assert(reg.map(_.getLong(0)).toSeq ===
      Seq(9000000L, 9000001L, 9000003L, 9000004L, 9000006L, 9000007L))
    val byKey = reg.map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(byKey(9000000L) === "Customer#000000000") // exact
    assert(byKey(9000001L) === "Customer#070000001") // digit 2: 0 -> 7
    assert(byKey(9000003L) === "Customer#000000003") // exact
    assert(byKey(9000004L) === "Customer#077000004") // digits 2+3
    assert(byKey(9000006L) === "Customer#070000006") // digit 2
    assert(byKey(9000007L) === "Customer#00000000X") // block-breaking
  }

  test("recordLinkage resolves each tier at its edit distance and surfaces the recall hole") {
    val out = LinkageOps.recordLinkage(cust(0L, 1L, 2L, 3L, 4L, 6L, 7L))
      .collect().toSeq
    // tier 7's 'X' typo falls outside every suffix block -> dist -1,
    // exact tiers at 0, one-sub tiers at 1, the double-sub tier at 2;
    // blocks are singleton here so every resolved match is correct
    assert(out === Seq(
      Row(-1L, 1L, 0L),
      Row(0L, 2L, 2L),
      Row(1L, 2L, 2L),
      Row(2L, 1L, 1L)))
  }

  test("a same-suffix impostor loses to the true parent on distance") {
    // masters 3000457 (mod 9 = 1: one-sub typo tier) and 983000457
    // (mod 9 = 0: exact tier) share the suffix block "000457", so both
    // are candidates for both registry rows. 3000457's typo'd name
    // "Customer#073000457" is dist 1 from its parent but dist 2 from
    // the impostor -> the parent wins strictly on distance; the
    // impostor's own exact row resolves at dist 0.
    val out = LinkageOps.recordLinkage(cust(3000457L, 983000457L))
      .collect().toSeq
    assert(out === Seq(Row(0L, 1L, 1L), Row(1L, 1L, 1L)))
  }

  test("golden records apply validity, recency, completeness, and conflict rules") {
    // key 0: feed newer but corrupt -> validity gate keeps master
    // key 6: feed newer + valid -> recency takes feed (delta 6%7-3 = +3)
    // key 2: feed valid but NOT newer -> master; phone null (2 mod 8)
    // key 33: no feed at all -> master everywhere, no conflict
    val master = Seq(
      (0L, "Customer#000000000", 100.0, "BUILDING"),
      (2L, "Customer#000000002", 200.0, "MACHINERY"),
      (6L, "Customer#000000006", 600.0, "AUTOMOBILE"),
      (33L, "Customer#000000033", 330.0, "HOUSEHOLD"))
      .toDF("c_custkey", "c_name", "c_acctbal", "c_mktsegment")
    val out = LinkageOps.goldenRecords(master).collect().toSeq
    assert(out === Seq(
      Row(0L, "Customer#000000000", 100.0, "master", "P-0", false),
      Row(2L, "Customer#000000002", 200.0, "master", "missing", true),
      Row(6L, "Customer#000000006", 603.0, "feed", "P-6", true),
      Row(33L, "Customer#000000033", 330.0, "master", "missing", false)))
  }

  test("edit-distance prefilter: both guards land in the plan and fixpoint holds") {
    import graft.plans.EditDistancePrefilter
    val df = Seq(("abc", "abd"), ("a", "abcdef")).toDF("a", "b")
      .where(graft.functions.StringFunctions
        .damerauLevenshtein(col("a"), col("b")) <= 1)
    val once = EditDistancePrefilter(df.queryExecution.analyzed)
    val s = once.toString.toLowerCase
    assert(s.contains("abs") && s.contains("length"),
      s"expected the length guard in:\n$once")
    assert(s.contains("bagofcharsl1"),
      s"expected the bag-L1 guard in:\n$once")
    assert(EditDistancePrefilter(once).toString === once.toString,
      "re-applying the rule must be a no-op (optimizer fixpoint)")
    // plain levenshtein thresholds are guarded too
    val lev = Seq(("abc", "abd")).toDF("a", "b")
      .where(levenshtein(col("a"), col("b")) <= 1)
    val levOnce = EditDistancePrefilter(lev.queryExecution.analyzed)
      .toString.toLowerCase
    assert(levOnce.contains("abs") && levOnce.contains("bagofcharsl1"))
  }

  test("bag-of-chars L1: values, spill map, and edit-unit pairing") {
    import graft.functions.BagOfCharsL1
    import org.apache.spark.unsafe.types.UTF8String
    def bag(a: String, b: String, cp: Boolean): Int =
      BagOfCharsL1.compute(
        UTF8String.fromString(a), UTF8String.fromString(b), cp)
    assert(bag("abc", "abc", true) === 0)
    assert(bag("abc", "abd", true) === 2) // substitution: two counts move
    assert(bag("abc", "abcd", true) === 1) // insertion: one count moves
    assert(bag("ab", "ba", true) === 0) // transposition: bag-invariant
    // non-Latin-1 goes through the spill map, same answer
    assert(bag("añc", "añd", true) === 2)
    assert(bag("日本語", "日本話", false) === 2)
    // unit pairing off the BMP: U+1D11E is ONE code point, TWO UTF-16
    // units. levenshtein("𝄞","a") = 1 code-point substitution, and the
    // code-point bag is exactly 2 = 2k — while the UTF-16 bag is 3 > 2k,
    // which is why pairing levenshtein with UTF-16 counting would
    // falsely kill a true match (the 4k-mixing note in the scaladoc).
    val clef = new String(Character.toChars(0x1D11E))
    assert(bag(clef, "a", true) === 2)
    assert(bag(clef, "a", false) === 3)
  }

  test("bag guard is sound on every planted typo tier (bag <= 2*dist)") {
    // one (master, dirty) pair per mod-9 tier at its advertised edit
    // distance: exact (0), one-sub (1), double-sub (2), tail-sub (1)
    val pairs = LinkageOps.dirtyRegistry(
        cust(0L, 1L, 3L, 4L, 6L, 7L))
      .withColumn("c_custkey", col("r_id") - 9000000L)
      .join(cust(0L, 1L, 3L, 4L, 6L, 7L), Seq("c_custkey"))
    val checked = pairs.select(
        levenshtein(col("c_name"), col("r_name")).as("lev"),
        graft.functions.StringFunctions
          .damerauLevenshtein(col("c_name"), col("r_name")).as("dl"),
        graft.functions.StringFunctions
          .bagOfCharsL1(col("c_name"), col("r_name"), codePoints = true)
          .as("bag_cp"),
        graft.functions.StringFunctions
          .bagOfCharsL1(col("c_name"), col("r_name"), codePoints = false)
          .as("bag_u16"))
      .collect()
    assert(checked.length === 6)
    checked.foreach { r =>
      assert(r.getInt(2) <= 2 * r.getInt(0),
        s"code-point bag must bound 2*levenshtein: $r")
      assert(r.getInt(3) <= 2 * r.getInt(1),
        s"UTF-16 bag must bound 2*damerau: $r")
    }
  }

  test("prefilter rule adds no false negatives to the q261 linkage (planted tiers)") {
    import graft.plans.EditDistancePrefilter
    val keys = Seq(0L, 1L, 2L, 3L, 4L, 6L, 7L, 9L, 10L, 12L, 13L, 15L, 16L)
    val base = LinkageOps.recordLinkage(cust(keys: _*)).collect().toSeq
    val prev = spark.experimental.extraOptimizations
    try {
      if (!prev.contains(EditDistancePrefilter))
        spark.experimental.extraOptimizations = prev :+ EditDistancePrefilter
      val guarded = LinkageOps.recordLinkage(cust(keys: _*)).collect().toSeq
      assert(guarded === base,
        "the strengthened plan must keep every planted match")
      // and the off-BMP true match survives the code-point-unit guard —
      // through a join, so the filter sits over attributes (not
      // constant-foldable literals) and the guard's generated code runs
      val clef = new String(Character.toChars(0x1D11E))
      val left = Seq((1, clef), (2, "xy")).toDF("id", "a")
      val right = Seq((1, "a"), (2, "zw")).toDF("id", "b")
      val bmp = left.join(right, "id")
        .where(levenshtein(col("a"), col("b")) <= 1)
        .select(col("a"), col("b")).collect()
      assert(bmp.toSeq === Seq(Row(clef, "a")),
        "guard must keep the 1-code-point-edit pair and kill the distant one")
    } finally spark.experimental.extraOptimizations = prev
  }

  test("fuzzy threshold census: swap matches at dl<=1, double-sub excluded") {
    // tiers by custkey % 3: 4 unchanged (tier 0... keys 0,3 -> tier 0),
    // keys 1,4 -> tier 1 (swap, dl 1), keys 2,5 -> tier 2 (non-adjacent
    // double substitution, dl 2 -> NO row for tier 2)
    val master = (0L to 5L)
      .map(k => (k, f"Customer#${k}%09d")).toDF("c_custkey", "c_name")
    val out = LinkageOps.fuzzyThresholdCensus(spark, master).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(out === Map(0 -> 2L, 1 -> 2L), s"census: $out")
    // and the INSTALLED rule fired on the graded plan itself — over the
    // parquet-backed table (a LocalRelation gets constant-folded before
    // the plan is inspectable)
    val plan = LinkageOps.fuzzyThresholdCensus(spark,
        graft.util.Tables.t(spark, sf, "customer"))
      .queryExecution.optimizedPlan.toString.toLowerCase
    assert(plan.contains("abs") && plan.contains("length"),
      s"expected the installed prefilter to strengthen:\n$plan")
    assert(plan.contains("bagofcharsl1"),
      s"expected the installed prefilter's bag-L1 guard in:\n$plan")
  }
}
