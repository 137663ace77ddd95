package graft

import graft.ops.SelectionOps

/** Fixture-backed semantics pins for the data-selection tier (q295
  * DSIR importance weights, q296 C4 line rules): planted corpora where
  * the selection signal is unambiguous, so the graded oracles aren't
  * the only line of defense.
  */
class SelectionSpec extends SparkSpec {
  import spark.implicits._

  test("q295 DSIR weights select by CONTENT, not by label: a French doc " +
    "written with target-domain vocabulary beats the mean") {
    val docs = Seq(
      (1L, "en", "alpha beta alpha beta"),
      (2L, "en", "alpha beta beta alpha"),
      (3L, "fr", "gamma delta gamma delta"),
      (4L, "de", "gamma delta delta gamma"),
      // the DSIR point: selection is a function of the document's
      // feature distribution — this fr-labelled doc uses the target
      // (en) vocabulary and must land above the global mean
      (5L, "fr", "alpha beta alpha beta"),
      (6L, "de", null.asInstanceOf[String])
    ).toDF("doc_id", "lang", "text")
    val out = SelectionOps.dsirWeights(docs).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(out.keySet == Set("en", "fr", "de"))
    assert(out("en").getLong(1) == 2 && out("en").getLong(3) == 2,
      "both en docs above the global mean")
    assert(out("fr").getLong(1) == 2 && out("fr").getLong(3) == 1,
      "exactly the English-vocabulary fr doc above the mean")
    assert(out("de").getLong(1) == 1 && out("de").getLong(3) == 0,
      "the off-target de doc below the mean")
    // target-vocabulary docs all share one score, off-target another,
    // and target > off-target (Laplace ratio > 1 vs < 1)
    val en = out("en").getLong(2) / 2
    val de = out("de").getLong(2)
    assert(out("fr").getLong(2) == en + de,
      "fr total = one target-vocab doc + one off-target doc")
    assert(en > de, s"target-vocab score $en must exceed off-target $de")
  }

  test("q296 line rules: every C4 rule fires on its planted witness") {
    val out = SelectionOps.lineRules(SelectionOps.c4Docs(spark)).collect()
    assert(out.length == 1)
    val r = out.head
    val cols = Seq("n_docs", "n_lines", "n_no_punct", "n_short_line",
      "n_js", "n_docs_killed", "n_kept_lines", "n_docs_kept",
      "n_docs_ge3_kept")
    val got = cols.zipWithIndex.map { case (c, i) => c -> r.getLong(i) }.toMap
    // 4 non-null pages, 11 lines; 'short one' (2 words) + the long
    // unpunctuated line + the brace line have no terminal punct; the
    // javascript line is terminal but dropped; brace + lorem kill two
    // pages; 3 + 1 lines survive on the two kept pages; only the first
    // page clears the >= 3 sentence gate.
    assert(got == Map(
      "n_docs" -> 4L, "n_lines" -> 11L, "n_no_punct" -> 3L,
      "n_short_line" -> 1L, "n_js" -> 1L, "n_docs_killed" -> 2L,
      "n_kept_lines" -> 4L, "n_docs_kept" -> 2L, "n_docs_ge3_kept" -> 1L),
      s"census mismatch: $got")
  }
}
