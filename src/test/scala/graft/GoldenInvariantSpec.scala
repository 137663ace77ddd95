package graft

import org.scalatest.funsuite.AnyFunSuite

/** ADVICE r14: queries graded against literal goldens snapshotted from
  * the engine's own output would grade GREEN even if a systematic bug
  * was present at snapshot time. The takedown/recall goldens, however,
  * carry INVARIANT columns whose correct values are knowable without
  * re-running anything — residue must be zero, rebuild identity must
  * hold, recall must be monotone in probes and above the family bar,
  * a swept serve must never emit a deleted id. This spec asserts those
  * invariants against the CHECKED-IN golden files themselves, so a
  * regeneration that froze a violating snapshot fails the suite even
  * though the driver's hash-compare would have accepted it.
  *
  * No SparkSession needed: the goldens are parsed straight off the
  * classpath (same resources `literalOracle` serves the driver).
  */
class GoldenInvariantSpec extends AnyFunSuite {

  /** Parse a generated golden (OracleGen's fixed shape:
    * `SELECT ... FROM (VALUES (...), ... ) t(c1, c2, ...)`) into
    * (column names, rows of raw tokens). Tokens are split on commas
    * outside single-quoted strings.
    */
  private def load(name: String): (Seq[String], Seq[Seq[String]]) = {
    val in = getClass.getResourceAsStream(s"/oracle/$name.sql")
    assert(in != null, s"golden /oracle/$name.sql is missing")
    val sql =
      try new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8)
      finally in.close()
    val valuesStart = sql.indexOf("VALUES")
    val tailStart = sql.lastIndexOf(") t(")
    assert(valuesStart >= 0 && tailStart > valuesStart, s"unexpected golden shape in $name")
    val cols = sql.substring(tailStart + 4, sql.lastIndexOf(")"))
      .split(",").map(_.trim).toSeq
    val body = sql.substring(valuesStart + "VALUES".length, tailStart)
    // split rows on "),(" boundaries outside quotes, then tokens on
    // commas outside quotes
    def splitOutside(s: String, sep: Char): Seq[String] = {
      val out = Seq.newBuilder[String]
      val cur = new StringBuilder
      var inQ = false
      s.foreach {
        case '\'' => inQ = !inQ; cur += '\''
        case c if c == sep && !inQ => out += cur.result(); cur.clear()
        case c => cur += c
      }
      out += cur.result()
      out.result()
    }
    val rows = splitOutside(body.trim, '\n')
      .map(_.trim.stripSuffix(",").stripPrefix("(").stripSuffix(")"))
      .filter(_.nonEmpty)
      .map(r => splitOutside(r, ',').map(_.trim))
    assert(rows.nonEmpty && rows.forall(_.length == cols.length),
      s"parse drift in $name: cols=$cols rows=${rows.take(2)}")
    (cols, rows)
  }

  private def longs(cols: Seq[String], rows: Seq[Seq[String]],
      c: String): Seq[Long] = {
    val i = cols.indexOf(c)
    assert(i >= 0, s"column $c not in $cols")
    rows.map(_(i).toLong)
  }

  test("q350: zero residue, rebuild identity, non-vacuous deletions") {
    val (cols, rows) = load("q350_takedown")
    assert(longs(cols, rows, "n_residue").forall(_ == 0L))
    assert(longs(cols, rows, "matches_rebuild").forall(_ == 1L))
    assert(longs(cols, rows, "n_deleted").forall(_ > 0L),
      "a takedown golden with nothing deleted proves nothing")
  }

  test("q358: zero residue, rebuild identity, non-vacuous expansion") {
    val (cols, rows) = load("q358_deep_takedown")
    assert(longs(cols, rows, "n_residue").forall(_ == 0L))
    assert(longs(cols, rows, "matches_rebuild").forall(_ == 1L))
    assert(longs(cols, rows, "n_expanded").zip(longs(cols, rows, "n_requested"))
      .forall { case (e, r) => e > r },
      "the content-level expansion must catch MORE than the requested set")
  }

  test("q357: composed lifecycle census matches the rebuild per language") {
    val (cols, rows) = load("q357_curated_lifecycle")
    assert(longs(cols, rows, "matches_rebuild").forall(_ == 1L))
  }

  test("q354: recall monotone non-decreasing in probes, within bounds") {
    val (cols, rows) = load("q354_probes_sweep")
    val byProbes = longs(cols, rows, "probes")
      .zip(longs(cols, rows, "recall_permille")).sortBy(_._1)
    assert(byProbes.sliding(2).forall {
      case Seq((_, a), (_, b)) => b >= a
      case _ => true
    }, s"graded recall curve must be monotone: $byProbes")
    assert(byProbes.forall { case (_, r) => r >= 0 && r <= 1000 })
    assert(longs(cols, rows, "n_hits").zip(longs(cols, rows, "n_possible"))
      .forall { case (h, p) => h <= p })
  }

  test("q359: post-takedown recall clears the family bar") {
    val (cols, rows) = load("q359_takedown_recall")
    val rec = longs(cols, rows, "recall_permille")
    assert(rec.forall(r => r >= 900 && r <= 1000),
      s"a swept index below the 0.9 family bar must not freeze: $rec")
  }

  test("q356: the swept streamed serve emits no deleted id") {
    val (cols, rows) = load("q356_ann_takedown_replay")
    assert(longs(cols, rows, "vec_id").forall(_ % 11 != 0),
      "a vec_id % 11 row in the golden IS takedown residue")
  }

  test("q372: composed cluster lifecycle matches the rebuild") {
    val (cols, rows) = load("q372_cluster_lifecycle")
    assert(longs(cols, rows, "matches_rebuild").forall(_ == 1L))
    assert(longs(cols, rows, "n_docs").sum > 0L)
  }

  test("q373: the swept retrieval stack serves no deleted doc and matches the rebuild") {
    val (cols, rows) = load("q373_stack_takedown")
    assert(longs(cols, rows, "n_residue").forall(_ == 0L))
    assert(longs(cols, rows, "matches_rebuild").forall(_ == 1L))
    assert(longs(cols, rows, "doc_id").forall(_ % 13 != 0),
      "a doc_id % 13 row in the golden IS takedown residue")
  }

  test("q365: zero residue, rebuild identity, the content-takedown path fired") {
    val (cols, rows) = load("q365_media_takedown")
    assert(longs(cols, rows, "n_residue").forall(_ == 0L))
    assert(longs(cols, rows, "matches_rebuild").forall(_ == 1L))
    assert(longs(cols, rows, "n_deleted").forall(_ > 0L),
      "every artifact must lose rows — the DMCA leg exists so the " +
        "fingerprint tier is non-vacuous")
  }

  test("q363: split clears the flag, conserves rows, recovers recall") {
    val (cols, rows) = load("q363_fat_cell_split")
    val m = rows.map(r => r(cols.indexOf("metric")) ->
      ((r(cols.indexOf("unsplit")).toLong, r(cols.indexOf("split")).toLong)))
      .toMap
    assert(m("'fat_cells'")._1 >= 1L && m("'fat_cells'")._2 == 0L)
    assert(m("'n_code_rows'")._1 == m("'n_code_rows'")._2)
    assert(m("'adc_candidates'")._2 < m("'adc_candidates'")._1)
    assert(m("'recall@5'")._2 >= m("'recall@5'")._1)
  }

  test("q377: streamed census-split clears the flag, conserves rows, recovers top-k recall") {
    val (cols, rows) = load("q377_ann_census_split_replay")
    val m = rows.map(r => r(cols.indexOf("metric")) ->
      ((r(cols.indexOf("unsplit")).toLong, r(cols.indexOf("split")).toLong)))
      .toMap
    assert(m("'fat_cells'")._1 >= 1L && m("'fat_cells'")._2 == 0L,
      "the streamed appends must CREATE the fat cell and the census " +
        "trigger must clear it")
    assert(m("'n_code_rows'")._1 == m("'n_code_rows'")._2,
      "mid-stream splits move list boundaries, never data")
    // the serve contract is top-k: the streamed repair's sub-fits only
    // observe the pile's landed PREFIX, so intermediate-k recall may
    // differ from the batch split's; recall@topK must not regress
    assert(m("'recall@5'")._2 >= m("'recall@5'")._1,
      "split-on-ingest must not regress the graded top-k recall")
  }
}
