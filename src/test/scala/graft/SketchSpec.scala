package graft

import org.apache.spark.sql.functions._

import graft.ops.SketchOps

/** CMS guarantees pinned structurally: never undercounts (every vocab
  * term, not just heavy hitters), degenerate width folds everything
  * into one cell (est == corpus size), and the sketch relation merges
  * across splits by plain (row, cell) addition.
  */
class SketchSpec extends SparkSpec {
  import spark.implicits._

  private def terms(df: org.apache.spark.sql.DataFrame) =
    df.where(col("text").isNotNull)
      .select(explode(split(col("text"), " ")).as("term"))
      .where(col("term") =!= "")

  test("CMS never undercounts any vocabulary term, even under forced collisions") {
    val t = terms(spark.read.parquet(s"$sf/documents.parquet"))
    // width 8 << vocabulary: every cell folds several terms, so the
    // never-undercount property is tested under real collision
    // pressure, not on a sketch wide enough to be collision-free
    val sketch = SketchOps.cmsBuild(t, depth = 4, width = 8)
    val allTerms = t.groupBy("term").agg(count(lit(1)).as("true_cnt"))
    val est = SketchOps.cmsEstimate(sketch, allTerms, depth = 4, width = 8)
    assert(est.where(col("est") < col("true_cnt")).isEmpty,
      "a Count-Min estimate undercut a true count")
    assert(est.where(col("est") > col("true_cnt")).count() > 0,
      "no collision observed — the test would be vacuous")
    assert(est.count() > 20)
  }

  test("width 1 folds the whole corpus into each estimate") {
    val t = Seq("a a b c").toDF("text").transform(terms)
    val est = SketchOps.cmsEstimate(
      SketchOps.cmsBuild(t, depth = 2, width = 1),
      t.distinct(), depth = 2, width = 1).collect()
    assert(est.length === 3 && est.forall(_.getLong(1) === 4L))
  }

  test("sketches merge by (row, cell) addition") {
    val a = Seq("x x y").toDF("text").transform(terms)
    val b = Seq("y z").toDF("text").transform(terms)
    val whole = SketchOps.cmsBuild(a.unionByName(b), depth = 4, width = 64)
    val merged = SketchOps.cmsBuild(a, 4, 64)
      .unionByName(SketchOps.cmsBuild(b, 4, 64))
      .groupBy("row", "cell").agg(sum(col("cnt")).as("cnt"))
    assert(whole.exceptAll(merged).isEmpty && merged.exceptAll(whole).isEmpty)
  }

  test("sketch overlap: exact count is right and the estimate stays in envelope") {
    import spark.implicits._
    // viewers 1..200, buyers 151..350 -> exact overlap 50
    val ev = ((1L to 200L).map(u => (u, "view")) ++
      (151L to 350L).map(u => (u, "purchase")))
      .toDF("user_id", "event_type")
    val row = SketchOps.sketchOverlap(ev).collect().head
    assert(row.getLong(0) === 50L)
    assert(row.getInt(1) === 1)
  }

  test("sketch overlap of disjoint audiences is zero and in envelope") {
    import spark.implicits._
    val ev = ((1L to 100L).map(u => (u, "view")) ++
      (1001L to 1100L).map(u => (u, "purchase")))
      .toDF("user_id", "event_type")
    val row = SketchOps.sketchOverlap(ev).collect().head
    assert(row.getLong(0) === 0L)
    assert(row.getInt(1) === 1)
  }

  test("rolling sketch WAU: calendar gap resets the RANGE window") {
    import java.sql.Timestamp
    // days 1, 2 hold users {1..4}; day 10 holds only {9} — a ROWS frame
    // would still union days 1-2 into day 10's window, a RANGE frame on
    // the epoch-day index must not
    val ev = (
      (1 to 4).map(u => (u.toLong, Timestamp.valueOf("1995-01-01 10:00:00"))) ++
      (3 to 4).map(u => (u.toLong, Timestamp.valueOf("1995-01-02 10:00:00"))) ++
      Seq((9L, Timestamp.valueOf("1995-01-10 10:00:00"))))
      .toDF("user_id", "ts")
    val out = SketchOps.rollingSketchWau(ev).collect()
      .map(r => r.getDate(0).toString -> ((r.getLong(1), r.getInt(2)))).toMap
    assert(out("1995-01-01") === ((4L, 1)))
    assert(out("1995-01-02") === ((4L, 1)))
    assert(out("1995-01-10") === ((1L, 1)), s"gap day must stand alone: $out")
  }

  // Zipf-ish fixture for the Misra-Gries tier: term "hot_i" appears
  // 600/i times (i = 1..6), plus 900 unique singletons (the lossy tail:
  // vocabulary 906 >> any test capacity). N = 600+300+200+150+120+100
  // + 900 = 2370.
  private def mgDocs = {
    val hot = (1 to 6).flatMap(i =>
      (1 to 600 / i).map(j => (i * 10000L + j, s"hot_$i")))
    val tail = (1 to 900).map(j => (900000L + j, s"uniq_$j"))
    (hot ++ tail).toDF("doc_id", "text")
  }

  test("misra-gries: exact heavy hitters, invariant under partitioning") {
    // capacity 16, threshold N/17 ~ 139: hot_1..hot_4 qualify (600, 300,
    // 200, 150), hot_5 (120) and hot_6 (100) must be cut by the exact
    // recount even when the lossy sketch happens to track them
    val stream = mgDocs.select(col("text").as("term"))
    def run(parts: Int) = {
      val s = stream.repartition(parts)
      val mg = graft.functions.MisraGries.misraGries(16)
      val summary = s.agg(mg(col("term")).as("x"))
        .select(col("x.candidates").as("c"), col("x.n_stream").as("n"))
        .collect().head
      val cands = summary.getAs[scala.collection.Seq[String]]("c")
      val n = summary.getAs[Long]("n")
      assert(n === 2370L)
      assert(cands.length <= 16, s"capacity respected: ${cands.length}")
      // the structural guarantee: true-frequency > N/17 => tracked
      for (i <- 1 to 4) assert(cands.contains(s"hot_$i"),
        s"hot_$i lost from candidates at $parts partitions: $cands")
      val exact = s.groupBy("term").agg(count(lit(1)).as("cnt"))
      val out = exact.join(
          broadcast(cands.toSeq.toDF("term")), Seq("term"))
        .where(col("cnt") * 17 > lit(n))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      out
    }
    val expected = Map("hot_1" -> 600L, "hot_2" -> 300L,
      "hot_3" -> 200L, "hot_4" -> 150L)
    for (p <- Seq(1, 7, 32)) assert(run(p) === expected,
      s"merge-order independence broken at $p partitions")
  }

  test("misra-gries survives an adversarial unique-token flood") {
    // capacity 4 with 900 singletons hammering the decrement path: the
    // single heavy (600 > 1470/5 = 294) must still be tracked
    val stream = mgDocs.where(
      col("text") === "hot_1" || col("text").startsWith("uniq_"))
      .select(col("text").as("term")).repartition(5)
    val mg = graft.functions.MisraGries.misraGries(4)
    val row = stream.agg(mg(col("term")).as("x"))
      .select(col("x.candidates"), col("x.n_stream")).collect().head
    assert(row.getAs[Long](1) === 1500L)
    assert(row.getAs[scala.collection.Seq[String]](0).contains("hot_1"),
      s"heavy item lost to the decrement flood: ${row.getAs[scala.collection.Seq[String]](0)}")
  }

  test("q312 end-to-end: banner + corpus heavies surface, id tail never") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val out = SketchOps.heavyHitters(docs, k = 64).collect()
    val terms = out.map(_.getString(0)).toSet
    assert(Set("cookie", "policy", "accepted").subsetOf(terms),
      s"planted boilerplate banner must be heavy: $terms")
    assert(!terms.exists(_.startsWith("docid_")),
      "a unique tail token leaked into the heavy set")
    val n = out.head.getAs[Long]("n_stream")
    out.foreach(r => assert(r.getAs[Long]("cnt") * 65 > n))
    // cross-check against the brute-force path
    val stream = docs.where(col("text").isNotNull)
      .select(explode(concat(
        split(col("text"), " "),
        array(concat(lit("docid_"), col("doc_id").cast("string"))),
        typedLit(Seq("cookie", "policy", "accepted")))).as("term"))
      .where(col("term") =!= "")
    val brute = stream.groupBy("term").agg(count(lit(1)).as("cnt"))
      .where(col("cnt") * 65 > lit(stream.count()))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out.map(r => r.getString(0) -> r.getLong(1)).toMap === brute)
  }
}
