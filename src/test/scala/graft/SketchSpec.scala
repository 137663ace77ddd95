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
}
