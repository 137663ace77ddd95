package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.ops.{EventOps, ShapeOps}

/** Fixture-backed semantic pins for the product-analytics and exact-stats
  * operators (q94/q95/q97/q98/q100): planted edge cases the synthetic
  * events table may not contain, so the graded oracles are not the only
  * line of defense.
  */
class AnalyticsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("welch t-stat matches an independently coded reference formula") {
    // drives the EXACT graded body (ShapeOps.welchTTest) on a fixture and
    // checks it against the statistic computed straight from the raw
    // doubles in plain Scala — a different code path, so agreement is
    // not circular
    val va = Seq(10.00, 12.00, 11.00, 13.00)
    val vb = Seq(9.00, 9.50, 10.50)
    val rows = va.zipWithIndex.map { case (v, i) => (2L * i, v) } ++
      vb.zipWithIndex.map { case (v, i) => (2L * i + 1, v) }
    val out = ShapeOps.welchTTest(rows.toDF("user_id", "value")).head()
    assert(out.getLong(0) == va.size && out.getLong(1) == vb.size)
    def meanVar(xs: Seq[Double]): (Double, Double) = {
      val c = xs.map(_ * 100)
      val mean = c.sum / c.size
      (mean, c.map(x => (x - mean) * (x - mean)).sum / (c.size - 1))
    }
    val (ma, vara) = meanVar(va); val (mb, varb) = meanVar(vb)
    val ref = (ma - mb) / math.sqrt(vara / va.size + varb / vb.size)
    assert(math.abs(out.getDouble(4) - ref) < 1e-9,
      s"welch t: ${out.getDouble(4)} vs reference $ref")
    assert(math.abs(out.getDouble(2) - ma) < 1e-9 &&
      math.abs(out.getDouble(3) - mb) < 1e-9, "cohort means in cents")
  }

  test("funnel: a purchase before any click never counts (ordering enforced)") {
    val ev = Seq(
      // user 1: proper view -> click -> purchase
      (1L, 10L, "view", ts("2024-01-01 10:00:00")),
      (2L, 10L, "click", ts("2024-01-01 10:05:00")),
      (3L, 10L, "purchase", ts("2024-01-01 10:10:00")),
      // user 2: purchase BEFORE its click -> counts at click, not purchase
      (4L, 20L, "view", ts("2024-01-01 09:00:00")),
      (5L, 20L, "purchase", ts("2024-01-01 09:30:00")),
      (6L, 20L, "click", ts("2024-01-01 10:00:00")),
      // user 3: click with NO prior view -> never enters the funnel
      (7L, 30L, "click", ts("2024-01-01 08:00:00")),
      (8L, 30L, "purchase", ts("2024-01-01 08:30:00")),
      // user 4: view only
      (9L, 40L, "view", ts("2024-01-01 07:00:00"))
    ).toDF("event_id", "user_id", "event_type", "ts")
    val r = EventOps.funnel(ev).collect()(0)
    assert(r.getAs[Long]("users_total") == 4)
    assert(r.getAs[Long]("users_view") == 3)     // users 1, 2, 4
    assert(r.getAs[Long]("users_click") == 2)    // users 1, 2 (3 has no view)
    assert(r.getAs[Long]("users_purchase") == 1) // only user 1 is ordered
  }

  test("retention: cohort anchored to first event's week, weeks_since exact") {
    val ev = Seq(
      // user 1: first event Tue week0, active again week0 and week2
      (1L, 1L, "view", ts("2024-01-02 10:00:00")),
      (2L, 1L, "view", ts("2024-01-05 10:00:00")),
      (3L, 1L, "view", ts("2024-01-16 10:00:00")),
      // user 2: single event in week1
      (4L, 2L, "view", ts("2024-01-10 10:00:00"))
    ).toDF("event_id", "user_id", "event_type", "ts")
    val out = EventOps.retention(ev).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
    // weeks are Monday-based: 2024-01-01 and 2024-01-08 are Mondays
    assert(out.toSeq == Seq(
      ("2024-01-01", 0, 1L), ("2024-01-01", 2, 1L), ("2024-01-08", 0, 1L)))
  }

  test("q97 exact-moment corr matches native corr on the corpus within 1e-9") {
    val got = SparkEntry.queries("q97_corr_exact")(spark, sf).collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    val native = spark.read.parquet(s"$sf/lineitem.parquet")
      .groupBy("l_returnflag")
      .agg(corr(col("l_quantity"), col("l_extendedprice")).as("c"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got.keySet == native.keySet)
    got.foreach { case (k, v) =>
      assert(math.abs(v - native(k)) < 1e-9, s"$k: exact $v vs native ${native(k)}")
    }
  }

  test("CDC compaction: latest change wins, delete drops the key") {
    val ev = Seq(
      // user 1: two updates -> latest (value 2.0) survives
      (1L, 1L, "view", 1.0, ts("2024-01-01 10:00:00")),
      (2L, 1L, "click", 2.0, ts("2024-01-01 11:00:00")),
      // user 2: update then delete -> key dropped
      (3L, 2L, "view", 3.0, ts("2024-01-01 10:00:00")),
      (4L, 2L, "error", 0.0, ts("2024-01-01 12:00:00")),
      // user 3: delete then a LATER re-insert -> key survives with new value
      (5L, 3L, "error", 0.0, ts("2024-01-01 10:00:00")),
      (6L, 3L, "signup", 9.0, ts("2024-01-01 13:00:00")),
      // user 4: same-ts tie broken by event_id (8 beats 7)
      (7L, 4L, "view", 1.0, ts("2024-01-01 10:00:00")),
      (8L, 4L, "click", 5.0, ts("2024-01-01 10:00:00"))
    ).toDF("event_id", "user_id", "event_type", "value", "ts")
    // the EXACT graded body (ShapeOps.cdcCompact), not a re-implementation:
    // an edit to q98's tie-break or delete filter must break this fixture
    val out = graft.ops.ShapeOps.cdcCompact(ev)
      .select(col("user_id"), col("last_type"), col("last_value"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    assert(out.sortBy(_._1).toSeq == Seq(
      (1L, "click", 2.0), (3L, "signup", 9.0), (4L, "click", 5.0)))
  }

  test("bitemporal as-of: late arrivals revise the shipped state") {
    // anchor day 0 fixes V = day 10, TX = day 11; arrival = ts +
    // (event_id mod 5) days
    val ev = Seq(
      // u2: on-time view at day 0 (also the min-ts anchor) -> unrevised
      (20L, 2L, "view", 1.0, ts("2024-01-01 00:00:00")),
      // u1: on-time click day 2; signup day 9 arrives day 12 (> TX) ->
      // shipped click, now signup -> revised
      (10L, 1L, "click", 1.0, ts("2024-01-03 00:00:00")),
      (13L, 1L, "signup", 2.0, ts("2024-01-10 00:00:00")),
      // u3: ONLY a late purchase (day 8, arrives day 12) -> absent from
      // the shipped report entirely, present now -> revised
      (24L, 3L, "purchase", 3.0, ts("2024-01-09 00:00:00")),
      // u4: tombstoned in both views -> no row at all
      (31L, 4L, "click", 1.0, ts("2024-01-02 00:00:00")),
      (30L, 4L, "error", 0.0, ts("2024-01-06 00:00:00"))
    ).toDF("event_id", "user_id", "event_type", "value", "ts")
    val out = graft.ops.ShapeOps.bitemporalAsof(ev).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(3),
        r.getBoolean(5)))
    assert(out.toSeq == Seq(
      (1L, "click", "signup", true),
      (2L, "view", "view", false),
      (3L, null, "purchase", true)))
  }

  test("SCD2: consecutive identical states collapse, versions chain, current row open") {
    val ev = Seq(
      // user 1: view -> view (collapses) -> click: two versions
      (1L, 1L, "view", 0.0, ts("2024-01-01 10:00:00")),
      (2L, 1L, "view", 0.0, ts("2024-01-01 11:00:00")),
      (3L, 1L, "click", 0.0, ts("2024-01-01 12:00:00")),
      // user 2: single event -> one open-ended current version
      (4L, 2L, "signup", 0.0, ts("2024-01-01 09:00:00")),
      // user 3: same-ts tie broken by event_id (5 before 6), then the
      // A->B->A flip-flop must produce THREE versions, not collapse
      (5L, 3L, "a", 0.0, ts("2024-01-01 10:00:00")),
      (6L, 3L, "b", 0.0, ts("2024-01-01 10:00:00")),
      (7L, 3L, "a", 0.0, ts("2024-01-01 11:00:00"))
    ).toDF("event_id", "user_id", "event_type", "value", "ts")
    // the EXACT graded body (ShapeOps.scd2Dim), not a re-implementation
    val out = ShapeOps.scd2Dim(ev).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2),
        Option(r.getString(4)), r.getInt(5)))
    assert(out.toSeq == Seq(
      (1L, 1, "view", Some("2024-01-01 12:00:00"), 0),
      (1L, 2, "click", None, 1),
      (2L, 1, "signup", None, 1),
      (3L, 1, "a", Some("2024-01-01 10:00:00"), 0),
      (3L, 2, "b", Some("2024-01-01 11:00:00"), 0),
      (3L, 3, "a", None, 1)))
    // valid_from/valid_to chain: each version's valid_to equals the next
    // version's valid_from within the key — no gaps, no overlaps
    val byUser = ShapeOps.scd2Dim(ev).collect()
      .map(r => (r.getLong(0), r.getString(3), Option(r.getString(4))))
      .groupBy(_._1)
    byUser.values.foreach { vs =>
      vs.sliding(2).foreach {
        case Array((_, _, Some(to)), (_, from, _)) => assert(to == from)
        case _ => ()
      }
    }
  }

  test("densify: full grid, zeros where no orders, sums preserved") {
    val out = SparkEntry.queries("q100_densify")(spark, sf)
    val rows = out.collect()
    val days = rows.map(_.getDate(0).toString).distinct
    val statuses = rows.map(_.getString(1)).distinct
    // complete cross product
    assert(rows.length == days.length * statuses.length)
    // calendar is gapless
    val ds = days.sorted
    assert(java.time.temporal.ChronoUnit.DAYS.between(
      java.time.LocalDate.parse(ds.head), java.time.LocalDate.parse(ds.last))
      == ds.length - 1)
    // densification adds cells, never counts
    val total = rows.map(_.getLong(2)).sum
    assert(total == spark.read.parquet(s"$sf/orders.parquet").count())
    assert(rows.exists(_.getLong(2) == 0L), "expected at least one zero-filled cell")
  }

  test("SCD2 lookup: each purchase hits exactly the version active at its ts") {
    // user 1: view(t0) -> purchase(t1, inside v1) -> click(t2, opens v2)
    //         -> purchase(t3, inside v2's open interval)
    // user 2: purchase IS the first event (opens v1, must match v1)
    // boundary: user 3's purchase shares its EXACT ts with a state change
    //           (the purchase itself opens v2) -> must land in v2, not v1
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L, "view", 1.0),
      (2L, ts("2024-01-01 10:05:00"), 1L, "purchase", 1.0),
      (3L, ts("2024-01-01 10:10:00"), 1L, "click", 1.0),
      (4L, ts("2024-01-01 10:15:00"), 1L, "purchase", 1.0),
      (5L, ts("2024-01-02 09:00:00"), 2L, "purchase", 1.0),
      (6L, ts("2024-01-03 08:00:00"), 3L, "view", 1.0),
      (7L, ts("2024-01-03 08:30:00"), 3L, "purchase", 1.0)
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
    val out = graft.ops.ShapeOps.scd2Lookup(ev).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getInt(2), r.getString(3))))
      .toMap
    // every purchase matched exactly once
    assert(out.keySet == Set(2L, 4L, 5L, 7L), s"matched: ${out.keySet}")
    assert(out(2L) == ((1L, 2, "purchase")),
      s"purchase at its own change ts must open its version: ${out(2L)}")
    assert(out(4L) == ((1L, 4, "purchase")), s"${out(4L)}")
    assert(out(5L) == ((2L, 1, "purchase")),
      s"first-event purchase must match version 1: ${out(5L)}")
    assert(out(7L) == ((3L, 2, "purchase")), s"${out(7L)}")
  }

  test("session paths: strict 30-min gap, 8-type truncation, tie order") {
    val base = ts("2024-01-01 10:00:00").getTime
    def at(ms: Long) = new Timestamp(base + ms)
    val ev =
      // user 1, session 1: exactly 30:00 gap does NOT split (strict >)
      Seq((1L, at(0L), 1L, "view"), (2L, at(1800000L), 1L, "click"),
        // 30:00.001 gap DOES split -> session 2
        (3L, at(3600001L), 1L, "purchase")) ++
        // user 2: 10 events in one session -> path truncated to first 8
        (0 until 10).map(i => (10L + i, at(i * 1000L), 2L, s"e$i"))
    val out = graft.ops.EventOps.sessionPaths(
      ev.toDF("event_id", "ts", "user_id", "event_type"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out == Map(
      "view>click" -> 1L,
      "purchase" -> 1L,
      "e0>e1>e2>e3>e4>e5>e6>e7" -> 1L), s"paths: $out")
  }

  test("session pattern census: prioritized classes, first match wins") {
    def at(ms: Long) = new java.sql.Timestamp(ms)
    val hour = 3600000L
    def sess(start: Long, types: String*) =
      types.zipWithIndex.map { case (t, i) =>
        (start * 100 + i, at(start * hour + i * 1000L), 1L, t)
      }
    val ev = (
      sess(0, "view", "click", "purchase") ++ // vcp  -> clean_convert
      sess(2, "view", "error", "purchase") ++ // vep  -> error_then_convert
      sess(4, "view", "click") ++             // vc   -> browse_only
      sess(6, "error", "view") ++             // ev   -> errored_no_convert
      // vpe: the clean-prefix rule matches "vp" FIRST — a post-purchase
      // error must not demote the session (priority semantics)
      sess(8, "view", "purchase", "error")
    ).toDF("event_id", "ts", "user_id", "event_type")
    val out = graft.ops.EventOps.sessionPatternCensus(ev).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out == Map(
      "clean_convert" -> ((2L, 6L)),
      "error_then_convert" -> ((1L, 3L)),
      "browse_only" -> ((1L, 2L)),
      "errored_no_convert" -> ((1L, 2L))), s"census: $out")
  }

  test("lateness histogram: arrival-lag inversions counted, shares exact") {
    // arrival = ts + (event_id % 5) days. id=11 (lag 1d) has event time
    // Jan 3 12:00 but arrives Jan 4 12:00, AFTER id=20 (lag 0) advanced
    // the user's event-time high-water mark to Jan 4 00:00 -> 12h late.
    // Both lag-0 events and the other user's singleton are in order.
    val ev = Seq(
      (1L, 5L, ts("1995-01-01 12:00:00")),
      (1L, 11L, ts("1995-01-03 12:00:00")),
      (1L, 20L, ts("1995-01-04 00:00:00")),
      (2L, 30L, ts("1995-01-02 00:00:00")))
      .toDF("user_id", "event_id", "ts")
    val out = EventOps.latenessHistogram(ev).collect()
      .map(r => r.getString(1) -> ((r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    assert(out === Map(
      "in_order" -> ((3L, 7500L, 0L)),
      "le_1d" -> ((1L, 2500L, 43200000L))), s"histogram: $out")
  }

  test("MV maintenance: late-delta merge equals full rebuild on every key") {
    // keys deliberately straddle the arrival split: orderkeys 7 and 17
    // are late (mod-10 rule), and both land on (day 1, 'A') / (day 2,
    // 'R') keys that ALSO hold base rows — the merge must add mass into
    // existing MV state, not just append new keys
    val rows = Seq(
      (1L, ts("1995-01-01 00:00:00"), "A", 2.0, 100.10),
      (2L, ts("1995-01-01 00:00:00"), "A", 3.0, 200.20),
      (7L, ts("1995-01-01 00:00:00"), "A", 5.0, 50.05), // late, shared key
      (3L, ts("1995-01-02 00:00:00"), "R", 1.0, 10.01),
      (17L, ts("1995-01-02 00:00:00"), "R", 4.0, 40.04), // late, shared key
      (27L, ts("1995-01-03 00:00:00"), "N", 6.0, 60.06)) // late, NEW key
      .toDF("l_orderkey", "l_shipdate", "l_returnflag",
        "l_quantity", "l_extendedprice")
    val out = ShapeOps.mvIncrementalMaintain(spark, rows).collect()
      .map(r => (r.getDate(0).toString, r.getString(1)) ->
        ((r.getLong(2), r.getDouble(3), r.getDouble(4), r.getLong(5))))
      .toMap
    // avg cents half-up: 35035/3 -> 11678 (down), 5005/2 -> 2503 (up)
    assert(out == Map(
      ("1995-01-01", "A") -> ((3L, 10.0, 350.35, 11678L)),
      ("1995-01-02", "R") -> ((2L, 5.0, 50.05, 2503L)),
      ("1995-01-03", "N") -> ((1L, 6.0, 60.06, 6006L))), s"mv: $out")
  }
}
