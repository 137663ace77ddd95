package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import org.apache.spark.sql.Row
import graft.ops.{TimeSeriesOps, WarehouseOps}

/** Plan pins + boundary fixtures for the round-9 warehouse and
  * time-series tiers (the graded corpus runs are pinned by the DuckDB
  * oracles; these pin decorrelation shapes and the edges a corpus draw
  * may not exercise at every sf).
  */
class WarehouseSpec extends SparkSpec {
  import spark.implicits._

  private def planOf(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString

  test("q171 NOT IN denylist plans as an anti join, never a NL re-probe") {
    val plan = planOf("q171_supplier_cnt")
    assert(plan.contains("LeftAnti"),
      s"NOT IN must become a (null-aware) anti join:\n$plan")
  }

  test("q174 correlated MIN decorrelates to an aggregate joined back") {
    val plan = planOf("q174_min_bal_supplier")
    assert(!plan.contains("ScalarSubquery"),
      s"the per-part MIN must not re-run per outer row:\n$plan")
    assert(plan.contains("min("), s"expected the decorrelated MIN agg in:\n$plan")
  }

  test("q172 HAVING-IN subquery plans as a semi join against the aggregate") {
    val plan = planOf("q172_large_orders")
    assert(plan.contains("LeftSemi"),
      s"the order-key IN must be a semi join:\n$plan")
  }

  test("q179 trained trigram model broadcasts into the score side") {
    val plan = planOf("q179_char_lm")
    assert(plan.contains("BroadcastHashJoin"),
      s"the charset-bounded model must broadcast, not shuffle the corpus:\n$plan")
  }

  test("q176 weekday moments broadcast back over the day frame") {
    val plan = planOf("q176_dow_anomalies")
    assert(plan.contains("BroadcastHashJoin"),
      s"the 7-row weekday stats must broadcast:\n$plan")
  }

  test("q169 band boundary: shipping at exactly +30 days is SLOW (strict <)") {
    val ts = (s: String) => Timestamp.valueOf(s)
    val orders = Seq(
      (1L, ts("1997-03-01 00:00:00"), "1-URGENT"),
      (2L, ts("1997-03-01 00:00:00"), "5-LOW"))
      .toDF("o_orderkey", "o_orderdate", "o_orderpriority")
    val li = Seq(
      (1L, ts("1997-03-31 00:00:00")), // +30 days exactly -> SLOW
      (2L, ts("1997-03-30 23:59:59"))) // inside 30 days -> FAST
      .toDF("l_orderkey", "l_shipdate")
    val out = WarehouseOps.shipBandPriority(li, orders)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(out == Seq(("FAST", 0L, 1L), ("SLOW", 1L, 0L)))
  }

  test("q181 attribution: same-ts click with a smaller event id attributes; " +
    "the 1h boundary is inclusive") {
    val ts = (s: String) => Timestamp.valueOf(s)
    val events = Seq(
      // user 1: click at the same ts as the purchase, earlier event_id
      (1L, 10L, ts("2024-01-01 10:00:00"), "click"),
      (1L, 11L, ts("2024-01-01 10:00:00"), "purchase"),
      // user 2: click exactly one hour before -> within_1h (<=)
      (2L, 20L, ts("2024-01-01 09:00:00"), "click"),
      (2L, 21L, ts("2024-01-01 10:00:00"), "purchase"),
      // user 3: never clicked
      (3L, 30L, ts("2024-01-01 10:00:00"), "purchase"),
      // user 4: click one second past the hour -> within_1d
      (4L, 40L, ts("2024-01-01 08:59:59"), "click"),
      (4L, 41L, ts("2024-01-01 10:00:00"), "purchase"))
      .toDF("user_id", "event_id", "ts", "event_type")
    val out = TimeSeriesOps.lastTouchAttribution(events)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(out == Map(
      "within_1h" -> 2L, "within_1d" -> 1L, "never_clicked" -> 1L))
  }

  test("q183 skyline: dominated points drop, ties on one axis survive, " +
    "exact duplicates collapse to the first key") {
    val ts = Timestamp.valueOf("2024-01-01 00:00:00")
    // points per customer: 10 -> (300, 1); 20 -> (200, 2);
    // 30 -> (200, 2) exact duplicate of 20 (collapses to key 20);
    // 40 -> (180, 1) dominated by 20 on both axes;
    // 50 -> (300, 1) exact duplicate of 10; 60 -> (160, 3) frontier
    // (fewer revenue, strictly more orders than every higher point).
    val orders = Seq(
      (1L, 10L, 300.0), (2L, 20L, 150.0), (3L, 20L, 50.0),
      (4L, 30L, 100.0), (5L, 30L, 100.0), (6L, 40L, 180.0),
      (7L, 50L, 300.0), (8L, 60L, 100.0), (9L, 60L, 50.0), (10L, 60L, 10.0))
      .map { case (ok, ck, v) => (ok, ck, v, ts) }
      .toDF("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate")
    val customer = Seq(10L, 20L, 30L, 40L, 50L, 60L)
      .map(c => (c, 0)).toDF("c_custkey", "c_nationkey")
    val nation = Seq((0, "NATION_0")).toDF("n_nationkey", "n_name")
    val got = graft.ops.WarehouseOps.paretoCustomers(orders, customer, nation)
      .collect().map(r => (r.getLong(1), r.getDouble(2), r.getLong(3))).toSet
    assert(got == Set((10L, 300.0, 1L), (20L, 200.0, 2L), (60L, 160.0, 3L)),
      s"got $got")
  }

  test("q177 CUSUM is exact: a planted level shift peaks at its onset") {
    // 10 days at 2 orders/day then 10 days at 6/day: |cusum| peaks at the
    // last low day (the classic mean-change estimator's argmax).
    val rows = (1 to 10).flatMap(d => Seq.fill(2)(d)) ++
      (11 to 20).flatMap(d => Seq.fill(6)(d))
    val orders = rows.zipWithIndex.map { case (d, i) =>
      (i.toLong, Timestamp.valueOf(f"2024-01-$d%02d 00:00:00"))
    }.toDF("o_orderkey", "o_orderdate")
    val top = TimeSeriesOps.cusumChangepoint(orders).collect()
    assert(top.head.getDate(0).toString == "2024-01-10")
    // dev on low days = 20*2 - 80 = -40 each; cusum at day 10 = -400
    assert(top.head.getLong(2) == -400L)
  }

  test("q178 autocorrelation of a perfectly alternating series is -1 at " +
    "lag 1 and +1 at lag 7 is absent (gap-aware pairing skips gaps)") {
    // days 1..14 alternating 2,4 orders; remove day 8 so lag-7 pairs drop
    // the gap instead of mispairing positions
    val counts = Map(1 -> 2, 2 -> 4, 3 -> 2, 4 -> 4, 5 -> 2, 6 -> 4,
      7 -> 2, 9 -> 2, 10 -> 4, 11 -> 2, 12 -> 4, 13 -> 2, 14 -> 4)
    val orders = counts.toSeq.flatMap { case (d, n) =>
      (1 to n).map(i => (d * 100L + i, Timestamp.valueOf(f"2024-01-$d%02d 00:00:00")))
    }.toDF("o_orderkey", "o_orderdate")
    val r = TimeSeriesOps.dailyAutocorr(orders).collect()
      .map(row => row.getInt(0) -> (row.getLong(1), row.getDouble(2))).toMap
    // lag 1: r is -1 up to the sqrt rounding of a non-square moment (120)
    assert(math.abs(r(1)._2 + 1.0) < 1e-12,
      s"alternating series must have lag-1 acf ~ -1: $r")
    // lag 7: day 8 missing kills pairs (1,8) and (8,15); day d pairs with
    // d+7 for d in 2..7 -> 6 pairs, all (x,y) = (c, opposite c) -> acf -1
    assert(r(7)._1 == 6L && r(7)._2 == -1.0, s"gap-aware lag-7: $r")
  }

  test("position attribution: hand-computed U-shaped splits, remainder to first middle") {
    import graft.ops.TimeSeriesOps
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    // user 1: purchase 100.00 with 5 clicks in window -> bp 4000, then
    // middles share 2000: 2000 div 3 = 666, remainder 2 to the first
    // middle (rnk 2 gets 668), last 4000. one click outside 7d ignored.
    // user 2: purchase 10.00 with ONE click -> 10000 bp.
    // user 3: purchase with clicks only AFTER it -> no rows at all.
    val ev = Seq(
      (1L, ts("2024-03-01 00:00:00"), 1L, "click", 0.0, """{"k": 0}"""),  // stale
      (2L, ts("2024-03-09 10:00:00"), 1L, "click", 0.0, """{"k": 1}"""),
      (3L, ts("2024-03-09 11:00:00"), 1L, "click", 0.0, """{"k": 2}"""),
      (4L, ts("2024-03-09 12:00:00"), 1L, "click", 0.0, """{"k": 3}"""),
      (5L, ts("2024-03-09 13:00:00"), 1L, "click", 0.0, """{"k": 4}"""),
      (6L, ts("2024-03-09 14:00:00"), 1L, "click", 0.0, """{"k": 5}"""),  // k%5=0
      (7L, ts("2024-03-10 00:00:00"), 1L, "purchase", 100.0, """{"k": 9}"""),
      (8L, ts("2024-03-10 00:00:00"), 2L, "click", 0.0, """{"k": 7}"""),  // ch2
      (9L, ts("2024-03-10 01:00:00"), 2L, "purchase", 10.0, """{"k": 9}"""),
      (10L, ts("2024-03-10 02:00:00"), 3L, "click", 0.0, """{"k": 0}"""),
      (11L, ts("2024-03-10 01:00:00"), 3L, "purchase", 50.0, """{"k": 9}""")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = TimeSeriesOps.positionAttribution(ev).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))))
      .toMap
    // user-1 ranks: e2 ch1 bp4000, e3 ch2 bp668, e4 ch3 bp666,
    //               e5 ch4 bp666, e6 ch0 bp4000 (last); cents 10000
    // credit = cents * bp div 10000 = bp (cents == 10000)
    assert(out("ch1") === ((1L, 1L, 0L, 4000L, 4000L)))
    // ch2 carries user 1's first-middle touch (668 bp) AND user 2's solo
    // touch (rnk 1 == m -> counts as both first and last; credit 1000)
    assert(out("ch2") === ((2L, 1L, 1L, 668L + 1000L, 668L + 10000L)))
    assert(out("ch3") === ((1L, 0L, 0L, 666L, 666L)))
    assert(out("ch4") === ((1L, 0L, 0L, 666L, 666L)))
    assert(out("ch0") === ((1L, 0L, 1L, 4000L, 4000L)))
    assert(out.keySet === Set("ch0", "ch1", "ch2", "ch3", "ch4"))
  }

  test("open orders: sweep-line matches hand-counted daily backlog") {
    import graft.ops.WarehouseOps
    def ts(s: String) = java.sql.Timestamp.valueOf(s + " 00:00:00")
    // order 1 open Jan1..Jan3 (last ship Jan3), order 2 open Jan2..Jan2,
    // order 3 has no lineitems -> excluded
    val orders = Seq(
      (1L, ts("2024-01-01")), (2L, ts("2024-01-02")), (3L, ts("2024-01-01"))
    ).toDF("o_orderkey", "o_orderdate")
    val li = Seq(
      (1L, ts("2024-01-02")), (1L, ts("2024-01-03")), (2L, ts("2024-01-02"))
    ).toDF("l_orderkey", "l_shipdate")
    val out = WarehouseOps.openOrders(orders, li).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out === Map(
      "2024-01-01" -> ((1L, 1L)),   // order 1 opens
      "2024-01-02" -> ((1L, 2L)),   // order 2 opens (closes same day)
      "2024-01-03" -> ((-1L, 1L)),  // order 2 closed after Jan2
      "2024-01-04" -> ((-1L, 0L)))) // order 1 closed after Jan3
  }

  test("rolling z-score: a planted spike scores against the trailing week only") {
    import graft.ops.TimeSeriesOps
    // 7 warm-up days at 2/day, then a spike day at 9: mean7 = 2,
    // sxx*7 - sx*sx = 28*7 - 196 = 0 -> sigma 0 -> z is the explicit
    // NULL (the spike is EXCLUDED from its own trailing frame, so the
    // flat week gives no scale). Follow with a 3/day day, mixed window.
    val days = (1 to 7).map(d => (d, 2)) ++ Seq((8, 9), (9, 3))
    val orders = days.flatMap { case (d, n) =>
      (1 to n).map(i => (d * 100L + i,
        java.sql.Timestamp.valueOf(f"2024-01-$d%02d 00:00:00")))
    }.toDF("o_orderkey", "o_orderdate")
    val out = TimeSeriesOps.rollingZscore(orders).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2),
        if (r.isNullAt(3)) null else java.lang.Double.valueOf(r.getDouble(3)))))
      .toMap
    assert(out.keySet === Set("2024-01-08", "2024-01-09"))
    assert(out("2024-01-08")._1 === 9L)
    assert(out("2024-01-08")._2 === 2.0)
    assert(out("2024-01-08")._3 === null,
      "zero trailing variance must yield the explicit NULL z")
    // day 9 window: days 2..8 = {2,2,2,2,2,2,9}: sx=21, mean 3.0; z =
    // (3*7-21)/sqrt(...) = 0
    assert(out("2024-01-09")._2 === 3.0)
    assert(out("2024-01-09")._3 === java.lang.Double.valueOf(0.0))
  }

  test("slo burn: exact basis points and the 2x page threshold") {
    import graft.ops.TimeSeriesOps
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    // hour A: 1 error / 50 events -> burn (1*1e6) div 50 = 20000 -> page
    // hour B: 1 error / 51 events -> 19607 -> no page
    val ev = ((1 to 49).map(i => (i.toLong, ts("2024-01-01 10:00:00"), 1L, "view")) ++
      Seq((50L, ts("2024-01-01 10:30:00"), 1L, "error")) ++
      (51 to 100).map(i => (i.toLong, ts("2024-01-01 11:00:00"), 1L, "view")) ++
      Seq((101L, ts("2024-01-01 11:30:00"), 1L, "error")))
      .toDF("event_id", "ts", "user_id", "event_type")
      .withColumn("value", lit(0.0)).withColumn("props", lit("{}"))
    val out = TimeSeriesOps.sloBurn(ev).collect()
      .map(r => r.getString(0) -> ((r.getLong(3), r.getInt(4)))).toMap
    assert(out("2024-01-01 10") === ((20000L, 1)))
    assert(out("2024-01-01 11") === ((19607L, 0)))
  }

  test("seasonal decomposition: planted weekday effect recovered exactly") {
    // 21 consecutive days (Mon Jan 1 .. Sun Jan 21), 10 orders/day plus
    // +7 on Sundays. Complete centered windows (rows 4..18) each span
    // one full week -> wsum 77; dev7 = 7*cnt-77 is 42 on Sundays, -7
    // elsewhere -> seasonal exactly +6.0 / -1.0 with zero remainder.
    val orders = (1 to 21).flatMap { d =>
      val dow = (d % 7) // Jan 7,14,21 are Sundays (d % 7 == 0)
      val cnt = if (d % 7 == 0) 17 else 10
      (1 to cnt).map(i =>
        (d * 1000L + i, java.sql.Timestamp.valueOf(f"2024-01-$d%02d 00:00:00")))
    }.toDF("o_orderkey", "o_orderdate")
    val out = TimeSeriesOps.seasonalDecomposition(orders).collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3))))
      .toMap
    // Spark dow: Sunday=0 ... Saturday=6; interior days Jan 4..18
    assert(out(0) === ((2L, 6.0, 0.0)), s"sunday: $out")
    assert(out(4) === ((3L, -1.0, 0.0)), s"thursday: $out") // Jan 4, 11, 18
    (1 to 6).filter(_ != 4).foreach { d =>
      assert(out(d) === ((2L, -1.0, 0.0)), s"dow $d: $out")
    }
  }

  test("seasonal decomposition: windows straddling a calendar gap are excluded") {
    // days 1..15 with day 8 missing: every 7-row window containing the
    // gap spans >6 days and must drop; only fully-contiguous windows
    // survive (rows centered on days 4 and 12 within each island)
    val orders = ((1 to 7) ++ (9 to 15)).flatMap { d =>
      (1 to 10).map(i =>
        (d * 1000L + i, java.sql.Timestamp.valueOf(f"2024-01-$d%02d 00:00:00")))
    }.toDF("o_orderkey", "o_orderdate")
    val rows = TimeSeriesOps.seasonalDecomposition(orders).collect()
    // flat series: wherever a window survives, seasonal is exactly 0
    assert(rows.nonEmpty && rows.forall(r => r.getDouble(2) == 0.0),
      s"got ${rows.mkString(",")}")
    // 14 observed days; windows centered on rows 4..11 of the combined
    // series, minus those spanning the gap -> exactly 2 survive
    assert(rows.map(_.getLong(1)).sum === 2L, s"got ${rows.mkString(",")}")
  }

  test("markov attribution: hand-computed removal effects") {
    import java.sql.Timestamp
    // u1: view -> purchase; u2: view -> click (never converts);
    // u3: purchase immediately
    // transitions: start->view 2, start->conv 1, view->conv 1,
    //   view->click 1, click->null 1
    // base p(start) = 666666 ppm; removing view -> 333333 (effect
    // exactly 5000.0 bp since 666666*5000 == 3333330000); removing
    // click changes nothing (that path never converted anyway)
    val ev = Seq(
      (1L, 10L, "view", "2024-01-01 10:00:00"),
      (1L, 11L, "purchase", "2024-01-01 10:05:00"),
      (2L, 20L, "view", "2024-01-01 10:00:00"),
      (2L, 21L, "click", "2024-01-01 10:05:00"),
      (3L, 30L, "purchase", "2024-01-01 10:00:00"))
      .toDF("user_id", "event_id", "event_type", "s")
      .withColumn("ts", col("s").cast("timestamp")).drop("s")
    val out = TimeSeriesOps.markovAttribution(ev).collect().toSeq
    assert(out === Seq(
      Row("click", 666666L, 666666L, 0.0),
      Row("view", 666666L, 333333L, 5000.0)))
  }

  test("markov attribution: journeys truncate at the first purchase") {
    import java.sql.Timestamp
    // u1's post-purchase error must contribute NO transition: with
    // truncation broken, purchase->error and error->null rows would
    // shift every probability below. u2 never converts via signup,
    // keeping each removal scenario's graph non-empty.
    val ev = Seq(
      (1L, 10L, "view", "2024-01-01 10:00:00"),
      (1L, 11L, "purchase", "2024-01-01 10:05:00"),
      (1L, 12L, "error", "2024-01-01 10:10:00"),
      (2L, 20L, "signup", "2024-01-01 10:00:00"))
      .toDF("user_id", "event_id", "event_type", "s")
      .withColumn("ts", col("s").cast("timestamp")).drop("s")
    val out = TimeSeriesOps.markovAttribution(ev).collect().toSeq
    // transitions: start->view 1, start->signup 1, view->conv 1,
    // signup->null 1 -> p_base(start) = 500000 ppm; removing view
    // kills the only converting path (10000 bp); error/signup removals
    // change nothing that converts
    assert(out === Seq(
      Row("error", 500000L, 500000L, 0.0),
      Row("signup", 500000L, 500000L, 0.0),
      Row("view", 500000L, 0L, 10000.0)))
  }

  test("theil-sen: median pairwise slope ignores a count outlier") {
    // 7 days on an exact cnt = 2·i + 10 line except the last day, a
    // 1000-order spike. 15 of the 21 pairwise slopes are exactly 2.0,
    // the 6 spike pairs are huge — the median (rank 11) stays 2.0,
    // where q195's least-squares slope would be dragged far above it
    val counts = Seq(10, 12, 14, 16, 18, 20, 1000)
    val rows = counts.zipWithIndex.flatMap { case (c, i) =>
      Seq.fill(c)((i.toLong, Timestamp.valueOf(s"1995-01-0${i + 1} 00:00:00")))
    }
    val out = TimeSeriesOps.theilSenTrend(
      rows.toDF("o_orderkey", "o_orderdate")).head()
    assert(out.getLong(0) === 7L && out.getLong(1) === 21L)
    assert(out.getDouble(2) === 2.0, s"robust slope: ${out.getDouble(2)}")
  }

  test("theil-sen: even pair count takes the lower median") {
    // 4 days, 6 pairs; slopes sorted: [1,1,1,3,5,7] -> rank (6+1)/2 = 3
    // (lower median) = 1.0. Series 0,1,2,3 days with cnt 1,2,3,8:
    // pairs (0,1)=1 (0,2)=1 (1,2)=1 (0,3)=7/3 (1,3)=3 (2,3)=5
    val counts = Seq(1, 2, 3, 8)
    val rows = counts.zipWithIndex.flatMap { case (c, i) =>
      Seq.fill(c)((i.toLong, Timestamp.valueOf(s"1995-02-0${i + 1} 00:00:00")))
    }
    val out = TimeSeriesOps.theilSenTrend(
      rows.toDF("o_orderkey", "o_orderdate")).head()
    assert(out.getLong(1) === 6L)
    assert(out.getDouble(2) === 1.0, s"lower median: ${out.getDouble(2)}")
  }
}
