package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.ops.{AuditOps, GraphOps}

/** Hand-computed fixtures for the governance-audit tier (q208-q211).
  * The sf-data oracle grades engine parity; these pin the SEMANTICS on
  * inputs small enough to verify by hand — planted orphans, a streak
  * broken by exactly one gap day, the k-anonymity boundary (group size
  * == k is safe, k-1 is at risk), and a wedge that must NOT count as a
  * triangle.
  */
class AuditSpec extends SparkSpec {
  import spark.implicits._

  test("relationshipAudit counts orphans and childless parents") {
    val child = Seq((1L, "a"), (1L, "b"), (2L, "c"), (9L, "d"), (9L, "e"))
      .toDF("fk", "payload")
    val parent = Seq((1L, "p1"), (2L, "p2"), (3L, "p3")).toDF("pk", "name")
    val row = AuditOps.relationshipAudit("t", child, "fk", parent, "pk")
      .collect().head
    // key 9 (2 rows) has no parent; parent 3 has no children
    assert(row === Row("t", 5L, 3L, 2L, 3L, 1L))
  }

  test("relationshipAudit on a clean relationship reports zero orphans") {
    val child = Seq((1L, "a"), (2L, "b")).toDF("fk", "payload")
    val parent = Seq((1L, "x"), (2L, "y")).toDF("pk", "name")
    val row = AuditOps.relationshipAudit("t", child, "fk", parent, "pk")
      .collect().head
    assert(row.getLong(3) === 0L && row.getLong(5) === 0L)
  }

  test("activityStreaks finds the longest island and breaks ties by earliest start") {
    // user 1: days 1-3 (streak 3), gap, days 5-6 (streak 2) -> best 3 @ Jan 1
    // user 2: days 1-2 and days 4-5 -> two streaks of 2, earliest wins
    val ev = Seq(
      (1L, "2024-01-01"), (1L, "2024-01-02"), (1L, "2024-01-03"),
      (1L, "2024-01-05"), (1L, "2024-01-06"), (1L, "2024-01-06"),
      (2L, "2024-01-01"), (2L, "2024-01-02"),
      (2L, "2024-01-04"), (2L, "2024-01-05"))
      .toDF("user_id", "d")
      .select(col("user_id"), col("d").cast("timestamp").as("ts"))
    val out = AuditOps.activityStreaks(ev).collect()
    assert(out.toSeq === Seq(
      Row(1L, 3L, "2024-01-01", "2024-01-03"),
      Row(2L, 2L, "2024-01-01", "2024-01-02")))
  }

  test("kAnonymity flags groups below k only, boundary at gsize == k") {
    // nation 0: one group of 2 (at risk with k=2? no: 2 >= 2 safe) and
    // one singleton (at risk). nation 1: one group of 3 (safe).
    val cust = Seq(
      (10L, "AUTO", 100.0, 0), (11L, "AUTO", 150.0, 0), // band 0, size 2
      (12L, "BLDG", 100.0, 0),                          // singleton
      (20L, "AUTO", 100.0, 1), (21L, "AUTO", 200.0, 1), (22L, "AUTO", 300.0, 1))
      .toDF("c_custkey", "c_mktsegment", "c_acctbal", "c_nationkey")
    val nation = Seq((0, "ZERO"), (1, "ONE")).toDF("n_nationkey", "n_name")
    val out = AuditOps.kAnonymity(cust, nation, k = 2)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSeq
    assert(out === Seq(
      ("ZERO", 3L, 2L, 1L, 1L, 3333L),
      ("ONE", 3L, 1L, 0L, 0L, 0L)))
  }

  test("kAnonymity bands negative balances below zero") {
    val cust = Seq((1L, "AUTO", -994.28, 0), (2L, "AUTO", 5.0, 0))
      .toDF("c_custkey", "c_mktsegment", "c_acctbal", "c_nationkey")
    val nation = Seq((0, "Z")).toDF("n_nationkey", "n_name")
    // floor(-994.28/1000) = -1 vs floor(5/1000) = 0: two singletons
    val row = AuditOps.kAnonymity(cust, nation, k = 2).collect().head
    assert(row.getLong(2) === 2L && row.getLong(4) === 2L)
  }

  test("temporal split counts straddling entities exactly") {
    // cutoff = min + 10 days = Jan 11. cust 1 straddles, cust 2 is
    // train-only, cust 3 test-only
    val orders = Seq(
      (1L, "2024-01-01"), (1L, "2024-01-20"),
      (2L, "2024-01-02"), (3L, "2024-01-15"))
      .toDF("o_custkey", "d")
      .select(col("o_custkey"), col("d").cast("timestamp").as("o_orderdate"))
    val row = AuditOps.temporalSplitAudit(orders, cutoffDays = 10)
      .collect().head
    // train orders 2, test 2; train custs {1,2}, test custs {1,3},
    // both {1}; 1*10000 div 2 = 5000
    assert(row === Row(2L, 2L, 2L, 2L, 1L, 5000L))
  }

  test("contract audit: NULL predicates count as violations, one row per contract") {
    val df = Seq[(java.lang.Long, String)](
      (1L, "ok"), (-5L, "ok"), (null, "bad"))
      .toDF("v", "tag")
    val out = AuditOps.contractAudit(df, Seq(
      ("v_nonneg", "v >= 0"),        // -5 violates, NULL violates -> 2
      ("tag_ok", "tag = 'ok'"),      // 'bad' violates -> 1
      ("always", "1 = 1")))          // 0
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    assert(out === Map(
      "always" -> ((3L, 0L)),
      "tag_ok" -> ((3L, 1L)),
      "v_nonneg" -> ((3L, 2L))))
  }

  test("contract audit rejects duplicate and non-identifier contract names") {
    val df = Seq((1L, "x")).toDF("v", "tag")
    intercept[IllegalArgumentException] {
      AuditOps.contractAudit(df, Seq(("a", "v >= 0"), ("a", "v < 0")))
    }
    // names reach stack() text and column aliases — quotes/commas must
    // be rejected up front, not become a parse error (or an injection)
    intercept[IllegalArgumentException] {
      AuditOps.contractAudit(df, Seq(("bad'name", "v >= 0")))
    }
    intercept[IllegalArgumentException] {
      AuditOps.contractAudit(df, Seq(("x', n_rows, n_rows) --", "v >= 0")))
    }
  }

  test("debounce drops repeats measured against the previous event, kept or not") {
    // user 1 clicks at t0, t0+2s, t0+6s: +2 dropped (gap 2 < 5), and
    // +6 ALSO dropped — its gap is measured against the +2 event (4s),
    // not the last KEPT one (lag-based suppression, documented)
    val ev = Seq(
      (1L, 10L, "click", "2024-01-01 10:00:00"),
      (1L, 11L, "click", "2024-01-01 10:00:02"),
      (1L, 12L, "click", "2024-01-01 10:00:06"),
      // a different type is an independent stream: kept
      (1L, 13L, "view", "2024-01-01 10:00:03"),
      // exactly at the 5s boundary: kept (>=)
      (2L, 14L, "click", "2024-01-01 10:00:00"),
      (2L, 15L, "click", "2024-01-01 10:00:05"))
      .toDF("user_id", "event_id", "event_type", "t")
      .select(col("user_id"), col("event_id"), col("event_type"),
        col("t").cast("timestamp").as("ts"))
    val out = AuditOps.debounceStats(ev).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(out === Map(
      "click" -> ((5L, 3L, 6000L)),
      "view" -> ((1L, 1L, 10000L))))
  }

  test("calendar gaps: spine minus observed, bounds inclusive") {
    val orders = Seq("2024-01-01", "2024-01-02", "2024-01-04", "2024-01-07")
      .zipWithIndex.map { case (d, i) => (i.toLong, d) }
      .toDF("o_orderkey", "d")
      .select(col("o_orderkey"), col("d").cast("timestamp").as("o_orderdate"))
    val row = AuditOps.calendarGaps(orders).collect().head
    assert(row === Row(7L, 4L, 3L, "2024-01-03", "2024-01-06"))
  }

  test("weighted median follows the mass, lower-median on even splits") {
    import graft.ops.StatOps
    val li = Seq(
      // supplier 1: 1 unit at $1.00 vs 3 units at $2.00 -> 200
      (1L, 1.00, 1.0), (1L, 2.00, 3.0),
      // supplier 2: even 2/2 split -> lower median 100
      (2L, 1.00, 2.0), (2L, 2.00, 2.0))
      .toDF("l_suppkey", "l_extendedprice", "l_quantity")
    val out = StatOps.weightedMedian(li).collect()
    assert(out.toSeq === Seq(Row(1L, 4L, 200L), Row(2L, 4L, 100L)))
  }

  test("triangleStats counts closed wedges once and skips open ones") {
    // Undirected triangle {1,2,3} + pendant 4 attached to 1 (wedge
    // 2-1-4 and 3-1-4 are open). Feed as directed edges both ways for
    // some edges to prove the undirect/distinct step dedups.
    val edges = Seq(
      (1L, 2L), (2L, 1L), (2L, 3L), (1L, 3L), (1L, 4L))
      .toDF("src", "dst")
    val out = GraphOps.triangleStats(edges).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(out === Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("triangleStats on a 4-clique finds 4 triangles, 3 per node") {
    val edges = (for {
      a <- 1L to 4L; b <- 1L to 4L if a < b
    } yield (a, b)).toDF("src", "dst")
    val out = GraphOps.triangleStats(edges).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(out === Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
  }

  test("erasureAudit propagates the purge through orders to lineitem") {
    // delete set = custkey % 97 == 13 -> only customer 13
    val customer = Seq(13L, 1L, 2L).toDF("c_custkey")
    val orders = Seq((100L, 13L), (200L, 1L)).toDF("o_orderkey", "o_custkey")
    val lineitem = Seq(100L, 100L, 200L).toDF("l_orderkey")
    val events = Seq(13L, 13L, 2L).toDF("user_id")
    val out = AuditOps.erasureAudit(customer, orders, lineitem, events)
      .collect().toSeq
    assert(out === Seq(
      Row("customer", 3L, 1L, 2L),
      Row("events", 3L, 2L, 1L),
      Row("lineitem", 3L, 2L, 1L),
      Row("orders", 2L, 1L, 1L)))
  }

  test("erasureAudit with an empty delete set purges nothing") {
    val customer = Seq(1L, 2L).toDF("c_custkey")
    val orders = Seq((100L, 1L)).toDF("o_orderkey", "o_custkey")
    val lineitem = Seq(100L).toDF("l_orderkey")
    val events = Seq(1L).toDF("user_id")
    val purged = AuditOps.erasureAudit(customer, orders, lineitem, events)
      .collect().map(r => r.getLong(2)).sum
    assert(purged === 0L)
  }

  test("column profile: nulls counted, ndv excludes nulls, typed min/max") {
    import java.sql.Timestamp
    val rows = Seq(
      (Some(3.5), Some("b"), Some(Timestamp.valueOf("1995-01-02 00:00:00"))),
      (Some(1.5), None, Some(Timestamp.valueOf("1995-01-01 00:00:00"))),
      (Some(3.5), Some("a"), None),
      (None, Some("a"), Some(Timestamp.valueOf("1995-01-03 00:00:00"))))
      .toDF("x", "s", "ts")
    val out = AuditOps.columnProfile(rows, Seq("x"), Seq("s"), Seq("ts"))
      .collect().map(r => r.getString(0) -> r).toMap
    val x = out("x")
    assert(x.getLong(1) === 4L && x.getLong(2) === 1L && x.getLong(3) === 2L)
    assert(x.getDouble(4) === 1.5 && x.getDouble(5) === 3.5)
    assert(x.isNullAt(6) && x.isNullAt(7))
    val s = out("s")
    assert(s.getLong(2) === 1L && s.getLong(3) === 2L)
    assert(s.getString(6) === "a" && s.getString(7) === "b")
    assert(s.isNullAt(4) && s.isNullAt(5))
    val ts = out("ts")
    assert(ts.getString(6) === "1995-01-01 00:00:00")
    assert(ts.getString(7) === "1995-01-03 00:00:00")
  }

  test("lineage chains: independent JVM fold agrees; any tamper avalanches") {
    import java.sql.Timestamp
    import spark.implicits._
    def md5hex(s: String): String = java.security.MessageDigest
      .getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    def t(m: Int) = Timestamp.valueOf(f"1995-01-01 10:$m%02d:00")
    val base = Seq(
      (7L, t(1), 100L, "view"), (7L, t(2), 101L, "purchase"),
      (7L, t(3), 102L, "view"),
      (8L, t(1), 200L, "view"))
    def run(rows: Seq[(Long, Timestamp, Long, String)]): Map[Long, String] =
      AuditOps.lineageChains(
        rows.toDF("user_id", "ts", "event_id", "event_type"))
        .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    val heads = run(base)
    // independent sequential fold, no Spark involved
    val expect7 = Seq((100L, "view"), (101L, "purchase"), (102L, "view"))
      .foldLeft(md5hex("7")) { case (acc, (id, et)) =>
        md5hex(acc + s":$id:$et") }
    assert(heads(7L) === expect7, "chain arithmetic drifted from the JVM fold")
    assert(heads(8L) === md5hex(md5hex("8") + ":200:view"))
    // tamper classes: value flip, reorder (ts swap), drop — each must
    // change user 7's head while leaving user 8's untouched
    val flipped = run(base.map { case (u, ts0, id, et) =>
      if (id == 101L) (u, ts0, id, "view") else (u, ts0, id, et) })
    val reordered = run(base.map { case (u, ts0, id, et) =>
      if (id == 100L) (u, t(5), id, et) else (u, ts0, id, et) })
    val dropped = run(base.filterNot(_._3 == 101L))
    for ((name, m) <- Seq("flip" -> flipped, "reorder" -> reordered,
        "drop" -> dropped)) {
      assert(m(7L) !== heads(7L), s"$name must avalanche user 7's head")
      assert(m(8L) === heads(8L), s"$name must not touch user 8's head")
    }
    // and the fold is partitioning-independent (sort key is total)
    val heads7 = AuditOps.lineageChains(base.toDF(
        "user_id", "ts", "event_id", "event_type").repartition(13))
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(heads7 === heads)
  }
}
