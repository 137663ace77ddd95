package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.ops.ExtendedOps

/** Pins the bucketized range join (q60): boundary semantics on a planted
  * fixture (strict lower bound, inclusive upper bound, bucket-crossing
  * clicks, zero-match rows) and exact equivalence to the naive inequality
  * join on the real events table.
  */
class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private val H = 3600000000L // 1 hour in microseconds

  private def ts(s: String) = Timestamp.valueOf(s)

  test("planted boundaries: strict >, inclusive <= +1h, zero-match rows kept") {
    val purchases = Seq(
      (1L, 10L, ts("2024-01-01 10:00:00")),
      (2L, 10L, ts("2024-01-01 15:30:00")), // no clicks near it
      (3L, 20L, ts("2024-01-01 10:00:00"))
    ).toDF("purchase_id", "user_id", "ts")
    val clicks = Seq(
      (10L, ts("2024-01-01 10:00:00")),        // == purchase ts -> excluded (strict >)
      (10L, ts("2024-01-01 10:00:00.000001")), // just inside
      (10L, ts("2024-01-01 10:59:59")),        // inside, same bucket
      (10L, ts("2024-01-01 11:00:00")),        // == +1h -> included (<=), next bucket
      (10L, ts("2024-01-01 11:00:00.000001")), // just past -> excluded
      (20L, ts("2024-01-01 10:30:00")),        // other user -> purchase 3 only
      (30L, ts("2024-01-01 10:30:00"))         // user with no purchases
    ).toDF("user_id", "ts")
    val out = ExtendedOps.bucketedRangeCount(purchases, clicks, H)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(out == Map(1L -> 3L, 2L -> 0L, 3L -> 1L))
  }

  test("bucketized equals the naive inequality join on real events") {
    val ev = graft.ops.EventOps.events(spark, sf)
    val clicks = ev.where(col("event_type") === "click")
      .select(col("user_id"), col("ts"))
    val purchases = ev.where(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"), col("ts"))
    val bucketed = ExtendedOps.bucketedRangeCount(purchases, clicks, H)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val naive = purchases.as("p").join(clicks.as("c"),
        col("c.user_id") === col("p.user_id") &&
          col("c.ts") > col("p.ts") &&
          expr(s"unix_micros(c.ts) <= unix_micros(p.ts) + ${H}L"), "left")
      .groupBy(col("p.purchase_id"))
      .agg(count(col("c.ts")).as("clicks_1h"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(bucketed == naive)
    assert(bucketed.nonEmpty && bucketed.values.exists(_ > 0),
      "fixture must exercise real matches")
  }
}
