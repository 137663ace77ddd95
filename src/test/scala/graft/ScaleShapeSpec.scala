package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.ops.ScaleShapeOps

/** q212-q214 semantics pins: VARIANT extraction on hand JSON, the
  * bucketized interval self-join against a naive inequality join (the
  * completeness proof of the bucketing), and the two-phase grouped rank
  * against the naive grouped window (q92's equality doctrine applied to
  * groups).
  */
class ScaleShapeSpec extends SparkSpec {
  import spark.implicits._

  test("variantIngest extracts typed values and bands them") {
    val ev = Seq(
      ("click", """{"k": 7}"""), ("click", """{"k": 13}"""),
      ("view", """{"k": 99}"""))
      .toDF("event_type", "props")
    val out = ScaleShapeOps.variantIngest(ev).collect()
    assert(out.toSeq === Seq(
      Row("click", 0L, 1L, 7L), Row("click", 1L, 1L, 13L),
      Row("view", 9L, 1L, 99L)))
  }

  test("overlappingOrders finds exactly the overlapping pairs, deduped") {
    // cust 1: orders on day 0, day 3 (overlap: windows [0,7] & [3,10]
    //   share [3,7] = 4 days), day 20 (no overlap with either).
    // cust 2: single order — never pairs.
    val orders = Seq(
      (1L, 100L, "1970-01-01"), (1L, 101L, "1970-01-04"),
      (1L, 102L, "1970-01-21"), (2L, 200L, "1970-01-01"))
      .toDF("o_custkey", "o_orderkey", "d")
      .select(col("o_custkey"), col("o_orderkey"),
        col("d").cast("timestamp").as("o_orderdate"))
    val out = ScaleShapeOps.overlappingOrders(orders).collect()
    assert(out.toSeq === Seq(Row(1L, 100L, 101L, 4)))
  }

  test("identical-day orders meet in both shared buckets but emit once") {
    val orders = Seq((1L, 1L, "1970-01-01"), (1L, 2L, "1970-01-01"))
      .toDF("o_custkey", "o_orderkey", "d")
      .select(col("o_custkey"), col("o_orderkey"),
        col("d").cast("timestamp").as("o_orderdate"))
    val out = ScaleShapeOps.overlappingOrders(orders).collect()
    assert(out.toSeq === Seq(Row(1L, 1L, 2L, 7)))
  }

  test("bucketized overlap join equals the naive inequality join on sf data") {
    val orders = spark.read.parquet(s"$sf/orders.parquet")
    val o = orders.select(col("o_custkey"), col("o_orderkey"),
        datediff(to_date(col("o_orderdate")),
          lit("1970-01-01").cast("date")).as("s"))
      .withColumn("e", col("s") + 7)
    val naive = o.as("a").join(o.as("b"),
        col("a.o_custkey") === col("b.o_custkey")
          && col("a.o_orderkey") < col("b.o_orderkey")
          && col("b.s") <= col("a.e") && col("a.s") <= col("b.e"))
      .select(col("a.o_custkey"), col("a.o_orderkey").as("a_orderkey"),
        col("b.o_orderkey").as("b_orderkey"),
        (least(col("a.e"), col("b.e")) - greatest(col("a.s"), col("b.s")))
          .cast("int").as("overlap_days"))
    val bucketized = ScaleShapeOps.overlappingOrders(orders)
    assert(bucketized.count() > 0)
    assert(bucketized.exceptAll(naive).isEmpty
      && naive.exceptAll(bucketized).isEmpty)
  }

  test("two-phase grouped deciles equal the naive grouped window on sf data") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val two = ScaleShapeOps.langLengthDeciles(docs)
    val naive = ScaleShapeOps.langLengthDecilesNaive(docs)
    assert(two.count() > 0)
    assert(two.exceptAll(naive).isEmpty && naive.exceptAll(two).isEmpty)
  }

  test("hybrid skew join routes hot and cold keys and loses no rows") {
    // orderkey 1 has 3 lines (hot at threshold 2), orderkey 2 has 1
    val li = Seq(
      (1L, 10.0, 0.0), (1L, 10.0, 0.0), (1L, 10.0, 0.0), (2L, 10.0, 0.0))
      .toDF("l_orderkey", "l_extendedprice", "l_discount")
    val o = Seq((1L, "1-URGENT"), (2L, "3-MEDIUM"))
      .toDF("o_orderkey", "o_orderpriority")
    val out = ScaleShapeOps.hybridSkewJoin(li, o, hotThreshold = 2).collect()
    assert(out.toSeq === Seq(
      Row("1-URGENT", 3L, 30.0), Row("3-MEDIUM", 1L, 10.0)))
  }

  test("hybrid skew join equals the plain join aggregate on sf data") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val o = spark.read.parquet(s"$sf/orders.parquet")
    val plain = li.join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_lines"),
        graft.util.Tables.moneySum(graft.util.Tables.revenue).as("revenue"))
      .orderBy("o_orderpriority")
      .collect()
    val hybrid = ScaleShapeOps.hybridSkewJoin(li, o).collect()
    assert(hybrid.toSeq === plain.toSeq)
  }

  test("label as-of join: leakage boundary, horizon edge, tiebreak, negatives") {
    def ev(id: Long, user: Long, t: String, typ: String, v: Double) =
      (id, user, t, typ, v)
    val events = Seq(
      // user 1: view at 10:00; label at EXACTLY 10:00 must NOT attach
      // (leakage); label at 11:00 attaches
      ev(1, 1, "2024-01-01 10:00:00", "view", 0.0),
      ev(2, 1, "2024-01-01 10:00:00", "purchase", 5.0),
      ev(3, 1, "2024-01-01 11:00:00", "purchase", 7.0),
      // user 2: two labels at the SAME future ts -> min event_id wins
      ev(4, 2, "2024-01-01 10:00:00", "view", 0.0),
      ev(6, 2, "2024-01-01 12:00:00", "purchase", 9.0),
      ev(5, 2, "2024-01-01 12:00:00", "purchase", 8.0),
      // user 3: label exactly AT the 24h horizon attaches; user 4's
      // label 1us past it does not
      ev(7, 3, "2024-01-01 10:00:00", "view", 0.0),
      ev(8, 3, "2024-01-02 10:00:00", "purchase", 3.0),
      ev(9, 4, "2024-01-01 10:00:00", "view", 0.0),
      ev(10, 4, "2024-01-02 10:00:00.000001", "purchase", 4.0))
      .toDF("event_id", "user_id", "t", "event_type", "value")
      .select(col("event_id"), col("user_id"),
        col("t").cast("timestamp").as("ts"), col("event_type"), col("value"))
    val out = ScaleShapeOps.labelAsofJoin(events).collect()
      .map(r => r.getLong(0) -> ((r.getString(3), Option(r.get(4)), r.getInt(5))))
      .toMap
    assert(out(1L) === (("2024-01-01 11:00:00", Some(700L), 1)))
    assert(out(4L) === (("2024-01-01 12:00:00", Some(800L), 1)))
    assert(out(7L) === (("2024-01-02 10:00:00", Some(300L), 1)))
    assert(out(9L)._2 === None && out(9L)._3 === 0)
  }

  test("grouped deciles break length ties by doc_id identically to rank order") {
    // 10 docs, all length 100 except two of 50: deciles must split the
    // tied block deterministically by doc_id, never collapse it.
    val docs = (1L to 10L).map(i => (i, if (i <= 2) 50L else 100L, "en"))
      .toDF("doc_id", "n_chars", "lang")
    val out = ScaleShapeOps.langLengthDeciles(docs).collect()
    // ranks 1..10 -> deciles 0..9, one doc each
    assert(out.length === 10 && out.forall(_.getLong(2) === 1L))
    assert(out.map(_.getLong(1)).toSeq === (0L to 9L))
  }
}
