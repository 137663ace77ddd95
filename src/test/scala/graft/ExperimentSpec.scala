package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.ops.ExperimentOps

/** Hand-computed CUPED fixture: when Y = 2X exactly, θ must come out
  * 2.0 and the adjustment must remove the covariate-driven arm
  * difference entirely — both arms' adjusted means coincide.
  */
class ExperimentSpec extends SparkSpec {
  import spark.implicits._

  test("CUPED with Y = 2X: theta = 2, adjusted means equalize the arms") {
    // pre-period purchases carry X, post-period carry Y = 2X; arms by
    // parity get deliberately imbalanced covariates (A: 100/200,
    // B: 300/400) so the raw means differ 300 vs 700
    val events = Seq(
      (0L, "2024-01-01 10:00:00", 1.00), (0L, "2024-01-20 10:00:00", 2.00),
      (2L, "2024-01-01 10:00:00", 2.00), (2L, "2024-01-20 10:00:00", 4.00),
      (1L, "2024-01-01 10:00:00", 3.00), (1L, "2024-01-20 10:00:00", 6.00),
      (3L, "2024-01-01 10:00:00", 4.00), (3L, "2024-01-20 10:00:00", 8.00))
      .toDF("user_id", "t", "value")
      .select(col("user_id"), col("t").cast("timestamp").as("ts"),
        lit("purchase").as("event_type"), col("value"),
        monotonically_increasing_id().as("event_id"))
    val out = ExperimentOps.cupedAdjustment(events).collect()
    assert(out.toSeq === Seq(
      Row("A", 2L, 300.0, 150.0, 500.0),
      Row("B", 2L, 700.0, 350.0, 500.0)))
  }

  test("KS on disjoint samples reaches 1.0 at the crossing value") {
    val orders = Seq(
      (1L, "1-URGENT", 0.01), (2L, "1-URGENT", 0.02),
      (3L, "3-MEDIUM", 0.03), (4L, "3-MEDIUM", 0.04))
      .toDF("o_orderkey", "o_orderpriority", "o_totalprice")
    val r = ExperimentOps.ksDrift(orders).collect().head
    assert(r === Row(2L, 2L, 2L, 4L, 1.0))
  }

  test("KS on identical samples is 0") {
    val orders = Seq((1L, "1-URGENT", 0.05), (2L, "3-MEDIUM", 0.05))
      .toDF("o_orderkey", "o_orderpriority", "o_totalprice")
    val r = ExperimentOps.ksDrift(orders).collect().head
    assert(r === Row(1L, 1L, 5L, 0L, 0.0))
  }

  test("sharded ECDF equals the naive global-window KS on sf orders") {
    val orders = spark.read.parquet(s"$sf/orders.parquet")
    val g = orders
      .select(round(col("o_totalprice") * 100, 0).cast("long").as("cents"),
        when(col("o_orderpriority").startsWith("1"), 1L).otherwise(0L).as("isa"))
      .groupBy("cents")
      .agg(sum(col("isa")).as("a"), sum(lit(1L) - col("isa")).as("b"))
    val w = org.apache.spark.sql.expressions.Window.orderBy("cents")
    val naive = g
      .withColumn("ca", sum(col("a")).over(w))
      .withColumn("cb", sum(col("b")).over(w))
      .withColumn("na", sum(col("a")).over(
        org.apache.spark.sql.expressions.Window.partitionBy()))
      .withColumn("nb", sum(col("b")).over(
        org.apache.spark.sql.expressions.Window.partitionBy()))
      .withColumn("diff", abs(col("ca") * col("nb") - col("cb") * col("na")))
      .orderBy(col("diff").desc, col("cents").asc)
      .limit(1)
      .select(col("na"), col("nb"), col("cents"), col("diff"))
      .collect().head
    val sharded = ExperimentOps.ksDrift(orders).collect().head
    assert((sharded.getLong(0), sharded.getLong(1), sharded.getLong(2),
      sharded.getLong(3)) ===
      ((naive.getLong(0), naive.getLong(1), naive.getLong(2), naive.getLong(3))))
  }

  test("CUPED on balanced arms leaves means unchanged") {
    // identical covariate distribution per arm: mean_x_arm ==
    // mean_x_all, so the adjustment term vanishes whatever theta is
    val events = Seq(
      (0L, "2024-01-01 10:00:00", 1.00), (0L, "2024-01-20 10:00:00", 2.00),
      (2L, "2024-01-01 10:00:00", 3.00), (2L, "2024-01-20 10:00:00", 4.00),
      (1L, "2024-01-01 10:00:00", 1.00), (1L, "2024-01-20 10:00:00", 3.00),
      (3L, "2024-01-01 10:00:00", 3.00), (3L, "2024-01-20 10:00:00", 5.00))
      .toDF("user_id", "t", "value")
      .select(col("user_id"), col("t").cast("timestamp").as("ts"),
        lit("purchase").as("event_type"), col("value"),
        monotonically_increasing_id().as("event_id"))
    val out = ExperimentOps.cupedAdjustment(events).collect()
      .map(r => r.getString(0) -> ((r.getDouble(2), r.getDouble(4)))).toMap
    assert(out("A") === ((300.0, 300.0)))
    assert(out("B") === ((400.0, 400.0)))
  }
}
