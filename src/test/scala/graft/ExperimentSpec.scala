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
