package graft.util

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Table loaders plus oracle-safe money arithmetic.
  *
  * Money values in the test data sit on a 2-decimal grid but are stored
  * as doubles. A double SUM is partition-order dependent, so every money
  * aggregate goes through an exact DECIMAL(18,4) cast first:
  *   - the cast is unambiguous (the true value lies on a 4dp grid and the
  *     double is within ~1e-12 of it, far from any rounding boundary),
  *   - decimal sums are exact and order-independent,
  *   - the final ROUND(.., 2) + cast back to double is then bit-identical
  *     between Spark and the DuckDB oracle. See SURVEY.md §7.3.
  */
object Tables {

  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Register every test table as a temp view so `spark.sql` text can be
    * shared verbatim with the DuckDB oracle.
    */
  def withViews(spark: SparkSession, dir: String, names: String*): Unit =
    names.foreach(n => t(spark, dir, n).createOrReplaceTempView(n))

  /** Exact money representation for aggregation. */
  def money(c: Column): Column = c.cast(DecimalType(18, 4))

  /** Order-independent SUM of a money expression, rounded 2dp, as double. */
  def moneySum(c: Column): Column = round(sum(money(c)), 2).cast("double")

  /** Order-independent AVG: exact decimal sum, then double division. */
  def moneyAvg(c: Column): Column =
    round(sum(money(c)).cast("double") / count(lit(1)), 2)

  /** lineitem net revenue (reference `quantity * price` stand-in,
    * FIXTURES.md §B.1).
    */
  val revenue: Column = col("l_extendedprice") * (lit(1.0) - col("l_discount"))

  // ---- DuckDB oracle SQL fragments matching the helpers above ----
  val REV = "l_extendedprice * (1.0 - l_discount)"
  def sqlMoneySum(e: String): String =
    s"CAST(ROUND(SUM(CAST($e AS DECIMAL(18,4))), 2) AS DOUBLE)"
  def sqlMoneyAvg(e: String): String =
    s"ROUND(CAST(SUM(CAST($e AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*), 2)"
}
