package graft.gen

import java.time.LocalDate
import java.time.format.DateTimeFormatter

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

import graft.model.{BronzeOrder, Sales}

/** Seeded synthetic order generator (SURVEY §2.1 S4, ref 01:33-76 and
  * 03:29-68). The reference generator is unseeded and wall-clock anchored;
  * the rebuild takes an explicit seed + anchor date so golden tests are
  * stable (SURVEY §7.5).
  */
object SalesGen {

  private val fmt = DateTimeFormatter.ofPattern("dd-MM-yyyy")

  /** Initial batch: n orders, 200 customers, dates anchor-[1,90] days
    * (ref 01:34-36, 01:58-76).
    */
  def initialBatch(spark: SparkSession, n: Int = 1000, seed: Long = 42L,
      anchor: LocalDate = LocalDate.of(2025, 8, 8)): Dataset[BronzeOrder] = {
    import spark.implicits._
    orders(n, seed, startId = 1, maxCustomer = 200,
      dateOf = rng => anchor.minusDays(1L + rng.nextInt(90))).toDS()
  }

  /** Daily increment: n orders, 300 customers, all on a fixed day, ids
    * continuing from the bronze high-watermark (ref 03:29-68).
    */
  def dailyBatch(spark: SparkSession, day: LocalDate, startId: Int,
      n: Int = 15, seed: Long = 42L): Dataset[BronzeOrder] = {
    import spark.implicits._
    orders(n, seed, startId, maxCustomer = 300, dateOf = _ => day).toDS()
  }

  private def orders(n: Int, seed: Long, startId: Int, maxCustomer: Int,
      dateOf: scala.util.Random => LocalDate): Seq[BronzeOrder] = {
    val rng = new scala.util.Random(seed + startId)
    (0 until n).map { i =>
      val category = Sales.categories(rng.nextInt(Sales.categories.size))
      val product = Sales.products(category)(rng.nextInt(5))
      BronzeOrder(
        order_id = f"ORD_${startId + i}%04d",
        customer_id = f"CUST_${1 + rng.nextInt(maxCustomer)}%03d",
        product_name = product,
        category = category,
        quantity = 1L + rng.nextInt(4),
        price = math.rint((10 + rng.nextDouble() * 490) * 100) / 100,
        order_date = dateOf(rng).format(fmt),
        city = Sales.cities(rng.nextInt(Sales.cities.size)),
        payment_method = Sales.paymentMethods(rng.nextInt(3)))
    }
  }
}
