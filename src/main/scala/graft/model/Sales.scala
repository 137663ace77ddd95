package graft.model

import org.apache.spark.sql.types._

/** Pinned schemas for the reference sales domain (SURVEY.md §1.2,
  * FIXTURES.md §A). The reference lets PySpark infer these from dicts
  * (ref 01:107); the rebuild declares them so ingestion is deterministic.
  */
final case class BronzeOrder(
    order_id: String,
    customer_id: String,
    product_name: String,
    category: String,
    quantity: Long,
    price: Double,
    order_date: String, // dd-MM-yyyy, parsed to DateType in silver
    city: String,
    payment_method: String)

object Sales {
  val categories = Seq("Elettronica", "Abbigliamento", "Casa", "Sport", "Libri")

  /** 5 products per category (ref 01:48-54). */
  val products: Map[String, Seq[String]] = Map(
    "Elettronica" -> Seq("Smartphone", "Laptop", "Cuffie", "Tablet", "Smartwatch"),
    "Abbigliamento" -> Seq("T-Shirt", "Jeans", "Giacca", "Scarpe", "Felpa"),
    "Casa" -> Seq("Lampada", "Cuscino", "Tappeto", "Pentola", "Specchio"),
    "Sport" -> Seq("Pallone", "Racchetta", "Tuta", "Borraccia", "Tappetino"),
    "Libri" -> Seq("Romanzo", "Saggio", "Fumetto", "Manuale", "Poesia"))

  val cities = Seq("Milano", "Roma", "Napoli", "Torino", "Bologna", "Firenze", "Palermo")
  val paymentMethods = Seq("Carta di credito", "Contanti", "PayPal")

  val bronzeSchema: StructType = StructType(Seq(
    StructField("order_id", StringType, nullable = false),
    StructField("customer_id", StringType, nullable = false),
    StructField("product_name", StringType, nullable = false),
    StructField("category", StringType, nullable = false),
    StructField("quantity", LongType, nullable = false),
    StructField("price", DoubleType, nullable = false),
    StructField("order_date", StringType, nullable = false),
    StructField("city", StringType, nullable = false),
    StructField("payment_method", StringType, nullable = false)))

  val bronzeTable = "bronze_sales_raw"
  val silverTable = "silver_sales_clean"
  val goldCategoryTable = "gold_category_analytics"
  val goldCityTable = "gold_city_analytics"
  val goldKpiTable = "gold_kpi_summary"
}
