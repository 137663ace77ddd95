package graft

import org.apache.spark.sql.functions._

/** Smoke + spot checks for every graded query on sf0.001. The graded
  * correctness gate is the driver's DuckDB hash-compare; these tests keep
  * `sbt test` meaningful without DuckDB: schemas resolve, plans execute,
  * and hand-checkable invariants hold.
  */
class QueriesSpec extends SparkSpec {

  // Queries whose result may legitimately be empty on real (dup-free) data.
  private val mayBeEmpty = Set("q26_ngram_jaccard")

  SparkEntry.all.foreach { q =>
    test(s"${q.name} runs on sf0.001") {
      val df = q.fn(spark, sf)
      val n = df.count()
      if (!mayBeEmpty(q.name)) assert(n > 0, s"${q.name} returned no rows")
    }
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("q54 salted join is row-identical to the plain join") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val o = spark.read.parquet(s"$sf/orders.parquet")
    val salted = graft.ops.ExtendedOps.saltedOrderJoin(li, o, salt = 8)
    val plain = li.join(o, li("l_orderkey") === o("o_orderkey"))
    assert(salted.count() == plain.count())
    assert(salted.except(plain).isEmpty && plain.except(salted).isEmpty)
  }

  test("bloom prefilter is a superset of matches, prunes, and the pruned " +
    "semi join is row-identical to the plain semi join") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val keys = spark.read.parquet(s"$sf/orders.parquet")
      .where(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey"))
    val pruned = graft.ops.ExtendedOps.bloomPrunedSemiJoin(li, "l_orderkey", keys)
    val plain = li.join(keys.withColumnRenamed("o_orderkey", "l_orderkey"),
      Seq("l_orderkey"), "left_semi")
    // exact equality after the FP-killing semi join
    assert(pruned.except(plain).isEmpty && plain.except(pruned).isEmpty)
    // and the bloom phase alone actually pruned: candidate count sits
    // between the true match count and the full fact count
    val n = math.max(keys.count(), 64L)
    val bf = keys.stat.bloomFilter("o_orderkey", n, 0.01)
    val bc = spark.sparkContext.broadcast(bf)
    val might = udf((k: java.lang.Long) => k != null && bc.value.mightContainLong(k.longValue))
    val candidates = li.where(might(col("l_orderkey"))).count()
    val matches = plain.count()
    val total = li.count()
    assert(candidates >= matches, "bloom filters have no false negatives")
    assert(candidates < total, s"prefilter must prune ($candidates vs $total)")
  }

  test("every query name has unique entry and oracle keys subset queries") {
    val names = SparkEntry.all.map(_.name)
    assert(names.distinct.size == names.size)
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  test("q09 flagship: 3 return flags, ordini sums to lineitem count") {
    val df = SparkEntry.queries("q09_flagship_category")(spark, sf)
    val rows = df.collect()
    assert(rows.length == 3)
    val total = rows.map(_.getAs[Long]("ordini")).sum
    val liCount = spark.read.parquet(s"$sf/lineitem.parquet").count()
    assert(total == liCount)
    // sorted by fatturato desc
    val fatt = rows.map(_.getAs[Double]("fatturato"))
    assert(fatt.sameElements(fatt.sorted.reverse))
  }

  test("q15 KPI stack: 4 metrics, revenue consistent with q09 sum") {
    val kpi = SparkEntry.queries("q15_kpi_summary")(spark, sf).collect()
    assert(kpi.length == 4)
    val revenue = kpi.find(_.getString(0) == "total_revenue").get.getDouble(1)
    val q09sum = SparkEntry.queries("q09_flagship_category")(spark, sf)
      .agg(sum("fatturato")).first().getDouble(0)
    assert(math.abs(revenue - q09sum) < 0.05)
  }

  test("q20 schema merge: both legacy and new columns present, disjoint nulls") {
    val df = SparkEntry.queries("q20_schema_merge")(spark, sf)
    assert(df.columns.toSeq == Seq("o_orderkey", "fatturato_medio", "ordine_medio"))
    val bothNull = df.where(col("fatturato_medio").isNull && col("ordine_medio").isNull).count()
    val bothSet = df.where(col("fatturato_medio").isNotNull && col("ordine_medio").isNotNull).count()
    assert(bothNull == 0 && bothSet == 0)
  }

  test("minhashClusters leaves no cached frames behind (library hygiene)") {
    spark.catalog.clearCache()
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val out = graft.ops.DedupOps.minhashClusters(docs)
    assert(out.count() == docs.count())
    // every intermediate cache (banded scan, symmetric edges, 1-hop
    // labels) must be unpersisted before return — a library caller in a
    // long-lived session must not accumulate storage per invocation
    assert(spark.sharedState.cacheManager.isEmpty,
      "minhashClusters left frames in the CacheManager after returning")
  }

  test("q39 salted agg equals plain groupBy") {
    import graft.util.Tables._
    val li = t(spark, sf, "lineitem")
    val plain = li.groupBy(col("l_suppkey"))
      .agg(moneySum(revenue).as("revenue"), count(lit(1)).as("n_items"))
    val salted = SparkEntry.queries("q39_salted_agg")(spark, sf)
    assert(salted.except(plain).isEmpty && plain.except(salted).isEmpty)
  }
}
