package graft

import org.apache.spark.sql.functions._

import graft.ops.MultimodalOps

class TextMultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("fingerprint is deterministic and content-sensitive") {
    val fp = SparkEntry.queries("q32_fingerprint")
    val a = fp(spark, sf).collect().map(r => (r.getLong(0), r.getLong(1)))
    val b = fp(spark, sf).collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(a.sameElements(b))
    assert(a.map(_._2).distinct.length > a.length / 2, "fingerprints should mostly differ")
    assert(a.forall { case (_, v) => v >= 0 && v < 1000003 })
  }

  test("token stats: totals consistent with per-doc quality counts") {
    val quality = SparkEntry.queries("q30_quality_score")(spark, sf)
    val totalTokens = quality.agg(sum("n_tokens")).first().getLong(0)
    val stats = SparkEntry.queries("q31_token_stats")(spark, sf)
    val statsTotal = stats.agg(sum("total_tokens")).first().getLong(0)
    assert(totalTokens == statsTotal)
  }

  test("lang id covers every document exactly once") {
    val conf = SparkEntry.queries("q29_lang_id")(spark, sf)
    val n = conf.agg(sum("n")).first().getLong(0)
    assert(n == spark.read.parquet(s"$sf/documents.parquet").count())
  }

  test("tfidf: exact linear-idf scores, tie ordering, null-text exclusion") {
    val docs = Seq(
      (1L, "apple banana apple"),
      (2L, "banana cherry"),
      (3L, "cherry cherry durian"),
      (4L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    val out = graft.ops.TextOps.tfidfTopTerms(docs, k = 2).collect()
    val byDoc = out.groupBy(_.getLong(0)).view
      .mapValues(_.sortBy(_.getInt(1))
        .map(r => (r.getString(2), r.getLong(3), r.getLong(4), r.getDouble(5)))
        .toSeq)
      .toMap
    // N = 3 live docs; df: apple 1, banana 2, cherry 2, durian 1
    assert(!byDoc.contains(4L), "null-text doc contributes nothing")
    assert(byDoc(1L) == Seq(("apple", 2L, 1L, 6.0), ("banana", 1L, 2L, 1.5)))
    // exact score ties break on term ascending — deterministic in both engines
    assert(byDoc(2L) == Seq(("banana", 1L, 2L, 1.5), ("cherry", 1L, 2L, 1.5)))
    assert(byDoc(3L) == Seq(("cherry", 2L, 2L, 3.0), ("durian", 1L, 1L, 3.0)))
  }

  test("multimodal stub decode: deterministic, partition-count invariant") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val media = MultimodalOps.mediaTable(docs)
    val once = MultimodalOps.decodeFeatures(spark, media)
      .collect().sortBy(_.doc_id)
    val again = MultimodalOps.decodeFeatures(spark, media.repartition(7))
      .collect().sortBy(_.doc_id)
    assert(once.sameElements(again), "decode must not depend on partitioning")
    assert(once.forall(f => f.width >= 16 && f.height >= 16 && f.channels == 3))
    // n_bytes matches the metadata column (binary plumbing is consistent)
    val metaBytes = media.select("doc_id", "n_bytes")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(once.forall(f => metaBytes(f.doc_id) == f.n_bytes))
  }

  test("multimodal meta magic_hex is the hex of the first 8 bytes") {
    val out = SparkEntry.queries("q37_multimodal_meta")(spark, sf)
      .limit(5).collect()
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .orderBy("doc_id").limit(5).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    out.foreach { r =>
      val expect = docs(r.getLong(0)).take(8).getBytes("UTF-8")
        .map(b => f"${b}%02X").mkString
      assert(r.getString(2) == expect)
    }
  }
}
