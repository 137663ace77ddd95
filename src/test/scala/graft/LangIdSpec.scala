package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Label-accuracy grading for the q29 language-ID heuristic. The graded
  * corpus shares one vocabulary across langs (so q29's oracle grades
  * marker-scoring logic parity only); here a fixture with DISJOINT
  * per-language marker vocabularies — where the true label is knowable —
  * pins that the classifier actually identifies languages: >= 95%
  * accuracy, including docs carrying one foreign-marker occurrence of
  * noise.
  */
class LangIdSpec extends SparkSpec {
  import spark.implicits._

  test("q29 lang-ID achieves >= 95% label accuracy on disjoint marker vocabularies") {
    // the classifier's marker words, one per language (TextOps.langIdSql)
    val markers = Seq("en" -> "the", "de" -> "table", "fr" -> "fast",
      "es" -> "slow", "zh" -> "merge")
    val filler = Seq("alpha", "beta", "gamma", "delta", "epsilon", "zeta")
    val rows = for {
      ((lang, m), li) <- markers.zipWithIndex
      i <- 0 until 40
    } yield {
      // own marker 3x; every 5th doc also carries ONE foreign marker as
      // noise (3 > 1 keeps the argmax correct — accuracy stays 100%)
      val noise =
        if (i % 5 == 0) {
          val others = markers.collect { case (l, w) if l != lang => w }
          Seq(others(i % others.size))
        } else Seq.empty[String]
      val toks = Seq(m, filler(i % 6), m, filler((i + 1) % 6), m) ++
        noise ++ Seq(filler((i + 2) % 6))
      (li * 1000L + i, lang, toks.mkString(" "))
    }
    val dir = Files.createTempDirectory("graft-langid").toString
    rows.toDF("doc_id", "lang", "text")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val out = SparkEntry.queries("q29_lang_id")(spark, dir).cache()
    try {
      val total = out.agg(sum("n")).head.getLong(0)
      val correct = out.where(col("lang") === col("predicted"))
        .agg(coalesce(sum("n"), lit(0L))).head.getLong(0)
      assert(total == 200L)
      assert(correct.toDouble / total >= 0.95,
        s"lang-ID accuracy $correct/$total below 95%")
    } finally out.unpersist()
  }
}
