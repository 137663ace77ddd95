package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.etl.Compaction

/** Pins the small-file compaction maintenance pass: file-count collapse,
  * exact content identity, target-size derivation from observed bytes,
  * and disjoint per-file key ranges under sorted compaction.
  */
class CompactionSpec extends SparkSpec {
  import spark.implicits._

  private def freshDir(prefix: String) =
    Files.createTempDirectory(prefix).toString

  test("compaction collapses a 64-file table; content is byte-identical") {
    val in = freshDir("compact-in")
    val out = freshDir("compact-out")
    val src = spark.range(10000)
      .select(col("id"), (col("id") % 97).as("k"),
        concat(lit("row-"), col("id")).as("payload"))
    src.repartition(64).write.mode("overwrite").parquet(in)

    // target = total input bytes / 2 -> expect exactly 2 output files
    val half = Compaction.compact(spark, in, out,
      targetBytes = parquetBytes(in) / 2 + 1)
    assert(half.inFiles == 64, s"fixture wrote ${half.inFiles} files")
    assert(half.outFiles == 2, s"expected 2 output files, got ${half.outFiles}")
    assert(half.rows == 10000)

    val back = spark.read.parquet(out)
    assert(back.exceptAll(src).isEmpty && src.exceptAll(back).isEmpty,
      "compaction must not change content")
  }

  test("sorted compaction yields disjoint per-file id ranges") {
    val in = freshDir("compact-sin")
    val out = freshDir("compact-sout")
    spark.range(5000).select(col("id"), (col("id") * 7 % 5000).as("v"))
      .repartition(32).write.mode("overwrite").parquet(in)

    val rep = Compaction.compact(spark, in, out,
      targetBytes = parquetBytes(in) / 4 + 1, sortCols = Seq("v"))
    assert(rep.outFiles >= 2, s"need >=2 files to check disjointness: $rep")

    // read each output file alone; its [min,max] v-range must not
    // overlap any other file's — that is what makes parquet min/max
    // stats skip whole files on point/range predicates
    val dir = new java.io.File(out)
    val ranges = dir.listFiles().filter(_.getName.endsWith(".parquet")).toSeq
      .map { f =>
        val r = spark.read.parquet(f.getAbsolutePath)
          .agg(min("v"), max("v")).head()
        (r.getLong(0), r.getLong(1))
      }.sortBy(_._1)
    ranges.sliding(2).foreach {
      case Seq((_, hi), (lo2, _)) =>
        assert(hi < lo2, s"overlapping file ranges: $ranges")
      case _ =>
    }
  }

  test("a table already at target is left as one file, rows preserved") {
    val in = freshDir("compact-one")
    val out = freshDir("compact-oneout")
    Seq((1, "a"), (2, "b")).toDF("id", "s")
      .repartition(8).write.mode("overwrite").parquet(in)
    val rep = Compaction.compact(spark, in, out) // default 128 MiB target
    assert(rep.outFiles == 1 && rep.rows == 2, s"$rep")
    assert(rep.outBytes < rep.inBytes,
      "collapsing 8 tiny files must shrink total bytes (fewer footers)")
  }

  private def parquetBytes(dir: String): Long =
    new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.length()).sum
}
