package graft.etl

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Small-file compaction — the table-maintenance pass every 100 TB lake
  * needs. Streaming ingest and per-batch appends leave thousands of
  * KB-sized parquet files per partition; each file costs a scan task, a
  * footer read, and a name-node round trip, so at cluster scale a
  * 10,000-file day kills scan throughput long before data volume does.
  *
  * The pass is a pure rewrite: read → repartition to ceil(bytes/target)
  * output files → write. File sizing is derived from the table's OWN
  * observed bytes (compressed parquet size on disk), not a row-count
  * guess, so heavily compressed tables still land near the target. With
  * `sortCols` the rewrite range-partitions + sorts-within-partitions so
  * each output file covers a disjoint key range — parquet min/max
  * row-group stats then let later point/range scans skip whole files
  * (the poor man's zone map; see LayoutOps Z-order for the 2-D variant).
  *
  * Scale shape: one shuffle (round-robin or range), no driver data
  * paths — file listing is metadata-only. At 100 TB you run this per
  * partition-predicate, not whole-table; the API takes any input path,
  * so a date-partition directory is the natural unit.
  */
object Compaction {

  /** What the pass did; `rows` is the invariant both sides must keep. */
  final case class Report(
      inFiles: Long, inBytes: Long, outFiles: Long, outBytes: Long,
      rows: Long)

  private def parquetFiles(spark: SparkSession, dir: String): Seq[(String, Long)] = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(p).toSeq
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
      .map(s => (s.getPath.toString, s.getLen))
  }

  /** Compact `inDir` (a parquet directory) into `outDir` with about
    * `targetBytes` per output file. When `sortCols` is given the output
    * is additionally range-clustered on those columns so per-file
    * min/max stats are disjoint.
    */
  def compact(
      spark: SparkSession,
      inDir: String,
      outDir: String,
      targetBytes: Long = 128L << 20,
      sortCols: Seq[String] = Nil): Report = {
    require(targetBytes > 0, s"targetBytes must be positive, got $targetBytes")
    val in = parquetFiles(spark, inDir)
    val inBytes = in.map(_._2).sum
    val nOut = math.max(1L, (inBytes + targetBytes - 1) / targetBytes).toInt

    val df = spark.read.parquet(inDir)
    val out =
      if (sortCols.nonEmpty) {
        val cols = sortCols.map(col)
        df.repartitionByRange(nOut, cols: _*).sortWithinPartitions(cols: _*)
      } else df.repartition(nOut)
    out.write.mode("overwrite").parquet(outDir)

    val written = parquetFiles(spark, outDir)
    Report(in.size.toLong, inBytes, written.size.toLong,
      written.map(_._2).sum, spark.read.parquet(outDir).count())
  }
}
