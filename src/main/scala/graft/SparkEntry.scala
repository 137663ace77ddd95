package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.ops._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Aggregates every implemented operator (SURVEY §2 reference surface +
  * §7.4 training-data-pipeline extensions) into the graded query map.
  */
object SparkEntry {

  val all: Seq[QueryDef] =
    ReferenceOps.defs ++ DedupOps.defs ++ SimilarityOps.defs ++
      TextOps.defs ++ EventOps.defs ++ MultimodalOps.defs ++
      ExtendedOps.defs ++ SampleOps.defs ++ InvariantOps.defs ++
      CurationOps.defs ++ ShapeOps.defs ++ MiningOps.defs ++
      RelationalOps.defs ++ CorpusStatsOps.defs ++ StatOps.defs ++
      LayoutOps.defs ++ WarehouseOps.defs ++ TimeSeriesOps.defs ++
      GraphOps.defs ++ AuditOps.defs ++ ScaleShapeOps.defs ++
      EmbedStatsOps.defs ++ ExperimentOps.defs ++ SketchOps.defs ++
      VocabModelOps.defs ++ StreamReplayOps.defs ++ LinkageOps.defs ++
      SelectionOps.defs ++ AnnIndexOps.defs ++ TakedownOps.defs ++
      graft.sources.TextFormats.defs ++
      graft.sources.ColumnarFormats.defs ++
      graft.sources.XmlFormat.defs ++
      graft.sources.CorruptRecords.defs

  /** Flagship query (A3 gold-category aggregate, SURVEY §7.2) on sf=0.001;
    * driver smoke-checks rows>0.
    */
  def entry(spark: SparkSession): DataFrame =
    queries("q09_flagship_category")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2 / §7.4. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for ops whose logic is engine-side
    * (seeded RNG, hash families, LSH, stub decode) — those are pinned by
    * ScalaTest specs instead.
    */
  def oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(sql => q.name -> sql)).toMap
}
