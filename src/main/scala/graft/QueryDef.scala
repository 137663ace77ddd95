package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One graded query: a Spark-native implementation plus (when the
  * semantics are ANSI-SQL-expressible) an equivalent DuckDB oracle
  * query over the same parquet tables. Column names and row order
  * must match between the two (SURVEY.md §7.3).
  */
final case class QueryDef(
    name: String,
    oracle: Option[String],
    fn: (SparkSession, String) => DataFrame)
