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
    fn: (SparkSession, String) => DataFrame) {
  // Scala object vals initialize in declaration order: a defs Seq that
  // forward-references an oracle-SQL val declared below it captures
  // Some(null), which escapes SparkEntry's Option guard and NPEs only
  // when Verify serializes oracle_sql.json. Fail at class-load instead.
  require(name != null && name.nonEmpty, "QueryDef.name must be non-empty")
  require(oracle == null || !oracle.contains(null),
    s"$name: oracle is Some(null) — forward reference in the defs object?")
}
