package graft.tools

import java.nio.file.{Files, Paths}

/** Dump the FULL oracle_sql.json (every graded query's DuckDB oracle)
  * without executing any query — input for tools/oracle_check.py's
  * DESCRIBE-based output-type pre-flight, which must sweep the whole
  * corpus, not just the queries a VerifySome run happened to touch.
  * Usage: runMain graft.tools.DumpOracles <outDir>
  */
object DumpOracles {
  def main(args: Array[String]): Unit = {
    val outDir = if (args.nonEmpty) args(0) else "/tmp/graft-oracles"
    Files.createDirectories(Paths.get(outDir))
    val json = graft.SparkEntry.oracleSql.toSeq.sortBy(_._1)
      .map { case (k, v) =>
        "\"" + k + "\": " + "\"" + v.flatMap {
          case '"'  => "\\\""
          case '\\' => "\\\\"
          case '\n' => "\\n"
          case '\r' => "\\r"
          case '\t' => "\\t"
          case c if c < ' ' => f"\\u${c.toInt}%04x"
          case c => c.toString
        } + "\""
      }
      .mkString("{\n", ",\n", "\n}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    println(s"wrote ${graft.SparkEntry.oracleSql.size} oracles to $outDir/oracle_sql.json")
  }
}
