package graft

/** Writes `SparkEntry.oracleSql` as JSON (the `oracle_sql.json` shape
  * `graft.Verify` emits) WITHOUT running any query — feeds
  * `tools/pair_duckdb.py` when only the DuckDB side needs refreshing.
  * Usage: `runMain graft.DumpOracle /path/to/oracle_sql.json`.
  */
object DumpOracle {
  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("/tmp/oracle_sql.json")
    def esc(s: String): String = s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }
    val json = SparkEntry.oracleSql.toSeq.sortBy(_._1)
      .map { case (k, v) => s""""${esc(k)}": "${esc(v)}"""" }
      .mkString("{\n", ",\n", "\n}")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(out), json)
    println(s"[dump-oracle] wrote ${SparkEntry.oracleSql.size} oracle entries to $out")
  }
}
