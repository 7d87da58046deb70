package graft.tmp

import java.nio.file.{Files, Paths}

/** Scratch: dump the full oracleSql map as JSON (no Spark) so
  * tools/oracle_times.py can time the DuckDB leg of the gate alone. */
object DumpOracles {
  def main(args: Array[String]): Unit = {
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = graft.SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(args.headOption.getOrElse("/tmp/oracles.json")), json)
    println(s"[dump] ${graft.SparkEntry.oracleSql.size} oracles")
  }
}
