package graft

import java.nio.file.{Files, Paths}

/** Dev CLI (test scope — ships nothing in the production tree): dump the
  * full oracleSql map as JSON so the DuckDB leg of the gate can be timed
  * or iterated on without running graft.Verify's Spark leg.
  *
  *   sbt "Test/runMain graft.DumpOraclesTool /tmp/oracles.json"
  *
  * The round-close oracle-budget guard itself no longer needs this —
  * tools/compare.py times every oracle on each gate run and rewrites the
  * sweep table in tools/ORACLE_TIMES.md.
  */
object DumpOraclesTool {
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
