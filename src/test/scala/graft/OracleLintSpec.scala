package graft

import org.scalatest.funsuite.AnyFunSuite

/** Lint over the registered DuckDB oracles — the r7 red
  * (`minhash_incremental_dupes`) came from three escaping regimes living
  * in one file: a regex written `\\p{L}` inside a PLAIN `"""` string
  * compiles to a literal backslash-backslash, which DuckDB's regex engine
  * reads as an escaped backslash followed by `p` — silently matching
  * nothing. The rule: plain `"""` strings write regex escapes SINGLE
  * (`\p{L}`); only s-interpolated strings double them (and none of the
  * registered oracles interpolate). So after Scala compilation NO oracle
  * may contain a doubled backslash — asserting that here catches the
  * whole bug class at test cost instead of a red driver row.
  */
class OracleLintSpec extends AnyFunSuite {

  test("no registered oracle contains a literal doubled backslash") {
    val offenders = SparkEntry.oracleSql.collect {
      case (name, sql) if sql.contains("\\\\") => name
    }.toSeq.sorted
    assert(offenders.isEmpty,
      s"oracles carrying a doubled backslash after compilation: " +
        s"${offenders.mkString(", ")} — regex escapes must reach DuckDB " +
        "single (write \\p{L} once in plain \"\"\" strings; an " +
        "s-interpolated oracle doubles them and the regex breaks)")
  }

  test("every query has an oracle and every oracle a query") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((q -- o).isEmpty, s"queries without an oracle: ${(q -- o).toSeq.sorted}")
    assert((o -- q).isEmpty, s"oracles without a query: ${(o -- q).toSeq.sorted}")
  }

  // The README's stated board size rotted once (r12 shipped "239" after
  // the 240th query landed). Derive the doc numbers from the registry so
  // the count can never drift again: every literal "N named queries" /
  // "passes N/N" in README.md must equal SparkEntry.queries.size.
  test("README query counts match SparkEntry.queries.size") {
    val n = SparkEntry.queries.size
    val readme = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("README.md")),
      java.nio.charset.StandardCharsets.UTF_8)
    val stated = ("""(\d+) named queries""".r.findAllMatchIn(readme)
        .map(_.group(1).toInt) ++
      """passes (\d+)/(\d+)""".r.findAllMatchIn(readme)
        .flatMap(m => Seq(m.group(1).toInt, m.group(2).toInt))).toSeq
    assert(stated.nonEmpty, "README.md no longer states the board size")
    assert(stated.forall(_ == n),
      s"README.md states board sizes $stated but SparkEntry.queries has $n")
  }
}
