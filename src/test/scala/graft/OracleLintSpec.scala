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
}
