package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.graft.GraftExtensions
import graft.text.Chunker

class GraftExtensionsSpec extends SparkSpec {

  GraftExtensions.register(spark)

  test("nfc_normalize is callable from SQL and composes a decomposed accent") {
    // NOT chr(769): Spark's chr wraps mod 256 (chr(769) = U+0001) —
    // the SQL parser's unicode escape carries the combining acute intact
    val r = spark.sql(
      "SELECT nfc_normalize('Cafe\\u0301') AS n").head()
    assert(r.getString(0) === "Caf\u00E9")
  }

  test("graft_dot is callable from SQL and matches the hand dot product") {
    val r = spark.sql(
      "SELECT graft_dot(array(1.0D, 2.0D, 3.0D), array(4.0D, 5.0D, 6.0D)) AS d")
      .head().getDouble(0)
    assert(r === 32.0)
  }

  test("graft_dot participates in whole-stage codegen") {
    val df = spark.sql(
      "SELECT graft_dot(array(CAST(id AS DOUBLE)), array(2.0D)) AS d FROM range(10)")
    val plan = df.queryExecution.executedPlan.toString
    // "*(n)" prefixes mark operators inside a WholeStageCodegen stage
    assert(plan.contains("*(1) Project [graft_dot"),
      s"graft_dot fell out of whole-stage codegen:\n$plan")
    assert(df.collect().map(_.getDouble(0)).sum === 90.0) // 2 * (0+..+9)
  }

  test("chunk_split generates (pos, total, chunk) rows from SQL") {
    val text = "aaaa bbbb cccc dddd"
    val rows = spark.sql(
      s"SELECT chunk_split('$text', 9, 2) FROM (SELECT 1)").collect()
    val expected = Chunker.split(text, 9, 2)
    assert(rows.length === expected.length)
    rows.zipWithIndex.foreach { case (r, i) =>
      assert(r.getInt(0) === i)
      assert(r.getInt(1) === expected.length)
      assert(r.getString(2) === expected(i))
    }
  }

  test("chunk_split rejects non-literal size arguments") {
    intercept[Exception] {
      spark.sql("SELECT chunk_split('abc', CAST(rand() * 10 AS INT), 1)").collect()
    }
  }

  test("the extensions class injects into a fresh session (config path)") {
    val prevActive = SparkSession.getActiveSession
    val prevDefault = SparkSession.getDefaultSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      // reuses the shared SparkContext; extensions apply per-session
      val s2 = SparkSession.builder()
        .master("local[2]")
        .withExtensions(new org.apache.spark.sql.graft.GraftExtensions)
        .getOrCreate()
      val r = s2.sql("SELECT graft_dot(array(1.0D), array(3.0D))").head().getDouble(0)
      assert(r === 3.0)
    } finally {
      prevActive.foreach(SparkSession.setActiveSession)
      prevDefault.foreach(SparkSession.setDefaultSession)
    }
  }
}
