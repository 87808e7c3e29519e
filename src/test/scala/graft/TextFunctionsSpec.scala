package graft

import graft.text.TextFunctions
import org.apache.spark.sql.functions._

class TextFunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("F5: filename sanitization strips, collapses, clamps, keeps @") {
    val rows = Seq(
      """bad\file/name*with?chars:"<>|end""",
      "  lots   of \t spaces  ",
      "@Handle Name",
      "x" * 200)
      .toDF("s").select(TextFunctions.sanitizeFilename(col("s"), 100).as("o"))
      .as[String].collect()
    assert(rows(0) === "badfilenamewithcharsend")
    assert(rows(1) === "lots of spaces")
    assert(rows(2) === "@Handle Name")
    assert(rows(3).length === 100)
  }

  test("F6: channel extraction over all URL forms with path fallback") {
    val cases = Seq(
      "https://www.youtube.com/@SomeHandle/videos" -> "SomeHandle",
      "https://youtube.com/c/ChannelName" -> "ChannelName",
      "https://youtube.com/user/OldStyle" -> "OldStyle",
      "https://youtube.com/channel/UCabc123" -> "UCabc123",
      "https://youtube.com/somepath/last?x=1" -> "last")
    val got = cases.map(_._1).toDF("url")
      .select(TextFunctions.extractChannelName(col("url")).as("c"))
      .as[String].collect()
    assert(got.toSeq === cases.map(_._2))
  }

  test("F7: archive collection id") {
    val got = Seq("https://archive.org/details/my-collection_01?tab=about")
      .toDF("u").select(TextFunctions.extractCollectionId(col("u"))).as[String].head()
    assert(got === "my-collection_01")
  }

  test("F3/T4: snippet replaces newlines and truncates") {
    val got = Seq("line one\nline two\nline three")
      .toDF("t").select(TextFunctions.snippet(col("t"), 17)).as[String].head()
    assert(got === "line one line two")
  }

  test("F8: compact date parsing") {
    val got = Seq("20240131").toDF("d")
      .select(TextFunctions.parseCompactDate(col("d")).cast("string")).as[String].head()
    assert(got === "2024-01-31")
  }

  test("scalar_functions driver query: spot-check one row") {
    val r = SparkEntry.queries("scalar_functions")(spark, sf)
      .filter(col("o_orderkey") === 1).head()
    assert(r.getAs[Long]("order_year") >= 1992L && r.getAs[Long]("order_year") <= 1998L)
    assert(r.getAs[Int]("priority_rank") >= 1 && r.getAs[Int]("priority_rank") <= 5)
    assert(r.getAs[String]("status_priority").contains("|"))
  }
}
