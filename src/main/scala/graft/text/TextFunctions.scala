package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Scalar text functions (SURVEY.md §2.8 F3, F5-F8, F12-F14) re-expressed
  * as codegen'd column expressions — no UDFs.
  */
object TextFunctions {

  /** F5: filename sanitization (`scrape_youtube_metadata.py:56-73`):
    * strip  \ / * ? : " < > |  characters, collapse whitespace runs to one
    * space, trim, clamp to `maxLen` characters. The reference preserves a
    * leading '@'; stripping never removes it, so no special case is
    * needed beyond the character class.
    */
  def sanitizeFilename(c: Column, maxLen: Int = 100): Column =
    substring(trim(regexp_replace(
      regexp_replace(c, """[\\/*?:"<>|]""", ""), "\\s+", " ")), 1, maxLen)

  /** F6: channel-name extraction from YouTube-style URLs
    * (`scrape_youtube_metadata.py:75-96`): try @handle, /c/name, /user/name,
    * /channel/id in order, else the last non-empty path segment.
    */
  def extractChannelName(url: Column): Column = {
    def grab(pattern: String): Column =
      nullif(regexp_extract(url, pattern, 1), lit(""))
    coalesce(
      grab("""@([A-Za-z0-9_.-]+)"""),
      grab("""/c/([^/?#]+)"""),
      grab("""/user/([^/?#]+)"""),
      grab("""/channel/([^/?#]+)"""),
      nullif(element_at(filter(split(regexp_replace(url, """[?#].*$""", ""), "/"),
        s => length(s) > 0), -1), lit("")))
  }

  /** F7: archive collection id from archive.org/details/<id> URLs
    * (`download_ia_collection.py:25-36`).
    */
  def extractCollectionId(url: Column): Column =
    nullif(regexp_extract(url, """archive\.org/details/([^/?#]+)""", 1), lit(""))

  /** F3 + T4: display snippet — newlines to spaces, first `n` chars
    * (`query_rag_database.py:193`).
    */
  def snippet(c: Column, n: Int = 250): Column =
    substring(regexp_replace(c, "\n", " "), 1, n)

  /** F8: reference date normalization yyyyMMdd → DateType
    * (`scrape_youtube_metadata.py:215-218`).
    */
  def parseCompactDate(c: Column): Column = to_date(c, "yyyyMMdd")

  /** F12: fixed-point score display without float-formatting ambiguity:
    * integer milli/decimilli points (`f"{score:.4f}"` analog).
    */
  def scoreMilli(c: Column): Column = round(c * 1000).cast("int")
}
