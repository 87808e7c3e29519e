package graft.text

import scala.collection.mutable.{ArrayBuffer, ListBuffer}

/** Recursive character text splitter (SURVEY.md §2.9 V1).
  *
  * Re-implements the splitting semantics the reference delegates to
  * LangChain's `RecursiveCharacterTextSplitter` (configured at
  * `chunk_cisa_kev.py:32-37`, `chunk_local_pdfs.py:37-42`,
  * `chunk_youtube_transcripts.py:37-42`: chunk_size=1000, chunk_overlap=150,
  * length = characters): try separators in order ("\n\n", "\n", " ", ""),
  * split on the first one present, keep the separator attached to the
  * following piece, greedily merge pieces up to `chunkSize`, and carry back
  * up to `chunkOverlap` trailing characters into the next chunk. Pieces not
  * smaller than `chunkSize` recurse on the remaining separators; the ""
  * separator (character-level) guarantees termination and a ≤ chunkSize
  * bound. Joined chunks are whitespace-stripped; empty results are dropped.
  *
  * Pure function of its inputs — deterministic across partitionings, safe to
  * run as a narrow map at any scale (no state, no shuffle).
  */
object Chunker {

  val DefaultSeparators: List[String] = List("\n\n", "\n", " ", "")
  val DefaultChunkSize: Int = 1000
  val DefaultOverlap: Int = 150

  def split(
      text: String,
      chunkSize: Int = DefaultChunkSize,
      chunkOverlap: Int = DefaultOverlap,
      separators: List[String] = DefaultSeparators): List[String] = {
    require(chunkSize > 0, "chunkSize must be positive")
    require(chunkOverlap >= 0 && chunkOverlap < chunkSize,
      "chunkOverlap must be in [0, chunkSize)")
    if (text == null || text.isEmpty) Nil
    else splitRec(text, separators, chunkSize, chunkOverlap)
  }

  private def splitRec(
      text: String,
      separators: List[String],
      size: Int,
      overlap: Int): List[String] = {
    // First separator that is "" or occurs in the text; the ones after it
    // are what oversized pieces recurse on.
    var separator = separators.lastOption.getOrElse("")
    var newSeps: List[String] = Nil
    var i = 0
    var found = false
    var rest = separators
    while (!found && rest.nonEmpty) {
      val s = rest.head
      if (s.isEmpty) { separator = s; found = true }
      else if (text.contains(s)) { separator = s; newSeps = rest.tail; found = true }
      rest = rest.tail
      i += 1
    }

    val pieces = splitKeepSeparator(text, separator)
    val out = ListBuffer[String]()
    val good = ListBuffer[String]()
    pieces.foreach { p =>
      if (p.length < size) good += p
      else {
        if (good.nonEmpty) { out ++= mergePieces(good.toList, size, overlap); good.clear() }
        if (newSeps.isEmpty) out += p
        else out ++= splitRec(p, newSeps, size, overlap)
      }
    }
    if (good.nonEmpty) out ++= mergePieces(good.toList, size, overlap)
    out.toList
  }

  /** Split on `sep`, keeping each separator occurrence attached to the piece
    * that follows it (so concatenating pieces reconstructs the input);
    * sep == "" splits into single characters. Empty pieces are dropped.
    */
  private[text] def splitKeepSeparator(text: String, sep: String): List[String] = {
    if (sep.isEmpty) return text.map(_.toString).toList
    val starts = ArrayBuffer[Int]()
    var i = text.indexOf(sep)
    while (i >= 0) { starts += i; i = text.indexOf(sep, i + sep.length) }
    if (starts.isEmpty) return if (text.isEmpty) Nil else List(text)
    val pieces = ListBuffer[String]()
    if (starts.head > 0) pieces += text.substring(0, starts.head)
    var j = 0
    while (j < starts.length) {
      val end = if (j + 1 < starts.length) starts(j + 1) else text.length
      pieces += text.substring(starts(j), end)
      j += 1
    }
    pieces.filter(_.nonEmpty).toList
  }

  /** Greedy merge of sub-chunkSize pieces: flush when the next piece would
    * overflow, then pop leading pieces until at most `overlap` characters
    * remain (the carried-back overlap) and the next piece fits.
    */
  private[text] def mergePieces(pieces: List[String], size: Int, overlap: Int): List[String] = {
    val docs = ListBuffer[String]()
    val current = ListBuffer[String]()
    var total = 0
    def flushJoin(): Unit = {
      val joined = current.mkString.trim
      if (joined.nonEmpty) docs += joined
    }
    pieces.foreach { d =>
      val len = d.length
      if (total + len > size) {
        if (current.nonEmpty) {
          flushJoin()
          while (total > overlap || (total + len > size && total > 0)) {
            total -= current.head.length
            current.remove(0)
          }
        }
      }
      current += d
      total += len
    }
    flushJoin()
    docs.toList
  }
}
