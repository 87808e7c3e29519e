package graft.ingest

/** Minimal pure-Scala PDF text extractor (SURVEY.md §2.1 S4; replaces the
  * round-1 UTF-8 stub). Mirrors the reference's extraction semantics
  * (`chunk_local_pdfs.py:138-158`): per-page text in reading order (sorted
  * by descending y, then x), pages joined with "\n\n", and document
  * metadata (/Title /Author /Subject /Keywords) captured from the Info
  * dictionary.
  *
  * Scope: uncompressed or FlateDecode content streams, literal `(…)` and
  * hex `<…>` strings, simple (Latin-1-ish) and UTF-16BE string encodings,
  * page tree via /Root → /Pages → /Kids, PDF 1.5+ object streams (/ObjStm
  * compressed objects — the modern-writer layout), /ToUnicode CMaps
  * (bfchar + bfrange, 1- and 2-byte codes) resolved through each page's
  * /Resources → /Font chain with /Parent inheritance, and a
  * Type0/Identity-H fallback (2-byte CIDs read as UTF-16 code units when
  * no ToUnicode table exists). Encrypted files are DETECTED (the trailer's
  * /Encrypt entry) and reported as a typed `encrypted` status rather than
  * silently corrupt-skipped — decryption itself stays out of scope, as do
  * filters beyond Flate (DCT/JBIG2 images are never text); out-of-scope
  * files return None and flow into the corrupt-file skip path, exactly
  * like the reference's per-file try/except.
  *
  * Everything here is a driver-free pure function: it runs inside the
  * binaryFile scan's narrow map, one call per file, no shuffle.
  */
object PdfText {

  final case class PdfDoc(
    pages: Seq[String],
    title: Option[String],
    author: Option[String],
    subject: Option[String],
    keywords: Option[String]) {
    def text: String = pages.mkString("\n\n")
  }

  /** /Encrypt in a trailer dictionary (or the xref-stream dict that
    * replaces it in PDF 1.5+ layouts): the document's strings and streams
    * are RC4/AES-encrypted and any "text" we'd extract would be
    * ciphertext. Both layouts put the dict near EOF, so only the tail is
    * scanned — a content stream that merely CONTAINS the bytes
    * "/Encrypt" earlier in the file cannot false-positive.
    */
  private val EncryptRe = """/Encrypt\s+\d+\s+\d+\s+R|/Encrypt\s*<<""".r

  def isEncrypted(bytes: Array[Byte]): Boolean = {
    if (bytes == null || bytes.length < 8) return false
    val tail = new String(bytes, math.max(0, bytes.length - 4096),
      math.min(bytes.length, 4096), java.nio.charset.StandardCharsets.ISO_8859_1)
    EncryptRe.findFirstIn(tail).isDefined
  }

  /** Typed per-file extraction status — the reference records a status
    * string per fetched item (`scrape_youtube_metadata.py:45-48`) instead
    * of folding every failure into one skip bucket; this mirrors that for
    * the PDF scan: `ok`, `encrypted` (parseable but ciphertext — needs a
    * password, not a better parser), `not_pdf`, or `corrupt`.
    */
  def extractionStatus(bytes: Array[Byte]): String = {
    if (bytes == null || bytes.length < 8) "corrupt"
    else if (!new String(bytes, 0, 8,
        java.nio.charset.StandardCharsets.ISO_8859_1).startsWith("%PDF-")) "not_pdf"
    else if (isEncrypted(bytes)) "encrypted"
    else if (extract(bytes).isDefined) "ok"
    else "corrupt"
  }

  /** Extract text + metadata; None = not a parseable PDF (corrupt-skip;
    * encrypted files also return None here — extractionStatus types them).
    */
  def extract(bytes: Array[Byte]): Option[PdfDoc] = {
    if (bytes == null || bytes.length < 8) return None
    // Latin-1 gives a 1:1 byte↔char mapping, keeping regex offsets aligned
    // with byte offsets in the mixed binary/ASCII PDF syntax.
    val raw = new String(bytes, java.nio.charset.StandardCharsets.ISO_8859_1)
    if (!raw.startsWith("%PDF-")) return None
    if (isEncrypted(bytes)) return None // ciphertext, not extractable text
    try {
      val objects = expandObjectStreams(parseObjects(raw, bytes), bytes)
      if (objects.isEmpty) return None
      val pageOrder = pageObjectOrder(objects, raw)
      val pages = pageOrder.flatMap { pageNum =>
        objects.get(pageNum).map { page =>
          val fonts = fontCMaps(page.dict, objects, bytes)
          contentsOf(page.dict).flatMap(objects.get)
            .map(o => decodeStream(o, bytes))
            .map(extractTextOps(_, fonts))
            .reduceOption(_ ++ _)
            .map(renderReadingOrder)
            .getOrElse("")
        }
      }.filter(_.nonEmpty)
      val info = infoDict(raw, objects)
      Some(PdfDoc(
        pages,
        info.flatMap(stringValue(_, "Title")),
        info.flatMap(stringValue(_, "Author")),
        info.flatMap(stringValue(_, "Subject")),
        info.flatMap(stringValue(_, "Keywords"))))
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  // ---- object-level parsing ----

  /** `exactEnd` = streamEnd came from a validated /Length (no EOL strip
    * needed — and stripping would corrupt flate data ending in 0x0A).
    */
  private final case class PdfObject(dict: String, streamStart: Int, streamEnd: Int,
    exactEnd: Boolean = false)

  private val ObjRe = """(?s)(\d+)\s+\d+\s+obj\b""".r
  private val StreamRe = """stream\r?\n""".r
  // optional group 2 present ⇒ indirect-ref length (`/Length 5 0 R`) — skip
  private val LengthRe = """/Length\s+(\d+)(\s+\d+\s+R)?""".r

  /** All indirect objects: number → (dict text, stream byte range).
    *
    * Stream extent prefers the dict's direct /Length (FlateDecode payloads
    * are arbitrary bytes and may contain the literal `endstream`, which
    * would truncate a substring scan); the scan is the fallback when
    * /Length is absent, indirect, or fails validation against the actual
    * `endstream` position.
    */
  private def parseObjects(raw: String, bytes: Array[Byte]): Map[Int, PdfObject] =
    ObjRe.findAllMatchIn(raw).flatMap { m =>
      val num = m.group(1).toInt
      val bodyStart = m.end
      val bodyEnd = raw.indexOf("endobj", bodyStart) match {
        case -1 => raw.length
        case e => e
      }
      val body = raw.substring(bodyStart, bodyEnd)
      StreamRe.findFirstMatchIn(body) match {
        case Some(sm) =>
          val dict = body.substring(0, sm.start)
          val dataStart = bodyStart + sm.end
          val byLength = LengthRe.findFirstMatchIn(dict)
            .filter(_.group(2) == null)
            // toIntOption: an Int-overflowing /Length (hostile/corrupt) must
            // fall back to the scan, not throw past extract()'s catch and
            // drop the whole document
            .flatMap(lm => lm.group(1).toIntOption.map(dataStart + _))
            .filter { e => // declared end must be followed by ws* + endstream
              e >= dataStart && e <= raw.length &&
                """\s{0,4}endstream""".r.pattern
                  .matcher(raw.substring(e, math.min(e + 13, raw.length)))
                  .lookingAt()
            }
          val obj = byLength match {
            case Some(e) => PdfObject(dict, dataStart, e, exactEnd = true)
            case None =>
              val e = raw.indexOf("endstream", dataStart) match {
                case -1 => bodyEnd
                case x => x
              }
              PdfObject(dict, dataStart, e)
          }
          Some(num -> obj)
        case None =>
          Some(num -> PdfObject(body, -1, -1))
      }
    }.toMap

  /** PDF 1.5+ object streams: a /Type /ObjStm stream holds N compressed
    * dict-only objects (spec forbids nested streams), laid out as a header
    * of N (objnum, offset) integer pairs followed at /First by the
    * concatenated bodies. Expanding them into the object map is what makes
    * modern-writer PDFs (compressed xref layout) parse — the page tree and
    * font dicts usually live inside one. Direct objects win number
    * collisions: an incremental update appends the replacement object
    * uncompressed after the original ObjStm.
    */
  private def expandObjectStreams(objects: Map[Int, PdfObject],
      bytes: Array[Byte]): Map[Int, PdfObject] = {
    val objStms = objects.values.filter { o =>
      o.streamStart >= 0 && """/Type\s*/ObjStm\b""".r.findFirstIn(o.dict).isDefined
    }
    if (objStms.isEmpty) return objects
    val embedded = objStms.flatMap { o =>
      val header = for {
        n <- """/N\s+(\d+)""".r.findFirstMatchIn(o.dict).flatMap(_.group(1).toIntOption)
        first <- """/First\s+(\d+)""".r.findFirstMatchIn(o.dict).flatMap(_.group(1).toIntOption)
      } yield (n, first)
      header.toSeq.flatMap { case (n, first) =>
        val content = decodeStream(o, bytes)
        if (first > content.length) Seq.empty
        else {
          val pairs = """(\d+)\s+(\d+)""".r.findAllMatchIn(content.substring(0, first))
            .take(n).map(m => (m.group(1).toInt, m.group(2).toInt)).toSeq
          pairs.zipWithIndex.map { case ((num, off), idx) =>
            val start = math.min(first + off, content.length)
            val end = math.min(
              if (idx + 1 < pairs.length) first + pairs(idx + 1)._2 else content.length,
              content.length)
            num -> PdfObject(content.substring(start, math.max(start, end)), -1, -1)
          }
        }
      }
    }.toMap
    embedded ++ objects
  }

  /** Pages in /Root → /Pages → /Kids traversal order; falls back to the
    * file order of /Type /Page objects when the tree is unresolvable.
    */
  private def pageObjectOrder(objects: Map[Int, PdfObject], raw: String): Seq[Int] = {
    val rootRef = """/Root\s+(\d+)\s+\d+\s+R""".r.findFirstMatchIn(raw).map(_.group(1).toInt)
    val fromTree = rootRef.flatMap(objects.get).flatMap { root =>
      """/Pages\s+(\d+)\s+\d+\s+R""".r.findFirstMatchIn(root.dict).map(_.group(1).toInt)
    }.map(walkKids(objects, _, depth = 0)).getOrElse(Seq.empty)
    if (fromTree.nonEmpty) fromTree
    else objects.toSeq.sortBy(_._1)
      .filter { case (_, o) => """/Type\s*/Page\b""".r.findFirstIn(o.dict).isDefined }
      .map(_._1)
  }

  private def walkKids(objects: Map[Int, PdfObject], num: Int, depth: Int): Seq[Int] = {
    if (depth > 32) return Seq.empty // cyclic page tree guard
    objects.get(num).toSeq.flatMap { o =>
      if ("""/Type\s*/Page\b""".r.findFirstIn(o.dict).isDefined) Seq(num)
      else
        """/Kids\s*\[([^\]]*)\]""".r.findFirstMatchIn(o.dict).toSeq.flatMap { km =>
          """(\d+)\s+\d+\s+R""".r.findAllMatchIn(km.group(1))
            .flatMap(r => walkKids(objects, r.group(1).toInt, depth + 1)).toSeq
        }
    }
  }

  /** Content stream object numbers for a page (/Contents ref or array). */
  private def contentsOf(pageDict: String): Seq[Int] = {
    val arr = """/Contents\s*\[([^\]]*)\]""".r.findFirstMatchIn(pageDict)
    arr match {
      case Some(m) =>
        """(\d+)\s+\d+\s+R""".r.findAllMatchIn(m.group(1)).map(_.group(1).toInt).toSeq
      case None =>
        """/Contents\s+(\d+)\s+\d+\s+R""".r.findFirstMatchIn(pageDict)
          .map(_.group(1).toInt).toSeq
    }
  }

  /** Hard cap on a single inflated content stream (64 MiB). A content
    * stream is text operators — real ones are KBs; a zip bomb is not.
    */
  private val MaxInflatedBytes = 64 << 20

  /** Stream payload, inflated when /FlateDecode (or when it inflates). */
  private def decodeStream(o: PdfObject, bytes: Array[Byte]): String = {
    if (o.streamStart < 0) return ""
    var end = o.streamEnd
    // strip the EOL the writer put before `endstream` (scan-derived extent
    // only — an exact /Length extent includes no trailing EOL, and flate
    // data legitimately ends in 0x0A one time in 256)
    if (!o.exactEnd) {
      while (end > o.streamStart && (bytes(end - 1) == '\n' || bytes(end - 1) == '\r')) end -= 1
    }
    val data = java.util.Arrays.copyOfRange(bytes, o.streamStart, end)
    val flate = """/Filter\s*(?:\[\s*)?/FlateDecode""".r.findFirstIn(o.dict).isDefined
    if (!flate) new String(data, java.nio.charset.StandardCharsets.ISO_8859_1)
    else {
      val inf = new java.util.zip.Inflater()
      try {
        inf.setInput(data)
        val out = new java.io.ByteArrayOutputStream(math.min(data.length * 4, 1 << 20))
        val buf = new Array[Byte](8192)
        var stalled = false
        while (!inf.finished() && !inf.needsInput() && !stalled) {
          val n = inf.inflate(buf)
          if (n > 0) {
            if (out.size + n > MaxInflatedBytes)
              // oversized stream → extract()'s NonFatal corrupt-skip path
              throw new java.io.IOException("inflated stream exceeds cap")
            out.write(buf, 0, n)
          } else {
            // inflate()==0 with neither finished nor needsInput set means
            // the stream wants a preset dictionary (FDICT) or is stuck —
            // stop instead of spinning forever
            stalled = true
          }
        }
        new String(out.toByteArray, java.nio.charset.StandardCharsets.ISO_8859_1)
      } finally inf.end()
    }
  }

  // ---- ToUnicode CMaps ----

  /** A font's code→text mapping from its /ToUnicode CMap. `codeLen` is the
    * code width in bytes (1 for simple fonts, 2 for CID/Identity-H).
    */
  private[graft] final case class CMap(codeLen: Int, map: Map[Int, String])

  /** Parse bfchar + bfrange sections of a ToUnicode CMap stream. Range
    * destinations support both the scalar form (`<lo> <hi> <dstLo>`, last
    * code unit incremented per step) and the array form
    * (`<lo> <hi> [<d0> <d1> …]`).
    */
  private[graft] def parseCMap(s: String): Option[CMap] = {
    val entries = scala.collection.mutable.Map.empty[Int, String]
    var codeLen = 1
    def noteSrc(hex: String): Int = {
      codeLen = math.max(codeLen, hex.length / 2)
      Integer.parseInt(hex, 16)
    }
    def dstText(hex: String): String =
      if (hex.length <= 2 && hex.nonEmpty) Integer.parseInt(hex, 16).toChar.toString
      else hex.grouped(4).filter(_.length == 4)
        .map(h => Integer.parseInt(h, 16).toChar).mkString
    """(?s)beginbfchar(.*?)endbfchar""".r.findAllMatchIn(s).foreach { block =>
      """<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]*)>""".r.findAllMatchIn(block.group(1))
        .foreach(m => entries(noteSrc(m.group(1))) = dstText(m.group(2)))
    }
    """(?s)beginbfrange(.*?)endbfrange""".r.findAllMatchIn(s).foreach { block =>
      val entryRe =
        """<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>\s*(?:<([0-9A-Fa-f]*)>|\[((?:\s*<[0-9A-Fa-f]*>)*)\s*\])""".r
      entryRe.findAllMatchIn(block.group(1)).foreach { m =>
        val lo = noteSrc(m.group(1))
        val hi = Integer.parseInt(m.group(2), 16)
        if (hi >= lo && hi - lo < 65536) {
          if (m.group(3) != null) {
            val base = dstText(m.group(3))
            (lo to hi).foreach { c =>
              // increment the LAST code unit (the CMap spec's rule)
              val off = c - lo
              entries(c) =
                if (base.isEmpty) ""
                else base.dropRight(1) + (base.last + off).toChar
            }
          } else {
            val dsts = """<([0-9A-Fa-f]*)>""".r.findAllMatchIn(m.group(4))
              .map(d => dstText(d.group(1))).toSeq
            (lo to hi).zip(dsts).foreach { case (c, t) => entries(c) = t }
          }
        }
      }
    }
    if (entries.isEmpty) None else Some(CMap(codeLen, entries.toMap))
  }

  /** Map raw string bytes through a CMap, `codeLen` bytes per code;
    * unmapped 2-byte codes fall back to UTF-16BE, 1-byte to Latin-1.
    */
  private def mapCodes(codes: Seq[Int], cmap: CMap): String =
    codes.grouped(cmap.codeLen).map { g =>
      val code = g.foldLeft(0)((a, b) => (a << 8) | (b & 0xff))
      cmap.map.getOrElse(code,
        if (cmap.codeLen == 2) new String(Character.toChars(code))
        else (code & 0xff).toChar.toString)
    }.mkString

  /** Resolve the page's font name → CMap table: /Resources (direct or ref,
    * inherited via /Parent up to 3 hops — the page-tree convention) →
    * /Font (direct or ref) → each font's /ToUnicode stream.
    */
  private def fontCMaps(pageDict: String, objects: Map[Int, PdfObject],
      bytes: Array[Byte]): Map[String, CMap] = {
    val ResRef = """/Resources\s+(\d+)\s+\d+\s+R""".r
    val ParentRef = """/Parent\s+(\d+)\s+\d+\s+R""".r
    def resourcesOf(dict: String, depth: Int): Option[String] =
      ResRef.findFirstMatchIn(dict).map(_.group(1).toInt)
        .flatMap(objects.get).map(_.dict)
        .orElse(if (dict.contains("/Resources")) Some(dict) else None)
        .orElse(if (depth >= 3) None
        else ParentRef.findFirstMatchIn(dict).map(_.group(1).toInt)
          .flatMap(objects.get).flatMap(p => resourcesOf(p.dict, depth + 1)))
    val fontBlock = resourcesOf(pageDict, 0).flatMap { rd =>
      """/Font\s+(\d+)\s+\d+\s+R""".r.findFirstMatchIn(rd).map(_.group(1).toInt)
        .flatMap(objects.get).map(_.dict)
        .orElse("""(?s)/Font\s*<<(.*?)>>""".r.findFirstMatchIn(rd).map(_.group(1)))
    }
    fontBlock.map { fb =>
      """/([\w.-]+)\s+(\d+)\s+\d+\s+R""".r.findAllMatchIn(fb).flatMap { m =>
        objects.get(m.group(2).toInt).flatMap { fobj =>
          val toUnicode = for {
            tu <- """/ToUnicode\s+(\d+)\s+\d+\s+R""".r.findFirstMatchIn(fobj.dict)
            tuObj <- objects.get(tu.group(1).toInt)
            cmap <- parseCMap(decodeStream(tuObj, bytes))
          } yield cmap
          // Type0/Identity-H|V without a ToUnicode table: show strings are
          // 2-byte CIDs. An empty 2-byte CMap routes them through the
          // UTF-16 fallback in mapCodes — exact when CIDs coincide with
          // Unicode (the common identity-embedded-TTF layout), and never
          // worse than the 1-byte path's NUL-interleaved mangling.
          val identityFallback =
            if ("""/Subtype\s*/Type0\b""".r.findFirstIn(fobj.dict).isDefined &&
              """/Encoding\s*/Identity-[HV]\b""".r.findFirstIn(fobj.dict).isDefined)
              Some(CMap(2, Map.empty))
            else None
          toUnicode.orElse(identityFallback).map(m.group(1) -> _)
        }
      }.toMap
    }.getOrElse(Map.empty)
  }

  // ---- content-stream text operators ----

  /** One text-showing op with its text-space position. */
  private final case class TextRun(y: Double, x: Double, text: String)

  /** Walk BT…ET blocks tracking the text position: `Tm` sets (x,y), `Td`/
    * `TD` translate, `T*`/`'` advance a line, `Tf` selects the font whose
    * ToUnicode CMap (if any) decodes subsequent shows. Shows: `Tj`, `'`,
    * `"`, `TJ` (kerning numbers < -200 text-units become a space — the
    * conventional word-gap heuristic when fonts kern spaces away).
    */
  private def extractTextOps(content: String,
      fonts: Map[String, CMap] = Map.empty): Seq[TextRun] = {
    val runs = scala.collection.mutable.ArrayBuffer.empty[TextRun]
    var x = 0.0; var y = 0.0; var leading = 12.0
    var lineX = 0.0 // Td/TD/Tm set the line start; T* returns to it
    var cmap: Option[CMap] = None
    val toks = tokenize(content)
    var i = 0
    def num(j: Int): Double = toks(j).toDoubleOption.getOrElse(0.0)
    while (i < toks.length) {
      toks(i) match {
        case "BT" => // begin-text resets the text matrix to identity
          x = 0.0; y = 0.0; lineX = 0.0
        case "Tf" if i >= 2 =>
          cmap = Some(toks(i - 2)).filter(_.startsWith("/"))
            .flatMap(t => fonts.get(t.stripPrefix("/")))
        case "Tm" if i >= 6 =>
          x = num(i - 2); y = num(i - 1); lineX = x
        case "Td" if i >= 2 =>
          lineX += num(i - 2); y += num(i - 1); x = lineX
        case "TD" if i >= 2 =>
          lineX += num(i - 2); y += num(i - 1); x = lineX
          leading = -num(i - 1)
        case "TL" if i >= 1 =>
          leading = num(i - 1)
        case "T*" =>
          y -= leading; x = lineX
        case "Tj" | "'" if i >= 1 =>
          if (toks(i) == "'") { y -= leading; x = lineX }
          runs += TextRun(y, x, showText(toks(i - 1), cmap))
        case "\"" if i >= 1 =>
          y -= leading; x = lineX
          runs += TextRun(y, x, showText(toks(i - 1), cmap))
        case "TJ" if i >= 1 =>
          runs += TextRun(y, x, tjArray(toks(i - 1), cmap))
        case _ =>
      }
      i += 1
    }
    runs.toSeq.filter(_.text.nonEmpty)
  }

  /** Tokenizer for the operator stream: strings and arrays come out as
    * single tokens (with delimiters), everything else whitespace-split.
    */
  private def tokenize(s: String): Array[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    val n = s.length
    val cur = new java.lang.StringBuilder()
    def flush(): Unit = if (cur.length > 0) { out += cur.toString; cur.setLength(0) }
    while (i < n) {
      s.charAt(i) match {
        case '(' =>
          flush()
          val start = i
          var depth = 0
          var j = i
          var done = false
          while (j < n && !done) {
            s.charAt(j) match {
              case '\\' => j += 1
              case '(' => depth += 1
              case ')' => depth -= 1; if (depth == 0) done = true
              case _ =>
            }
            j += 1
          }
          out += s.substring(start, j); i = j
        case '[' =>
          flush()
          val start = i
          var j = i
          var depth = 0
          var done = false
          while (j < n && !done) {
            s.charAt(j) match {
              case '\\' => j += 1
              case '[' => depth += 1
              case ']' => depth -= 1; if (depth == 0) done = true
              case '(' => // skip over strings inside the array
                var d2 = 0
                var k = j
                var sdone = false
                while (k < n && !sdone) {
                  s.charAt(k) match {
                    case '\\' => k += 1
                    case '(' => d2 += 1
                    case ')' => d2 -= 1; if (d2 == 0) sdone = true
                    case _ =>
                  }
                  k += 1
                }
                j = k - 1
              case _ =>
            }
            j += 1
          }
          out += s.substring(start, j); i = j
        case '<' if i + 1 < n && s.charAt(i + 1) != '<' =>
          flush()
          val start = i
          val close = s.indexOf('>', i)
          val j = if (close == -1) n else close + 1
          out += s.substring(start, j); i = j
        case c if c == ' ' || c == '\t' || c == '\r' || c == '\n' =>
          flush(); i += 1
        case c =>
          cur.append(c); i += 1
      }
    }
    flush()
    out.toArray
  }

  /** Decode a `(literal)` or `<hex>` PDF string token to text. */
  def pdfString(tok: String): String = {
    if (tok.startsWith("(")) decodeLiteral(tok.substring(1, math.max(1, tok.length - 1)))
    else if (tok.startsWith("<")) decodeHex(tok.substring(1, math.max(1, tok.length - 1)))
    else ""
  }

  /** A show op's text under the current font: CMap-decoded when the font
    * carries a ToUnicode table, the simple-encoding path otherwise.
    */
  private def showText(tok: String, cmap: Option[CMap]): String = cmap match {
    case None => pdfString(tok)
    case Some(cm) => mapCodes(stringBytes(tok), cm)
  }

  /** Raw string bytes (escapes processed, no BOM/encoding applied) — the
    * code units a CMap maps.
    */
  private def stringBytes(tok: String): Seq[Int] = {
    val raw =
      if (tok.startsWith("("))
        decodeLiteralRaw(tok.substring(1, math.max(1, tok.length - 1)))
      else if (tok.startsWith("<"))
        decodeHexRaw(tok.substring(1, math.max(1, tok.length - 1)))
      else ""
    raw.map(_.toInt & 0xff)
  }

  private def decodeLiteral(s: String): String = utf16IfBom(decodeLiteralRaw(s))

  private def decodeLiteralRaw(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) {
        s.charAt(i + 1) match {
          case 'n' => sb.append('\n'); i += 2
          case 'r' => sb.append('\r'); i += 2
          case 't' => sb.append('\t'); i += 2
          case 'b' => sb.append('\b'); i += 2
          case 'f' => sb.append('\f'); i += 2
          case '(' => sb.append('('); i += 2
          case ')' => sb.append(')'); i += 2
          case '\\' => sb.append('\\'); i += 2
          case d if d >= '0' && d <= '7' =>
            var j = i + 1
            var v = 0
            while (j < s.length && j < i + 4 && s.charAt(j) >= '0' && s.charAt(j) <= '7') {
              v = v * 8 + (s.charAt(j) - '0'); j += 1
            }
            sb.append(v.toChar); i = j
          case '\n' => i += 2 // line continuation
          case other => sb.append(other); i += 2
        }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  private def decodeHex(s: String): String = utf16IfBom(decodeHexRaw(s))

  private def decodeHexRaw(s: String): String = {
    val hex = s.filter(c => Character.digit(c, 16) >= 0)
    val padded = if (hex.length % 2 == 1) hex + "0" else hex
    padded.grouped(2).map(h => Integer.parseInt(h, 16).toChar).mkString
  }

  /** Metadata strings may be UTF-16BE with a BOM; content text is not. */
  private def utf16IfBom(s: String): String =
    if (s.length >= 2 && s.charAt(0) == 0xFE.toChar && s.charAt(1) == 0xFF.toChar) {
      val bytes = s.toCharArray.map(c => (c & 0xff).toByte)
      new String(bytes, java.nio.charset.StandardCharsets.UTF_16BE).stripPrefix("﻿")
    } else s

  /** `[(a) -300 (b)] TJ`: concatenate strings; a kern < -200 is a word gap. */
  private def tjArray(tok: String, cmap: Option[CMap] = None): String = {
    val inner = tok.stripPrefix("[").stripSuffix("]")
    val sb = new java.lang.StringBuilder()
    """\((?:\\.|[^\\)])*\)|<[0-9A-Fa-f\s]*>|[-+]?[0-9.]+""".r.findAllIn(inner).foreach { t =>
      if (t.startsWith("(") || t.startsWith("<")) sb.append(showText(t, cmap))
      else t.toDoubleOption.foreach(v => if (v < -200) sb.append(' '))
    }
    sb.toString
  }

  /** Reading order (`chunk_local_pdfs.py` sort): lines by descending y,
    * runs within a line by x; runs joined by space, lines by newline.
    */
  private def renderReadingOrder(runs: Seq[TextRun]): String =
    runs.groupBy(r => math.round(r.y))
      .toSeq.sortBy(-_._1)
      .map { case (_, line) => line.sortBy(_.x).map(_.text.trim).filter(_.nonEmpty).mkString(" ") }
      .filter(_.nonEmpty)
      .mkString("\n")

  // ---- metadata ----

  private def infoDict(raw: String, objects: Map[Int, PdfObject]): Option[String] =
    """/Info\s+(\d+)\s+\d+\s+R""".r.findFirstMatchIn(raw)
      .map(_.group(1).toInt).flatMap(objects.get).map(_.dict)

  private def stringValue(dict: String, key: String): Option[String] =
    (s"""/$key\\s*(\\((?:\\\\.|[^\\\\)])*\\)|<[0-9A-Fa-f\\s]*>)""").r
      .findFirstMatchIn(dict)
      .map(m => pdfString(m.group(1)))
      .filter(_.nonEmpty)
}
