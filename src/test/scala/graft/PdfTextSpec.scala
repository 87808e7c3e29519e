package graft

import graft.ingest.{PdfText, Sources}
import java.nio.file.Files
import java.nio.charset.StandardCharsets.ISO_8859_1

class PdfTextSpec extends SparkSpec {

  /** Assemble a syntactically-minimal PDF from numbered object bodies.
    * The extractor never reads xref/startxref, so offsets are fake.
    */
  private def buildPdf(objects: Seq[(Int, Array[Byte])], trailer: String): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write("%PDF-1.4\n".getBytes(ISO_8859_1))
    objects.foreach { case (num, body) =>
      out.write(s"$num 0 obj\n".getBytes(ISO_8859_1))
      out.write(body)
      out.write("\nendobj\n".getBytes(ISO_8859_1))
    }
    out.write(s"trailer\n$trailer\n%%EOF\n".getBytes(ISO_8859_1))
    out.toByteArray
  }

  private def streamObj(dict: String, data: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write(s"$dict\nstream\n".getBytes(ISO_8859_1))
    out.write(data)
    out.write("\nendstream".getBytes(ISO_8859_1))
    out.toByteArray
  }

  private def deflate(s: String): Array[Byte] = {
    val d = new java.util.zip.Deflater()
    d.setInput(s.getBytes(ISO_8859_1)); d.finish()
    val buf = new Array[Byte](8192)
    val out = new java.io.ByteArrayOutputStream()
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    out.toByteArray
  }

  private def singlePagePdf(content: String, compress: Boolean = false,
      info: String = ""): Array[Byte] = {
    val (dict, data) =
      if (compress) (s"<< /Filter /FlateDecode >>", deflate(content))
      else ("<< >>", content.getBytes(ISO_8859_1))
    val objs = Seq(
      1 -> "<< /Type /Catalog /Pages 2 0 R >>".getBytes(ISO_8859_1),
      2 -> "<< /Type /Pages /Kids [3 0 R] /Count 1 >>".getBytes(ISO_8859_1),
      3 -> "<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>".getBytes(ISO_8859_1),
      4 -> streamObj(dict, data)) ++
      (if (info.nonEmpty) Seq(5 -> info.getBytes(ISO_8859_1)) else Seq.empty)
    val trailer =
      if (info.nonEmpty) "<< /Root 1 0 R /Info 5 0 R >>" else "<< /Root 1 0 R >>"
    buildPdf(objs, trailer)
  }

  test("Tj text extraction from an uncompressed page") {
    val doc = PdfText.extract(singlePagePdf(
      "BT /F1 12 Tf 72 700 Td (Hello world) Tj ET")).get
    assert(doc.pages === Seq("Hello world"))
  }

  test("reading order: lines sort by descending y, runs within a line by x") {
    val content =
      "BT 72 650 Td (second line) Tj ET " +
        "BT 200 700 Td (world) Tj ET " +
        "BT 72 700 Td (hello) Tj ET"
    val doc = PdfText.extract(singlePagePdf(content)).get
    assert(doc.pages === Seq("hello world\nsecond line"))
  }

  test("FlateDecode content streams inflate") {
    val doc = PdfText.extract(singlePagePdf(
      "BT 72 700 Td (compressed text) Tj ET", compress = true)).get
    assert(doc.pages === Seq("compressed text"))
  }

  test("TJ arrays: concatenate strings, kern < -200 becomes a word gap") {
    val doc = PdfText.extract(singlePagePdf(
      "BT 72 700 Td [(Hel) -100 (lo) -300 (world)] TJ ET")).get
    assert(doc.pages === Seq("Hello world"))
  }

  test("T* and ' advance lines; escapes and hex strings decode") {
    val content =
      "BT 20 TL 72 700 Td (first \\(escaped\\)) Tj (second) ' <54 68 69 72 64> Tj ET"
    val doc = PdfText.extract(singlePagePdf(content)).get
    // ' drops one leading below 700; hex Third shows at the same position
    assert(doc.pages.head.startsWith("first (escaped)"))
    assert(doc.pages.head.contains("second Third"))
  }

  test("multi-page: Kids order wins, pages join with blank line") {
    val objs = Seq(
      1 -> "<< /Type /Catalog /Pages 2 0 R >>".getBytes(ISO_8859_1),
      2 -> "<< /Type /Pages /Kids [5 0 R 3 0 R] /Count 2 >>".getBytes(ISO_8859_1),
      // file order 3,4,5,6 but Kids order is 5 then 3
      3 -> "<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>".getBytes(ISO_8859_1),
      4 -> streamObj("<< >>", "BT 72 700 Td (page two) Tj ET".getBytes(ISO_8859_1)),
      5 -> "<< /Type /Page /Parent 2 0 R /Contents 6 0 R >>".getBytes(ISO_8859_1),
      6 -> streamObj("<< >>", "BT 72 700 Td (page one) Tj ET".getBytes(ISO_8859_1)))
    val doc = PdfText.extract(buildPdf(objs, "<< /Root 1 0 R >>")).get
    assert(doc.pages === Seq("page one", "page two"))
    assert(doc.text === "page one\n\npage two")
  }

  test("Info metadata: literal and UTF-16BE-hex strings") {
    val info = "<< /Title (A Study of Shuffles) /Author <FEFF004A006F> /Subject (spark) >>"
    val doc = PdfText.extract(singlePagePdf(
      "BT 72 700 Td (body) Tj ET", info = info)).get
    assert(doc.title === Some("A Study of Shuffles"))
    assert(doc.author === Some("Jo")) // UTF-16BE with BOM
    assert(doc.subject === Some("spark"))
    assert(doc.keywords === None)
  }

  test("object streams: page tree inside a FlateDecode ObjStm parses") {
    // The modern-writer layout: catalog, pages node, and page dict live
    // compressed inside one /ObjStm; only the content stream is direct.
    val embedded = Seq(
      1 -> "<< /Type /Catalog /Pages 2 0 R >>",
      2 -> "<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
      3 -> "<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>")
    var off = 0
    val offsets = embedded.map { case (num, body) =>
      val o = (num, off); off += body.length + 1; o
    }
    val header = offsets.map { case (n, o) => s"$n $o" }.mkString(" ")
    val bodies = embedded.map(_._2).mkString("\n") + "\n"
    val payload = deflate(bodies)
    val objStm = streamObj(
      s"<< /Type /ObjStm /N 3 /First ${header.length + 1} /Filter /FlateDecode >>",
      deflate(header + "\n" + bodies))
    val objs = Seq(
      7 -> objStm,
      4 -> streamObj("<< >>", "BT 72 700 Td (from objstm) Tj ET".getBytes(ISO_8859_1)))
    val doc = PdfText.extract(buildPdf(objs, "<< /Root 1 0 R >>")).get
    assert(doc.pages === Seq("from objstm"))
    assert(payload.nonEmpty) // silence unused warning paranoia
  }

  test("object streams: a direct object overrides its ObjStm copy") {
    val bodies = "<< /Type /Page /Parent 2 0 R /Contents 9 0 R >>"
    val objStm = streamObj(
      s"<< /Type /ObjStm /N 1 /First 4 >>",
      ("3 0\n" + bodies).getBytes(ISO_8859_1))
    val objs = Seq(
      1 -> "<< /Type /Catalog /Pages 2 0 R >>".getBytes(ISO_8859_1),
      2 -> "<< /Type /Pages /Kids [3 0 R] /Count 1 >>".getBytes(ISO_8859_1),
      8 -> objStm,
      // incremental update: direct object 3 replaces the compressed one
      3 -> "<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>".getBytes(ISO_8859_1),
      4 -> streamObj("<< >>", "BT 72 700 Td (direct wins) Tj ET".getBytes(ISO_8859_1)))
    val doc = PdfText.extract(buildPdf(objs, "<< /Root 1 0 R >>")).get
    assert(doc.pages === Seq("direct wins"))
  }

  test("ToUnicode CMap: bfchar + bfrange decode 2-byte hex show strings") {
    val cmapSrc =
      """/CIDInit /ProcSet findresource begin
        |begincmap
        |2 begincodespacerange <0000> <FFFF> endcodespacerange
        |2 beginbfchar
        |<0001> <0048>
        |<0002> <0069>
        |endbfchar
        |1 beginbfrange
        |<0010> <0012> <0041>
        |endbfrange
        |endcmap""".stripMargin
    val objs = Seq(
      1 -> "<< /Type /Catalog /Pages 2 0 R >>".getBytes(ISO_8859_1),
      2 -> "<< /Type /Pages /Kids [3 0 R] /Count 1 >>".getBytes(ISO_8859_1),
      3 -> ("<< /Type /Page /Parent 2 0 R /Contents 4 0 R " +
        "/Resources << /Font << /F9 5 0 R >> >> >>").getBytes(ISO_8859_1),
      // <0001><0002> = "Hi", <001000110012> = "ABC" via the range
      4 -> streamObj("<< >>",
        "BT /F9 12 Tf 72 700 Td <00010002> Tj 0 -20 Td <001000110012> Tj ET"
          .getBytes(ISO_8859_1)),
      5 -> "<< /Type /Font /Subtype /Type0 /ToUnicode 6 0 R >>".getBytes(ISO_8859_1),
      6 -> streamObj("<< /Filter /FlateDecode >>", deflate(cmapSrc)))
    val doc = PdfText.extract(buildPdf(objs, "<< /Root 1 0 R >>")).get
    assert(doc.pages === Seq("Hi\nABC"))
  }

  test("ToUnicode CMap: 1-byte codes, literal strings, Resources via Parent") {
    val cmapSrc =
      """1 beginbfrange
        |<61> <7A> <0041>
        |endbfrange""".stripMargin // a..z → A..Z
    val objs = Seq(
      1 -> "<< /Type /Catalog /Pages 2 0 R >>".getBytes(ISO_8859_1),
      // Resources inherited from the Pages node, not the page itself
      2 -> ("<< /Type /Pages /Kids [3 0 R] /Count 1 " +
        "/Resources << /Font << /F1 5 0 R >> >> >>").getBytes(ISO_8859_1),
      3 -> "<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>".getBytes(ISO_8859_1),
      4 -> streamObj("<< >>",
        "BT /F1 10 Tf 72 700 Td (abc) Tj ET".getBytes(ISO_8859_1)),
      5 -> "<< /Type /Font /ToUnicode 6 0 R >>".getBytes(ISO_8859_1),
      6 -> streamObj("<< >>", cmapSrc.getBytes(ISO_8859_1)))
    val doc = PdfText.extract(buildPdf(objs, "<< /Root 1 0 R >>")).get
    assert(doc.pages === Seq("ABC"))
  }

  test("Type0 /Identity-H without ToUnicode decodes 2-byte CIDs as UTF-16 units") {
    val objs = Seq(
      1 -> "<< /Type /Catalog /Pages 2 0 R >>".getBytes(ISO_8859_1),
      2 -> "<< /Type /Pages /Kids [3 0 R] /Count 1 >>".getBytes(ISO_8859_1),
      3 -> ("<< /Type /Page /Parent 2 0 R /Contents 4 0 R " +
        "/Resources << /Font << /F2 5 0 R >> >> >>").getBytes(ISO_8859_1),
      4 -> streamObj("<< >>",
        "BT /F2 12 Tf 72 700 Td <00480065006C006C006F> Tj ET".getBytes(ISO_8859_1)),
      // the identity-embedded-TTF layout: no ToUnicode table at all
      5 -> ("<< /Type /Font /Subtype /Type0 /BaseFont /NotoSans " +
        "/Encoding /Identity-H >>").getBytes(ISO_8859_1))
    val doc = PdfText.extract(buildPdf(objs, "<< /Root 1 0 R >>")).get
    // without the fallback the 1-byte path would NUL-interleave: "\0H\0e…"
    assert(doc.pages === Seq("Hello"))
  }

  test("fonts without ToUnicode keep the simple-encoding path") {
    val objs = Seq(
      1 -> "<< /Type /Catalog /Pages 2 0 R >>".getBytes(ISO_8859_1),
      2 -> "<< /Type /Pages /Kids [3 0 R] /Count 1 >>".getBytes(ISO_8859_1),
      3 -> ("<< /Type /Page /Parent 2 0 R /Contents 4 0 R " +
        "/Resources << /Font << /F1 5 0 R >> >> >>").getBytes(ISO_8859_1),
      4 -> streamObj("<< >>",
        "BT /F1 10 Tf 72 700 Td (plain text) Tj ET".getBytes(ISO_8859_1)),
      5 -> "<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>".getBytes(ISO_8859_1))
    val doc = PdfText.extract(buildPdf(objs, "<< /Root 1 0 R >>")).get
    assert(doc.pages === Seq("plain text"))
  }

  test("/Length extent survives a literal 'endstream' inside the payload") {
    // Without /Length the substring scan truncates at the embedded token
    // and the trailing text is lost; the validated /Length recovers it.
    val content = "BT 72 700 Td (before endstream after) Tj ET"
    val data = content.getBytes(ISO_8859_1)
    val objs = Seq(
      1 -> "<< /Type /Catalog /Pages 2 0 R >>".getBytes(ISO_8859_1),
      2 -> "<< /Type /Pages /Kids [3 0 R] /Count 1 >>".getBytes(ISO_8859_1),
      3 -> "<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>".getBytes(ISO_8859_1),
      4 -> streamObj(s"<< /Length ${data.length} >>", data))
    val doc = PdfText.extract(buildPdf(objs, "<< /Root 1 0 R >>")).get
    assert(doc.pages === Seq("before endstream after"))
  }

  test("indirect or bogus /Length falls back to the endstream scan") {
    val content = "BT 72 700 Td (fallback works) Tj ET"
    val mk = (dict: String) => PdfText.extract(buildPdf(Seq(
      1 -> "<< /Type /Catalog /Pages 2 0 R >>".getBytes(ISO_8859_1),
      2 -> "<< /Type /Pages /Kids [3 0 R] /Count 1 >>".getBytes(ISO_8859_1),
      3 -> "<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>".getBytes(ISO_8859_1),
      4 -> streamObj(dict, content.getBytes(ISO_8859_1))),
      "<< /Root 1 0 R >>")).get
    assert(mk("<< /Length 9 0 R >>").pages === Seq("fallback works"))
    assert(mk("<< /Length 999999 >>").pages === Seq("fallback works"))
  }

  test("zlib stream demanding a preset dictionary terminates, not spins") {
    // CMF=0x78, FLG=0x20: FDICT set, (0x78*256+0x20) % 31 == 0. inflate()
    // returns 0 with neither finished nor needsInput — the stall guard
    // must break out instead of looping forever.
    val fdict = Array[Byte](0x78, 0x20, 1, 2, 3, 4, 0x5A, 0x5A)
    val objs = Seq(
      1 -> "<< /Type /Catalog /Pages 2 0 R >>".getBytes(ISO_8859_1),
      2 -> "<< /Type /Pages /Kids [3 0 R] /Count 1 >>".getBytes(ISO_8859_1),
      3 -> "<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>".getBytes(ISO_8859_1),
      4 -> streamObj("<< /Filter /FlateDecode >>", fdict))
    val doc = PdfText.extract(buildPdf(objs, "<< /Root 1 0 R >>"))
    assert(doc.exists(_.pages.isEmpty)) // decoded nothing, but returned
  }

  test("zip-bomb content stream hits the inflate cap and skips the file") {
    // ~96 MiB of zeros deflates to ~100 KB; inflating must stop at the
    // 64 MiB cap and surface as the corrupt-skip None, not an OOM.
    val d = new java.util.zip.Deflater()
    val zeros = new Array[Byte](1 << 20)
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    (0 until 96).foreach { _ =>
      d.setInput(zeros)
      while (!d.needsInput()) out.write(buf, 0, d.deflate(buf))
    }
    d.finish()
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    val objs = Seq(
      1 -> "<< /Type /Catalog /Pages 2 0 R >>".getBytes(ISO_8859_1),
      2 -> "<< /Type /Pages /Kids [3 0 R] /Count 1 >>".getBytes(ISO_8859_1),
      3 -> "<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>".getBytes(ISO_8859_1),
      4 -> streamObj("<< /Filter /FlateDecode >>", out.toByteArray))
    assert(PdfText.extract(buildPdf(objs, "<< /Root 1 0 R >>")) === None)
  }

  test("corrupt / non-PDF bytes return None (skip path)") {
    assert(PdfText.extract("not a pdf at all".getBytes(ISO_8859_1)) === None)
    assert(PdfText.extract(Array.empty[Byte]) === None)
    assert(PdfText.extract(null) === None)
    // valid header, garbage body
    assert(PdfText.extract("%PDF-1.4\ngarbage".getBytes(ISO_8859_1)) === None)
  }

  /** RC4-stub fixture: a structurally valid PDF whose trailer points at a
    * standard-security-handler /Encrypt dict and whose "content" is
    * ciphertext-like garbage — what any RC4-encrypted writer emits. Only
    * detection is in scope; decryption needs the password.
    */
  private def encryptedPdf(): Array[Byte] = {
    val objs = Seq(
      1 -> "<< /Type /Catalog /Pages 2 0 R >>".getBytes(ISO_8859_1),
      2 -> "<< /Type /Pages /Kids [3 0 R] /Count 1 >>".getBytes(ISO_8859_1),
      3 -> "<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>".getBytes(ISO_8859_1),
      4 -> streamObj("<< >>",
        Array[Byte](0x7f, -0x35, 0x11, -0x7a, 0x03, 0x5e, -0x12, 0x44)),
      5 -> ("<< /Filter /Standard /V 1 /R 2 /O <28bf4e5e4e758a41> " +
        "/U <64756d6d79> /P -44 >>").getBytes(ISO_8859_1))
    buildPdf(objs, "<< /Root 1 0 R /Encrypt 5 0 R >>")
  }

  test("encrypted PDFs: typed status instead of a silent corrupt-skip") {
    val enc = encryptedPdf()
    assert(PdfText.isEncrypted(enc))
    assert(PdfText.extract(enc) === None, "ciphertext must not extract as text")
    assert(PdfText.extractionStatus(enc) === "encrypted")
    // the plain statuses stay distinguishable
    assert(PdfText.extractionStatus(
      singlePagePdf("BT 72 700 Td (ok) Tj ET")) === "ok")
    assert(PdfText.extractionStatus("%PDF-1.4\nbroken".getBytes(ISO_8859_1)) === "corrupt")
    assert(PdfText.extractionStatus("plain text".getBytes(ISO_8859_1)) === "not_pdf")
    // an unencrypted doc whose CONTENT mentions /Encrypt is not flagged
    // (detection scans the trailer region, and the marker must be a ref
    // or inline dict — prose never matches)
    val decoy = singlePagePdf("BT 72 700 Td (about the /Encrypt key) Tj ET")
    assert(PdfText.extractionStatus(decoy) === "ok")
  }

  test("readPdfDirStatuses: per-file typed statuses over a mixed directory") {
    val dir = Files.createTempDirectory("pdfstat").toString
    Files.write(java.nio.file.Paths.get(s"$dir/good.pdf"),
      singlePagePdf("BT 72 700 Td (fine) Tj ET"))
    Files.write(java.nio.file.Paths.get(s"$dir/locked.pdf"), encryptedPdf())
    Files.write(java.nio.file.Paths.get(s"$dir/bad.pdf"),
      "%PDF-1.4\nbroken".getBytes(ISO_8859_1))
    val statuses = Sources.readPdfDirStatuses(spark, dir).collect()
      .map(r => r.getAs[String]("path").split('/').last -> r.getAs[String]("status"))
      .toMap
    assert(statuses === Map(
      "good.pdf" -> "ok", "locked.pdf" -> "encrypted", "bad.pdf" -> "corrupt"))
  }

  test("readPdfDir: scan extracts text + metadata, skips corrupt files") {
    val dir = Files.createTempDirectory("pdfs").toString
    Files.write(java.nio.file.Paths.get(s"$dir/good.pdf"),
      singlePagePdf("BT 72 700 Td (scanned content here) Tj ET",
        compress = true, info = "<< /Title (Good Doc) >>"))
    Files.write(java.nio.file.Paths.get(s"$dir/bad.pdf"),
      "%PDF-1.4\nbroken".getBytes(ISO_8859_1))
    Files.write(java.nio.file.Paths.get(s"$dir/ignored.txt"),
      "not scanned".getBytes(ISO_8859_1))
    val out = Sources.readPdfDir(spark, dir).collect()
    assert(out.length === 1)
    val r = out.head
    assert(r.getAs[String]("text") === "scanned content here")
    assert(r.getAs[Int]("n_pages") === 1)
    assert(r.getAs[String]("pdf_title") === "Good Doc")
    assert(r.getAs[String]("path").endsWith("good.pdf"))
  }
}
