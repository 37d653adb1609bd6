package graft

import graft.embed.HashEmbedder
import graft.ingest.{IngestPipeline, PdfText}

/** The real-PDF extraction gate (reference O2/O3): the pure-JVM extractor
  * must produce non-blank, recognizable text from the reference's own
  * corpus, end-to-end through ingestBinaryDir.
  */
class PdfTextSpec extends SparkSpec {

  private val corpus = "/root/reference/pdf_datasets"
  private def pdf(name: String): Array[Byte] =
    java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(s"$corpus/$name"))

  test("extracts real text from every classic-xref PDF in the reference corpus") {
    val files = new java.io.File(corpus).listFiles().map(_.getName)
      .filter(_.endsWith(".pdf")).sorted
    assert(files.length == 8)
    files.foreach { f =>
      val text = PdfText.extract(pdf(f))
      info(f"$f%-60s -> ${text.length}%7d chars")
      assert(text.trim.nonEmpty, s"$f extracted blank")
      // real words, not glyph garbage: vowels present in ASCII letters
      val letters = text.count(_.isLetter)
      assert(letters > 100, s"$f produced too few letters (${letters})")
    }
  }

  test("extracted text is searchable English (the reference smoke-query terms)") {
    val faq = PdfText.extract(pdf("Airline_FAQ_generic.pdf")).toLowerCase
    assert(faq.contains("refund") || faq.contains("baggage") || faq.contains("flight"),
      s"FAQ text lacks domain terms: ${faq.take(300)}")
  }

  test("non-PDF and corrupt bytes yield empty string (exception->blank contract)") {
    assert(PdfText.extract(null) == "")
    assert(PdfText.extract(Array[Byte]()) == "")
    assert(PdfText.extract("plain text, not a pdf".getBytes) == "")
    val broken = pdf("Airline_FAQ_generic.pdf").take(5000).toArray
    PdfText.extract(broken) // must not throw; any output acceptable
  }

  /** Minimal single-page PDF with an UNCOMPRESSED content stream — lets
    * the spec target the object parser / operand machine in isolation. */
  private def syntheticPdf(contentStream: String, extraObjs: String = "",
                           fontDictEntry: String = "/F1 5 0 R"): Array[Byte] = {
    val content = s"BT /F1 12 Tf $contentStream ET"
    (s"""%PDF-1.4
        |1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj
        |2 0 obj << /Type /Pages /Kids [ 3 0 R ] /Count 1 >> endobj
        |3 0 obj << /Type /Page /Parent 2 0 R /Contents 4 0 R
        |  /Resources << /Font << $fontDictEntry >> >> >> endobj
        |4 0 obj << /Length ${content.length} >> stream
        |$content
        |endstream endobj
        |5 0 obj << /Type /Font /Subtype /Type1 /BaseFont /Helvetica >> endobj
        |$extraObjs
        |trailer << /Root 1 0 R >>
        |%%EOF""".stripMargin).getBytes("ISO-8859-1")
  }

  test("synthetic PDF: literal strings round-trip incl. escapes, octal, nested parens") {
    val txt = PdfText.extract(syntheticPdf(
      """(Hello World) Tj (paren \( inside \) ok) Tj (tab\there) Tj (octal:\101\102\103) Tj (nested (deep) parens) Tj"""))
    assert(txt.contains("Hello World"))
    assert(txt.contains("paren ( inside ) ok"))
    assert(txt.contains("tab\there"))
    assert(txt.contains("octal:ABC"))
    assert(txt.contains("nested (deep) parens"))
  }

  test("synthetic PDF: TJ arrays concatenate; Td emits line breaks") {
    val txt = PdfText.extract(syntheticPdf(
      """[(Hel) -120 (lo)] TJ 0 -14 Td (next line) Tj"""))
    assert(txt.contains("Hello"))
    assert(txt.replaceAll("\\s+", " ").contains("Hello next line"))
    assert(txt.contains("\n"), "Td must break the line")
  }

  test("synthetic PDF: 2-byte CID hex strings decode through a bfrange CMap") {
    // font 5 = Type0 with ToUnicode 6; CMap maps <0041>-<005A> -> A-Z via
    // bfrange (the range arm is untested by the reference corpus, which
    // uses bfchar) plus one bfchar for space
    val cmap =
      """/CIDInit /ProcSet findresource begin
        |begincmap
        |1 begincodespacerange <0000> <FFFF> endcodespacerange
        |1 beginbfchar <0003> <0020> endbfchar
        |1 beginbfrange <0041> <005A> <0041> endbfrange
        |endcmap""".stripMargin
    val extra =
      s"""5 0 obj << /Type /Font /Subtype /Type0 /Encoding /Identity-H
         |  /ToUnicode 6 0 R >> endobj
         |6 0 obj << /Length ${cmap.length} >> stream
         |$cmap
         |endstream endobj""".stripMargin
    // "HI" = <0048><0049>, space = <0003>, "OK" = <004F><004B>
    val pdf = new String(syntheticPdf("<00480049> Tj <0003> Tj <004F004B> Tj"), "ISO-8859-1")
      .replace("5 0 obj << /Type /Font /Subtype /Type1 /BaseFont /Helvetica >> endobj", extra)
      .getBytes("ISO-8859-1")
    val txt = PdfText.extract(pdf)
    assert(txt.contains("HI OK"), s"CID decode failed: '$txt'")
  }

  test("synthetic PDF property sweep: random printable strings survive extraction") {
    val rng = new scala.util.Random(0x9dF4L)
    (1 to 50).foreach { _ =>
      val s = (1 to (1 + rng.nextInt(60))).map { _ =>
        val c = (0x20 + rng.nextInt(0x5F)).toChar // printable ASCII
        c
      }.mkString
      val escaped = s.replace("\\", "\\\\").replace("(", "\\(").replace(")", "\\)")
      val txt = PdfText.extract(syntheticPdf(s"($escaped) Tj"))
      assert(txt.contains(s), s"lost [$s] -> [$txt]")
    }
  }

  test("genuine PDF failing extraction -> blank (failed row); non-PDF -> UTF-8 fallback") {
    import spark.implicits._
    // PDF header but unextractable body: must come out blank so the
    // blank-text contract records a FAILED row — not a UTF-8 mojibake of
    // the raw bytes masquerading as success
    val failingPdf = ("%PDF-1.7\nnothing parseable here " * 40).getBytes("ISO-8859-1")
    val a = Seq(Tuple1(failingPdf)).toDF("content")
      .select(IngestPipeline.extractTextUdf($"content").as("t")).head().getString(0)
    assert(a.trim.isEmpty, s"failed PDF must be blank, got: '${a.take(60)}'")
    // plain-text bytes (no PDF header) still flow through the UTF-8 path
    val b = Seq(Tuple1("plain text file".getBytes("UTF-8"))).toDF("content")
      .select(IngestPipeline.extractTextUdf($"content").as("t")).head().getString(0)
    assert(b == "plain text file")
  }

  test("fuzz: truncations and random mutations never throw") {
    val base = pdf("Skyline_Airways_policy_doc.pdf")
    // truncation at structural boundaries and arbitrary points
    Seq(16, 1024, base.length / 4, base.length / 2, base.length - 37).foreach { cut =>
      PdfText.extract(base.take(cut).toArray)
    }
    // seeded random byte flips (keeps the %PDF- header so parsing engages)
    val rng = new scala.util.Random(20260812L)
    (1 to 10).foreach { _ =>
      val mutated = base.clone()
      (1 to 200).foreach { _ =>
        mutated(8 + rng.nextInt(mutated.length - 8)) = rng.nextInt(256).toByte
      }
      PdfText.extract(mutated) // exception->"" contract: must never throw
    }
    // pure random garbage with a PDF header
    (1 to 5).foreach { _ =>
      val junk = new Array[Byte](50000)
      rng.nextBytes(junk)
      System.arraycopy("%PDF-1.7\n".getBytes, 0, junk, 0, 9)
      PdfText.extract(junk)
    }
  }

  // ---- stream filters & predictors (round 5) -----------------------

  /** One-page PDF whose content stream (object 4) is raw binary with the
    * given dict — lets specs target the filter/predictor decode path. */
  private def binaryStreamPdf(obj4Dict: String, obj4Data: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def w(str: String): Unit = out.write(str.getBytes("ISO-8859-1"))
    w("""%PDF-1.4
        |1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj
        |2 0 obj << /Type /Pages /Kids [ 3 0 R ] /Count 1 >> endobj
        |3 0 obj << /Type /Page /Parent 2 0 R /Contents 4 0 R
        |  /Resources << /Font << /F1 5 0 R >> >> >> endobj
        |""".stripMargin)
    w(s"4 0 obj << $obj4Dict /Length ${obj4Data.length} >> stream\n")
    out.write(obj4Data)
    w("\nendstream endobj\n")
    w("""5 0 obj << /Type /Font /Subtype /Type1 /BaseFont /Helvetica >> endobj
        |trailer << /Root 1 0 R >>
        |%%EOF""".stripMargin)
    out.toByteArray
  }

  private def deflate(data: Array[Byte]): Array[Byte] = {
    val d = new java.util.zip.Deflater()
    d.setInput(data); d.finish()
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    while (!d.finished()) { val n = d.deflate(buf); out.write(buf, 0, n) }
    d.end()
    out.toByteArray
  }

  /** PNG-filter a byte stream (full rows): rowFilter(r) picks the filter
    * type per row; encodes exactly what pngUnpredict must invert. */
  private def pngEncode(data: Array[Byte], columns: Int, rowFilter: Int => Int): Array[Byte] = {
    require(data.length % columns == 0, "pad to full rows")
    val out = new java.io.ByteArrayOutputStream()
    val prev = new Array[Byte](columns)
    var r = 0
    while (r * columns < data.length) {
      val base = r * columns
      val ft = rowFilter(r)
      out.write(ft)
      var i = 0
      while (i < columns) {
        val raw = data(base + i) & 0xFF
        val enc = ft match {
          case 0 => raw
          case 1 => raw - (if (i >= 1) data(base + i - 1) & 0xFF else 0)
          case 2 => raw - (prev(i) & 0xFF)
          case 3 =>
            val left = if (i >= 1) data(base + i - 1) & 0xFF else 0
            raw - (left + (prev(i) & 0xFF)) / 2
          case 4 =>
            val a = if (i >= 1) data(base + i - 1) & 0xFF else 0
            val b = prev(i) & 0xFF
            val c = if (i >= 1) prev(i - 1) & 0xFF else 0
            val p = a + b - c
            val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
            raw - (if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c)
        }
        out.write(enc & 0xFF)
        i += 1
      }
      System.arraycopy(data, base, prev, 0, columns)
      r += 1
    }
    out.toByteArray
  }

  private def padToRows(content: String, columns: Int): Array[Byte] = {
    val pad = (columns - content.length % columns) % columns
    (content + " " * pad).getBytes("ISO-8859-1")
  }

  test("PNG predictor-coded FlateDecode content streams decode (all 5 row filters)") {
    val cols = 16
    val content = padToRows("BT /F1 12 Tf (Predictor coded text survives) Tj ET", cols)
    // cycle through None/Sub/Up/Average/Paeth row filters
    val stream = deflate(pngEncode(content, cols, r => r % 5))
    val pdf = binaryStreamPdf(
      s"/Filter /FlateDecode /DecodeParms << /Predictor 12 /Columns $cols >>", stream)
    val txt = PdfText.extract(pdf)
    assert(txt.contains("Predictor coded text survives"), s"got: '$txt'")
  }

  test("TIFF predictor 2 FlateDecode content streams decode") {
    val cols = 8
    val content = padToRows("BT /F1 12 Tf (Tiff two text) Tj ET", cols)
    val enc = content.clone()
    // horizontal differencing per row, colors=1
    var r = 0
    while (r * cols < enc.length) {
      var i = r * cols + cols - 1
      while (i > r * cols) { enc(i) = (content(i) - content(i - 1)).toByte; i -= 1 }
      r += 1
    }
    val pdf = binaryStreamPdf(
      s"/Filter /FlateDecode /DecodeParms << /Predictor 2 /Columns $cols >>", deflate(enc))
    val txt = PdfText.extract(pdf)
    assert(txt.contains("Tiff two text"), s"got: '$txt'")
  }

  test("unsupported filters yield BLANK text (failed row), never raw-bytes mojibake") {
    val content = "BT /F1 12 Tf (should never appear) Tj ET".getBytes("ISO-8859-1")
    // image-codec and encryption filters are genuinely undecodable -> blank
    assert(PdfText.extract(binaryStreamPdf("/Filter /DCTDecode", content)) == "")
    assert(PdfText.extract(
      binaryStreamPdf("/Filter [ /Crypt /FlateDecode ]", deflate(content))) == "")
    // a RunLength-declared stream carrying non-RL readable bytes must
    // fail decode (literal run overruns the input), not pass through raw
    assert(PdfText.extract(binaryStreamPdf("/Filter /RunLengthDecode", content)) == "")
    // unparseable /DecodeParms (indirect ref) on a Flate stream -> blank
    assert(PdfText.extract(binaryStreamPdf(
      "/Filter /FlateDecode /DecodeParms 9 0 R", deflate(content))) == "")
    // control: same bytes with plain FlateDecode DO extract
    val ok = PdfText.extract(binaryStreamPdf("/Filter /FlateDecode", deflate(content)))
    assert(ok.contains("should never appear"))
  }

  // ------------------------------------- ASCII85 / ASCIIHex / RunLength

  /** Test-scope ASCII85 encoder (PDF 32000 §7.4.3): independent of the
    * decoder so round-trips prove both directions. */
  private def a85Encode(data: Array[Byte], zShorthand: Boolean = true): Array[Byte] = {
    val out = new StringBuilder
    var i = 0
    while (i < data.length) {
      val n = math.min(4, data.length - i)
      var v = 0L
      var k = 0
      while (k < 4) { v = (v << 8) | (if (k < n) data(i + k) & 0xffL else 0L); k += 1 }
      if (v == 0 && n == 4 && zShorthand) out += 'z'
      else {
        val cs = new Array[Char](5)
        var j = 4
        while (j >= 0) { cs(j) = ('!' + (v % 85).toInt).toChar; v /= 85; j -= 1 }
        out.appendAll(cs, 0, n + 1)
      }
      i += n
    }
    out.append("~>")
    out.toString.getBytes("ISO-8859-1")
  }

  /** Test-scope RunLength encoder: literal/run segments + EOD. */
  private def rlEncode(data: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    var i = 0
    while (i < data.length) {
      var run = 1
      while (i + run < data.length && data(i + run) == data(i) && run < 128) run += 1
      if (run >= 2) { out.write(257 - run); out.write(data(i)); i += run }
      else {
        var lit = 1
        while (i + lit < data.length && lit < 128 &&
          (i + lit + 1 >= data.length || data(i + lit + 1) != data(i + lit))) lit += 1
        out.write(lit - 1); out.write(data, i, lit); i += lit
      }
    }
    out.write(128)
    out.toByteArray
  }

  test("ASCII85Decode content streams decode (z shorthand, whitespace, partial group)") {
    val content = "BT /F1 12 Tf (ascii eighty five text) Tj ET".getBytes("ISO-8859-1")
    val enc = a85Encode(content)
    // inject whitespace mid-stream: decoders must skip it
    val spaced = new String(enc, "ISO-8859-1").grouped(20).mkString("\n").getBytes("ISO-8859-1")
    val txt = PdfText.extract(binaryStreamPdf("/Filter /ASCII85Decode", spaced))
    assert(txt.contains("ascii eighty five text"), s"got: '$txt'")
    // z shorthand: "BT /F1 12 Tf (xy" is 16 bytes, so the 4 NULs that
    // follow land on a 4-byte group boundary and encode as a single 'z'
    val zeroed = "BT /F1 12 Tf (xy".getBytes("ISO-8859-1") ++
      Array[Byte](0, 0, 0, 0) ++ "ab) Tj ET".getBytes("ISO-8859-1")
    val zEnc = a85Encode(zeroed)
    assert(new String(zEnc, "ISO-8859-1").contains("z"), "encoder must emit z shorthand")
    val zTxt = PdfText.extract(binaryStreamPdf("/Filter /ASCII85Decode", zEnc))
    assert(zTxt.contains("xy") && zTxt.contains("ab"), s"got: '$zTxt'")
    // corrupt: char outside '!'..'u' -> blank, never garbage
    val bad = "vvvvv~>".getBytes("ISO-8859-1")
    assert(PdfText.extract(binaryStreamPdf("/Filter /ASCII85Decode", bad)) == "")
  }

  test("ASCIIHexDecode content streams decode (odd final digit pads zero)") {
    val content = "BT /F1 12 Tf (hex coded) Tj ET".getBytes("ISO-8859-1")
    val hex = content.map(b => f"${b & 0xff}%02X").mkString(" ") + ">"
    val txt = PdfText.extract(binaryStreamPdf("/Filter /ASCIIHexDecode",
      hex.getBytes("ISO-8859-1")))
    assert(txt.contains("hex coded"), s"got: '$txt'")
  }

  test("RunLengthDecode content streams decode (runs + literals round-trip)") {
    val content = "BT /F1 12 Tf (run   length   text aaaaaa) Tj ET".getBytes("ISO-8859-1")
    val txt = PdfText.extract(binaryStreamPdf("/Filter /RunLengthDecode", rlEncode(content)))
    assert(txt.contains("run   length   text aaaaaa"), s"got: '$txt'")
  }

  test("filter chains decode outermost-first: [/ASCII85Decode /FlateDecode]") {
    val content = "BT /F1 12 Tf (chained transport text) Tj ET".getBytes("ISO-8859-1")
    // PDF order: ASCII85 is the OUTER (transport) coat over deflate data
    val enc = a85Encode(deflate(content))
    val txt = PdfText.extract(
      binaryStreamPdf("/Filter [ /ASCII85Decode /FlateDecode ]", enc))
    assert(txt.contains("chained transport text"), s"got: '$txt'")
    // triple chain with RunLength innermost
    val enc3 = a85Encode(deflate(rlEncode(content)))
    val txt3 = PdfText.extract(binaryStreamPdf(
      "/Filter [ /ASCII85Decode /FlateDecode /RunLengthDecode ]", enc3))
    assert(txt3.contains("chained transport text"), s"got: '$txt3'")
  }

  test("array /DecodeParms parallel to a filter chain: predictor stage decodes") {
    // the r7 ADVICE case: [/ASCII85Decode /FlateDecode] with PNG-Up
    // parms for the Flate stage — a legitimate chained stream that the
    // whole-dict parms lookup used to blank
    val cols = 24
    val padded = padToRows("BT /F1 12 Tf (parallel parms text) Tj ET", cols)
    val enc = a85Encode(deflate(pngEncode(padded, cols, _ => 2))) // Up
    val txt = PdfText.extract(binaryStreamPdf(
      "/Filter [ /ASCII85Decode /FlateDecode ] " +
        s"/DecodeParms [ null << /Predictor 12 /Columns $cols >> ]", enc))
    assert(txt.contains("parallel parms text"), s"got: '$txt'")
    // legacy single-dict parms with a chain still decodes (dict handed
    // to every stage; A85 ignores it)
    val txt2 = PdfText.extract(binaryStreamPdf(
      "/Filter [ /ASCII85Decode /FlateDecode ] " +
        s"/DecodeParms << /Predictor 12 /Columns $cols >>", enc))
    assert(txt2.contains("parallel parms text"), s"got: '$txt2'")
    // a parms array LONGER than the chain is malformed -> blank, never a
    // guessed decode
    val txt3 = PdfText.extract(binaryStreamPdf(
      "/Filter /FlateDecode " +
        s"/DecodeParms [ null null << /Predictor 12 /Columns $cols >> ]",
      deflate(padded)))
    assert(txt3 == "", s"malformed parms must blank, got: '$txt3'")
    // indirect /DecodeParms still blanks (cannot be resolved here)
    val txt4 = PdfText.extract(binaryStreamPdf(
      "/Filter /FlateDecode /DecodeParms 9 0 R",
      deflate(pngEncode(padded, cols, _ => 2))))
    assert(txt4 == "", s"indirect parms must blank, got: '$txt4'")
    // scalar '/DecodeParms null' is spec-equivalent to ABSENT (PDF 32000
    // §7.3.8) — a chain that needs no parameters must still decode
    val enc5 = a85Encode(deflate(padded))
    val txt5 = PdfText.extract(binaryStreamPdf(
      "/Filter [ /ASCII85Decode /FlateDecode ] /DecodeParms null", enc5))
    assert(txt5.contains("parallel parms text"),
      s"scalar null parms must not blank, got: '$txt5'")
  }

  // ----------------------------------------------------------- LZW

  /** Test-scope LZW encoder held in lockstep with the decoder BY
    * CONSTRUCTION: each code is emitted at the width the decoder will
    * read it with (computed from a simulated decoder table size — the
    * decoder's table lags the encoder's by exactly one entry). Emits a
    * leading clear code, optional mid-stream clears, and EOD. */
  private def lzwEncode(data: Array[Byte], earlyChange: Int,
                        clearEvery: Int = Int.MaxValue): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    var bitBuf = 0L; var nBits = 0
    def width(decTableSize: Int): Int = {
      val n = decTableSize + earlyChange
      if (n >= 2048) 12 else if (n >= 1024) 11 else if (n >= 512) 10 else 9
    }
    var decSize = 258     // simulated decoder table size
    var firstAfterClear = true
    def emit(code: Int): Unit = {
      val w = width(decSize)
      bitBuf = (bitBuf << w) | code; nBits += w
      while (nBits >= 8) { out.write(((bitBuf >>> (nBits - 8)) & 0xff).toInt); nBits -= 8 }
    }
    val dict = scala.collection.mutable.HashMap.empty[collection.immutable.ArraySeq[Byte], Int]
    var nextCode = 258
    def reset(): Unit = {
      dict.clear(); nextCode = 258; decSize = 258; firstAfterClear = true
      (0 until 256).foreach(i => dict(collection.immutable.ArraySeq(i.toByte)) = i)
    }
    def emitData(code: Int): Unit = {
      emit(code)
      if (firstAfterClear) firstAfterClear = false
      else if (decSize < 4096) decSize += 1 // decoder adds an entry per code after the first
    }
    emit(256); reset()
    var emitted = 0
    var w = collection.immutable.ArraySeq.empty[Byte]
    var i = 0
    while (i < data.length) {
      val wc = w :+ data(i)
      if (dict.contains(wc)) w = wc
      else {
        emitData(dict(w))
        emitted += 1
        if (nextCode < 4096) { dict(wc) = nextCode; nextCode += 1 }
        w = collection.immutable.ArraySeq(data(i))
        if (emitted % clearEvery == 0) { emitData(dict(w)); emit(256); reset(); w = collection.immutable.ArraySeq.empty }
      }
      i += 1
    }
    if (w.nonEmpty) emitData(dict(w))
    emit(257)
    if (nBits > 0) out.write(((bitBuf << (8 - nBits)) & 0xff).toInt) // pad
    out.toByteArray
  }

  test("LZWDecode content streams decode (EarlyChange 0 and 1, default, mid-stream clear)") {
    val content = "BT /F1 12 Tf (Lzw coded text survives) Tj ET".getBytes("ISO-8859-1")
    // default EarlyChange (no DecodeParms) = 1
    assert(PdfText.extract(binaryStreamPdf("/Filter /LZWDecode", lzwEncode(content, 1)))
      .contains("Lzw coded text survives"))
    // explicit EarlyChange 0 and 1
    for (ec <- Seq(0, 1)) {
      val pdf = binaryStreamPdf(
        s"/Filter /LZWDecode /DecodeParms << /EarlyChange $ec >>", lzwEncode(content, ec))
      assert(PdfText.extract(pdf).contains("Lzw coded text survives"), s"EarlyChange $ec")
    }
    // mid-stream clear codes reset the table correctly
    val cleared = binaryStreamPdf("/Filter /LZWDecode", lzwEncode(content, 1, clearEvery = 5))
    assert(PdfText.extract(cleared).contains("Lzw coded text survives"))
  }

  test("LZW width growth past 9 bits: long repetitive stream round-trips exactly") {
    // >512 table entries forces 9->10->11-bit codes; the KwKwK pattern
    // (aaa...) exercises the code==table.length special case
    val sb = new StringBuilder("BT /F1 12 Tf (")
    val rnd = new scala.util.Random(42)
    (0 until 4000).foreach { i =>
      sb.append(if (i % 7 == 0) "aaaa" else ('b' + rnd.nextInt(24)).toChar.toString * (1 + i % 3))
    }
    sb.append(" wide table end marker) Tj ET")
    val content = sb.toString.getBytes("ISO-8859-1")
    for (ec <- Seq(0, 1)) {
      val pdf = binaryStreamPdf(
        s"/Filter /LZWDecode /DecodeParms << /EarlyChange $ec >>", lzwEncode(content, ec))
      val txt = PdfText.extract(pdf)
      assert(txt.contains("wide table end marker"), s"EarlyChange $ec: got ${txt.take(60)}")
    }
  }

  test("corrupt LZW (bad codes) yields blank, never garbage or a throw") {
    // readable-but-not-LZW bytes: decoding must fail cleanly or produce
    // no text operators; either way extract() must not emit the content
    val content = "BT /F1 12 Tf (should never appear) Tj ET".getBytes("ISO-8859-1")
    val txt = PdfText.extract(binaryStreamPdf("/Filter /LZWDecode", content))
    assert(!txt.contains("should never appear"))
    // random bytes under the LZW filter: must not throw
    val rnd = new scala.util.Random(7)
    (0 until 50).foreach { _ =>
      val junk = Array.fill(200)(rnd.nextInt(256).toByte)
      PdfText.extract(binaryStreamPdf("/Filter /LZWDecode", junk))
    }
  }

  test("CMap hex tokens tolerate inner whitespace and empty <>; bad entries skip, not blank") {
    val cmap =
      """/CIDInit /ProcSet findresource begin
        |begincmap
        |1 begincodespacerange <0000> <FFFF> endcodespacerange
        |3 beginbfchar
        |<> <0058>
        |<00 03> <00 20>
        |<0048> <0048>
        |endbfchar
        |1 beginbfrange <00 49> <004A> <0049> endbfrange
        |endcmap""".stripMargin
    val extra =
      s"""5 0 obj << /Type /Font /Subtype /Type0 /Encoding /Identity-H
         |  /ToUnicode 6 0 R >> endobj
         |6 0 obj << /Length ${cmap.length} >> stream
         |$cmap
         |endstream endobj""".stripMargin
    val pdf = new String(syntheticPdf("<0048 0003 0049 004A> Tj"), "ISO-8859-1")
      .replace("5 0 obj << /Type /Font /Subtype /Type1 /BaseFont /Helvetica >> endobj", extra)
      .getBytes("ISO-8859-1")
    val txt = PdfText.extract(pdf)
    assert(txt.contains("H IJ"), s"whitespace-tolerant CMap decode failed: '$txt'")
  }

  test("end-to-end: real PDFs -> binaryFile scan -> extract -> chunk -> embed") {
    val out = IngestPipeline.ingestBinaryDir(spark, corpus, HashEmbedder(dim = 16))
    val perFile = out.groupBy("filename").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    info(s"chunks per file: $perFile")
    assert(perFile.size == 8, s"expected all 8 PDFs to yield chunks, got ${perFile.keys}")
    assert(perFile.values.forall(_ > 0))
    // chunk contract holds on real extracted text
    val sample = out.select("chunk").limit(200).collect().map(_.getString(0))
    assert(sample.forall(_.length <= 600))
  }
}
