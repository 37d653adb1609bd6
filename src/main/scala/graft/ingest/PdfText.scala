package graft.ingest

import java.nio.charset.StandardCharsets
import java.util.zip.Inflater

/** Pure-JVM PDF text extraction (reference O2/O3,
  * /root/reference/src/PDFToChromaIngester.py:68-92 — PyPDF2 with a
  * PyMuPDF fallback). The container has no PDF library, so this is a
  * minimal from-scratch extractor for the dominant real-world shape:
  *
  *  - classic `N G obj ... endobj` objects, FlateDecode streams
  *    (java.util.zip.Inflater) — plus /ObjStm object streams, expanded
  *    without xref parsing (scan-all-objects replaces the xref table);
  *  - page tree walk /Root -> /Pages -> /Kids for page order, falling
  *    back to document-order /Type /Page objects;
  *  - content-stream tokenizer for the text-showing operators Tj / TJ /
  *    ' / " with literal-string escapes (incl. octal) and hex strings;
  *  - per-font /ToUnicode CMap decoding (beginbfchar / beginbfrange),
  *    which is what turns Identity-H CID glyph indices into text; fonts
  *    without a CMap fall back to Latin-1 printables.
  *
  * Exceptions anywhere yield "" — the reference's exception→"" contract
  * (:77-79); blank output then drives the caller's fallback chain
  * (:130-138). Per-page texts are joined with "\n" (:73-76).
  *
  * Streams: no filter, FlateDecode, and LZWDecode (PDF 32000 §7.4.4,
  * incl. /EarlyChange) are decoded, including TIFF-2 and PNG (10-15)
  * /DecodeParms predictors (PNG-Up is how most modern PDFs code their
  * object/xref streams), plus ASCII85Decode, ASCIIHexDecode,
  * RunLengthDecode, and filter chains applied outermost-first (the
  * classic pre-binary-transport [/ASCII85Decode /FlateDecode] shape).
  * A stream whose /Filter names anything else (Crypt, DCT, JPX,
  * indirect /Filter) decodes to None — NEVER raw bytes — so an
  * unsupported-filter PDF extracts blank and the caller's failed-row
  * semantics engage.
  *
  * Not supported (acceptable for the extraction semantics, documented):
  * encrypted PDFs, image-codec filters, and glyph-width-based word-gap
  * inference (explicit space glyphs cover the corpora this engine
  * targets).
  */
object PdfText {

  // ------------------------------------------------------------- model

  private final case class Font(twoByte: Boolean, map: Map[Int, String])

  /** One parsed indirect object: dictionary text + raw stream bytes. */
  private final case class PObj(dict: String, data: Option[Array[Byte]])

  // ------------------------------------------------------------ entry

  /** Cheap header sniff — used by callers to decide whether blank
    * extraction means "failed PDF" (failed-row contract) vs "not a PDF"
    * (fall back to plain-text decode). */
  def looksLikePdf(bytes: Array[Byte]): Boolean =
    bytes != null && bytes.length >= 8 &&
      new String(bytes, 0, math.min(bytes.length, 1024), StandardCharsets.ISO_8859_1)
        .contains("%PDF-")

  /** Extract all page text; "" on any failure or non-PDF input. */
  def extract(bytes: Array[Byte]): String =
    try {
      if (!looksLikePdf(bytes)) return ""
      val s = new String(bytes, StandardCharsets.ISO_8859_1)
      val objs = parseObjects(s)
      val pages = pageOrder(s, objs)
      val texts = pages.map(p => extractPage(p, objs)).filter(_.nonEmpty)
      texts.mkString("\n")
    } catch { case _: Throwable => "" }

  // --------------------------------------------------- object parsing

  private val objHeader = """(\d+)\s+\d+\s+obj""".r
  private val lengthLit = """/Length\s+(\d+)(?![\d])(?!\s+0\s+R)""".r
  private val lengthRef = """/Length\s+(\d+)\s+0\s+R""".r

  private def parseObjects(s: String): Map[Int, PObj] = {
    val out = collection.mutable.HashMap.empty[Int, PObj]
    // light pass: integer-valued objects (for /Length N 0 R resolution)
    val intObj = """(\d+)\s+\d+\s+obj\s*(\d+)\s*endobj""".r
    val ints = intObj.findAllMatchIn(s).map(m => m.group(1).toInt -> m.group(2).toLong).toMap
    // sequential scan: a header match that falls INSIDE a previously
    // consumed object's extent (e.g. a spurious 'N 0 obj' byte pattern in
    // compressed stream data) is skipped, so it can never shadow a real
    // object of the same number
    val headers = objHeader.findAllMatchIn(s).toArray
    var pos = 0
    for (i <- headers.indices) {
      val m = headers(i)
      if (m.start >= pos) {
        val num = m.group(1).toInt
        val iEndobj = s.indexOf("endobj", m.end) match {
          case -1 => s.length
          case x  => x
        }
        val iStream = s.indexOf("stream", m.end)
        if (iStream >= 0 && iStream < iEndobj) {
          val dict = s.substring(m.end, iStream)
          var dataStart = iStream + "stream".length
          if (dataStart < s.length && s.charAt(dataStart) == '\r') dataStart += 1
          if (dataStart < s.length && s.charAt(dataStart) == '\n') dataStart += 1
          val len: Option[Long] = lengthLit.findFirstMatchIn(dict).map(_.group(1).toLong)
            .orElse(lengthRef.findFirstMatchIn(dict).flatMap(r => ints.get(r.group(1).toInt)))
          val dataEnd = len match {
            case Some(l) if dataStart + l <= s.length => dataStart + l.toInt
            case _ => s.indexOf("endstream", dataStart) match {
              case -1 => dataStart
              case x  => x
            }
          }
          val raw = new Array[Byte](dataEnd - dataStart)
          var k = 0
          while (k < raw.length) { raw(k) = s.charAt(dataStart + k).toByte; k += 1 }
          out(num) = PObj(dict, Some(raw))
          pos = s.indexOf("endobj", dataEnd) match {
            case -1 => dataEnd
            case x  => x + "endobj".length
          }
        } else {
          out(num) = PObj(s.substring(m.end, iEndobj), None)
          pos = math.min(iEndobj + "endobj".length, s.length)
        }
      }
    }
    // expand object streams (/Type /ObjStm): header = N pairs of
    // (objnum, offset) then objects at /First + offset
    val expanded = collection.mutable.HashMap.empty[Int, PObj]
    out.foreach { case (_, o) =>
      if (o.dict.contains("/ObjStm")) decodeStream(o).foreach { dec =>
        val body = new String(dec, StandardCharsets.ISO_8859_1)
        val first = """/First\s+(\d+)""".r.findFirstMatchIn(o.dict).map(_.group(1).toInt)
        val n = """/N\s+(\d+)""".r.findFirstMatchIn(o.dict).map(_.group(1).toInt)
        (first, n) match {
          case (Some(f), Some(cnt)) =>
            val nums = """\d+""".r.findAllIn(body.substring(0, math.min(f, body.length)))
              .map(_.toInt).toArray
            val pairs = nums.grouped(2).filter(_.length == 2).take(cnt).toArray
            for (j <- pairs.indices) {
              val Array(onum, off) = pairs(j)
              val start = f + off
              val end = if (j + 1 < pairs.length) f + pairs(j + 1)(1) else body.length
              if (start < body.length)
                expanded(onum) = PObj(body.substring(start, math.min(end, body.length)), None)
            }
          case _ => ()
        }
      }
    }
    (out ++ expanded).toMap
  }

  /** Decompression cap: a crafted/corrupt stream must not OOM an executor
    * running the extraction UDF over an untrusted corpus. 256 MB decoded
    * is far beyond any real content/CMap stream. */
  private val MaxInflatedBytes = 256 << 20

  private val filterSpec = """/Filter\s*(?:\[\s*((?:/\w+\s*)*)\]|/(\w+))""".r
  private val nameTok = """/(\w+)""".r

  /** The stream's filter chain, outermost first. None = the dict names a
    * /Filter this extractor cannot parse (indirect ref, etc.) — the
    * caller must treat the stream as undecodable, NOT pass raw bytes on. */
  private def parseFilters(dict: String): Option[Seq[String]] =
    if (!dict.contains("/Filter")) Some(Nil)
    else filterSpec.findFirstMatchIn(dict).map { m =>
      if (m.group(2) != null) Seq(m.group(2))
      else nameTok.findAllMatchIn(m.group(1)).map(_.group(1)).toSeq
    }

  /** Decode a stream to its plain bytes, honoring the dict's /Filter and
    * /DecodeParms. Supported: no filter; any chain (applied outermost
    * first, PDF 32000 §7.4) of FlateDecode / LZWDecode (optionally with
    * a TIFF (2) or PNG (>=10) predictor), ASCII85Decode, ASCIIHexDecode,
    * and RunLengthDecode, including the inline-image abbreviations.
    * Anything else (Crypt, DCT, JPX, CCITT, JBIG2, indirect /Filter)
    * returns None so a genuinely-unsupported PDF extracts BLANK and the
    * caller's blank-text failed-row semantics engage (reference
    * :136-138) — passing raw compressed bytes to the tokenizer would
    * emit mojibake as "successful" text. */
  private def decodeStream(o: PObj): Option[Array[Byte]] = o.data.flatMap { raw =>
    parseFilters(o.dict).flatMap { filters =>
      parseDecodeParms(o.dict, filters.length).flatMap { parms =>
        filters.zip(parms).foldLeft(Option(raw)) { case (acc, (f, p)) =>
          acc.flatMap(applyFilter(p, f, _))
        }
      }
    }
  }

  /** Per-STAGE /DecodeParms bodies, parallel to the filter chain (PDF
    * 32000 §7.3.8.2: when /Filter is an array, /DecodeParms is a
    * parallel array of dicts/nulls). A single inline dict — the legacy
    * single-filter form — is handed to every stage, which is harmless
    * because stages that take no parameters ignore it; a chain like
    * [/ASCII85Decode /FlateDecode] with PNG-predictor parms therefore
    * decodes instead of blanking. /DecodeParms present but unparseable
    * inline (indirect reference) still fails the whole stream to blank —
    * decoding with guessed parameters would emit mojibake as text. */
  private def parseDecodeParms(dict: String, nFilters: Int): Option[Seq[Option[String]]] = {
    if ("""/(?:DecodeParms|DP)(?![0-9A-Za-z])""".r.findFirstIn(dict).isEmpty)
      return Some(Seq.fill(nFilters)(None))
    """(?s)/(?:DecodeParms|DP)\s*\[(.*?)\]""".r.findFirstMatchIn(dict) match {
      case Some(m) =>
        val entries = """(?s)(null)|<<(.*?)>>""".r.findAllMatchIn(m.group(1)).map { em =>
          if (em.group(1) != null) None else Some(em.group(2))
        }.toSeq
        if (entries.length > nFilters) None // not parallel: refuse to guess
        else Some(entries.padTo(nFilters, Option.empty[String]))
      case None =>
        """(?s)/(?:DecodeParms|DP)\s*<<(.*?)>>""".r.findFirstMatchIn(dict)
          .map(m => Seq.fill(nFilters)(Option(m.group(1))))
          .orElse {
            // scalar '/DecodeParms null' is spec-equivalent to absent
            // (PDF 32000 §7.3.8) — must not blank the stream
            if ("""/(?:DecodeParms|DP)(?![0-9A-Za-z])\s*null(?![0-9A-Za-z])""".r
                .findFirstIn(dict).isDefined)
              Some(Seq.fill(nFilters)(Option.empty[String]))
            else None
          }
    }
  }

  private def applyFilter(parms: Option[String], name: String, data: Array[Byte]): Option[Array[Byte]] =
    name match {
      case "FlateDecode" | "Fl"     => inflate(data).flatMap(unpredict(parms, _))
      case "LZWDecode" | "LZW"      =>
        lzwDecode(data, earlyChange(parms)).flatMap(unpredict(parms, _))
      case "ASCII85Decode" | "A85"  => ascii85Decode(data)
      case "ASCIIHexDecode" | "AHx" => asciiHexDecode(data)
      case "RunLengthDecode" | "RL" => runLengthDecode(data)
      case _                        => None
    }

  /** ASCII85Decode (PDF 32000 §7.4.3): groups of 5 chars '!'..'u' encode
    * 4 bytes base-85 big-endian; 'z' between groups is 4 zero bytes; a
    * final partial group of n chars yields n-1 bytes (pad with 'u');
    * whitespace is ignored, `~>` is EOD, an optional `<~` header is
    * tolerated. A group decoding past 2^32, a dangling single char, or
    * any other char is corrupt → None → blank (same contract as
    * inflate). */
  private def ascii85Decode(raw: Array[Byte]): Option[Array[Byte]] = {
    try {
      val out = new java.io.ByteArrayOutputStream(raw.length * 4 / 5 + 4)
      val grp = new Array[Int](5)
      var n = 0
      var i = if (raw.length >= 2 && raw(0) == '<' && raw(1) == '~') 2 else 0
      var done = false
      def flush(count: Int): Unit = {
        var k = count
        while (k < 5) { grp(k) = 84; k += 1 } // pad with 'u'
        var v = 0L; k = 0
        while (k < 5) { v = v * 85 + grp(k); k += 1 }
        if (v > 0xFFFFFFFFL) throw new IllegalStateException("a85 group overflow")
        val b = Array[Byte]((v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)
        out.write(b, 0, count - 1)
      }
      while (i < raw.length && !done) {
        val c = raw(i) & 0xFF
        if (c == '~') done = true
        else if (c == ' ' || c == '\n' || c == '\r' || c == '\t' || c == '\f' || c == 0) ()
        else if (c == 'z' && n == 0) { out.write(0); out.write(0); out.write(0); out.write(0) }
        else if (c >= '!' && c <= 'u') {
          grp(n) = c - '!'; n += 1
          if (n == 5) { flush(5); n = 0 }
          if (out.size > MaxInflatedBytes) throw new IllegalStateException("a85 cap")
        } else throw new IllegalStateException(s"bad a85 char $c")
        i += 1
      }
      if (n == 1) throw new IllegalStateException("a85 dangling char")
      if (n > 1) flush(n)
      Some(out.toByteArray)
    } catch { case _: Throwable => None }
  }

  /** ASCIIHexDecode (PDF 32000 §7.4.2): hex digit pairs, whitespace
    * ignored, '>' is EOD, an odd final digit is padded with 0. */
  private def asciiHexDecode(raw: Array[Byte]): Option[Array[Byte]] = {
    try {
      val out = new java.io.ByteArrayOutputStream(raw.length / 2 + 1)
      var hi = -1; var i = 0; var done = false
      while (i < raw.length && !done) {
        val c = raw(i) & 0xFF
        if (c == '>') done = true
        else if (c == ' ' || c == '\n' || c == '\r' || c == '\t' || c == '\f' || c == 0) ()
        else {
          val d = Character.digit(c, 16)
          if (d < 0) throw new IllegalStateException(s"bad hex char $c")
          if (hi < 0) hi = d else { out.write((hi << 4) | d); hi = -1 }
        }
        i += 1
      }
      if (hi >= 0) out.write(hi << 4)
      Some(out.toByteArray)
    } catch { case _: Throwable => None }
  }

  /** RunLengthDecode (PDF 32000 §7.4.5): length byte L then either L+1
    * literal bytes (L <= 127) or one byte repeated 257-L times
    * (L >= 129); 128 is EOD. A literal/run overrunning the input is
    * corrupt → None → blank. */
  private def runLengthDecode(raw: Array[Byte]): Option[Array[Byte]] = {
    try {
      val out = new java.io.ByteArrayOutputStream(math.max(1024, raw.length * 2))
      var i = 0; var done = false
      while (i < raw.length && !done) {
        val l = raw(i) & 0xFF; i += 1
        if (l == 128) done = true
        else if (l < 128) {
          if (i + l + 1 > raw.length) throw new IllegalStateException("rl literal overrun")
          out.write(raw, i, l + 1); i += l + 1
        } else {
          if (i >= raw.length) throw new IllegalStateException("rl run overrun")
          val b = raw(i) & 0xFF; i += 1
          var k = 257 - l
          while (k > 0) { out.write(b); k -= 1 }
        }
        if (out.size > MaxInflatedBytes) throw new IllegalStateException("rl cap")
      }
      Some(out.toByteArray)
    } catch { case _: Throwable => None }
  }

  /** /EarlyChange from this stage's /DecodeParms entry; the PDF default
    * is 1 (code width grows one code early). */
  private def earlyChange(parms: Option[String]): Int =
    parms.map(parmInt(_, "/EarlyChange", 1)).getOrElse(1)

  /** LZWDecode (PDF 32000 §7.4.4 = TIFF LZW): codes packed MSB-first,
    * width 9→12 bits, 256 = clear table, 257 = EOD, table entries
    * assigned from 258. Width for the NEXT code is a function of the
    * current table size + EarlyChange (thresholds 512/1024/2048), so
    * decoder and encoder stay in lockstep. KwKwK case: a code equal to
    * the next unassigned entry decodes as prev + prev.head. Any other
    * out-of-range code, or output past the decompression cap, is corrupt
    * → None → blank (same contract as inflate). */
  private def lzwDecode(raw: Array[Byte], earlyChange: Int): Option[Array[Byte]] = {
    try {
      val out = new java.io.ByteArrayOutputStream(math.max(1024, raw.length * 3))
      val table = new scala.collection.mutable.ArrayBuffer[Array[Byte]](4096)
      def resetTable(): Unit = {
        table.clear()
        var i = 0
        while (i < 256) { table += Array(i.toByte); i += 1 }
        table += null; table += null // 256 = clear, 257 = EOD
      }
      def codeBits: Int = {
        val n = table.length + earlyChange
        if (n >= 2048) 12 else if (n >= 1024) 11 else if (n >= 512) 10 else 9
      }
      resetTable()
      var prev: Array[Byte] = null
      var bitBuf = 0L; var nBits = 0; var pos = 0
      var done = false
      while (!done) {
        val w = codeBits
        while (nBits < w && pos < raw.length) {
          bitBuf = (bitBuf << 8) | (raw(pos) & 0xffL); nBits += 8; pos += 1
        }
        if (nBits < w) done = true // data exhausted without EOD: accept prefix
        else {
          val code = ((bitBuf >>> (nBits - w)) & ((1L << w) - 1)).toInt
          nBits -= w
          if (code == 256) { resetTable(); prev = null }
          else if (code == 257) done = true
          else {
            val entry: Array[Byte] =
              if (code < table.length && table(code) != null) table(code)
              else if (code == table.length && prev != null) prev :+ prev(0)
              else throw new IllegalStateException(s"bad LZW code $code")
            out.write(entry)
            if (out.size > MaxInflatedBytes)
              throw new IllegalStateException("lzw cap exceeded")
            if (prev != null && table.length < 4096) table += (prev :+ entry(0))
            prev = entry
          }
        }
      }
      Some(out.toByteArray)
    } catch { case _: Throwable => None }
  }

  private def inflate(raw: Array[Byte]): Option[Array[Byte]] = {
    val inf = new Inflater()
    try {
      inf.setInput(raw)
      val buf = new java.io.ByteArrayOutputStream(math.max(1024, raw.length * 4))
      val chunk = new Array[Byte](8192)
      while (!inf.finished() && !inf.needsInput()) {
        val n = inf.inflate(chunk)
        if (n > 0) {
          buf.write(chunk, 0, n)
          if (buf.size() > MaxInflatedBytes)
            throw new IllegalStateException("inflate cap exceeded")
        } else if (n == 0 && inf.needsDictionary()) throw new IllegalStateException("dict")
      }
      Some(buf.toByteArray)
    } catch { case _: Throwable => None }
    // end() in finally: corrupt/rejected streams must release native
    // zlib memory immediately, not at GC finalization — the adversarial
    // corpus is exactly where many streams fail
    finally inf.end()
  }

  // ------------------------------------------------------- predictors

  private def parmInt(parms: String, key: String, dflt: Int): Int =
    (key + """\s+(\d+)""").r.findFirstMatchIn(parms).map(_.group(1).toInt).getOrElse(dflt)

  /** Apply this stage's /DecodeParms predictor, if any, to inflated
    * bytes. Predictor 1/absent = identity; 2 = TIFF horizontal
    * differencing (8-bit components only); 10-15 = PNG row filters
    * (None/Sub/Up/Average/Paeth — the common case: most modern PDFs'
    * object and xref streams are PNG-Up coded). An unsupported
    * predictor value returns None -> blank. */
  private def unpredict(parms: Option[String], data: Array[Byte]): Option[Array[Byte]] =
    parms match {
      case None => Some(data)
      case Some(p) =>
        val pred = parmInt(p, "/Predictor", 1)
        val colors = parmInt(p, "/Colors", 1)
        val bpc = parmInt(p, "/BitsPerComponent", 8)
        val columns = parmInt(p, "/Columns", 1)
        if (pred <= 1) Some(data)
        else if (pred == 2) {
          if (bpc != 8) None
          else Some(tiffUnpredict(data, columns, colors))
        } else if (pred >= 10 && pred <= 15) {
          try Some(pngUnpredict(data, columns, colors, bpc))
          catch { case _: Throwable => None }
        } else None
    }

  /** TIFF predictor 2, 8-bit components: undo left-neighbor differencing. */
  private def tiffUnpredict(data: Array[Byte], columns: Int, colors: Int): Array[Byte] = {
    val out = data.clone()
    val rowLen = math.max(1, columns * colors)
    var row = 0
    while (row * rowLen < out.length) {
      val base = row * rowLen
      val end = math.min(base + rowLen, out.length)
      var i = base + colors
      while (i < end) { out(i) = (out(i) + out(i - colors)).toByte; i += 1 }
      row += 1
    }
    out
  }

  /** PNG predictors (RFC 2083 filters): each row is prefixed with a
    * filter-type byte; reconstruct against the previous (decoded) row. */
  private def pngUnpredict(data: Array[Byte], columns: Int, colors: Int, bpc: Int): Array[Byte] = {
    val rowLen = math.max(1, (columns * colors * bpc + 7) / 8)
    val bpp = math.max(1, colors * bpc / 8)
    val out = new java.io.ByteArrayOutputStream(data.length)
    val prev = new Array[Byte](rowLen)
    var pos = 0
    while (pos < data.length) {
      val ft = data(pos) & 0xFF
      pos += 1
      val avail = math.min(rowLen, data.length - pos)
      val row = new Array[Byte](rowLen)
      System.arraycopy(data, pos, row, 0, avail)
      pos += avail
      ft match {
        case 0 => ()
        case 1 =>
          var i = bpp
          while (i < rowLen) { row(i) = (row(i) + row(i - bpp)).toByte; i += 1 }
        case 2 =>
          var i = 0
          while (i < rowLen) { row(i) = (row(i) + prev(i)).toByte; i += 1 }
        case 3 =>
          var i = 0
          while (i < rowLen) {
            val left = if (i >= bpp) row(i - bpp) & 0xFF else 0
            row(i) = (row(i) + ((left + (prev(i) & 0xFF)) / 2)).toByte
            i += 1
          }
        case 4 =>
          var i = 0
          while (i < rowLen) {
            val a = if (i >= bpp) row(i - bpp) & 0xFF else 0
            val b = prev(i) & 0xFF
            val c0 = if (i >= bpp) prev(i - bpp) & 0xFF else 0
            val p = a + b - c0
            val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c0)
            val pr = if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c0
            row(i) = (row(i) + pr).toByte
            i += 1
          }
        case _ => throw new IllegalStateException(s"bad png filter $ft")
      }
      out.write(row, 0, avail)
      System.arraycopy(row, 0, prev, 0, rowLen)
    }
    out.toByteArray
  }

  // ------------------------------------------------------- page order

  private val refRe = """(\d+)\s+0\s+R""".r

  private def pageOrder(s: String, objs: Map[Int, PObj]): Seq[Int] = {
    def isPage(d: String) = d.contains("/Page") && !d.contains("/Pages")
    val walked = for {
      rootRef <- """/Root\s+(\d+)\s+0\s+R""".r.findAllMatchIn(s).toSeq.lastOption
      catalog <- objs.get(rootRef.group(1).toInt)
      pagesRef <- """/Pages\s+(\d+)\s+0\s+R""".r.findFirstMatchIn(catalog.dict)
    } yield {
      val seen = collection.mutable.HashSet.empty[Int]
      def walk(num: Int): Seq[Int] = objs.get(num) match {
        case Some(o) if seen.add(num) =>
          if (o.dict.contains("/Kids"))
            """(?s)/Kids\s*\[(.*?)\]""".r.findFirstMatchIn(o.dict).toSeq.flatMap { km =>
              refRe.findAllMatchIn(km.group(1)).toSeq.flatMap(r => walk(r.group(1).toInt))
            }
          else if (isPage(o.dict)) Seq(num)
          else Seq.empty
        case _ => Seq.empty
      }
      walk(pagesRef.group(1).toInt)
    }
    walked.filter(_.nonEmpty).getOrElse {
      objs.toSeq.filter { case (_, o) => """/Type\s*/Page(?!s)""".r
        .findFirstIn(o.dict).isDefined }.map(_._1).sorted
    }
  }

  // ------------------------------------------------------- page text

  private def extractPage(pageNum: Int, objs: Map[Int, PObj]): String = {
    val page = objs.getOrElse(pageNum, return "")
    val fonts = pageFonts(page.dict, objs)
    val contentRefs: Seq[Int] =
      """(?s)/Contents\s*\[(.*?)\]""".r.findFirstMatchIn(page.dict) match {
        case Some(arr) => refRe.findAllMatchIn(arr.group(1)).map(_.group(1).toInt).toSeq
        case None => """/Contents\s+(\d+)\s+0\s+R""".r.findFirstMatchIn(page.dict)
          .map(_.group(1).toInt).toSeq
      }
    val content = contentRefs.flatMap(r => objs.get(r)).flatMap(decodeStream)
      .map(new String(_, StandardCharsets.ISO_8859_1)).mkString("\n")
    if (content.isEmpty) "" else runTextOps(content, fonts)
  }

  /** Resolve /Resources -> /Font -> per-font /ToUnicode CMaps. */
  private def pageFonts(pageDict: String, objs: Map[Int, PObj]): Map[String, Font] = {
    val resources: String =
      """/Resources\s+(\d+)\s+0\s+R""".r.findFirstMatchIn(pageDict) match {
        case Some(m) => objs.get(m.group(1).toInt).map(_.dict).getOrElse("")
        case None => pageDict // inline resources: font refs are findable in place
      }
    val fontDict: String =
      """/Font\s+(\d+)\s+0\s+R""".r.findFirstMatchIn(resources) match {
        case Some(m) => objs.get(m.group(1).toInt).map(_.dict).getOrElse("")
        case None => """(?s)/Font\s*<<(.*?)>>""".r.findFirstMatchIn(resources)
          .map(_.group(1)).getOrElse("")
      }
    """/(\w+)\s+(\d+)\s+0\s+R""".r.findAllMatchIn(fontDict).map { m =>
      val name = m.group(1)
      val font = objs.get(m.group(2).toInt).map { fo =>
        val cmap = """/ToUnicode\s+(\d+)\s+0\s+R""".r.findFirstMatchIn(fo.dict)
          .flatMap(t => objs.get(t.group(1).toInt)).flatMap(decodeStream)
          .map(new String(_, StandardCharsets.ISO_8859_1))
        val isCid = fo.dict.contains("/Type0") || fo.dict.contains("Identity")
        cmap match {
          case Some(c) =>
            val (width, map) = parseToUnicode(c)
            Font(twoByte = if (width > 0) width == 2 else isCid, map)
          case None => Font(twoByte = isCid, Map.empty)
        }
      }.getOrElse(Font(twoByte = false, Map.empty))
      name -> font
    }.toMap
  }

  // ------------------------------------------------- ToUnicode CMaps

  private val hexTok = """<([0-9A-Fa-f\s]*)>""".r

  /** Whitespace is legal INSIDE PDF hex strings (<00 41>) and <> is a
    * legal empty string — strip fully and guard before parseLong so one
    * odd token can't throw (a throw here would blank the whole document
    * via extract()'s top-level catch). */
  private def hexToInt(h: String): Int = {
    val clean = h.replaceAll("\\s", "")
    if (clean.isEmpty) throw new NumberFormatException("empty hex token")
    java.lang.Long.parseLong(clean, 16).toInt
  }

  private def hexToString(h: String): String = {
    val clean = h.replaceAll("\\s", "")
    // UTF-16BE code units, 4 hex digits each
    clean.grouped(4).filter(_.length == 4)
      .map(u => Integer.parseInt(u, 16).toChar).mkString
  }

  /** Returns (codeByteWidth or 0 if unknown, cid -> unicode string). */
  private def parseToUnicode(cmap: String): (Int, Map[Int, String]) = {
    val out = collection.mutable.HashMap.empty[Int, String]
    val width = """(?s)begincodespacerange\s*<([0-9A-Fa-f]+)>""".r
      .findFirstMatchIn(cmap).map(_.group(1).length / 2).getOrElse(0)
    for (sec <- """(?s)beginbfchar(.*?)endbfchar""".r.findAllMatchIn(cmap)) {
      val toks = hexTok.findAllMatchIn(sec.group(1)).map(_.group(1)).toArray
      // per-entry guard: a malformed pair skips that entry, not the doc
      toks.grouped(2).foreach {
        case Array(src, dst) =>
          try out(hexToInt(src)) = hexToString(dst)
          catch { case _: NumberFormatException => () }
        case _ => ()
      }
    }
    for (sec <- """(?s)beginbfrange(.*?)endbfrange""".r.findAllMatchIn(cmap)) {
      // entries: <lo> <hi> <dstStart>  OR  <lo> <hi> [<d0> <d1> ...]
      val body = sec.group(1)
      val entry = ("""(?s)<([0-9A-Fa-f\s]*)>\s*<([0-9A-Fa-f\s]*)>\s*""" +
        """(?:<([0-9A-Fa-f\s]*)>|\[((?:\s*<[0-9A-Fa-f\s]*>)*)\s*\])""").r
      entry.findAllMatchIn(body).foreach { m =>
        try {
        val lo = hexToInt(m.group(1)); val hi = hexToInt(m.group(2))
        if (m.group(3) != null) {
          val d0 = m.group(3).replaceAll("\\s", "")
          val base = Integer.parseInt(d0.takeRight(4), 16)
          val prefix = d0.dropRight(4)
          var c = lo
          while (c <= hi) {
            out(c) = hexToString(prefix + f"${base + (c - lo)}%04X")
            c += 1
          }
        } else {
          val dsts = hexTok.findAllMatchIn(m.group(4)).map(_.group(1)).toArray
          var c = lo
          var j = 0
          while (c <= hi && j < dsts.length) {
            out(c) = hexToString(dsts(j)); c += 1; j += 1
          }
        }
        } catch { case _: NumberFormatException => () } // skip entry, keep doc
      }
    }
    (width, out.toMap)
  }

  // -------------------------------------- content-stream interpreter

  /** Minimal operand machine over a decoded content stream: collects
    * string operands, tracks the current font via `/Fx size Tf`, emits
    * decoded text on Tj/TJ/'/" and newlines on line-moving operators.
    */
  private def runTextOps(content: String, fonts: Map[String, Font]): String = {
    val sb = new StringBuilder
    val strings = collection.mutable.ArrayBuffer.empty[Array[Byte]]
    var lastName: String = null
    var curFont: Font = Font(twoByte = false, Map.empty)
    var i = 0
    val n = content.length

    def newline(): Unit =
      if (sb.nonEmpty && sb.charAt(sb.length - 1) != '\n') sb.append('\n')

    def onOperator(op: String): Unit = {
      op match {
        case "Tf" =>
          if (lastName != null) curFont = fonts.getOrElse(lastName, curFont)
        case "Tj" =>
          strings.lastOption.foreach(b => sb.append(decodeString(b, curFont)))
        case "'" | "\"" =>
          newline()
          strings.lastOption.foreach(b => sb.append(decodeString(b, curFont)))
        case "TJ" =>
          strings.foreach(b => sb.append(decodeString(b, curFont)))
        case "Td" | "TD" | "T*" | "ET" => newline()
        case _ => ()
      }
      strings.clear()
    }

    while (i < n) {
      val c = content.charAt(i)
      if (c == '(') {
        val (bytes, next) = parseLiteralString(content, i)
        strings += bytes
        i = next
      } else if (c == '<' && i + 1 < n && content.charAt(i + 1) == '<') {
        i += 2
      } else if (c == '<') {
        val end0 = content.indexOf('>', i + 1)
        val end = if (end0 < 0) n else end0
        val hex = content.substring(i + 1, end).replaceAll("\\s", "")
        val padded = if (hex.length % 2 == 1) hex + "0" else hex
        strings += padded.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
        i = end + 1
      } else if (c == '>') {
        i += 1 // '>>' dict close
      } else if (c == '/') {
        var j = i + 1
        while (j < n && !isDelim(content.charAt(j))) j += 1
        lastName = content.substring(i + 1, j)
        i = j
      } else if (c == '[' || c == ']' || c == '{' || c == '}') {
        i += 1
      } else if (c.isWhitespace) {
        i += 1
      } else if (c == '%') { // comment to end-of-line
        while (i < n && content.charAt(i) != '\n' && content.charAt(i) != '\r') i += 1
      } else if (c.isDigit || c == '+' || c == '-' || c == '.') {
        var j = i + 1
        while (j < n && (content.charAt(j).isDigit || content.charAt(j) == '.')) j += 1
        i = j
      } else {
        // operator token: letters plus ' " *
        var j = i
        while (j < n && !isDelim(content.charAt(j))) j += 1
        val op = content.substring(i, math.max(j, i + 1))
        onOperator(op)
        i = math.max(j, i + 1)
      }
    }
    sb.toString
  }

  private def isDelim(c: Char): Boolean =
    c.isWhitespace || c == '(' || c == ')' || c == '<' || c == '>' ||
      c == '[' || c == ']' || c == '{' || c == '}' || c == '/' || c == '%'

  /** PDF literal string: nested parens, backslash escapes, octal codes. */
  private def parseLiteralString(s: String, start: Int): (Array[Byte], Int) = {
    val buf = new java.io.ByteArrayOutputStream()
    var depth = 1
    var i = start + 1
    val n = s.length
    while (i < n && depth > 0) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < n) {
        val e = s.charAt(i + 1)
        e match {
          case 'n' => buf.write('\n'); i += 2
          case 'r' => buf.write('\r'); i += 2
          case 't' => buf.write('\t'); i += 2
          case 'b' => buf.write('\b'); i += 2
          case 'f' => buf.write('\f'); i += 2
          case '(' => buf.write('('); i += 2
          case ')' => buf.write(')'); i += 2
          case '\\' => buf.write('\\'); i += 2
          case '\r' => i += 2; if (i < n && s.charAt(i) == '\n') i += 1 // line continuation
          case '\n' => i += 2
          case d if d >= '0' && d <= '7' =>
            var j = i + 1
            var v = 0
            while (j < n && j < i + 4 && s.charAt(j) >= '0' && s.charAt(j) <= '7') {
              v = v * 8 + (s.charAt(j) - '0'); j += 1
            }
            buf.write(v & 0xFF); i = j
          case _ => buf.write(e.toInt); i += 2
        }
      } else if (c == '(') { depth += 1; buf.write(c.toInt); i += 1 }
      else if (c == ')') {
        depth -= 1
        if (depth > 0) buf.write(c.toInt)
        i += 1
      } else { buf.write(c.toInt); i += 1 }
    }
    (buf.toByteArray, i)
  }

  /** Decode raw string bytes through the current font. */
  private def decodeString(bytes: Array[Byte], font: Font): String = {
    val sb = new StringBuilder
    if (font.twoByte) {
      var i = 0
      while (i + 1 < bytes.length) {
        val code = ((bytes(i) & 0xFF) << 8) | (bytes(i + 1) & 0xFF)
        font.map.get(code).foreach(sb.append)
        i += 2
      }
    } else {
      var i = 0
      while (i < bytes.length) {
        val code = bytes(i) & 0xFF
        font.map.get(code) match {
          case Some(u) => sb.append(u)
          case None =>
            // Latin-1 printables as the no-CMap fallback
            if ((code >= 0x20 && code < 0x7F) || code >= 0xA0) sb.append(code.toChar)
            else if (code == '\n' || code == '\r' || code == '\t') sb.append(code.toChar)
        }
        i += 1
      }
    }
    sb.toString
  }
}
