package graft.sources

import java.io.ByteArrayInputStream
import java.nio.charset.StandardCharsets
import java.util.zip.{Inflater, ZipInputStream}

import scala.collection.mutable
import scala.util.matching.Regex

import org.w3c.dom.{Element, Node}

/** Pure-JDK extractors for the reference's binary document formats
  * (reference: src/document_loader.py:86-167). The container has no
  * pdfbox/POI, but none are needed for the observable contract:
  *
  *  - DOCX/XLSX/PPTX are OOXML — ZIP archives (java.util.zip) of XML
  *    parts (javax.xml DOM). Paragraph/table/sheet/slide traversal maps
  *    1:1 onto the reference's python-docx/openpyxl/python-pptx loops.
  *  - PDF text extraction covers the text-bearing filters — none,
  *    FlateDecode (java.util.zip.Inflater), LZWDecode (TIFF-variant
  *    early-change LZW, implemented below), RunLengthDecode,
  *    ASCIIHexDecode and ASCII85Decode — plus literal/hex strings and
  *    Tj/TJ show ops. Image-only filters (DCTDecode/JPXDecode/
  *    CCITTFaxDecode/JBIG2Decode) are detected and yield NO text rather
  *    than garbled bytes. PDF 1.5+ object streams (/ObjStm — the
  *    compressed container modern writers pack catalog/page dicts into)
  *    are unpacked. Standard-security (RC4, AES-128, or AES-256; empty
  *    user password) PDFs decrypt in place — a superset of the class
  *    PyPDF2 opens without pycryptodome; password-protected and
  *    public-key-encrypted documents extract as "" and are COUNTED via
  *    the loader's audit accumulators, so the loss is measured, never
  *    silent. Exotic text encodings remain out of scope (a cluster
  *    deployment swaps in pdfbox here, same signature).
  *
  * All extractors are total: malformed input yields "" (the reference
  * logs and returns the empty accumulator, document_loader.py:95-101),
  * so a corrupt file drops out of the corpus instead of failing the job.
  */
object Codecs {

  // ---- shared: ZIP + XML --------------------------------------------

  private def zipEntries(bytes: Array[Byte]): Map[String, Array[Byte]] = {
    val zin = new ZipInputStream(new ByteArrayInputStream(bytes))
    val out = Map.newBuilder[String, Array[Byte]]
    // a corrupt entry (bad deflate data, truncated archive) ends the
    // walk but keeps every entry already read — drop-not-fail salvage,
    // same contract as the PDF object-graph walk
    try {
      var e = zin.getNextEntry
      while (e != null) {
        if (!e.isDirectory) out += e.getName -> zin.readAllBytes()
        e = zin.getNextEntry
      }
    } catch { case scala.util.control.NonFatal(_) => () }
    finally zin.close()
    out.result()
  }

  /** Totality guard for the public extractors: the file contract is
    * "malformed input yields ''", at THIS level, not only under
    * DocumentLoader.safely — fuzzed mutation suites pin it.
    */
  private def total(body: => String): String =
    try body catch { case scala.util.control.NonFatal(_) => "" }

  private def parseXml(bytes: Array[Byte]): Element = {
    val f = javax.xml.parsers.DocumentBuilderFactory.newInstance()
    f.setNamespaceAware(true)
    // no DTDs/external entities in OOXML parts; disable resolution
    f.setFeature("http://apache.org/xml/features/nonvalidating/load-external-dtd", false)
    f.setExpandEntityReferences(false)
    f.newDocumentBuilder().parse(new ByteArrayInputStream(bytes)).getDocumentElement
  }

  private def local(n: Node): String =
    Option(n.getLocalName).getOrElse(n.getNodeName.split(':').last)

  private def children(e: Element): Seq[Element] = {
    val nl = e.getChildNodes
    (0 until nl.getLength).map(nl.item).collect { case el: Element => el }
  }

  private def descendants(e: Element, name: String): Seq[Element] = {
    val nl = e.getElementsByTagNameNS("*", name)
    val ns = (0 until nl.getLength).map(nl.item).collect { case el: Element => el }
    if (ns.nonEmpty) ns
    else { // non-namespaced fallback
      val nl2 = e.getElementsByTagName(name)
      (0 until nl2.getLength).map(nl2.item).collect { case el: Element => el }
    }
  }

  /** Concatenated text of all descendant `t` elements (w:t / a:t / t). */
  private def runText(e: Element): String =
    descendants(e, "t").map(_.getTextContent).mkString

  // ---- DOCX (document_loader.py:104-127) ----------------------------

  /** Body paragraphs first (python-docx `doc.paragraphs` is body-level
    * only), then every table flattened to pipe-joined rows.
    */
  def extractDocx(bytes: Array[Byte]): String = total {
    val parts = zipEntries(bytes)
    val body = parts.get("word/document.xml") match {
      case Some(xml) => descendants(parseXml(xml), "body").headOption
      case None => None
    }
    body.fold("") { b =>
      val out = mutable.Buffer.empty[String]
      val kids = children(b)
      for (p <- kids if local(p) == "p") {
        val t = runText(p)
        if (t.trim.nonEmpty) out += t
      }
      for (tbl <- kids if local(tbl) == "tbl"; tr <- descendants(tbl, "tr")) {
        val cells = children(tr).filter(c => local(c) == "tc")
          .map(tc => descendants(tc, "p").map(runText).mkString("\n").trim)
        val row = cells.mkString(" | ")
        if (row.trim.nonEmpty) out += row
      }
      out.mkString("\n")
    }
  }

  // ---- XLSX (document_loader.py:129-149) ----------------------------

  /** Sheets in workbook order via the rels part; cell values resolve
    * shared/inline strings; `--- Sheet: name ---` markers + pipe-joined
    * non-empty cells per row, as openpyxl's values_only iteration.
    */
  def extractXlsx(bytes: Array[Byte]): String = total {
    val parts = zipEntries(bytes)
    val wbXml = parts.getOrElse("xl/workbook.xml", return "")
    val rels: Map[String, String] =
      parts.get("xl/_rels/workbook.xml.rels").fold(Map.empty[String, String]) { rx =>
        descendants(parseXml(rx), "Relationship")
          .map(r => r.getAttribute("Id") -> r.getAttribute("Target")).toMap
      }
    val shared: IndexedSeq[String] =
      parts.get("xl/sharedStrings.xml").fold(IndexedSeq.empty[String]) { sx =>
        descendants(parseXml(sx), "si").map(runText).toIndexedSeq
      }
    def cellValue(c: Element): Option[String] = {
      val v = descendants(c, "v").headOption.map(_.getTextContent)
      c.getAttribute("t") match {
        case "s" => v.flatMap(i => shared.lift(i.trim.toInt))
        case "inlineStr" => Some(runText(c)).filter(_.nonEmpty)
        case "b" => v.map(x => if (x.trim == "1") "True" else "False")
        case _ => v
      }
    }
    val out = mutable.Buffer.empty[String]
    for (sheet <- descendants(parseXml(wbXml), "sheet")) {
      val rid = (0 until sheet.getAttributes.getLength).map(sheet.getAttributes.item)
        .find(a => local(a) == "id").map(_.getNodeValue).getOrElse("")
      val target = rels.get(rid).map(t =>
        if (t.startsWith("/")) t.drop(1) else s"xl/$t")
      out += s"--- Sheet: ${sheet.getAttribute("name")} ---"
      for (wsXml <- target.flatMap(parts.get); row <- descendants(parseXml(wsXml), "row")) {
        val cells = children(row).filter(c => local(c) == "c").flatMap(cellValue)
        val rowText = cells.map(_.trim).mkString(" | ")
        if (rowText.trim.nonEmpty) out += rowText
      }
    }
    out.mkString("\n")
  }

  // ---- PPTX (document_loader.py:151-167) ----------------------------

  /** Slides in numeric order; every text body's paragraphs joined by
    * newline (python-pptx `shape.text`), under `--- Slide N ---`.
    */
  def extractPptx(bytes: Array[Byte]): String = total {
    val parts = zipEntries(bytes)
    val slideRe: Regex = """ppt/slides/slide(\d+)\.xml""".r
    val slides = parts.keys.collect { case n @ slideRe(i) => (i.toInt, n) }.toSeq.sorted
    val out = mutable.Buffer.empty[String]
    for (((_, name), idx) <- slides.zipWithIndex) {
      out += s"--- Slide ${idx + 1} ---"
      for (tx <- descendants(parseXml(parts(name)), "txBody")) {
        val text = descendants(tx, "p").map(runText).mkString("\n")
        if (text.trim.nonEmpty) out += text
      }
    }
    out.mkString("\n")
  }

  // ---- PDF (document_loader.py:86-102) ------------------------------

  /** AES-CBC decrypt for /CFM /AESV2 payloads (ISO 32000-1 §7.6.2):
    * the first 16 bytes of the stored data are the IV, the rest is the
    * CBC ciphertext, and the plaintext carries RFC 2898 (PKCS#7)
    * padding — always 1–16 bytes, stripped here with a tolerance
    * clause (an out-of-range pad byte means a corrupt tail; keep the
    * bytes rather than throw, per the drop-not-fail contract).
    * Malformed lengths (no room for an IV, ragged blocks) decrypt to
    * empty for the same reason.
    */
  private[graft] def aesCbcDecrypt(key: Array[Byte],
      data: Array[Byte]): Array[Byte] = {
    if (data.length < 32 || (data.length - 16) % 16 != 0)
      return Array.emptyByteArray
    val c = javax.crypto.Cipher.getInstance("AES/CBC/NoPadding")
    c.init(javax.crypto.Cipher.DECRYPT_MODE,
      new javax.crypto.spec.SecretKeySpec(key, "AES"),
      new javax.crypto.spec.IvParameterSpec(data, 0, 16))
    val out = c.doFinal(data, 16, data.length - 16)
    val pad = out(out.length - 1) & 0xff
    if (pad >= 1 && pad <= 16 && pad <= out.length) out.dropRight(pad) else out
  }

  /** Per-object key salt for AESV2 — the literal bytes "sAlT"
    * (§7.6.2 Algorithm 1 step b).
    */
  private val AesSalt: Array[Byte] =
    Array(0x73, 0x41, 0x6c, 0x54).map(_.toByte)

  /** ISO 32000-2 §7.6.4.3.4 Algorithm 2.B — the SHA-2 password hash of
    * the AES-256 handler. R5 (the deprecated Adobe extension) is the
    * plain SHA-256 of password+salt+udata; R6 adds the hardening loop:
    * encrypt 64 repetitions of (password ‖ K ‖ udata) with
    * AES-128-CBC keyed from K, pick SHA-256/384/512 by the first
    * 16 bytes of the ciphertext mod 3, and stop after ≥64 rounds once
    * the last ciphertext byte ≤ rounds − 32. Returns 32 bytes.
    */
  private[graft] def hash2B(password: Array[Byte], salt: Array[Byte],
      udata: Array[Byte], r: Int): Array[Byte] = {
    def sha(name: String, parts: Array[Byte]*): Array[Byte] = {
      val d = java.security.MessageDigest.getInstance(name)
      parts.foreach(d.update)
      d.digest()
    }
    var k = sha("SHA-256", password, salt, udata)
    if (r == 5) return k
    var rounds = 0
    var done = false
    while (!done) {
      val block = password ++ k ++ udata
      val k1 = new Array[Byte](block.length * 64)
      var i = 0
      while (i < 64) {
        System.arraycopy(block, 0, k1, i * block.length, block.length); i += 1
      }
      val c = javax.crypto.Cipher.getInstance("AES/CBC/NoPadding")
      c.init(javax.crypto.Cipher.ENCRYPT_MODE,
        new javax.crypto.spec.SecretKeySpec(k, 0, 16, "AES"),
        new javax.crypto.spec.IvParameterSpec(k, 16, 16))
      val e = c.doFinal(k1)
      // first 16 bytes as a big-endian integer mod 3 ≡ byte sum mod 3
      // (256 ≡ 1 mod 3)
      val mod = e.take(16).foldLeft(0)((a, b) => (a + (b & 0xff)) % 3)
      k = sha(mod match {
        case 0 => "SHA-256"; case 1 => "SHA-384"; case _ => "SHA-512"
      }, e)
      rounds += 1
      if (rounds >= 64 && (e(e.length - 1) & 0xff) <= rounds - 32) done = true
    }
    k.take(32)
  }

  /** Raw AES-CBC-NoPadding decrypt with an explicit IV — the /UE → file
    * key unwrap of the AES-256 handler (32-byte ciphertext, zero IV, no
    * padding layer).
    */
  private[graft] def aesCbcRawDecrypt(key: Array[Byte], iv: Array[Byte],
      data: Array[Byte]): Array[Byte] = {
    if (data.isEmpty || data.length % 16 != 0) return Array.emptyByteArray
    val c = javax.crypto.Cipher.getInstance("AES/CBC/NoPadding")
    c.init(javax.crypto.Cipher.DECRYPT_MODE,
      new javax.crypto.spec.SecretKeySpec(key, "AES"),
      new javax.crypto.spec.IvParameterSpec(iv))
    c.doFinal(data)
  }

  private val Latin1 = StandardCharsets.ISO_8859_1 // byte-faithful round-trip

  /** Outcome of the per-document encryption check, reported to the
    * loader's audit accumulators so encrypted losses are measured, not
    * silent (reference analog: PyPDF2 opens standard-security PDFs with
    * an empty user password, document_loader.py:86-102).
    */
  sealed trait PdfEncryption
  case object PdfNotEncrypted extends PdfEncryption
  /** Standard security, empty user password — decrypted in place.
    * Covers the full standard-handler ladder: RC4 40/128-bit (V1/V2,
    * R2/R3), AES-128 (V4/R4, /CFM /AESV2 or RC4-under-V4 /V2), and
    * AES-256 (V5, R5 and R6 — the SHA-2 Algorithm 2.B handler).
    */
  case object PdfDecrypted extends PdfEncryption
  /** A set user password, a public-key (PubSec) handler, or a
    * malformed /Encrypt dict — extracts as "" under the drop-not-fail
    * contract.
    *
    * Round 12 closed both AES gaps (AES-128 V4/AESV2 = RC4's Algorithm
    * 2 key schedule plus the sAlT suffix; AES-256 V5/R5-R6 = the SHA-2
    * Algorithm 2.B hash with the /UE file-key unwrap — JDK javax.crypto
    * covers every CBC layer). The reference's PyPDF2 can read NONE of
    * the AES variants without pycryptodome (document_loader.py:86-102),
    * so this is parity-plus; what remains out of scope is genuinely
    * unreadable without credentials or certificates, and the
    * `pdf_encrypted_unsupported` accumulator (surfaced per Bench/Soak
    * run) still measures those losses.
    */
  case object PdfEncryptedUnsupported extends PdfEncryption

  /** Per-page text under `--- Page N ---` markers; empty pages dropped
    * (PyPDF2 loop, document_loader.py:93-99).
    */
  def extractPdf(bytes: Array[Byte]): String = extractPdf(bytes, _ => ())

  def extractPdf(bytes: Array[Byte], onEncryption: PdfEncryption => Unit): String = total {
    val s = new String(bytes, Latin1)
    val objRe = """(?s)(\d+)\s+(\d+)\s+obj\b(.*?)endobj""".r
    // pass 1 — obj number -> (gen, dict text, raw stream bytes, still
    // encrypted/encoded): decryption must run BEFORE the filter chain,
    // and whether to decrypt is known only after the whole graph is read
    val rawObjs = mutable.LinkedHashMap.empty[Int, (Int, String, Option[Array[Byte]])]
    for (m <- objRe.findAllMatchIn(s)) {
      val body = m.group(3)
      val si = body.indexOf("stream")
      if (si < 0) rawObjs(m.group(1).toInt) = (m.group(2).toInt, body, None)
      else {
        val dict = body.substring(0, si)
        var start = si + "stream".length
        if (start < body.length && body.charAt(start) == '\r') start += 1
        if (start < body.length && body.charAt(start) == '\n') start += 1
        val end = body.lastIndexOf("endstream")
        val raw = body.substring(start, math.max(start, end))
          .stripSuffix("\n").stripSuffix("\r").getBytes(Latin1)
        rawObjs(m.group(1).toInt) = (m.group(2).toInt, dict, Some(raw))
      }
    }
    val decrypt: (Int, Int, Array[Byte]) => Array[Byte] =
      emptyPasswordDecryptor(s, rawObjs) match {
        case Some(None) => onEncryption(PdfNotEncrypted); (_, _, d) => d
        case Some(Some(fn)) => onEncryption(PdfDecrypted); fn
        case None => onEncryption(PdfEncryptedUnsupported); return ""
      }
    // pass 2: decrypt (when applicable) then apply the /Filter chain
    val objs = mutable.LinkedHashMap.empty[Int, (String, Option[Array[Byte]])]
    for ((num, (gen, dict, rawOpt)) <- rawObjs)
      objs(num) = (dict, rawOpt.map(raw => decodeStream(dict, decrypt(num, gen, raw))))
    // PDF 1.5+ object streams: dict-only objects (catalog/pages/page)
    // packed inside a compressed /ObjStm container — the layout modern
    // writers emit. Unpack them into the object map: the decompressed
    // payload is `N` (objnum, offset) int pairs, then the object bodies
    // starting at /First. Content streams cannot live inside an ObjStm
    // (ISO 32000-1 §7.5.7), so (dict, None) entries suffice.
    for ((_, (dict, Some(data))) <- objs.toSeq
         if """/Type\s*/ObjStm""".r.findFirstIn(dict).isDefined) {
      val txt = new String(data, Latin1)
      val nObjs = """/N\s+(\d+)""".r.findFirstMatchIn(dict)
        .map(_.group(1).toInt).getOrElse(0)
      val first = """/First\s+(\d+)""".r.findFirstMatchIn(dict)
        .map(_.group(1).toInt).getOrElse(0)
      if (nObjs > 0 && first > 0 && first <= txt.length) {
        val header = txt.substring(0, first).trim
          .split("""\s+""").filter(_.nonEmpty)
        val entries = header.grouped(2).take(nObjs).collect {
          case Array(num, off) if num.forall(_.isDigit) && off.forall(_.isDigit) =>
            (num.toInt, off.toInt)
        }.toSeq
        entries.zipWithIndex.foreach { case ((num, off), i) =>
          val start = math.min(first + off, txt.length)
          val end =
            if (i + 1 < entries.length) math.min(first + entries(i + 1)._2, txt.length)
            else txt.length
          if (start < end && !objs.contains(num))
            objs(num) = (txt.substring(start, end), None)
        }
      }
    }
    val refRe = """(\d+)\s+0\s+R""".r
    val pageOrder: Seq[Int] = {
      val kids = objs.values.collectFirst {
        case (d, _) if d.contains("/Kids") && """/Type\s*/Pages\b""".r.findFirstIn(d).isDefined =>
          val ks = d.substring(d.indexOf("/Kids"))
          val close = ks.indexOf(']')
          refRe.findAllMatchIn(if (close >= 0) ks.substring(0, close + 1) else ks)
            .map(_.group(1).toInt).toSeq
      }
      kids.filter(_.nonEmpty).getOrElse(objs.collect {
        case (n, (d, _)) if """/Type\s*/Page(?![a-zA-Z])""".r.findFirstIn(d).isDefined => n
      }.toSeq)
    }
    val pages = pageOrder.flatMap(objs.get).collect {
      case (d, _) if """/Type\s*/Page(?![a-zA-Z])""".r.findFirstIn(d).isDefined =>
        // /Contents is one ref or an array of refs; stop at the array's
        // close bracket (or the first ref) so later dict refs
        // (/Parent, /Annots) aren't misread as content streams
        val ci = d.indexOf("/Contents")
        val contentRefs: Seq[Int] =
          if (ci < 0) Seq.empty
          else {
            val rest = d.substring(ci + "/Contents".length)
            val trimmed = rest.dropWhile(_.isWhitespace)
            if (trimmed.startsWith("[")) {
              val close = trimmed.indexOf(']')
              refRe.findAllMatchIn(if (close >= 0) trimmed.substring(1, close) else trimmed)
                .map(_.group(1).toInt).toSeq
            } else refRe.findFirstMatchIn(trimmed).map(_.group(1).toInt).toSeq
          }
        contentRefs
          .flatMap(n => objs.get(n).flatMap(_._2))
          .map(b => streamText(new String(b, Latin1)))
          .mkString("\n")
    }
    pages.zipWithIndex.collect {
      case (t, i) if t.trim.nonEmpty => s"--- Page ${i + 1} ---\n$t"
    }.mkString("\n")
  }

  // ---- PDF standard security handler (ISO 32000-1 §7.6.3) -----------

  /** The 32-byte password pad of Algorithm 2 — an empty user password
    * IS this pad.
    */
  private val PasswordPad: Array[Byte] = Array(
    0x28, 0xBF, 0x4E, 0x5E, 0x4E, 0x75, 0x8A, 0x41, 0x64, 0x00, 0x4E, 0x56,
    0xFF, 0xFA, 0x01, 0x08, 0x2E, 0x2E, 0x00, 0xB6, 0xD0, 0x68, 0x3E, 0x80,
    0x2F, 0x0C, 0xA9, 0xFE, 0x64, 0x53, 0x69, 0x7A).map(_.toByte)

  private def md5(parts: Array[Byte]*): Array[Byte] = {
    val d = java.security.MessageDigest.getInstance("MD5")
    parts.foreach(d.update)
    d.digest()
  }

  /** RC4 — the legacy PDF stream cipher, needed to READ standard-
    * security documents; ~15 lines from the published key-schedule +
    * PRGA description.
    */
  private[graft] def rc4(key: Array[Byte], data: Array[Byte]): Array[Byte] = {
    val st = Array.tabulate(256)(_.toByte)
    var j = 0
    var i = 0
    while (i < 256) {
      j = (j + st(i) + key(i % key.length)) & 0xff
      val t = st(i); st(i) = st(j); st(j) = t
      i += 1
    }
    val out = new Array[Byte](data.length)
    i = 0; j = 0
    var x = 0
    while (x < data.length) {
      i = (i + 1) & 0xff
      j = (j + st(i)) & 0xff
      val t = st(i); st(i) = st(j); st(j) = t
      out(x) = (data(x) ^ st((st(i) + st(j)) & 0xff)).toByte
      x += 1
    }
    out
  }

  /** Integer value of `/Key n` in a dict (name-boundary guarded). */
  private def intVal(dict: String, key: String): Option[Int] =
    ("""/""" + key + """(?![A-Za-z0-9])\s*(-?\d+)""").r
      .findFirstMatchIn(dict).map(_.group(1).toInt)

  /** PDF string (literal with escapes, or hex) starting at or after
    * `pos` in `text` — used for the /O and /U entries and the file ID.
    */
  private def pdfStringAt(text: String, pos: Int): Option[Array[Byte]] = {
    var i = pos
    while (i < text.length && text.charAt(i).isWhitespace) i += 1
    if (i >= text.length) None
    else if (text.charAt(i) == '(') {
      val out = new java.io.ByteArrayOutputStream
      var depth = 1
      i += 1
      while (i < text.length && depth > 0) {
        text.charAt(i) match {
          case '\\' if i + 1 < text.length =>
            text.charAt(i + 1) match {
              case 'n' => out.write('\n'); i += 2
              case 'r' => out.write('\r'); i += 2
              case 't' => out.write('\t'); i += 2
              case 'b' => out.write('\b'); i += 2
              case 'f' => out.write('\f'); i += 2
              case c @ ('(' | ')' | '\\') => out.write(c); i += 2
              case c if c.isDigit =>
                val end = math.min(i + 4, text.length)
                var j = i + 1
                while (j < end && text.charAt(j).isDigit && j - i <= 3) j += 1
                out.write(Integer.parseInt(text.substring(i + 1, j), 8))
                i = j
              case '\n' => i += 2
              case c => out.write(c); i += 2
            }
          case '(' => depth += 1; out.write('('); i += 1
          case ')' =>
            depth -= 1
            if (depth > 0) out.write(')')
            i += 1
          case c => out.write(c); i += 1
        }
      }
      Some(out.toByteArray)
    } else if (text.charAt(i) == '<') {
      val end = text.indexOf('>', i)
      if (end < 0) None
      else {
        val hex = text.substring(i + 1, end).filterNot(_.isWhitespace)
        // non-hex garbage inside the string (corrupt file) → malformed,
        // not an exception: callers degrade to the unsupported path
        if (!hex.forall(c => Character.digit(c, 16) >= 0)) None
        else {
          val padded = if (hex.length % 2 == 1) hex + "0" else hex
          Some(padded.grouped(2).map(h => Integer.parseInt(h, 16).toByte).toArray)
        }
      }
    } else None
  }

  /** Index of name token `key` scanned OUTSIDE string values: the 32
    * binary bytes of a literal-string /O value can contain the ASCII
    * sequence "/U" (or vice versa), so a raw indexOf could bind inside
    * the other entry's payload and read garbage. Literal strings
    * (balanced parens with backslash escapes) and hex strings are
    * skipped wholesale while scanning.
    */
  private def keyIndexOutsideStrings(dict: String, key: String): Int = {
    var i = 0
    while (i < dict.length) {
      dict.charAt(i) match {
        case '(' =>
          var depth = 1; i += 1
          while (i < dict.length && depth > 0) {
            dict.charAt(i) match {
              case '\\' => i += 2
              case '(' => depth += 1; i += 1
              case ')' => depth -= 1; i += 1
              case _ => i += 1
            }
          }
        case '<' =>
          if (i + 1 < dict.length && dict.charAt(i + 1) == '<') i += 2 // dict open, not a hex string
          else {
            val e = dict.indexOf('>', i)
            i = if (e < 0) dict.length else e + 1
          }
        case _ =>
          if (dict.startsWith(key, i) &&
            (i + key.length >= dict.length ||
              !dict.charAt(i + key.length).isLetterOrDigit)) return i
          i += 1
      }
    }
    -1
  }

  private def pdfString(dict: String, key: String): Option[Array[Byte]] = {
    val ki = keyIndexOutsideStrings(dict, key)
    if (ki < 0) None else pdfStringAt(dict, ki + key.length)
  }

  /** First element of the trailer /ID array (part of the key salt). */
  private def docId(s: String): Option[Array[Byte]] =
    """(?s)/ID\s*\[""".r.findFirstMatchIn(s).flatMap(m => pdfStringAt(s, m.end))

  /** Algorithm 2: the file encryption key for the (padded) empty user
    * password; `n` = key length in bytes.
    */
  private def fileKey(o: Array[Byte], p: Int, id0: Array[Byte], r: Int,
      n: Int, encryptMetadata: Boolean = true): Array[Byte] = {
    val pB = Array(p.toByte, (p >> 8).toByte, (p >> 16).toByte, (p >> 24).toByte)
    // step f: for R ≥ 4 with /EncryptMetadata false, four 0xFF bytes
    // join the hash input
    val noMeta =
      if (r >= 4 && !encryptMetadata) Array.fill(4)(0xff.toByte)
      else Array.emptyByteArray
    var h = md5(PasswordPad, o.padTo(32, 0.toByte).take(32), pB, id0, noMeta)
    if (r >= 3) for (_ <- 0 until 50) h = md5(h.take(n))
    h.take(n)
  }

  /** Algorithms 4/5 (check side of 6): does the /U entry match the
    * empty user password under `key`?
    */
  private def emptyPasswordMatches(key: Array[Byte], u: Array[Byte],
      id0: Array[Byte], r: Int): Boolean =
    if (r == 2) java.util.Arrays.equals(rc4(key, PasswordPad), u.take(32))
    else {
      var x = rc4(key, md5(PasswordPad, id0))
      for (i <- 1 to 19) x = rc4(key.map(b => (b ^ i).toByte), x)
      java.util.Arrays.equals(x, u.take(16))
    }

  /** Encryption probe + decryptor builder. None = encrypted but out of
    * scope (AES-256/V5, set password, malformed); Some(None) = not
    * encrypted; Some(Some(fn)) = per-object decryptor (RC4 for
    * V1/V2/R2-3 and V4+/CFM /V2, AES-128-CBC for V4+/CFM /AESV2) for
    * the empty user password.
    */
  private def emptyPasswordDecryptor(s: String,
      objs: mutable.LinkedHashMap[Int, (Int, String, Option[Array[Byte]])])
      : Option[Option[(Int, Int, Array[Byte]) => Array[Byte]]] = {
    // Last match wins: an incrementally-updated PDF appends a new trailer
    // at the end, so the final /Encrypt reference is the current one (and
    // a first-match bind inside stale or stream bytes is avoided). The
    // scan is restricted to trailer dictionaries — the bounded text after
    // each 'trailer' keyword up to its 'startxref' — because raw stream
    // bytes can also match the reference regex, and with a GLOBAL last
    // match such bytes after the final trailer would beat the real entry
    // and misclassify a readable PDF as encrypted (ADVICE r9).
    // Cross-reference-stream PDFs carry /Encrypt in the xref stream dict
    // instead of a 'trailer' keyword, so no-trailer files keep the old
    // whole-file scan.
    val encRe = """/Encrypt\s+(\d+)\s+\d+\s+R""".r
    val trailerRegions = """(?s)trailer(.{0,2048}?)(?:startxref|\z)""".r
      .findAllMatchIn(s).map(_.group(1)).toSeq
    val scanTargets = if (trailerRegions.nonEmpty) trailerRegions else Seq(s)
    val encNum = scanTargets.iterator
      .flatMap(t => encRe.findAllMatchIn(t))
      .foldLeft(Option.empty[Int])((_, m) => Some(m.group(1).toInt))
    encNum match {
      case None => Some(None)
      case Some(num) =>
        val supported = for {
          (_, dict, _) <- objs.get(num)
          if """/Filter\s*/Standard""".r.findFirstIn(dict).isDefined
          v = intVal(dict, "V").getOrElse(0)
          r <- intVal(dict, "R")
          if ((v == 1 || v == 2) && (r == 2 || r == 3)) || (v == 4 && r == 4)
          // V4 introduces crypt filters: the method name decides the
          // stream cipher (AESV2 = AES-128-CBC, V2 = RC4 under the V4
          // key schedule); pre-V4 documents are always RC4
          cfm <- if (v < 4) Some("V2")
                 else """/CFM\s*/(AESV2|V2)(?![A-Za-z0-9])""".r
                   .findFirstMatchIn(dict).map(_.group(1))
          encMeta = """/EncryptMetadata\s+false""".r.findFirstIn(dict).isEmpty
          o <- pdfString(dict, "/O")
          u <- pdfString(dict, "/U")
          p <- intVal(dict, "P")
          // Spec range is 40–128 bits (5–16 bytes); a malformed /Length 0
          // would make rc4 divide by key.length — degrade to the
          // PdfEncryptedUnsupported path like other malformed variants so
          // the "all extractors are total" contract holds. V4 dicts may
          // carry /Length only inside the crypt-filter subdictionary
          // (and there in BYTES) — accept a top-level bits value when
          // plausible, else AESV2's defined 128 bits.
          n = if (r == 2) 5
              else if (v == 4) intVal(dict, "Length").filter(_ >= 40)
                .map(_ / 8).getOrElse(16)
              else intVal(dict, "Length").getOrElse(40) / 8
          if n >= 5 && n <= 16
          key = fileKey(o, p, docId(s).getOrElse(Array.emptyByteArray), r, n,
            encMeta)
          if emptyPasswordMatches(key, u, docId(s).getOrElse(Array.emptyByteArray), r)
        } yield (objNum: Int, gen: Int, data: Array[Byte]) => {
          // Algorithm 1: per-object key = MD5(file key + low obj/gen
          // bytes [+ sAlT for AESV2])
          val objNumGen = Array(objNum.toByte, (objNum >> 8).toByte,
            (objNum >> 16).toByte, gen.toByte, (gen >> 8).toByte)
          val salt = if (cfm == "AESV2") AesSalt else Array.emptyByteArray
          val objKey = md5(key, objNumGen, salt).take(math.min(n + 5, 16))
          if (cfm == "AESV2") aesCbcDecrypt(objKey, data)
          else rc4(objKey, data)
        }
        // AES-256 (V5/R5-R6, /CFM /AESV3): a different handler — SHA-2
        // password hash (Algorithm 2.B), file key unwrapped from /UE
        // with a zero IV, and NO per-object key derivation (§7.6.4: the
        // file key encrypts every string and stream directly)
        val supportedV5 = for {
          (_, dict, _) <- objs.get(num)
          if """/Filter\s*/Standard""".r.findFirstIn(dict).isDefined
          v = intVal(dict, "V").getOrElse(0)
          r <- intVal(dict, "R")
          if v == 5 && (r == 5 || r == 6)
          if """/CFM\s*/AESV3(?![A-Za-z0-9])""".r.findFirstIn(dict).isDefined
          u <- pdfString(dict, "/U")
          ue <- pdfString(dict, "/UE")
          if u.length >= 48 && ue.length >= 32
          // Algorithm 6: validate the empty user password against
          // U[0:32] with U[32:40] as the validation salt
          if java.util.Arrays.equals(
            hash2B(Array.emptyByteArray, u.slice(32, 40),
              Array.emptyByteArray, r), u.take(32))
          // Algorithm 8 (read side): intermediate key from the key salt
          // U[40:48], file key = AES-256-CBC-NoPadding(UE, iv = 0)
          fk = aesCbcRawDecrypt(
            hash2B(Array.emptyByteArray, u.slice(40, 48),
              Array.emptyByteArray, r),
            new Array[Byte](16), ue.take(32))
        } yield (_: Int, _: Int, data: Array[Byte]) => aesCbcDecrypt(fk, data)
        supported.orElse(supportedV5).map(fn => Some(fn))
    }
  }

  /** Filters that encode raster/image data — a stream carrying one has
    * no text to show, so it decodes to empty rather than garbage
    * reaching the Tj scanner (PyPDF2 likewise skips image XObjects).
    */
  private val ImageFilters =
    Seq("/DCTDecode", "/JPXDecode", "/CCITTFaxDecode", "/JBIG2Decode")

  /** The /Filter entry: a single name or an array of names applied in
    * listed order (ISO 32000-1 §7.3.8.2 — first name decodes the raw
    * stream bytes, each next name decodes the previous output).
    */
  private val FilterRe: Regex = """/Filter\s*(\[[^\]]*\]|/[A-Za-z0-9]+)""".r
  private val NameRe: Regex = """/[A-Za-z0-9]+""".r

  private def filterNames(dict: String): Seq[String] =
    FilterRe.findFirstMatchIn(dict)
      .map(m => NameRe.findAllIn(m.group(1)).toSeq)
      .getOrElse(Seq.empty)

  /** Apply the stream's /Filter pipeline in array order for the
    * text-bearing filters; unknown names pass through unchanged (their
    * output never parses as Tj text, so they degrade to empty pages,
    * not garbage).
    */
  private def decodeStream(dict: String, raw: Array[Byte]): Array[Byte] = {
    val filters = filterNames(dict)
    if (filters.exists(ImageFilters.contains)) Array.emptyByteArray
    else filters.foldLeft(raw) { (data, f) =>
      f match {
        case "/ASCIIHexDecode" => asciiHexDecode(data)
        case "/ASCII85Decode" => ascii85Decode(data)
        case "/FlateDecode" => inflate(data)
        case "/LZWDecode" => lzwDecode(data)
        case "/RunLengthDecode" => runLengthDecode(data)
        case _ => data
      }
    }
  }

  /** PDF LZW (ISO 32000-1 §7.4.4): TIFF-variant LZW — 9→12-bit codes
    * MSB-first, 256 = clear-table, 257 = EOD, default EarlyChange=1
    * (the code width grows one code earlier than the table size alone
    * would demand, because the decoder's table lags the encoder's by
    * one entry). Corrupt input decodes to empty, never throws.
    */
  private[graft] def lzwDecode(data: Array[Byte]): Array[Byte] =
    try {
      val out = new java.io.ByteArrayOutputStream(math.max(64, data.length * 3))
      val table = new mutable.ArrayBuffer[Array[Byte]](4096)
      def reset(): Unit = {
        table.clear()
        var i = 0
        while (i < 256) { table += Array(i.toByte); i += 1 }
        table += Array.emptyByteArray // 256: clear marker (never emitted)
        table += Array.emptyByteArray // 257: EOD marker
      }
      reset()
      var width = 9
      var prev: Array[Byte] = null
      var acc = 0L; var nbits = 0; var i = 0; var done = false
      while (i < data.length && !done) {
        acc = (acc << 8) | (data(i) & 0xffL); nbits += 8; i += 1
        while (nbits >= width && !done) {
          val code = ((acc >>> (nbits - width)) & ((1L << width) - 1)).toInt
          nbits -= width
          if (code == 256) { reset(); width = 9; prev = null }
          else if (code == 257) done = true
          else {
            val entry =
              if (code < table.length) table(code)
              else if (prev != null && code == table.length) prev :+ prev(0)
              else throw new IllegalArgumentException(s"bad LZW code $code")
            out.write(entry)
            if (prev != null && table.length < 4096) table += (prev :+ entry(0))
            // EarlyChange=1 (xpdf: nextCode+early==512; PDFBox:
            // tabSize >= 512-earlyChange): widen once the table reaches
            // 2^width - 1 entries, one earlier than the width alone demands
            if (width < 12 && table.length >= (1 << width) - 1) width += 1
            prev = entry
          }
        }
      }
      out.toByteArray
    } catch { case _: Exception => Array.emptyByteArray }

  /** RunLengthDecode (ISO 32000-1 §7.4.5): length byte n — n<128 copies
    * the next n+1 literals, n>128 repeats the next byte 257−n times,
    * 128 is EOD.
    */
  private[graft] def runLengthDecode(data: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(math.max(64, data.length * 2))
    var i = 0
    var done = false
    while (i < data.length && !done) {
      val n = data(i) & 0xff; i += 1
      if (n == 128) done = true
      else if (n < 128) {
        val take = math.min(n + 1, data.length - i)
        out.write(data, i, take); i += take
      } else if (i < data.length) {
        val b = data(i); i += 1
        var r = 257 - n
        while (r > 0) { out.write(b); r -= 1 }
      }
    }
    out.toByteArray
  }

  /** ASCIIHexDecode (§7.4.2): hex pairs, whitespace ignored, `>` ends
    * the stream, odd trailing digit padded with 0.
    */
  private[graft] def asciiHexDecode(data: Array[Byte]): Array[Byte] =
    try {
      val s = new String(data, Latin1)
      val end = s.indexOf('>')
      val hex = (if (end >= 0) s.substring(0, end) else s).filterNot(_.isWhitespace)
      val padded = if (hex.length % 2 == 1) hex + "0" else hex
      padded.grouped(2).map(h => Integer.parseInt(h, 16).toByte).toArray
    } catch { case _: Exception => Array.emptyByteArray }

  /** ASCII85Decode (§7.4.3): 5 chars '!'..'u' → 4 bytes base-85, 'z' =
    * four zero bytes, `~>` terminates; a trailing group of n chars
    * yields n−1 bytes.
    */
  private[graft] def ascii85Decode(data: Array[Byte]): Array[Byte] =
    try {
      val out = new java.io.ByteArrayOutputStream(math.max(64, data.length))
      val group = new Array[Int](5)
      var gi = 0
      var i = 0
      var done = false
      while (i < data.length && !done) {
        val c = (data(i) & 0xff).toChar; i += 1
        if (c == '~') done = true
        else if (c == 'z' && gi == 0) out.write(Array[Byte](0, 0, 0, 0))
        else if (c >= '!' && c <= 'u') {
          group(gi) = c - '!'; gi += 1
          if (gi == 5) {
            var v = 0L
            group.foreach(g => v = v * 85 + g)
            out.write(Array((v >>> 24).toByte, (v >>> 16).toByte,
              (v >>> 8).toByte, v.toByte))
            gi = 0
          }
        } // whitespace and anything else: skipped
      }
      if (gi > 0) { // partial group: pad with 'u', emit gi-1 bytes
        var v = 0L
        var j = 0
        while (j < 5) { v = v * 85 + (if (j < gi) group(j) else 84); j += 1 }
        val full = Array((v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)
        out.write(full, 0, gi - 1)
      }
      out.toByteArray
    } catch { case _: Exception => Array.emptyByteArray }

  private def inflate(data: Array[Byte]): Array[Byte] =
    try {
      val inf = new Inflater()
      inf.setInput(data)
      val out = new java.io.ByteArrayOutputStream(data.length * 4)
      val buf = new Array[Byte](8192)
      while (!inf.finished() && !inf.needsInput()) {
        val n = inf.inflate(buf)
        if (n > 0) out.write(buf, 0, n)
      }
      inf.end()
      out.toByteArray
    } catch { case _: Exception => Array.emptyByteArray }

  /** Text-show extraction from one content stream: literal `(..)` and
    * hex `<..>` strings accumulate into the current line; the
    * line-positioning ops (Td, TD, T-star, ET) flush a line — the same
    * ops PyPDF2 keys newlines off. Numbers, names and other operators
    * are skipped.
    */
  private def streamText(content: String): String = {
    val lines = mutable.Buffer.empty[String]
    val cur = new StringBuilder
    def flush(): Unit = if (cur.nonEmpty) { lines += cur.result(); cur.clear() }
    var i = 0
    val n = content.length
    while (i < n) {
      content.charAt(i) match {
        case '(' =>
          var depth = 1; i += 1
          while (i < n && depth > 0) {
            content.charAt(i) match {
              case '\\' if i + 1 < n =>
                content.charAt(i + 1) match {
                  case 'n' => cur += '\n'; i += 2
                  case 'r' => cur += '\r'; i += 2
                  case 't' => cur += '\t'; i += 2
                  case 'b' => cur += '\b'; i += 2
                  case 'f' => cur += '\f'; i += 2
                  case c @ ('(' | ')' | '\\') => cur += c; i += 2
                  case c if c.isDigit => // octal, 1-3 digits
                    val end = math.min(i + 4, n)
                    var j = i + 1
                    while (j < end && content.charAt(j).isDigit && j - i <= 3) j += 1
                    cur += Integer.parseInt(content.substring(i + 1, j), 8).toChar
                    i = j
                  case '\n' => i += 2 // line continuation
                  case c => cur += c; i += 2
                }
              case '(' => depth += 1; cur += '('; i += 1
              case ')' =>
                depth -= 1
                if (depth > 0) cur += ')'
                i += 1
              case c => cur += c; i += 1
            }
          }
        case '<' if i + 1 < n && content.charAt(i + 1) != '<' =>
          val end = content.indexOf('>', i)
          if (end < 0) i = n
          else {
            val hex = content.substring(i + 1, end).filterNot(_.isWhitespace)
            val padded = if (hex.length % 2 == 1) hex + "0" else hex
            padded.grouped(2).foreach(h =>
              cur += Integer.parseInt(h, 16).toChar)
            i = end + 1
          }
        case c if c.isLetter || c == '*' =>
          val start = i
          while (i < n && (content.charAt(i).isLetter || content.charAt(i) == '*')) i += 1
          content.substring(start, i) match {
            case "Td" | "TD" | "T*" | "ET" => flush()
            case _ => ()
          }
        case _ => i += 1
      }
    }
    flush()
    lines.mkString("\n")
  }
}
