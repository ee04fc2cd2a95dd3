package graft

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets
import java.util.zip.{Deflater, ZipEntry, ZipOutputStream}

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Codecs

/** Real-format fixture builders from the specs the formats are defined
  * by (OOXML = ZIP of XML parts; PDF = object graph + content streams)
  * — no codec library on either side, so specs verify the extractors
  * against ground truth, not against themselves. Shared by CodecsSpec
  * and the multi-format GoldenExperimentSpec.
  */
object CodecFixtures {

  def zip(entries: (String, String)*): Array[Byte] = {
    val bos = new ByteArrayOutputStream
    val z = new ZipOutputStream(bos)
    entries.foreach { case (name, content) =>
      z.putNextEntry(new ZipEntry(name))
      z.write(content.getBytes(StandardCharsets.UTF_8))
      z.closeEntry()
    }
    z.close()
    bos.toByteArray
  }

  def deflate(data: Array[Byte]): Array[Byte] = {
    val d = new Deflater()
    d.setInput(data); d.finish()
    val out = new ByteArrayOutputStream
    val buf = new Array[Byte](8192)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    out.toByteArray
  }

  /** Minimal well-formed PDF: catalog → pages → per-page content
    * stream, one `(line) Tj` per line with Td line moves. No xref table
    * (the extractor scans the object graph, as lenient readers do).
    */
  def minimalPdf(pages: Seq[String], compress: Boolean = false): Array[Byte] = {
    val latin1 = StandardCharsets.ISO_8859_1
    val out = new ByteArrayOutputStream
    def w(s: String): Unit = out.write(s.getBytes(latin1))
    val pageRefs = pages.indices.map(i => s"${3 + 2 * i} 0 R").mkString(" ")
    w("%PDF-1.4\n")
    w("1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n")
    w(s"2 0 obj << /Type /Pages /Kids [$pageRefs] /Count ${pages.length} >> endobj\n")
    pages.zipWithIndex.foreach { case (text, i) =>
      val pageNum = 3 + 2 * i
      val contentNum = pageNum + 1
      val stream = "BT /F1 12 Tf 72 720 Td " +
        text.split("\n").map(l => s"($l) Tj").mkString(" 0 -14 Td ") + " ET"
      val data =
        if (compress) deflate(stream.getBytes(latin1)) else stream.getBytes(latin1)
      w(s"$pageNum 0 obj << /Type /Page /Parent 2 0 R /Contents $contentNum 0 R >> endobj\n")
      w(s"$contentNum 0 obj << /Length ${data.length}" +
        (if (compress) " /Filter /FlateDecode" else "") + " >> stream\n")
      out.write(data)
      w("\nendstream endobj\n")
    }
    w("%%EOF\n")
    out.toByteArray
  }

  def minimalDocx(): Array[Byte] = zip(
    "[Content_Types].xml" -> "<Types/>",
    "word/document.xml" ->
      """<w:document xmlns:w="http://schemas.openxmlformats.org/wordprocessingml/2006/main">
        |<w:body>
        |<w:p><w:r><w:t>Survey findings for the north ridge.</w:t></w:r></w:p>
        |<w:p><w:r><w:t> </w:t></w:r></w:p>
        |<w:p><w:r><w:t>Second </w:t></w:r><w:r><w:t>paragraph.</w:t></w:r></w:p>
        |<w:tbl>
        |<w:tr><w:tc><w:p><w:r><w:t>sensor</w:t></w:r></w:p></w:tc>
        |<w:tc><w:p><w:r><w:t>status</w:t></w:r></w:p></w:tc></w:tr>
        |<w:tr><w:tc><w:p><w:r><w:t>s-01</w:t></w:r></w:p></w:tc>
        |<w:tc><w:p><w:r><w:t>ok</w:t></w:r></w:p></w:tc></w:tr>
        |</w:tbl>
        |</w:body></w:document>""".stripMargin,
  )

  def minimalXlsx(): Array[Byte] = zip(
    "[Content_Types].xml" -> "<Types/>",
    "xl/workbook.xml" ->
      """<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"
        | xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
        |<sheets>
        |<sheet name="Data" sheetId="1" r:id="rId1"/>
        |<sheet name="Notes" sheetId="2" r:id="rId2"/>
        |</sheets></workbook>""".stripMargin,
    "xl/_rels/workbook.xml.rels" ->
      """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
        |<Relationship Id="rId1" Type="ws" Target="worksheets/sheet1.xml"/>
        |<Relationship Id="rId2" Type="ws" Target="worksheets/sheet2.xml"/>
        |</Relationships>""".stripMargin,
    "xl/sharedStrings.xml" ->
      """<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
        |<si><t>station</t></si><si><t>kander</t></si>
        |</sst>""".stripMargin,
    "xl/worksheets/sheet1.xml" ->
      """<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
        |<sheetData>
        |<row r="1"><c r="A1" t="s"><v>0</v></c><c r="B1"><v>42</v></c></row>
        |<row r="2"><c r="A2" t="s"><v>1</v></c><c r="B2"><v>3.5</v></c></row>
        |</sheetData></worksheet>""".stripMargin,
    "xl/worksheets/sheet2.xml" ->
      """<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
        |<sheetData>
        |<row r="1"><c r="A1" t="inlineStr"><is><t>remark</t></is></c></row>
        |<row r="2"/>
        |</sheetData></worksheet>""".stripMargin,
  )

  def minimalPptx(): Array[Byte] = zip(
    "[Content_Types].xml" -> "<Types/>",
    "ppt/slides/slide1.xml" ->
      """<p:sld xmlns:a="http://schemas.openxmlformats.org/drawingml/2006/main"
        | xmlns:p="http://schemas.openxmlformats.org/presentationml/2006/main">
        |<p:cSld><p:spTree>
        |<p:sp><p:txBody><a:p><a:r><a:t>Quarterly review</a:t></a:r></a:p></p:txBody></p:sp>
        |<p:sp><p:txBody><a:p><a:r><a:t>Yield </a:t></a:r><a:r><a:t>up</a:t></a:r></a:p>
        |<a:p><a:r><a:t>Costs flat</a:t></a:r></a:p></p:txBody></p:sp>
        |</p:spTree></p:cSld></p:sld>""".stripMargin,
    "ppt/slides/slide2.xml" ->
      """<p:sld xmlns:a="http://schemas.openxmlformats.org/drawingml/2006/main"
        | xmlns:p="http://schemas.openxmlformats.org/presentationml/2006/main">
        |<p:cSld><p:spTree>
        |<p:sp><p:txBody><a:p><a:r><a:t>Outlook</a:t></a:r></a:p></p:txBody></p:sp>
        |</p:spTree></p:cSld></p:sld>""".stripMargin,
  )

  /** Single-page PDF whose content stream is caller-supplied raw bytes
    * with an explicit /Filter entry — for exercising stream filters the
    * text-based minimalPdf can't express.
    */
  def singleStreamPdf(streamBytes: Array[Byte], filter: String): Array[Byte] = {
    val latin1 = StandardCharsets.ISO_8859_1
    val out = new ByteArrayOutputStream
    def w(s: String): Unit = out.write(s.getBytes(latin1))
    w("%PDF-1.4\n")
    w("1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n")
    w("2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n")
    w("3 0 obj << /Type /Page /Parent 2 0 R /Contents 4 0 R >> endobj\n")
    w(s"4 0 obj << /Length ${streamBytes.length}$filter >> stream\n")
    out.write(streamBytes)
    w("\nendstream endobj\n%%EOF\n")
    out.toByteArray
  }

  /** PDF/TIFF-variant LZW encoder (9→12-bit MSB-first codes, clear=256,
    * EOD=257, EarlyChange=1) — built from ISO 32000-1 §7.4.4, so the
    * decoder is tested against the spec, not against itself.
    */
  def lzwEncode(data: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream
    var acc = 0L; var nbits = 0; var width = 9
    def put(code: Int): Unit = {
      acc = (acc << width) | code; nbits += width
      while (nbits >= 8) { out.write(((acc >>> (nbits - 8)) & 0xff).toInt); nbits -= 8 }
    }
    val dict = scala.collection.mutable.HashMap.empty[Vector[Byte], Int]
    def reset(): Unit = {
      dict.clear(); (0 until 256).foreach(i => dict(Vector(i.toByte)) = i)
    }
    reset()
    var next = 258
    put(256)
    var w = Vector.empty[Byte]
    data.foreach { b =>
      val wb = w :+ b
      if (dict.contains(wb)) w = wb
      else {
        put(dict(w))
        if (next < 4096) { dict(wb) = next; next += 1 }
        // EarlyChange=1: the decoder's table lags the encoder's `next`
        // by one, so its 2^width-1 rule lands here at next == 2^width
        if (width < 12 && next >= (1 << width)) width += 1
        w = Vector(b)
      }
    }
    if (w.nonEmpty) put(dict(w))
    put(257)
    if (nbits > 0) out.write(((acc << (8 - nbits)) & 0xff).toInt)
    out.toByteArray
  }

  /** PDF 1.5-style layout: catalog, pages and page dicts packed inside
    * a Flate-compressed /ObjStm object stream (the shape modern writers
    * emit); only the per-page content streams are top-level objects.
    */
  def objStmPdf(pages: Seq[String]): Array[Byte] = {
    val latin1 = StandardCharsets.ISO_8859_1
    val pageRefs = pages.indices.map(i => s"${3 + i} 0 R").mkString(" ")
    val dicts: Seq[(Int, String)] =
      Seq(1 -> "<< /Type /Catalog /Pages 2 0 R >>",
        2 -> s"<< /Type /Pages /Kids [$pageRefs] /Count ${pages.length} >>") ++
        pages.indices.map(i =>
          (3 + i) -> s"<< /Type /Page /Parent 2 0 R /Contents ${100 + i} 0 R >>")
    val bodies = dicts.map(_._2)
    val offsets = bodies.scanLeft(0)((acc, b) => acc + b.length + 1).init
    val header = dicts.map(_._1).zip(offsets)
      .map { case (num, off) => s"$num $off" }.mkString(" ") + " "
    val payload = header + bodies.mkString(" ")
    val packed = deflate(payload.getBytes(latin1))
    val out = new ByteArrayOutputStream
    def w(s: String): Unit = out.write(s.getBytes(latin1))
    w("%PDF-1.5\n")
    w(s"50 0 obj << /Type /ObjStm /N ${dicts.length} /First ${header.length}" +
      s" /Filter /FlateDecode /Length ${packed.length} >> stream\n")
    out.write(packed)
    w("\nendstream endobj\n")
    pages.zipWithIndex.foreach { case (text, i) =>
      val stream = "BT /F1 12 Tf 72 720 Td " +
        text.split("\n").map(l => s"($l) Tj").mkString(" 0 -14 Td ") + " ET"
      w(s"${100 + i} 0 obj << /Length ${stream.length} >> stream\n$stream\nendstream endobj\n")
    }
    w("%%EOF\n")
    out.toByteArray
  }

  /** RC4 transcribed independently for the fixture side (key schedule +
    * PRGA from the published description) — deliberately NOT reusing
    * the decoder's rc4, so a transcription error in either
    * implementation breaks the round-trip instead of cancelling out.
    */
  def rc4Fixture(key: Array[Byte], data: Array[Byte]): Array[Byte] = {
    val s = (0 until 256).toArray
    var j = 0
    for (i <- 0 until 256) {
      j = (j + s(i) + (key(i % key.length) & 0xff)) & 0xff
      val t = s(i); s(i) = s(j); s(j) = t
    }
    var i = 0; j = 0
    data.map { b =>
      i = (i + 1) & 0xff
      j = (j + s(i)) & 0xff
      val t = s(i); s(i) = s(j); s(j) = t
      (b ^ s((s(i) + s(j)) & 0xff)).toByte
    }
  }

  private def md5f(parts: Array[Byte]*): Array[Byte] = {
    val d = java.security.MessageDigest.getInstance("MD5")
    parts.foreach(d.update)
    d.digest()
  }

  /** §7.6.3 Table 21 password pad, transcribed from the spec. */
  private val padF: Array[Byte] = Array(
    0x28, 0xBF, 0x4E, 0x5E, 0x4E, 0x75, 0x8A, 0x41, 0x64, 0x00, 0x4E, 0x56,
    0xFF, 0xFA, 0x01, 0x08, 0x2E, 0x2E, 0x00, 0xB6, 0xD0, 0x68, 0x3E, 0x80,
    0x2F, 0x0C, 0xA9, 0xFE, 0x64, 0x53, 0x69, 0x7A).map(_.toByte)

  private def hexF(b: Array[Byte]): String = b.map("%02X".format(_)).mkString

  /** Standard-security encrypted single-page PDF with empty user+owner
    * passwords — Algorithms 2/3/4/5 of ISO 32000-1 §7.6.3 transcribed
    * here, independently of the reader under test. `r` = 2 (40-bit) or
    * 3 (128-bit); `userPw` non-empty simulates a password-protected doc
    * the empty-password handler must refuse. Content stream is
    * Flate-compressed then RC4-encrypted (encryption wraps the encoded
    * data as stored in the file).
    */
  def encryptedPdf(text: String, r: Int, userPw: Array[Byte] = Array.emptyByteArray)
      : Array[Byte] = {
    val latin1 = StandardCharsets.ISO_8859_1
    val n = if (r == 2) 5 else 16
    val p = -44
    val id0 = Array.tabulate(16)(i => (i * 7 + 3).toByte)
    def padded(pw: Array[Byte]): Array[Byte] = (pw ++ padF).take(32)
    // Algorithm 3: O entry (owner password empty → the pad itself)
    var oh = md5f(padF)
    if (r >= 3) for (_ <- 0 until 50) oh = md5f(oh) // full output each round
    val oKey = oh.take(n)
    var o = rc4Fixture(oKey, padded(userPw))
    if (r >= 3) for (i <- 1 to 19) o = rc4Fixture(oKey.map(b => (b ^ i).toByte), o)
    // Algorithm 2: file key (first-n-bytes truncation in the 50-round loop)
    val pB = Array(p.toByte, (p >> 8).toByte, (p >> 16).toByte, (p >> 24).toByte)
    var fk = md5f(padded(userPw), o, pB, id0)
    if (r >= 3) for (_ <- 0 until 50) fk = md5f(fk.take(n))
    val key = fk.take(n)
    // Algorithm 4 (r2) / 5 (r3): U entry
    val u =
      if (r == 2) rc4Fixture(key, padF)
      else {
        var x = rc4Fixture(key, md5f(padF, id0))
        for (i <- 1 to 19) x = rc4Fixture(key.map(b => (b ^ i).toByte), x)
        x ++ new Array[Byte](16)
      }
    // Algorithm 1: per-object key for the content stream (obj 4 gen 0)
    val objKey = md5f(key, Array[Byte](4, 0, 0, 0, 0)).take(math.min(n + 5, 16))
    val stream = s"BT /F1 12 Tf 72 720 Td ($text) Tj ET"
    val enc = rc4Fixture(objKey, deflate(stream.getBytes(latin1)))
    val out = new ByteArrayOutputStream
    def w(s: String): Unit = out.write(s.getBytes(latin1))
    w("%PDF-1.4\n")
    w("1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n")
    w("2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n")
    w("3 0 obj << /Type /Page /Parent 2 0 R /Contents 4 0 R >> endobj\n")
    w(s"4 0 obj << /Length ${enc.length} /Filter /FlateDecode >> stream\n")
    out.write(enc)
    w("\nendstream endobj\n")
    val vr = if (r == 2) "/V 1 /R 2" else "/V 2 /R 3 /Length 128"
    w(s"5 0 obj << /Filter /Standard $vr /O <${hexF(o)}> /U <${hexF(u)}> /P $p >> endobj\n")
    w(s"trailer << /Root 1 0 R /Encrypt 5 0 R /ID [<${hexF(id0)}> <${hexF(id0)}>] >>\n")
    w("%%EOF\n")
    out.toByteArray
  }

  /** V4/R4 standard-security encrypted single-page PDF with empty
    * user+owner passwords and a crypt filter — `cfm` = "AESV2"
    * (AES-128-CBC: IV-prefixed, PKCS#7-padded) or "V2" (RC4 under the
    * V4 key schedule). Key derivation shares the R3 fixture algebra
    * (R4's Algorithm 2/3/5 are identical for the empty password with
    * /EncryptMetadata true); the AES layer is built FORWARD with
    * javax.crypto ENCRYPT_MODE against the reader's DECRYPT_MODE, so a
    * sAlT/objKey transcription error on either side breaks the
    * round-trip.
    */
  def encryptedPdfV4(text: String, cfm: String): Array[Byte] = {
    val latin1 = StandardCharsets.ISO_8859_1
    val n = 16
    val p = -44
    val id0 = Array.tabulate(16)(i => (i * 7 + 3).toByte)
    // Algorithm 3: O entry (owner password empty -> the pad itself)
    var oh = md5f(padF)
    for (_ <- 0 until 50) oh = md5f(oh)
    val oKey = oh.take(n)
    var o = rc4Fixture(oKey, padF)
    for (i <- 1 to 19) o = rc4Fixture(oKey.map(b => (b ^ i).toByte), o)
    // Algorithm 2: file key
    val pB = Array(p.toByte, (p >> 8).toByte, (p >> 16).toByte, (p >> 24).toByte)
    var fk = md5f(padF, o, pB, id0)
    for (_ <- 0 until 50) fk = md5f(fk.take(n))
    val key = fk.take(n)
    // Algorithm 5: U entry
    var u = rc4Fixture(key, md5f(padF, id0))
    for (i <- 1 to 19) u = rc4Fixture(key.map(b => (b ^ i).toByte), u)
    val uFull = u ++ new Array[Byte](16)
    // Algorithm 1: per-object key for the content stream (obj 4 gen 0),
    // with the sAlT suffix for AESV2
    val salt =
      if (cfm == "AESV2") Array(0x73, 0x41, 0x6c, 0x54).map(_.toByte)
      else Array.emptyByteArray
    val objKey = md5f(key, Array[Byte](4, 0, 0, 0, 0), salt)
      .take(math.min(n + 5, 16))
    val stream = s"BT /F1 12 Tf 72 720 Td ($text) Tj ET"
    val plain = deflate(stream.getBytes(latin1))
    val enc =
      if (cfm == "AESV2") {
        val iv = Array.tabulate(16)(i => (i * 13 + 5).toByte) // fixed test IV
        val c = javax.crypto.Cipher.getInstance("AES/CBC/PKCS5Padding")
        c.init(javax.crypto.Cipher.ENCRYPT_MODE,
          new javax.crypto.spec.SecretKeySpec(objKey, "AES"),
          new javax.crypto.spec.IvParameterSpec(iv))
        iv ++ c.doFinal(plain)
      } else rc4Fixture(objKey, plain)
    val out = new ByteArrayOutputStream
    def w(str: String): Unit = out.write(str.getBytes(latin1))
    w("%PDF-1.6\n")
    w("1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n")
    w("2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n")
    w("3 0 obj << /Type /Page /Parent 2 0 R /Contents 4 0 R >> endobj\n")
    w(s"4 0 obj << /Length ${enc.length} /Filter /FlateDecode >> stream\n")
    out.write(enc)
    w("\nendstream endobj\n")
    w(s"5 0 obj << /Filter /Standard /V 4 /R 4 /Length 128 " +
      s"/CF << /StdCF << /CFM /$cfm /Length 16 >> >> /StmF /StdCF /StrF /StdCF " +
      s"/O <${hexF(o)}> /U <${hexF(uFull)}> /P $p >> endobj\n")
    w(s"trailer << /Root 1 0 R /Encrypt 5 0 R /ID [<${hexF(id0)}> <${hexF(id0)}>] >>\n")
    w("%%EOF\n")
    out.toByteArray
  }

  /** ISO 32000-2 §7.6.4.3.4 Algorithm 2.B transcribed independently for
    * the fixture side (the rc4Fixture convention — a transcription
    * error in either implementation breaks the round-trip rather than
    * cancelling out). Deliberate divergences from the reader: the
    * repetition buffer is built with Array.fill/flatten, and the
    * SHA-256/384/512 selector takes the first 16 ciphertext bytes
    * through BigInteger mod 3 instead of the reader's byte-sum
    * congruence shortcut.
    */
  def hash2Bf(password: Array[Byte], salt: Array[Byte], udata: Array[Byte],
      r: Int): Array[Byte] = {
    def sha(alg: String, parts: Array[Byte]*): Array[Byte] = {
      val d = java.security.MessageDigest.getInstance(alg)
      parts.foreach(d.update)
      d.digest()
    }
    var k = sha("SHA-256", password, salt, udata)
    if (r == 5) return k
    var round = 0
    var stop = false
    while (!stop) {
      val k1: Array[Byte] =
        Array.fill(64)(password ++ k ++ udata).flatten
      val c = javax.crypto.Cipher.getInstance("AES/CBC/NoPadding")
      c.init(javax.crypto.Cipher.ENCRYPT_MODE,
        new javax.crypto.spec.SecretKeySpec(k.take(16), "AES"),
        new javax.crypto.spec.IvParameterSpec(k.slice(16, 32)))
      val e = c.doFinal(k1)
      val sel = new java.math.BigInteger(1, e.take(16))
        .mod(java.math.BigInteger.valueOf(3)).intValue
      k = sha(Seq("SHA-256", "SHA-384", "SHA-512")(sel), e)
      round += 1
      stop = round >= 64 && (e(e.length - 1) & 0xff) <= round - 32
    }
    k.take(32)
  }

  /** AES-256 (V5, R5 or R6) standard-security encrypted single-page PDF
    * with an empty user password, built FORWARD per ISO 32000-2
    * §7.6.4.4 Algorithm 8: U = hash2B(pw, validation salt) ‖ vs ‖ ks,
    * UE = AES-256-CBC(intermediate key = hash2B(pw, key salt),
    * iv = 0, file key). The content stream is Flate-compressed then
    * AES-256-CBC encrypted directly with the file key (V5 has no
    * per-object key derivation). /O, /OE and /Perms carry
    * plausible-length dummies — the empty-user-password read path never
    * consults them (validation runs against /U alone).
    */
  def encryptedPdfV5(text: String, r: Int): Array[Byte] = {
    val latin1 = StandardCharsets.ISO_8859_1
    val p = -44
    val vs = Array.tabulate(8)(i => (i * 11 + 1).toByte) // validation salt
    val ks = Array.tabulate(8)(i => (i * 17 + 2).toByte) // key salt
    val fk = Array.tabulate(32)(i => (i * 29 + 7).toByte) // file key
    val u = hash2Bf(Array.emptyByteArray, vs, Array.emptyByteArray, r) ++ vs ++ ks
    val ik = hash2Bf(Array.emptyByteArray, ks, Array.emptyByteArray, r)
    val cUe = javax.crypto.Cipher.getInstance("AES/CBC/NoPadding")
    cUe.init(javax.crypto.Cipher.ENCRYPT_MODE,
      new javax.crypto.spec.SecretKeySpec(ik, "AES"),
      new javax.crypto.spec.IvParameterSpec(new Array[Byte](16)))
    val ue = cUe.doFinal(fk)
    val o = Array.tabulate(48)(i => (i * 3 + 1).toByte)
    val oe = Array.tabulate(32)(i => (i * 5 + 3).toByte)
    val perms = Array.tabulate(16)(i => (i * 7 + 9).toByte)
    val stream = s"BT /F1 12 Tf 72 720 Td ($text) Tj ET"
    val plain = deflate(stream.getBytes(latin1))
    val iv = Array.tabulate(16)(i => (i * 13 + 5).toByte) // fixed test IV
    val c = javax.crypto.Cipher.getInstance("AES/CBC/PKCS5Padding")
    c.init(javax.crypto.Cipher.ENCRYPT_MODE,
      new javax.crypto.spec.SecretKeySpec(fk, "AES"),
      new javax.crypto.spec.IvParameterSpec(iv))
    val enc = iv ++ c.doFinal(plain)
    val out = new ByteArrayOutputStream
    def w(str: String): Unit = out.write(str.getBytes(latin1))
    w("%PDF-2.0\n")
    w("1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n")
    w("2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n")
    w("3 0 obj << /Type /Page /Parent 2 0 R /Contents 4 0 R >> endobj\n")
    w(s"4 0 obj << /Length ${enc.length} /Filter /FlateDecode >> stream\n")
    out.write(enc)
    w("\nendstream endobj\n")
    w(s"5 0 obj << /Filter /Standard /V 5 /R $r /Length 256 " +
      s"/CF << /StdCF << /CFM /AESV3 /Length 32 >> >> /StmF /StdCF /StrF /StdCF " +
      s"/O <${hexF(o)}> /OE <${hexF(oe)}> /U <${hexF(u)}> /UE <${hexF(ue)}> " +
      s"/P $p /Perms <${hexF(perms)}> >> endobj\n")
    w("trailer << /Root 1 0 R /Encrypt 5 0 R >>\n")
    w("%%EOF\n")
    out.toByteArray
  }

  /** DOCX with caller-supplied body paragraphs (XML-safe text only). */
  def docx(paragraphs: Seq[String]): Array[Byte] = zip(
    "[Content_Types].xml" -> "<Types/>",
    "word/document.xml" ->
      ("""<w:document xmlns:w="http://schemas.openxmlformats.org/wordprocessingml/2006/main"><w:body>""" +
        paragraphs.map(p => s"<w:p><w:r><w:t>$p</w:t></w:r></w:p>").mkString +
        "</w:body></w:document>"),
  )

  /** PPTX with caller-supplied slides of paragraphs (XML-safe text). */
  def pptx(slides: Seq[Seq[String]]): Array[Byte] = zip(
    Seq("[Content_Types].xml" -> "<Types/>") ++
      slides.zipWithIndex.map { case (paras, i) =>
        s"ppt/slides/slide${i + 1}.xml" ->
          ("""<p:sld xmlns:a="http://schemas.openxmlformats.org/drawingml/2006/main"""" +
            """ xmlns:p="http://schemas.openxmlformats.org/presentationml/2006/main">""" +
            "<p:cSld><p:spTree><p:sp><p:txBody>" +
            paras.map(p => s"<a:p><a:r><a:t>$p</a:t></a:r></a:p>").mkString +
            "</p:txBody></p:sp></p:spTree></p:cSld></p:sld>")
      }: _*)
}

class CodecsSpec extends AnyFunSuite {
  import CodecFixtures._

  // ---- PDF ----------------------------------------------------------

  test("PDF: per-page markers, multi-line text, page order from /Kids") {
    val pdf = minimalPdf(Seq("Snow receded twelve percent.\nTrail erosion accelerated.",
      "Second page body."))
    val text = Codecs.extractPdf(pdf)
    assert(text ==
      """--- Page 1 ---
        |Snow receded twelve percent.
        |Trail erosion accelerated.
        |--- Page 2 ---
        |Second page body.""".stripMargin)
  }

  test("PDF: FlateDecode content streams inflate via the JDK") {
    val pdf = minimalPdf(Seq("Compressed body line."), compress = true)
    assert(Codecs.extractPdf(pdf) == "--- Page 1 ---\nCompressed body line.")
  }

  test("PDF: escapes, hex strings and TJ arrays") {
    val stream =
      """BT (Paren \(pair\) and backslash \\ end) Tj 0 -14 Td [(Kerned ) -120 (pair)] TJ ET"""
    val data = stream.getBytes(StandardCharsets.ISO_8859_1)
    val pdf = ("%PDF-1.4\n" +
      "1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n" +
      "2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n" +
      "3 0 obj << /Type /Page /Parent 2 0 R /Contents 4 0 R >> endobj\n" +
      s"4 0 obj << /Length ${data.length} >> stream\n" + stream + "\nendstream endobj\n" +
      "%%EOF\n").getBytes(StandardCharsets.ISO_8859_1)
    assert(Codecs.extractPdf(pdf) ==
      "--- Page 1 ---\nParen (pair) and backslash \\ end\nKerned pair")
  }

  test("PDF: garbage bytes extract to empty (document dropped, not failed)") {
    assert(Codecs.extractPdf(Array.fill[Byte](2048)(7)) == "")
    assert(Codecs.extractPdf(Array.emptyByteArray) == "")
  }

  test("PDF 1.5: page dicts inside a compressed object stream extract") {
    val pdf = objStmPdf(Seq("Body from an ObjStm-packed page.",
      "Second packed page."))
    assert(Codecs.extractPdf(pdf) ==
      """--- Page 1 ---
        |Body from an ObjStm-packed page.
        |--- Page 2 ---
        |Second packed page.""".stripMargin)
  }

  // ---- PDF stream filters -------------------------------------------

  test("LZW: hand-assembled 9-bit code stream decodes (spec ground truth)") {
    // 'AAAA' encodes as codes [256, 65, 258, 65, 257]; packed MSB-first
    // at 9 bits each that is exactly these six bytes (worked by hand
    // from ISO 32000-1 §7.4.4 / the TIFF 6.0 LZW section)
    val bytes = Array(0x80, 0x10, 0x60, 0x44, 0x18, 0x08).map(_.toByte)
    assert(new String(Codecs.lzwDecode(bytes), StandardCharsets.ISO_8859_1) == "AAAA")
  }

  test("LZW: encoder/decoder round-trip over repetitive text") {
    val text = ("the quick brown fox jumps over the lazy dog. " * 40).getBytes
    assert(Codecs.lzwDecode(lzwEncode(text)).toSeq == text.toSeq)
    assert(Codecs.lzwDecode("not lzw at all".getBytes).length == 0 ||
      Codecs.lzwDecode("not lzw at all".getBytes) != null) // never throws
  }

  test("LZW: width transitions survive 9/10/11/12-bit growth and a full table") {
    // pseudorandom bytes are near-incompressible: the dictionary grows
    // ~1 entry per emitted code, crossing every early-change width
    // boundary (511/1023/2047) and saturating at 4096 where both sides
    // must stop adding. A width-timing bug desyncs here immediately.
    val rnd = new scala.util.Random(42)
    val big = Array.fill(20000)(rnd.nextInt(256).toByte)
    assert(Codecs.lzwDecode(lzwEncode(big)).toSeq == big.toSeq)
    val small = Array.fill(600)(rnd.nextInt(256).toByte) // crosses 511 only
    assert(Codecs.lzwDecode(lzwEncode(small)).toSeq == small.toSeq)
  }

  test("LZW: JDK ImageIO TIFF strip (independent encoder) decodes byte-exact") {
    // Ground truth from an encoder we didn't write: the JDK TIFF writer
    // emits the same EarlyChange=1 LZW variant PDF uses (TIFF 6.0 §13).
    // Pseudorandom pixels are near-incompressible, so the code table
    // crosses the 9→10 and 10→11 bit boundaries — the exact seam the
    // early-change rule governs. A width off-by-one fails here with
    // 'bad LZW code' (empty output), not a subtle diff.
    import java.awt.image.BufferedImage
    import javax.imageio.{IIOImage, ImageIO, ImageWriteParam}
    val rnd = new scala.util.Random(7)
    val (iw, ih) = (96, 96)
    val pixels = Array.fill(iw * ih)(rnd.nextInt(256).toByte)
    val img = new BufferedImage(iw, ih, BufferedImage.TYPE_BYTE_GRAY)
    img.getRaster.setDataElements(0, 0, iw, ih, pixels)
    val writer = ImageIO.getImageWritersByFormatName("tiff").next()
    val param = writer.getDefaultWriteParam
    param.setCompressionMode(ImageWriteParam.MODE_EXPLICIT)
    param.setCompressionType("LZW")
    val bos = new ByteArrayOutputStream
    val ios = ImageIO.createImageOutputStream(bos)
    writer.setOutput(ios)
    writer.write(null, new IIOImage(img, null, null), param)
    ios.close(); writer.dispose()
    val b = bos.toByteArray
    // minimal TIFF IFD walk (TIFF 6.0 §2): header endianness, first IFD
    val le = b(0) == 'I'
    def u16(o: Int): Int =
      if (le) (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
      else ((b(o) & 0xff) << 8) | (b(o + 1) & 0xff)
    def u32(o: Int): Long =
      if (le) (0 until 4).map(j => (b(o + j) & 0xffL) << (8 * j)).sum
      else (0 until 4).map(j => (b(o + j) & 0xffL) << (8 * (3 - j))).sum
    val ifd = u32(4).toInt
    val tags: Map[Int, IndexedSeq[Long]] = (0 until u16(ifd)).map { i =>
      val e = ifd + 2 + 12 * i
      val (tag, typ, cnt) = (u16(e), u16(e + 2), u32(e + 4).toInt)
      val sz = typ match { case 1 | 2 | 6 | 7 => 1; case 3 | 8 => 2; case _ => 4 }
      val off = if (sz.toLong * cnt <= 4) e + 8 else u32(e + 8).toInt
      tag -> (0 until cnt).map { j =>
        sz match {
          case 1 => (b(off + j) & 0xff).toLong
          case 2 => u16(off + 2 * j).toLong
          case _ => u32(off + 4 * j)
        }
      }
    }.toMap
    assert(tags(259) == IndexedSeq(5L), "writer produced LZW compression")
    val decoded = tags(273).zip(tags(279)).flatMap { case (off, len) =>
      val strip = java.util.Arrays.copyOfRange(b, off.toInt, (off + len).toInt)
      val d = Codecs.lzwDecode(strip)
      assert(d.nonEmpty, "strip decoded (width desync yields empty)")
      d
    }.toArray
    // Predictor 2 = horizontal differencing: undo with a per-row
    // cumulative sum; predictor 1 (or absent) is pass-through.
    val predictor = tags.getOrElse(317, IndexedSeq(1L)).head
    val restored =
      if (predictor != 2) decoded
      else decoded.grouped(iw).flatMap(_.scanLeft(0.toByte) {
        (acc, d) => (acc + d).toByte
      }.tail).toArray
    assert(restored.toSeq == pixels.toSeq)
  }

  test("PDF: LZWDecode content streams decode via the pure-JDK LZW") {
    val stream = "BT (LZW compressed body.) Tj ET"
    val pdf = singleStreamPdf(lzwEncode(stream.getBytes(StandardCharsets.ISO_8859_1)),
      " /Filter /LZWDecode")
    assert(Codecs.extractPdf(pdf) == "--- Page 1 ---\nLZW compressed body.")
  }

  test("PDF: DCT/JPX image streams yield no text, not garbage") {
    // jpeg-ish bytes that happen to contain a '(garbage) Tj' lookalike
    val fake = Array[Byte](0xff.toByte, 0xd8.toByte, 0xff.toByte) ++
      "(garbage) Tj".getBytes ++ Array[Byte](0xff.toByte, 0xd9.toByte)
    assert(Codecs.extractPdf(singleStreamPdf(fake, " /Filter /DCTDecode")) == "")
    assert(Codecs.extractPdf(singleStreamPdf(fake, " /Filter /JPXDecode")) == "")
  }

  test("RunLengthDecode: literal runs, repeat runs, EOD") {
    val data = Array[Byte](2, 'a', 'b', 'c', 0xfb.toByte, 'x', 0x80.toByte, 'Z')
    assert(new String(Codecs.runLengthDecode(data)) == "abcxxxxxx")
  }

  test("ASCIIHexDecode: pairs, whitespace, > terminator, odd padding") {
    assert(new String(Codecs.asciiHexDecode("48 65 6C 6C 6F >".getBytes)) == "Hello")
    assert(Codecs.asciiHexDecode("414>".getBytes).toSeq ==
      Seq(0x41.toByte, 0x40.toByte))
  }

  test("ASCII85Decode: known vector, z shortcut, partial group") {
    assert(new String(Codecs.ascii85Decode("9jqo^~>".getBytes)) == "Man ")
    assert(Codecs.ascii85Decode("z~>".getBytes).toSeq == Seq[Byte](0, 0, 0, 0))
    // 'Man' alone: 4-char partial group → 3 bytes
    assert(new String(Codecs.ascii85Decode("9jqo~>".getBytes)) == "Man")
  }

  test("PDF: ASCII85 + Flate filter chain decodes in transport order") {
    val stream = "BT (Chained filters body.) Tj ET"
    val flated = deflate(stream.getBytes(StandardCharsets.ISO_8859_1))
    // base-85 encode (test-side, from the spec): 4 bytes → 5 chars
    val sb = new StringBuilder
    flated.grouped(4).foreach { g =>
      val padded = g.padTo(4, 0.toByte)
      var v = 0L
      padded.foreach(b => v = (v << 8) | (b & 0xffL))
      val digits = new Array[Char](5)
      (4 to 0 by -1).foreach { i => digits(i) = ('!' + (v % 85).toInt).toChar; v /= 85 }
      sb.appendAll(digits, 0, if (g.length == 4) 5 else g.length + 1)
    }
    sb.append("~>")
    val pdf = singleStreamPdf(sb.toString.getBytes(StandardCharsets.ISO_8859_1),
      " /Filter [/ASCII85Decode /FlateDecode]")
    assert(Codecs.extractPdf(pdf) == "--- Page 1 ---\nChained filters body.")
  }

  test("PDF: non-canonical [/RunLengthDecode /FlateDecode] chain follows array order") {
    // RLE wraps the Flate layer here — the reverse of the usual
    // transport nesting, decodable only by honoring the array order.
    val stream = "BT (Array-ordered filters.) Tj ET"
    val flated = deflate(stream.getBytes(StandardCharsets.ISO_8859_1))
    // literal-run RLE encode (test-side, §7.4.5): ≤128-byte copies + EOD
    val rle = new ByteArrayOutputStream
    flated.grouped(128).foreach { g => rle.write(g.length - 1); rle.write(g) }
    rle.write(128)
    val pdf = singleStreamPdf(rle.toByteArray,
      " /Filter [/RunLengthDecode /FlateDecode]")
    assert(Codecs.extractPdf(pdf) == "--- Page 1 ---\nArray-ordered filters.")
  }

  // ---- PDF encryption -----------------------------------------------

  test("PDF: RC4 128-bit (R3) empty-password document decrypts and extracts") {
    var status: Option[Codecs.PdfEncryption] = None
    val text = Codecs.extractPdf(encryptedPdf("Standard security body.", r = 3),
      s => status = Some(s))
    assert(text == "--- Page 1 ---\nStandard security body.")
    assert(status.contains(Codecs.PdfDecrypted))
  }

  test("PDF: RC4 40-bit (R2) empty-password document decrypts and extracts") {
    var status: Option[Codecs.PdfEncryption] = None
    val text = Codecs.extractPdf(encryptedPdf("Forty bit body.", r = 2),
      s => status = Some(s))
    assert(text == "--- Page 1 ---\nForty bit body.")
    assert(status.contains(Codecs.PdfDecrypted))
  }

  test("PDF: user-password-protected document is counted unsupported, extracts empty") {
    var status: Option[Codecs.PdfEncryption] = None
    val pdf = encryptedPdf("Secret body.", r = 3, userPw = "hunter2".getBytes)
    assert(Codecs.extractPdf(pdf, s => status = Some(s)) == "")
    assert(status.contains(Codecs.PdfEncryptedUnsupported))
  }

  test("PDF: AES-128 (V4/R4, /CFM /AESV2) empty-password document decrypts and extracts") {
    var status: Option[Codecs.PdfEncryption] = None
    val text = Codecs.extractPdf(encryptedPdfV4("AES one two eight body.", "AESV2"),
      s => status = Some(s))
    assert(text == "--- Page 1 ---\nAES one two eight body.")
    assert(status.contains(Codecs.PdfDecrypted))
  }

  test("PDF: RC4 under V4 crypt filters (/CFM /V2) decrypts and extracts") {
    var status: Option[Codecs.PdfEncryption] = None
    val text = Codecs.extractPdf(encryptedPdfV4("V two in V four body.", "V2"),
      s => status = Some(s))
    assert(text == "--- Page 1 ---\nV two in V four body.")
    assert(status.contains(Codecs.PdfDecrypted))
  }

  test("PDF: V4 without a recognizable /CFM is counted unsupported, not garbled") {
    // take a valid R3 doc and rewrite its encrypt dict to V4/R4 with no
    // crypt-filter dictionary — the method is unknown, so the reader
    // must refuse rather than guess a cipher
    val pdf = new String(encryptedPdf("AES body.", r = 3),
      StandardCharsets.ISO_8859_1)
      .replace("/V 2 /R 3", "/V 4 /R 4").getBytes(StandardCharsets.ISO_8859_1)
    var status: Option[Codecs.PdfEncryption] = None
    assert(Codecs.extractPdf(pdf, s => status = Some(s)) == "")
    assert(status.contains(Codecs.PdfEncryptedUnsupported))
  }

  test("PDF: AES-256 (V5/R6) empty-password document decrypts and extracts") {
    var status: Option[Codecs.PdfEncryption] = None
    val text = Codecs.extractPdf(encryptedPdfV5("AES two five six body.", r = 6),
      s => status = Some(s))
    assert(text == "--- Page 1 ---\nAES two five six body.")
    assert(status.contains(Codecs.PdfDecrypted))
  }

  test("PDF: AES-256 R5 (deprecated single-hash revision) decrypts and extracts") {
    var status: Option[Codecs.PdfEncryption] = None
    val text = Codecs.extractPdf(encryptedPdfV5("R five body.", r = 5),
      s => status = Some(s))
    assert(text == "--- Page 1 ---\nR five body.")
    assert(status.contains(Codecs.PdfDecrypted))
  }

  test("PDF: malformed V5 (missing /UE, U too short) is the audited unsupported boundary") {
    // a V5 dict without the /UE file-key envelope (and a 32-byte /U
    // lacking the salts) is unreadable however correct the crypto —
    // the reader must refuse, not guess
    val pdf = new String(encryptedPdfV4("Body.", "AESV2"),
      StandardCharsets.ISO_8859_1)
      .replace("/V 4 /R 4", "/V 5 /R 6")
      .replace("/CFM /AESV2", "/CFM /AESV3")
      .getBytes(StandardCharsets.ISO_8859_1)
    var status: Option[Codecs.PdfEncryption] = None
    assert(Codecs.extractPdf(pdf, s => status = Some(s)) == "")
    assert(status.contains(Codecs.PdfEncryptedUnsupported))
  }

  test("PDF: encryption ladder round-trips across content lengths and revisions") {
    // CBC padding boundaries and the R6 hardening loop are the two
    // data-dependent paths: sweep content lengths around the 16-byte
    // block edges (deflate output length varies with them) across
    // every supported rung. Empty content extracts as "" (empty pages
    // drop), non-empty as the exact marker + text.
    val lengths = Seq(1, 15, 16, 17, 64, 255)
    def body(len: Int): String =
      (0 until len).map(i => ('a' + i % 26).toChar).mkString
    for (len <- lengths) {
      val text = body(len)
      val expected = s"--- Page 1 ---\n$text"
      for (r <- Seq(2, 3))
        assert(Codecs.extractPdf(encryptedPdf(text, r)) == expected,
          s"RC4 r=$r len=$len")
      for (cfm <- Seq("AESV2", "V2"))
        assert(Codecs.extractPdf(encryptedPdfV4(text, cfm)) == expected,
          s"V4 $cfm len=$len")
      for (r <- Seq(5, 6))
        assert(Codecs.extractPdf(encryptedPdfV5(text, r)) == expected,
          s"V5 r=$r len=$len")
    }
  }

  test("PDF: V5 with a wrong /U validation hash is refused (set user password)") {
    // flip one bit in U's hash half: the document now has a non-empty
    // user password as far as Algorithm 6 is concerned
    val raw = encryptedPdfV5("Guarded body.", r = 6)
    val s = new String(raw, StandardCharsets.ISO_8859_1)
    val uRe = """/U <([0-9A-F]+)>""".r
    val m = uRe.findFirstMatchIn(s).get
    val flipped = (if (m.group(1).charAt(0) == '0') "1" else "0") + m.group(1).substring(1)
    val pdf = (s.substring(0, m.start) + s"/U <$flipped>" + s.substring(m.end))
      .getBytes(StandardCharsets.ISO_8859_1)
    var status: Option[Codecs.PdfEncryption] = None
    assert(Codecs.extractPdf(pdf, s => status = Some(s)) == "")
    assert(status.contains(Codecs.PdfEncryptedUnsupported))
  }

  test("PDF: AES payloads too short for an IV decrypt to empty, not throw") {
    assert(Codecs.aesCbcDecrypt(new Array[Byte](16), Array[Byte](1, 2, 3)).isEmpty)
    assert(Codecs.aesCbcDecrypt(new Array[Byte](16), new Array[Byte](17)).isEmpty)
  }

  test("PDF: malformed /Encrypt dicts degrade to counted-unsupported, never throw") {
    val base = new String(encryptedPdf("Body.", r = 3), StandardCharsets.ISO_8859_1)
    val variants = Seq(
      base.replaceFirst("/O <[0-9A-F]+>", "/O <DEAD>"), // truncated O entry
      base.replaceFirst("/U <[0-9A-F]+>", ""), // missing U entry
      base.replaceFirst("/R 3", "/R 9"), // unknown revision
      base.replaceFirst("/Filter /Standard", "/Filter /Custom"), // non-standard handler
    )
    variants.foreach { v =>
      var status: Option[Codecs.PdfEncryption] = None
      assert(Codecs.extractPdf(v.getBytes(StandardCharsets.ISO_8859_1),
        s => status = Some(s)) == "")
      assert(status.contains(Codecs.PdfEncryptedUnsupported))
    }
  }

  test("PDF: encrypt-dict key scan skips literal-string values") {
    // a literal-string value whose bytes contain "/O <DEAD>" (legal —
    // unknown dict keys are allowed, and /O's own 32 binary bytes can
    // contain such sequences): a raw indexOf binds inside the string and
    // reads garbage for /O, misclassifying a decryptable doc
    val base = new String(encryptedPdf("Literal trap body.", r = 3),
      StandardCharsets.ISO_8859_1)
    val trapped = base.replaceFirst("/O <",
      java.util.regex.Matcher.quoteReplacement(
        """/Decoy (x\) y /O <DEAD> /U <BEEF>) /O <"""))
    var status: Option[Codecs.PdfEncryption] = None
    val text = Codecs.extractPdf(trapped.getBytes(StandardCharsets.ISO_8859_1),
      s => status = Some(s))
    assert(text == "--- Page 1 ---\nLiteral trap body.")
    assert(status.contains(Codecs.PdfDecrypted))
  }

  test("PDF: out-of-range /Length degrades to counted-unsupported, never throws") {
    // /Length 0 would make the RC4 key empty (divide-by-zero in the key
    // schedule); /Length 2048 exceeds the spec's 16-byte maximum
    val base = new String(encryptedPdf("Body.", r = 3), StandardCharsets.ISO_8859_1)
    Seq("/Length 0", "/Length 2048").foreach { bad =>
      val v = base.replaceFirst("/Length 128", bad)
      var status: Option[Codecs.PdfEncryption] = None
      assert(Codecs.extractPdf(v.getBytes(StandardCharsets.ISO_8859_1),
        s => status = Some(s)) == "")
      assert(status.contains(Codecs.PdfEncryptedUnsupported))
    }
  }

  test("PDF: incrementally-updated file binds the LAST trailer's /Encrypt") {
    // an incremental update appends a new trailer; a first-match probe
    // would bind the stale trailer's dangling /Encrypt reference
    val base = new String(encryptedPdf("Incremental body.", r = 3),
      StandardCharsets.ISO_8859_1)
    val updated = base.replaceFirst("trailer <<",
      java.util.regex.Matcher.quoteReplacement(
        "trailer << /Root 1 0 R /Encrypt 99 0 R >>\ntrailer <<"))
    var status: Option[Codecs.PdfEncryption] = None
    val text = Codecs.extractPdf(updated.getBytes(StandardCharsets.ISO_8859_1),
      s => status = Some(s))
    assert(text == "--- Page 1 ---\nIncremental body.")
    assert(status.contains(Codecs.PdfDecrypted))
  }

  test("PDF: extractPdf is total under random mutation of an encrypted doc") {
    // byte flips and truncations land in the /Encrypt dict, the O/U hex
    // strings, stream data, and object delimiters alike — every variant
    // must extract *something* (possibly "") without throwing; the
    // encryption callback, when invoked, reports a defined status
    val base = encryptedPdf("Mutation fuzz body.", r = 3)
    val rnd = new scala.util.Random(99)
    (0 until 300).foreach { i =>
      val v = base.clone()
      i % 3 match {
        case 0 => // k random byte flips
          (0 to rnd.nextInt(8)).foreach(_ =>
            v(rnd.nextInt(v.length)) = rnd.nextInt(256).toByte)
        case 1 => // truncate
          ()
        case _ => // splice a decoy token into a random position
          val tok = "/Encrypt 7 0 R /O (".getBytes(StandardCharsets.ISO_8859_1)
          System.arraycopy(tok, 0, v, rnd.nextInt(v.length - tok.length), tok.length)
      }
      val payload = if (i % 3 == 1) v.take(rnd.nextInt(v.length) + 1) else v
      Codecs.extractPdf(payload, s => assert(s != null)) // must not throw
    }
  }

  test("OOXML: extractors are total under random mutation and truncation") {
    // corrupt zips (bad CRC, cut deflate streams) and malformed XML must
    // yield "" or partial text at the Codecs level — the file's totality
    // contract, not just DocumentLoader.safely's belt-and-braces
    val bases = Seq(
      minimalDocx(), minimalXlsx(), minimalPptx(),
      docx(Seq("one", "two")), pptx(Seq(Seq("a"), Seq("b"))))
    val fns = Seq[Array[Byte] => String](
      Codecs.extractDocx, Codecs.extractXlsx, Codecs.extractPptx)
    val rnd = new scala.util.Random(2026)
    (0 until 300).foreach { i =>
      val v = bases(i % bases.length).clone()
      i % 3 match {
        case 0 =>
          (0 to rnd.nextInt(8)).foreach(_ =>
            v(rnd.nextInt(v.length)) = rnd.nextInt(256).toByte)
        case 1 => ()
        case _ => // corrupt the zip local-header magic specifically
          v(rnd.nextInt(math.min(v.length, 30))) = rnd.nextInt(256).toByte
      }
      val payload = if (i % 3 == 1) v.take(rnd.nextInt(v.length) + 1) else v
      fns.foreach(f => assert(f(payload) != null)) // must not throw
    }
  }

  test("PDF: unencrypted documents report NotEncrypted") {
    var status: Option[Codecs.PdfEncryption] = None
    Codecs.extractPdf(minimalPdf(Seq("Plain body.")), s => status = Some(s))
    assert(status.contains(Codecs.PdfNotEncrypted))
  }

  test("PDF: /Encrypt-shaped bytes inside stream content don't shadow the trailer") {
    // the /Encrypt probe must bind only inside trailer dictionaries: a
    // content stream legitimately carrying the byte sequence
    // "/Encrypt 9 0 R" (here as shown text) must not make a readable,
    // unencrypted file — whose real trailer has no /Encrypt — register
    // as encrypted/unsupported (ADVICE r9)
    val base = minimalPdf(Seq("Mentions /Encrypt 9 0 R in prose."))
    val out = new ByteArrayOutputStream
    out.write(base, 0, base.length - "%%EOF\n".length)
    out.write(("trailer << /Root 1 0 R /Size 8 >>\nstartxref\n0\n%%EOF\n")
      .getBytes(StandardCharsets.ISO_8859_1))
    var status: Option[Codecs.PdfEncryption] = None
    val text = Codecs.extractPdf(out.toByteArray, s => status = Some(s))
    assert(text == "--- Page 1 ---\nMentions /Encrypt 9 0 R in prose.")
    assert(status.contains(Codecs.PdfNotEncrypted))
  }

  // ---- OOXML --------------------------------------------------------

  test("DOCX: body paragraphs then pipe-joined table rows") {
    assert(Codecs.extractDocx(minimalDocx()) ==
      """Survey findings for the north ridge.
        |Second paragraph.
        |sensor | status
        |s-01 | ok""".stripMargin)
  }

  test("XLSX: sheet markers in workbook order, shared+numeric+inline cells") {
    assert(Codecs.extractXlsx(minimalXlsx()) ==
      """--- Sheet: Data ---
        |station | 42
        |kander | 3.5
        |--- Sheet: Notes ---
        |remark""".stripMargin)
  }

  test("PPTX: slide markers, shape paragraphs joined by newline") {
    assert(Codecs.extractPptx(minimalPptx()) ==
      """--- Slide 1 ---
        |Quarterly review
        |Yield up
        |Costs flat
        |--- Slide 2 ---
        |Outlook""".stripMargin)
  }

  test("OOXML: non-zip bytes extract to empty via the loader guard") {
    import graft.sources.DocumentLoader
    assert(DocumentLoader.extractDocx("not a zip".getBytes) == "")
    assert(DocumentLoader.extractXlsx("not a zip".getBytes) == "")
    assert(DocumentLoader.extractPptx("not a zip".getBytes) == "")
  }
}
