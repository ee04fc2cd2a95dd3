package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.Document

/** Multi-format document ingestion (SURVEY §2.1 S1–S8) — the Spark
  * restatement of the reference's recursive folder scan + per-format
  * extraction (reference: src/document_loader.py:44-84).
  *
  * Directory listing, recursion, extension filtering and parallel reads
  * are Spark's `binaryFile`/`text` sources; per-format text extraction
  * is a per-row function over the binary content, backed by the
  * pure-JDK [[Codecs]] (OOXML = ZIP+XML; PDF = FlateDecode streams +
  * Tj/TJ show ops). Marker formats (`--- Page N ---`, `--- Sheet: x
  * ---`, `--- Slide N ---`, pipe-joined table rows) match the
  * reference's observable output exactly.
  */
object DocumentLoader {

  /** Extension → extractor dispatch (document_loader.py:69-84). */
  val SupportedTypes: Set[String] = Set(".pdf", ".docx", ".xlsx", ".pptx", ".md")

  /** Per-session audit counters for encrypted PDFs: (decrypted via the
    * empty-user-password RC4 handler, unsupported → dropped). Surfaced
    * on Bench/Soak stderr like the LSH dropped-bucket count, so an
    * encrypted corpus is a measured loss, not a silent one. Task-retry
    * over-count caveat as for dropped_buckets: telemetry, not data.
    */
  private val pdfEncAccs = new java.util.WeakHashMap[
    SparkSession, (org.apache.spark.util.LongAccumulator, org.apache.spark.util.LongAccumulator)]
  def pdfEncryptionAccs(spark: SparkSession)
      : (org.apache.spark.util.LongAccumulator, org.apache.spark.util.LongAccumulator) =
    pdfEncAccs.synchronized {
      var accs = pdfEncAccs.get(spark)
      if (accs == null) {
        accs = (spark.sparkContext.longAccumulator("graft.pdf.decrypted"),
          spark.sparkContext.longAccumulator("graft.pdf.encrypted_unsupported"))
        pdfEncAccs.put(spark, accs)
      }
      accs
    }

  /** S1: recursive scan of a folder for all supported types. Returns
    * (source_file, content), dropping empty documents
    * (document_loader.py:60-61).
    */
  def loadDocuments(spark: SparkSession, folder: String): Dataset[Document] = {
    import spark.implicits._
    val glob = "*.{pdf,docx,xlsx,pptx,md}"
    val (decAcc, unsupAcc) = pdfEncryptionAccs(spark)
    // asNondeterministic pins ONE evaluation per row: a deterministic
    // UDF gets duplicated into both the projection and the pushed
    // non-empty filter, running the (expensive) binary extraction twice
    // per document and double-counting the audit accumulators
    val extract = udf((path: String, bytes: Array[Byte]) =>
      extractTextAudited(path, bytes, decAcc, unsupAcc)).asNondeterministic()
    spark.read.format("binaryFile")
      .option("recursiveFileLookup", "true")
      .option("pathGlobFilter", glob)
      .load(folder)
      .select(col("path").as("source_file"),
        extract(col("path"), col("content")).as("content"))
      .filter(length(trim(col("content"))) > 0)
      .as[Document]
  }

  /** S6: markdown = raw UTF-8 (document_loader.py:169-177). */
  def extractMarkdown(bytes: Array[Byte]): String =
    new String(bytes, java.nio.charset.StandardCharsets.UTF_8)

  /** S2: PDF — per-page text with `--- Page N ---` markers
    * (document_loader.py:86-102). Pure-JDK parser for the standard
    * subset (uncompressed/FlateDecode streams, Tj/TJ); see [[Codecs]].
    */
  def extractPdf(bytes: Array[Byte]): String =
    safely(Codecs.extractPdf(bytes))

  /** S3: DOCX — paragraphs + tables flattened as pipe-joined cells
    * (document_loader.py:104-127). OOXML = ZIP+XML; see [[Codecs]].
    */
  def extractDocx(bytes: Array[Byte]): String =
    safely(Codecs.extractDocx(bytes))

  /** S4: XLSX — per-sheet `--- Sheet: name ---` + pipe-joined rows
    * (document_loader.py:129-149); see [[Codecs]].
    */
  def extractXlsx(bytes: Array[Byte]): String =
    safely(Codecs.extractXlsx(bytes))

  /** S5: PPTX — per-slide `--- Slide N ---` + shape text
    * (document_loader.py:151-167); see [[Codecs]].
    */
  def extractPptx(bytes: Array[Byte]): String =
    safely(Codecs.extractPptx(bytes))

  /** The reference logs extraction errors and keeps going with whatever
    * was accumulated (document_loader.py:95-101) — a corrupt file drops
    * out of the corpus, never fails the job.
    */
  private def safely(body: => String): String =
    try body catch { case _: Exception => "" }

  def extractText(path: String, bytes: Array[Byte]): String = {
    val ext = path.lastIndexOf('.') match {
      case -1 => ""
      case i => path.substring(i).toLowerCase
    }
    ext match {
      case ".md" => extractMarkdown(bytes)
      case ".pdf" => extractPdf(bytes)
      case ".docx" => extractDocx(bytes)
      case ".xlsx" => extractXlsx(bytes)
      case ".pptx" => extractPptx(bytes)
      case _ => ""
    }
  }

  /** [[extractText]] plus the encrypted-PDF audit trail: executors tick
    * the session accumulators whenever a PDF was decrypted (empty-
    * password RC4) or dropped as encrypted-unsupported.
    */
  def extractTextAudited(path: String, bytes: Array[Byte],
      decrypted: org.apache.spark.util.LongAccumulator,
      unsupported: org.apache.spark.util.LongAccumulator): String =
    if (path.toLowerCase.endsWith(".pdf"))
      safely(Codecs.extractPdf(bytes, {
        case Codecs.PdfDecrypted => decrypted.add(1)
        case Codecs.PdfEncryptedUnsupported => unsupported.add(1)
        case Codecs.PdfNotEncrypted => ()
      }))
    else extractText(path, bytes)

  /** S7: query-set JSON source (utils.py:46-51, main.py:163-172). */
  def loadQueries(spark: SparkSession, path: String): DataFrame =
    spark.read.option("multiLine", "true").json(path)
      .select(col("query_id"), col("query"),
        col("expected_keywords"), col("expected_source_patterns"))

  /** S8: sample-document generator (main.py:66-160 writes 3 demo docs
    * when the corpus folder is empty). Our own fixture text, same
    * structural shape: H1–H3 headings, bullet metrics, a pipe table.
    */
  def writeSampleDocuments(folder: String): Seq[String] = {
    val docs = Map(
      "alpine_survey.md" ->
        """# Alpine Survey 2031
          |
          |## Summary
          |
          |The survey covered nine valleys. Snowpack receded by twelve percent. Trail
          |erosion accelerated near the tree line.
          |
          |## Measurements
          |
          |- stations: 42
          |- readings: 18,204
          |- anomalies: 17
          |
          |### Sensor Table
          |
          || sensor | valley | status |
          || s-01 | kander | ok |
          || s-02 | lauter | degraded |
          |""".stripMargin,
      "harvest_notes.md" ->
        """# Harvest Notes
          |
          |## Orchard Block A
          |
          |Yield improved after thinning. Brix readings averaged fourteen. Frost nets
          |deployed twice.
          |
          |## Orchard Block B
          |
          |Hail damaged the west rows. Replanting begins in spring.
          |""".stripMargin,
      "reactor_log.md" ->
        """# Reactor Log
          |
          |## Cycle 7
          |
          |Output held at ninety-two percent. Coolant margins stayed nominal. One
          |valve actuator was swapped during the maintenance window.
          |""".stripMargin,
    )
    val dir = new java.io.File(folder)
    dir.mkdirs()
    docs.map { case (name, text) =>
      val f = new java.io.File(dir, name)
      java.nio.file.Files.writeString(f.toPath, text)
      f.getPath
    }.toSeq
  }
}
