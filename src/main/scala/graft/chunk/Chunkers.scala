package graft.chunk

import scala.collection.mutable.ArrayBuffer

import graft.model.{Chunk, ChunkMeta}

/** The five chunking strategies, re-expressed as pure Scala functions
  * `(text, sourceFile) => Seq[Chunk]` for use in
  * `Dataset[Document].flatMap` — order-sensitive sequential folds
  * *within* a document, embarrassingly parallel *across* documents
  * (SURVEY §2.2 design note). No Catalyst Generator needed: document-
  * level parallelism is the right grain.
  *
  * Semantics mirror the reference exactly (cited per operator); the
  * Python quirks that change chunk boundaries are preserved:
  *  - token count = `len(text.split()) + len(text)//4` with Python
  *    `str.split()` empty-drop semantics (reference: src/utils.py:30-35)
  *  - sentence split keeps/strips per call site — some sites filter
  *    blanks (chunking.py:102-106), the large-section paths do not
  *    (chunking.py:250, :423)
  *  - recursive's paragraph token count is computed on the *unstripped*
  *    paragraph while content is stripped (chunking.py:128-137)
  */
object Chunkers {

  val ChunkSize = 512 // tokens (reference: config.py:10-32, all strategies)
  val FixedOverlap = 100
  val MinSectionSize = 100

  // Precompiled — String.split(regex) recompiles the pattern per call,
  // which dominates chunking cost on large corpora.
  // UNICODE_CHARACTER_CLASS: Python's str.split()/\s are Unicode-aware
  // (NBSP etc.); Java's \s is ASCII-only without the flag. Likewise
  // String.strip() below mirrors Python strip() where trim() would not.
  private val UFlag = java.util.regex.Pattern.UNICODE_CHARACTER_CLASS
  private val WsPat = java.util.regex.Pattern.compile("\\s+", UFlag)
  private val SentencePat = java.util.regex.Pattern.compile("(?<=[.!?])\\s+", UFlag)
  private val ParaPat = java.util.regex.Pattern.compile("\n\n", java.util.regex.Pattern.LITERAL)

  /** Python `str.split()`: split on whitespace runs, drop empties. */
  private def pySplit(text: String): Array[String] =
    WsPat.split(text).filter(_.nonEmpty)

  /** reference: src/utils.py:30-35 `get_token_count`. */
  def tokenCount(text: String): Int = pySplit(text).length + text.length / 4

  /** reference: src/chunking.py:102-106 — split, strip, drop blanks. */
  def splitSentences(text: String): Seq[String] =
    SentencePat.split(text).iterator.map(_.strip()).filter(_.nonEmpty).toSeq

  /** Raw sentence split (no strip/filter) — the large-content paths at
    * chunking.py:250 and :423 use `re.split` directly.
    */
  private def splitSentencesRaw(text: String): Seq[String] =
    SentencePat.split(text, -1).toSeq // -1: keep trailing empties like re.split

  private def mkChunk(source: String, strategy: String, index: Int,
      content: String, meta: ChunkMeta): Chunk =
    Chunk(s"${source}_${strategy}_$index", content, source, index, strategy, meta)

  // -------------------------------------------------------------------
  // C1 fixed_size (reference: src/chunking.py:38-100)
  // -------------------------------------------------------------------
  def fixedSize(text: String, source: String): Seq[Chunk] = {
    val strategy = "fixed_size"
    val out = ArrayBuffer.empty[Chunk]
    var current = ArrayBuffer.empty[String]
    var currentTokens = 0
    var index = 0
    for (sentence <- splitSentences(text)) {
      val sentTokens = tokenCount(sentence)
      if (currentTokens + sentTokens > ChunkSize && current.nonEmpty) {
        val chunkText = current.mkString(" ")
        out += mkChunk(source, strategy, index, chunkText,
          ChunkMeta(chunk_size = Some(tokenCount(chunkText)),
            sentence_count = Some(current.length)))
        index += 1
        // Overlap: trailing sentences totaling ≥ 100 tokens (py :68-77)
        var overlapTokens = 0
        val overlap = ArrayBuffer.empty[String]
        var i = current.length - 1
        while (i >= 0 && overlapTokens < FixedOverlap) {
          overlapTokens += tokenCount(current(i))
          current(i) +=: overlap
          i -= 1
        }
        current = overlap
        currentTokens = overlapTokens
      }
      current += sentence
      currentTokens += sentTokens
    }
    if (current.nonEmpty) {
      val chunkText = current.mkString(" ")
      out += mkChunk(source, strategy, index, chunkText,
        ChunkMeta(chunk_size = Some(tokenCount(chunkText)),
          sentence_count = Some(current.length)))
    }
    out.toSeq
  }

  // -------------------------------------------------------------------
  // C2 recursive (reference: src/chunking.py:118-207)
  // -------------------------------------------------------------------
  def recursive(text: String, source: String): Seq[Chunk] =
    recursiveNamed(text, source, "recursive")

  private def recursiveNamed(text: String, source: String, strategy: String): Seq[Chunk] = {
    val out = ArrayBuffer.empty[Chunk]
    var index = 0
    for (para <- ParaPat.split(text, -1) if para.strip().nonEmpty) {
      val paraTokens = tokenCount(para) // unstripped (py :128)
      if (paraTokens <= ChunkSize) {
        out += mkChunk(source, strategy, index, para.strip(),
          ChunkMeta(chunk_size = Some(paraTokens), level = Some("paragraph")))
        index += 1
      } else {
        // sentence packing, no overlap (py :158-207)
        var current = ArrayBuffer.empty[String]
        var currentTokens = 0
        def flush(): Unit = if (current.nonEmpty) {
          val chunkText = current.mkString(" ")
          out += mkChunk(source, strategy, index, chunkText,
            ChunkMeta(chunk_size = Some(tokenCount(chunkText)),
              level = Some("sentence"), sentence_count = Some(current.length)))
          index += 1
          current = ArrayBuffer.empty[String]
          currentTokens = 0
        }
        for (sent <- splitSentences(para)) {
          val sentTokens = tokenCount(sent)
          if (currentTokens + sentTokens > ChunkSize && current.nonEmpty) flush()
          current += sent
          currentTokens += sentTokens
        }
        flush()
      }
    }
    out.toSeq
  }

  // -------------------------------------------------------------------
  // C3 structure_aware (reference: src/chunking.py:225-344)
  // -------------------------------------------------------------------
  // (?U) = UNICODE_CHARACTER_CLASS (Python \s parity); (?s) = DOTALL so
  // '.' matches \r like Python's (which only excludes \n) — a CRLF line
  // keeps its \r inside the captured heading, exactly as re.match does
  private val HeadingRe = "(?Us)^(#{1,3})\\s+(.+)$".r

  /** (heading | null, content, level); preamble has level 0 (py :317-344). */
  private[chunk] def extractSections(text: String): Seq[(String, String, Int)] = {
    val sections = ArrayBuffer.empty[(String, String, Int)]
    var heading: String = null
    var level = 0
    var content = ArrayBuffer.empty[String]
    for (line <- text.split("\n", -1)) {
      HeadingRe.findFirstMatchIn(line) match {
        case Some(m) =>
          if (content.nonEmpty)
            sections += ((if (heading == null) "" else heading, content.mkString("\n"), level))
          level = m.group(1).length
          heading = m.group(2)
          content = ArrayBuffer.empty[String]
        case None =>
          content += line
      }
    }
    if (content.nonEmpty)
      sections += ((if (heading == null) "" else heading, content.mkString("\n"),
        if (level == 0) 1 else level))
    if (sections.isEmpty) Seq(("", text, 1)) else sections.toSeq
  }

  def structureAware(text: String, source: String): Seq[Chunk] = {
    val strategy = "structure_aware"
    val out = ArrayBuffer.empty[Chunk]
    var index = 0
    for ((heading, content, level) <- extractSections(text) if content.strip().nonEmpty) {
      val contentTokens = tokenCount(content)
      val headingStr = if (heading.nonEmpty) s"${"#" * level} $heading" else ""
      // merge small sections into the previous chunk (py :239-246)
      var merged = false
      if (contentTokens < MinSectionSize && out.nonEmpty && heading.nonEmpty) {
        val prev = out.last
        val mergedText = s"${prev.content}\n\n$headingStr\n$content"
        if (tokenCount(mergedText) <= ChunkSize * 1.5) {
          out(out.length - 1) = prev.copy(content = mergedText,
            metadata = prev.metadata.copy(merged = Some(true)))
          merged = true
        }
      }
      if (!merged) {
        if (contentTokens > ChunkSize) {
          // split by raw sentences, heading prepended (py :249-295)
          var current = ArrayBuffer.empty[String]
          if (headingStr.nonEmpty) current += headingStr
          var currentTokens = tokenCount(current.mkString("\n"))
          def flush(): Unit = if (current.nonEmpty) {
            val chunkText = current.mkString("\n").strip()
            out += mkChunk(source, strategy, index, chunkText,
              ChunkMeta(chunk_size = Some(tokenCount(chunkText)),
                heading = if (heading.isEmpty) None else Some(heading),
                level = Some(level.toString)))
            index += 1
            current = ArrayBuffer.empty[String]
            currentTokens = 0
          }
          for (sent <- splitSentencesRaw(content)) {
            val sentTokens = tokenCount(sent)
            if (currentTokens + sentTokens > ChunkSize && current.nonEmpty) flush()
            current += sent
            currentTokens += sentTokens
          }
          flush()
        } else {
          val chunkText = s"$headingStr\n$content".strip()
          out += mkChunk(source, strategy, index, chunkText,
            ChunkMeta(chunk_size = Some(contentTokens), // content tokens, not chunk (py :306)
              heading = if (heading.isEmpty) None else Some(heading),
              level = Some(level.toString)))
          index += 1
        }
      }
    }
    out.toSeq
  }

  // -------------------------------------------------------------------
  // C4 hybrid (reference: src/chunking.py:358-380)
  // -------------------------------------------------------------------
  def hybrid(text: String, source: String): Seq[Chunk] = {
    val strategy = "hybrid"
    val structure = structureAware(text, source)
    val noStructure = structure.size > 50 ||
      structure.forall(_.metadata.level.contains("1"))
    val result =
      if (noStructure) recursiveNamed(text, source, strategy)
      else structure
    result.map(c => c.copy(strategy = strategy,
      chunk_id = s"${source}_${strategy}_${c.chunk_index}"))
  }

  // -------------------------------------------------------------------
  // C5 table_aware (reference: src/chunking.py:392-501)
  // -------------------------------------------------------------------
  /** Alternating (isTable, block) runs; a table line has ≥2 '|' (py :487). */
  private[chunk] def splitByTables(text: String): Seq[(Boolean, String)] = {
    val parts = ArrayBuffer.empty[(Boolean, String)]
    var block = ArrayBuffer.empty[String]
    var isTable = false
    for (line <- text.split("\n", -1)) {
      val lineIsTable = line.count(_ == '|') >= 2
      if (lineIsTable != isTable) {
        if (block.nonEmpty) { parts += ((isTable, block.mkString("\n"))); block = ArrayBuffer.empty }
        isTable = lineIsTable
      }
      block += line
    }
    if (block.nonEmpty) parts += ((isTable, block.mkString("\n")))
    parts.toSeq
  }

  def tableAware(text: String, source: String): Seq[Chunk] = {
    val strategy = "table_aware"
    val out = ArrayBuffer.empty[Chunk]
    var index = 0
    for ((isTable, content) <- splitByTables(text) if content.strip().nonEmpty) {
      val contentTokens = tokenCount(content)
      if (isTable || contentTokens <= ChunkSize) {
        out += mkChunk(source, strategy, index, content,
          ChunkMeta(chunk_size = Some(contentTokens), is_table = Some(isTable),
            chunk_type = Some(if (isTable) "table" else "text")))
        index += 1
      } else {
        var current = ArrayBuffer.empty[String]
        var currentTokens = 0
        def flush(): Unit = if (current.nonEmpty) {
          val chunkText = current.mkString(" ")
          out += mkChunk(source, strategy, index, chunkText,
            ChunkMeta(chunk_size = Some(tokenCount(chunkText)),
              is_table = Some(false), chunk_type = Some("text")))
          index += 1
          current = ArrayBuffer.empty[String]
          currentTokens = 0
        }
        for (sent <- splitSentencesRaw(content)) {
          val sentTokens = tokenCount(sent)
          if (currentTokens + sentTokens > ChunkSize && current.nonEmpty) flush()
          current += sent
          currentTokens += sentTokens
        }
        flush()
      }
    }
    out.toSeq
  }

  /** C6 registry (reference: src/chunking.py:504-512). */
  val all: Map[String, (String, String) => Seq[Chunk]] = Map(
    "fixed_size" -> (fixedSize _),
    "recursive" -> (recursive _),
    "structure_aware" -> (structureAware _),
    "hybrid" -> (hybrid _),
    "table_aware" -> (tableAware _),
  )

  val strategyNames: Seq[String] =
    Seq("fixed_size", "recursive", "structure_aware", "hybrid", "table_aware")

  /** C7 fan-out: one doc → chunks of every strategy (main.py:175-195). */
  def chunkAll(text: String, source: String): Seq[Chunk] =
    strategyNames.flatMap(s => all(s)(text, source))
}
