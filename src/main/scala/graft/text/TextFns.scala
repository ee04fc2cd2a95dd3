package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text primitives shared by the chunking, dedup and text-analysis
  * surfaces. Everything here is a pure Catalyst expression (codegen-able,
  * no UDFs) and — deliberately — reproducible in DuckDB for the oracle:
  * tokenization is `\s+` splitting and all hashing goes through `md5`,
  * which both engines implement identically.
  */
object TextFns {

  /** Whitespace tokens of trimmed text (Python `str.split()` semantics —
    * reference: src/utils.py:30-35 uses `len(text.split())`).
    */
  def tokens(text: Column): Column = split(trim(text), "\\s+")

  /** The reference's token-count heuristic: words + chars/4
    * (reference: src/utils.py:30-35 `count_tokens`).
    */
  def tokenCount(text: Column): Column =
    when(length(trim(text)) === 0, lit(0))
      .otherwise(size(tokens(text)) + (length(text) / 4).cast("int"))

  /** Normalized form for exact dedup: lowercase, collapsed whitespace. */
  def normalized(text: Column): Column =
    regexp_replace(lower(trim(text)), "\\s+", " ")

  /** Word k-gram shingles (k=3), as space-joined strings. */
  def shingles3(toks: Column): Column = {
    val t = toks
    when(size(t) >= 3,
      transform(sequence(lit(0), size(t) - 3),
        i => concat(element_at(t, i + 1), lit(" "),
          element_at(t, i + 2), lit(" "), element_at(t, i + 3))))
      .otherwise(array().cast("array<string>"))
  }

  /** JVM-side [[tokens]] — the SAME token array Catalyst produces, for
    * code that runs outside Catalyst (the winnowing flatMap). The
    * semantics differ from Java's `String.trim().split("\\s+")` in two
    * ways that matter on realistic corpora (ADVICE r14): SQL `trim`
    * strips ASCII SPACES ONLY (Java trim strips every char ≤ U+0020,
    * tabs and newlines included), and Catalyst `split` runs with limit
    * -1, KEEPING boundary empty tokens (`"a b c\n"` tokenizes to
    * `["a","b","c",""]` in both engines — the trailing newline survives
    * the space-only trim and the final split match is at the end of
    * input). Code that tokenized differently produced different
    * shingles, hence different winnowing fingerprints, on any text with
    * leading/trailing tabs or newlines.
    */
  private val wsPattern = java.util.regex.Pattern.compile("\\s+")

  def tokensJvm(text: String): Array[String] = {
    var b = 0
    var e = text.length
    while (b < e && text.charAt(b) == ' ') b += 1
    while (e > b && text.charAt(e - 1) == ' ') e -= 1
    wsPattern.split(text.substring(b, e), -1)
  }

  /** Portable 32-bit integer hash: first 8 hex chars of md5, as a long.
    * (DuckDB: `CAST('0x' || substr(md5(s),1,8) AS BIGINT)`.)
    */
  def md5Int(c: Column): Column =
    conv(substring(md5(c), 1, 8), 16, 10).cast("long")

  /** JVM-side [[md5Int]] — the same first-4-bytes-of-md5 value for code
    * that runs outside Catalyst (the winnowing flatMap, streaming state
    * functions, specs). The digest instance is thread-local: hot paths
    * call this once per SHINGLE, and a fresh MessageDigest per call is
    * pure allocation churn (MD5 digests are stateful but reset() on
    * every digest() completion, and executor task threads never share
    * one concurrently).
    */
  private val md5Local =
    ThreadLocal.withInitial[java.security.MessageDigest](() =>
      java.security.MessageDigest.getInstance("MD5"))

  def md5IntJvm(s: String): Long = {
    val d = md5Local.get()
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
      ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
  }
}
