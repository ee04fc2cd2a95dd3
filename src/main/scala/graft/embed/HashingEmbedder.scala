package graft.embed

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

/** Deterministic hashing embedder — the engine's stand-in for the
  * reference's sentence-transformer encode (reference:
  * src/embeddings.py:48-57): term-frequency hashing into a fixed
  * dimension, L2-normalized so cosine ≡ dot product (the reference
  * normalizes at encode time, src/embeddings.py:56).
  *
  * Each "model" of the reference's registry (config.py:35-41, five
  * models with dims 384/768/1024) becomes a (name, dim, seed) triple —
  * same shape of the model-registry API, fully deterministic, and
  * oracle-friendly (the bucket hash is the same md5-prefix integer the
  * SQL surface uses, see TextFns.md5Int).
  */
object HashingEmbedder {

  /** E2 model registry analog: five named models, distinct dims/seeds. */
  case class Model(name: String, dim: Int, seed: Int)
  val models: Seq[Model] = Seq(
    Model("hash-64", 64, 1),
    Model("hash-128", 128, 2),
    Model("hash-256a", 256, 3),
    Model("hash-256b", 256, 4),
    Model("hash-384", 384, 5),
  )
  val modelsByName: Map[String, Model] = models.map(m => m.name -> m).toMap

  /** E4 preprocess: strip + collapse whitespace (embeddings.py:121-130). */
  def preprocess(text: String): String = text.trim.replaceAll("\\s+", " ")

  private def md5PrefixLong(s: String): Long = {
    val d = MessageDigest.getInstance("MD5")
      .digest(s.getBytes(StandardCharsets.UTF_8))
    // first 4 bytes as unsigned 32-bit — same value as
    // CAST('0x' || substr(md5(s),1,8) AS BIGINT) in SQL
    ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
      ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
  }

  // Token hashes follow a Zipfian distribution in any real corpus — memoize
  // (seed|token) → md5 prefix per executor JVM. Bounded: beyond the cap we
  // fall through to hashing (never wrong, just uncached).
  private val MaxCache = 1 << 20
  private val hashCache = new java.util.concurrent.ConcurrentHashMap[String, Long]()

  private def md5PrefixCached(key: String): Long = {
    val got = hashCache.get(key)
    if (got != 0L) return got // md5 prefix 0 is ~2^-32; falls through harmlessly
    val h = md5PrefixLong(key)
    if (hashCache.size < MaxCache) hashCache.put(key, h)
    h
  }

  private val WsPattern = java.util.regex.Pattern.compile("\\s+")

  /** E1: text → L2-normalized float vector. Tokens are hashed (seeded)
    * into `dim` buckets; the vector is the normalized bucket-count
    * histogram. Zero-token text → zero vector.
    */
  def embed(text: String, model: Model): Array[Float] = {
    val toks = WsPattern.split(text)
    embedTokens(toks, model)
  }

  private def embedTokens(toks: Array[String], model: Model): Array[Float] = {
    val v = new Array[Double](model.dim)
    for (tok <- toks if tok.nonEmpty) {
      val b = (md5PrefixCached(s"${model.seed}|$tok") % model.dim).toInt
      v(b) += 1.0
    }
    var ss = 0.0
    var i = 0
    while (i < model.dim) { ss += v(i) * v(i); i += 1 }
    val n = math.sqrt(ss)
    val out = new Array[Float](model.dim)
    if (n > 0) { i = 0; while (i < model.dim) { out(i) = (v(i) / n).toFloat; i += 1 } }
    out
  }

  /** All models at once — tokenize once, hash per (seed, token) with the
    * memo cache. The per-chunk tokenization cost is paid once instead of
    * once per model.
    */
  def embedAll(text: String, models: Seq[Model]): Seq[Array[Float]] = {
    val toks = WsPattern.split(text)
    models.map(m => embedTokens(toks, m))
  }

  /** E6: cosine of two normalized vectors = dot product
    * (embeddings.py:149-155).
    */
  def similarity(a: Array[Float], b: Array[Float]): Double = {
    var s = 0.0
    var i = 0
    while (i < a.length) { s += a(i).toDouble * b(i).toDouble; i += 1 }
    s
  }
}
