package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.text.TextFns

/** Deduplication operators for large-scale text corpora (builder-prompt
  * first-class components): exact, n-gram Jaccard, MinHash+LSH, SimHash,
  * embedding-cosine.
  *
  * All hashing goes through md5 so every stage is reproducible in the
  * DuckDB oracle. Scale design per operator:
  *  - exact: one hash-aggregate on the fingerprint — the cheapest
  *    possible full-corpus dedup; shuffle is the fingerprint groupBy.
  *  - n-gram Jaccard: the pair generator joins on shingle, so cost is
  *    Σ df(shingle)² — fine for realistic shingle vocabularies; for
  *    skewed corpora cap document frequency (drop shingles with df > N,
  *    the standard trick) before the join.
  *  - MinHash+LSH: candidate generation by band-bucket join touches only
  *    b × |docs| signature rows (b=4 bands × r=4 rows here); true Jaccard
  *    is then verified on candidates only. This is the 100 TB path.
  *  - SimHash: linear signature computation; hamming-0 clustering via
  *    groupBy(simhash).
  *  - embedding-cosine: brute-force for small corpora; LSH/IVF variants
  *    in graft.search for scale.
  */
object Dedup {

  /** Distinct word-3-gram shingles per document, hashed: (id, s) with
    * `s` the portable 32-bit shingle hash (TextFns.md5Int) — the
    * standard at-scale representation: every downstream exchange
    * (distinct, Jaccard self-join, minhash) moves and compares 8-byte
    * longs instead of multi-word strings. Hash collisions (~2^-32) are
    * shared deterministically with the DuckDB oracle, so results remain
    * bit-identical.
    *
    * Tokens are bound to a column BEFORE the shingle lambda: splicing the
    * `split()` expression tree into the higher-order function would make
    * every `element_at` re-run the regex split (O(len²) per document —
    * measured 5× slower at sf0.1).
    */
  def shingleSet(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("id"), TextFns.tokens(col(textCol)).as("t"))
      .select(col("id"), explode(TextFns.shingles3(col("t"))).as("sgl"))
      .select(col("id"), TextFns.md5Int(col("sgl")).as("s"))
      .distinct()

  /** True Jaccard for every pair sharing ≥1 shingle: (a, b, jac). */
  def pairJaccard(sh: DataFrame): DataFrame = {
    val sizes = sh.groupBy(col("id")).agg(count(lit(1)).as("n"))
    val shared = sh.as("x").join(sh.as("y"), col("x.s") === col("y.s"))
      .filter(col("x.id") < col("y.id"))
      .groupBy(col("x.id").as("a"), col("y.id").as("b"))
      .agg(count(lit(1)).as("shared"))
    shared
      .join(sizes.select(col("id").as("a"), col("n").as("na")), "a")
      .join(sizes.select(col("id").as("b"), col("n").as("nb")), "b")
      .select(col("a"), col("b"),
        (col("shared").cast("double") / (col("na") + col("nb") - col("shared")))
          .as("jac"))
  }

  /** Modulus / multipliers of the affine minhash permutations
    * mh_j = (a_j·h + b_j) mod P over the 32-bit shingle hash h.
    * P is the smallest prime > 2^32; a_j < 2^31 keeps a_j·h < 2^63
    * (no BIGINT overflow, in Spark or DuckDB). Shared with the oracle
    * via [[permValuesSql]] — single source of truth.
    */
  val MinhashP: Long = 4294967311L
  def permA(j: Int): Long = ((2L * j + 1L) * 2654435761L) % 2147483647L
  def permB(j: Int): Long = (j.toLong * 1013904223L) % MinhashP

  /** DuckDB `(VALUES ...)` rows `(j, a, b)` for the first n permutations. */
  def permValuesSql(n: Int): String =
    (0 until n).map(j => s"(${j}, ${permA(j)}, ${permB(j)})").mkString(", ")

  /** MinHash signatures, wide form: ONE hash-aggregate with `numHashes`
    * min() expressions — (id, mh_0..mh_{n-1}). The naive shape
    * (crossJoin with a seed table, then groupBy (id, seed)) shuffles
    * |shingles| × numHashes rows; this shuffles |docs| rows once.
    * The per-permutation values are affine transforms of the 32-bit
    * shingle hash `s` (universal hashing) — no per-permutation
    * rehashing; numHashes md5 calls per shingle would dominate the
    * whole operator.
    */
  def minhash(sh: DataFrame, numHashes: Int): DataFrame = {
    val mins = (0 until numHashes).map(j =>
      min((lit(permA(j)) * col("s") + lit(permB(j))) % lit(MinhashP)).as(s"mh_$j"))
    sh.groupBy(col("id")).agg(mins.head, mins.tail: _*)
  }

  /** LSH band keys from wide minhash signatures: (id, band, bkey). */
  def lshBands(mh: DataFrame, rowsPerBand: Int): DataFrame = {
    val numHashes = mh.columns.count(_.startsWith("mh_"))
    val bandKeys = (0 until numHashes / rowsPerBand).map { b =>
      val cols = (b * rowsPerBand until (b + 1) * rowsPerBand).map(j => col(s"mh_$j"))
      md5(concat_ws("|", cols: _*))
    }
    mh.select(col("id"),
        posexplode(array(bandKeys: _*)).as(Seq("band", "bkey")))
  }

  /** Candidate pairs sharing ≥1 LSH band bucket: (a, b) distinct,
    * a < b. One groupBy over the band table and in-bucket pair
    * generation — the self-join formulation shuffles the band table
    * twice and needs it materialized; this reads it once. Bucket
    * contents fit in memory by construction (a degenerate bucket of
    * identical documents is the pathological case — cap df upstream,
    * SCALING.md "Skew").
    */
  def lshCandidates(bands: DataFrame): DataFrame = {
    val spark = bands.sparkSession
    import spark.implicits._
    bands.groupBy(col("band"), col("bkey"))
      .agg(collect_list(col("id").cast("long")).as("ids"))
      .select(col("ids")).as[Seq[Long]]
      .flatMap { ids =>
        val s = ids.sorted
        for {
          i <- s.indices.iterator
          j <- Iterator.range(i + 1, s.length)
        } yield (s(i), s(j))
      }
      .toDF("a", "b")
      .distinct()
  }

  /** True Jaccard restricted to given candidate pairs — the verify stage
    * of LSH dedup. Cost is |candidates| × shingles-per-doc, independent
    * of corpus size; the candidate set is broadcast.
    */
  def candidateJaccard(sh: DataFrame, cands: DataFrame): DataFrame = {
    val sizes = sh.groupBy(col("id")).agg(count(lit(1)).as("n"))
    val shared = broadcast(cands)
      .join(sh.as("x"), col("x.id") === col("a"))
      .join(sh.as("y"), col("y.id") === col("b") && col("y.s") === col("x.s"))
      .groupBy(col("a"), col("b"))
      .agg(count(lit(1)).as("shared"))
    shared
      .join(sizes.select(col("id").as("a"), col("n").as("na")), "a")
      .join(sizes.select(col("id").as("b"), col("n").as("nb")), "b")
      .select(col("a"), col("b"),
        (col("shared").cast("double") / (col("na") + col("nb") - col("shared")))
          .as("jac"))
  }

  /** 32-bit SimHash over term frequencies, as a bit string: (id, simhash). */
  def simhash(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val spark = docs.sparkSession
    val tf = docs
      .select(col(idCol).as("id"),
        explode(TextFns.tokens(col(textCol))).as("tok"))
      .groupBy(col("id"), col("tok"))
      .agg(count(lit(1)).as("cnt"))
    val bits = spark.range(32).select(col("id").cast("int").as("b"))
    tf.crossJoin(broadcast(bits))
      // bit b of a token = MSB of hex digit b of its md5 (hex chars are
      // lowercase; '8' <= c compares identically in both engines)
      .withColumn("v",
        when(substring(md5(col("tok")), col("b") + 1, lit(1)) >= "8", col("cnt"))
          .otherwise(-col("cnt")))
      .groupBy(col("id"), col("b"))
      .agg(sum(col("v")).as("s"))
      .groupBy(col("id"))
      .agg(concat_ws("", expr(
        "transform(array_sort(collect_list(struct(b, CASE WHEN s > 0 THEN '1' ELSE '0' END AS bit))), x -> x.bit)"))
        .as("simhash"))
  }

  /** Attach `dup_of` = min id within each group-key value. */
  def dupOf(df: DataFrame, idCol: String, keyCol: String): DataFrame =
    df.withColumn("dup_of", min(col(idCol)).over(Window.partitionBy(col(keyCol))))
      .withColumn("is_dup", (col(idCol) =!= col("dup_of")).cast("int"))
}
