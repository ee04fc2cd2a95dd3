package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.text.TextFns

/** Text-analysis surface over `documents` (builder-prompt first-class
  * components: token counting, quality scoring, language-ID,
  * fingerprinting, term stats). All operators are pure Catalyst
  * expressions over one narrow scan — no shuffle except the final
  * aggregates, which are partial+final hash aggregates.
  */
object TextAnalysis {

  private val stopEn = Seq("the", "a", "of", "to", "and", "in", "is", "it", "on", "for")
  private val markers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "is", "to", "in"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein", "nicht"),
    "es" -> Seq("el", "los", "y", "es", "un", "que", "de"),
    "fr" -> Seq("le", "les", "et", "est", "un", "que", "une"),
    "zh" -> Seq("的", "是", "在", "了", "我"),
  )

  private def countIn(toks: Column, words: Seq[String]): Column =
    size(filter(toks, w => w.isin(words: _*)))

  /** GPT-2-style pre-tokenizer pattern, restricted to the RE2-safe
    * subset (no lookahead — the only divergence from the original is
    * trailing-whitespace splitting, irrelevant for counting): English
    * contraction suffixes, letter runs, digit runs, punctuation runs
    * (each with an optional leading space), then whitespace runs.
    * Identical semantics in Java regex and DuckDB RE2, so the count is
    * oracle-checkable.
    */
  val BpeTokenRe: String =
    "'(?:s|t|re|ve|m|ll|d)| ?\\p{L}+| ?\\p{N}+| ?[^\\s\\p{L}\\p{N}]+|\\s+"

  /** Reference token-count heuristic per document (utils.py:30-35),
    * plus the BPE-ish regex pre-token count a real pipeline budgets
    * with (whitespace words alone undercount code/punctuation-heavy
    * text). Narrow per-row map.
    */
  def tokenCount(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(
        col("doc_id"),
        TextFns.tokenCount(col("text")).as("n_tokens"),
        size(TextFns.tokens(col("text"))).as("n_words"),
        size(regexp_extract_all(col("text"), lit(BpeTokenRe), lit(0)))
          .as("n_bpe_pretokens"),
        length(col("text")).as("n_chars"))
      .orderBy("doc_id")

  /** Quality scoring: length/word/stopword/digit signals. */
  def textQuality(spark: SparkSession, dir: String): DataFrame = {
    val t = TextFns.tokens(col("text"))
    val nWords = size(t).cast("double")
    val nChars = length(col("text")).cast("double")
    val wordChars = length(regexp_replace(col("text"), "\\s+", "")).cast("double")
    val nStop = countIn(t, stopEn).cast("double")
    val nDigit = (nChars - length(regexp_replace(col("text"), "[0-9]", ""))).cast("double")
    Tables.documents(spark, dir)
      .select(
        col("doc_id"),
        nWords.cast("long").as("n_words"),
        round(wordChars / nWords, 4).as("avg_word_len"),
        round(nStop / nWords, 4).as("stopword_ratio"),
        round(nDigit / nChars, 4).as("digit_ratio"),
        (nWords >= 20 && nWords <= 1000).cast("int").as("len_ok"))
      .orderBy("doc_id")
  }

  /** Gopher quality-filter rule set (Rae et al. 2021, "Scaling
    * Language Models: ...Gopher", Table A1 document filters) — the
    * DOCUMENTED production filter conjunction, where [[textQuality]]
    * reports raw ratios: word count in [50, 100k], mean word length in
    * [3, 10], ≥80% of words containing an alphabetic character, ≥2
    * distinct members of the stop list (Gopher's rule uses its 8-word
    * English list; here the house stopEn list — the fixture's
    * synthetic vocabulary doesn't draw from Gopher's exact words, and
    * the RULE SHAPE, ≥2 distinct function words, is the filter), and
    * the repetition
    * rule (fraction of characters covered by the most frequent 2-gram
    * ≤ 0.20). Per-document: the measured values, each rule's 0/1 flag,
    * and the conjunction.
    *
    * Determinism: ratios are floor-rounded to 4 decimals BEFORE the
    * threshold compare on both engines (the house r4 discipline — a
    * raw-double compare could flip on a value sitting exactly at a
    * threshold); the top-2-gram argmax breaks count ties to the
    * lexicographically LAST bigram via max(struct(n, b)), which the
    * oracle mirrors with ORDER BY n DESC, b DESC.
    *
    * Scale: the per-doc bigram count + argmax aggregates map-side onto
    * (doc, bigram) then doc keys — linear in corpus tokens; everything
    * else is a narrow per-row projection. No joins beyond the
    * |docs|-sized top-bigram left join.
    */
  def gopherRules(spark: SparkSession, dir: String): DataFrame =
    gopherRulesOf(Tables.documents(spark, dir))

  def gopherRulesOf(docs: DataFrame): DataFrame = {
    def r4(c: Column): Column = floor(c * 10000 + 0.5) / 10000
    val base = docs.select(col("doc_id"), col("text"),
      TextFns.tokens(col("text")).as("toks"))
    val bi = base.select(col("doc_id"), explode(expr(
      """CASE WHEN size(toks) >= 2
        |  THEN transform(sequence(1, size(toks) - 1),
        |         i -> concat(element_at(toks, i), ' ', element_at(toks, i + 1)))
        |  ELSE array() END""".stripMargin)).as("b"))
    val top = bi.groupBy(col("doc_id"), col("b")).agg(count(lit(1)).as("n"))
      .groupBy(col("doc_id"))
      .agg(max(struct(col("n"), col("b"))).as("t"))
      .select(col("doc_id"), col("t.n").as("top_n"), col("t.b").as("top_b"))
    val stopHits = stopEn.map(w =>
      when(array_contains(col("toks"), w), 1).otherwise(0)).reduce(_ + _)
    base.join(top, Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        size(col("toks")).cast("long").as("n_words"),
        r4(length(regexp_replace(col("text"), "\\s+", "")).cast("double") /
          size(col("toks"))).as("mean_word_len"),
        r4(expr("size(filter(toks, x -> x rlike '[a-zA-Z]'))").cast("double") /
          size(col("toks"))).as("alpha_frac"),
        stopHits.cast("int").as("stop_hits"),
        r4(coalesce(col("top_n") * length(col("top_b")), lit(0L)).cast("double") /
          length(col("text"))).as("top2gram_frac"))
      .withColumn("r_words", col("n_words").between(50, 100000).cast("int"))
      .withColumn("r_mwl", col("mean_word_len").between(3.0, 10.0).cast("int"))
      .withColumn("r_alpha", (col("alpha_frac") >= 0.8).cast("int"))
      .withColumn("r_stop", (col("stop_hits") >= 2).cast("int"))
      .withColumn("r_rep", (col("top2gram_frac") <= 0.2).cast("int"))
      .withColumn("gopher_pass",
        (col("r_words") === 1 && col("r_mwl") === 1 && col("r_alpha") === 1 &&
          col("r_stop") === 1 && col("r_rep") === 1).cast("int"))
      .orderBy("doc_id")
  }

  /** Language-ID by marker-stopword voting, fixed preference order on
    * ties (deterministic — SURVEY §7).
    */
  def langId(spark: SparkSession, dir: String): DataFrame = {
    val t = TextFns.tokens(col("text"))
    val scores = markers.map { case (l, ws) => l -> countIn(t, ws) }
    // argmax with fixed order: first language whose score >= all others
    val pred = scores.foldRight(lit("und"): Column) { case ((l, s), rest) =>
      when(scores.map(_._2).map(o => s >= o).reduce(_ && _), lit(l)).otherwise(rest)
    }
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"), pred.as("pred_lang"))
      .orderBy("doc_id")
  }

  /** Document fingerprints: md5 of normalized text + min-shingle hash
    * (a 1-permutation minhash), portable across engines.
    */
  def docFingerprint(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val base = docs.select(col("doc_id"),
      md5(TextFns.normalized(col("text"))).as("fingerprint"))
    // explode + min aggregate instead of building the md5 array per row:
    // partial-combines map-side and skips the nested array materialization
    val minsh = docs
      .select(col("doc_id"), TextFns.tokens(col("text")).as("t"))
      .select(col("doc_id"), explode(TextFns.shingles3(col("t"))).as("s"))
      .groupBy("doc_id").agg(min(md5(col("s"))).as("min_shingle_md5"))
    base.join(minsh, Seq("doc_id"), "left").orderBy("doc_id")
  }

  /** Corpus-level term stats: global top-25 terms (TakeOrdered — no full
    * sort at scale).
    */
  def topTerms(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(explode(TextFns.tokens(col("text"))).as("term"))
      .groupBy("term")
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("term").asc)
      .limit(25)

  /** Count-min sketch over corpus term frequencies — the fixed-memory
    * frequency structure for a corpus too large to hold exact counts
    * (d=4 hash rows × w=1024 counters ≈ 32 KB regardless of corpus
    * size). Unlike order-dependent sketches (Misra-Gries), CMS is a pure
    * sum per (row, bucket) — commutative, so the distributed aggregate
    * is deterministic and oracle-checkable. The query reports the exact
    * top-25 terms beside their CMS estimate (estimate ≥ truth always;
    * overestimate = hash-collision mass, bounded by 2N/w per row w.h.p.).
    *
    * Scale: the counter build is one map-side-combined aggregate whose
    * output is ≤ d·w rows no matter the corpus; the estimate join
    * broadcasts the 25 probe terms. The exact side exists only to
    * verify the sketch on the fixture — at 100 TB you'd keep the
    * sketch and drop the exact pass.
    */
  def cmsTopTerms(spark: SparkSession, dir: String): DataFrame = {
    val d = 4
    val w = 1024
    val toks = Tables.documents(spark, dir)
      .select(explode(TextFns.tokens(col("text"))).as("term"))
    def bucket(row: Int, term: Column): Column =
      TextFns.md5Int(concat(lit(s"cms$row|"), term)) % w
    val counters = toks
      .select(explode(array((0 until d).map(r =>
        struct(lit(r).as("r"), bucket(r, col("term")).as("b"))): _*)).as("rb"))
      .groupBy(col("rb.r").as("r"), col("rb.b").as("b"))
      .agg(count(lit(1)).as("c"))
    val top = toks.groupBy("term").agg(count(lit(1)).as("n_exact"))
      .orderBy(col("n_exact").desc, col("term").asc).limit(25)
    val probes = top.select(col("term"), col("n_exact"),
      explode(array((0 until d).map(r =>
        struct(lit(r).as("r"), bucket(r, col("term")).as("b"))): _*)).as("rb"))
      .select(col("term"), col("n_exact"), col("rb.r").as("r"), col("rb.b").as("b"))
    counters.join(broadcast(probes), Seq("r", "b"))
      .groupBy(col("term"), col("n_exact"))
      .agg(min(col("c")).as("n_cms"))
      .orderBy(col("n_exact").desc, col("term").asc)
  }

  /** Hashing-TF embedder output (reference E1 restated as a deterministic
    * seeded hashing embedder — SURVEY §2.3): token → md5 bucket (mod 64),
    * per-doc L2-normalized weights. Emitted as (doc_id, bucket, w) rows
    * so the oracle stays pure SQL.
    */
  def embedHash(spark: SparkSession, dir: String): DataFrame = {
    val dim = 64
    val tf = Tables.documents(spark, dir)
      .select(col("doc_id"), explode(TextFns.tokens(col("text"))).as("tok"))
      .groupBy(col("doc_id"), (TextFns.md5Int(col("tok")) % dim).as("bucket"))
      .agg(count(lit(1)).cast("double").as("cnt"))
    val norm = tf.groupBy("doc_id")
      .agg(sqrt(sum(col("cnt") * col("cnt"))).as("nrm"))
    tf.join(norm, "doc_id")
      .select(col("doc_id"), col("bucket"), (col("cnt") / col("nrm")).as("w"))
      .orderBy("doc_id", "bucket")
  }

  /** TF-IDF top-3 terms for the first 50 documents. Shape notes for
    * scale: term TF filters to the target docs BEFORE scoring (the DF
    * table must see the whole corpus, the TF side need not); DF
    * partial-combines map-side; the per-doc rank runs over ≤ |vocab ∩
    * doc| rows. ln() may differ from DuckDB by 1 ulp — round(·,4)
    * absorbs it.
    */
  def tfidfTop(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val toks = docs
      .select(col("doc_id"), explode(TextFns.tokens(col("text"))).as("term"))
    val tf = toks.groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    val dfTab = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("n"))
    val scored = tf.filter(col("doc_id") < 50)
      .join(dfTab, "term")
      .crossJoin(broadcast(n))
      .select(col("doc_id"), col("term"),
        (col("tf") * log(col("n").cast("double") / col("df"))).as("score"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("doc_id"))
      .orderBy(col("score").desc, col("term").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 3)
      .select(col("doc_id"), col("rank"), col("term"), round(col("score"), 4).as("score"))
      .orderBy("doc_id", "rank")
  }

  /** Training-corpus curation filter — the flagship data-pipeline
    * composition: length bounds, stopword density, digit density,
    * language agreement, and exact-dup removal in ONE pass. Every
    * signal is a narrow expression except the dup window and the
    * (map-side-combined) fingerprint min — two cheap exchanges
    * regardless of corpus size.
    */
  def corpusFilter(spark: SparkSession, dir: String): DataFrame = {
    val t = TextFns.tokens(col("text"))
    val nWords = size(t).cast("double")
    val nChars = length(col("text")).cast("double")
    val nStop = countIn(t, stopEn).cast("double")
    val nDigit = (nChars - length(regexp_replace(col("text"), "[0-9]", ""))).cast("double")
    val scores = markers.map { case (l, ws) => l -> countIn(t, ws) }
    val pred = scores.foldRight(lit("und"): Column) { case ((l, s), rest) =>
      when(scores.map(_._2).map(o => s >= o).reduce(_ && _), lit(l)).otherwise(rest)
    }
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(md5(TextFns.normalized(col("text"))))
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"), col("text"))
      .withColumn("len_ok", (nWords >= 20 && nWords <= 1000).cast("int"))
      // empty-text semantics pinned explicitly: Spark's non-ANSI 0/0 is
      // NULL while DuckDB's float division is NaN — neither may leak
      // into an int flag. Empty → no stopwords (0), no digits (1).
      .withColumn("stop_ok",
        when(nWords === 0, lit(0)).otherwise((nStop / nWords >= 0.03).cast("int")))
      .withColumn("digit_ok",
        when(nChars === 0, lit(1)).otherwise((nDigit / nChars <= 0.3).cast("int")))
      .withColumn("lang_ok", (pred === col("lang")).cast("int"))
      .withColumn("uniq", (col("doc_id") === min(col("doc_id")).over(w)).cast("int"))
      .withColumn("kept",
        (col("len_ok") === 1 && col("stop_ok") === 1 && col("digit_ok") === 1 &&
          col("lang_ok") === 1 && col("uniq") === 1).cast("int"))
      .select(col("doc_id"), col("len_ok"), col("stop_ok"), col("digit_ok"),
        col("lang_ok"), col("uniq"), col("kept"))
      .orderBy("doc_id")
  }

  /** Deterministic hash-stratified sampling — the reproducible
    * train/eval-split primitive: a document's fate depends only on its
    * id (md5 bucket 0-99), never on partitioning, ordering, or RNG
    * state, so the same corpus always yields the same sample on any
    * cluster. Keeps ~20% per language stratum.
    */
  def sampleStratified(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"),
        (TextFns.md5Int(concat(lit("smp|"), col("doc_id"))) % 100).as("bucket"))
      .filter(col("bucket") < 20)
      .orderBy("doc_id")

  /** Deterministic train/val/test split assignment (80/10/10): a
    * document's split is a pure function of its id — the same md5-gate
    * family as [[sampleStratified]], so assignment reproduces on any
    * cluster and disjointness + full coverage are structural (every
    * bucket maps to exactly one split). Emits the per-(split, lang)
    * audit report a pipeline records alongside the materialized splits.
    * Scale: one narrow map + one map-side-combined groupBy; nothing
    * grows with the corpus but the 15-row report.
    */
  def splitAssign(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .withColumn("bucket",
        TextFns.md5Int(concat(lit("split|"), col("doc_id"))) % 100)
      .withColumn("split",
        when(col("bucket") < 80, "train")
          .when(col("bucket") < 90, "val")
          .otherwise("test"))
      .groupBy(col("split"), col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).cast("long").as("sum_chars"))
      .orderBy("split", "lang")

  /** Temperature-reweighted corpus mixing (α = 0.5): per-language keep
    * fractions ∝ n_l^α (upsampling low-resource strata relative to
    * their natural share — the standard LLM mixture step), applied as a
    * deterministic md5-bucket filter so the same corpus always yields
    * the same mixture on any cluster. Target size = 20% of the corpus.
    *
    * Scale: one 5-row map-side-combined count, a 1-row total, broadcast
    * back onto a narrow per-doc filter — nothing grows with the corpus.
    * FP discipline: the normalizer Σ√n_l sums value-sorted doubles
    * left-to-right (aggregation order is otherwise nondeterministic),
    * sqrt/× are single correctly-rounded IEEE ops, and the bucket cut
    * goes through floor(x+0.5) — bit-identical in DuckDB.
    */
  def sampleMixture(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val counts = docs.groupBy(col("lang")).agg(count(lit(1)).as("n"))
    val tot = counts.agg(
      sum(col("n")).as("n_total"),
      expr("aggregate(array_sort(collect_list(sqrt(cast(n AS double)))), 0D, (a, x) -> a + x)")
        .as("z"))
    val scored = counts.crossJoin(broadcast(tot))
      .withColumn("share", sqrt(col("n").cast("double")) / col("z"))
      .withColumn("keep_frac",
        least(lit(1.0), (floor(col("n_total") * 0.2) * col("share")) / col("n")))
      .withColumn("cut", floor(col("keep_frac") * 1000000 + 0.5).cast("long"))
    docs
      .join(broadcast(scored.select(col("lang"), col("cut"), col("keep_frac"))), "lang")
      .filter(TextFns.md5Int(concat(lit("mix|"), col("doc_id"))) % 1000000 < col("cut"))
      .select(col("doc_id"), col("lang"),
        (floor(col("keep_frac") * 10000 + 0.5) / 10000).as("keep_frac"))
      .orderBy("doc_id")
  }

  /** Bigram language-model quality score (perplexity proxy): corpus
    * bigram counts with add-one smoothing, per-document mean log
    * probability. Context counts derive from the bigram table itself
    * (c1 = Σ_w2 c12), so one aggregation feeds both sides. Scale: the
    * count tables shuffle on their natural keys and partial-combine;
    * the per-doc score join is an equi-join on (w1, w2).
    */
  def bigramLm(spark: SparkSession, dir: String): DataFrame =
    lmScores(spark, dir).orderBy("doc_id")

  /** Unordered per-document LM score frame (doc_id, n_bigrams, avg_logp)
    * backing [[bigramLm]] and [[pplBucket]] — factored so the bucket
    * query does not inherit a sort it immediately re-shuffles away.
    */
  private def lmScores(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val bi = docs
      .select(col("doc_id"), TextFns.tokens(col("text")).as("t"))
      .select(col("doc_id"), explode(expr(
        """CASE WHEN size(t) >= 2
           |  THEN transform(sequence(1, size(t) - 1),
           |         i -> struct(element_at(t, i) AS w1, element_at(t, i + 1) AS w2))
           |  ELSE array() END""".stripMargin))
        .as("b"))
      .select(col("doc_id"), col("b.w1").as("w1"), col("b.w2").as("w2"))
    // c1 = Σ_w2 c12 as a window sum over the bigram-count table already
    // in flight (exact long arithmetic): one broadcast join carries both
    // counts, instead of a second aggregate + join that would rebuild
    // the bigram explode chain per consumer
    val c12 = bi.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c12"))
      .withColumn("c1", sum(col("c12")).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("w1"))))
    val v = docs
      .select(explode(TextFns.tokens(col("text"))).as("tok"))
      .agg(countDistinct(col("tok")).as("v"))
    bi.join(c12, Seq("w1", "w2"))
      .crossJoin(broadcast(v))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        round(avg(log((col("c12") + 1).cast("double") / (col("c1") + col("v")))), 4)
          .as("avg_logp"))
  }

  /** CCNet-style perplexity bucketing (Wenzek et al. 2020): documents
    * split into head/middle/tail terciles of the corpus's own
    * [[bigramLm]] score distribution — the quality-stratification step a
    * curation pipeline runs before choosing how much of each band to
    * keep. Higher avg_logp = lower perplexity = "head".
    *
    * Scale shape: the tercile cuts are NOT a global sort of the corpus —
    * per-doc scores aggregate onto their (4-decimal-snapped) score
    * VALUE, a running count over the distinct-score frame finds where
    * the floor(n/3) / floor(2n/3) rank boundaries fall, and the
    * value→bucket map joins back onto the score frame. The only
    * unpartitioned window runs over distinct snapped scores (grid-
    * bounded: the 1e-4 grid over the observed logp span, ~10³–10⁴ rows
    * regardless of corpus size), never over documents. A score value
    * straddling a rank boundary takes the bucket where its cumulative
    * count ENDS — deterministic: both engines evaluate the SAME
    * floor(n/3.0) / floor(n*2/3.0) double-then-floor expression, so the
    * boundary cannot diverge between them (double division is exact to
    * the last bit well past any realistic n; exactness would erode only
    * beyond 2^53 documents).
    */
  def pplBucket(spark: SparkSession, dir: String): DataFrame = {
    // scored feeds three branches but is deliberately NOT cached — the
    // sample_quality precedent: AQE's ReusedExchange dedups the LM
    // chain's exchanges within the one plan, and materializing the
    // InMemoryRelation measured net-slower than the reuse (r21 re-check
    // agreed)
    val scored = lmScores(spark, dir)
    val byScore = scored.groupBy(col("avg_logp"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("cum", sum(col("cnt")).over(
        org.apache.spark.sql.expressions.Window.orderBy(col("avg_logp").desc)))
    val tot = scored.agg(count(lit(1)).as("n"))
    val buckets = byScore.crossJoin(broadcast(tot))
      .select(col("avg_logp"),
        when(col("cum") <= floor(col("n") / 3.0), "head")
          .when(col("cum") <= floor(col("n") * 2 / 3.0), "middle")
          .otherwise("tail").as("bucket"))
    scored.join(buckets, Seq("avg_logp"))
      .select(col("doc_id"), col("avg_logp"), col("bucket"))
      .orderBy("doc_id")
  }

  /** Per-document n-gram novelty — the memorization/contamination
    * metric: the fraction of a document's distinct 3-token shingles
    * that occur in NO other document. Low novelty = the document is
    * assembled from corpus-common phrasing (template/boilerplate);
    * novelty 1.0 = entirely original n-grams. The per-doc companion to
    * the pairwise [[graft.queries.DedupQueries]] detectors: same
    * shingle space, but a profile score instead of a pair join.
    *
    * Scale shape (round-21 rewrite — this was the slowest clean-bench
    * query at 2.4 s): (doc, shingle) duplicates only arise WITHIN a
    * document, so `array_distinct` inside the shingle lambda replaces
    * the corpus-wide `.distinct()` exchange row-locally (the
    * [[boilerplateFrac]] shape), and a df=1 row's OWNER is the row's
    * own doc_id — so one window count over the shingle key carries df
    * to every row and the per-doc aggregate reads both n_shingles
    * (count) and n_novel (sum of df=1) in a single pass. Corpus-scale
    * exchanges: ONE (the shingle-keyed window); the old form paid a
    * corpus distinct + a second shingle aggregate + a join. Tokens are
    * bound to a column BEFORE the shingle lambda (the
    * [[graft.dedup.Dedup.shingleSet]] rule: splicing `split()` into the
    * higher-order function re-runs the regex split per element —
    * O(tokens²) per document, measured 5× slower at sf0.1). Nothing is
    * pairwise; documents with fewer than 3 tokens have no shingles and
    * are absent by construction.
    */
  def ngramNovelty(spark: SparkSession, dir: String): DataFrame =
    ngramNoveltyOf(Tables.documents(spark, dir))

  /** [[ngramNovelty]] over an explicit (doc_id, text) frame — spec entry
    * point for hand-computable corpora.
    */
  private[graft] def ngramNoveltyOf(docs: DataFrame): DataFrame = {
    val sh = docs
      .select(col("doc_id"), TextFns.tokens(col("text")).as("t"))
      .select(col("doc_id"),
        explode(array_distinct(TextFns.shingles3(col("t")))).as("sh"))
    sh.withColumn("df", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("sh"))))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shingles"),
        sum(when(col("df") === 1, 1L).otherwise(0L)).as("n_novel"))
      .withColumn("novelty",
        round(col("n_novel").cast("double") / col("n_shingles"), 4))
      .orderBy("doc_id")
  }

  /** Robust winnowing fingerprints (Schleimer, Wilkerson, Aiken 2003 —
    * the MOSS algorithm): hash every 3-token shingle, slide a window of
    * w = 4 consecutive hashes, keep the minimum of each window. The
    * guarantee: any shared run of ≥ w + 2 tokens between two documents
    * yields at least one shared fingerprint, while only ~2/(w+1) of all
    * hashes are kept — the density/guarantee trade the paper proves
    * optimal. Documents shorter than one full window contribute the
    * minimum of all their hashes (so every ≥3-token document has ≥1
    * fingerprint). Emits distinct (doc_id, fingerprint) pairs — the
    * posting-list input a winnowing-based near-dup or provenance join
    * consumes.
    *
    * Scale shape: a typed per-document flatMap (hash each 3-shingle,
    * linear monotonic-deque windowed minimum, per-doc HashSet dedup —
    * O(tokens) per document), so there is no shuffle at all except the
    * output sort. Output is ~2/(w+1) × shingle count, distinct per doc.
    */
  def winnowFingerprint(spark: SparkSession, dir: String): DataFrame =
    winnowFingerprintOf(Tables.documents(spark, dir))

  /** [[winnowFingerprint]] over an explicit (doc_id, text) frame — spec
    * entry point for hand-computable corpora.
    */
  private[graft] def winnowFingerprintOf(docs: DataFrame): DataFrame =
    winnowFps(docs).orderBy("doc_id", "fp")

  /** Unordered (doc_id, fp) winnowing postings — consumed by
    * [[DedupQueries.dedupWinnow]], which re-shuffles on fp and must not
    * inherit the report sort.
    */
  private[graft] def winnowFps(docs: DataFrame): DataFrame =
    winnowFpsPos(docs).select(col("doc_id"), col("fp"))

  /** Winnowing postings WITH positions: (doc_id, fp, pos), where pos is
    * the FIRST shingle index (0-based) at which the selected
    * fingerprint's hash occurs in the document — the deterministic
    * position convention the span report ([[DedupQueries.winnowSpans]])
    * aggregates into matched-region bounds, and one a SQL oracle
    * replays exactly (`list_position(h, fp) - 1`). The MOSS report
    * needs positions, not just counts: "these two documents share a
    * run" is only actionable with WHERE.
    */
  private[graft] def winnowFpsPos(docs: DataFrame): DataFrame = {
    // Typed per-document flatMap (the chunker shape — SURVEY §2.2): the
    // previous all-Catalyst formulation chained `withColumn` aliases
    // over NESTED higher-order functions, and alias inlining during
    // optimization multiplied the expression tree ~5×-per-level into a
    // plan the optimizer/codegen walked for ~7 MINUTES of
    // single-threaded driver time — machine-size-independent, so no
    // cluster absorbs it. The sequential fold below is O(tokens) per
    // document (monotonic-deque windowed minimum), hashes with
    // [[TextFns.md5IntJvm]] (bit-identical to the `md5Int` expression
    // and the DuckDB oracle), dedups per document before emitting, and
    // still carries NO shuffle — the plan is scan → flatMap.
    val spark = docs.sparkSession
    import spark.implicits._
    val w = 4
    docs.select(col("doc_id").cast("long"), col("text"))
      .as[(Long, String)]
      .flatMap { case (docId, text) =>
        if (text == null) Iterator.empty
        else {
          // TextFns.tokensJvm, NOT String.trim.split: Catalyst/DuckDB
          // trim spaces only and keep boundary empty tokens, so any
          // text with leading/trailing tabs/newlines would otherwise
          // shingle differently here than in the oracle (ADVICE r14)
          val toks = TextFns.tokensJvm(text)
          val n = toks.length - 2 // 3-shingle count
          if (n < 1) Iterator.empty
          else {
            val h = new Array[Long](n)
            var i = 0
            while (i < n) {
              h(i) = TextFns.md5IntJvm(
                toks(i) + " " + toks(i + 1) + " " + toks(i + 2))
              i += 1
            }
            val out = scala.collection.mutable.HashSet.empty[Long]
            if (n < w) out += h.min
            else {
              val dq = new java.util.ArrayDeque[Int]
              var j = 0
              while (j < n) {
                while (!dq.isEmpty && h(dq.peekLast()) >= h(j)) dq.pollLast()
                dq.addLast(j)
                if (dq.peekFirst() <= j - w) dq.pollFirst()
                if (j >= w - 1) out += h(dq.peekFirst())
                j += 1
              }
            }
            // first-occurrence position of each selected fingerprint —
            // one O(tokens) scan, emitted beside the fp so the span
            // report can aggregate matched-region bounds
            val pos = new java.util.HashMap[Long, Int](out.size * 2)
            var jj = 0
            while (jj < n) {
              if (out.contains(h(jj))) pos.putIfAbsent(h(jj), jj)
              jj += 1
            }
            out.iterator.map(fp => (docId, fp, pos.get(fp)))
          }
        }
      }
      .toDF("doc_id", "fp", "pos")
  }

  /** TextRank keyword extraction (Mihalcea & Tarau 2004): tokens are
    * nodes, adjacent-co-occurrence edges (undirected, count-weighted),
    * five damped PageRank iterations, top-10 by final score — the
    * graph-centrality member of the text-analysis family beside the
    * frequency ([[topTerms]]) and tf-idf ([[tfidfTop]]) rankers.
    *
    * Scale shape: edge and degree tables aggregate map-side onto token
    * keys; each iteration is one equi-join (ranks onto edge sources) +
    * one aggregate onto destinations. Unlike the Lloyd/GD trainers,
    * whose models fit on the driver, PageRank's model IS |V|-sized —
    * the rank table stays distributed and only its token-keyed
    * shuffles move (5 chained, AQE-coalesced); nothing is collected.
    *
    * Float discipline: damping constants are the LITERALS 0.15/0.85 on
    * both engines (never 1−d — Spark's `1 - 0.85` and DuckDB's `0.15`
    * parse to different doubles); per-iteration scores snap to a 1e-8
    * grid (the roundMean convention at PR magnitude ~1/|V|, drift
    * headroom ~10⁷) so neighbor-sum accumulation order cannot
    * compound; ties in the final ranking break on token asc.
    */
  def textrankKeywords(spark: SparkSession, dir: String): DataFrame =
    textrankKeywordsOf(Tables.documents(spark, dir))

  /** [[textrankKeywords]] over an explicit (doc_id, text) frame — the
    * Soak/spec entry point.
    */
  private[graft] def textrankKeywordsOf(docs: DataFrame): DataFrame = {
    def snap8(c: Column): Column = floor(c * 1e8 + 0.5) / 1e8
    val bi = docs
      .select(col("doc_id"), TextFns.tokens(col("text")).as("t"))
      .select(explode(expr(
        """CASE WHEN size(t) >= 2
           |  THEN transform(sequence(1, size(t) - 1),
           |         i -> struct(element_at(t, i) AS w1, element_at(t, i + 1) AS w2))
           |  ELSE array() END""".stripMargin))
        .as("b"))
      .select(col("b.w1").as("w1"), col("b.w2").as("w2"))
      .filter(col("w1") =!= col("w2"))
    val edges = bi.select(col("w1").as("src"), col("w2").as("dst"))
      .unionAll(bi.select(col("w2").as("src"), col("w1").as("dst")))
      .groupBy(col("src"), col("dst")).agg(count(lit(1)).as("w"))
    val wdeg = edges.groupBy(col("src")).agg(sum(col("w")).as("wdeg"))
    // every iteration re-reads the graph — cache it once (plan-keyed,
    // the verifiedNearDupPairs lifecycle: caller clears via
    // spark.catalog.clearCache()) so the tokenize→explode→aggregate
    // chain doesn't replay five times in the final DAG. PRE-PARTITION
    // both cached frames on their iteration join keys (round-15): the
    // cached InMemoryRelation advertises its hashpartitioning, so each
    // iteration's rank join reuses it and the only per-iteration
    // exchange left is the contribution aggregate onto dst — the one
    // movement PageRank inherently needs (rank mass crossing edges).
    // Un-partitioned, every iteration re-shuffled the |E| edge table
    // AND the |V| node table: 3 exchanges per iteration instead of 1.
    val ew = edges.join(wdeg, "src").repartition(col("src")).cache()
    val nodes = wdeg.select(col("src").as("token"))
      .repartition(col("token")).cache()
    val nDf = nodes.agg(count(lit(1)).as("nn"))
    var pr = nodes.crossJoin(broadcast(nDf))
      .select(col("token"), snap8(lit(1.0) / col("nn")).as("pr"))
    // r21 note: an iteration-barrier variant (localCheckpoint per round
    // + final parquet artifact, the NnGraph build discipline) measured
    // NEUTRAL here — 2.11 vs 2.09 s at sf0.001 — because the cost is
    // the 5 inherently sequential shuffle stages (rank mass crossing
    // edges), not plan size: the barrier jobs repay exactly what the
    // smaller plans save. Kept lazy — simpler, zero extra jobs.
    for (_ <- 1 to 5) {
      val contrib = ew.join(pr, ew("src") === pr("token"))
        .select(col("dst").as("token"),
          (col("w").cast("double") / col("wdeg") * col("pr")).as("c"))
        .groupBy(col("token")).agg(sum(col("c")).as("s"))
      // symmetric edges make every node a dst, so the left join never
      // nulls on this graph — the coalesce is the formula's general
      // form (isolated nodes keep the (1-d)/N floor), mirrored in SQL
      pr = nodes.crossJoin(broadcast(nDf))
        .join(contrib, Seq("token"), "left")
        .select(col("token"),
          snap8(lit(0.15) / col("nn") +
            lit(0.85) * coalesce(col("s"), lit(0.0))).as("pr"))
    }
    // top-10 via TakeOrderedAndProject FIRST (no global sort/window at
    // |V| scale); the row_number window then ranks only 10 rows
    pr.orderBy(col("pr").desc, col("token").asc).limit(10)
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("pr").desc, col("token").asc)).cast("int"))
      .select(col("rank"), col("token"), col("pr").as("score"))
      .orderBy("rank")
  }

  /** PMI collocation extraction: adjacent bigrams scored by pointwise
    * mutual information ln(c12·N / (c1·c2)) over the pair
    * distribution's own marginals, min support 5, top-15 — the phrase
    * mining step a tokenizer/vocab pipeline runs before merging
    * multiword units. The marginals ride the bigram-count table as two
    * window sums (bigramLm's c1 pattern — no rebuild per marginal);
    * all four counts cast to double BEFORE multiplying so the ratio
    * cannot overflow long at corpus scale. One scan, two narrow
    * windows, TakeOrderedAndProject.
    */
  def pmiBigrams(spark: SparkSession, dir: String): DataFrame = {
    val w1w = org.apache.spark.sql.expressions.Window.partitionBy(col("w1"))
    val w2w = org.apache.spark.sql.expressions.Window.partitionBy(col("w2"))
    val bi = Tables.documents(spark, dir)
      .select(TextFns.tokens(col("text")).as("t"))
      .select(explode(expr(
        """CASE WHEN size(t) >= 2
           |  THEN transform(sequence(1, size(t) - 1),
           |         i -> struct(element_at(t, i) AS w1, element_at(t, i + 1) AS w2))
           |  ELSE array() END""".stripMargin))
        .as("b"))
      .select(col("b.w1").as("w1"), col("b.w2").as("w2"))
    val c12 = bi.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c12"))
      .withColumn("c1", sum(col("c12")).over(w1w))
      .withColumn("c2", sum(col("c12")).over(w2w))
    val nDf = bi.agg(count(lit(1)).as("nb"))
    c12.crossJoin(broadcast(nDf))
      .filter(col("c12") >= 5)
      .select(col("w1"), col("w2"), col("c12").as("pair_count"),
        round(log(col("c12").cast("double") * col("nb").cast("double") /
          (col("c1").cast("double") * col("c2").cast("double"))), 4).as("pmi"))
      .orderBy(col("pmi").desc, col("w1").asc, col("w2").asc)
      .limit(15)
  }

  /** df cap for [[vocabFuzzyPairs]]' 2-gram blocks. Frequent grams
    * ("er", "in", "th") put a large fraction of any natural-language
    * vocabulary into one block, so uncapped Σ block² approaches
    * |vocab|² — the same blowup `dedup_ngram_jaccard` guards with
    * `maxDf` and `dedup_embedding_lsh` with `maxBucket`. The fixture
    * vocabulary's largest block is 6 members at every scale factor, so
    * 64 never triggers there (the Dedup.DefaultMaxDf convention:
    * correctness specs see the uncapped behavior, scale gets the
    * guard); dropped blocks are counted on
    * [[vocabFuzzyDroppedBlocksAcc]]. A pair ALL of whose shared grams
    * are capped is lost — the audited trade, exactly
    * dedup_embedding_lsh's.
    */
  val VocabGramMaxDf = 64

  /** One dropped-block accumulator per session for the fuzzy-join cap —
    * the [[graft.queries.DedupQueries.droppedBucketsAcc]] telemetry
    * shape (weakly keyed; task retries can over-count; the RESULT is
    * exact either way).
    */
  private val fuzzyDropAccs =
    new java.util.WeakHashMap[SparkSession, org.apache.spark.util.LongAccumulator]
  def vocabFuzzyDroppedBlocksAcc(
      spark: SparkSession): org.apache.spark.util.LongAccumulator =
    fuzzyDropAccs.synchronized {
      var acc = fuzzyDropAccs.get(spark)
      if (acc == null) {
        acc = spark.sparkContext.longAccumulator("graft.fuzzy.dropped_blocks")
        fuzzyDropAccs.put(spark, acc)
      }
      acc
    }

  /** Fuzzy string join over the vocabulary — typo-tolerant matching
    * (query expansion, entity blocking): distinct token pairs within
    * Levenshtein distance 2, found WITHOUT the n² distance matrix.
    * The blocking key is the character 2-gram (padded with sentinels):
    * two strings within edit distance d share at least one 2-gram when
    * max(len)+1 > 2·d, so for d ≤ 2 every true pair of tokens longer
    * than 3 chars collides on some block — the LSH philosophy applied
    * to strings (q-gram filtering, Gravano et al. 2001). Two scale
    * guards on top of the blocking:
    *
    *   - blocks are df-capped at [[VocabGramMaxDf]] (audited on the
    *     dropped-block accumulator), bounding the candidate join at
    *     Σ min(block, cap)² instead of Σ block²;
    *   - Gravano COUNT FILTERING prunes candidates before the
    *     expensive `levenshtein`: one edit destroys at most q = 2
    *     grams, so a true d ≤ 2 pair shares ≥ max(|Ga|, |Gb|) − 4
    *     distinct grams. The cap keeps the lemma intact because it
    *     drops grams GLOBALLY (each capped set is Gx ∩ keep, so the
    *     capped a∖b difference is a subset of Ga∖Gb and the ≤ 2d
    *     bound transfers to the capped counts) — the filter
    *     never drops a true pair, spec-proved against brute force.
    *
    * Cost: the blocked join emits shared-gram counts (one row per
    * candidate, map-side combined), the count filter discards the
    * frequent-gram junk pairs, and `levenshtein` runs only on
    * survivors. Both engines implement unit-cost Levenshtein
    * identically, so distances hash-compare exactly. Short tokens
    * (< 4 chars) are excluded — below the q-gram guarantee, and
    * edit-distance-2 on them is meaningless for typo matching anyway.
    */
  def vocabFuzzyPairs(spark: SparkSession, dir: String): DataFrame = {
    val vocab = Tables.documents(spark, dir)
      .select(explode(TextFns.tokens(col("text"))).as("tok"))
      .filter(length(col("tok")) >= 4)
      .distinct()
    vocabFuzzyPairsOf(vocab, VocabGramMaxDf)
  }

  /** [[vocabFuzzyPairs]] over an explicit single-column vocabulary
    * frame with a configurable block cap — Soak/spec entry point (the
    * spec drives a cap of 1 to prove the drop audit fires; Soak grows
    * a synthetic vocabulary to measure sub-quadratic candidate
    * growth).
    */
  private[graft] def vocabFuzzyPairsOf(vocab: DataFrame,
      maxDf: Int): DataFrame = {
    val spark = vocab.sparkSession
    import spark.implicits._
    val acc = vocabFuzzyDroppedBlocksAcc(spark)
    val grams = vocab
      .select(col("tok"), concat(lit("\u0001"), col("tok"), lit("\u0002")).as("p"))
      .select(col("tok"), explode(expr(
        "transform(sequence(1, length(p) - 1), i -> substring(p, i, 2))")).as("g"))
      .distinct()
    // HOT-list of over-cap grams (the Dedup.pairJaccard shape): anti-
    // joining the frequent minority beats keep-listing the long-tail
    // majority at every alphabet size — |hot| ≤ |gram instances|/maxDf
    // by pigeonhole and is the Zipf head in practice, where a KEEP list
    // is alphabet²-sized (fine for Latin, 10⁸+ distinct grams on a CJK
    // corpus — the round-12 shape force-broadcast it). No explicit
    // broadcast hint anywhere in this query (PlanSpec pins that): the
    // planner auto-broadcasts the sliver-sized hot side and falls back
    // to a shuffle join if a pathological corpus ever inflates it. The
    // audit hook is the lshCandidates mapPartitions shape — one count
    // per dropped block.
    val hot = grams.groupBy(col("g")).agg(count(lit(1)).as("df"))
      .filter(col("df") > maxDf)
      .select(col("g")).as[String]
      .mapPartitions { it => it.map { g => acc.add(1L); g } }
      .toDF("g")
    // per-token capped gram count for the count filter, computed as a
    // window over the capped gram frame and CARRIED through the pair
    // groupBy (constant per token, so max() recovers it) — never a join
    // against a per-token aggregate. The round-12 shape broadcast that
    // aggregate explicitly, and one row per vocabulary token is
    // 10⁸–10⁹ rows on a web corpus (typos and junk ARE the vocabulary
    // this query exists for): a forced |vocab|-sized broadcast is a
    // driver OOM at exactly the scale the df cap guards.
    val capped = grams.join(hot, Seq("g"), "left_anti")
      .withColumn("ng", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("tok"))))
    capped.select(col("tok").as("a"), col("g"), col("ng").as("na"))
      .join(capped.select(col("tok").as("b"), col("g"), col("ng").as("nb")), "g")
      .filter(col("a") < col("b"))
      .groupBy(col("a"), col("b"))
      .agg(count(lit(1)).as("shared"), max(col("na")).as("na"),
        max(col("nb")).as("nb"))
      .filter(col("shared") >= greatest(col("na"), col("nb")) - lit(4))
      .withColumn("dist", levenshtein(col("a"), col("b")))
      .filter(col("dist") <= 2)
      .select(col("a"), col("b"), col("dist"))
      .orderBy("a", "b")
  }

  /** Heaps'-law vocabulary growth curve — the corpus profile a
    * tokenizer team reads before sizing a vocabulary: distinct-token
    * count as a function of corpus prefix size, over the deterministic
    * md5-bucket document ordering (the [[sampleStratified]] gate
    * family, so the "prefix" is reproducible on any cluster and nests:
    * prefix p% ⊂ prefix q% for p < q). One row per percentile with
    * cumulative token instances and cumulative vocabulary.
    *
    * Scale shape: a token's contribution to the curve is fully
    * described by TWO small aggregates — instances per bucket (≤100
    * keys) and each distinct token's FIRST bucket (vocab at p = tokens
    * whose min bucket < p, so the |vocab|-sized frame aggregates down
    * to ≤100 rows before any window). The running sums then ride a
    * ≤100-row frame — never a corpus-sized window, never a second scan
    * per threshold.
    */
  def vocabGrowth(spark: SparkSession, dir: String): DataFrame = {
    val tk = Tables.documents(spark, dir)
      .select((TextFns.md5Int(concat(lit("hl|"), col("doc_id"))) % 100)
          .cast("int").as("b"),
        explode(TextFns.tokens(col("text"))).as("tok"))
    val inst = tk.groupBy(col("b")).agg(count(lit(1)).as("n"))
    val vb = tk.groupBy(col("tok")).agg(min(col("b")).as("b"))
      .groupBy(col("b")).agg(count(lit(1)).as("v"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("b"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    inst.join(vb, Seq("b"), "full")
      .select(col("b"),
        coalesce(col("n"), lit(0L)).as("n"),
        coalesce(col("v"), lit(0L)).as("v"))
      .select((col("b") + 1).as("pct"),
        sum(col("n")).over(w).as("n_tokens"),
        sum(col("v")).over(w).as("vocab"))
      .orderBy("pct")
  }

  /** Ingest profile of the documents table — the per-shard
    * data-quality row a pipeline's contract gate inspects before
    * admitting a batch: row/id/blank counts, domain cardinalities,
    * extremes, and a CROSS-COLUMN contract (`n_chars` must equal
    * `length(text)` — both engines count code points). Pure counts and
    * min/max in one map-side-combined aggregate; the exact distincts
    * swap for the HLL sketch (`hll_distinct`) at 100 TB without
    * changing the contract shape.
    */
  def docsProfile(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir).agg(
      count(lit(1)).as("n_docs"),
      countDistinct(col("doc_id")).as("n_distinct_ids"),
      sum(when(col("text").isNull || length(trim(col("text"))) === 0, 1L)
        .otherwise(0L)).as("n_blank"),
      countDistinct(col("lang")).as("n_langs"),
      countDistinct(col("source")).as("n_sources"),
      min(col("n_chars")).as("min_chars"),
      max(col("n_chars")).as("max_chars"),
      sum(when(length(col("text")) =!= col("n_chars"), 1L).otherwise(0L))
        .as("n_chars_mismatch"))

  /** Zipf least-squares fit over the token frequency spectrum — the
    * corpus-health check a data pipeline runs per ingest batch (natural
    * text sits near slope −1 in log-rank/log-frequency; spam, template
    * boilerplate, and synthetic soup bend the line). Ranks by (freq
    * desc, token asc); the closed-form fit uses the five power sums,
    * computed once and combined with the identical expression tree on
    * both engines, outputs rounded to 4 decimals (the sums are
    * vocab-sized, so the accumulation-order drift is ~1e-14 against a
    * 1e-4 grid). Scale note: the ranking window is VOCAB-sized, not
    * corpus-sized — at a 100 M-type vocabulary the row_number becomes
    * a sort-based zipWithIndex, but the power-sum fit is unchanged.
    */
  def tokZipf(spark: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("c").desc, col("tok").asc)
    val pts = Tables.documents(spark, dir)
      .select(explode(TextFns.tokens(col("text"))).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("c"))
      .withColumn("r", row_number().over(w))
      .select(log(col("r").cast("double")).as("x"),
        log(col("c").cast("double")).as("y"))
    val sums = pts.agg(
      count(lit(1)).cast("double").as("n"),
      sum(col("x")).as("sx"), sum(col("y")).as("sy"),
      sum(col("x") * col("x")).as("sxx"), sum(col("x") * col("y")).as("sxy"))
    sums
      .select(col("n"), col("sx"), col("sy"),
        ((col("n") * col("sxy") - col("sx") * col("sy")) /
          (col("n") * col("sxx") - col("sx") * col("sx"))).as("slope"))
      .select(col("n").cast("long").as("n_types"),
        round(col("slope"), 4).as("slope"),
        round((col("sy") - col("slope") * col("sx")) / col("n"), 4).as("intercept"))
  }

  /** Per-language Jensen-Shannon divergence from the corpus unigram
    * distribution — the data-mixture monitor an LLM pipeline runs per
    * ingest slice (is this shard's vocabulary drifting from the blend?).
    * JSD(P‖Q) = ½KL(P‖M) + ½KL(Q‖M), M = (P+Q)/2, over the FULL
    * (lang × vocab) grid (a token absent from a language contributes
    * its ½q·ln(q/m) mass — dropping absent terms underestimates
    * divergence, so the grid is built explicitly: langs × vocab is
    * |L|·|V|, small because L is). Probabilities are one-division
    * exact ratios; the per-lang sum rounds to 4 decimals (the
    * bigram_lm accumulation contract).
    */
  def langJs(spark: SparkSession, dir: String): DataFrame = {
    val toks = Tables.documents(spark, dir)
      .select(col("lang"), explode(TextFns.tokens(col("text"))).as("tok"))
    val lt = toks.groupBy(col("lang"), col("tok")).agg(count(lit(1)).as("cl"))
    val langTot = toks.groupBy(col("lang")).agg(count(lit(1)).as("nl"))
    val tokTot = toks.groupBy(col("tok")).agg(count(lit(1)).as("ct"))
    val nDf = toks.agg(count(lit(1)).as("nt"))
    val grid = langTot.crossJoin(tokTot.crossJoin(broadcast(nDf)))
      .join(lt, Seq("lang", "tok"), "left")
      .select(col("lang"), col("nl"),
        (coalesce(col("cl"), lit(0L)).cast("double") / col("nl")).as("p"),
        (col("ct").cast("double") / col("nt")).as("q"))
      .withColumn("m", (col("p") + col("q")) / 2)
    grid
      .select(col("lang"), col("nl"),
        (when(col("p") > 0, lit(0.5) * col("p") * log(col("p") / col("m")))
          .otherwise(lit(0.0)) +
          lit(0.5) * col("q") * log(col("q") / col("m"))).as("term"))
      .groupBy(col("lang"), col("nl"))
      .agg(round(sum(col("term")), 4).as("js"))
      .select(col("lang"), col("nl").as("n_toks"), col("js"))
      .orderBy("lang")
  }

  /** Quality-gated sampling (the CCNet pattern): documents are bucketed
    * by their bigram-LM score against the corpus mean and sampled at
    * per-bucket rates (head = above-mean quality kept at 100%, tail at
    * 25%) through the same deterministic md5-bucket gate the other
    * samplers use. Determinism: the rounded LM scores are bit-identical
    * cross-engine (bigram_lm's contract), scaling by 10⁴ via
    * floor(x+0.5) makes them exact longs, and the mean is an exact
    * integer sum over n — so the bucket comparison is integer-vs-one-
    * division, never an ulp race. Scale: one 1-row broadcast; no global
    * sort (rank-based terciles would need one — mean-threshold
    * bucketing is the scale-safe CCNet variant).
    */
  def sampleQuality(spark: SparkSession, dir: String): DataFrame = {
    // scaled feeds the mean AND the gate; deliberately NOT cached —
    // both branches sit in one plan, so ReusedExchange already dedups
    // the LM chain (measured: caching is net-slower)
    val scaled = bigramLm(spark, dir)
      .select(col("doc_id"),
        floor(col("avg_logp") * 10000 + 0.5).cast("long").as("s"))
    val m = scaled.agg((sum(col("s")).cast("double") / count(lit(1))).as("mean_s"))
    scaled.crossJoin(broadcast(m))
      .withColumn("bucket",
        when(col("s") > col("mean_s"), lit("head")).otherwise(lit("tail")))
      .filter(TextFns.md5Int(concat(lit("ql|"), col("doc_id"))) % 100 <
        when(col("bucket") === "head", lit(100L)).otherwise(lit(25L)))
      .select(col("doc_id"), col("bucket"))
      .orderBy("doc_id")
  }

  /** Data selection via importance resampling (DSIR — Xie et al. 2023,
    * "Data Selection for Language Models via Importance Resampling"):
    * score every raw document by how target-like its hashed bag-of-words
    * is, where the target domain here is the English sub-corpus (the
    * paper's formulation with target = Wikipedia, raw = Common Crawl).
    * Features are md5-hashed unigram buckets (B=256); both distributions
    * get add-one smoothing over B; a document's weight is the mean
    * per-token log ratio ln p_target(b) − ln p_raw(b), and selection is
    * the positive-weight threshold (more target-like than the corpus).
    *
    * Scale shape: one narrow explode → two map-side-combined aggregates
    * onto ≤B keys → the ≤B-row λ table broadcasts back onto per-doc
    * bucket counts — no corpus-sized exchange beyond the (doc, bucket)
    * combine, and the λ join never shuffles the corpus. Both engines
    * compute the weighted form Σ c_b·λ_b / n over the same ≤B terms per
    * doc and round to 4 decimals before the threshold (bigram_lm's
    * cross-engine float contract); `selected` derives from the ROUNDED
    * score, so the hashed columns and the flag cannot disagree.
    */
  def dsirSelect(spark: SparkSession, dir: String): DataFrame =
    dsirScore(Tables.documents(spark, dir))

  /** [[dsirSelect]] over an explicit (doc_id, lang, text) frame — split
    * out so specs can drive constructed corpora (e.g. target == raw ⇒
    * every λ_b = 0 ⇒ no selection, a true invariant of the estimator).
    */
  private[graft] def dsirScore(docs: DataFrame): DataFrame = {
    val b = 256
    val bt = docs
      .select(col("doc_id"), col("lang"),
        explode(TextFns.tokens(col("text"))).as("tok"))
      .withColumn("b", TextFns.md5Int(concat(lit("dsir|"), col("tok"))) % b)
    val perDoc = bt.groupBy(col("doc_id"), col("b")).agg(count(lit(1)).as("c"))
    val tgt = bt.filter(col("lang") === "en")
      .groupBy(col("b")).agg(count(lit(1)).as("ct"))
    val raw = bt.groupBy(col("b")).agg(count(lit(1)).as("cr"))
    val tot = bt.agg(
      sum(when(col("lang") === "en", 1L).otherwise(0L)).as("nt"),
      count(lit(1)).as("nr"))
    val lam = raw.join(tgt, Seq("b"), "left").crossJoin(broadcast(tot))
      .select(col("b"),
        (log((coalesce(col("ct"), lit(0L)) + 1).cast("double") / (col("nt") + b)) -
          log((col("cr") + 1).cast("double") / (col("nr") + b))).as("lam"))
    perDoc.join(broadcast(lam), "b")
      .groupBy(col("doc_id"))
      .agg(sum(col("c")).as("n_toks"),
        round(sum(col("c") * col("lam")) / sum(col("c")), 4).as("dsir_logratio"))
      .withColumn("selected", col("dsir_logratio") > 0)
      .orderBy("doc_id")
  }

  /** Corpus-scale BPE tokenizer training (Sennrich et al. 2016,
    * "Neural Machine Translation of Rare Words with Subword Units") —
    * the map-reduce formulation: word counts once, then per iteration
    * (1) count adjacent symbol pairs weighted by word frequency — a
    * map-side-combined hash aggregate onto pair keys, (2) take the
    * argmax pair (count desc, then lexicographic — both engines compare
    * UTF-8 bytes, so the tie is pinned), (3) merge that pair in every
    * word with a narrow map. Five unrolled iterations; output is the
    * merge table (rank, left, right, pair_count) — all integers and
    * strings, no float anywhere.
    *
    * Symbol encoding: every symbol is wrapped \u0001s\u0002, so the
    * merge is a LITERAL string replace of \u0001l\u0002\u0001r\u0002 —
    * left-to-right non-overlapping in both Java `String.replace` and
    * DuckDB `replace`, which is exactly BPE's greedy scan ("aaa" +
    * (a,a) → "aa","a"), and a pattern can never match inside a longer
    * symbol because symbols contain no sentinels.
    *
    * Scale shape: the words frame (|vocab| rows, far smaller than the
    * corpus) stays distributed; each iteration's pair aggregate
    * combines map-side; the driver holds ONE winner row per iteration
    * (the codebook-staging pattern of [[graft.search.Ann]]). The
    * 5-iteration ladder is the loop a real 50k-merge training runs —
    * per-iteration cost is |vocab|-bounded, not corpus-bounded.
    */
  def bpeTrain(spark: SparkSession, dir: String): DataFrame =
    bpeMerges(Tables.documents(spark, dir), iters = 5)

  /** [[bpeTrain]] over an explicit documents frame — split out so specs
    * can drive the textbook corpus (Sennrich et al.'s low/lower/
    * newest/widest example) against the known merge sequence.
    */
  private[graft] def bpeMerges(docs: DataFrame, iters: Int): DataFrame = {
    val (merges, _, base) = bpeLoop(docs, iters)
    val spark = docs.sparkSession
    import spark.implicits._
    base.unpersist()
    merges.toDF("rank", "left", "right", "pair_count").orderBy("rank")
  }

  /** The shared merge-training loop: returns the merge table AND the
    * final vocab frame (word, sentinel-encoded symbols, count) — still
    * cached — so [[bpeTrain]] emits the merges and [[bpeEncode]] joins
    * the trained segmentation back onto documents.
    */
  private def bpeLoop(docs: DataFrame, iters: Int)
      : (Seq[(Int, String, String, Long)],
         org.apache.spark.sql.Dataset[(String, String, Long)],
         org.apache.spark.sql.Dataset[(String, String, Long)]) = {
    val spark = docs.sparkSession
    import spark.implicits._
    var words = docs
      .select(explode(TextFns.tokens(col("text"))).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy("word").agg(count(lit(1)).as("cnt"))
      .select(col("word"),
        regexp_replace(col("word"), "(.)", "\u0001$1\u0002").as("w"),
        col("cnt"))
      .as[(String, String, Long)]
      .cache()
    val base = words
    val merges = Seq.newBuilder[(Int, String, String, Long)]
    for (i <- 1 to iters) {
      val syms = split(expr("substring(w, 2, length(w) - 2)"), "\u0002\u0001")
      val best = words.toDF("word", "w", "cnt")
        .withColumn("syms", syms)
        .filter(size(col("syms")) >= 2)
        .select(col("cnt"), explode(transform(
          sequence(lit(1), size(col("syms")) - 1),
          j => struct(element_at(col("syms"), j).as("l"),
            element_at(col("syms"), j + 1).as("r")))).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("cnt")).as("c"))
        .orderBy(col("c").desc, col("l").asc, col("r").asc)
        .limit(1)
        .as[(String, String, Long)]
        .collect()
      if (best.isEmpty) return (merges.result(), words, base) // corpus fully merged
      val (l, r, c) = best(0)
      merges += ((i, l, r, c))
      val pat = "\u0001" + l + "\u0002\u0001" + r + "\u0002"
      val rep = "\u0001" + l + r + "\u0002"
      // lineage, not materialization: the replace map is narrow and
      // vocab-sized, so re-running i maps from the one cached word-count
      // frame is cheaper than a cache+count barrier per iteration
      // (measured: ~2.8 s -> ~2.1 s warm at sf0.1)
      words = words
        .map { case (word, w, cnt) => (word, w.replace(pat, rep), cnt) }
    }
    (merges.result(), words, base)
  }

  /** Apply the trained BPE segmentation back to the corpus — the
    * encode half of the tokenizer: per-document token counts under the
    * 5-merge vocabulary, beside the whitespace word count (their ratio
    * is the compression the merges bought). The merge chain runs on
    * the VOCAB frame (|vocab| rows), so encoding a document is a join
    * from its (doc, word) counts onto the segmented vocab — the
    * corpus-scale shape: train once on distinct words, encode by
    * lookup, never re-run merges per document.
    */
  def bpeEncode(spark: SparkSession, dir: String): DataFrame =
    bpeEncodedMemo(spark, dir)

  /** Memoized encoded frame per (session, dir) — bpeLoop's per-iteration
    * typed `map` closures make every fresh build a fresh non-canonical
    * plan, so the eager cache inside [[bpeEncodeDocs]] would register a
    * NEW entry per call (the library-leak class CacheLifecycleSpec
    * pins); both consumers (bpe_encode, pack_sequences_bpe) share this
    * one frame instead.
    */
  private val bpeEncMemo = new graft.FrameMemo[String]
  private def bpeEncodedMemo(spark: SparkSession, dir: String): DataFrame =
    bpeEncMemo.computeIfAbsent(spark, dir)(
      bpeEncodeDocs(Tables.documents(spark, dir), iters = 5))

  /** Tokenizer FERTILITY per ingest source — BPE tokens per whitespace
    * word, the tokenizer-health metric a curation pipeline reads per
    * feed: fertility near 1 means the trained merges compress the
    * feed's text well; a high-fertility source is writing in a
    * vocabulary the tokenizer never learned (foreign script, OCR
    * noise, base64 blobs) and inflates its real token budget. Rides
    * the memoized [[bpeEncode]] frame; one |docs|-grain join to the
    * (doc_id, source) projection and one map-side-combined aggregate
    * onto |sources| keys. Sums are exact longs; the single rounded
    * double ratio is the dup_rate discipline.
    */
  def bpeFertility(spark: SparkSession, dir: String): DataFrame =
    bpeEncodedMemo(spark, dir)
      .join(Tables.documents(spark, dir).select(col("doc_id"), col("source")),
        "doc_id")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_bpe_tokens")).as("n_bpe_tokens"),
        sum(col("n_words")).as("n_words"))
      .withColumn("fertility",
        when(col("n_words") > 0,
          round(col("n_bpe_tokens").cast("double") /
            col("n_words").cast("double"), 4))
          .otherwise(lit(0.0)))
      .orderBy("source")

  /** [[bpeEncode]] over an explicit documents frame (spec hook). */
  private[graft] def bpeEncodeDocs(docs: DataFrame, iters: Int): DataFrame = {
    val (_, fin, base) = bpeLoop(docs, iters)
    val vocabSyms = fin.toDF("word", "w", "cnt")
      .select(col("word"),
        size(split(expr("substring(w, 2, length(w) - 2)"), "\u0002\u0001"))
          .cast("long").as("ns"))
    val perDocWord = docs
      .select(col("doc_id"), explode(TextFns.tokens(col("text"))).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy(col("doc_id"), col("word")).agg(count(lit(1)).as("c"))
    val out = perDocWord.join(vocabSyms, "word")
      .groupBy(col("doc_id"))
      .agg(sum(col("c") * col("ns")).as("n_bpe_tokens"),
        sum(col("c")).as("n_words"))
      .orderBy("doc_id")
    // materialize before releasing the cached vocab base the plan reads
    out.cache().count()
    base.unpersist()
    out
  }

  /** Per-source PII rate report — the governance rollup a data owner
    * reads beside the per-doc [[piiRedact]] (which feed is leaking
    * emails/IPs/phones, and at what rate): per ingest source — docs,
    * docs containing ANY PII, per-category match totals, and the
    * affected fraction. Counts reuse [[graft.text.Redact]]'s exact
    * regexes (the ASCII-safe Java/RE2-agreeing subset), counted on
    * the RAW text per category (overlap masking is the rewrite's
    * concern, not the census's). One narrow scan + one aggregate onto
    * |sources| keys — the dup_rate_by_source shape for PII.
    */
  def piiBySource(spark: SparkSession, dir: String): DataFrame =
    piiBySourceOf(Tables.documents(spark, dir))

  /** [[piiBySource]] over an explicit (source, text) frame — the spec
    * entry point (the fixture corpus carries zero PII — a hash-checked
    * corpus fact; the census arithmetic is pinned on planted PII). */
  private[graft] def piiBySourceOf(docs: DataFrame): DataFrame = {
    import graft.text.Redact
    val d = docs
      .select(col("source"),
        Redact.nEmails(col("text")).cast("long").as("e"),
        Redact.nIpv4(col("text")).cast("long").as("i"),
        Redact.nPhones(col("text")).cast("long").as("p"))
    d.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("e") + col("i") + col("p") > 0, 1L).otherwise(0L))
          .as("n_docs_with_pii"),
        sum(col("e")).as("n_emails"),
        sum(col("i")).as("n_ipv4"),
        sum(col("p")).as("n_phones"))
      .withColumn("pii_rate",
        round(col("n_docs_with_pii").cast("double") / col("n_docs"), 4))
      .orderBy("source")
  }

  /** Text normalization for training corpora: lowercase, collapse
    * whitespace, mask digit runs as `<num>`. Patterns stay in the
    * ASCII-safe regex subset where Java regex and RE2 agree exactly.
    */
  def textNormalize(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        size(regexp_extract_all(col("text"), lit("[0-9]+"), lit(0))).as("n_num_runs"),
        md5(regexp_replace(
          regexp_replace(lower(trim(col("text"))), "[0-9]+", "<num>"),
          "\\s+", " ")).as("norm_md5"))
      .orderBy("doc_id")

  /** Training-sequence packing: documents are concatenated in
    * deterministic shard order and cut at fixed token boundaries
    * (GPT-style packing). Shards are hash buckets (doc_id % 32) — each
    * shard's running offset is an independent window, so packing is
    * data-parallel with NO global sort; a document's placement depends
    * only on its bucket's id-ordered prefix.
    */
  def packSequences(spark: SparkSession, dir: String): DataFrame = {
    val cap = 2048
    val nb = 32
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("bucket")).orderBy(col("doc_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    Tables.documents(spark, dir)
      .select(col("doc_id"), (col("doc_id") % nb).as("bucket"),
        TextFns.tokenCount(col("text")).cast("long").as("n_tokens"))
      .withColumn("start_offset", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .withColumn("seq_id",
        col("bucket") * lit(1000000L) + expr(s"start_offset div $cap"))
      .orderBy("doc_id")
  }

  /** Packing-efficiency audit over [[packSequences]] — the number a
    * training-infra owner reads before a run: per shard bucket, how
    * many documents and tokens were packed, how many fixed-size
    * sequences that yields (concat packing fills contiguously, so
    * n_seqs = ceil(tokens/cap) — all-integer), how many documents
    * STRADDLE a sequence boundary (the attention-mask / loss-masking
    * decision rides on this count), and the fill fraction of the
    * allocated capacity (the waste is each bucket's final partial
    * sequence). One map-side-combined aggregate over the packing frame
    * onto 32 bucket keys; the boundary test is integer division on
    * non-negative longs, identical in both engines.
    */
  def packStats(spark: SparkSession, dir: String): DataFrame = {
    val cap = 2048
    packSequences(spark, dir)
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("n_tokens"),
        sum(when(col("n_tokens") > 0 &&
            expr(s"start_offset div $cap") =!=
              expr(s"(start_offset + n_tokens - 1) div $cap"), 1L)
          .otherwise(0L)).as("n_split_docs"))
      .withColumn("n_seqs", expr(s"(n_tokens + ${cap - 1}) div $cap"))
      .withColumn("fill_frac",
        when(col("n_seqs") > 0,
          round(col("n_tokens").cast("double") / (col("n_seqs") * cap), 4))
          .otherwise(lit(0.0)))
      .orderBy("bucket")
  }

  /** Per-document unigram ENTROPY — the lexical-diversity signal
    * quality filters read beside length/stopword ratios (template spam
    * and keyword-stuffed SEO text sit at the low end; natural prose
    * near the top): H = ln n − (Σ c·ln c)/n over the doc's token
    * counts, plus evenness H/ln(distinct) (Pielou — 1.0 = uniform).
    * One (doc, token) count aggregate, then a per-doc fold; the
    * Σ c·ln c terms fold in SORTED order (the sample_mixture
    * accumulation contract) so the double sum is engine-identical;
    * outputs round r4 (the bigram_lm float contract). Scale: the count
    * aggregate is map-side combinable on (doc, token); per-doc state
    * is the doc's distinct-token list — document-bounded, never
    * corpus-bounded.
    */
  def tokEntropy(spark: SparkSession, dir: String): DataFrame =
    tokEntropyOf(Tables.documents(spark, dir))

  /** [[tokEntropy]] over an explicit (doc_id, text) frame — the spec
    * entry point (uniform doc ⇒ H = ln n, evenness 1; constant doc ⇒
    * both 0). */
  private[graft] def tokEntropyOf(docs: DataFrame): DataFrame = {
    val tc = docs
      .select(col("doc_id"), explode(TextFns.tokens(col("text"))).as("tok"))
      .groupBy(col("doc_id"), col("tok"))
      .agg(count(lit(1)).as("c"))
    tc.groupBy(col("doc_id"))
      .agg(sum(col("c")).as("n_tokens"),
        count(lit(1)).as("n_distinct"),
        expr("aggregate(array_sort(collect_list(CAST(c AS DOUBLE) * ln(c))), " +
          "0D, (a, x) -> a + x)").as("s"))
      .withColumn("hraw",
        log(col("n_tokens").cast("double")) - col("s") / col("n_tokens"))
      .select(col("doc_id"), col("n_tokens"), col("n_distinct"),
        round(col("hraw"), 4).as("entropy"),
        when(col("n_distinct") > 1,
          round(col("hraw") / log(col("n_distinct").cast("double")), 4))
          .otherwise(lit(0.0)).as("evenness"))
      .orderBy("doc_id")
  }

  /** NO-SPLIT sequence packing — the packer an SFT/eval pipeline runs
    * when documents must not straddle sequence boundaries (loss
    * masking across unrelated examples): next-fit per shard bucket —
    * docs in doc_id order, a doc joins the current bin iff it fits
    * (fill + tok ≤ 2048), else opens a new bin; an oversized doc gets
    * a bin of its own (from empty state the pure rule sends it to the
    * next bin — both engines replay the same fold, so the convention
    * is pinned, not debated). Complements [[packSequences]] (which
    * cuts documents) and [[packStats]] (which counts the straddles
    * this packer pays capacity to avoid). All-integer output.
    *
    * Scale shape: the fold is inherently sequential WITHIN a bucket
    * (bin state resets are not prefix-sum decomposable) but
    * independent ACROSS buckets — the shard-count knob is the
    * parallelism, exactly [[packSequences]]'s contract; per-task
    * state is one bucket's (id, tok) list. The oracle replays the
    * fold as a recursive CTE.
    */
  def packNosplit(spark: SparkSession, dir: String): DataFrame =
    packNosplitOf(Tables.documents(spark, dir))

  /** [[packNosplit]] over an explicit documents frame — the spec/soak
    * entry point. */
  private[graft] def packNosplitOf(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val cap = 2048L
    val nb = 32L
    docs
      .select(col("doc_id"), (col("doc_id") % nb).as("bucket"),
        TextFns.tokenCount(col("text")).cast("long").as("n_tokens"))
      .as[(Long, Long, Long)]
      .groupByKey(_._2)
      .flatMapGroups { (bucket, it) =>
        var bin = 0L
        var fill = 0L
        it.toArray.sortBy(_._1).iterator.map { case (doc, _, tok) =>
          if (fill + tok <= cap) fill += tok else { bin += 1L; fill = tok }
          (doc, bucket, tok, bin, fill)
        }
      }
      .toDF("doc_id", "bucket", "n_tokens", "bin", "fill_after")
      .orderBy("doc_id")
  }

  /** Sequence packing under the TRAINED tokenizer — [[packSequences]]
    * with real BPE token counts instead of the chars/4 heuristic: the
    * budget a training run actually packs against is post-tokenizer,
    * and the heuristic misallocates cut points whenever compression
    * varies across documents. Composition: the [[bpeEncode]] counts
    * (merge chain on the vocab frame, broadcast join back) feed the
    * same per-bucket running-offset window — still no global sort.
    */
  def packSequencesBpe(spark: SparkSession, dir: String): DataFrame = {
    val cap = 2048
    val nb = 32
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("bucket")).orderBy(col("doc_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    bpeEncodedMemo(spark, dir)
      .select(col("doc_id"), (col("doc_id") % nb).as("bucket"),
        col("n_bpe_tokens").as("n_tokens"))
      .withColumn("start_offset", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .withColumn("seq_id",
        col("bucket") * lit(1000000L) + expr(s"start_offset div $cap"))
      .orderBy("doc_id")
  }

  /** Repetition quality signals (the Gopher-rule family): duplicate-word
    * fraction and top-bigram fraction per document — the standard
    * template/boilerplate detectors a curation pipeline runs alongside
    * [[textQuality]]. Two explode+combine aggregations on natural keys;
    * no join grows beyond |docs| rows. round goes through
    * floor(x·10⁴+0.5) on both engines: the ratios are small-integer
    * rationals, so exact half-way ties (e.g. 7/32) are reachable and
    * engine round() tie rules differ.
    */
  def textRepetition(spark: SparkSession, dir: String): DataFrame = {
    def r4(c: Column): Column = floor(c * 10000 + 0.5) / 10000
    val docs = Tables.documents(spark, dir)
    val toks = docs.select(col("doc_id"), explode(TextFns.tokens(col("text"))).as("tok"))
    val wordStats = toks.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"), countDistinct(col("tok")).as("n_uniq"))
    val biStats = docs
      .select(col("doc_id"), TextFns.tokens(col("text")).as("t"))
      .select(col("doc_id"), explode(expr(
        """CASE WHEN size(t) >= 2
           |  THEN transform(sequence(1, size(t) - 1),
           |         i -> concat(element_at(t, i), ' ', element_at(t, i + 1)))
           |  ELSE array() END""".stripMargin))
        .as("b"))
      .groupBy(col("doc_id"), col("b")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id")).agg(sum(col("c")).as("n_bi"), max(col("c")).as("max_bi"))
    wordStats.join(biStats, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        r4(lit(1) - col("n_uniq").cast("double") / col("n_tokens")).as("dup_word_frac"),
        r4(coalesce(col("max_bi").cast("double") / col("n_bi"), lit(0.0)))
          .as("top_bigram_frac"))
      .orderBy("doc_id")
  }

  /** PII scrubbing ([[graft.text.Redact]]): redact emails, IPv4s and
    * phone-like digit runs, count each category. Counts are taken
    * stepwise on the progressively redacted text so they agree with the
    * masking order when categories overlap. The fixture corpus contains
    * no PII (all counts 0, md5 = md5(text)) — the behavior on text that
    * DOES contain PII is pinned by RedactSpec; this query pins the
    * operator's plan + oracle contract. Narrow per-row map, no shuffle.
    */
  def piiRedact(spark: SparkSession, dir: String): DataFrame = {
    import graft.text.Redact
    val t1 = regexp_replace(col("text"), Redact.EmailRe, "<email>")
    val t2 = regexp_replace(t1, Redact.Ipv4Re, "<ip>")
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        Redact.nEmails(col("text")).as("n_email"),
        Redact.nIpv4(t1).as("n_ip"),
        Redact.nPhones(t2).as("n_phone"),
        md5(Redact.redact(col("text"))).as("redacted_md5"))
      .orderBy("doc_id")
  }

  /** Cross-document boilerplate: the fraction of a document's DISTINCT
    * 3-token shingles that also occur in at least one other document —
    * the corpus-level repetition signal (C4/RefinedWeb line-dedup
    * analog at shingle granularity; [[textRepetition]] is the
    * within-document counterpart). Shingles travel as 8-byte md5Int
    * keys; the df table and the join both shuffle on that key with
    * map-side combines, so nothing is broadcast or quadratic at scale.
    * Documents with fewer than 3 tokens have no shingles and are absent
    * (same on both engines by construction).
    */
  def boilerplateFrac(spark: SparkSession, dir: String): DataFrame =
    boilerplateFracOf(Tables.documents(spark, dir))

  /** [[boilerplateFrac]] over any documents table (doc_id, text) — also
    * driven by the Soak scaling harness.
    */
  def boilerplateFracOf(docs: DataFrame): DataFrame = {
    def r4(c: Column): Column = floor(c * 10000 + 0.5) / 10000
    // tokens bound to a column BEFORE the shingle lambda (the
    // Dedup.shingleSet rule): spliced in, every element_at re-runs the
    // regex split — O(tokens²) per document, measured ~2× on this query
    val sh = docs
      .select(col("doc_id"), TextFns.tokens(col("text")).as("t"))
      .select(col("doc_id"),
        explode(array_distinct(TextFns.shingles3(col("t")))).as("s"))
      .select(col("doc_id"), TextFns.md5Int(col("s")).as("h"))
    // sh is distinct per (doc, shingle), so a window count per h =
    // #docs containing the shingle — one exchange on the hash key, no
    // second shingle build and no join back
    sh.withColumn("df", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("h"))))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shingles"),
        sum(when(col("df") >= 2, 1L).otherwise(0L)).as("n_shared"))
      .select(col("doc_id"), col("n_shingles"), col("n_shared"),
        r4(col("n_shared").cast("double") / col("n_shingles")).as("shared_frac"))
      .orderBy("doc_id")
  }

  /** Char-level substring duplication (the Lee-et-al "Deduplicating
    * Training Data" signal): the fraction of a document's sampled
    * 16-char grams that occur in at least one other document. Where
    * [[boilerplateFrac]] works on token shingles (set overlap),
    * char-grams catch PARTIAL span duplication — licence blurbs,
    * templated headers — that tokenized Jaccard dilutes. Full suffix
    * arrays don't distribute; the standard scalable stand-in is
    * position sampling: keep a gram iff md5Int(gram) % 8 == 0 (a
    * deterministic ~1/8 sample — any duplicated span ≥ ~2·8+16 chars is
    * expected to contribute a sampled gram on both sides). One narrow
    * explode+hash pass, a distinct and a window count on the 8-byte
    * key: scales with input chars, never pairs. Documents shorter than
    * 16 chars (or with no sampled gram) are absent on both engines.
    */
  def substringDedup(spark: SparkSession, dir: String): DataFrame =
    substringDedupOf(Tables.documents(spark, dir))

  def substringDedupOf(docs: DataFrame): DataFrame = {
    def r4(c: Column): Column = floor(c * 10000 + 0.5) / 10000
    val k = 16
    val grams = docs
      .select(col("doc_id"), explode(expr(
        s"""CASE WHEN length(text) >= $k
           |  THEN transform(sequence(1, length(text) - ${k - 1}),
           |         i -> substring(text, i, $k))
           |  ELSE array() END""".stripMargin)).as("g"))
      .select(col("doc_id"), TextFns.md5Int(col("g")).as("h"))
      .filter(col("h") % 8 === 0)
      .distinct()
    grams
      .withColumn("df", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("h"))))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("df") >= 2, 1L).otherwise(0L)).as("n_shared"))
      .select(col("doc_id"), col("n_grams"), col("n_shared"),
        r4(col("n_shared").cast("double") / col("n_grams")).as("shared_frac"))
      .orderBy("doc_id")
  }

  /** Span-level exact dedup REWRITE — the removal op behind the
    * [[boilerplateFrac]]/[[substringDedup]] meters (Lee et al. 2022,
    * "Deduplicating Training Data Makes Language Models Better",
    * ExactSubstr at token granularity; the C4 line-dedup analog for a
    * corpus without line structure): every occurrence of a duplicated
    * 3-token span EXCEPT the corpus-global first (deterministic
    * min(doc_id, pos)) has its token positions removed, and the
    * surviving tokens are reassembled in order. Output per document:
    * token total, removed count, and the cleaned text — all-integer
    * decisions, no float anywhere.
    *
    * Scale: spans travel as 8-byte md5Int keys; the first-occurrence /
    * occurrence-count aggregate map-side combines onto |distinct
    * spans| keys, the mark-back is a shuffle equi-join on the hash
    * (both sides |spans|-sized, never pairs), coverage dedups on
    * (doc, pos), and the kept-token anti join + ordered reassembly
    * shuffle on (doc, pos)/doc_id — every stage linear in corpus
    * tokens. collect_list is bounded per document, never per key.
    * Two corpus scans execute (the token explode and the span
    * explode — different projections, so the scans themselves don't
    * merge); the remaining duplicate subtrees collapse via AQE's
    * ReusedExchange (the q2/q11 pattern, 2 reuses in the executed
    * plan).
    */
  def spanDedupRewrite(spark: SparkSession, dir: String): DataFrame =
    spanDedupRewriteOf(Tables.documents(spark, dir))

  def spanDedupRewriteOf(docs: DataFrame): DataFrame = {
    val toks = docs.select(col("doc_id"),
      posexplode(TextFns.tokens(col("text"))).as(Seq("p", "tok")))
    // tokens bound before the shingle lambda (the Dedup.shingleSet rule)
    val sh = docs.select(col("doc_id").as("s_doc"), TextFns.tokens(col("text")).as("t"))
      .select(col("s_doc"),
        posexplode(TextFns.shingles3(col("t"))).as(Seq("q", "s")))
      .select(col("s_doc"), col("q"), TextFns.md5Int(col("s")).as("h"))
    val firstOcc = sh.groupBy(col("h"))
      .agg(min(struct(col("s_doc"), col("q"))).as("f"), count(lit(1)).as("occ"))
    val covered = sh.join(firstOcc, Seq("h"))
      .filter(col("occ") >= 2 &&
        !(col("s_doc") === col("f.s_doc") && col("q") === col("f.q")))
      .select(col("s_doc").as("doc_id"),
        explode(sequence(col("q"), col("q") + 2)).as("p"))
      .distinct()
    val rebuilt = toks.join(covered, Seq("doc_id", "p"), "left_anti")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_kept"),
        concat_ws(" ", transform(
          array_sort(collect_list(struct(col("p"), col("tok")))),
          x => x.getField("tok"))).as("clean_text"))
    docs.select(col("doc_id"),
        size(TextFns.tokens(col("text"))).cast("long").as("n_tokens"))
      .join(rebuilt, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        (col("n_tokens") - coalesce(col("n_kept"), lit(0L))).as("n_removed"),
        coalesce(col("clean_text"), lit("")).as("clean_text"))
      .orderBy("doc_id")
  }

  /** C0 sentence split as a standalone SQL operator: regex split with
    * lookbehind (Java regex supports it), trim, drop blanks, posexplode.
    * DuckDB's RE2 has no lookbehind, so the oracle emulates it with a
    * marker-substitution split — same output by construction.
    */
  def sentenceSplit(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        posexplode(filter(
          transform(split(col("text"), "(?<=[.!?])\\s+"), s => trim(s)),
          s => s =!= "")).as(Seq("sentence_index", "sentence")))
      .select(col("doc_id"), col("sentence_index"), md5(col("sentence")).as("sentence_md5"))
      .orderBy("doc_id", "sentence_index")

  /** MAP-typed column functions: parse `props` into MAP<STRING,INT>,
    * inspect keys/values (SURVEY §2.6 array/map functions).
    */
  def mapFuncs(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .withColumn("m", from_json(col("props"), org.apache.spark.sql.types.MapType(
        org.apache.spark.sql.types.StringType, org.apache.spark.sql.types.IntegerType)))
      .select(
        col("event_id"),
        size(col("m")).as("n_keys"),
        array_join(map_keys(col("m")), ",").as("keys"),
        element_at(col("m"), "k").as("k_value"))
      .orderBy("event_id")

  def defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sentence_split" -> (sentenceSplit _),
    "map_funcs" -> (mapFuncs _),
    "token_count" -> (tokenCount _),
    "text_quality" -> (textQuality _),
    "lang_id" -> (langId _),
    "doc_fingerprint" -> (docFingerprint _),
    "top_terms" -> (topTerms _),
    "embed_hash" -> (embedHash _),
    "tfidf_top" -> (tfidfTop _),
    "corpus_filter" -> (corpusFilter _),
    "sample_stratified" -> (sampleStratified _),
    "split_assign" -> (splitAssign _),
    "bigram_lm" -> (bigramLm _),
    "text_normalize" -> (textNormalize _),
    "pack_sequences" -> (packSequences _),
    "pack_stats" -> (packStats _),
    "pack_nosplit" -> (packNosplit _),
    "tok_entropy" -> (tokEntropy _),
    "text_repetition" -> (textRepetition _),
    "sample_mixture" -> (sampleMixture _),
    "pii_redact" -> (piiRedact _),
    "pii_by_source" -> (piiBySource _),
    "boilerplate_frac" -> (boilerplateFrac _),
    "substring_dedup" -> (substringDedup _),
    "span_dedup_rewrite" -> (spanDedupRewrite _),
    "gopher_rules" -> (gopherRules _),
    "cms_top_terms" -> (cmsTopTerms _),
    "sample_quality" -> (sampleQuality _),
    "dsir_select" -> (dsirSelect _),
    "bpe_train" -> (bpeTrain _),
    "bpe_encode" -> (bpeEncode _),
    "bpe_fertility" -> (bpeFertility _),
    "pack_sequences_bpe" -> (packSequencesBpe _),
    "textrank_keywords" -> (textrankKeywords _),
    "pmi_bigrams" -> (pmiBigrams _),
    "lang_js" -> (langJs _),
    "tok_zipf" -> (tokZipf _),
    "docs_profile" -> (docsProfile _),
    "vocab_fuzzy_pairs" -> (vocabFuzzyPairs _),
    "ppl_bucket" -> (pplBucket _),
    "ngram_novelty" -> (ngramNovelty _),
    "winnow_fingerprint" -> (winnowFingerprint _),
    "vocab_growth" -> (vocabGrowth _),
  )

  // ---- DuckDB oracles ------------------------------------------------

  private val duckToks = "regexp_split_to_array(trim(text), '\\s+')"

  /** The BPE training replay: word counts, the sentinel-encoded w0
    * frame (word carried through for the encode join), and five
    * unrolled merge iterations — adjacent-pair counts, the argmax pair
    * (count desc, byte-lexicographic tie), the literal sentinel-
    * delimited replace (see bpeTrain's scaladoc for why replace() IS
    * the greedy BPE scan on both engines). Ends at `w5` and `m1..m5`.
    */
  private lazy val duckBpeChain: String = {
    val iterBlocks = (1 to 5).map { i =>
      val prev = if (i == 1) "w0" else s"w${i - 1}"
      s"""p$i AS (
         |  SELECT syms[j] AS l, syms[j+1] AS r, CAST(sum(cnt) AS BIGINT) AS c
         |  FROM (SELECT string_split(substr(w, 2, length(w) - 2),
         |               chr(2)||chr(1)) AS syms, cnt FROM $prev),
         |       unnest(range(1, len(syms))) t(j)
         |  GROUP BY 1, 2),
         |m$i AS (SELECT l, r, c FROM p$i ORDER BY c DESC, l ASC, r ASC LIMIT 1),
         |w$i AS (
         |  SELECT x.* REPLACE (replace(x.w,
         |           chr(1)||m.l||chr(2)||chr(1)||m.r||chr(2),
         |           chr(1)||m.l||m.r||chr(2)) AS w)
         |  FROM $prev x CROSS JOIN m$i m)""".stripMargin
    }.mkString(",\n")
    s"""wc AS (
       |  SELECT word, count(*) AS cnt
       |  FROM (SELECT unnest(regexp_split_to_array(trim(text), '\\s+')) AS word
       |        FROM documents)
       |  WHERE length(word) > 0 GROUP BY 1),
       |w0 AS (
       |  SELECT word, regexp_replace(word, '(.)', chr(1)||'\\1'||chr(2), 'g') AS w,
       |         cnt
       |  FROM wc),
       |$iterBlocks""".stripMargin
  }

  private def duckCountIn(words: Seq[String]): String =
    s"len(list_filter($duckToks, w -> w IN (${words.map(w => s"'$w'").mkString(",")})))"

  // bigram-LM CTE chain ending in lmscore(doc_id, n_bigrams, avg_logp) —
  // shared by the bigram_lm and sample_quality oracles
  private lazy val duckLmScore =
    s"""bi AS (
       |  SELECT doc_id, t[i] AS w1, t[i + 1] AS w2
       |  FROM (SELECT doc_id, $duckToks AS t FROM documents),
       |       unnest(range(1, len(t))) u(i)),
       |c12 AS (SELECT w1, w2, count(*) AS c12 FROM bi GROUP BY 1, 2),
       |c1 AS (SELECT w1, sum(c12) AS c1 FROM c12 GROUP BY 1),
       |v AS (
       |  SELECT count(DISTINCT tok) AS v
       |  FROM (SELECT unnest($duckToks) AS tok FROM documents)),
       |lmscore AS (
       |  SELECT b.doc_id,
       |    count(*) AS n_bigrams,
       |    round(avg(ln(CAST(c12.c12 + 1 AS DOUBLE) / (c1.c1 + v.v))), 4) AS avg_logp
       |  FROM bi b
       |  JOIN c12 ON b.w1 = c12.w1 AND b.w2 = c12.w2
       |  JOIN c1 ON b.w1 = c1.w1
       |  CROSS JOIN v
       |  GROUP BY b.doc_id)""".stripMargin

  private val duckShingles =
    s"""CASE WHEN len($duckToks) >= 3
       |  THEN list_transform(range(1, len($duckToks) - 1),
       |         i -> $duckToks[i] || ' ' || $duckToks[i+1] || ' ' || $duckToks[i+2])
       |  ELSE [] END""".stripMargin

  def oracles: Map[String, String] = Map(
    "sentence_split" ->
      // lookbehind emulation: mark post-punctuation whitespace, split on
      // the marker; documents contain no \x01
      """WITH s AS (
        |  SELECT doc_id,
        |    list_filter(list_transform(
        |      regexp_split_to_array(
        |        regexp_replace(text, '([.!?])\s+', '\1' || chr(1), 'g'), chr(1)),
        |      x -> trim(x)), x -> x <> '') AS sents
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(unnest(generate_series(1, len(sents))) - 1 AS INTEGER) AS sentence_index,
        |  md5(unnest(sents)) AS sentence_md5
        |FROM s
        |ORDER BY doc_id, sentence_index""".stripMargin,
    "map_funcs" ->
      """SELECT event_id,
        |  CAST(1 AS INTEGER) AS n_keys,
        |  'k' AS keys,
        |  CAST(props->>'k' AS INTEGER) AS k_value
        |FROM events ORDER BY event_id""".stripMargin,
    "token_count" ->
      s"""SELECT doc_id,
         |  CASE WHEN length(trim(text)) = 0 THEN 0
         |       ELSE len($duckToks) + CAST(length(text) // 4 AS INTEGER) END AS n_tokens,
         |  len($duckToks) AS n_words,
         |  len(regexp_extract_all(text,
         |    '${BpeTokenRe.replace("'", "''")}')) AS n_bpe_pretokens,
         |  length(text) AS n_chars
         |FROM documents ORDER BY doc_id""".stripMargin,
    "text_quality" ->
      s"""SELECT doc_id,
         |  CAST(len($duckToks) AS BIGINT) AS n_words,
         |  round(CAST(length(regexp_replace(text, '\\s+', '', 'g')) AS DOUBLE) / len($duckToks), 4) AS avg_word_len,
         |  round(CAST(${duckCountIn(stopEn)} AS DOUBLE) / len($duckToks), 4) AS stopword_ratio,
         |  round(CAST(length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS DOUBLE) / length(text), 4) AS digit_ratio,
         |  CAST(len($duckToks) BETWEEN 20 AND 1000 AS INTEGER) AS len_ok
         |FROM documents ORDER BY doc_id""".stripMargin,
    "lang_id" -> {
      val scores = markers.map { case (l, ws) => l -> duckCountIn(ws) }
      val cases = scores.map { case (l, s) =>
        val conds = scores.map { case (_, o) => s"$s >= $o" }.mkString(" AND ")
        s"WHEN $conds THEN '$l'"
      }.mkString(" ")
      s"""SELECT doc_id, lang,
         |  CASE $cases ELSE 'und' END AS pred_lang
         |FROM documents ORDER BY doc_id""".stripMargin
    },
    "doc_fingerprint" ->
      s"""SELECT doc_id,
         |  md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fingerprint,
         |  list_min(list_transform($duckShingles, s -> md5(s))) AS min_shingle_md5
         |FROM documents ORDER BY doc_id""".stripMargin,
    "top_terms" ->
      s"""SELECT t AS term, count(*) AS n
         |FROM (SELECT unnest($duckToks) AS t FROM documents)
         |GROUP BY t ORDER BY n DESC, term ASC LIMIT 25""".stripMargin,
    "pack_sequences" ->
      s"""WITH toks AS (
         |  SELECT doc_id, doc_id % 32 AS bucket,
         |    CAST(CASE WHEN length(trim(text)) = 0 THEN 0
         |         ELSE len($duckToks) + CAST(length(text) // 4 AS INTEGER) END
         |         AS BIGINT) AS n_tokens
         |  FROM documents),
         |offs AS (
         |  -- sum(BIGINT) OVER is HUGEINT in DuckDB; cast back so the dump
         |  -- serializes as int64 like Spark's BIGINT
         |  SELECT doc_id, bucket, n_tokens,
         |    CAST(coalesce(sum(n_tokens) OVER (PARTITION BY bucket ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS start_offset
         |  FROM toks)
         |SELECT doc_id, bucket, n_tokens, start_offset,
         |  CAST(bucket * 1000000 + start_offset // 2048 AS BIGINT) AS seq_id
         |FROM offs ORDER BY doc_id""".stripMargin,
    // per-doc token-count fold: sorted c·ln(c) terms summed
    // left-to-right, entropy/evenness from the raw value, r4 output
    "tok_entropy" ->
      s"""WITH tc AS (
         |  SELECT doc_id, t AS tok, count(*) AS c
         |  FROM (SELECT doc_id, unnest($duckToks) AS t FROM documents)
         |  GROUP BY 1, 2),
         |h AS (
         |  SELECT doc_id,
         |    CAST(sum(c) AS BIGINT) AS n_tokens,
         |    count(*) AS n_distinct,
         |    list_aggregate(list_sort(list(CAST(c AS DOUBLE) * ln(c))), 'sum')
         |      AS s
         |  FROM tc GROUP BY doc_id),
         |hr AS (
         |  SELECT doc_id, n_tokens, n_distinct,
         |    ln(n_tokens) - s / n_tokens AS hraw
         |  FROM h)
         |SELECT doc_id, n_tokens, n_distinct,
         |  round(hraw, 4) AS entropy,
         |  CASE WHEN n_distinct > 1 THEN round(hraw / ln(n_distinct), 4)
         |       ELSE 0.0 END AS evenness
         |FROM hr ORDER BY doc_id""".stripMargin,
    // next-fit fold replayed as a recursive CTE: base row from the
    // (bin=0, fill=0) start state, each step the same fits-or-new-bin
    // CASE as the Spark per-bucket fold
    "pack_nosplit" ->
      s"""WITH RECURSIVE toksz AS (
         |  SELECT doc_id, doc_id % 32 AS bucket,
         |    CAST(CASE WHEN length(trim(text)) = 0 THEN 0
         |         ELSE len($duckToks) + CAST(length(text) // 4 AS INTEGER) END
         |         AS BIGINT) AS n_tokens
         |  FROM documents),
         |numbered AS (
         |  SELECT doc_id, bucket, n_tokens,
         |    row_number() OVER (PARTITION BY bucket ORDER BY doc_id) AS rn
         |  FROM toksz),
         |pack AS (
         |  SELECT bucket, rn, doc_id, n_tokens,
         |    CAST(CASE WHEN n_tokens <= 2048 THEN 0 ELSE 1 END AS BIGINT)
         |      AS bin,
         |    n_tokens AS fill
         |  FROM numbered WHERE rn = 1
         |  UNION ALL
         |  SELECT s.bucket, s.rn, s.doc_id, s.n_tokens,
         |    CASE WHEN p.fill + s.n_tokens <= 2048 THEN p.bin
         |         ELSE p.bin + 1 END,
         |    CASE WHEN p.fill + s.n_tokens <= 2048 THEN p.fill + s.n_tokens
         |         ELSE s.n_tokens END
         |  FROM pack p JOIN numbered s
         |    ON s.bucket = p.bucket AND s.rn = p.rn + 1)
         |SELECT doc_id, bucket, n_tokens, bin, fill AS fill_after
         |FROM pack ORDER BY doc_id""".stripMargin,
    // the pack_sequences window replayed, aggregated per bucket; the
    // straddle test and seq count are integer division on non-negative
    // longs (floor == trunc), identical in both engines
    "pack_stats" ->
      s"""WITH toks AS (
         |  SELECT doc_id, doc_id % 32 AS bucket,
         |    CAST(CASE WHEN length(trim(text)) = 0 THEN 0
         |         ELSE len($duckToks) + CAST(length(text) // 4 AS INTEGER) END
         |         AS BIGINT) AS n_tokens
         |  FROM documents),
         |offs AS (
         |  SELECT doc_id, bucket, n_tokens,
         |    CAST(coalesce(sum(n_tokens) OVER (PARTITION BY bucket ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS start_offset
         |  FROM toks),
         |agg AS (
         |  SELECT bucket,
         |    CAST(count(*) AS BIGINT) AS n_docs,
         |    CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
         |    CAST(sum(CASE WHEN n_tokens > 0 AND
         |          start_offset // 2048 <> (start_offset + n_tokens - 1) // 2048
         |        THEN 1 ELSE 0 END) AS BIGINT) AS n_split_docs
         |  FROM offs GROUP BY bucket)
         |SELECT bucket, n_docs, n_tokens, n_split_docs,
         |  CAST((n_tokens + 2047) // 2048 AS BIGINT) AS n_seqs,
         |  CASE WHEN (n_tokens + 2047) // 2048 > 0
         |    THEN round(CAST(n_tokens AS DOUBLE) /
         |           (((n_tokens + 2047) // 2048) * 2048), 4)
         |    ELSE 0.0 END AS fill_frac
         |FROM agg ORDER BY bucket""".stripMargin,
    "pack_sequences_bpe" ->
      s"""WITH $duckBpeChain,
         |pdw AS (
         |  SELECT doc_id, word, count(*) AS c
         |  FROM (SELECT doc_id,
         |               unnest(regexp_split_to_array(trim(text), '\\s+')) AS word
         |        FROM documents)
         |  WHERE length(word) > 0 GROUP BY 1, 2),
         |vs AS (
         |  SELECT word, len(string_split(substr(w, 2, length(w) - 2),
         |                    chr(2)||chr(1))) AS ns
         |  FROM w5),
         |toks AS (
         |  SELECT p.doc_id, p.doc_id % 32 AS bucket,
         |         CAST(sum(p.c * v.ns) AS BIGINT) AS n_tokens
         |  FROM pdw p JOIN vs v USING (word) GROUP BY 1, 2),
         |offs AS (
         |  SELECT doc_id, bucket, n_tokens,
         |    CAST(coalesce(sum(n_tokens) OVER (PARTITION BY bucket ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
         |      AS start_offset
         |  FROM toks)
         |SELECT doc_id, bucket, n_tokens, start_offset,
         |  CAST(bucket * 1000000 + start_offset // 2048 AS BIGINT) AS seq_id
         |FROM offs ORDER BY doc_id""".stripMargin,
    "sample_mixture" ->
      """WITH counts AS (SELECT lang, count(*) AS n FROM documents GROUP BY lang),
        |tot AS (
        |  SELECT sum(n) AS n_total,
        |    list_aggregate(list_sort(list(sqrt(CAST(n AS DOUBLE)))), 'sum') AS z
        |  FROM counts),
        |scored AS (
        |  SELECT lang,
        |    least(1.0, (floor(n_total * 0.2) * (sqrt(CAST(n AS DOUBLE)) / z)) / n)
        |      AS keep_frac
        |  FROM counts CROSS JOIN tot)
        |SELECT d.doc_id, d.lang,
        |  floor(s.keep_frac * 10000 + 0.5) / 10000 AS keep_frac
        |FROM documents d JOIN scored s USING (lang)
        |WHERE CAST(('0x' || substr(md5('mix|' || CAST(d.doc_id AS VARCHAR)), 1, 8))
        |        AS BIGINT) % 1000000
        |      < CAST(floor(s.keep_frac * 1000000 + 0.5) AS BIGINT)
        |ORDER BY d.doc_id""".stripMargin,
    "text_repetition" ->
      s"""WITH toks AS (SELECT doc_id, unnest($duckToks) AS tok FROM documents),
         |ws AS (
         |  SELECT doc_id, count(*) AS n_tokens, count(DISTINCT tok) AS n_uniq
         |  FROM toks GROUP BY 1),
         |bi AS (
         |  SELECT doc_id, t[i] || ' ' || t[i + 1] AS b
         |  FROM (SELECT doc_id, $duckToks AS t FROM documents),
         |       unnest(range(1, len(t))) u(i)),
         |bc AS (SELECT doc_id, b, count(*) AS c FROM bi GROUP BY 1, 2),
         |bs AS (SELECT doc_id, sum(c) AS n_bi, max(c) AS max_bi FROM bc GROUP BY 1)
         |SELECT ws.doc_id AS doc_id, n_tokens,
         |  floor((1 - CAST(n_uniq AS DOUBLE) / n_tokens) * 10000 + 0.5) / 10000
         |    AS dup_word_frac,
         |  floor(coalesce(CAST(max_bi AS DOUBLE) / n_bi, 0) * 10000 + 0.5) / 10000
         |    AS top_bigram_frac
         |FROM ws LEFT JOIN bs ON ws.doc_id = bs.doc_id
         |ORDER BY doc_id""".stripMargin,
    "text_normalize" ->
      """SELECT doc_id,
        |  len(regexp_extract_all(text, '[0-9]+')) AS n_num_runs,
        |  md5(regexp_replace(
        |    regexp_replace(lower(trim(text)), '[0-9]+', '<num>', 'g'),
        |    '\s+', ' ', 'g')) AS norm_md5
        |FROM documents ORDER BY doc_id""".stripMargin,
    // raw-text census per category, one |sources|-key aggregate; the
    // rate divides exact longs, rounded r4
    "pii_by_source" -> {
      import graft.text.Redact
      def cnt(re: String) = s"len(regexp_extract_all(text, '$re'))"
      s"""WITH d AS (
         |  SELECT source,
         |    CAST(${cnt(Redact.EmailRe)} AS BIGINT) AS e,
         |    CAST(${cnt(Redact.Ipv4Re)} AS BIGINT) AS i,
         |    CAST(${cnt(Redact.PhoneRe)} AS BIGINT) AS p
         |  FROM documents)
         |SELECT source, count(*) AS n_docs,
         |  CAST(sum(CASE WHEN e + i + p > 0 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_docs_with_pii,
         |  CAST(sum(e) AS BIGINT) AS n_emails,
         |  CAST(sum(i) AS BIGINT) AS n_ipv4,
         |  CAST(sum(p) AS BIGINT) AS n_phones,
         |  round(CAST(sum(CASE WHEN e + i + p > 0 THEN 1 ELSE 0 END) AS DOUBLE)
         |        / count(*), 4) AS pii_rate
         |FROM d GROUP BY source ORDER BY source""".stripMargin
    },
    "pii_redact" -> {
      import graft.text.Redact
      s"""WITH r1 AS (
         |  SELECT doc_id, text,
         |    regexp_replace(text, '${Redact.EmailRe}', '<email>', 'g') AS t1
         |  FROM documents),
         |r2 AS (
         |  SELECT doc_id, text, t1,
         |    regexp_replace(t1, '${Redact.Ipv4Re}', '<ip>', 'g') AS t2
         |  FROM r1)
         |SELECT doc_id,
         |  len(regexp_extract_all(text, '${Redact.EmailRe}')) AS n_email,
         |  len(regexp_extract_all(t1, '${Redact.Ipv4Re}')) AS n_ip,
         |  len(regexp_extract_all(t2, '${Redact.PhoneRe}')) AS n_phone,
         |  md5(regexp_replace(t2, '${Redact.PhoneRe}', '<phone>', 'g')) AS redacted_md5
         |FROM r2 ORDER BY doc_id""".stripMargin
    },
    "cms_top_terms" ->
      s"""WITH toks AS (SELECT unnest($duckToks) AS term FROM documents),
         |counters AS (
         |  SELECT r,
         |    CAST(('0x' || substr(md5('cms' || CAST(r AS VARCHAR) || '|' || term), 1, 8))
         |      AS BIGINT) % 1024 AS b,
         |    count(*) AS c
         |  FROM toks, unnest([0, 1, 2, 3]) u(r)
         |  GROUP BY 1, 2),
         |top AS (
         |  SELECT term, count(*) AS n_exact FROM toks
         |  GROUP BY 1 ORDER BY n_exact DESC, term ASC LIMIT 25),
         |probes AS (
         |  SELECT term, n_exact, r,
         |    CAST(('0x' || substr(md5('cms' || CAST(r AS VARCHAR) || '|' || term), 1, 8))
         |      AS BIGINT) % 1024 AS b
         |  FROM top, unnest([0, 1, 2, 3]) u(r))
         |SELECT p.term, p.n_exact, CAST(min(c.c) AS BIGINT) AS n_cms
         |FROM probes p JOIN counters c ON p.r = c.r AND p.b = c.b
         |GROUP BY 1, 2
         |ORDER BY n_exact DESC, term ASC""".stripMargin,
    "substring_dedup" ->
      """WITH g AS (
        |  SELECT DISTINCT doc_id, h FROM (
        |    SELECT doc_id,
        |      CAST(('0x' || substr(md5(substr(text, i, 16)), 1, 8)) AS BIGINT) AS h
        |    FROM documents, unnest(range(1, len(text) - 14)) u(i))
        |  WHERE h % 8 = 0),
        |d AS (SELECT doc_id, h, count(*) OVER (PARTITION BY h) AS df FROM g)
        |SELECT doc_id, count(*) AS n_grams,
        |  CAST(sum(CASE WHEN df >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_shared,
        |  floor((CAST(sum(CASE WHEN df >= 2 THEN 1 ELSE 0 END) AS DOUBLE)
        |         / count(*)) * 10000 + 0.5) / 10000 AS shared_frac
        |FROM d GROUP BY 1 ORDER BY 1""".stripMargin,
    "boilerplate_frac" ->
      s"""WITH sh AS (
         |  SELECT doc_id, CAST(('0x' || substr(md5(s), 1, 8)) AS BIGINT) AS h
         |  FROM (SELECT doc_id, unnest(list_distinct($duckShingles)) AS s
         |        FROM documents)),
         |df AS (SELECT h, count(*) AS df FROM sh GROUP BY 1)
         |SELECT sh.doc_id AS doc_id,
         |  count(*) AS n_shingles,
         |  CAST(sum(CASE WHEN df.df >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_shared,
         |  floor((CAST(sum(CASE WHEN df.df >= 2 THEN 1 ELSE 0 END) AS DOUBLE)
         |         / count(*)) * 10000 + 0.5) / 10000 AS shared_frac
         |FROM sh JOIN df USING (h)
         |GROUP BY 1 ORDER BY 1""".stripMargin,
    "span_dedup_rewrite" ->
      s"""WITH arrs AS (SELECT doc_id, $duckToks AS arr FROM documents),
         |toks AS (
         |  SELECT doc_id, i - 1 AS p, arr[i] AS tok
         |  FROM arrs, unnest(range(1, len(arr) + 1)) u(i)),
         |shp AS (
         |  SELECT doc_id, i - 1 AS q,
         |    CAST(('0x' || substr(md5(arr[i] || ' ' || arr[i+1] || ' ' || arr[i+2]),
         |          1, 8)) AS BIGINT) AS h
         |  FROM arrs, unnest(range(1, len(arr) - 1)) u(i)
         |  WHERE len(arr) >= 3),
         |fo AS (
         |  SELECT doc_id, q,
         |    row_number() OVER (PARTITION BY h ORDER BY doc_id, q) AS rn,
         |    count(*) OVER (PARTITION BY h) AS occ
         |  FROM shp),
         |covered AS (
         |  SELECT DISTINCT doc_id, q + d AS p
         |  FROM fo, unnest([0, 1, 2]) v(d)
         |  WHERE occ >= 2 AND rn > 1),
         |kept AS (
         |  SELECT t.doc_id, t.p, t.tok FROM toks t
         |  WHERE NOT EXISTS (SELECT 1 FROM covered c
         |                    WHERE c.doc_id = t.doc_id AND c.p = t.p)),
         |reb AS (
         |  SELECT doc_id, count(*) AS n_kept,
         |         string_agg(tok, ' ' ORDER BY p) AS clean_text
         |  FROM kept GROUP BY 1)
         |SELECT a.doc_id, CAST(len(a.arr) AS BIGINT) AS n_tokens,
         |  CAST(len(a.arr) - coalesce(r.n_kept, 0) AS BIGINT) AS n_removed,
         |  coalesce(r.clean_text, '') AS clean_text
         |FROM arrs a LEFT JOIN reb r USING (doc_id)
         |ORDER BY doc_id""".stripMargin,
    "gopher_rules" -> {
      val stopSql = stopEn.map(w =>
        s"CASE WHEN list_contains(toks, '$w') THEN 1 ELSE 0 END").mkString(" + ")
      s"""WITH base AS (
         |  SELECT doc_id, text, $duckToks AS toks FROM documents),
         |bi AS (
         |  SELECT doc_id, toks[i] || ' ' || toks[i+1] AS b
         |  FROM base, unnest(range(1, len(toks))) u(i)
         |  WHERE len(toks) >= 2),
         |cnt AS (SELECT doc_id, b, count(*) AS n FROM bi GROUP BY 1, 2),
         |top AS (
         |  SELECT doc_id, n AS top_n, b AS top_b
         |  FROM (SELECT doc_id, n, b,
         |          row_number() OVER (PARTITION BY doc_id
         |            ORDER BY n DESC, b DESC) AS rn
         |        FROM cnt) WHERE rn = 1),
         |m AS (
         |  SELECT base.doc_id,
         |    CAST(len(toks) AS BIGINT) AS n_words,
         |    floor(CAST(length(regexp_replace(text, '\\s+', '', 'g')) AS DOUBLE)
         |          / len(toks) * 10000 + 0.5) / 10000 AS mean_word_len,
         |    floor(CAST(len(list_filter(toks, x -> regexp_matches(x, '[a-zA-Z]')))
         |          AS DOUBLE) / len(toks) * 10000 + 0.5) / 10000 AS alpha_frac,
         |    CAST($stopSql AS INTEGER) AS stop_hits,
         |    floor(CAST(coalesce(top_n * length(top_b), 0) AS DOUBLE)
         |          / length(text) * 10000 + 0.5) / 10000 AS top2gram_frac
         |  FROM base LEFT JOIN top ON base.doc_id = top.doc_id)
         |SELECT doc_id, n_words, mean_word_len, alpha_frac, stop_hits,
         |  top2gram_frac,
         |  CAST(n_words BETWEEN 50 AND 100000 AS INTEGER) AS r_words,
         |  CAST(mean_word_len BETWEEN 3.0 AND 10.0 AS INTEGER) AS r_mwl,
         |  CAST(alpha_frac >= 0.8 AS INTEGER) AS r_alpha,
         |  CAST(stop_hits >= 2 AS INTEGER) AS r_stop,
         |  CAST(top2gram_frac <= 0.2 AS INTEGER) AS r_rep,
         |  CAST(n_words BETWEEN 50 AND 100000
         |       AND mean_word_len BETWEEN 3.0 AND 10.0
         |       AND alpha_frac >= 0.8 AND stop_hits >= 2
         |       AND top2gram_frac <= 0.2 AS INTEGER) AS gopher_pass
         |FROM m ORDER BY doc_id""".stripMargin
    },
    "sample_stratified" ->
      """SELECT doc_id, lang,
        |  CAST(('0x' || substr(md5('smp|' || CAST(doc_id AS VARCHAR)), 1, 8))
        |       AS BIGINT) % 100 AS bucket
        |FROM documents
        |WHERE CAST(('0x' || substr(md5('smp|' || CAST(doc_id AS VARCHAR)), 1, 8))
        |       AS BIGINT) % 100 < 20
        |ORDER BY doc_id""".stripMargin,
    "split_assign" ->
      """SELECT
        |  CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'val'
        |       ELSE 'test' END AS split,
        |  lang, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS sum_chars
        |FROM (SELECT lang, n_chars,
        |        CAST(('0x' || substr(md5('split|' || CAST(doc_id AS VARCHAR)), 1, 8))
        |             AS BIGINT) % 100 AS b
        |      FROM documents)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "bigram_lm" ->
      s"""WITH $duckLmScore
         |SELECT doc_id, n_bigrams, avg_logp
         |FROM lmscore ORDER BY doc_id""".stripMargin,
    // tercile cuts via running counts over DISTINCT snapped scores —
    // exact long arithmetic, never a per-document global sort (mirrors
    // the Spark plan's scale shape)
    "ppl_bucket" ->
      s"""WITH $duckLmScore,
         |by_score AS (SELECT avg_logp, count(*) AS cnt FROM lmscore GROUP BY 1),
         |cum AS (SELECT avg_logp,
         |          sum(cnt) OVER (ORDER BY avg_logp DESC) AS cum
         |        FROM by_score),
         |tot AS (SELECT count(*) AS n FROM lmscore)
         |SELECT l.doc_id, l.avg_logp,
         |  CASE WHEN c.cum <= floor(n / 3.0) THEN 'head'
         |       WHEN c.cum <= floor(n * 2 / 3.0) THEN 'middle'
         |       ELSE 'tail' END AS bucket
         |FROM lmscore l JOIN cum c USING (avg_logp) CROSS JOIN tot
         |ORDER BY doc_id""".stripMargin,
    "ngram_novelty" ->
      s"""WITH sh AS (
         |  SELECT DISTINCT doc_id, sh FROM (
         |    SELECT doc_id, unnest($duckShingles) AS sh FROM documents)),
         |dft AS (SELECT sh, count(*) AS df FROM sh GROUP BY 1)
         |SELECT doc_id, count(*) AS n_shingles,
         |  CAST(sum(CASE WHEN df = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_novel,
         |  round(CAST(sum(CASE WHEN df = 1 THEN 1 ELSE 0 END) AS DOUBLE)
         |        / count(*), 4) AS novelty
         |FROM sh JOIN dft USING (sh)
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "vocab_growth" ->
      s"""WITH tk AS (
         |  SELECT CAST(CAST(('0x' || substr(md5('hl|' || CAST(doc_id AS VARCHAR)), 1, 8))
         |              AS BIGINT) % 100 AS INTEGER) AS b,
         |         unnest($duckToks) AS tok
         |  FROM documents),
         |inst AS (SELECT b, count(*) AS n FROM tk GROUP BY 1),
         |vb AS (
         |  SELECT b, count(*) AS v FROM (
         |    SELECT min(b) AS b FROM tk GROUP BY tok) GROUP BY 1),
         |m AS (
         |  SELECT coalesce(i.b, v.b) AS b, coalesce(n, 0) AS n, coalesce(v, 0) AS v
         |  FROM inst i FULL JOIN vb v ON i.b = v.b)
         |SELECT b + 1 AS pct,
         |  CAST(sum(n) OVER (ORDER BY b) AS BIGINT) AS n_tokens,
         |  CAST(sum(v) OVER (ORDER BY b) AS BIGINT) AS vocab
         |FROM m ORDER BY pct""".stripMargin,
    // h[j : j+3] is DuckDB's INCLUSIVE 1-based list slice = Spark's
    // slice(h, j, 4); range(1, nh-2) excludes its stop = Spark's
    // sequence(1, nh-3) — both yield the nh-3 full windows of w=4
    "winnow_fingerprint" ->
      s"""WITH h AS (
         |  SELECT doc_id,
         |    list_transform($duckShingles,
         |      s -> CAST('0x' || substr(md5(s), 1, 8) AS BIGINT)) AS h
         |  FROM documents),
         |f AS (
         |  SELECT doc_id,
         |    CASE WHEN len(h) < 4 THEN [list_min(h)]
         |         ELSE list_distinct(list_transform(range(1, len(h) - 2),
         |                j -> list_min(h[CAST(j AS INTEGER) : CAST(j AS INTEGER) + 3])))
         |    END AS fps
         |  FROM h WHERE len(h) >= 1)
         |SELECT doc_id, unnest(fps) AS fp FROM f
         |ORDER BY doc_id, fp""".stripMargin,
    // mirrors the Spark side's two scale guards: the df cap on gram
    // blocks (never triggers on fixtures, mirrored so the engines agree
    // if it ever does) and the Gravano count filter before levenshtein
    "vocab_fuzzy_pairs" ->
      s"""WITH vocab AS (
         |  SELECT DISTINCT tok
         |  FROM (SELECT unnest($duckToks) AS tok FROM documents)
         |  WHERE length(tok) >= 4),
         |grams AS (
         |  SELECT DISTINCT tok, g FROM (
         |    SELECT tok, unnest(list_transform(range(1, length(p)),
         |                       i -> substring(p, CAST(i AS INTEGER), 2))) AS g
         |    FROM (SELECT tok, chr(1) || tok || chr(2) AS p FROM vocab))),
         |keepg AS (
         |  SELECT g FROM (SELECT g, count(*) AS df FROM grams GROUP BY g)
         |  WHERE df <= $VocabGramMaxDf),
         |cg AS (SELECT tok, grams.g AS g FROM grams JOIN keepg USING (g)),
         |ng AS (SELECT tok, count(*) AS n FROM cg GROUP BY tok),
         |cand AS (
         |  SELECT x.tok AS a, y.tok AS b, count(*) AS shared
         |  FROM cg x JOIN cg y ON x.g = y.g AND x.tok < y.tok
         |  GROUP BY 1, 2),
         |flt AS (
         |  SELECT a, b FROM cand
         |  JOIN ng na ON na.tok = cand.a
         |  JOIN ng nb ON nb.tok = cand.b
         |  WHERE shared >= greatest(na.n, nb.n) - 4)
         |SELECT a, b, CAST(levenshtein(a, b) AS INTEGER) AS dist
         |FROM flt WHERE levenshtein(a, b) <= 2
         |ORDER BY a, b""".stripMargin,
    "docs_profile" ->
      s"""SELECT count(*) AS n_docs,
         |  count(DISTINCT doc_id) AS n_distinct_ids,
         |  CAST(sum(CASE WHEN text IS NULL OR length(trim(text)) = 0
         |           THEN 1 ELSE 0 END) AS BIGINT) AS n_blank,
         |  count(DISTINCT lang) AS n_langs,
         |  count(DISTINCT source) AS n_sources,
         |  min(n_chars) AS min_chars,
         |  max(n_chars) AS max_chars,
         |  CAST(sum(CASE WHEN length(text) <> n_chars THEN 1 ELSE 0 END)
         |       AS BIGINT) AS n_chars_mismatch
         |FROM documents""".stripMargin,
    "tok_zipf" ->
      s"""WITH tf AS (
         |  SELECT tok, count(*) AS c
         |  FROM (SELECT unnest($duckToks) AS tok FROM documents)
         |  GROUP BY tok),
         |pts AS (
         |  SELECT ln(CAST(row_number() OVER (ORDER BY c DESC, tok ASC)
         |                 AS DOUBLE)) AS x,
         |         ln(CAST(c AS DOUBLE)) AS y
         |  FROM tf),
         |sums AS (
         |  SELECT CAST(count(*) AS DOUBLE) AS n,
         |         sum(x) AS sx, sum(y) AS sy,
         |         sum(x * x) AS sxx, sum(x * y) AS sxy
         |  FROM pts),
         |fit AS (
         |  SELECT n, sx, sy,
         |         (n * sxy - sx * sy) / (n * sxx - sx * sx) AS slope
         |  FROM sums)
         |SELECT CAST(n AS BIGINT) AS n_types,
         |       round(slope, 4) AS slope,
         |       round((sy - slope * sx) / n, 4) AS intercept
         |FROM fit""".stripMargin,
    "pmi_bigrams" ->
      s"""WITH bi AS (
         |  SELECT t[i] AS w1, t[i + 1] AS w2
         |  FROM (SELECT $duckToks AS t FROM documents),
         |       unnest(range(1, len(t))) u(i)),
         |c12 AS (SELECT w1, w2, count(*) AS c12 FROM bi GROUP BY 1, 2),
         |mar AS (
         |  SELECT w1, w2, c12,
         |    sum(c12) OVER (PARTITION BY w1) AS c1,
         |    sum(c12) OVER (PARTITION BY w2) AS c2
         |  FROM c12),
         |nb AS (SELECT count(*) AS nb FROM bi)
         |SELECT w1, w2, c12 AS pair_count,
         |  round(ln(CAST(c12 AS DOUBLE) * CAST(nb AS DOUBLE) /
         |           (CAST(c1 AS DOUBLE) * CAST(c2 AS DOUBLE))), 4) AS pmi
         |FROM mar CROSS JOIN nb
         |WHERE c12 >= 5
         |ORDER BY pmi DESC, w1 ASC, w2 ASC
         |LIMIT 15""".stripMargin,
    "lang_js" ->
      s"""WITH tk AS (SELECT lang, unnest($duckToks) AS tok FROM documents),
         |lt AS (SELECT lang, tok, count(*) AS cl FROM tk GROUP BY 1, 2),
         |lg AS (SELECT lang, count(*) AS nl FROM tk GROUP BY 1),
         |tt AS (SELECT tok, count(*) AS ct FROM tk GROUP BY 1),
         |ntot AS (SELECT count(*) AS nt FROM tk),
         |grid AS (
         |  SELECT lg.lang, lg.nl,
         |    CAST(coalesce(lt.cl, 0) AS DOUBLE) / lg.nl AS p,
         |    CAST(tt.ct AS DOUBLE) / ntot.nt AS q
         |  FROM lg CROSS JOIN tt CROSS JOIN ntot
         |  LEFT JOIN lt ON lt.lang = lg.lang AND lt.tok = tt.tok),
         |terms AS (
         |  SELECT lang, nl,
         |    CASE WHEN p > 0 THEN 0.5 * p * ln(p / ((p + q) / 2))
         |         ELSE 0.0 END
         |      + 0.5 * q * ln(q / ((p + q) / 2)) AS term
         |  FROM grid)
         |SELECT lang, nl AS n_toks, round(sum(term), 4) AS js
         |FROM terms GROUP BY lang, nl ORDER BY lang""".stripMargin,
    "textrank_keywords" -> {
      // one PageRank iteration: neighbor-weighted sums onto dst, damped
      // and snapped to the 1e-8 grid — same structure as the Spark loop
      def prIter(prev: String, next: String): String =
        s"""$next AS MATERIALIZED (
           |  SELECT n.token,
           |    floor((0.15/n.nn + 0.85 * coalesce(c.s, 0.0)) * 1e8 + 0.5)/1e8 AS pr
           |  FROM (SELECT src AS token, nn FROM wd CROSS JOIN nn) n
           |  LEFT JOIN (
           |    SELECT e.dst AS token, sum(CAST(e.w AS DOUBLE)/w2.wdeg * p.pr) AS s
           |    FROM ed e JOIN wd w2 ON e.src = w2.src
           |    JOIN $prev p ON e.src = p.token
           |    GROUP BY e.dst) c ON n.token = c.token)""".stripMargin
      val iters = (1 to 5).map(i => prIter(s"pr_${i - 1}", s"pr_$i")).mkString(",\n")
      s"""WITH bi AS (
         |  SELECT t[i] AS w1, t[i + 1] AS w2
         |  FROM (SELECT $duckToks AS t FROM documents),
         |       unnest(range(1, len(t))) u(i)
         |  WHERE t[i] <> t[i + 1]),
         |ed AS MATERIALIZED (
         |  SELECT src, dst, count(*) AS w FROM (
         |    SELECT w1 AS src, w2 AS dst FROM bi
         |    UNION ALL SELECT w2 AS src, w1 AS dst FROM bi)
         |  GROUP BY 1, 2),
         |wd AS MATERIALIZED (SELECT src, sum(w) AS wdeg FROM ed GROUP BY 1),
         |nn AS (SELECT count(*) AS nn FROM wd),
         |pr_0 AS MATERIALIZED (
         |  SELECT src AS token, floor(1.0/nn * 1e8 + 0.5)/1e8 AS pr
         |  FROM wd CROSS JOIN nn),
         |$iters
         |SELECT rank, token, pr AS score FROM (
         |  SELECT token, pr,
         |    CAST(row_number() OVER (ORDER BY pr DESC, token ASC) AS INTEGER) AS rank
         |  FROM pr_5)
         |WHERE rank <= 10 ORDER BY rank""".stripMargin
    },
    "sample_quality" ->
      s"""WITH $duckLmScore,
         |scaled AS (
         |  SELECT doc_id,
         |    CAST(floor(avg_logp * 10000 + 0.5) AS BIGINT) AS s
         |  FROM lmscore),
         |m AS (
         |  SELECT CAST(sum(s) AS DOUBLE) / count(*) AS mean_s FROM scaled)
         |SELECT doc_id,
         |  CASE WHEN s > mean_s THEN 'head' ELSE 'tail' END AS bucket
         |FROM scaled CROSS JOIN m
         |WHERE CAST(('0x' || substr(md5('ql|' || CAST(doc_id AS VARCHAR)), 1, 8))
         |        AS BIGINT) % 100
         |      < CASE WHEN s > mean_s THEN 100 ELSE 25 END
         |ORDER BY doc_id""".stripMargin,
    "bpe_train" -> {
      val rows = (1 to 5).map { i =>
        s"SELECT $i AS rank, l AS \"left\", r AS \"right\", c AS pair_count FROM m$i"
      }.mkString("\n  UNION ALL\n  ")
      s"""WITH $duckBpeChain
         |SELECT CAST(rank AS INTEGER) AS rank, "left", "right", pair_count FROM (
         |  $rows)
         |ORDER BY rank""".stripMargin
    },
    "bpe_encode" ->
      s"""WITH $duckBpeChain,
         |pdw AS (
         |  SELECT doc_id, word, count(*) AS c
         |  FROM (SELECT doc_id,
         |               unnest(regexp_split_to_array(trim(text), '\\s+')) AS word
         |        FROM documents)
         |  WHERE length(word) > 0 GROUP BY 1, 2),
         |vs AS (
         |  SELECT word, len(string_split(substr(w, 2, length(w) - 2),
         |                    chr(2)||chr(1))) AS ns
         |  FROM w5)
         |SELECT p.doc_id, CAST(sum(p.c * v.ns) AS BIGINT) AS n_bpe_tokens,
         |       CAST(sum(p.c) AS BIGINT) AS n_words
         |FROM pdw p JOIN vs v USING (word)
         |GROUP BY 1 ORDER BY doc_id""".stripMargin,
    // the bpe_encode per-doc counts re-aggregated per ingest source —
    // exact long sums, one rounded double ratio (the dup_rate rule)
    "bpe_fertility" ->
      s"""WITH $duckBpeChain,
         |pdw AS (
         |  SELECT doc_id, word, count(*) AS c
         |  FROM (SELECT doc_id,
         |               unnest(regexp_split_to_array(trim(text), '\\s+')) AS word
         |        FROM documents)
         |  WHERE length(word) > 0 GROUP BY 1, 2),
         |vs AS (
         |  SELECT word, len(string_split(substr(w, 2, length(w) - 2),
         |                    chr(2)||chr(1))) AS ns
         |  FROM w5),
         |enc AS (
         |  SELECT p.doc_id, CAST(sum(p.c * v.ns) AS BIGINT) AS n_bpe,
         |         CAST(sum(p.c) AS BIGINT) AS n_w
         |  FROM pdw p JOIN vs v USING (word) GROUP BY 1)
         |SELECT d.source,
         |  CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(e.n_bpe) AS BIGINT) AS n_bpe_tokens,
         |  CAST(sum(e.n_w) AS BIGINT) AS n_words,
         |  CASE WHEN sum(e.n_w) > 0
         |    THEN round(CAST(sum(e.n_bpe) AS DOUBLE) /
         |               CAST(sum(e.n_w) AS DOUBLE), 4)
         |    ELSE 0.0 END AS fertility
         |FROM enc e JOIN documents d USING (doc_id)
         |GROUP BY 1 ORDER BY source""".stripMargin,
    "dsir_select" ->
      s"""WITH bt AS (
         |  SELECT doc_id, lang,
         |    CAST(('0x' || substr(md5('dsir|' || tok), 1, 8)) AS BIGINT) % 256 AS b
         |  FROM (SELECT doc_id, lang, unnest($duckToks) AS tok FROM documents)),
         |perdoc AS (SELECT doc_id, b, count(*) AS c FROM bt GROUP BY 1, 2),
         |tgt AS (SELECT b, count(*) AS ct FROM bt WHERE lang = 'en' GROUP BY 1),
         |rawc AS (SELECT b, count(*) AS cr FROM bt GROUP BY 1),
         |tot AS (
         |  SELECT count(*) FILTER (lang = 'en') AS nt, count(*) AS nr FROM bt),
         |lam AS (
         |  SELECT r.b,
         |    ln((COALESCE(t.ct, 0) + 1) / CAST(tot.nt + 256 AS DOUBLE)) -
         |    ln((r.cr + 1) / CAST(tot.nr + 256 AS DOUBLE)) AS lam
         |  FROM rawc r LEFT JOIN tgt t ON r.b = t.b CROSS JOIN tot)
         |SELECT p.doc_id, CAST(sum(p.c) AS BIGINT) AS n_toks,
         |  round(sum(p.c * l.lam) / sum(p.c), 4) AS dsir_logratio,
         |  round(sum(p.c * l.lam) / sum(p.c), 4) > 0 AS selected
         |FROM perdoc p JOIN lam l ON p.b = l.b
         |GROUP BY 1 ORDER BY doc_id""".stripMargin,
    "tfidf_top" ->
      s"""WITH toks AS (SELECT doc_id, unnest($duckToks) AS term FROM documents),
         |tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
         |df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
         |n AS (SELECT count(*) AS n FROM documents),
         |scored AS (
         |  SELECT t.doc_id, t.term,
         |         t.tf * ln(CAST(n.n AS DOUBLE) / df.df) AS score
         |  FROM tf t JOIN df USING (term) CROSS JOIN n
         |  WHERE t.doc_id < 50),
         |ranked AS (
         |  SELECT doc_id, term, score,
         |    CAST(row_number() OVER (PARTITION BY doc_id
         |                       ORDER BY score DESC, term ASC) AS INTEGER) AS rank
         |  FROM scored)
         |SELECT doc_id, rank, term, round(score, 4) AS score
         |FROM ranked WHERE rank <= 3 ORDER BY doc_id, rank""".stripMargin,
    "corpus_filter" -> {
      val scores = markers.map { case (l, ws) => l -> duckCountIn(ws) }
      val cases = scores.map { case (l, s) =>
        val conds = scores.map { case (_, o) => s"$s >= $o" }.mkString(" AND ")
        s"WHEN $conds THEN '$l'"
      }.mkString(" ")
      s"""WITH flags AS (
         |  SELECT doc_id,
         |    CAST(len($duckToks) BETWEEN 20 AND 1000 AS INTEGER) AS len_ok,
         |    CASE WHEN len($duckToks) = 0 THEN 0
         |         ELSE CAST(CAST(${duckCountIn(stopEn)} AS DOUBLE) / len($duckToks) >= 0.03
         |              AS INTEGER) END AS stop_ok,
         |    CASE WHEN length(text) = 0 THEN 1
         |         ELSE CAST(CAST(length(text) - length(regexp_replace(text, '[0-9]', '', 'g'))
         |              AS DOUBLE) / length(text) <= 0.3 AS INTEGER) END AS digit_ok,
         |    CAST((CASE $cases ELSE 'und' END) = lang AS INTEGER) AS lang_ok,
         |    CAST(doc_id = min(doc_id) OVER (
         |      PARTITION BY md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')))
         |      AS INTEGER) AS uniq
         |  FROM documents)
         |SELECT doc_id, len_ok, stop_ok, digit_ok, lang_ok, uniq,
         |  CAST(len_ok = 1 AND stop_ok = 1 AND digit_ok = 1 AND lang_ok = 1
         |       AND uniq = 1 AS INTEGER) AS kept
         |FROM flags ORDER BY doc_id""".stripMargin
    },
    "embed_hash" ->
      s"""WITH tf AS (
         |  SELECT doc_id,
         |         CAST(('0x' || substr(md5(t), 1, 8)) AS BIGINT) % 64 AS bucket,
         |         CAST(count(*) AS DOUBLE) AS cnt
         |  FROM (SELECT doc_id, unnest($duckToks) AS t FROM documents)
         |  GROUP BY 1, 2),
         |nrm AS (SELECT doc_id, sqrt(sum(cnt * cnt)) AS nrm FROM tf GROUP BY doc_id)
         |SELECT tf.doc_id AS doc_id, bucket, cnt / nrm.nrm AS w
         |FROM tf JOIN nrm ON tf.doc_id = nrm.doc_id
         |ORDER BY tf.doc_id, bucket""".stripMargin,
  )
}
