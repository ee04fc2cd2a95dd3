package graft.queries


import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.text.TextFns

/** Distributed trained quality classifier — the supervised filter
  * stage of an LLM data pipeline (the GPT-3 / LLaMA "quality
  * classifier": train a linear model over cheap text features, score
  * every raw document, keep the target-like ones; Brown et al. 2020
  * §A, Touvron et al. 2023 §2). The model is logistic regression over
  * hashed bag-of-words features (the fastText linear-classifier
  * shape: Joulin et al. 2017), trained by full-batch gradient descent.
  *
  * Labels: the synthetic corpus carries no learnable human label (all
  * five `lang` values share one 31-token vocabulary — measured, see
  * SCALING.md), so supervision is a PLANTED deterministic teacher: a
  * seeded md5-derived weight per hash bucket, centered to zero sum,
  * labels y = 1[teacher margin > 0] computed in EXACT integer
  * arithmetic in both engines. That turns the query into a trainer
  * meter — the measured quantity is whether distributed GD RECOVERS a
  * known decision boundary (the teacher-student protocol), exactly as
  * `ann_recall` measures whether the index recovers exact top-k. On a
  * real corpus the planted labels swap for curated ones; nothing else
  * changes.
  *
  * Distributed-training shape (the scale story): the feature frame is
  * one narrow explode → map-side-combined aggregate onto doc keys,
  * cached; each of the 25 GD iterations is ONE aggregate whose
  * partial sums combine map-side — per task the state is d+1 doubles,
  * and the driver holds only the 17-double weight vector, the
  * codebook-staging pattern of [[graft.search.Ann]]'s Lloyd trainer.
  * Nothing corpus-sized ever shuffles: at 100 TB this is 25 scans of
  * a cached/columnar feature projection plus a 17-double broadcast
  * back for scoring. (A production run would checkpoint the feature
  * frame to parquet; the cache is the local[32] stand-in.)
  *
  * Cross-engine float discipline: every updated weight is snapped to
  * the shared 10⁻⁶ grid (floor(x·10⁶+0.5)/10⁶ — the
  * [[graft.search.Ann.roundMean]] convention, kept in double), so the
  * order-dependent gradient sums (~10⁻¹³ relative drift) cannot
  * propagate between iterations; the oracle replays the identical
  * 25-iteration chain as unrolled CTEs (the [[Similarity.lloydIter]]
  * pattern), margins accumulate left-to-right in the same term order,
  * and `selected` derives from the ROUNDED score so flag and score
  * cannot disagree. The remaining cross-engine class is libm: Java
  * `Math.exp` and DuckDB `exp` may differ by 1 ulp — per-term ~1e-16
  * noise that the per-iteration grid snap absorbs exactly like
  * summation-order drift, and that the 4-decimal score rounding makes
  * a ~1-in-10^12 boundary event per value (the accepted bigram_lm
  * ln+round class, named here so a future flip reads as this, not as
  * silent wrongness).
  */
object Quality {

  private val B = 16
  private val Iters = 25
  private val Lr = 2.0

  /** Teacher weights: md5Int("qlr|j") % 401 − 200 ∈ [−200, 200] — the
    * seeded-md5 constant convention of [[graft.dedup.Dedup]]'s MinHash
    * permutations (embedded into the oracle as VALUES the same way).
    */
  private[graft] val teacherRaw: IndexedSeq[Long] = (0 until B).map { j =>
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(s"qlr|$j".getBytes("UTF-8"))
    val hex = md.take(4).map(b => f"${b & 0xff}%02x").mkString
    java.lang.Long.parseLong(hex, 16) % 401 - 200
  }
  private val teacherSum: Long = teacherRaw.sum

  /** Centered integer teacher weight per bucket: raw_j·B − Σraw. The
    * teacher margin Σ_j centered_j·cnt_j is pure integer arithmetic —
    * its sign (the label) is exact in both engines, no float anywhere.
    */
  private val centered: Array[Long] = teacherRaw.map(_ * B - teacherSum).toArray

  /** floor(x·10⁶+0.5)/10⁶ in double — Ann.roundMean without the float
    * cast (weights are scalars, not packed vectors).
    */
  private def snap(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6

  /** Doc features and teacher label in one pass: explode tokens, hash
    * each into one of B buckets, aggregate per doc. Features are
    * centered scaled fractions x_j = (cnt_j·B − n)/n (zero-mean across
    * j by construction, O(1) dynamic range); x0 = 1 is the bias. The
    * teacher margin rides the same aggregate as one extra integer sum.
    */
  private def feats(spark: SparkSession, dir: String): DataFrame =
    featsOf(Tables.documents(spark, dir))

  /** [[feats]] over an explicit (doc_id, text, ...) frame — split out so
    * specs can drive constructed/degenerate corpora (dsirScore's
    * convention).
    */
  private[graft] def featsOf(docs: DataFrame): DataFrame = {
    val bt = docs
      .select(col("doc_id"), explode(TextFns.tokens(col("text"))).as("tok"))
      .select(col("doc_id"),
        (TextFns.md5Int(concat(lit("lr|"), col("tok"))) % B).as("b"))
    val aggs =
      (0 until B).map(j =>
        sum(when(col("b") === j, 1L).otherwise(0L)).as(s"c$j")) ++ Seq(
        count(lit(1)).as("n"),
        sum(element_at(lit(centered), (col("b") + 1).cast("int"))).as("tm"))
    bt.groupBy(col("doc_id")).agg(aggs.head, aggs.tail: _*)
      .select(
        Seq(col("doc_id"),
          when(col("tm") > 0, lit(1.0)).otherwise(lit(0.0)).as("y"),
          lit(1.0).as("x0")) ++
        (0 until B).map(j =>
          ((col(s"c$j") * B - col("n")).cast("double") / col("n")).as(s"x${j + 1}")): _*)
  }

  /** w·x accumulated left-to-right over the fixed term order — the
    * identical association the oracle's generated margin string uses.
    */
  private def margin(w: Array[Double]): Column =
    (1 to B).foldLeft(lit(w(0)) * col("x0"): Column)((acc, j) =>
      acc + lit(w(j)) * col(s"x$j"))

  private def sigmoid(m: Column): Column = lit(1.0) / (lit(1.0) + exp(-m))

  /** Train once per (session, dir) — the train()/score() split the ANN
    * family memoizes the same way. Returned weights sit on the 10⁻⁶
    * grid.
    */
  private val trainedW = new graft.SessionMemo[String, Array[Double]]

  private[graft] def trainWeights(spark: SparkSession, dir: String): Array[Double] =
    trainedW.computeIfAbsent(spark, dir)(trainWeightsOf(feats(spark, dir)))

  /** Unmemoized trainer over an explicit feature frame (spec entry
    * point). An EMPTY corpus returns the zero vector instead of
    * NPE-ing on the null gradient row — read the count before any
    * double column.
    */
  private[graft] def trainWeightsOf(featFrame: DataFrame): Array[Double] = {
    val f = featFrame.cache()
    var w = Array.fill(B + 1)(0.0)
    var live = true
    for (_ <- 1 to Iters if live) {
      val err = sigmoid(margin(w)) - col("y")
      val gAggs = (0 to B).map(j => sum(err * col(s"x$j")).as(s"g$j")) :+
        count(lit(1)).as("cnt")
      val g = f.agg(gAggs.head, gAggs.tail: _*).head()
      val n = g.getLong(B + 1).toDouble
      if (n == 0) live = false
      else w = Array.tabulate(B + 1)(j => snap(w(j) - Lr * g.getDouble(j) / n))
    }
    f.unpersist()
    w
  }

  private def scored(spark: SparkSession, dir: String): DataFrame = {
    val w = trainWeights(spark, dir)
    feats(spark, dir)
      .select(col("doc_id"), col("y").cast("int").as("label"),
        round(sigmoid(margin(w)), 4).as("score"))
      .withColumn("selected", col("score") > 0.5)
  }

  /** Per-document scores from the trained classifier: the planted
    * teacher label, the rounded student sigmoid score, and the keep
    * decision.
    */
  def qualityLr(spark: SparkSession, dir: String): DataFrame =
    scored(spark, dir).orderBy("doc_id")

  /** The trained weight vector (idx, weight) — the model artifact a
    * pipeline would persist, exposed the way [[TextAnalysis.bpeTrain]]
    * exposes the merge table. idx 0 is the bias.
    */
  def qualityLrWeights(spark: SparkSession, dir: String): DataFrame = {
    val w = trainWeights(spark, dir)
    spark.createDataFrame(
      spark.sparkContext.parallelize(w.toIndexedSeq.zipWithIndex.map {
        case (v, i) => Row(i, v)
      }, 1),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("idx",
          org.apache.spark.sql.types.IntegerType, nullable = false),
        org.apache.spark.sql.types.StructField("weight",
          org.apache.spark.sql.types.DoubleType, nullable = false))))
      .orderBy("idx")
  }

  /** The trainer meter: does distributed GD recover the planted
    * boundary? One row — docs, correct predictions, positives — the
    * measured-not-assumed contract of `ann_recall`.
    */
  def qualityLrRecovery(spark: SparkSession, dir: String): DataFrame =
    scored(spark, dir).agg(
      count(lit(1)).as("n_docs"),
      sum(when(col("selected") === (col("label") === 1), 1L).otherwise(0L))
        .as("n_correct"),
      sum(col("label").cast("long")).as("n_pos"))

  /** The classifier's ROC-AUC against the planted labels — the
    * threshold-free companion to [[qualityLrRecovery]]'s accuracy (a
    * selection pipeline tunes its keep threshold AFTER training; AUC
    * is the quantity that says whether any threshold can work). Exact
    * rank-statistic formulation with tie handling: over the 4-decimal
    * ROUNDED scores, AUC = (Σ_{pos} avg-rank − n₊(n₊+1)/2)/(n₊·n₋),
    * computed in ALL-LONG arithmetic (avg-ranks carried doubled so
    * .5 ties stay integral) with one final division rounded to 4
    * decimals — bit-identical in DuckDB by construction, no float
    * compare anywhere.
    *
    * Scale: scores aggregate onto ≤10⁴+1 distinct rounded values (the
    * 4-decimal grid bounds the key space by construction), so the
    * rank prefix-sum window runs on a ≤10001-row frame — the
    * quantiles_hist bounded-sketch convention, not a corpus-sized
    * global sort.
    */
  def qualityLrAuc(spark: SparkSession, dir: String): DataFrame =
    aucOf(scored(spark, dir))

  /** Calibration (reliability) table of the trained classifier: the
    * 4-decimal scores binned into ten deciles, each bin reporting size,
    * mean predicted score and empirical positive rate — the standard
    * reliability diagram beside [[qualityLrAuc]]'s ranking quality (a
    * selection pipeline that thresholds on the SCORE VALUE needs the
    * score to mean what it says; AUC alone can be perfect on a wildly
    * miscalibrated model). `gap` = |mean_score − frac_pos| per bin, the
    * per-bin summand of expected calibration error.
    *
    * Determinism: scores ride as s4 = floor(score·10⁴ + 0.5) LONGS, so
    * bin assignment (integer thirds of the grid) and the per-bin sums
    * are exact integer arithmetic; the two ratios divide exact longs as
    * doubles identically in both engines, rounding output-only.
    * Scale: one map-side-combined aggregate onto ≤10 keys.
    */
  def qualityLrCalibration(spark: SparkSession, dir: String): DataFrame =
    scored(spark, dir)
      .withColumn("s4", floor(col("score") * 10000 + 0.5).cast("long"))
      .withColumn("bin", least(floor(col("s4") / 1000.0), lit(9.0)).cast("int"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("label").cast("long")).as("n_pos"),
        sum(col("s4")).as("s4sum"))
      .select(col("bin"), col("n_docs"), col("n_pos"),
        round(col("s4sum") / (col("n_docs") * 10000.0), 4).as("mean_score"),
        round(col("n_pos").cast("double") / col("n_docs"), 4).as("frac_pos"),
        round(abs(col("s4sum") / (col("n_docs") * 10000.0) -
          col("n_pos").cast("double") / col("n_docs")), 4).as("gap"))
      .orderBy("bin")

  /** The rank-statistic AUC over any (label: 0/1 int, score) frame —
    * split out so specs can pin the tie/degenerate behavior on
    * constructed inputs (the featsOf convention).
    */
  private[graft] def aucOf(scoredDf: DataFrame): DataFrame = {
    val per = scoredDf
      .groupBy(col("score"))
      .agg(count(lit(1)).as("n_at"), sum(col("label").cast("long")).as("p_at"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("score"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    per
      .withColumn("cum_less", coalesce(sum(col("n_at")).over(w), lit(0L)))
      .agg(
        sum(col("n_at")).as("n_docs"),
        sum(col("p_at")).as("n_pos"),
        sum((col("n_at") - col("p_at"))).as("n_neg"),
        sum(col("p_at") * (lit(2L) * col("cum_less") + col("n_at") + 1L))
          .as("rank2"))
      .select(col("n_docs"), col("n_pos"), col("n_neg"),
        round((col("rank2") - col("n_pos") * (col("n_pos") + 1L)).cast("double") /
          (lit(2L) * col("n_pos") * col("n_neg")).cast("double"), 4).as("auc"))
  }

  // ---- DuckDB oracles ------------------------------------------------

  private val duckToks = "regexp_split_to_array(trim(text), '\\s+')"

  /** Bucket + teacher-weight VALUES, bucketed tokens, and the feature
    * frame — the shared WITH-body prefix of all three oracles.
    */
  private val duckFeats: String = {
    val tw = centered.zipWithIndex
      .map { case (c, j) => s"($j, $c)" }.mkString(", ")
    val cnts = (0 until B)
      .map(j => s"sum(CASE WHEN b = $j THEN 1 ELSE 0 END) AS c$j").mkString(", ")
    val xs = (0 until B)
      .map(j => s"CAST(c$j * $B - n AS DOUBLE) / n AS x${j + 1}").mkString(", ")
    s"""tw(j, cw) AS (VALUES $tw),
       |bt AS MATERIALIZED (
       |  SELECT doc_id,
       |         CAST(('0x' || substr(md5('lr|' || tok), 1, 8)) AS BIGINT) % $B AS b
       |  FROM (SELECT doc_id, unnest($duckToks) AS tok FROM documents)),
       |ag AS (
       |  SELECT doc_id, count(*) AS n, sum(cw) AS tm, $cnts
       |  FROM bt JOIN tw ON tw.j = bt.b GROUP BY doc_id),
       |feats AS MATERIALIZED (
       |  SELECT doc_id, CASE WHEN tm > 0 THEN 1.0 ELSE 0.0 END AS y,
       |         1.0 AS x0, $xs
       |  FROM ag)""".stripMargin
  }

  private def duckMargin(p: String): String =
    (1 to B).foldLeft(s"$p.w0*f.x0")((acc, j) => s"$acc + $p.w$j*f.x$j")

  /** One GD iteration as a CTE: weight update with the gradient sum,
    * snapped to the 10⁻⁶ grid — [[Similarity.lloydIter]] for the
    * logistic trainer. `max(p.wj)` is just wj (prev has one row); it
    * dodges a GROUP BY over the cross join.
    */
  private def lrIter(prev: String, next: String): String = {
    def upd(j: Int) =
      s"CAST(floor((max(p.w$j) - $Lr * sum((1.0/(1.0+exp(-(${duckMargin("p")}))) - f.y) * f.x$j)" +
        s" / count(*)) * 1e6 + 0.5) / 1e6 AS DOUBLE) AS w$j"
    // MATERIALIZED is load-bearing: without it DuckDB's single-reference
    // CTE inlining multiplies the expression tree ~17× per iteration
    // (17 updates each referencing all 17 prev columns) — the binder
    // never returns on the 25-deep chain. Materializing each rung keeps
    // the plan linear (measured 1.9 s for the full chain).
    s"""$next AS MATERIALIZED (
       |  SELECT ${(0 to B).map(upd).mkString(",\n    ")}
       |  FROM feats f CROSS JOIN $prev p)""".stripMargin
  }

  private val duckChain: String = {
    val w0 = (0 to B).map(j => s"0.0 AS w$j").mkString(", ")
    (s"""WITH $duckFeats,
        |w_0 AS (SELECT $w0)""".stripMargin +:
      (1 to Iters).map(i => lrIter(s"w_${i - 1}", s"w_$i"))).mkString(",\n")
  }

  private val duckScore =
    s"round(1.0/(1.0+exp(-(${duckMargin("p")}))), 4)"

  def defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "quality_lr" -> (qualityLr _),
    "quality_lr_weights" -> (qualityLrWeights _),
    "quality_lr_recovery" -> (qualityLrRecovery _),
    "quality_lr_auc" -> (qualityLrAuc _),
    "quality_lr_calibration" -> (qualityLrCalibration _),
  )

  def oracles: Map[String, String] = Map(
    "quality_lr" ->
      s"""$duckChain
         |SELECT f.doc_id, CAST(f.y AS INTEGER) AS label, $duckScore AS score,
         |       $duckScore > 0.5 AS selected
         |FROM feats f CROSS JOIN w_$Iters p
         |ORDER BY doc_id""".stripMargin,
    "quality_lr_weights" -> {
      val cases = (0 to B).map(j => s"WHEN $j THEN w$j").mkString(" ")
      s"""$duckChain
         |SELECT CAST(i.i AS INTEGER) AS idx,
         |       CASE i.i $cases END AS weight
         |FROM w_$Iters, range(0, ${B + 1}) i(i)
         |ORDER BY idx""".stripMargin
    },
    "quality_lr_recovery" ->
      s"""$duckChain
         |SELECT count(*) AS n_docs,
         |       CAST(sum(CASE WHEN ($duckScore > 0.5) = (f.y = 1.0)
         |                THEN 1 ELSE 0 END) AS BIGINT) AS n_correct,
         |       CAST(sum(CAST(f.y AS BIGINT)) AS BIGINT) AS n_pos
         |FROM feats f CROSS JOIN w_$Iters p""".stripMargin,
    "quality_lr_auc" ->
      s"""$duckChain,
         |sc AS (
         |  SELECT $duckScore AS score, CAST(f.y AS BIGINT) AS label
         |  FROM feats f CROSS JOIN w_$Iters p),
         |per AS (
         |  SELECT score, count(*) AS n_at, sum(label) AS p_at
         |  FROM sc GROUP BY score),
         |cum AS (
         |  SELECT n_at, p_at,
         |    coalesce(sum(n_at) OVER (ORDER BY score
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_less
         |  FROM per)
         |SELECT CAST(sum(n_at) AS BIGINT) AS n_docs,
         |  CAST(sum(p_at) AS BIGINT) AS n_pos,
         |  CAST(sum(n_at - p_at) AS BIGINT) AS n_neg,
         |  round(CAST(sum(p_at * (2 * cum_less + n_at + 1))
         |             - sum(p_at) * (sum(p_at) + 1) AS DOUBLE)
         |        / (2 * sum(p_at) * sum(n_at - p_at)), 4) AS auc
         |FROM cum""".stripMargin,
    // scores ride as exact s4 longs (floor(score*1e4+0.5)); the two
    // ratios divide exact integers as doubles — identical in Spark
    "quality_lr_calibration" ->
      s"""$duckChain,
         |sc AS (
         |  SELECT CAST(floor($duckScore * 10000 + 0.5) AS BIGINT) AS s4,
         |         CAST(f.y AS BIGINT) AS label
         |  FROM feats f CROSS JOIN w_$Iters p),
         |b AS (
         |  SELECT CAST(least(floor(s4 / 1000.0), 9.0) AS INTEGER) AS bin,
         |         count(*) AS n, sum(label) AS np, sum(s4) AS s4sum
         |  FROM sc GROUP BY 1)
         |SELECT bin, CAST(n AS BIGINT) AS n_docs, CAST(np AS BIGINT) AS n_pos,
         |  round(s4sum / (n * 10000.0), 4) AS mean_score,
         |  round(CAST(np AS DOUBLE) / n, 4) AS frac_pos,
         |  round(abs(s4sum / (n * 10000.0) - CAST(np AS DOUBLE) / n), 4) AS gap
         |FROM b ORDER BY bin""".stripMargin,
  )
}
