package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Linear quality-classifier INFERENCE over document features (north-star
  * extension) — the fastText/logistic-regression-style quality gate of
  * large corpus pipelines (C4, CCNet, FineWeb all score documents with a
  * small trained classifier and threshold). Training happens offline on
  * labeled data; what runs at 100 TB is the scoring pass, and that is
  * what this implements: feature extraction + dot product + threshold as
  * pure narrow column ops — no shuffle at all, codegen end to end.
  *
  * Everything is integer fixed point (ratios scale by [[K]] with a
  * truncating division — Spark `div` ≡ DuckDB `//`), so scores are
  * bit-identical across engines and the oracle replays them exactly. A
  * linear score over these features expresses the published heuristics'
  * shape (stopword density up, repetition down, symbol soup down);
  * thresholding at 0 makes `keep` a pure sign test.
  */
object Classifier {

  /** Fixed-point scale for ratio features (1/K resolution). */
  val K = 1000L

  /** Exact integer division of nonnegative operands: (a - a mod b) / b —
    * the numerator is exactly divisible, so the double quotient is exact
    * and the Long cast lossless (all quantities ≪ 2^53).
    */
  private def idiv(a: Column, b: Column): Column =
    ((a - pmod(a, b)) / b).cast("long")

  /** Engine-exact integer features per document:
    *   n_tokens     token count (whitespace tokenizer, q03's)
    *   mean_len_fp  K·(total token chars / n_tokens)
    *   stop_fp      K·(stopword tokens / n_tokens)
    *   uniq_fp      K·(distinct tokens / n_tokens) — repetition signal
    *   digit_fp     K·(digit chars / chars)
    *   punct_fp     K·(non-alnum non-space chars / chars)
    * Ratios divide by max(denominator, 1) so empty docs yield zeros.
    */
  def qualityFeatures(df: DataFrame, id: Column, text: Column): DataFrame = {
    val toks = Stateless.tokens(text)
    val nTok = size(toks).cast("long")
    val nChars = length(text).cast("long")
    val totTokChars = aggregate(toks, lit(0L), (a, t) => a + length(t))
    val nStop = size(filter(toks, t => t.isin(TextAnalysis.stopwordsEn: _*))).cast("long")
    val nUniq = size(array_distinct(toks)).cast("long")
    val nDigit = length(regexp_replace(text, "[^0-9]", "")).cast("long")
    val nPunct = length(regexp_replace(text, "[A-Za-z0-9\\s]", "")).cast("long")
    df.select(id.as("id"),
      nTok.as("n_tokens"),
      idiv(totTokChars * K, greatest(nTok, lit(1L))).as("mean_len_fp"),
      idiv(nStop * K, greatest(nTok, lit(1L))).as("stop_fp"),
      idiv(nUniq * K, greatest(nTok, lit(1L))).as("uniq_fp"),
      idiv(nDigit * K, greatest(nChars, lit(1L))).as("digit_fp"),
      idiv(nPunct * K, greatest(nChars, lit(1L))).as("punct_fp"))
  }

  /** Weights in the shape of the published quality heuristics: reward
    * stopword density and token diversity, punish digit/symbol soup;
    * bias calibrated so ordinary prose clears zero.
    */
  val defaultWeights: Seq[(String, Long)] = Seq(
    "stop_fp" -> 4L, "uniq_fp" -> 2L, "digit_fp" -> -3L, "punct_fp" -> -2L)
  val defaultBias: Long = -900L

  /** Score = bias + Σ wᵢ·fᵢ (Long), keep = score ≥ 0. One projection —
    * composes with [[qualityFeatures]] into a single narrow codegen'd
    * pass over the corpus.
    */
  def linearScore(features: DataFrame,
                  weights: Seq[(String, Long)] = defaultWeights,
                  bias: Long = defaultBias): DataFrame = {
    require(weights.nonEmpty, "a linear score needs at least one weight")
    val s = weights.map { case (f, w) => col(f) * w }.reduce(_ + _) + bias
    features.select(col("id"), s.as("score"))
      .withColumn("keep", col("score") >= 0)
  }

  /** The composed gate: features → linear score → keep flag, per doc. */
  def qualityClassify(df: DataFrame, id: Column, text: Column,
                      weights: Seq[(String, Long)] = defaultWeights,
                      bias: Long = defaultBias): DataFrame =
    linearScore(qualityFeatures(df, id, text), weights, bias)
}
