package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
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

  private[ops] val stopwordsEn: Seq[String] = Seq(
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

  /** Gopher-style repetition signals per document:
    *  - dup_token_frac: fraction of token occurrences that are repeats
    *    (1 - distinct/total) — pure column expression, stays in the scan's
    *    codegen span;
    *  - top_bigram_frac: fraction of bigram occurrences taken by the most
    *    frequent bigram. Per-row bigram mode is quadratic as an array
    *    expression, so it runs distributed: explode → partial-aggregated
    *    groupBy (doc, bigram) → max per doc — two keyed shuffles carrying
    *    (doc_id, bigram, count) rows, never the text.
    * Repetitious documents (boilerplate, templated spam) score high on
    * both; corpus filters drop above a threshold.
    */
  /** Token-entropy quality signal in integer BITS — the graded
    * counterpart of [[repetitionProfile]]'s fractions (Gopher-style
    * battery): ent_bits = Σ_t cnt_t · (bitlen(n) − bitlen(cnt_t)), the
    * bitlen surrogate of n·H(unigram) used across the engine (low for
    * repetitive/templated docs, ~n·log2(n) for all-distinct ones).
    * Exact integers → bit-identical across engines, DuckDB-replayable.
    *
    * Scale shape: ZERO exchange — the per-doc token histogram is
    * run-length encoded from the SORTED token array with builtin array
    * expressions (array_sort / filter / zip_with / aggregate, all
    * codegen'd), so the whole signal is one narrow scan, like
    * [[Classifier]]'s features. Output: (doc_id, n_tokens, n_distinct,
    * ent_bits), zero rows for zero-token docs included.
    */
  def entropyProfile(df: DataFrame, id: Column, text: Column): DataFrame = {
    def bitlen(c: Column): Column = length(bin(c)).cast("long")
    val base = df.select(id.as("doc_id"), array_sort(tokens(text)).as("ts"))
      .withColumn("n", size(col("ts")).cast("long"))
    // 1-based start positions of each equal-token run in the sorted array
    val starts = filter(sequence(lit(1), size(col("ts"))), i =>
      (i === 1) || element_at(col("ts"), i) =!= element_at(col("ts"), i - 1))
    base
      .withColumn("st", when(col("n") === 0L, array().cast("array<int>")).otherwise(starts))
      // each run ends where the next begins (sentinel n+1 for the last)
      .withColumn("ends", concat(
        slice(col("st"), lit(2), greatest(size(col("st")) - 1, lit(0))),
        array((col("n") + 1L).cast("int"))))
      .select(col("doc_id"), col("n").as("n_tokens"),
        size(col("st")).cast("long").as("n_distinct"),
        when(col("n") === 0L, lit(0L)).otherwise(
          aggregate(zip_with(col("st"), col("ends"), (a, b) => b - a), lit(0L),
            (acc, c) => acc + c.cast("long") * (bitlen(col("n")) - bitlen(c))))
          .as("ent_bits"))
  }

  def repetitionProfile(df: DataFrame, id: Column, text: Column): DataFrame = {
    val base = df
      .select(id.as("doc_id"), tokens(text).as("toks"))
      .withColumn("n_toks", size(col("toks")))
      .withColumn("dup_token_frac",
        (col("n_toks") - size(array_distinct(col("toks")))).cast("double") /
          greatest(col("n_toks"), lit(1)))
    val bigrams = base.where(col("n_toks") >= 2)
      .select(col("doc_id"), explode(
        transform(sequence(lit(0), col("n_toks") - 2), i =>
          concat_ws(" ", element_at(col("toks"), i + 1), element_at(col("toks"), i + 2))))
        .as("bigram"))
    val topBigram = bigrams
      .groupBy(col("doc_id"), col("bigram")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id")).agg(max(col("c")).as("top_c"))
    base.join(topBigram, Seq("doc_id"), "left")
      .select(col("doc_id"), col("dup_token_frac"),
        coalesce(col("top_c").cast("double") / (col("n_toks") - 1), lit(0.0))
          .as("top_bigram_frac"))
  }

  // PII patterns restricted to syntax with identical semantics in Java
  // regex and RE2 (no backrefs, no lookaround) so redaction is
  // engine-portable and oracle-checkable.
  private val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private val ipv4Re = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  private val phoneRe = "\\b\\d{3}-\\d{3}-\\d{4}\\b"

  /** PII scrub: replace emails, IPv4 addresses, and NNN-NNN-NNNN phone
    * numbers with typed placeholders. Chained `regexp_replace` — fully
    * codegen'd, no UDF, safe in the 100 TB scan path. Email runs first
    * (its local part may contain digit runs that would otherwise
    * half-match the phone pattern).
    */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, emailRe, "<EMAIL>"),
        ipv4Re, "<IP>"),
      phoneRe, "<PHONE>")

  /** Count of PII matches per class, for audit reports. */
  def piiCounts(text: Column): Column =
    struct(
      size(regexp_extract_all(text, lit(emailRe), lit(0))).as("emails"),
      size(regexp_extract_all(text, lit(ipv4Re), lit(0))).as("ips"),
      size(regexp_extract_all(text, lit(phoneRe), lit(0))).as("phones"))

  /** Top-k tokens per group (e.g. per language): token counts via
    * partial-aggregated groupBy, then a bounded-heap top-k aggregate
    * ([[graft.functions.Kernels.collect_bottom_k]]) ordered
    * (count desc, token asc) — the ranking exchange carries at most k
    * rows per group per map partition, never a full per-group sort.
    * Output: (group, word, cnt, rk).
    */
  def topTokensPerGroup(df: DataFrame, group: Column, text: Column, k: Int): DataFrame = {
    val counts = df
      .select(group.as("grp"), explode(tokens(text)).as("word"))
      .groupBy(col("grp"), col("word")).agg(count(lit(1)).as("cnt"))
    counts
      .select(col("grp"), struct((-col("cnt")).as("nc"), col("word")).as("s"))
      .groupBy(col("grp"))
      .agg(graft.functions.Kernels.collect_bottom_k(col("s"), k).as("top"))
      .select(col("grp"), posexplode(col("top")).as(Seq("pos", "s")))
      .select(col("grp"), col("s").getField("word").as("word"),
        (-col("s").getField("nc")).as("cnt"),
        (col("pos") + 1).cast("long").as("rk"))
  }

  /** Split documents into fixed-size token windows with a stride — the
    * chunking step before embedding/RAG indexing or fixed-context
    * training. Chunk i covers tokens [i·stride, i·stride + chunkTokens);
    * the last chunk may be short; empty documents produce no chunks.
    * Pure column expressions (transform/slice/explode), so the pass is
    * one narrow scan — chunks are born distributed, never collected.
    */
  def chunk(df: DataFrame, id: Column, text: Column,
            chunkTokens: Int, stride: Int): DataFrame = {
    require(chunkTokens > 0 && stride > 0, "chunkTokens and stride must be positive")
    val base = df.select(id.as("doc_id"), tokens(text).as("toks"))
      .where(size(col("toks")) > 0)
    val nChunks = floor((size(col("toks")) - 1) / stride) + 1
    base
      .select(col("doc_id"), col("toks"),
        explode(transform(sequence(lit(0), (nChunks - 1).cast("int")), i =>
          struct(i.cast("long").as("chunk_idx"),
            slice(col("toks"), i * lit(stride) + lit(1), lit(chunkTokens)).as("ctoks"))))
          .as("c"))
      .select(col("doc_id"), col("c.chunk_idx").as("chunk_idx"),
        array_join(col("c.ctoks"), " ").as("chunk_text"),
        size(col("c.ctoks")).cast("long").as("n_chunk_tokens"))
  }

  /** Content-defined chunking (Rabin-style CDC): a chunk boundary falls
    * after every token window whose rolling hash has its `maskBits` low
    * bits clear (expected chunk length ≈ 2^maskBits tokens), so boundary
    * positions depend only on LOCAL content — insert or delete text
    * anywhere and every chunk outside the edited neighborhood keeps its
    * identity, where fixed-size chunking ([[chunk]]) shifts every
    * downstream boundary. That stability is what makes chunk-level
    * dedup/delta incremental: re-chunk a revised corpus and only the
    * edited chunks change fingerprint (storage-dedup literature's CDC,
    * applied to token streams).
    *
    * Output: (doc_id, chunk_idx, start_pos, n_chunk_tokens, chunk_fp)
    * where chunk_fp = md5 of the space-joined chunk tokens. Empty
    * documents produce no chunks; chunks partition the token stream
    * exactly. One narrow codegen'd pass (the window-hash kernel +
    * transform/slice/explode) — chunks are born distributed. The hash
    * chain is the engine-portable [[graft.functions.Kernels.RollingHashes]],
    * so q98's DuckDB oracle replays boundaries and fingerprints exactly.
    */
  def cdcChunks(df: DataFrame, id: Column, text: Column,
                window: Int = 5, maskBits: Int = 6): DataFrame = {
    require(window >= 1, "window must be >= 1")
    require(maskBits >= 1 && maskBits <= 62, "maskBits must be in [1, 62]")
    val mask = (1L << maskBits) - 1
    val base = df.select(id.as("doc_id"), tokens(text).as("toks"))
      .where(size(col("toks")) > 0)
      .select(col("doc_id"), col("toks"),
        graft.functions.Kernels.rolling_hashes(col("toks"), window).as("hs"))
    // boundary AFTER token s+w-1 for each window start s whose hash has
    // the low bits clear ((h & mask) on the signed long ≡ unsigned
    // mod 2^maskBits); the final token always closes the last chunk
    val w = least(lit(window), size(col("toks")))
    val bnds = filter(
      zip_with(col("hs"), sequence(lit(0), size(col("hs")) - 1),
        (h, s) => when(h.bitwiseAND(lit(mask)) === 0L, s + w - 1).otherwise(lit(-1))),
      x => x >= 0)
    val lastTok = size(col("toks")) - 1
    // try_element_at: plain element_at(-1) errors on an empty boundary
    // list (a doc with no natural boundaries) instead of returning null
    val ends = when(coalesce(try_element_at(bnds, lit(-1)), lit(-2)) === lastTok, bnds)
      .otherwise(concat(bnds, array(lastTok)))
    base
      .select(col("doc_id"), col("toks"), ends.as("ends"))
      .select(col("doc_id"), col("toks"),
        explode(transform(sequence(lit(0), size(col("ends")) - 1), k =>
          struct(k.cast("long").as("chunk_idx"),
            when(k === 0, lit(0))
              .otherwise(element_at(col("ends"), k) + 1).as("start"),
            element_at(col("ends"), k + 1).as("end")))).as("c"))
      .select(col("doc_id"), col("c.chunk_idx").as("chunk_idx"),
        col("c.start").cast("long").as("start_pos"),
        (col("c.end") - col("c.start") + 1).cast("long").as("n_chunk_tokens"),
        md5(array_join(
          slice(col("toks"), col("c.start") + 1, col("c.end") - col("c.start") + 1),
          " ")).as("chunk_fp"))
  }

  /** Language-model surprisal scoring — the perplexity-style quality
    * filter of CCNet-class pipelines (docs whose token transitions are
    * improbable under a corpus LM are likely noise), made engine-exact:
    * instead of Σ log2(c(w1)/c(w1,w2)) — transcendentals are not
    * bit-identical across engines (q51's rule) — the score is
    * Σ cnt·(bitlen(c(w1)) − bitlen(c(w1,w2))) where bitlen(x) =
    * ⌊log2 x⌋+1 comes from the length of the integer's binary string:
    * pure integer arithmetic, within one bit per bigram of the real
    * log-ratio, identical in any engine. The bigram LM is trained on the
    * corpus itself in the same pass (self-scoring; score against a
    * reference corpus by computing the count frames there instead).
    *
    * Plan shape: doc-level bigram counts partial-aggregate from one
    * narrow scan; BOTH count tables derive from that frame (no second
    * text pass); the scoring joins shuffle (w1, w2)-keyed count rows,
    * never text. Hot bigram heads ("the …") are reduced to one row per
    * map partition by partial aggregation before any exchange. Output:
    * (doc_id, n_bigrams, surprisal_bits) for every doc with >= 2 tokens;
    * smaller surprisal_bits per bigram = more predictable text.
    */
  private def bitlen(c: Column): Column = length(bin(c))

  /** Per-document bigram occurrence counts: (doc_id, w1, w2, cnt). */
  private def docBigrams(df: DataFrame, id: Column, text: Column): DataFrame = {
    val toks = tokens(text)
    df.select(id.as("doc_id"), toks.as("toks"))
      .where(size(col("toks")) >= 2)
      .select(col("doc_id"), explode(
        transform(sequence(lit(0), size(col("toks")) - 2), i =>
          struct(element_at(col("toks"), i + 1).as("w1"),
            element_at(col("toks"), i + 2).as("w2")))).as("bg"))
      .groupBy(col("doc_id"), col("bg.w1").as("w1"), col("bg.w2").as("w2"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Train the bigram LM count table over a reference corpus: one narrow
    * pass into (w1, w2, c2, c1) where c2 is the bigram count and c1 the
    * head count (Σ_w2 c2, a window over the vocab-sized count rows).
    * Persist the result (parquet) to score corpora repeatedly — the
    * CCNet-style flow: train on the reference corpus, score everything
    * else against it with [[lmSurprisalAgainst]].
    */
  def lmCounts(df: DataFrame, text: Column): DataFrame = {
    val toks = tokens(text)
    df.select(toks.as("toks"))
      .where(size(col("toks")) >= 2)
      .select(explode(
        transform(sequence(lit(0), size(col("toks")) - 2), i =>
          struct(element_at(col("toks"), i + 1).as("w1"),
            element_at(col("toks"), i + 2).as("w2")))).as("bg"))
      .groupBy(col("bg.w1").as("w1"), col("bg.w2").as("w2"))
      .agg(count(lit(1)).as("c2"))
      .withColumn("c1", sum(col("c2")).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("w1"))))
  }

  /** Score a corpus against a TRAINED count table ([[lmCounts]], usually
    * read back from parquet): ONE pass over the scored corpus; the count
    * table joins by bigram key (vocab-sized — broadcast when small, AQE
    * decides). Out-of-vocabulary handling is deterministic: an unseen
    * count defaults to 1 (bitlen 1), so an unseen bigram under a seen
    * head costs the head's full bitlen — the maximum surprisal that head
    * admits — and a fully unseen pair costs 0; `n_oov_bigrams` reports
    * how much of the doc the LM had no opinion on. `counts` must be
    * unique per (w1, w2) — [[lmCounts]] output is; a duplicated key
    * would multiply scored rows through the join. Output: (doc_id,
    * n_bigrams, n_oov_bigrams, surprisal_bits).
    */
  def lmSurprisalAgainst(df: DataFrame, id: Column, text: Column,
                         counts: DataFrame): DataFrame = {
    val heads = counts.select(col("w1"), col("c1")).distinct()
    docBigrams(df, id, text)
      .join(counts.select(col("w1"), col("w2"), col("c2")), Seq("w1", "w2"), "left")
      .join(heads, Seq("w1"), "left")
      .groupBy(col("doc_id"))
      .agg(sum(col("cnt")).cast("long").as("n_bigrams"),
        sum(when(col("c2").isNull, col("cnt")).otherwise(lit(0L)))
          .cast("long").as("n_oov_bigrams"),
        sum(col("cnt") *
          (bitlen(coalesce(col("c1"), lit(1L))) - bitlen(coalesce(col("c2"), lit(1L)))).cast("long"))
          .cast("long").as("surprisal_bits"))
  }

  /** Self-scoring form: the LM is trained on the scored corpus itself in
    * the same query. The corpus is read twice (once for the count
    * tables, once for the scoring probe — both narrow passes; AQE cannot
    * reuse the exchange across the two lambda-bearing subtrees, so a
    * standing pipeline should persist [[lmCounts]] and use
    * [[lmSurprisalAgainst]], which pays one pass). Output: (doc_id,
    * n_bigrams, surprisal_bits).
    */
  def lmSurprisal(df: DataFrame, id: Column, text: Column): DataFrame = {
    val docBg = docBigrams(df, id, text)
    val counts = docBg.groupBy(col("w1"), col("w2")).agg(sum(col("cnt")).as("c2"))
      .withColumn("c1", sum(col("c2")).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("w1"))))
    docBg.join(counts, Seq("w1", "w2"))
      .groupBy(col("doc_id"))
      .agg(sum(col("cnt")).cast("long").as("n_bigrams"),
        sum(col("cnt") * (bitlen(col("c1")) - bitlen(col("c2"))).cast("long"))
          .cast("long").as("surprisal_bits"))
  }

  /** Salient terms per document: tf-idf-style ranking with the
    * engine-exact surrogate score tf × N / df (monotone in tf·idf for
    * any fixed df ordering; ln() is not bit-identical across engines, a
    * ratio of integers is — q51's determinism rule). Plan shape: term
    * frequencies partial-aggregate per (doc, term); document frequencies
    * derive FROM the tf frame (one row per (doc, term), so df is a
    * second cheap aggregate, not a corpus re-scan); ranking is the
    * bounded-heap top-k aggregate. Output: (doc_id, term, score, rk).
    *
    * Stopword skew: a term-keyed tf⋈df shuffle would put every document
    * containing "the" into one partition — pathological at corpus scale.
    * Terms split at `hotDfCutoff`: HOT terms (df >= cutoff) are provably
    * few (at most totalPairs/cutoff rows), so their df table broadcasts
    * and hot tf rows join narrowly, never shuffling by term; COLD terms
    * go through the term-keyed join whose per-key row count is bounded
    * by the cutoff BY CONSTRUCTION (hot tf rows are broadcast-anti-
    * filtered out before the exchange, so they never enter it). A pure
    * df-threshold PRUNE would be unsound — a stopword with a huge tf in
    * one doc can legitimately rank — this split keeps results
    * bit-identical (asserted in PipelineOpsSpec) while bounding the
    * worst partition. dfreq itself is skew-safe: partial aggregation
    * reduces the hot term to one row per map partition pre-shuffle.
    */
  def salientTerms(df: DataFrame, id: Column, text: Column, k: Int,
                   hotDfCutoff: Long = 100000L): DataFrame = {
    val tf = df.select(id.as("doc_id"), explode(tokens(text)).as("term"))
      .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val nDocs = df.agg(count(lit(1)).as("n_docs"))
    // the tf exchange (hashpartitioning by doc_id+term) is identical in
    // every branch below, so AQE's runtime exchange reuse computes the
    // corpus scan+explode+partial-agg once for all of them
    val hot = dfreq.where(col("df") >= hotDfCutoff)
    val cold = dfreq.where(col("df") < hotDfCutoff)
    val scoredHot = tf.join(broadcast(hot), "term")
    val scoredCold = tf
      .join(broadcast(hot.select(col("term"))), Seq("term"), "left_anti")
      .join(cold, "term")
    val scored = scoredHot.union(scoredCold).crossJoin(broadcast(nDocs))
      .select(col("doc_id"), col("term"),
        ((col("tf") * col("n_docs")).cast("double") / col("df")).as("score"))
    scored
      .select(col("doc_id"), struct((-col("score")).as("ns"), col("term")).as("s"))
      .groupBy(col("doc_id"))
      .agg(graft.functions.Kernels.collect_bottom_k(col("s"), k).as("top"))
      .select(col("doc_id"), posexplode(col("top")).as(Seq("pos", "s")))
      .select(col("doc_id"), col("s").getField("term").as("term"),
        (-col("s").getField("ns")).as("score"),
        (col("pos") + 1).cast("long").as("rk"))
  }

  /** WITHIN-document repeated-line scrub — the boilerplate filter of
    * RefinedWeb/Dolma-class pipelines (navigation bars, cookie notices
    * and footers repeat VERBATIM inside a scraped page): every line
    * after its first exact occurrence is dropped, order otherwise
    * preserved. Complements [[SpanDedup]]/[[SpanIndex]], which remove
    * text repeated ACROSS documents.
    *
    * Output: (doc_id, cleaned, n_lines, n_kept) — the counts make the
    * scrub's effect measurable (and hash-visible to the oracle).
    *
    * Scale shape: one narrow codegen'd pass, ZERO exchange — the
    * first-occurrence filter is a higher-order `filter(!exists(slice))`
    * over the split array, O(lines²) per document of purely local work
    * (boilerplate pages have tens-to-hundreds of lines; no shuffle ever
    * sees the text).
    */
  def dedupLines(df: DataFrame, id: Column, text: Column,
                 sep: String = "\n"): DataFrame = {
    require(sep.nonEmpty, "dedupLines: separator must be non-empty")
    df.select(id.as("doc_id"),
        split(text, java.util.regex.Pattern.quote(sep)).as("__l"))
      .select(col("doc_id"), col("__l"),
        filter(col("__l"), (x, i) =>
          !exists(slice(col("__l"), lit(1), i), y => y === x)).as("__k"))
      .select(col("doc_id"),
        array_join(col("__k"), sep).as("cleaned"),
        size(col("__l")).cast("long").as("n_lines"),
        size(col("__k")).cast("long").as("n_kept"))
  }

  /** Token-distribution drift between two corpus versions, in EXACT
    * integer arithmetic — the data-versioning QA check before a training
    * run (a tokenizer change, a scrape-source shift, or a dedup bug
    * shows up here before it shows up in loss curves). Per token: its
    * counts `n_a`/`n_b` in each corpus and the cross-normalized movement
    * `move = |n_a·TB − n_b·TA|` (TA/TB = total tokens per side) — the
    * integer numerator of the total-variation term |n_a/TA − n_b/TB|
    * scaled by TA·TB, so Σ move / (2·TA·TB) IS the total-variation
    * distance and the per-token rows rank "which tokens moved most".
    *
    * Exactness: the products run in DECIMAL(38,0) — ~1e13 tokens per
    * side at 100 TB puts n·T near 1e26, past BIGINT but well inside 38
    * digits, and decimal arithmetic agrees bit-for-bit across engines
    * where a double would silently round (the SparkEntry parity rule).
    *
    * Scale shape: one narrow scan + partial-aggregated vocab count per
    * side; ONE vocab-keyed full-outer join of the two count frames
    * (vocab-sized, never corpus-sized); the two 1-row totals ride
    * broadcast cross joins. Tokens absent from a side count 0 there.
    */
  def tokenDrift(a: DataFrame, b: DataFrame,
                 textA: Column, textB: Column): DataFrame =
    tokenDriftCounts(vocabCounts(a, textA), vocabCounts(b, textB))

  /** Per-token corpus counts — [[tokenDrift]]'s count side, exposed so a
    * baseline can be computed ONCE and persisted (parquet), making the
    * drift check a standing monitor: each incoming batch pays one narrow
    * scan of itself plus a read of the (vocab-sized) baseline, never a
    * re-scan of the reference corpus — the same build-once/check-many
    * posture as the DedupIndex/SpanIndex/Bm25Index standing family.
    */
  def vocabCounts(df: DataFrame, text: Column): DataFrame =
    df.select(explode(tokens(text)).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("n"))

  /** [[tokenDrift]] over precomputed count frames (each `(token, n)`,
    * n > 0, token unique — [[vocabCounts]] output is; a duplicated token
    * would double-count through the join).
    */
  def tokenDriftCounts(ca: DataFrame, cb: DataFrame): DataFrame = {
    Seq(ca, cb).foreach { c =>
      require(c.columns.toSeq == Seq("token", "n"),
        s"tokenDriftCounts: expected (token, n) columns, got ${c.columns.mkString(",")}")
    }
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val a = ca.withColumnRenamed("n", "n_a")
    val b = cb.withColumnRenamed("n", "n_b")
    val ta = a.agg(coalesce(sum(col("n_a")), lit(0L)).cast(dec).as("__ta"))
    val tb = b.agg(coalesce(sum(col("n_b")), lit(0L)).cast(dec).as("__tb"))
    a.join(b, Seq("token"), "full_outer")
      .na.fill(0L, Seq("n_a", "n_b"))
      .crossJoin(broadcast(ta)).crossJoin(broadcast(tb))
      .select(col("token"), col("n_a"), col("n_b"),
        abs(col("n_a").cast(dec) * col("__tb") -
          col("n_b").cast(dec) * col("__ta")).cast(dec).as("move"))
  }
  /** Hashing-trick bag-of-words — the fixed-width featurizer every
    * streaming-scale text model front-ends with (a vocabulary-free
    * CountVectorizer): each token maps to bucket
    * `splitmix64(polyBase(token)) mod buckets` via the engine's
    * portable hash family (the q37/q38/q47 kernels — engine-exact,
    * DuckDB-replayable), and the doc's feature vector is the sparse
    * (bucket, count) multiset. No fitted vocabulary means no
    * build/broadcast/OOV problem at 100 TB — the trade is hash
    * collisions folding rare features together, bounded by `buckets`.
    *
    * Scale shape: one explode + one map-side-partial hash aggregate;
    * nothing corpus-sized exchanges beyond the (doc, bucket) grain.
    * Output: (id, bucket, cnt), token multiplicity preserved, empty
    * docs absent.
    */
  def hashedBow(df: DataFrame, id: Column, text: Column,
                buckets: Int = 1 << 18): DataFrame = {
    require(buckets >= 2 && (buckets & (buckets - 1)) == 0,
      s"hashedBow: buckets must be a power of two (2^64 mod buckets = 0 " +
        s"keeps the signed/unsigned bucket arithmetic engine-exact), got $buckets")
    df.select(id.as("id"), explode(tokens(text)).as("__tok"))
      .where(length(col("__tok")) > 0)
      // single-element minhash signature == splitmix64(polyBase(tok)):
      // the Column-level kernel, reused rather than re-derived (the
      // SQL-name route needs the extension-registered session; the
      // Column form works everywhere)
      .withColumn("bucket",
        pmod(element_at(
          graft.functions.Kernels.minhash_signature(array(col("__tok")), 1), 1),
          lit(buckets.toLong)))
      .groupBy(col("id"), col("bucket"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** χ²-discriminative tokens per class — the classic feature-selection
    * pass behind fastText-style quality/domain classifiers (Yang &
    * Pedersen '97): for each (token, label) the 2×2 presence
    * contingency table
    *
    *   O11 = docs with token & label     O10 = docs with token, other label
    *   O01 = label docs without token    O00 = neither
    *
    * scores χ² = N·(O11·O00 − O10·O01)² / (r·(N−r)·c·(N−c)) with
    * r = O11+O10 (token docs) and c = O11+O01 (label docs). All-integer
    * rational → the ⌊10⁶·χ²⌋ floor computes EXACTLY in decimal(38,0)
    * (the numerator is non-negative, so subtract-pmod-then-divide and
    * truncating division agree). Only POSITIVE associations rank
    * (O11·O00 > O10·O01): "tokens characteristic OF the class", the
    * feature-selection direction — which also means absent (token,
    * label) cells (O11 = 0, never positive) drop before scoring, so
    * the frame never materializes the token×label cross product.
    *
    * Scale shape: one (doc, token) explode → ONE (token, label) hash
    * aggregate (map-side partial) → a token-sized re-aggregate for row
    * totals; label totals ride a broadcast and N is their sum (AQE
    * reuses the label exchange — no extra corpus scan). The final
    * top-k window runs over the token-vocabulary frame, never docs.
    * Exactness envelope: the ppm numerator is N·diff²·10⁶ with
    * diff = O11·O00 − O10·O01, and |diff| can reach N²/4, so
    * decimal(38,0) holds it only while N·diff² ≤ 10³² — guaranteed
    * for any data at N ≤ ~4.3·10⁶ docs, and far beyond that for the
    * realistic regime (|diff| ≈ N·O11 for rare tokens). A cell past
    * the envelope raises in-plan (conservative 10× double-prefilter
    * margin) instead of silently NULLing the STRONGEST discriminators
    * out of the ranking — shard by label or sample before scoring.
    *
    * Output: (label, token, n_docs = O11, chi2_ppm, rnk) for the
    * `topK` highest-χ² positively-associated tokens per label seen in
    * ≥ `minDocs` docs (ties broken by token — fully deterministic).
    */
  def chiSquareTokens(df: DataFrame, id: Column, text: Column, label: Column,
                      topK: Int, minDocs: Long = 2L): DataFrame =
    chiSquareFromCounts(presenceCounts(df, text, label),
      labelCounts(df, label), topK, minDocs)

  /** The (token, label, n_docs) presence increment of one frame — the
    * shared per-batch aggregate behind [[chiSquareTokens]] and its
    * standing-store fold (ONE definition, so the one-shot and the
    * continuously-folded twin can never drift).
    */
  def presenceCounts(df: DataFrame, text: Column, label: Column): DataFrame =
    df.select(label.as("label"),
        explode(array_distinct(tokens(text))).as("token"))
      .groupBy(col("token"), col("label")).agg(count(lit(1)).as("n_docs"))

  /** The (label, n) doc-total increment of one frame — [[presenceCounts]]'
    * companion (NULL labels form their own group, so Σn = N exactly).
    */
  def labelCounts(df: DataFrame, label: Column): DataFrame =
    df.groupBy(label.as("label")).agg(count(lit(1)).as("n"))

  /** [[chiSquareTokens]] scored from PRE-AGGREGATED counts — the
    * standing-store form: `counts` is the (token, label, n_docs)
    * presence frame and `labelTotals` the (label, n) doc totals, both
    * additive under union-sum, so a continuously-folded store pair
    * (one atomic Catalog ingest — the two stores can never tear apart)
    * scores at any moment exactly as the one-shot scan would. Inputs
    * are re-aggregated defensively (vocabulary-sized, one small
    * exchange), so a frame of unioned PARTIAL increments scores
    * correctly too — duplicate keys can never split a contingency
    * cell or duplicate a ranked row.
    */
  def chiSquareFromCounts(counts: DataFrame, labelTotals: DataFrame,
                          topK: Int, minDocs: Long = 2L): DataFrame = {
    require(topK >= 1, s"chiSquareFromCounts: topK must be >= 1, got $topK")
    require(minDocs >= 1, s"chiSquareFromCounts: minDocs must be >= 1, got $minDocs")
    def d(c: Column) = c.cast("decimal(38,0)")
    val c1 = counts.groupBy(col("token"), col("label"))
      .agg(sum(col("n_docs")).as("n_docs"))
    val r = c1.groupBy(col("token")).agg(sum(col("n_docs")).as("__r"))
    val nl = labelTotals.groupBy(col("label")).agg(sum(col("n")).as("__c"))
    // N = Σ label counts (NULL labels form their own group, so the sum
    // is exact) — rides nl's exchange instead of a third corpus scan
    val tot = nl.agg(sum(col("__c")).as("__N"))
    // LEFT join + loud guard (r14 advisor finding): an inner join would
    // silently DROP a (token, label) cell whose label is missing from
    // labelTotals, and a lagging totals store would let O01 = __c −
    // n_docs go negative undetected — a torn or mismatched store pair
    // must fail, not under-report. Consistent pairs (the documented
    // contract, enforced by the atomic Catalog ingest) are untouched.
    val cells = c1.join(r, Seq("token"))
      .join(broadcast(nl), Seq("label"), "left")
      .withColumn("__c", when(col("__c").isNull || col("__c") < col("n_docs"),
        raise_error(concat(
          lit("chiSquareFromCounts: counts/labelTotals disagree at label "),
          coalesce(col("label").cast("string"), lit("NULL")),
          lit(" (missing or smaller-than-cell total) — the store pair is "),
          lit("torn or mismatched; re-ingest atomically"))))
        .otherwise(col("__c")))
      .crossJoin(broadcast(tot))
      .where(col("__r") >= minDocs && col("__r") < col("__N") &&
        col("__c") < col("__N"))
    val o11 = d(col("n_docs"))
    val o10 = d(col("__r")) - o11
    val o01 = d(col("__c")) - o11
    val o00 = d(col("__N")) - d(col("__r")) - d(col("__c")) + o11
    val diff = o11 * o00 - o10 * o01
    val num = d(col("__N")) * diff * diff * lit(1000000L)
    val den = d(col("__r")) * (d(col("__N")) - d(col("__r"))) *
      d(col("__c")) * (d(col("__N")) - d(col("__c")))
    // overflow fence: num stays inside decimal(38,0) iff N·diff² ≤ 10³²;
    // the double prefilter keeps a 10× margin so fp error can't admit an
    // overflowing cell — past it, raise rather than rank a NULL
    val safe = abs(diff.cast("double")) <=
      sqrt(lit(1.0e31) / col("__N").cast("double"))
    val scored = cells.where(diff > 0)
      .withColumn("chi2_ppm",
        when(safe, ((num - pmod(num, den)) / den).cast("long"))
          .otherwise(raise_error(concat(
            lit("chiSquareFromCounts: contingency past the decimal(38,0) "),
            lit("exactness envelope (N·diff² > ~10³¹) — shard by label "),
            lit("or sample before scoring; N="), col("__N").cast("string")))))
    val w = Window.partitionBy(col("label"))
      .orderBy(col("chi2_ppm").desc, col("token").asc)
    scored.withColumn("rnk", row_number().over(w).cast("long"))
      .where(col("rnk") <= topK)
      .select(col("label"), col("token"), col("n_docs"),
        col("chi2_ppm"), col("rnk"))
  }
}
