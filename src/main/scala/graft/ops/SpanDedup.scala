package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Substring-level (span) deduplication: find token spans that recur
  * ACROSS documents and optionally scrub every occurrence but the first —
  * the exact-substring dedup used on large training corpora (Lee et al.
  * 2021, "Deduplicating Training Data Makes Language Models Better"),
  * where document-level near-dup ([[Dedup.minhashLsh]]) misses boilerplate
  * and quotations repeated inside otherwise-distinct documents. The
  * reference has no analogue (its only dedup is the keyed-process example,
  * reference: examples/stateful_deduplication.py:18-49); this is part of
  * the LLM-data-pipeline extension surface.
  *
  * Algorithm (the scalable stand-in for a suffix array): every n-token
  * window is fingerprinted (md5 of the space-joined gram — engine-portable,
  * q51's determinism rule), a gram is "duplicated" when it appears in >=
  * `minDocs` distinct documents, and runs of overlapping duplicated grams
  * merge into maximal spans. A span of m >= n shared tokens is covered by
  * m-n+1 shared n-grams, so merged spans recover every maximal shared
  * substring of length >= n exactly.
  *
  * Scale shape:
  *  - the gram exchange carries (gram md5, id, pos) triples only — 32+16
  *    bytes per token regardless of gram length; document text NEVER enters
  *    a shuffle (PlanQualitySpec-asserted, same contract as the LSH
  *    banding exchange).
  *  - the duplicated-gram set comes from one partial-aggregated groupBy on
  *    the gram key; the probe side re-uses the same exchange (AQE
  *    ReusedExchange, as in q37).
  *  - span merging is a per-document window over HIT positions only
  *    (bounded by the document's own token count), never a corpus-wide
  *    sort.
  *  - scrubbing rejoins the merged (id, start, end) spans — three longs
  *    per span — against the corpus; the token filter is a narrow
  *    higher-order expression over each document's own token array.
  */
object SpanDedup {

  /** One row per n-token window: (id, pos, gram) where gram is the md5 hex
    * of the space-joined window. Documents shorter than n tokens emit
    * nothing.
    */
  private[ops] def grams(df: DataFrame, id: Column, text: Column, n: Int): DataFrame =
    df.select(id.as("id"), Stateless.tokens(text).as("toks"))
      .where(size(col("toks")) >= n)
      .select(col("id"), explode(
        transform(sequence(lit(0), size(col("toks")) - n), i =>
          struct(i.cast("long").as("pos"),
            md5(array_join(slice(col("toks"), i + 1, lit(n)), " ")).as("gram")))).as("g"))
      .select(col("g.gram").as("gram"), col("id"), col("g.pos").as("pos"))

  /** Merge overlapping/adjacent fixed-length-n hit positions into maximal
    * spans. Two hits p <= q chain iff q <= p + n (their [p, p+n) windows
    * overlap or touch). Output: (doc_id, span_start, span_end,
    * n_span_tokens) with end exclusive.
    */
  private[ops] def mergeSpans(hits: DataFrame, n: Int): DataFrame = {
    val w = Window.partitionBy(col("id")).orderBy(col("pos"))
    hits
      .withColumn("brk",
        when(col("pos") <= lag(col("pos"), 1).over(w) + n, 0).otherwise(1))
      .withColumn("grp", sum(col("brk")).over(w))
      .groupBy(col("id"), col("grp"))
      .agg(min(col("pos")).as("span_start"), (max(col("pos")) + n).as("span_end"))
      .select(col("id").as("doc_id"), col("span_start"), col("span_end"),
        (col("span_end") - col("span_start")).as("n_span_tokens"))
  }

  /** Maximal token spans duplicated across >= minDocs distinct documents.
    * Output: (doc_id, span_start, span_end, n_span_tokens), end exclusive,
    * positions 0-based over the lowercased whitespace tokens.
    */
  def duplicateSpans(df: DataFrame, id: Column, text: Column,
                     n: Int = 8, minDocs: Int = 2): DataFrame = {
    require(n > 0, "gram length n must be positive")
    require(minDocs >= 2, "a span duplicated across < 2 docs is not a duplicate")
    duplicateSpansFromGrams(grams(df, id, text, n), n, minDocs)
  }

  /** Detection over an existing (gram, id, pos) frame — shared by the
    * direct form above (grams derived from text, which the two branches
    * compute twice: both are narrow passes, and at standing-corpus scale
    * [[SpanIndex.dupSpans]] reads stored grams instead of re-tokenizing)
    * and the index-backed form. At the default minDocs = 2 the duplicated
    * test is min(id) != max(id) — a plain partial aggregate, no
    * count-distinct expand.
    */
  private[ops] def duplicateSpansFromGrams(g: DataFrame, n: Int, minDocs: Int): DataFrame = {
    val dup =
      if (minDocs == 2)
        g.groupBy(col("gram"))
          .agg(min(col("id")).as("i0"), max(col("id")).as("i1"))
          .where(col("i0") =!= col("i1"))
          .select(col("gram"))
      else
        g.groupBy(col("gram"))
          .agg(count_distinct(col("id")).as("n_docs"))
          .where(col("n_docs") >= minDocs)
          .select(col("gram"))
    mergeSpans(g.join(dup, "gram").select(col("id"), col("pos")), n)
  }

  /** Keep-first substring scrub: every duplicated gram occurrence except
    * the canonical first one (lexicographic min (id, pos) across the
    * corpus — deterministic under any partitioning) is marked for removal;
    * removal hits merge into maximal spans per document, and each
    * document's text is rebuilt from the tokens outside its removal spans.
    * A document that duplicates an earlier document entirely scrubs to the
    * empty string; the canonical copy keeps every token (unless one of its
    * OTHER grams is a non-canonical occurrence of a span first seen
    * elsewhere).
    *
    * Output: (doc_id, n_tokens, n_removed, scrubbed_text) for EVERY input
    * document (untouched documents pass through with n_removed = 0).
    */
  def scrubDuplicateSpans(df: DataFrame, id: Column, text: Column,
                          n: Int = 8, minDocs: Int = 2): DataFrame = {
    require(n > 0, "gram length n must be positive")
    require(minDocs >= 2, "a span duplicated across < 2 docs is not a duplicate")
    val g = grams(df, id, text, n)
    // canonical occurrence per duplicated gram = lexicographic min (id,
    // pos); at minDocs = 2 the duplicated test is the plain min/max
    // aggregate (no count-distinct expand), as in duplicateSpansFromGrams
    val dup =
      if (minDocs == 2)
        g.groupBy(col("gram"))
          .agg(min(col("id")).as("i0"), max(col("id")).as("i1"),
            min(struct(col("id"), col("pos"))).as("keep"))
          .where(col("i0") =!= col("i1"))
          .select(col("gram"), col("keep"))
      else
        g.groupBy(col("gram"))
          .agg(count_distinct(col("id")).as("n_docs"),
            min(struct(col("id"), col("pos"))).as("keep"))
          .where(col("n_docs") >= minDocs)
          .select(col("gram"), col("keep"))
    val removedHits = g.join(dup, "gram")
      .where(!(col("id") === col("keep.id") && col("pos") === col("keep.pos")))
      .select(col("id"), col("pos"))
    rebuildOutsideSpans(df, id, text, mergeSpans(removedHits, n))
  }

  /** Rebuild each document's text from the tokens OUTSIDE its removal
    * spans — the text-rewriting tail shared by [[scrubDuplicateSpans]]
    * (spans from within-corpus keep-first dedup) and
    * [[SpanIndex.scrub]] (spans from a standing index screen). `spans`
    * is (doc_id, span_start, span_end, …) with end exclusive over the
    * doc's 0-based lowercased whitespace tokens; spans for one doc must
    * not overlap (both producers emit merged maximal spans). Every input
    * document appears in the output; docs without spans pass through.
    *
    * Scale: the spans frame carries three longs per merged span — AQE
    * broadcasts it when small; when duplication volume is large the
    * id-keyed join shuffles the corpus once, which any text-rewriting
    * scrub pays (the output IS new text). No forced broadcast (the
    * flagged-set-size lesson from Decontamination.scrub). The token
    * filter itself is a narrow indexed higher-order expression over each
    * document's own token array.
    */
  def rebuildOutsideSpans(df: DataFrame, id: Column, text: Column,
                          spanFrame: DataFrame): DataFrame = {
    val spans = spanFrame
      .groupBy(col("doc_id"))
      .agg(collect_list(struct(col("span_start"), col("span_end"))).as("spans"),
        sum(col("span_end") - col("span_start")).as("n_removed"))
    // null text hardens to zero tokens / empty scrub (not null-propagated
    // output rows) — same contract as the other corpus ops
    val base = df.select(id.as("doc_id"),
      coalesce(Stateless.tokens(text), lit(Array.empty[String])).as("toks"))
    base.join(spans, Seq("doc_id"), "left")
      .select(col("doc_id"), size(col("toks")).cast("long").as("n_tokens"),
        coalesce(col("n_removed"), lit(0L)).as("n_removed"),
        when(col("spans").isNull, array_join(col("toks"), " "))
          .otherwise(array_join(
            filter(col("toks"), (t, i) =>
              !exists(col("spans"), s =>
                i.cast("long") >= s.getField("span_start") &&
                  i.cast("long") < s.getField("span_end"))),
            " ")).as("scrubbed_text"))
  }
}
