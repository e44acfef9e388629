package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer TRAINING over a corpus (Sennrich et al.
  * '16) — the "train a BPE vocab on your data" step of building a
  * training pipeline (north-star extension; complements the BPE-ish regex
  * token COUNTING already in [[TextAnalysis]]).
  *
  * Distributed the way production BPE trainers are: the corpus is scanned
  * ONCE into a (word, freq) vocabulary table — at 100 TB that is the only
  * corpus-sized pass — and every merge iteration runs over the VOCAB
  * (pair counts = vocab-sized partial-aggregated groupBy; applying the
  * chosen merge = a narrow fold over each word's own symbol array, a pure
  * Catalyst `aggregate` expression, no UDF). One single-row collect per
  * iteration picks the winning pair (like the clustering loop's
  * convergence probe); ties break lexicographically so training is
  * deterministic across runs, partitionings, and engines.
  */
object Bpe {

  /** Initial symbol sequence of a word: its characters plus the
    * end-of-word marker. Symbols live in string space (the standard BPE
    * representation): initial symbols are single characters, so merged
    * multi-char symbols can only collide with the same merge — except a
    * corpus whose words contain the literal characters `<`, `/`, `w`,
    * `>` could in principle merge them into the `</w>` marker string
    * (the shared edge of every string-space BPE implementation).
    */
  private[ops] def initialSymbols(word: Column): Column =
    concat(split(word, ""), array(lit("</w>")))

  /** Adjacent symbol pairs of a symbol array, as (l, r) structs. */
  private def pairsOf(syms: Column): Column =
    transform(sequence(lit(0), size(syms) - 2), i =>
      struct(element_at(syms, i + 1).as("l"), element_at(syms, i + 2).as("r")))

  /** The corpus-sized pass: lowercased whitespace words with their
    * frequencies. Everything after this runs on the vocab.
    */
  def wordFreq(df: DataFrame, text: Column): DataFrame =
    df.select(explode(Stateless.tokens(text)).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))

  /** Frequency of each adjacent symbol pair over a (syms, freq) vocab
    * frame: explode pairs, weight by word frequency, partial-agg by pair.
    */
  private def pairCountsOf(vocab: DataFrame): DataFrame =
    vocab.select(explode(pairsOf(col("syms"))).as("p"), col("freq"))
      .groupBy(col("p.l").as("l"), col("p.r").as("r"))
      .agg(sum(col("freq")).as("cnt"))

  /** First-round pair counts straight from a corpus (the oracle-checkable
    * unit of the trainer): every adjacent (symbol, symbol) pair of the
    * initial character+marker decomposition, weighted by occurrence.
    */
  def pairCounts(df: DataFrame, text: Column): DataFrame =
    pairCountsOf(wordFreq(df, text)
      .select(initialSymbols(col("word")).as("syms"), col("freq")))

  /** Apply ONE merge (a, b) -> "ab" to a symbol array, greedy
    * left-to-right, non-overlapping — a pure `aggregate` fold carrying
    * (emitted, pending) so e.g. "aaa" under (a,a) becomes ["aa", "a"].
    */
  private[ops] def mergePair(syms: Column, a: String, b: String): Column = {
    val zero = struct(
      array().cast("array<string>").as("out"),
      lit(null).cast("string").as("pend"))
    val step = (acc: Column, s: Column) => {
      val out = acc.getField("out"); val pend = acc.getField("pend")
      when(pend.isNull, struct(out.as("out"), s.as("pend")))
        .when(pend === a && s === b,
          struct(concat(out, array(lit(a + b))).as("out"),
            lit(null).cast("string").as("pend")))
        .otherwise(struct(concat(out, array(pend)).as("out"), s.as("pend")))
    }
    val fin = (acc: Column) =>
      when(acc.getField("pend").isNull, acc.getField("out"))
        .otherwise(concat(acc.getField("out"), array(acc.getField("pend"))))
    aggregate(syms, zero, step, fin)
  }

  /** Train `numMerges` BPE merges. Returns the ordered merge list
    * ((left, right) pairs, highest-frequency first; ties lexicographic).
    * The corpus is scanned once ([[wordFreq]]); each iteration costs one
    * vocab-sized aggregate + one narrow vocab rewrite + one single-row
    * collect. The evolving vocab is localCheckpointed every few rounds to
    * truncate the growing fold lineage (the clustering-loop pattern).
    * Stops early when no pair occurs at least `minFreq` times.
    */
  def trainMerges(df: DataFrame, text: Column, numMerges: Int,
                  minFreq: Long = 2L): Seq[(String, String)] = {
    require(numMerges > 0, "numMerges must be positive")
    var vocab = wordFreq(df, text)
      .select(initialSymbols(col("word")).as("syms"), col("freq"))
      .localCheckpoint()
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var round = 0
    while (round < numMerges) {
      val top = pairCountsOf(vocab)
        .where(col("cnt") >= minFreq)
        .orderBy(col("cnt").desc, col("l"), col("r"))
        .limit(1).collect()
      if (top.isEmpty) round = numMerges
      else {
        val (a, b) = (top(0).getString(0), top(0).getString(1))
        merges += ((a, b))
        vocab = vocab.select(mergePair(col("syms"), a, b).as("syms"), col("freq"))
        round += 1
        if (round % 8 == 0) vocab = vocab.localCheckpoint()
      }
    }
    merges.toSeq
  }

  /** Tokenize words with a trained merge list: each word's initial
    * symbols folded through the merges in training order — the same pure
    * expression chain as training, so encoding stays codegen-eligible
    * (merge lists are short; each merge is one narrow array fold).
    * Returns the symbol array column for a word column.
    */
  def encodeWord(word: Column, merges: Seq[(String, String)]): Column =
    merges.foldLeft(initialSymbols(word)) { case (syms, (a, b)) =>
      mergePair(syms, a, b)
    }
}
