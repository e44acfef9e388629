package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Edit-distance joins over string dictionaries — typo-tolerant vocab
  * matching, entity-name linkage, near-miss detection in token sets —
  * WITHOUT the all-pairs cross join.
  *
  * Candidate generation is the deletion-neighborhood scheme (FastSS /
  * SymSpell): levenshtein(a, b) ≤ k implies the k-deletion
  * neighborhoods U_k(a) and U_k(b) intersect (delete the ≤ k edited
  * positions of each side's alignment and both collapse to the common
  * core), so an equi-join on emitted variants finds every true pair.
  * The neighborhood can also collide for pairs at distance > k
  * ("abcabd" vs …), so every candidate passes an exact
  * `levenshtein ≤ k` verify — exact output, no false positives.
  *
  * Scale shape: each distinct string of length L emits O(L^k) variants
  * (≤ 1 + L for k = 1; ≤ 1 + L + L·(L−1)/2 for k = 2) — dictionary-
  * sized work that replaces a |V|² cross join with |V|·O(L^k) rows
  * hashed on variant, then per-bucket pairs. The operator works on the
  * DISTINCT string level by design (join ids back by string equality);
  * `maxLen` fail-fasts on strings long enough to blow the variant
  * count (edit distance on long strings wants q-gram filtering, a
  * different operator). Very short strings all share the low-length
  * variants (the empty string buckets every ≤ k-length word) — those
  * buckets are as small as the short-word dictionary itself, and every
  * pair they form is within distance k anyway.
  *
  * Reference scope: the reference has no similarity-join surface; this
  * extends the dedup/linkage family ([[Dedup]] MinHash, [[SpanDedup]])
  * with the character-level axis.
  */
object Fuzzy {

  /** One-deletion variants of `s` (without `s` itself); empty array for
    * the empty string (Spark's `sequence(1, 0)` DESCENDS, so the empty
    * case must short-circuit).
    */
  private def del1(s: Column): Column =
    when(length(s) === 0, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(1), length(s)),
        i => concat(substr(s, lit(1), i - 1), substr(s, i + 1, length(s)))))

  /** The k-deletion neighborhood U_k(s), including s itself. */
  private[ops] def neighborhood(s: Column, k: Int): Column = k match {
    case 1 => array_union(array(s), del1(s))
    case 2 => array_distinct(flatten(transform(
      array_union(array(s), del1(s)),
      v => array_union(array(v), del1(v)))))
    case _ => throw new IllegalArgumentException(
      s"fuzzy: maxDistance must be 1 or 2, got $k")
  }

  // distinct strings of one side, exploded to (variant, str); overlong
  // strings fail loudly in the projection (a filter-side raise_error
  // can be predicate-pushed past joins — SparkEntry convention)
  private def side(df: DataFrame, str: Column, as: String, k: Int,
                   maxLen: Int): DataFrame =
    df.select(str.cast("string").as(as)).where(col(as).isNotNull).distinct()
      .select(col(as), explode(neighborhood(
        when(length(col(as)) > maxLen,
          raise_error(concat(lit(s"fuzzy: string longer than maxLen=$maxLen " +
            "(variant count would explode; use q-gram filtering for long " +
            "strings): "), col(as))))
          .otherwise(col(as)), k)).as("__v"))

  private def verify(cands: DataFrame, k: Int): DataFrame =
    cands.distinct()
      .where(abs(length(col("a")) - length(col("b"))) <= k)
      .withColumn("dist", levenshtein(col("a"), col("b")).cast("long"))
      .where(col("dist") <= k)

  /** All distinct string pairs (a from `left`, b from `right`) with
    * levenshtein(a, b) ≤ maxDistance (1 or 2). Output (a, b, dist).
    */
  def editJoin(left: DataFrame, lstr: Column, right: DataFrame, rstr: Column,
               maxDistance: Int, maxLen: Int = 64): DataFrame =
    verify(
      side(left, lstr, "a", maxDistance, maxLen)
        .join(side(right, rstr, "b", maxDistance, maxLen), Seq("__v"))
        .select(col("a"), col("b")),
      maxDistance)

  /** Within-dictionary pairs: levenshtein ≤ maxDistance, a < b (each
    * unordered pair once). Output (a, b, dist).
    */
  def editSelfJoin(df: DataFrame, str: Column, maxDistance: Int,
                   maxLen: Int = 64): DataFrame = {
    val s = side(df, str, "a", maxDistance, maxLen)
    verify(
      s.join(s.select(col("a").as("b"), col("__v")), Seq("__v"))
        .where(col("a") < col("b"))
        .select(col("a"), col("b")),
      maxDistance)
  }
}
