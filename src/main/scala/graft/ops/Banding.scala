package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The shared candidates-then-verify tail of every LSH dedup operator
  * (direct MinHash, direct hyperplane, and both standing indexes —
  * previously four byte-similar copies). The scale contract lives here
  * once: the candidate self-join exchanges (band, bucket, id) triples
  * only; payloads (shingle sets / vectors) are fetched for the rare
  * candidates behind a broadcast semi-filter, never shuffled
  * corpus-wide. PlanQualitySpec asserts these properties on q37.
  */
private[ops] object Banding {

  /** Distinct candidate pairs (id_a < id_b) from a (band, bucket, id)
    * frame: two rows collide iff they share a bucket in some band.
    */
  def candidatePairs(banded: DataFrame): DataFrame =
    banded.as("l").join(banded.as("r"),
        col("l.band") === col("r.band") && col("l.bucket") === col("r.bucket") &&
          col("l.id") < col("r.id"))
      .select(col("l.id").as("id_a"), col("r.id").as("id_b"))
      .distinct()

  /** Candidate pairs ACROSS two banded frames (id_a from `bandedA`, id_b
    * from `bandedB`): a cross pair collides iff it shares a bucket in some
    * band. No `id <` constraint — the two id spaces are separate corpora,
    * so every (a, b) orientation is meaningful exactly once.
    */
  def candidatePairsAcross(bandedA: DataFrame, bandedB: DataFrame): DataFrame =
    bandedA.as("l").join(bandedB.as("r"),
        col("l.band") === col("r.band") && col("l.bucket") === col("r.bucket"))
      .select(col("l.id").as("id_a"), col("r.id").as("id_b"))
      .distinct()

  /** Verify candidates with an exact score over payloads from `payload`
    * ((id, p) rows — lazily projected, so Catalyst's semi-join pushdown
    * computes p only for rows surviving the candidate-id filter).
    * Returns (id_a, id_b, <scoreName>) with score >= threshold.
    */
  def verifyPairs(cand: DataFrame, payload: DataFrame,
                  score: (Column, Column) => Column, scoreName: String,
                  threshold: Double): DataFrame = {
    val candIds = cand
      .select(explode(array(col("id_a"), col("id_b"))).as("id"))
      .distinct()
    val fetched = payload.join(broadcast(candIds), Seq("id"), "left_semi")
    cand
      .join(fetched.select(col("id").as("id_a"), col("p").as("pa")), "id_a")
      .join(fetched.select(col("id").as("id_b"), col("p").as("pb")), "id_b")
      .select(col("id_a"), col("id_b"), score(col("pa"), col("pb")).as(scoreName))
      .where(col(scoreName) >= threshold)
  }

  /** Two-corpus [[verifyPairs]]: each side's payload comes from its own
    * frame, each behind its own broadcast candidate-id semi-filter — the
    * same "fetch payloads only for candidates" contract per corpus.
    */
  def verifyPairsAcross(cand: DataFrame,
                        payloadA: DataFrame, payloadB: DataFrame,
                        score: (Column, Column) => Column, scoreName: String,
                        threshold: Double): DataFrame = {
    val fa = payloadA.join(
      broadcast(cand.select(col("id_a").as("id")).distinct()), Seq("id"), "left_semi")
    val fb = payloadB.join(
      broadcast(cand.select(col("id_b").as("id")).distinct()), Seq("id"), "left_semi")
    cand
      .join(fa.select(col("id").as("id_a"), col("p").as("pa")), "id_a")
      .join(fb.select(col("id").as("id_b"), col("p").as("pb")), "id_b")
      .select(col("id_a"), col("id_b"), score(col("pa"), col("pb")).as(scoreName))
      .where(col(scoreName) >= threshold)
  }
}
