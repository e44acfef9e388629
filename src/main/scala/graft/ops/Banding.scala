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
}
