package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Benchmark decontamination for training corpora (north-star extension —
  * no analogue in the reference): flag training documents that CONTAIN a
  * benchmark/eval document's n-grams, so eval data can be scrubbed from
  * the training set. Distinct from near-dup detection: the score is
  * asymmetric containment |sh(train) ∩ sh(bench)| / |sh(bench)| — a long
  * training document that embeds a short benchmark item whole scores 1.0
  * even though their symmetric Jaccard is tiny.
  *
  * Scale shape: benchmarks are small by nature, so the exploded benchmark
  * shingles BROADCAST; the training side streams through one narrow
  * scan+shingle+explode into a broadcast hash join, and the per-(train,
  * bench) match counts partial-aggregate before the only shuffle. The
  * 100 TB cost is one training-corpus pass — no self-join, no corpus
  * shuffle.
  */
object Decontamination {

  /** (train_id, bench_id, containment) for every pair with containment
    * >= threshold. Shingle sets are distinct word n-grams
    * ([[Dedup.shingles]]); documents too short to shingle are skipped.
    */
  def containmentPairs(train: DataFrame, trainId: Column, trainText: Column,
                       bench: DataFrame, benchId: Column, benchText: Column,
                       n: Int = 3, threshold: Double = 0.5): DataFrame = {
    val tx = train
      .select(trainId.as("train_id"), Dedup.shingles(trainText, n).as("tsh"))
      .where(size(col("tsh")) > 0)
      .select(col("train_id"), explode(col("tsh")).as("sh"))
    val bx = bench
      .select(benchId.as("bench_id"), Dedup.shingles(benchText, n).as("bsh"))
      .where(size(col("bsh")) > 0)
      .select(col("bench_id"), size(col("bsh")).as("nb"), explode(col("bsh")).as("sh"))
    tx.join(broadcast(bx), "sh")
      .groupBy(col("train_id"), col("bench_id"), col("nb"))
      .agg(count(lit(1)).as("matched"))
      .select(col("train_id"), col("bench_id"),
        (col("matched").cast("double") / col("nb")).as("containment"))
      .where(col("containment") >= threshold)
  }

  /** Continuous decontamination: [[containmentPairs]] per micro-batch of
    * INCOMING training documents against a standing benchmark set — the
    * admission-control shape (screen a crawl batch before it enters the
    * corpus), completing the streaming screeners next to
    * [[DedupIndex.screenStream]] / [[SpanIndex.screenStream]] /
    * [[CosineIndex.screenStream]]. `bench` is a batch frame re-evaluated
    * per trigger, so growing the benchmark suite between batches is
    * picked up; `onBatch` must be idempotent under replay (Spark replays
    * micro-batches on failure). Per batch: bench shingles broadcast, one
    * narrow pass over the batch — nothing corpus-sized moves.
    */
  def screenStream(stream: DataFrame, trainId: Column, trainText: Column,
                   bench: DataFrame, benchId: Column, benchText: Column,
                   n: Int = 3, threshold: Double = 0.5)
                  (onBatch: DataFrame => Unit): org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        onBatch(containmentPairs(batch, trainId, trainText,
          bench, benchId, benchText, n, threshold))
      }
      .start()

  /** The scrub itself: training rows with no flagged benchmark overlap.
    * No broadcast hint on the flagged set: its size scales with how
    * contaminated the CORPUS is (not with the small bench side), so a low
    * threshold or a dirty corpus could make a forced broadcast O(train)
    * and kill the driver — AQE broadcasts it at runtime iff it measures
    * small, and the anti join degrades gracefully to shuffle otherwise.
    */
  def scrub(train: DataFrame, trainId: Column, trainText: Column,
            bench: DataFrame, benchId: Column, benchText: Column,
            n: Int = 3, threshold: Double = 0.5): DataFrame = {
    val flagged = containmentPairs(train, trainId, trainText,
        bench, benchId, benchText, n, threshold)
      .select(col("train_id")).distinct()
    train.join(flagged, trainId === flagged("train_id"), "left_anti")
  }
}
