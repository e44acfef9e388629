package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Structured Streaming operator recipes — the streaming half of each
  * reference operator. Batch/streaming share the same logical ops
  * (graft.ops); what streaming adds is watermarking (firing + state
  * eviction) and output-mode choices, which is exactly the part of the
  * reference implemented by hand (watermark generators
  * common/watermarks.py:60-126, window firing stateful.py:198-247, join
  * buffer eviction stateful.py:415-448) and native in Spark.
  */
object StreamOps {

  /** BoundedOutOfOrdernessWatermarkGenerator (reference:
    * common/watermarks.py:60-85 — wm = max_seen_ts - maxOutOfOrderness,
    * default 5000 ms via Config.WATERMARK_MAX_OUT_OF_ORDERNESS_MS). Spark's
    * `withWatermark` computes the identical bound per partition.
    */
  def withBoundedOutOfOrderness(df: DataFrame, tsCol: String, delay: String = "5 seconds"): DataFrame =
    df.withWatermark(tsCol, delay)

  /** WindowOperator fire-on-watermark (reference: stateful.py:198-247):
    * watermarked tumbling/sliding window aggregation in append mode —
    * each window emits once, when the watermark passes window.end; rows
    * later than the watermark are dropped (reference would re-fire the
    * window — documented divergence, SURVEY §7.4.1).
    */
  def windowedAgg(df: DataFrame, tsCol: String, delay: String,
                  size: String, slide: Option[String],
                  keys: Seq[Column], aggs: Seq[Column]): DataFrame = {
    val win = slide.fold(window(col(tsCol), size))(sl => window(col(tsCol), size, sl))
    df.withWatermark(tsCol, delay)
      .groupBy(win +: keys: _*)
      .agg(aggs.head, aggs.tail: _*)
  }

  /** Session windows (documented-but-missing in the reference,
    * docs/api_reference.md:257-261).
    */
  def sessionAgg(df: DataFrame, tsCol: String, delay: String, gap: String,
                 keys: Seq[Column], aggs: Seq[Column]): DataFrame =
    df.withWatermark(tsCol, delay)
      .groupBy(session_window(col(tsCol), gap) +: keys: _*)
      .agg(aggs.head, aggs.tail: _*)

  /** AggregateOperator (reference: stateful.py:265-342): unwindowed running
    * per-key aggregate that emits the refreshed value after each input —
    * a changelog stream. Run the returned frame with
    * `outputMode("update")`: Spark emits exactly the changed key rows per
    * micro-batch, which is the reference's per-record emission batched.
    * State never expires, like the reference — at 100 TB bound the key
    * domain or add a window.
    */
  def runningAgg(df: DataFrame, keys: Seq[Column], aggs: Seq[Column]): DataFrame =
    df.groupBy(keys: _*).agg(aggs.head, aggs.tail: _*)

  /** Streaming dedup — the *intended* semantics of the reference's
    * deduplication example (examples/stateful_deduplication.py:18-49; its
    * actual operator never persists state, SURVEY §2.7). State is evicted
    * by watermark: duplicates arriving within the delay are dropped.
    */
  def dedup(df: DataFrame, tsCol: String, delay: String, idCols: Seq[String]): DataFrame =
    df.withWatermark(tsCol, delay)
      .dropDuplicatesWithinWatermark(idCols)

  /** Stream-stream interval inner join (reference: JoinOperator,
    * stateful.py:345-465 — match |ts_l - ts_r| <= bound per key, evict
    * buffers behind the watermark). Both sides MUST be watermarked and the
    * range condition must be on the raw event-time columns so Spark can
    * derive state-eviction bounds (the direct analogue of the reference's
    * `_cleanup_state` cutoff at stateful.py:425-444).
    *
    * @param boundExpr e.g. "leftTs BETWEEN rightTs - INTERVAL 5 MINUTES
    *                   AND rightTs + INTERVAL 5 MINUTES"
    */
  def intervalJoin(left: DataFrame, leftTsCol: String, leftDelay: String,
                   right: DataFrame, rightTsCol: String, rightDelay: String,
                   keyCond: Column, boundExpr: String): DataFrame =
    left.withWatermark(leftTsCol, leftDelay)
      .join(right.withWatermark(rightTsCol, rightDelay),
        keyCond && expr(boundExpr), "inner")

  /** Stream-stream interval OUTER join — the unmatched half of the
    * reference's attribution example (examples/stream_join.py:38-45
    * joins clicks to impressions; the impressions that never converted
    * are the rows an INNER join silently discards). A genuinely
    * different state/firing contract from [[intervalJoin]]: matched
    * pairs emit eagerly, but an outer-side row emits (with nulls on
    * the other side) only once the watermark proves no future input
    * can match it — Spark derives that eviction bound from the range
    * condition over the raw event-time columns, exactly the cutoff the
    * reference's `_cleanup_state` (stateful.py:425-444) computes by
    * hand but never surfaces as output. `joinType` is `left_outer`,
    * `right_outer`, or `full_outer`.
    *
    * The final unmatched rows only flush when the watermark passes the
    * last row's eviction bound — a bounded replay must advance the
    * clock past the corpus (the sentinel-slice posture) or the tail
    * stays in state forever.
    */
  def intervalJoinOuter(left: DataFrame, leftTsCol: String, leftDelay: String,
                        right: DataFrame, rightTsCol: String, rightDelay: String,
                        keyCond: Column, boundExpr: String,
                        joinType: String = "left_outer"): DataFrame = {
    require(Set("left_outer", "right_outer", "full_outer")(joinType),
      s"intervalJoinOuter: joinType must be an outer type, got $joinType")
    left.withWatermark(leftTsCol, leftDelay)
      .join(right.withWatermark(rightTsCol, rightDelay),
        keyCond && expr(boundExpr), joinType)
  }
}
