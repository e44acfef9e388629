package graft.ops

import org.apache.spark.sql.{Column, DataFrame, RelationalGroupedDataset}
import org.apache.spark.sql.functions._

/** Event-time window operators.
  *
  * The reference's core query construct: TumblingWindow / SlidingWindow
  * assigners + a WindowOperator that buffers per (key, window) and fires on
  * watermark (reference: taskmanager/operators/stateful.py:42-85, 147-262).
  * SessionWindow is documented but unimplemented there
  * (docs/api_reference.md:257-261); we implement it for surface parity.
  *
  * On Spark the same assignment math is the built-in `window()` /
  * `session_window()` expressions, usable identically in batch and
  * Structured Streaming (streaming adds `withWatermark` for firing/eviction
  * — see graft.streaming). The assigner is a per-row expression (no state),
  * the aggregation is a partial+final HashAggregate: at 100 TB the shuffle
  * carries one row per (key, window), and sliding windows multiply input by
  * size/slide *before* partial aggregation — keep slide ratios modest.
  *
  * Late data: the reference re-fires an already-emitted window when late
  * records arrive (stateful.py:186-192 — duplicate emission, a documented
  * quirk); we adopt Spark watermark semantics (late rows beyond the
  * watermark are dropped) — see SURVEY §7.4.
  */
object EventTimeWindows {

  /** TumblingWindow(size) (reference: stateful.py:42-56 —
    * start = ts div size * size, window = [start, start+size)).
    */
  def tumbling(df: DataFrame, ts: Column, size: String, keys: Column*): RelationalGroupedDataset =
    df.groupBy(window(ts, size) +: keys: _*)

  /** SlidingWindow(size, slide) (reference: stateful.py:59-85 — every
    * window [s, s+size), s ≡ 0 (mod slide), containing ts).
    */
  def sliding(df: DataFrame, ts: Column, size: String, slide: String, keys: Column*): RelationalGroupedDataset =
    df.groupBy(window(ts, size, slide) +: keys: _*)

  /** SessionWindow(gap): documented-but-missing in the reference
    * (docs/api_reference.md:257-261). Sessions merge while consecutive
    * events are < gap apart; window = [first_ts, last_ts + gap).
    */
  def session(df: DataFrame, ts: Column, gap: String, keys: Column*): RelationalGroupedDataset =
    df.groupBy(session_window(ts, gap) +: keys: _*)

  /** Project the window struct to its epoch-millisecond start — the
    * reference emits fired windows stamped with window end/start as ms
    * longs (stateful.py:233-239); ms longs also make oracle comparison
    * engine-exact (no timestamp-precision ambiguity).
    */
  def winStartMs: Column = unix_millis(col("window.start")).as("win_start_ms")
  def winEndMs: Column   = unix_millis(col("window.end")).as("win_end_ms")

  /** Per-EVENT sessionization: assign every event its key's 1-based
    * session ordinal under a gap rule (a session breaks when the gap
    * to the previous event exceeds `gapMs`) plus its 1-based position
    * within that session. `session_window` aggregates PER SESSION;
    * this keeps the EVENT rows — the labeling step before
    * session-scoped features (position-in-session, entry/exit events,
    * session joins).
    *
    * Scale shape: one keyed exchange; lag + two running sums share
    * the single per-key sort. Gap convention: strictly greater than
    * `gapMs` breaks (a gap of exactly `gapMs` continues the session),
    * matching `session_window`'s half-open [start, last+gap) windows.
    * Output: keys…, `us` (event epoch-µs), `tie`, `session_idx`,
    * `event_idx`.
    */
  def sessionize(df: DataFrame, keys: Seq[String], ts: Column, tie: Column,
                 gapMs: Long): DataFrame = {
    require(keys.nonEmpty, "sessionize: at least one key column")
    require(gapMs > 0, "sessionize: gapMs must be positive")
    val ord = org.apache.spark.sql.expressions.Window
      .partitionBy(keys.map(col): _*).orderBy(col("us"), col("tie"))
    val run = ord.rowsBetween(
      org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    df.select(keys.map(col) ++ Seq(unix_micros(ts).as("us"),
        tie.as("tie")): _*)
      .withColumn("__brk",
        when(col("us") - lag(col("us"), 1).over(ord) > gapMs * 1000L, 1L)
          .otherwise(lit(0L)))
      .withColumn("__rn", row_number().over(ord).cast("long"))
      .withColumn("session_idx", sum(col("__brk")).over(run) + 1L)
      // position within the session from the SAME sorted frame (no
      // second exchange): distance past the last session break
      .withColumn("event_idx",
        col("__rn") - coalesce(
          max(when(col("__brk") === 1L, col("__rn"))).over(run), lit(1L)) + 1L)
      .drop("__brk", "__rn")
  }
}
