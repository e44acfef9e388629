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
}
