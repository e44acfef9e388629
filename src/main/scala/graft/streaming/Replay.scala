package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Event-time-ordered replay of a batch table as a micro-batched file
  * stream — the harness that lets a stateful streaming operator be
  * validated against a BATCH oracle (q117/q118/q119's pattern).
  *
  * [[writeOrderedSlices]] splits the frame into `slices` contiguous
  * ranges of an integral order column and writes one parquet file per
  * slice with STRICTLY ASCENDING modification times.
  * [[orderedStream]] then reads the directory with
  * `maxFilesPerTrigger=1`: FileStreamSource's documented contract
  * (`latestFirst=false`, the default) processes oldest-modified files
  * first, so micro-batches arrive in event-time order — every record
  * in batch i+1 has an order value ≥ every record in batch i. That is
  * exactly the in-order-delivery regime under which the streaming
  * twins' parity contracts (stream == batch, spec-asserted in
  * FunnelSpec/CohortsSpec/ChecksSpec) make a batch oracle valid for a
  * streaming run.
  *
  * Scale note: this is a TEST/VALIDATION harness — production streams
  * come from Kafka/file drops with their own ordering realities, and
  * the operators' documented straggler-drop semantics cover them. The
  * slice write is one pass over the frame per slice (bounded, small
  * slice counts); determinism comes from range slicing on the order
  * column, not from file-listing luck.
  */
object Replay {

  /** Split `df` into `slices` contiguous ranges of `orderBy` (an
    * integral epoch-style column) under `dir/in`, mtimes ascending.
    * Rows with null order values are dropped (they have no place in an
    * ordered replay). Returns the directory written into.
    */
  def writeOrderedSlices(df: DataFrame, orderBy: Column, dir: String,
                         slices: Int = 8): String =
    writeShuffledSlices(df, orderBy, dir, 0 until slices)

  /** [[writeOrderedSlices]] with an explicit DELIVERY order: slice
    * contents are the same contiguous `orderBy` ranges (slice i covers
    * the i-th range), but mtimes follow `deliveryOrder` — the stream
    * delivers `deliveryOrder(0)` first, then `deliveryOrder(1)`, …
    * An out-of-order permutation makes rows of an early range arrive
    * AFTER a later range has advanced the watermark — the deterministic
    * late-data regime q130 validates drop semantics under (the dropped
    * set is computable from the per-slice max event times alone).
    */
  def writeShuffledSlices(df: DataFrame, orderBy: Column, dir: String,
                          deliveryOrder: Seq[Int]): String = {
    val slices = deliveryOrder.length
    require(slices > 0, "replay: slices must be positive")
    require(deliveryOrder.sorted == (0 until slices),
      s"replay: deliveryOrder must be a permutation of 0..${slices - 1}")
    val vals = df.where(orderBy.isNotNull)
    val bounds = vals.agg(min(orderBy).cast("long"), max(orderBy).cast("long")).head
    require(!bounds.isNullAt(0), "replay: no rows to slice")
    val (lo, hi) = (bounds.getLong(0), bounds.getLong(1))
    deliveryOrder.zipWithIndex.foreach { case (i, pos) =>
      val a = lo + (hi - lo + 1) * i / slices
      val b = lo + (hi - lo + 1) * (i + 1) / slices
      writeSlice(dir, vals.where(orderBy.cast("long") >= a && orderBy.cast("long") < b),
        i, pos)
    }
    dir
  }

  /** Append one more slice AFTER every [[writeOrderedSlices]] slice — its
    * mtime sorts last, so it arrives as the FINAL micro-batch. The use
    * case is a watermark-advancing sentinel: append-mode windowed
    * aggregation only emits a window once the watermark passes its end,
    * so without a trailing event the last real windows stay unflushed
    * forever (`processAllAvailable` is not end-of-stream). A sentinel row
    * one day past the corpus, filtered out AFTER `withWatermark`,
    * advances the watermark without contributing data (q122's pattern).
    * `index` must be ≥ the slice count already written — mtimes are
    * derived from it, and reusing one would surrender delivery order;
    * a collision with an existing slice fails fast (a silent overwrite
    * would reuse the victim's position and corrupt delivery order with
    * no error).
    */
  def appendSlice(dir: String, df: DataFrame, index: Int): String = {
    require(index > 0, "replay: appendSlice index must be positive")
    require(!java.nio.file.Files.exists(
        java.nio.file.Paths.get(s"$dir/in/slice$index.parquet")),
      s"replay: appendSlice index $index collides with an existing slice")
    writeSlice(dir, df, index, index)
    dir
  }

  private def writeSlice(dir: String, df: DataFrame, i: Int, mtimePos: Int): Unit = {
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$dir/in"))
    df.coalesce(1).write.mode("overwrite").parquet(s"$dir/stage$i")
    val part = new java.io.File(s"$dir/stage$i").listFiles()
      .filter(_.getName.endsWith(".parquet")).head.toPath
    val dst = java.nio.file.Paths.get(s"$dir/in/slice$i.parquet")
    java.nio.file.Files.move(part, dst,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    // strictly ascending in DELIVERY position, whole-second spaced: some
    // filesystems round mtimes to seconds, and equal stamps would
    // surrender the order to listing luck
    java.nio.file.Files.setLastModifiedTime(dst,
      java.nio.file.attribute.FileTime.fromMillis(1704067200000L + mtimePos * 2000L))
  }

  /** One-file-per-trigger stream over a [[writeOrderedSlices]] output:
    * micro-batches in ascending slice order.
    */
  def orderedStream(spark: SparkSession, dir: String,
                    schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.readStream.schema(schema).option("maxFilesPerTrigger", 1)
      .parquet(s"$dir/in")
}
