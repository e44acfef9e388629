package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted k-means model with per-cell integer sufficient statistics —
  * the standing-state form of [[KMeans]] (the clustering member of the
  * standing-index family: [[DedupIndex]], [[IvfIndex]], [[SpanIndex]]).
  *
  * The model stores, per cell, the COUNT and per-dimension SUM of every
  * vector assigned so far (BIGINT fixed point, scale frozen at build).
  * A new batch then folds in WITHOUT revisiting the corpus: assign the
  * batch against the current centroids (narrow broadcast argmin), add
  * its (cell, d) partial sums to the stored statistics, and re-derive
  * centroids as sum div count — the mini-batch k-means update (Sculley
  * '10, web-scale k-means), in arithmetic where every step is exact, so
  * a replayed update sequence is bit-identical on any engine or
  * partitioning. Cells that have received no points keep their initial
  * centroid (count contributes 0 — the [[KMeans.fit]] empty-cell rule).
  *
  * Layout at `path`:
  *   `_centroids/` — one row: (cell, centroid BIGINT array) struct array
  *   `_stats/`     — k·dim rows of (cell, d, s, n)
  *   `_meta/`      — (q, k, dim)
  * Updates rewrite through the crash-safe double-rename swap
  * ([[IvfIndex.swapDirs]]), so a crashed update leaves the previous
  * model addressable.
  *
  * NO exact takedown, by design honesty: each batch's sums were folded
  * under the centroids current AT THAT TIME, and the per-row cell
  * assignment is not stored — subtracting a removed row's contribution
  * exactly is not possible from the model alone. Removing rows from the
  * population means re-[[build]]ing on the surviving corpus (the other
  * standing indexes support in-place `remove`; this one's state is a
  * running aggregate, not a row store).
  */
object KMeansIndex {

  /** Fit on the corpus ([[KMeans.fit]]) and persist the model WITH its
    * sufficient statistics (one extra assign+sum pass over the corpus —
    * build-time cost, so that no later update ever touches the corpus).
    */
  def build(corpus: DataFrame, id: Column, vec: Column, k: Int, iters: Int,
            path: String, q: Long = 1000000L): Unit = {
    val cents = KMeans.fit(corpus, id, vec, k, iters, q)
    val dim = cents.select(size(element_at(col("cents"), 1).getField("centroid")))
      .head.getInt(0)
    // one narrow pass: assignment carries the quantized vector through,
    // so the statistics groupBy is the only exchange (≤ k·dim rows per
    // map partition) — no id-keyed corpus re-join
    val assigned = KMeans.assignQuantized(
      corpus.select(id.as("id"), KMeans.quantize(vec, q).as("xq")), cents)
    val stats = assigned
      .select(col("cell"), posexplode(col("xq")).as(Seq("d", "x")))
      .groupBy(col("cell"), col("d"))
      .agg(sum(col("x")).as("s"), count(lit(1)).as("n"))
    writeModel(path, cents, stats, q, k, dim)
  }

  private def writeModel(path: String, cents: DataFrame, stats: DataFrame,
                         q: Long, k: Int, dim: Int, lastBatch: Long = -1L): Unit = {
    cents.write.mode("overwrite").parquet(s"$path/_centroids")
    stats.write.mode("overwrite").parquet(s"$path/_stats")
    cents.sparkSession.range(1)
      .select(lit(q).as("q"), lit(k).as("k"), lit(dim).as("dim"),
        lit(lastBatch).as("last_batch"))
      .write.mode("overwrite").parquet(s"$path/_meta")
  }

  /** The stored centroid row (fixed-point BIGINT form — feed through
    * [[KMeans.centroidsAsDouble]] for the IVF plumbing).
    */
  def centroids(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(s"$path/_centroids")

  /** Assign rows against the CURRENT stored centroids. */
  def assign(spark: SparkSession, df: DataFrame, id: Column, vec: Column,
             path: String): DataFrame = {
    val q = meta(spark, path)._1
    KMeans.assign(df, id, vec, centroids(spark, path), q)
  }

  /** The last folded stream batch id (-1 for a batch-only model). */
  def lastBatchId(spark: SparkSession, path: String): Long = meta(spark, path)._4

  private def meta(spark: SparkSession, path: String): (Long, Int, Int, Long) = {
    val m = spark.read.parquet(s"$path/_meta")
      .select(col("q"), col("k"), col("dim"), col("last_batch")).head
    (m.getLong(0), m.getInt(1), m.getInt(2), m.getLong(3))
  }

  /** Fold a new batch into the model: assign against current centroids,
    * merge the batch's (cell, d) partial sums into the stored statistics,
    * re-derive centroids as s div n (a cell with n = 0 keeps its current
    * centroid), swap the model directories crash-safely. Batch-sized
    * work only — the corpus is never revisited. Returns nothing; read
    * [[centroids]]/[[assign]] for the updated model.
    */
  def update(spark: SparkSession, newVecs: DataFrame, id: Column, vec: Column,
             path: String, batchId: Long = -1L): Unit = {
    val (q, k, dim, lastBatch) = meta(spark, path)
    // idempotence under streaming replay: a batch id at or below the one
    // already folded is a re-delivery — folding it again would double the
    // sums. Batch callers (batchId = -1) always fold.
    if (batchId >= 0 && batchId <= lastBatch) return
    val cents = centroids(spark, path).localCheckpoint()
    val batch = newVecs.select(id.as("id"), KMeans.quantize(vec, q).as("xq"))
      .localCheckpoint() // pin: a nondeterministic source must not yield
                         // different rows to later passes
    val assigned = KMeans.assignQuantized(batch, cents)
    val batchStats = assigned
      .select(col("cell"), posexplode(col("xq")).as(Seq("d", "x")))
      .groupBy(col("cell"), col("d"))
      .agg(sum(col("x")).as("s"), count(lit(1)).as("n"))
    // Fail-fast overflow posture (same discipline as KMeans.fit's rows·A
    // check): a long-running stream folds sums indefinitely, and a wrap
    // would silently corrupt every later centroid (non-ANSI Long sums
    // wrap, they don't throw). The check MUST use pre-merge quantities —
    // per (cell, d), |s_merged| <= |s_stored| + |s_batch|, so two tiny
    // aggregates (k·dim stored stats, batch partials) prove the merge
    // exact BEFORE it is computed and written.
    val batchPinned = batchStats.localCheckpoint()
    def maxAbsS(df: DataFrame): Long = {
      val r = df.agg(max(abs(col("s")))).head
      if (r.isNullAt(0)) 0L else r.getLong(0)
    }
    val stored = spark.read.parquet(s"$path/_stats")
    val (sStored, sBatch) = (maxAbsS(stored), maxAbsS(batchPinned))
    require(sBatch <= Long.MaxValue - sStored,
      s"folding this batch (max |s|=$sBatch) into the accumulated " +
        s"centroid sums (max |s|=$sStored) can overflow Long at scale " +
        s"q=$q — rebuild the model on a sample (KMeans.fit) or lower q")
    val merged = stored
      .unionByName(batchPinned)
      .groupBy(col("cell"), col("d"))
      .agg(sum(col("s")).as("s"), sum(col("n")).as("n"))
      .localCheckpoint()
    // refreshed centroid components for cells with data; others keep the
    // stored centroid (same fold as KMeans.fit's empty-cell rule)
    val refreshed = merged.where(col("n") > 0)
      .select(col("cell"), col("d"), expr("s div n").as("c"))
      .groupBy(col("cell"))
      .agg(array_sort(collect_list(struct(col("d"), col("c")))).as("dc"))
      .select(col("cell"), transform(col("dc"), x => x.getField("c")).as("centroid"))
      .agg(map_from_entries(collect_list(struct(col("cell"), col("centroid")))).as("m"))
    val newCents = cents.crossJoin(refreshed)
      .select(transform(col("cents"), cc =>
        struct(cc.getField("cell").as("cell"),
          coalesce(element_at(col("m"), cc.getField("cell")),
            cc.getField("centroid")).as("centroid"))).as("cents"))
    val tmp = s"$path.update"
    writeModel(tmp, newCents, merged, q, k, dim,
      if (batchId >= 0) batchId else lastBatch)
    IvfIndex.swapDirs(spark, path, tmp)
  }

  /** Continuous-ingestion form: [[update]] per micro-batch — the model
    * drifts with the stream. foreachBatch is at-least-once (Spark
    * replays batches on failure), and a sum fold is NOT naturally
    * idempotent, so the model records the last folded batch id and
    * [[update]] skips re-deliveries — the fold lands exactly once per
    * batch id. `onBatch` receives each batch's (id, cell) assignment
    * against the pre-update centroids.
    */
  def updateStream(spark: SparkSession, stream: DataFrame, id: Column, vec: Column,
                   path: String)
                  (onBatch: DataFrame => Unit): org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .foreachBatch { (batch: DataFrame, bid: Long) =>
        IvfIndex.retryingStaleReads() {
          val pinned = batch.localCheckpoint()
          onBatch(assign(spark, pinned, id, vec, path))
          update(spark, pinned, id, vec, path, batchId = bid)
        }
      }
      .start()
}
