package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Join, LogicalPlan, RebalancePartitions, Repartition, RepartitionByExpression, Sort, Window => LWindow}
import org.apache.spark.sql.execution.columnar.InMemoryRelation

/** Scan-layout adaptivity (spark_optimization_guide §2.5 "input skew:
  * one huge unsplittable file … repartition immediately after the
  * read"). The bench corpora are single-file, SINGLE-ROW-GROUP parquet:
  * Spark cannot split a row group, so every scan — and every CPU-heavy
  * kernel riding it (shingles, MinHash, tokenize, histogram bucketing)
  * — runs as ONE task regardless of core count. At real scale a table
  * has thousands of files and the natural splits already saturate the
  * cluster, so these helpers are literal NO-OPS there: the guards are
  * pure plan/metadata reads (NEVER `df.rdd`, which under AQE executes
  * the plan's shuffle stages as a side effect — measured as phantom
  * duplicate jobs).
  */
object ScanLayout {

  /** An input a multi-pass operator may pin (persist) rather than
    * re-derive every pass: plan-stat estimate at most this many bytes.
    * Caching competes with execution memory (guide §5), so only
    * clearly-small frames qualify; a 100 TB corpus projection is far
    * past this and keeps the documented re-scan-per-pass shape.
    */
  val PinMaxBytes: Long = 256L * 1024 * 1024

  /** Target bytes per fan-out partition: the width a spread frame gets
    * GROWS with its plan-stat size (one partition per this many bytes)
    * instead of jumping straight to the core count. 16 MiB of scan
    * input is comfortably more than a task's fixed cost (schedule +
    * codegen init + exchange write, single-digit ms) even for cheap
    * per-row work.
    */
  val FanOutBytesPerPartition: Long = 16L * 1024 * 1024

  /** How many partitions [[fanOut]]/[[pinForPasses]] spread to. r15
    * used raw `defaultParallelism`, and the driver's 8-vs-32-core
    * scaling run showed the tiny-frame pathology: at `local[32]` every
    * multi-pass stage pays 32 tasks of fixed overhead on KB-sized
    * partitions, and the fan-out queries ran SLOWER on 32 cores than
    * on 8 (q233 8.4 s vs 4.3 s, q199 5.7 vs 2.8 — BENCH_r15 vs
    * BENCH_r15_c8). Bound: grow one partition per
    * [[FanOutBytesPerPartition]] of plan-stat bytes, floored at
    * min(parallelism, 8) ∨ parallelism/4 (a CPU-heavy kernel on an
    * unsplittable file still deserves real parallelism — 8 matched 32
    * on every LSH-family query in the same scaling run), capped at the
    * session parallelism. Scale-adaptive by construction: a bigger
    * single file gets proportionally more partitions, and at real
    * scale the [[underParallelized]] guard keeps this from firing at
    * all.
    */
  private[graft] def fanOutWidth(df: DataFrame): Int = {
    val p = parallelism(df)
    val bytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    val bySize =
      if (bytes > BigInt(Long.MaxValue)) p
      else math.min(p.toLong, bytes.toLong / FanOutBytesPerPartition).toInt
    math.min(p, math.max(math.max(p / 4, math.min(p, 8)), bySize))
  }

  private def parallelism(df: DataFrame): Int =
    df.sparkSession.sparkContext.defaultParallelism

  // exchange-introducing (or cached) nodes: below any of these the
  // frame's execution parallelism is the shuffle partition count (or
  // the cache's layout), not the file layout
  private def spreadBy(p: LogicalPlan): Boolean = p match {
    case _: Repartition | _: RepartitionByExpression | _: RebalancePartitions => true
    case _: Join | _: Aggregate | _: LWindow | _: Sort => true
    case _: InMemoryRelation => true
    case _ => false
  }

  /** True when `df` would execute with fewer partitions than the
    * session's parallelism — the regime where a scan-side kernel
    * serializes on one core: a shuffle-free plan over fewer files than
    * cores. Frames with no file source (in-memory test relations)
    * report 0 files and count as under-parallelized; spreading them is
    * harmless. Decided from the logical plan only — runs no job.
    */
  def underParallelized(df: DataFrame): Boolean = {
    val plan = df.queryExecution.optimizedPlan
    !plan.exists(spreadBy) && df.inputFiles.length < parallelism(df)
  }

  /** Round-robin the rows across the session's full parallelism iff the
    * file layout under-parallelizes the scan ([[underParallelized]]).
    * Use directly before a compute-heavy per-row kernel; at scale the
    * guard makes it identity, so no corpus-wide exchange ever appears
    * in an at-scale plan.
    */
  def fanOut(df: DataFrame): DataFrame =
    if (underParallelized(df)) df.repartition(fanOutWidth(df)) else df

  /** [[fanOut]] + persist for MULTI-PASS consumers (the bisection
    * stacks): an under-parallelized single-file scan would otherwise
    * run once per pass, single-threaded, and each pass would re-plan
    * the full source lineage. Returns the frame to run the passes
    * over, a release handle the caller MUST invoke when the passes are
    * done (persist/unpersist pairing is a house rule), and whether a
    * pin happened. Pins when the scan is under-parallelized OR the
    * frame's plan-stat size is ≤ [[PinMaxBytes]]; a frame already fed
    * by an upstream cache is left alone (its passes re-read that
    * cache). At 100 TB nothing qualifies and this is an identity —
    * re-scanning narrow columns beats materializing them, exactly the
    * trade the operators document.
    */
  def pinForPasses(df: DataFrame): (DataFrame, () => Unit, Boolean) = {
    val plan = df.queryExecution.optimizedPlan
    if (plan.exists { case _: InMemoryRelation => true; case _ => false })
      return (df, () => (), false)
    val under = underParallelized(df)
    val small = plan.stats.sizeInBytes <= PinMaxBytes
    if (under || small) {
      val pinned = (if (under) df.repartition(fanOutWidth(df)) else df).persist()
      (pinned, () => { pinned.unpersist(false); () }, true)
    } else (df, () => (), false)
  }
}
