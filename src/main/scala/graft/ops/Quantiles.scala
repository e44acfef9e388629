package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** EXACT order statistics at scale without a global sort: the k-th
  * smallest value of an integral column by iterative range bisection —
  * each pass histograms the surviving value range into 4096
  * equal-width buckets (one partial-aggregated scan, ≤ 4097 rows
  * exchanged), locates the bucket containing rank k, and recurses into
  * it. A 64-bit domain resolves in ≤ ⌈64/12⌉ = 6 passes; real data
  * ranges in 2-3.
  *
  * This is the distributed-selection answer to "exact median over
  * 100 TB": a global sort shuffles the whole table; Spark's exact
  * `percentile` aggregate collects every value into one aggregation
  * buffer; `approx_percentile` is not exact (q54 holds it to an error
  * bar instead). Bisection scans, never sorts, never collects values —
  * and each pass after the first carries a pushed range filter, so
  * the scanned volume drops with the range.
  *
  * Determinism: the result is a VALUE present in the data (discrete
  * quantile), defined purely by rank arithmetic — integer ceil
  * division, engine-portable, DuckDB-replayable by row_number.
  * Nulls are excluded (SQL aggregate convention).
  */
object Quantiles {

  private val B = 4096L

  /** The k-th smallest (1-based) non-null value of `value`. */
  def exactRank(df: DataFrame, value: Column, k: Long): Long = {
    val vals = toLongCol(df, value)
    val m = vals.agg(count(lit(1)).as("n"),
      min(col("v")).as("lo"), max(col("v")).as("hi")).head
    val n = m.getLong(0)
    require(n > 0, "exactRank: no non-null values")
    require(k >= 1 && k <= n, s"exactRank: rank $k outside [1, $n]")
    descend(vals, k, m.getLong(1), m.getLong(2))
  }

  /** Discrete percentiles as a DataFrame (q_pct, rk, value): for each
    * integer percent p, the value at 1-based rank max(1, ⌈p·n/100⌉).
    * The first histogram pass is shared across all requested ranks.
    */
  def percentiles(df: DataFrame, value: Column, pcts: Seq[Int]): DataFrame = {
    require(pcts.nonEmpty && pcts.forall(p => p >= 1 && p <= 100),
      s"percentiles: percents must be in [1,100], got ${pcts.mkString(",")}")
    val spark = df.sparkSession
    // NOT pinned: each pass re-reads the source with a pushed range
    // filter — at 100 TB, re-scanning a shrinking slice beats
    // materializing the whole column
    val vals = toLongCol(df, value)
    val m = vals.agg(count(lit(1)).as("n"),
      min(col("v")).as("lo"), max(col("v")).as("hi")).head
    val n = m.getLong(0)
    require(n > 0, "percentiles: no non-null values")
    val (lo, hi) = (m.getLong(1), m.getLong(2))
    // shared first pass: one histogram over the full range serves every rank
    val hist = histogram(vals, lo, hi)
    val rows = pcts.map { p =>
      val rk = math.max(1L, (p.toLong * n + 99L) / 100L)
      val (blo, bhi, kIn) = locate(hist, rk, lo, hi)
      (p.toLong, rk, descend(vals.where(col("v").between(blo, bhi)), kIn, blo, bhi))
    }
    import spark.implicits._
    rows.toDF("q_pct", "rk", "value")
  }

  private def toLongCol(df: DataFrame, value: Column): DataFrame = {
    val one = df.select(value.as("v"))
    val dt = one.schema("v").dataType.simpleString
    require(Seq("bigint", "int", "smallint", "tinyint").contains(dt),
      s"quantiles: value must be integral (cast DECIMAL money to cents first), got $dt")
    one.where(col("v").isNotNull).select(col("v").cast("long"))
  }

  private def width(lo: Long, hi: Long): Long = {
    val range = try math.subtractExact(hi, lo) catch {
      case _: ArithmeticException => throw new IllegalArgumentException(
        s"quantiles: value range [$lo, $hi] spans more than a Long — " +
          "rescale the column first")
    }
    range / B + 1
  }

  /** One histogram pass: bucket counts over [lo, hi], ≤ B+1 rows. */
  private def histogram(vals: DataFrame, lo: Long, hi: Long): Array[(Long, Long)] = {
    val w = width(lo, hi)
    vals.select(expr(s"(v - ${lo}L) div ${w}L").as("b"))
      .groupBy(col("b")).agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
  }

  /** Which bucket holds rank k; returns its value range and the rank
    * within it.
    */
  private def locate(hist: Array[(Long, Long)], k: Long, lo: Long,
                     hi: Long): (Long, Long, Long) = {
    val w = width(lo, hi)
    var below = 0L
    var i = 0
    while (i < hist.length) {
      val (b, c) = hist(i)
      if (k <= below + c)
        return (lo + b * w, math.min(lo + (b + 1) * w - 1, hi), k - below)
      below += c
      i += 1
    }
    throw new IllegalStateException(s"quantiles: rank $k beyond histogram mass $below")
  }

  @annotation.tailrec
  private def descend(vals: DataFrame, k: Long, lo: Long, hi: Long): Long =
    if (lo == hi) lo
    else {
      val (blo, bhi, kIn) = locate(histogram(vals, lo, hi), k, lo, hi)
      descend(vals.where(col("v").between(blo, bhi)), kIn, blo, bhi)
    }
}
