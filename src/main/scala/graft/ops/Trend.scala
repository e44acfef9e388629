package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Per-key ordinary-least-squares trend — the "is this metric drifting"
  * primitive behind the reference's anomaly rules
  * (`taskmanager/operators/files.py` threshold predicates flag levels;
  * a slope flags direction). Closed-form OLS needs only the five sums
  * (n, Σx, Σy, Σxy, Σx²), so the whole fit is ONE partial-aggregated
  * scan — no iteration, no second pass.
  */
object Trend {

  /** Per-key slope and intercept in integer fixed point: `slope_fp` =
    * `scale`·(n·Σxy − Σx·Σy) div (n·Σx² − Σx·Σx), `intercept_fp` =
    * (`scale`·Σy − slope_fp·Σx) div n — every step integer arithmetic
    * (both Spark `div` and DuckDB `//` truncate toward zero), so the
    * result is bit-identical across engines, partitionings and reruns.
    * Keys with a single distinct x have no defined slope → null.
    *
    * Scale shape: ONE map-side-combined aggregate (the five sums plus
    * per-key n / max|x| / max|y| for the guard), one key-sized exchange,
    * scalar math on the aggregated rows — the overflow guard rides the
    * same scan as the fit instead of a separate pre-pass job. Per key,
    * if 2·n²·max|x|² or `scale`·2·n²·max|x|·max|y| could pass Long
    * range (worst-case |Σ| ≤ n·max|abs| bound, checked in double
    * against a conservative 8.9e18 < 2⁶³−1 limit so double rounding
    * can never admit a true overflow), the fit aborts via `raise_error`
    * with a rescale hint instead of wrapping (x in coarser units /
    * smaller offset is the standard fix). The guard branch is evaluated
    * BEFORE any slope arithmetic (lazy CASE), so admitted keys provably
    * never overflow. If the raw sums themselves overflow during
    * aggregation — only possible when the guard would also fire — the
    * session's ANSI mode aborts the job with ARITHMETIC_OVERFLOW first:
    * still fail-fast, just Spark's message rather than the hint. x and
    * y must be integral — convert epoch ticks and fixed-point measures
    * first.
    */
  def fit(df: DataFrame, keys: Seq[String], xCol: String, yCol: String,
          scale: Long = 1000000L): DataFrame = {
    require(keys.nonEmpty, "trend: at least one key column")
    require(scale > 0, "trend: scale must be positive")
    (keys ++ Seq(xCol, yCol)).foreach(c => require(df.columns.contains(c),
      s"trend: no column $c"))
    Seq(xCol, yCol).foreach { c =>
      require(df.schema(c).dataType.simpleString.matches("bigint|int|smallint|tinyint"),
        s"trend: $c must be integral (got ${df.schema(c).dataType.simpleString}) — " +
          "convert to ticks / fixed point first")
    }
    val reserved = Seq("__x", "__y", "__n", "__sx", "__sy", "__sxy", "__sxx",
      "__ax", "__ay")
    require(df.columns.intersect(reserved).isEmpty,
      s"trend: input uses reserved column names: ${reserved.mkString(", ")}")
    Seq("n", "slope_fp", "intercept_fp").foreach(c => require(!keys.contains(c),
      s"trend: key column $c collides with an output column name — rename it first"))

    val rows = df.where(col(xCol).isNotNull && col(yCol).isNotNull)
      .select(keys.map(col) :+ col(xCol).as("__x") :+ col(yCol).as("__y"): _*)

    // fail-fast overflow guard (KMeans.fit posture), folded into the fit
    // aggregate: per-key n / max|x| / max|y| bound every product the
    // slope math will compute (worst-case |Σ| ≤ n·max|abs|, per-key so a
    // wide-but-shallow corpus is never falsely rejected by another key's
    // extremes). Checked in double against 8.9e18 — far enough inside
    // 2⁶³−1 that double's 53-bit mantissa can never round a true
    // overflow into admission — and raised lazily as the FIRST CASE
    // branch so no slope arithmetic runs on a violating key.
    val nD = col("__n").cast("double")
    val axD = greatest(col("__ax"), lit(1L)).cast("double")
    val ayD = greatest(col("__ay"), lit(1L)).cast("double")
    val sD = lit(scale.toDouble)
    val lim = lit(8.9e18)
    val violXx = nD * nD * axD * axD * lit(2.0) > lim
    val violXy = sD * lit(2.0) * nD * nD * axD * ayD > lim
    val violY = sD * nD * ayD * lit(2.0) > lim

    rows.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("__n"), sum(col("__x")).as("__sx"),
        sum(col("__y")).as("__sy"), sum(col("__x") * col("__y")).as("__sxy"),
        sum(col("__x") * col("__x")).as("__sxx"),
        max(abs(col("__x"))).as("__ax"), max(abs(col("__y"))).as("__ay"))
      .withColumn("slope_fp",
        when(violXx, raise_error(concat(
          lit("trend: a key's n·Σx² can reach "),
          (nD * nD * axD * axD * lit(2.0)).cast("string"),
          lit(", past Long — rescale x (coarser units or subtract a base offset)"))))
        .when(violXy, raise_error(lit(
          "trend: scale·(n·Σxy − Σx·Σy) can overflow Long — lower scale or rescale x/y")))
        .when(violY, raise_error(lit(
          "trend: scale·Σy can overflow Long — lower scale or rescale y")))
        .otherwise(expr(
          s"CASE WHEN __n * __sxx - __sx * __sx = 0 THEN CAST(NULL AS BIGINT) " +
            s"ELSE ($scale * (__n * __sxy - __sx * __sy)) div (__n * __sxx - __sx * __sx) END")))
      .withColumn("intercept_fp", expr(
        s"CASE WHEN slope_fp IS NULL THEN CAST(NULL AS BIGINT) " +
          s"ELSE ($scale * __sy - slope_fp * __sx) div __n END"))
      .select(keys.map(col) ++ Seq(col("__n").as("n"),
        col("slope_fp"), col("intercept_fp")): _*)
  }
}
