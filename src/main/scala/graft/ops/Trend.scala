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
    * Scale shape: one map-side-combined aggregate (the five sums), one
    * key-sized exchange, scalar math on the aggregated row. The
    * fail-fast pre-check bounds the worst-case |sum| products with
    * BigInt arithmetic from one min/max scan — if n·max|x|²·2 or
    * `scale`·2·n²·max|x|·max|y| could pass Long range, the fit aborts
    * with a rescale hint instead of wrapping (x in coarser units /
    * smaller offset is the standard fix). x and y must be integral —
    * convert epoch ticks and fixed-point measures first.
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
    val reserved = Seq("__x", "__y", "__n", "__sx", "__sy", "__sxy", "__sxx")
    require(df.columns.intersect(reserved).isEmpty,
      s"trend: input uses reserved column names: ${reserved.mkString(", ")}")
    Seq("n", "slope_fp", "intercept_fp").foreach(c => require(!keys.contains(c),
      s"trend: key column $c collides with an output column name — rename it first"))

    val rows = df.where(col(xCol).isNotNull && col(yCol).isNotNull)
      .select(keys.map(col) :+ col(xCol).as("__x") :+ col(yCol).as("__y"): _*)

    // fail-fast overflow pre-check (KMeans.fit posture): bound every
    // product the plan will compute, using worst-case per-key |sums| ≤
    // N·max|abs| where N = the largest key's row count (the global count
    // would falsely reject wide-but-shallow corpora) — one key-sized
    // aggregate, BigInt math on the one guard row
    val g = rows.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("__n"), max(abs(col("__x"))).as("__ax"),
        max(abs(col("__y"))).as("__ay"))
      .agg(max(col("__n")), max(col("__ax")), max(col("__ay")))
      .collect().head
    if (!g.isNullAt(0)) {
      val n = BigInt(g.getLong(0))
      val ax = BigInt(g.getLong(1)) max BigInt(1)
      val ay = BigInt(g.getLong(2)) max BigInt(1)
      val lmax = BigInt(Long.MaxValue)
      require(n * n * ax * ax * 2 <= lmax,
        s"trend: a key's n·Σx² can reach ${n * n * ax * ax * 2}, past Long — " +
          "rescale x (coarser units or subtract a base offset)")
      require(BigInt(scale) * 2 * n * n * ax * ay <= lmax,
        s"trend: scale·(n·Σxy − Σx·Σy) can overflow Long — lower scale or rescale x/y")
      require(BigInt(scale) * n * ay * 2 <= lmax,
        s"trend: scale·Σy can overflow Long — lower scale or rescale y")
    }

    rows.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("__n"), sum(col("__x")).as("__sx"),
        sum(col("__y")).as("__sy"), sum(col("__x") * col("__y")).as("__sxy"),
        sum(col("__x") * col("__x")).as("__sxx"))
      .withColumn("slope_fp", expr(
        s"CASE WHEN __n * __sxx - __sx * __sx = 0 THEN CAST(NULL AS BIGINT) " +
          s"ELSE ($scale * (__n * __sxy - __sx * __sy)) div (__n * __sxx - __sx * __sx) END"))
      .withColumn("intercept_fp", expr(
        s"CASE WHEN slope_fp IS NULL THEN CAST(NULL AS BIGINT) " +
          s"ELSE ($scale * __sy - slope_fp * __sx) div __n END"))
      .select(keys.map(col) ++ Seq(col("__n").as("n"),
        col("slope_fp"), col("intercept_fp")): _*)
  }
}
