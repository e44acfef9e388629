package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Keyed aggregation surface.
  *
  * The reference's AggregateOperator keeps {count,sum,min,max} per key and
  * supports agg_func ∈ {sum,count,avg,min,max}
  * (reference: taskmanager/operators/stateful.py:265-342). Here the same
  * surface is a groupBy().agg() — Catalyst plans it as partial (map-side)
  * + final HashAggregate, which is what makes it hold at 100 TB: the
  * shuffle carries one row per (partition, key), not per record.
  *
  * Beyond the reference (it has none of these): distinct counts, approximate
  * distinct (HLL), cube/rollup grouping sets.
  */
object Aggregates {

  /** Exact money/quantity arithmetic: cast doubles to DECIMAL(18,2) before
    * summing so results are associative and engine-independent (float sums
    * depend on reduction order; decimal sums do not).
    */
  def dec(c: Column): Column = c.cast(DecimalType(18, 2))

  /** The reference's full agg surface for one value column, per key.
    * Sums run in decimal (order-independent), outputs cast to double; avg
    * is a scalar double division of exact aggregates, so results are
    * bit-identical across engines and partitionings.
    */
  def keyedStats(df: DataFrame, valueCol: Column, keys: Column*): DataFrame =
    df.groupBy(keys: _*).agg(
      count(lit(1)).as("cnt"),
      sum(dec(valueCol)).cast("double").as("sum_v"),
      min(dec(valueCol)).cast("double").as("min_v"),
      max(dec(valueCol)).cast("double").as("max_v"),
      (sum(dec(valueCol)).cast("double") / count(lit(1))).as("avg_v"))

  /** Extension: distinct + approximate-distinct aggregates (free on Spark,
    * absent in the reference — SURVEY §2.4).
    */
  def distinctCounts(df: DataFrame, distinctCol: Column, keys: Column*): DataFrame =
    df.groupBy(keys: _*).agg(
      countDistinct(distinctCol).as("n_distinct"),
      approx_count_distinct(distinctCol).as("n_approx"))

  /** Extension: rollup over a hierarchy (e.g. region > nation). */
  def rollupAgg(df: DataFrame, valueCol: Column, keys: Column*): DataFrame =
    df.rollup(keys: _*).agg(count(lit(1)).as("cnt"), sum(dec(valueCol)).cast("double").as("sum_v"))

  /** Extension: cube over dimensions. */
  def cubeAgg(df: DataFrame, valueCol: Column, keys: Column*): DataFrame =
    df.cube(keys: _*).agg(count(lit(1)).as("cnt"), sum(dec(valueCol)).cast("double").as("sum_v"))

  /** Exact per-key mode (most frequent value) — the categorical
    * imputation / canonicalization primitive. Deterministic tie-break:
    * among equally frequent values the LARGEST wins (struct-max over
    * (count, value) — engine-portable, no arbitrary first()). NULL
    * values don't compete (they're what imputation fills). Output:
    * keys…, `mode`, `mode_n`.
    *
    * Scale shape: two hash aggregates — (keys, value) counts, then a
    * struct-max per key; both map-side partial, nothing buffers a
    * group. The value column must be max-comparable (string/numeric).
    */
  def modeByKey(df: DataFrame, valueCol: Column, keys: Column*): DataFrame = {
    require(keys.nonEmpty, "modeByKey: at least one key column")
    df.where(valueCol.isNotNull)
      .groupBy(keys :+ valueCol.as("__v"): _*)
      .agg(count(lit(1)).as("__c"))
      .groupBy(keys: _*)
      .agg(max(struct(col("__c"), col("__v"))).as("__m"))
      .select(keys ++ Seq(col("__m.__v").as("mode"),
        col("__m.__c").as("mode_n")): _*)
  }

  /** Per-group z-score normalization: `out` = (x − mean)/σ (population
    * σ) — the plain feature-scaling step beside the robust
    * [[Quantiles.winsorize]]. Moments accumulate in DECIMAL(38,0)
    * (`value` must be integral — exact, order-independent), the score
    * is ONE deterministic double expression over the double-cast
    * moments (engine-portable like [[Checks.correlations]]). Rows in a
    * zero-variance or singleton group, and NULL values, score NULL.
    *
    * Scale shape: one hash aggregate to the group-sized moment table,
    * one group-keyed join back.
    */
  def zscoreByKey(df: DataFrame, valueCol: Column, keys: Seq[String],
                  out: String = "z"): DataFrame = {
    require(keys.nonEmpty, "zscoreByKey: at least one key column")
    require(!df.columns.contains(out), s"zscoreByKey: column $out already exists")
    val vt = df.select(valueCol.as("__v")).schema.head.dataType.simpleString
    require(Seq("bigint", "int", "smallint", "tinyint").contains(vt),
      s"zscoreByKey: value must be integral for exact moments (got $vt)")
    val d = valueCol.cast("decimal(38,0)")
    val m = df.groupBy(keys.map(col): _*).agg(
      sum(when(d.isNotNull, 1L).otherwise(0L)).as("__n"),
      sum(coalesce(d, lit(0).cast("decimal(38,0)"))).as("__sx"),
      sum(coalesce(d * d, lit(0).cast("decimal(38,0)"))).as("__sxx"))
    val nD = col("__n").cast("double")
    val meanD = col("__sx").cast("double") / nD
    val varD = (col("__sxx").cast("double") / nD) - (meanD * meanD)
    df.join(m, keys, "left")
      .withColumn(out, when(col("__n") >= 2L && varD > 0,
        (valueCol.cast("double") - meanD) / sqrt(varD)))
      .drop("__n", "__sx", "__sxx")
  }
}
