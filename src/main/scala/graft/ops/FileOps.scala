package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

/** The reference GUI's ad-hoc file operations
  * (reference: gui/app_gcp.py:212-410): filter / transform / aggregate /
  * anomaly / passthrough over an uploaded CSV/JSON. There they are
  * driver-side Python loops capped at 500 records; here each is a
  * distributed DataFrame recipe.
  */
object FileOps {

  /** Filter ops equals/contains/greater_than/less_than on a dynamic column
    * (reference: gui/app_gcp.py:284-302).
    */
  def filterOp(df: DataFrame, column: String, op: String, value: String): DataFrame = {
    val c = col(column)
    val pred = op match {
      case "equals"       => c.cast(StringType) === value
      case "contains"     => c.cast(StringType).contains(value)
      case "greater_than" => c > value.toDouble
      case "less_than"    => c < value.toDouble
      case other          => throw new IllegalArgumentException(s"unknown filter op: $other")
    }
    df.where(pred)
  }

  /** Transform op: uppercase every string column and append a provenance
    * column (reference: gui/app_gcp.py:304-314 adds `_processed_at`; we
    * take the marker as a parameter so output is deterministic/testable —
    * pass `current_timestamp()` for wall-clock parity).
    */
  def transformOp(df: DataFrame, processedAt: Column): DataFrame = {
    val cols = df.schema.fields.toIndexedSeq.map { f =>
      if (f.dataType == StringType) upper(col(f.name)).as(f.name) else col(f.name)
    }
    df.select(cols: _*).withColumn("_processed_at", processedAt)
  }

  /** Aggregate op: count/sum/avg grouped by a column
    * (reference: gui/app_gcp.py:316-349). Final aggregates only — the
    * reference's per-input-row running emission is its changelog view of
    * the same aggregation (update-mode in streaming).
    */
  def aggregateOp(df: DataFrame, groupCol: String, aggFunc: String, valueCol: String): DataFrame = {
    val v = Aggregates.dec(col(valueCol))
    val agg = aggFunc match {
      case "count" => count(lit(1)).cast("double").as("agg_value")
      case "sum"   => sum(v).cast("double").as("agg_value")
      case "avg"   => (sum(v).cast("double") / count(lit(1))).as("agg_value")
      case other   => throw new IllegalArgumentException(s"unknown agg: $other")
    }
    df.groupBy(col(groupCol)).agg(agg)
  }

  /** Anomaly op: threshold flag (reference: gui/app_gcp.py:351-367). */
  def anomalyOp(df: DataFrame, valueCol: String, threshold: Double): DataFrame =
    df.withColumn("is_anomaly", col(valueCol) > lit(threshold))

  /** Passthrough (reference: gui/app_gcp.py:369-370). */
  def passthroughOp(df: DataFrame): DataFrame = df

  /** Composable anomaly rules — the sensor rule set the reference applies
    * in its demos (reference: examples/test_with_real_data.py:40-44 —
    * range violations + sentinel values; gui/app_gcp.py:641). Each rule is
    * a named predicate; a row is anomalous if any rule fires, and the
    * firing rules are reported.
    */
  def anomalyRules(df: DataFrame, rules: Seq[(String, Column)]): DataFrame = {
    val flags = rules.map { case (name, pred) =>
      when(pred, lit(name)).otherwise(lit(null))
    }
    df.withColumn("fired_rules",
        filter(array(flags: _*), c => c.isNotNull))
      .withColumn("is_anomaly", size(col("fired_rules")) > 0)
  }
}
