package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Snapshot diff — the lakehouse CDC primitive: given two versions of a
  * keyed table, emit each key that was `added`, `removed`, or `changed`
  * (any non-key column differs, null-safe). Unchanged rows never leave
  * the join.
  *
  * Scale shape: one hash exchange per side on the key (the full-outer
  * sort-merge join Spark picks for two large sides; AQE splits skewed
  * keys), column comparison inline in the join output — no second
  * pass, no collect. Keys must be unique per snapshot (a duplicate key
  * makes "the row before/after" ambiguous) — checked fail-fast with
  * key-sized aggregates.
  */
object Diff {

  /** (keys..., change_type) for every key whose row changed between
    * `before` and `after`. Schemas must match exactly.
    */
  def snapshots(before: DataFrame, after: DataFrame, keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "diff: at least one key column")
    require(before.columns.sameElements(after.columns),
      s"diff: schemas differ — before(${before.columns.mkString(",")}) vs " +
        s"after(${after.columns.mkString(",")})")
    keys.foreach(k => require(before.columns.contains(k), s"diff: no key column $k"))
    val dataCols = before.columns.filterNot(keys.contains).toSeq
    def checkUnique(df: DataFrame, side: String): Unit = {
      val dup = df.groupBy(keys.map(col): _*).agg(count(lit(1)).as("c"))
        .where(col("c") > 1).limit(1).collect()
      require(dup.isEmpty,
        s"diff: $side snapshot has duplicate keys (e.g. ${dup.head}) — " +
          "a diff needs exactly one row per key per snapshot")
    }
    checkUnique(before, "before")
    checkUnique(after, "after")
    val b = before.select(keys.map(col) ++
      dataCols.map(c => col(c).as(s"__b_$c")) :+ lit(true).as("__b"): _*)
    val a = after.select(keys.map(col) ++
      dataCols.map(c => col(c).as(s"__a_$c")) :+ lit(true).as("__a"): _*)
    val anyChanged = dataCols.map(c => !(col(s"__b_$c") <=> col(s"__a_$c")))
      .reduceOption(_ || _).getOrElse(lit(false))
    b.join(a, keys, "full_outer")
      .withColumn("change_type",
        when(col("__b").isNull, lit("added"))
          .when(col("__a").isNull, lit("removed"))
          .when(anyChanged, lit("changed"))
          .otherwise(lit("unchanged")))
      .where(col("change_type") =!= "unchanged")
      .select(keys.map(col) :+ col("change_type"): _*)
  }
}
