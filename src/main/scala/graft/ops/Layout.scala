package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout operators (north-star extension): Z-order (Morton-curve)
  * clustering for multi-column scan pruning — what Delta/Iceberg expose
  * as `OPTIMIZE ... ZORDER BY`. Parquet readers skip row groups whose
  * min/max footer stats exclude the predicate; a single-column sort gives
  * perfect locality on ONE column and none on the rest, while Z-ordering
  * interleaves the bits of several columns so every file covers a small
  * hyper-box of the key space — predicates on ANY of the columns prune.
  *
  * The Z-value is pure integer arithmetic: each column min/max-normalizes
  * to `bits` bits ((x−min)·(2^bits−1) div max(max−min, 1) — truncating
  * division, engine-portable), and bit i of column j lands at position
  * i·ncols+j. Deterministic and engine-exact, so the oracle replays it;
  * the min/max pass is one tiny aggregate folded into a broadcast row.
  *
  * At 100 TB: `zorderWrite` is one range exchange on the Z-value (range,
  * not hash — files get contiguous curve segments) plus an in-partition
  * sort; the curve computation itself is a narrow codegen'd projection.
  */
object Layout {

  /** Append a `zval` column: the Morton interleave of `cols` (integral
    * columns), each normalized to `bits` bits against its own min/max.
    * `ncols·bits` must fit in 63 bits.
    */
  def withZValue(df: DataFrame, cols: Seq[Column], bits: Int = 16): DataFrame = {
    require(cols.nonEmpty, "zorder needs at least one column")
    require(bits > 0 && cols.size * bits <= 63,
      s"${cols.size} cols x $bits bits exceed a Long's 63 value bits")
    // same reserved-name posture as Joins.binnedRangeJoin: the working
    // min/max columns and the appended zval would otherwise collide with
    // (or silently shadow) same-named input columns
    val reserved = cols.indices.flatMap(j => Seq(s"mn$j", s"mx$j")) :+ "zval"
    require(df.columns.intersect(reserved).isEmpty,
      s"input columns ${df.columns.intersect(reserved).mkString(", ")} " +
        "collide with zorder working names (mnN/mxN/zval) — rename them first")
    val named = cols.zipWithIndex.map { case (c, j) => (c.cast("long"), s"__z$j") }
    val statCols = named.zipWithIndex.flatMap { case ((c, _), j) =>
      Seq(min(c).as(s"mn$j"), max(c).as(s"mx$j")) }
    val stats = df.agg(statCols.head, statCols.tail: _*)
    val maxVal = (1L << bits) - 1
    // (x−mn)·maxVal must stay ≤ 2^53 so the exact-division arithmetic
    // below is lossless (the quotient itself is ≤ maxVal); wider-ranged
    // columns must be pre-bucketed or use fewer bits — fail fast, a
    // silently off-by-one curve would quietly degrade pruning
    val spanBound = (1L << 53) / maxVal
    val withStats = df.crossJoin(broadcast(stats))
    val zval = named.indices.map { j =>
      val x = named(j)._1
      val mn = col(s"mn$j")
      val span0 = greatest(col(s"mx$j") - mn, lit(1L))
      val span = when(span0 > spanBound, raise_error(concat(
          lit(s"zorder column $j range exceeds the exact-arithmetic bound " +
            s"$spanBound at bits=$bits — pre-bucket the column or lower bits; span="),
          span0.cast("string")))).otherwise(span0)
      val nz = ((x - mn) * maxVal - pmod((x - mn) * maxVal, span)) / span
      val nzL = nz.cast("long")
      (0 until bits).map { i =>
        shiftright(nzL, i).bitwiseAND(lit(1L)) * lit(1L << (i * named.size + j))
      }.reduce(_ + _)
    }.reduce(_ + _)
    withStats.withColumn("zval", zval)
      .drop(named.indices.flatMap(j => Seq(s"mn$j", s"mx$j")): _*)
  }

  /** Rewrite `df` Z-ordered into `path`: range-partition on the Z-value
    * into `numFiles` contiguous curve segments, sort within each, write
    * parquet (zval itself is not persisted — it is a layout key, not
    * data). Each output file then covers a small hyper-box of the key
    * space, so parquet min/max row-group stats prune scans filtered on
    * any zorder column.
    */
  def zorderWrite(df: DataFrame, cols: Seq[Column], path: String,
                  numFiles: Int, bits: Int = 16): Unit = {
    require(numFiles > 0, "numFiles must be positive")
    withZValue(df, cols, bits)
      .repartitionByRange(numFiles, col("zval"))
      .sortWithinPartitions(col("zval"))
      .drop("zval")
      .write.mode("overwrite").parquet(path)
  }
}
