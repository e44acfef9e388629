package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sketch-partitioned distinct analytics — the 100 TB answer to
  * "how many distinct X in an arbitrary slice of the corpus, and how do
  * two slices overlap" without ever re-reading the events.
  *
  * The pattern: ONE pass over the corpus builds a standing table of
  * per-(group, bucket) theta sketches (Apache DataSketches, the
  * engine-native `theta_sketch_agg` family — buckets are typically
  * days). Every later question is answered from the sketch table alone:
  * distinct-over-range is a union of bucket sketches, overlap/churn
  * between two slices is sketch intersection/difference — set algebra
  * plain distinct counts cannot do at all (distinct counts don't
  * subtract: |A ∪ B| tells you nothing about |A ∩ B| without a re-scan).
  *
  * Exactness regime: a theta sketch stays in EXACT mode (theta = 1,
  * every 64-bit value hash retained) until it exceeds its nominal entry
  * count 2^lgK. While every participating sketch is exact, union /
  * intersection / difference are literal hash-set operations and the
  * estimates are exact counts (collisions: 64-bit hashes, ~n²/2⁶⁵ —
  * deterministic per dataset, asserted empirically in SketchesSpec and
  * guarded in-plan by the gate queries, the q44 convention). Beyond the
  * regime the same plans degrade gracefully to ±1.6% estimates
  * (lgK = 12 default bound) instead of failing — the behavior a
  * dashboard over 100 TB wants.
  *
  * Scale shape: the build is one partial-aggregated groupBy (sketches
  * combine map-side; the exchange carries (group, bucket)-sized sketch
  * payloads, never raw rows). Range/overlap queries read ONLY the
  * standing table — bucket-pruned by any pushable predicate — and
  * exchange group-count rows. Sketch size is bounded by min(distinct,
  * 2^lgK)·8 bytes.
  *
  * Reference capability: the GUI aggregate path re-counts distincts
  * from raw rows per query (`taskmanager/operators/files.py`); this is
  * the build-once / slice-many form.
  */
object Sketches {

  /** The standing table: one theta sketch of `value` per (groups...,
    * bucket). `lgK` is the nominal-entries exponent — the exact-mode
    * capacity is 2^lgK distinct values per sketch.
    */
  def thetaBuckets(df: DataFrame, groups: Seq[Column], bucket: Column,
                   value: Column, lgK: Int = 20): DataFrame = {
    require(lgK >= 4 && lgK <= 26, s"thetaBuckets: lgK $lgK outside [4, 26]")
    df.groupBy((groups :+ bucket.as("bucket")): _*)
      .agg(theta_sketch_agg(value, lgK).as("sketch"))
  }

  /** Distinct count per group over every bucket row passing `pred` —
    * a union of bucket sketches, zero corpus reads.
    */
  def distinctOver(buckets: DataFrame, groups: Seq[String], pred: Column,
                   out: String = "distinct_count", lgK: Int = 20): DataFrame =
    // the union's own nominal-entry bound must not undercut the bucket
    // sketches' — a default-k union would downsample exact inputs
    buckets.where(pred)
      .groupBy(groups.map(col): _*)
      .agg(theta_sketch_estimate(theta_union_agg(col("sketch"), lgK)).as(out))

  /** Set algebra between two bucket slices per group: how many values
    * appear in both slices, only in A, only in B — plus each slice's
    * own distinct count. `only_a` is the churn count (present in A,
    * gone in B) when A and B are consecutive time ranges.
    *
    * One pass over the (tiny) bucket table: the two slice unions ride
    * the same aggregate via null-skipped conditional inputs, then the
    * intersection/difference are per-group scalar sketch ops.
    */
  def overlapOver(buckets: DataFrame, groups: Seq[String],
                  predA: Column, predB: Column, lgK: Int = 20): DataFrame =
    buckets.where(predA || predB)
      .groupBy(groups.map(col): _*)
      .agg(
        theta_union_agg(when(predA, col("sketch")), lgK).as("__a"),
        theta_union_agg(when(predB, col("sketch")), lgK).as("__b"))
      .select(groups.map(col) ++ Seq(
        theta_sketch_estimate(theta_intersection(col("__a"), col("__b")))
          .as("in_both"),
        theta_sketch_estimate(theta_difference(col("__a"), col("__b")))
          .as("only_a"),
        theta_sketch_estimate(theta_difference(col("__b"), col("__a")))
          .as("only_b"),
        theta_sketch_estimate(col("__a")).as("a_total"),
        theta_sketch_estimate(col("__b")).as("b_total")): _*)
}
