package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling/splitting for training-data pipelines
  * (north-star extension).
  *
  * Splits are a pure function of the row key — md5 of the key string,
  * compared lexicographically on the hex prefix — so they are
  * reproducible across runs, partitionings, AND engines (md5 hex is
  * portable; no RNG state, no `rand()`). The 100 TB property that matters:
  * re-running the pipeline, or computing the split in a different system,
  * assigns every row to the same fold.
  */
object Sampling {

  /** Hex-prefix hash bucket in [0, 256) for a key column. */
  def hashBucket(key: Column): Column =
    conv(substring(md5(key.cast("string")), 1, 2), 16, 10).cast("int")

  /** Keep ~fraction of rows, deterministically by key. */
  def deterministicSample(df: DataFrame, key: Column, fraction: Double): DataFrame =
    df.where(hashBucket(key) < math.round(fraction * 256).toInt)

  /** Train/val/test fold label by key hash; fractions must sum to <= 1,
    * remainder goes to "test".
    */
  def foldLabel(key: Column, trainFrac: Double, valFrac: Double): Column = {
    val b = hashBucket(key)
    val trainHi = math.round(trainFrac * 256).toInt
    val valHi = trainHi + math.round(valFrac * 256).toInt
    when(b < trainHi, "train").when(b < valHi, "val").otherwise("test")
  }

  def split(df: DataFrame, key: Column, trainFrac: Double = 0.8,
            valFrac: Double = 0.1): DataFrame =
    df.withColumn("fold", foldLabel(key, trainFrac, valFrac))

  /** Domain-weighted mixture sampling: keep a per-domain fraction of
    * rows, deterministically by key — the standard way training mixtures
    * up/down-weight sources (wiki at 1.0, raw web at 0.1, …). A pure
    * per-row predicate on (key hash, domain), so it runs narrow inside
    * the scan's codegen span: no shuffle, no RNG state, and re-running
    * on any partitioning — or in another engine — keeps exactly the
    * same rows. Weights are quantized to /256 buckets (same contract as
    * [[foldLabel]]); a weight ≥ 1.0 keeps everything.
    */
  def mixtureSample(df: DataFrame, key: Column, domain: Column,
                    weights: Map[String, Double],
                    defaultWeight: Double = 1.0): DataFrame = {
    def buckets(w: Double): Int = math.min(256, math.round(w * 256).toInt)
    val threshold = weights.toSeq.sortBy(_._1).foldLeft(lit(buckets(defaultWeight))) {
      case (acc, (dom, w)) => when(domain === dom, lit(buckets(w))).otherwise(acc)
    }
    df.where(hashBucket(key) < threshold)
  }

  /** Exact-count stratified take: deterministically keep exactly n rows
    * per domain (fractions can't hit a target budget exactly; this can).
    * Rows rank by md5-of-key order — uniform, reproducible, engine-
    * portable — and the per-domain selection is a bounded-heap top-k
    * aggregate ([[graft.functions.Kernels.collect_bottom_k]]), so at
    * most n rows per domain per map partition shuffle: no per-domain
    * window sort, same scale shape as the ANN rankings. Returns
    * (dom, key, rk); semi-join on key to recover full rows.
    */
  def stratifiedTake(df: DataFrame, key: Column, domain: Column, n: Int): DataFrame =
    df.select(domain.as("dom"),
        struct(md5(key.cast("string")).as("h"), key.as("k")).as("s"))
      .groupBy(col("dom"))
      .agg(graft.functions.Kernels.collect_bottom_k(col("s"), n).as("take"))
      .select(col("dom"), posexplode(col("take")).as(Seq("pos", "s")))
      .select(col("dom"), col("s").getField("k").as("key"),
        (col("pos") + 1).cast("long").as("rk"))
}
