package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Join operators.
  *
  * The reference implements exactly one join: a keyed stream-stream interval
  * equi-join, inner only — two per-key buffers matched within
  * |ts_l - ts_r| <= bound, buffers evicted by watermark
  * (reference: taskmanager/operators/stateful.py:345-465;
  * examples/stream_join.py:38-126 — click/impression attribution within
  * 5 minutes on ad_id). Everything else (broadcast/semi/anti/outer, join
  * strategy selection) is absent there and free on Catalyst; we expose it
  * as part of the engine surface (SURVEY §2.6).
  *
  * Scale notes: the interval join is an equi-join on the key plus a range
  * predicate — Spark shuffles both sides by key once and filters within
  * the key group, which is the same state-bounding the reference's
  * watermark eviction achieves. Dimension joins should broadcast
  * (`broadcastJoin`) — no shuffle of the fact side at all.
  */
object Joins {

  /** Interval equi-join (reference: stateful.py:345-465). Timestamps are
    * compared at millisecond precision on both sides, matching the
    * reference's epoch-ms record timestamps (common/serialization.py:150).
    * Inner only, like the reference.
    */
  def intervalJoin(
      left: DataFrame, right: DataFrame,
      leftKey: Column, rightKey: Column,
      leftTs: Column, rightTs: Column,
      boundMs: Long): DataFrame = {
    val cond = leftKey === rightKey &&
      abs(unix_millis(leftTs) - unix_millis(rightTs)) <= boundMs
    left.join(right, cond, "inner")
  }

  /** Binned (bucketed) range join — a point-in-interval join with NO
    * equi-key. Spark plans a keyless range predicate as a broadcast
    * nested loop (every left row tested against every interval — |L|·|R|
    * work, a scale-killer); binning manufactures the missing equi-key:
    * each interval explodes to the `binMs`-wide bins it overlaps, points
    * hash to their own bin, and the join runs as an ordinary hash join on
    * the bin id with the exact range predicate re-applied inside the
    * matched bin. Results are identical to the naive join (an interval
    * covers a point iff they share the point's bin).
    *
    * Work per interval = span/binMs + 1 exploded rows — size `binMs` near
    * the TYPICAL interval span so each interval lands in a handful of
    * bins and each bin holds few intervals. A pathological interval
    * (span ≫ binMs) multiplies rows, so the explode fails fast past
    * `maxBinsPerInterval`. The range predicate compares at epoch-µs —
    * Spark's native timestamp precision (oracle equivalent: `epoch_us`);
    * null timestamps/bounds drop (inner semantics).
    */
  def binnedRangeJoin(points: DataFrame, pTs: Column,
                      intervals: DataFrame, iStart: Column, iEnd: Column,
                      binMs: Long, maxBinsPerInterval: Int = 1024): DataFrame = {
    require(binMs > 0, "binMs must be positive")
    require(maxBinsPerInterval > 0, "maxBinsPerInterval must be positive")
    val reserved = Seq("__bin", "__p_us", "__s_us", "__e_us")
    require((points.columns ++ intervals.columns).intersect(reserved).isEmpty,
      s"inputs use reserved column names: ${reserved.mkString(", ")}")
    val binUs = binMs * 1000L
    // resolve the caller's columns on their own frames, then work on
    // internal names — a shared column name across the two sides would
    // make post-join predicates ambiguous
    val pts = points.withColumn("__p_us", unix_micros(pTs))
      .where(col("__p_us").isNotNull)
      .withColumn("__bin", floor(col("__p_us") / binUs).cast("long"))
    val ivs = intervals
      .withColumn("__s_us", unix_micros(iStart))
      .withColumn("__e_us", unix_micros(iEnd))
      .where(col("__s_us").isNotNull && col("__e_us").isNotNull &&
        col("__s_us") <= col("__e_us"))
    val nBins = (floor(col("__e_us") / binUs) - floor(col("__s_us") / binUs) + 1)
      .cast("long")
    val guarded = when(nBins > maxBinsPerInterval, raise_error(concat(
        lit(s"binnedRangeJoin: an interval spans more than $maxBinsPerInterval " +
          s"bins of $binMs ms (span bins = "), nBins.cast("string"),
        lit(") — widen binMs or split the interval"))))
      .otherwise(nBins)
    val binned = ivs
      .withColumn("__bin", explode(sequence(lit(0L), guarded - 1)))
      .withColumn("__bin", col("__bin") + floor(col("__s_us") / binUs).cast("long"))
    pts.join(binned, Seq("__bin"))
      .where(col("__p_us") >= col("__s_us") && col("__p_us") <= col("__e_us"))
      .drop("__bin", "__p_us", "__s_us", "__e_us")
  }

  /** Binned interval-OVERLAP join — the two-sided sibling of
    * [[binnedRangeJoin]]: pairs of intervals from `a` and `b` that
    * overlap (aS ≤ bE ∧ bS ≤ aE) with no equi-key, as a hash join on
    * the manufactured bin id instead of Spark's nested loop. Both sides
    * explode to the bins they span; a pair sharing SEVERAL bins would
    * match once per shared bin, so the match is admitted only in the
    * first shared bin — max of the two start bins — which dedups
    * exactly without a distinct (the first shared bin of an overlapping
    * pair always exists: both intervals cover it). Same µs precision,
    * null handling and fail-fast span guard as [[binnedRangeJoin]].
    */
  def binnedOverlapJoin(a: DataFrame, aStart: Column, aEnd: Column,
                        b: DataFrame, bStart: Column, bEnd: Column,
                        binMs: Long, maxBinsPerInterval: Int = 1024): DataFrame = {
    require(binMs > 0, "binMs must be positive")
    require(maxBinsPerInterval > 0, "maxBinsPerInterval must be positive")
    val reserved = Seq("__bin", "__a_s", "__a_e", "__b_s", "__b_e")
    require((a.columns ++ b.columns).intersect(reserved).isEmpty,
      s"inputs use reserved column names: ${reserved.mkString(", ")}")
    val binUs = binMs * 1000L
    def explodeBins(df: DataFrame, s: Column, e: Column,
                    sName: String, eName: String): DataFrame = {
      val prepped = df.withColumn(sName, unix_micros(s)).withColumn(eName, unix_micros(e))
        .where(col(sName).isNotNull && col(eName).isNotNull && col(sName) <= col(eName))
      val nBins = (floor(col(eName) / binUs) - floor(col(sName) / binUs) + 1).cast("long")
      val guarded = when(nBins > maxBinsPerInterval, raise_error(concat(
          lit(s"binnedOverlapJoin: an interval spans more than $maxBinsPerInterval " +
            s"bins of $binMs ms (span bins = "), nBins.cast("string"),
          lit(") — widen binMs or split the interval"))))
        .otherwise(nBins)
      prepped.withColumn("__bin", explode(sequence(lit(0L), guarded - 1)))
        .withColumn("__bin", col("__bin") + floor(col(sName) / binUs).cast("long"))
    }
    explodeBins(a, aStart, aEnd, "__a_s", "__a_e")
      .join(explodeBins(b, bStart, bEnd, "__b_s", "__b_e"), Seq("__bin"))
      .where(col("__a_s") <= col("__b_e") && col("__b_s") <= col("__a_e") &&
        col("__bin") === greatest(
          floor(col("__a_s") / binUs).cast("long"),
          floor(col("__b_s") / binUs).cast("long")))
      .drop("__bin", "__a_s", "__a_e", "__b_s", "__b_e")
  }

  /** Broadcast a small dimension side — replicate the dim to every task
    * instead of shuffling the fact table (the reference's BROADCAST edge
    * type, job_graph.py:11-17, which its fluent API never actually emits).
    */
  def broadcastJoin(fact: DataFrame, dim: DataFrame, cond: Column, how: String = "inner"): DataFrame =
    fact.join(broadcast(dim), cond, how)

  /** EXISTS — rows of `left` with a match in `right`. */
  def semiJoin(left: DataFrame, right: DataFrame, cond: Column): DataFrame =
    left.join(right, cond, "left_semi")

  /** NOT EXISTS — rows of `left` with no match in `right`. */
  def antiJoin(left: DataFrame, right: DataFrame, cond: Column): DataFrame =
    left.join(right, cond, "left_anti")

  /** Salted equi-join for skewed keys: the skewed (large) side gets a
    * deterministic salt in [0, buckets) hashed from caller-supplied stable
    * row columns (e.g. the row's primary key — NOT the join key, which is
    * constant on the hot key and would put the whole hot key in one
    * bucket); the small side is exploded `buckets`-fold so every salted
    * key finds its match. Use when one key dominates (AQE's skew-join
    * split handles moderate skew; salting handles the pathological
    * single-hot-key case at 100 TB). Hashing stable columns — never
    * `monotonically_increasing_id()`/`rand()` — keeps row-to-bucket
    * placement identical across runs, partitionings and task retries.
    */
  def saltedJoin(skewed: DataFrame, small: DataFrame,
                 leftKey: Column, rightKey: Column,
                 saltCols: Seq[Column],
                 buckets: Int, how: String = "inner"): DataFrame = {
    require(saltCols.nonEmpty, "saltCols: pass stable row-identity columns of the skewed side")
    val salted = skewed.withColumn("_salt", saltExpr(saltCols, buckets))
    val exploded = small.withColumn("_salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    salted.join(exploded,
        leftKey === rightKey && salted("_salt") === exploded("_salt"), how)
      .drop("_salt")
  }

  /** The salt bucket for a row — pure function of the given columns. */
  def saltExpr(saltCols: Seq[Column], buckets: Int): Column =
    pmod(xxhash64(saltCols: _*), lit(buckets)).cast("int")

  /** As-of (point-in-time) join: for every left row, attach the newest
    * right row of the same key with rightTs <= leftTs — the
    * price-at-trade-time / last-click-before-purchase lookup that Spark
    * has no native operator for.
    *
    * Spark-first shape: tag the sides, UNION them, and carry the right
    * payload forward with an ignore-nulls `last` window ordered by
    * (ts, side) within each key — ONE shuffle of both sides by key and
    * one within-partition sort, which is the minimum any as-of algorithm
    * pays. No row explosion, no per-left range scan: at 100 TB this
    * behaves exactly like a keyed window (partial shuffles, AQE skew
    * handling), unlike the naive `l JOIN r ON ts >= ts` + argmax which
    * is quadratic per key.
    *
    * Right rows at the SAME (key, ts) are ambiguous under as-of
    * semantics — pre-aggregate the right side to one row per (key, ts)
    * for deterministic output. Returns every left column plus an `asof`
    * struct of the carried columns (null when the key has no right row
    * at-or-before). Ties at equal ts match (right sorts before left).
    */
  def asofJoin(left: DataFrame, right: DataFrame,
               leftKey: Column, rightKey: Column,
               leftTs: Column, rightTs: Column,
               carry: Seq[(String, Column)]): DataFrame = {
    require(carry.nonEmpty, "carry: name the right-side columns to attach")
    val reserved = Seq("_k", "_ts", "_side", "_carry", "asof")
    require(left.columns.intersect(reserved).isEmpty,
      s"left side uses reserved column names: ${reserved.mkString(", ")}")
    import org.apache.spark.sql.expressions.Window

    // SQL equality semantics: NULL never matches NULL. Window.partitionBy
    // WOULD group null keys together (and a null ts compares low), so
    // right rows with a null key or ts are dropped up front — left rows
    // keep left-join semantics and surface a null `asof` instead.
    val rightPrepped = right
      .where(rightKey.isNotNull && rightTs.isNotNull)
      .select(rightKey.as("_k"), rightTs.as("_ts"),
        lit(0).as("_side"),
        struct(carry.map { case (n, c) => c.as(n) }: _*).as("_carry"))
    val carryType = rightPrepped.schema("_carry").dataType
    val leftFields = left.schema.fields.toSeq

    val leftSide = left.select(
      leftFields.map(f => col(f.name)) ++
        Seq(leftKey.as("_k"), leftTs.as("_ts"), lit(1).as("_side"),
          lit(null).cast(carryType).as("_carry")): _*)
    val rightSide = rightPrepped.select(
      leftFields.map(f => lit(null).cast(f.dataType).as(f.name)) ++
        Seq(col("_k"), col("_ts"), col("_side"), col("_carry")): _*)

    val w = Window.partitionBy(col("_k")).orderBy(col("_ts"), col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    leftSide.unionByName(rightSide)
      .withColumn("asof", last(col("_carry"), ignoreNulls = true).over(w))
      .where(col("_side") === 1)
      .select(leftFields.map(f => col(f.name)) :+ col("asof"): _*)
  }

  /** NEAREST-in-time join: each left row attaches the right row with
    * the minimum |Δts| within its key — sensor alignment, "closest
    * quote to this trade", nearest-reading enrichment — where
    * [[asofJoin]]'s backward-only semantics would skip a reading just
    * after the event. Ties (equal distance both sides) take the
    * EARLIER right row. Timestamps must be integral (epoch units —
    * the house epoch-ms/µs convention; distance needs arithmetic).
    *
    * Same scale shape as [[asofJoin]]: one keyed union exchange, one
    * per-key sort serving BOTH directions (backward carry via a
    * trailing last, forward via a leading first — two frames, one
    * sort), no range explosion, no join node. Right rows at the same
    * (key, ts) are ambiguous — pre-aggregate for determinism. Returns
    * every left column plus `nearest` (carried struct, null when the
    * key has no right row) and `nearest_dt` (right ts − left ts).
    */
  def asofNearest(left: DataFrame, right: DataFrame,
                  leftKey: Column, rightKey: Column,
                  leftTs: Column, rightTs: Column,
                  carry: Seq[(String, Column)]): DataFrame = {
    require(carry.nonEmpty, "carry: name the right-side columns to attach")
    val reserved = Seq("_k", "_ts", "_side", "_pc", "nearest", "nearest_dt")
    require(left.columns.intersect(reserved).isEmpty,
      s"left side uses reserved column names: ${reserved.mkString(", ")}")
    Seq(("left", left, leftTs), ("right", right, rightTs)).foreach {
      case (side, df, ts) =>
        val t = df.select(ts.as("__t")).schema.head.dataType.simpleString
        require(Seq("bigint", "int", "smallint", "tinyint").contains(t),
          s"asofNearest: $side ts must be integral epoch units (got $t)")
    }
    import org.apache.spark.sql.expressions.Window

    val rightPrepped = right
      .where(rightKey.isNotNull && rightTs.isNotNull)
      .select(rightKey.as("_k"), rightTs.cast("long").as("_ts"),
        lit(0).as("_side"),
        struct((("_mts", rightTs.cast("long")) +: carry).map {
          case (n, c) => c.as(n) }: _*).as("_pc"))
    val pcType = rightPrepped.schema("_pc").dataType
    val leftFields = left.schema.fields.toSeq
    val leftSide = left.select(
      leftFields.map(f => col(f.name)) ++
        Seq(leftKey.as("_k"), leftTs.cast("long").as("_ts"), lit(1).as("_side"),
          lit(null).cast(pcType).as("_pc")): _*)
    val rightSide = rightPrepped.select(
      leftFields.map(f => lit(null).cast(f.dataType).as(f.name)) ++
        Seq(col("_k"), col("_ts"), col("_side"), col("_pc")): _*)

    val ord = Window.partitionBy(col("_k")).orderBy(col("_ts"), col("_side"))
    val back = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val fwd = ord.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val prev = col("__prev")
    val next = col("__next")
    val dPrev = col("_ts") - prev.getField("_mts") // >= 0
    val dNext = next.getField("_mts") - col("_ts") // > 0 (equal ts lands in prev)
    val pick = when(prev.isNull, next)
      .when(next.isNull, prev)
      .when(dPrev <= dNext, prev).otherwise(next)
    leftSide.unionByName(rightSide)
      .withColumn("__prev", last(col("_pc"), ignoreNulls = true).over(back))
      .withColumn("__next", first(col("_pc"), ignoreNulls = true).over(fwd))
      .where(col("_side") === 1)
      .withColumn("__pick", pick)
      .select(leftFields.map(f => col(f.name)) ++ Seq(
        col("__pick").dropFields("_mts").as("nearest"),
        (col("__pick").getField("_mts") - col("_ts")).as("nearest_dt")): _*)
  }
}
