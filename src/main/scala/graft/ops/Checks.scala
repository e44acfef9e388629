package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-quality validation gate (the dbt-test / Deequ shape): named
  * boolean rules evaluated over a table in ONE partial-aggregated pass
  * — every rule becomes a conditional count inside the same aggregate,
  * so a 100-rule suite over 100 TB costs exactly one scan and a
  * single-row exchange, never a scan per rule.
  *
  * A rule PASSES for a row when its column evaluates true; null rule
  * results count as violations (SQL three-valued logic would otherwise
  * silently pass null rows through a `col > 0` check).
  *
  * Output: (rule, n_rows, n_violations, pass) one row per rule in
  * declaration order — exact counts, so the oracle replays them.
  */
object Checks {

  def validate(df: DataFrame, rules: Seq[(String, Column)]): DataFrame = {
    require(rules.nonEmpty, "checks: at least one rule")
    require(rules.map(_._1).distinct.size == rules.size,
      s"checks: rule names must be unique, got ${rules.map(_._1).mkString(", ")}")
    val spark = df.sparkSession
    val aggs = count(lit(1)).as("__n") +:
      rules.map { case (name, rule) =>
        sum(when(coalesce(rule, lit(false)), 0L).otherwise(1L)).as(s"__v_$name")
      }
    val row = df.agg(aggs.head, aggs.tail: _*).head
    val n = row.getLong(0)
    import spark.implicits._
    rules.zipWithIndex.map { case ((name, _), i) =>
      val v = if (row.isNullAt(i + 1)) 0L else row.getLong(i + 1)
      (name, n, v, v == 0L)
    }.toDF("rule", "n_rows", "n_violations", "pass")
  }

  /** Continuous twin of [[validate]]: a RUNNING quality gate over a
    * stream — per micro-batch rule counts fold into cumulative totals
    * via Spark's native streaming aggregation state (no custom state
    * machine needed: the gate IS a grouped aggregate). Emit with
    * `outputMode("complete")` — each batch rewrites the R-row gate with
    * the totals over everything seen so far.
    *
    * Same one-scan shape as the batch gate: rules become an exploded
    * R-row struct array per input row, partial-aggregated map-side, so
    * the exchange carries at most R rows per partition regardless of
    * input volume. R is the rule count (small); the streaming state is
    * R rows total.
    *
    * Parity contract (spec-asserted): after the final micro-batch, the
    * gate equals [[validate]] over the union of all batches. Also works
    * on a batch DataFrame (same plan, no state) for callers that want
    * the grouped-aggregate form.
    */
  def validateStream(df: DataFrame, rules: Seq[(String, Column)]): DataFrame = {
    require(rules.nonEmpty, "checks: at least one rule")
    require(rules.map(_._1).distinct.size == rules.size,
      s"checks: rule names must be unique, got ${rules.map(_._1).mkString(", ")}")
    val pairs = rules.map { case (name, rule) =>
      struct(lit(name).as("rule"),
        when(coalesce(rule, lit(false)), 0L).otherwise(1L).as("v"))
    }
    df.select(explode(array(pairs: _*)).as("r"))
      .groupBy(col("r.rule").as("rule"))
      .agg(count(lit(1)).as("n_rows"), sum(col("r.v")).as("n_violations"))
      .withColumn("pass", col("n_violations") === 0L)
  }

  /** ANALYZE-style EXACT column profile in one scan: per named column,
    * row count, null count, exact distinct count, and double-cast
    * min/max — the statistics a planner's broadcast and skew decisions
    * read, and the drift baseline a pipeline monitors between loads.
    * Output one row per column: `(col_name, n_rows, n_nulls,
    * n_distinct, min_d, max_d)`.
    *
    * Scale shape: ONE aggregate over one scan; Spark serves the
    * multiple exact `count_distinct`s by Expand (the scan's rows
    * replicated |cols| ways into partial aggregates — the honest cost
    * of exactness; reach for the theta-sketch stores when |cols| is
    * large or the profile is maintained continuously). Min/max cast
    * to double for a uniform report row — profile numeric columns, or
    * accept null min/max where the cast is undefined.
    */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile: name at least one column")
    require(cols == cols.distinct, "profile: duplicate column names")
    cols.foreach(c => require(df.columns.contains(c), s"profile: no column $c"))
    val aggs = cols.flatMap { c =>
      Seq(count(col(c)).as(s"__c_$c"),
        countDistinct(col(c)).as(s"__d_$c"),
        min(col(c).cast("double")).as(s"__mn_$c"),
        max(col(c).cast("double")).as(s"__mx_$c"))
    }
    val one = df.agg(count(lit(1)).as("__n"), aggs: _*)
    one.select(explode(array(cols.map(c => struct(
        lit(c).as("col_name"),
        col("__n").as("n_rows"),
        (col("__n") - col(s"__c_$c")).as("n_nulls"),
        col(s"__d_$c").as("n_distinct"),
        col(s"__mn_$c").as("min_d"),
        col(s"__mx_$c").as("max_d"))): _*)).as("p"))
      .select(col("p.*"))
  }

  /** Join-skew report BEFORE running the join: per-key cardinalities
    * of both sides, each key's exact inner-join output contribution
    * (n_left·n_right), the exact total output rows, and each hot
    * key's share in 1e6 fixed point — the "why would this join
    * explode" diagnostic that decides salting/broadcast up front.
    *
    * Exact integer arithmetic end to end (contributions accumulate in
    * DECIMAL(38,0)); output is the top `k` keys by (contribution
    * desc, key asc). Keys present on one side only contribute nothing
    * and never surface (they produce no join rows).
    *
    * Scale shape: two per-side count aggregates (map-side partial) —
    * the only row-sized work — joined at KEY cardinality; the top-k
    * is a TakeOrderedAndProject over the key-sized frame, never a
    * full sort of data.
    */
  def joinSkewReport(left: DataFrame, lkey: Column,
                     right: DataFrame, rkey: Column, k: Int): DataFrame = {
    require(k >= 1, "joinSkewReport: k must be >= 1")
    val cl = left.select(lkey.as("key")).where(col("key").isNotNull)
      .groupBy(col("key")).agg(count(lit(1)).as("n_left"))
    val cr = right.select(rkey.as("key")).where(col("key").isNotNull)
      .groupBy(col("key")).agg(count(lit(1)).as("n_right"))
    val per = cl.join(cr, Seq("key"))
      .withColumn("contrib",
        col("n_left").cast("decimal(38,0)") * col("n_right").cast("decimal(38,0)"))
      .localCheckpoint() // the total and the top-k both read it
    val tot = per.agg(coalesce(sum(col("contrib")),
      lit(0).cast("decimal(38,0)"))).head.getDecimal(0)
    per.orderBy(col("contrib").desc, col("key").asc).limit(k)
      .select(col("key"), col("n_left"), col("n_right"),
        col("contrib").cast("long").as("contrib"),
        lit(tot).cast("long").as("total_rows"),
        expr(s"CAST(contrib * 1000000 div CAST('$tot' AS DECIMAL(38,0)) AS BIGINT)")
          .as("share_fp"))
  }

  /** Pairwise Pearson correlations over integral feature columns in
    * ONE scan — the profiler's second moment: feature redundancy
    * screens, drift root-causing, "which quality signals co-move".
    *
    * Exactness posture: all five moments (Σx, Σy, Σxy, Σx², Σy²)
    * accumulate in DECIMAL(38,0) — exact integer arithmetic, no FP
    * summation-order drift, engine-portable (`value` columns must be
    * integral: scale currency to cents first). The correlation itself
    * is then ONE deterministic double expression over the double-cast
    * moments, identical on any engine from identical moments. Pairs
    * with n < 2 or zero variance report r = NULL.
    *
    * Scale shape: one aggregate over one scan serves all m·(m−1)/2
    * pairs (each moment is a plain conditional sum — no Expand, unlike
    * [[profile]]'s exact distincts); output is pair-sized. Null
    * handling is pairwise-complete: a row counts toward a pair iff
    * both sides are non-null.
    */
  def correlations(df: DataFrame, cols: Seq[(String, Column)]): DataFrame = {
    require(cols.size >= 2, "correlations: need at least two columns")
    val names = cols.map(_._1)
    require(names == names.distinct, "correlations: duplicate column names")
    cols.foreach { case (n, c) =>
      val t = df.select(c.as("__v")).schema.head.dataType.simpleString
      require(Seq("bigint", "int", "smallint", "tinyint").contains(t),
        s"correlations: $n must be integral for exact moments (got $t)")
    }
    val proj = df.select(cols.map { case (n, c) =>
      c.cast("decimal(38,0)").as(s"__x_$n") }: _*)
    val pairs = for {
      i <- names.indices; j <- names.indices if i < j
    } yield (names(i), names(j))
    val aggs = pairs.flatMap { case (a, b) =>
      val (x, y) = (col(s"__x_$a"), col(s"__x_$b"))
      val both = x.isNotNull && y.isNotNull
      val z = lit(0).cast("decimal(38,0)")
      Seq(
        sum(when(both, 1L).otherwise(0L)).as(s"__n_${a}_$b"),
        sum(when(both, x).otherwise(z)).as(s"__sx_${a}_$b"),
        sum(when(both, y).otherwise(z)).as(s"__sy_${a}_$b"),
        sum(when(both, x * y).otherwise(z)).as(s"__sxy_${a}_$b"),
        sum(when(both, x * x).otherwise(z)).as(s"__sxx_${a}_$b"),
        sum(when(both, y * y).otherwise(z)).as(s"__syy_${a}_$b"))
    }
    val one = proj.agg(aggs.head, aggs.tail: _*)
    one.select(explode(array(pairs.map { case (a, b) =>
      val nD = col(s"__n_${a}_$b").cast("double")
      val sx = col(s"__sx_${a}_$b").cast("double")
      val sy = col(s"__sy_${a}_$b").cast("double")
      val sxy = col(s"__sxy_${a}_$b").cast("double")
      val sxx = col(s"__sxx_${a}_$b").cast("double")
      val syy = col(s"__syy_${a}_$b").cast("double")
      val denom = sqrt((nD * sxx) - (sx * sx)) * sqrt((nD * syy) - (sy * sy))
      struct(
        lit(a).as("col_a"), lit(b).as("col_b"),
        col(s"__n_${a}_$b").as("n"),
        sx.as("sum_a"), sy.as("sum_b"), sxy.as("sum_ab"),
        sxx.as("sum_aa"), syy.as("sum_bb"),
        // zero variance (or n < 2) → NULL, and the guard also keeps
        // ANSI mode from raising on the zero divisor
        when(denom > 0, ((nD * sxy) - (sx * sy)) / denom).as("r"))
    }: _*)).as("p"))
      .select(col("p.*"))
  }
  /** Period-over-period delta attribution — the "why did the metric
    * move" decomposition: per key, the metric's previous-period and
    * current-period totals, the delta, and each key's share of the
    * TOTAL movement. The first question every metrics regression
    * review asks, answered in one pass: keys ranked by |delta| ARE
    * the movers; shares > 1 (or negative) are keys moving against
    * the net direction — exactly the mix-shift signal a plain
    * per-key trend hides.
    *
    * Exactness: totals are integral sums (the house cents
    * convention, fail-fast checked); the share is ONE deterministic
    * double expression over those exact longs (the q202/q208
    * posture), NULL when the net delta is zero (no direction to
    * attribute against — the ANSI divide-by-zero shield doubling as
    * the honest answer).
    *
    * Scale shape: one partial-aggregated scan to key grain, a
    * single-row total joined back by broadcast — nothing row-sized
    * exchanges twice. Output: (keys..., prev, cur, delta, share).
    */
  def deltaAttribution(df: DataFrame, keys: Seq[String], isCurrent: Column,
                       value: Column): DataFrame = {
    require(keys.nonEmpty, "deltaAttribution: at least one key column")
    val vType = df.select(value.as("__v")).schema.head.dataType.simpleString
    require(Seq("bigint", "int", "smallint", "tinyint").contains(vType),
      s"deltaAttribution: value must be integral exact (got $vType) — " +
        "cast money to cents first (the house convention)")
    val per = df.groupBy(keys.map(col): _*)
      .agg(coalesce(sum(when(!isCurrent, value)), lit(0L)).as("prev"),
        coalesce(sum(when(isCurrent, value)), lit(0L)).as("cur"))
      .withColumn("delta", col("cur") - col("prev"))
      // key-grain (tiny) — pin it so the total below reuses THIS scan
      // instead of re-running the corpus aggregate a second time
      .localCheckpoint()
    val total = per.agg(sum(col("delta")).as("__total"))
    per.crossJoin(broadcast(total))
      .withColumn("share",
        when(col("__total") =!= 0,
          col("delta").cast("double") / col("__total").cast("double")))
      .drop("__total")
  }
}
