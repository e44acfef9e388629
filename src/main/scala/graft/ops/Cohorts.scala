package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Cohort retention over an event stream: users grouped by the period
  * of their FIRST anchor event (e.g. signup week), then counted as
  * active in each later period they produced any event — the classic
  * retention triangle, exact and engine-portable (period arithmetic is
  * integer epoch-ms division).
  *
  * Scale shape: both per-user passes (anchor min, active-period set)
  * aggregate on user_id, so the join that lines them up REUSES the
  * same hash partitioning — no third corpus-sized exchange
  * (plan-asserted). Per-user state is the set of DISTINCT active
  * periods (weeks, not events), a few hundred entries at most; the
  * retention cells that leave the join are cohort×offset counts, tiny.
  *
  * Reference scope: like [[Funnel]], the canonical next analytics query
  * on the reference's event tables (SURVEY §2.4 stops at windowed
  * aggregates).
  */
object Cohorts {

  /** Retention counts: (cohort_ms, period_offset, n_active) — cohort_ms
    * is the cohort period's start epoch-ms, offset 0 is the anchor
    * period itself (its n_active = cohort size: every anchored user is
    * active in the period they anchored). Activity BEFORE the anchor
    * period does not count (offset ≥ 0). Users without an anchor event
    * are absent.
    */
  def retention(events: DataFrame, user: Column, etype: Column, time: Column,
                anchorType: String, periodMs: Long = 7L * 24 * 3600 * 1000): DataFrame = {
    require(periodMs > 0, "cohorts: periodMs must be positive")
    val e = events.select(user.as("user_id"), etype.as("et"),
      unix_millis(time).as("ms"))
    val anchored = e.where(col("et") === anchorType)
      .groupBy(col("user_id"))
      .agg(expr(s"min(ms) div ${periodMs}L").as("p0"))
    val active = e
      .groupBy(col("user_id"))
      .agg(collect_set(expr(s"ms div ${periodMs}L")).as("ps"))
    anchored.join(active, Seq("user_id")) // both sides user_id-partitioned
      .select(col("p0"), explode(col("ps")).as("p"))
      .where(col("p") >= col("p0"))
      .groupBy(col("p0"), (col("p") - col("p0")).as("period_offset"))
      .agg(count(lit(1)).as("n_active")) // ps is a set: one row per (user, period)
      .select((col("p0") * periodMs).as("cohort_ms"), col("period_offset"),
        col("n_active"))
  }

  /** Continuous twin of [[retention]]: per-user (anchor period, seen
    * periods) state emits each newly-active (cohort, offset) cell
    * EXACTLY ONCE (append semantics on the stateful stage), and a
    * downstream streaming aggregate keeps the running cohort counts —
    * run the query in Update (changed cells per trigger) or Complete
    * (whole triangle) output mode.
    *
    * Parity contract (spec-asserted): the gate equals [[retention]]
    * over everything delivered, PROVIDED each user's earliest anchor
    * event is the first of their anchor events to arrive. Activity
    * arriving BEFORE the user's anchor is buffered in the seen-period
    * set and counted retroactively once the anchor lands — only a
    * straggler anchor EARLIER than the one already pinned diverges:
    * the pinned cohort is kept and the late anchor is dropped
    * (documented straggler-drop, [[graft.ops.Funnel.stepsStream]]'s
    * posture — re-cohorting would retract emitted cells).
    *
    * Scale shape: one user-keyed stateful exchange, then a cell-keyed
    * exchange carrying only newly-activated (cohort, offset) pairs —
    * batch-sized, not corpus-sized. Per-user state is the distinct
    * period set: bounded by elapsed periods (~hundreds for years of
    * weeks), independent of event volume.
    */
  def retentionStream(events: DataFrame, user: Column, etype: Column,
                      time: Column, anchorType: String,
                      periodMs: Long = 7L * 24 * 3600 * 1000): DataFrame = {
    require(periodMs > 0, "cohorts: periodMs must be positive")
    val sp = events.sparkSession
    implicit val rowEnc: org.apache.spark.sql.Encoder[(Long, Boolean, Long)] =
      sp.implicits.newProductEncoder
    implicit val stateEnc: org.apache.spark.sql.Encoder[(Long, Array[Long])] =
      sp.implicits.newProductEncoder
    implicit val outEnc: org.apache.spark.sql.Encoder[(Long, Long)] =
      sp.implicits.newProductEncoder
    implicit val keyEnc: org.apache.spark.sql.Encoder[Long] =
      sp.implicits.newLongEncoder
    val rows = events
      .select(user.cast("long").as("user_id"), (etype === anchorType).as("a"),
        unix_millis(time).as("ms"))
      .selectExpr("user_id", "a", s"ms div ${periodMs}L AS p") // same integer
      .as[(Long, Boolean, Long)]                               // div as retention()
    graft.streaming.KeyedProcess[Long, (Long, Boolean, Long), (Long, Array[Long]), (Long, Long)](
      rows, _._1,
      outputMode = org.apache.spark.sql.streaming.OutputMode.Append()) {
      (_, evs, state) =>
        var (p0, seenArr) = if (state.exists) state.get else (Long.MinValue, Array.empty[Long])
        val seen = scala.collection.mutable.Set(seenArr.toIndexedSeq: _*)
        val oldActive: Set[Long] =
          if (p0 != Long.MinValue) seen.filter(_ >= p0).toSet else Set.empty
        val batch = evs.toSeq
        batch.foreach(r => seen += r._3)
        // pin the cohort at the first-arriving anchor (min within the
        // trigger so intra-batch iterator order can't matter); never
        // re-pin — a late earlier anchor drops (doc above)
        if (p0 == Long.MinValue) {
          val anchors = batch.collect { case (_, true, p) => p }
          if (anchors.nonEmpty) p0 = anchors.min
        }
        state.update((p0, seen.toArray.sorted))
        val newActive: Set[Long] =
          if (p0 != Long.MinValue) seen.filter(_ >= p0).toSet else Set.empty
        val c = p0 // stable copy for the closure
        (newActive -- oldActive).iterator.map(p => (c * periodMs, p - c))
    }.toDF("cohort_ms", "period_offset")
      .groupBy(col("cohort_ms"), col("period_offset"))
      .agg(count(lit(1)).as("n_active"))
  }

  /** First-order transition counts: how often each (from → to) state
    * pair occurs CONSECUTIVELY within a key's (ts, tie)-ordered
    * sequence — the Markov-matrix / next-event-statistics primitive
    * (session-flow analysis, curriculum ordering, behavioral drift).
    * Output: (from_state, to_state, n), globally aggregated.
    *
    * Scale shape: one keyed window (lag 1 over the per-key sort —
    * group-local, never a global sort) into one hash aggregate of
    * state-pair cardinality; each key's first event has no
    * predecessor and contributes nothing.
    */
  /** Market-basket lift between item pairs: how much more often two
    * items co-occur in a basket than independence predicts —
    * association mining's first screen (co-purchase, co-engagement,
    * topic co-occurrence). `lift_fp` is the lift in 1e4 fixed point,
    * EXACT integer arithmetic: (N·n_ab·10000) div (n_a·n_b) — no
    * float, engine-portable (10000 = lift 1.0). Output one row per
    * unordered item pair (a < b) with support ≥ `minPairSupport`:
    * (a, b, n_ab, n_a, n_b, n_baskets, lift_fp).
    *
    * Scale shape: one distinct pass to (basket, item), a basket-keyed
    * self-join bounded by per-basket item-set size (baskets are small
    * by construction — dedup items first), two broadcast-sized item/
    * total aggregates folded in at the pair level. Long-overflow
    * guard: N·n_ab·10000 must fit — fail fast past 2^49 baskets.
    */
  def basketLift(df: DataFrame, basket: Seq[Column], item: Column,
                 minPairSupport: Long = 1L): DataFrame = {
    require(basket.nonEmpty, "basketLift: at least one basket column")
    require(minPairSupport >= 1, "basketLift: minPairSupport must be >= 1")
    val bi = df.select(basket.zipWithIndex.map { case (c, i) =>
        c.as(s"__b$i") } :+ item.as("__it"): _*)
      .where(col("__it").isNotNull).distinct().localCheckpoint()
    val bcols = basket.indices.map(i => s"__b$i")
    val nBaskets = bi.select(bcols.map(col): _*).distinct().count()
    require(nBaskets < (1L << 49),
      s"basketLift: $nBaskets baskets would overflow the fixed-point " +
        "lift arithmetic — shard the corpus")
    val items = bi.groupBy(col("__it")).agg(count(lit(1)).as("__ni"))
    val pairs = bi.join(bi.toDF(bi.columns.map(_ + "_r").toIndexedSeq: _*),
        bcols.map(c => col(c) === col(s"${c}_r")).reduce(_ && _) &&
          col("__it") < col("__it_r"))
      .groupBy(col("__it").as("a"), col("__it_r").as("b"))
      .agg(count(lit(1)).as("n_ab"))
      .where(col("n_ab") >= minPairSupport)
    pairs
      .join(broadcast(items.select(col("__it").as("a"), col("__ni").as("n_a"))), Seq("a"))
      .join(broadcast(items.select(col("__it").as("b"), col("__ni").as("n_b"))), Seq("b"))
      .select(col("a"), col("b"), col("n_ab"), col("n_a"), col("n_b"),
        lit(nBaskets).as("n_baskets"),
        expr(s"(${nBaskets}L * n_ab * 10000L) div (n_a * n_b)").as("lift_fp"))
  }

  /** Multi-touch conversion attribution — the marketing-analytics
    * standard five models in one pass over (conversion, touchpoint)
    * pairs:
    *
    *  - FIRST-touch: the earliest touchpoint channel gets the whole
    *    conversion;
    *  - LAST-touch: the latest one does;
    *  - LINEAR: every touchpoint gets ⌊10⁶/n⌋ ppm of it (per-touch
    *    floor — exact integer arithmetic, engine-portable; truncating
    *    and floor division agree on the positive count);
    *  - U-SHAPED (position-based 40/20/40): first and last get
    *    400 000 ppm each, the n−2 middles split the remaining
    *    ⌊200000/(n−2)⌋ apiece; a single touch gets the whole 10⁶, a
    *    pair splits 50/50 — the industry convention;
    *  - TIME-DECAY: touch i weighs w_i = 2^(30 − min(⌊age_i /
    *    halfLifeMs⌋, 30)) (halving per elapsed half-life, exact powers
    *    of two — no floats) and gets ⌊10⁶·w_i/Σw⌋ ppm.
    *
    * A touchpoint is a non-conversion event of the same user with
    * `ts` in [conversion − lookbackMs, conversion) — strictly before,
    * so a channel can never be credited for a simultaneous event.
    * First/last ties break on (`ts`, `tie`), fully deterministic.
    * Each conversion's identity is (`user`, `ts`, `tie`) — `tie` need
    * only disambiguate same-(user, ts) conversions, not be globally
    * unique.
    * Conversions with ZERO touchpoints in the window ("direct") are
    * absent — count them separately if the direct share matters.
    *
    * Scale shape: one user-keyed equi-join (the range predicate rides
    * it — never a cross join), then ONE conversion-keyed exchange and
    * ONE ascending sort shared by all window passes (the asc rank, the
    * touch count and the decay-weight sum; the desc rank is derived as
    * n − rf + 1, never re-sorted), then a channel-sized rollup. Per-partition state is one conversion's touch window,
    * bounded by lookback. Σw ≤ n·2³⁰ and 10⁶·w ≤ 2⁵⁰ keep every
    * product in a long.
    *
    * Output: (channel, n_first, n_last, linear_ppm, u_ppm, decay_ppm),
    * one row per channel with any credit.
    */
  def attribution(events: DataFrame, user: Column, ts: Column, tie: Column,
                  channel: Column, isConversion: Column,
                  lookbackMs: Long, halfLifeMs: Long = 86400000L): DataFrame = {
    require(lookbackMs > 0, s"attribution: lookbackMs must be positive, got $lookbackMs")
    require(halfLifeMs > 0, s"attribution: halfLifeMs must be positive, got $halfLifeMs")
    val conv = events.where(isConversion)
      .select(user.as("__u"), unix_millis(ts).as("__cts"), tie.as("__cid"))
    val touch = events.where(!isConversion)
      .select(user.as("__u"), unix_millis(ts).as("__tts"), tie.as("__ttie"),
        channel.as("channel"))
    val j = conv.join(touch, Seq("__u"))
      .where(col("__tts") < col("__cts") &&
        col("__tts") >= col("__cts") - lit(lookbackMs))
    // partition by the FULL conversion identity (user, ts, tie), not
    // the tie alone: `tie` is only documented as a (ts, tie) ORDER
    // tie-breaker, so two conversions sharing a tie value (a per-user
    // sequence number, colliding ids across users) must not silently
    // merge their touch windows — that would corrupt n, both ranks,
    // and all five credit models (r14 advisor finding). All three
    // columns already ride the join output, so the exchange is
    // unchanged in width and cardinality.
    val wConv = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__u"), col("__cts"), col("__cid"))
    // ages are non-negative (tts < cts), so truncating div == floor;
    // clamp in LONG before the int cast — a >2^31 half-life ratio would
    // wrap the cast and shiftleft's mod-64 shift would fabricate huge
    // (even negative) weights instead of the documented 2^0 floor
    val decayW = expr(
      s"shiftleft(1L, 30 - cast(least(((__cts - __tts) div $halfLifeMs), 30L) as int))")
    // the last-touch rank is DERIVED, not windowed: (__tts, __ttie) is a
    // total order within a conversion (the documented tie contract), so
    // row_number over its DESC ordering is exactly n − rf + 1. Computing
    // it that way drops the third Window operator AND its descending
    // re-sort of every touch window — the asc rank and the unbounded
    // count/sum share one exchange and one sort.
    val f = j.select(col("channel"),
      row_number().over(wConv.orderBy(col("__tts").asc, col("__ttie").asc)).as("__rf"),
      count(lit(1)).over(wConv).as("__n"),
      decayW.as("__w"), sum(decayW).over(wConv).as("__sw"))
      .withColumn("__rl", col("__n") - col("__rf") + 1)
    val uPpm = when(col("__n") === 1, lit(1000000L))
      .when(col("__n") === 2, lit(500000L))
      .when(col("__rf") === 1 || col("__rl") === 1, lit(400000L))
      .otherwise(expr("200000 div (__n - 2)"))
    f.groupBy(col("channel")).agg(
      sum(when(col("__rf") === 1, 1L).otherwise(0L)).as("n_first"),
      sum(when(col("__rl") === 1, 1L).otherwise(0L)).as("n_last"),
      sum(expr("1000000 div __n")).as("linear_ppm"),
      sum(uPpm).as("u_ppm"),
      sum(expr("(1000000 * __w) div __sw")).as("decay_ppm"))
  }

  def transitions(events: DataFrame, key: Column, ts: Column, tie: Column,
                  state: Column): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__k")).orderBy(col("__t"), col("__i"))
    events.select(key.as("__k"), ts.as("__t"), tie.as("__i"),
        state.as("to_state"))
      .withColumn("from_state", lag(col("to_state"), 1).over(w))
      .where(col("from_state").isNotNull)
      .groupBy(col("from_state"), col("to_state"))
      .agg(count(lit(1)).as("n"))
  }
}
