package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Ordered-funnel analysis over an event stream: how far each user gets
  * through a named step sequence (view → click → purchase), where step
  * i+1 must occur STRICTLY after the matched step i. Completion is
  * greedy earliest-match, which is optimal for subsequence existence
  * (matching the earliest occurrence of step i never forecloses a
  * later step), so the result is well-defined and the DuckDB oracle
  * can replay it as a chain of conditional mins.
  *
  * Scale shape: events filter to the funnel's step types at the scan
  * (pushed predicate), then ONE user-keyed exchange carries only
  * (t, step) pairs; the per-user fold runs over the time-sorted pair
  * array with builtin codegen'd expressions. Per-user state is that
  * user's funnel-step events — the same bound every funnel engine
  * carries. Equal timestamps within a user would make "strictly after"
  * ambiguous, so they fail loudly (raise_error) instead of silently
  * picking an order.
  *
  * Reference scope: the reference's analytics examples stop at windowed
  * counts (SURVEY §2.4/§2.5); funnels are the canonical next query on
  * the same event tables.
  */
object Funnel {

  /** Per-user funnel completion: (user_id, steps_completed, converted).
    * Users with no funnel-step events at all are absent (they were
    * never in the funnel); steps must be distinct.
    */
  def steps(events: DataFrame, user: Column, etype: Column, time: Column,
            stepNames: Seq[String]): DataFrame = {
    require(stepNames.nonEmpty, "funnel: at least one step")
    require(stepNames.distinct.size == stepNames.size,
      s"funnel: steps must be distinct, got ${stepNames.mkString(", ")}")
    val n = stepNames.size
    val si = stepNames.zipWithIndex.foldLeft(lit(-1)) {
      case (acc, (s, i)) => when(etype === s, lit(i)).otherwise(acc)
    }
    val evs = col("evs")
    val dupT = exists(
      zip_with(
        slice(evs, lit(1), greatest(size(evs) - 1, lit(0))),
        slice(evs, lit(2), greatest(size(evs) - 1, lit(0))),
        (a, b) => a.getField("t") === b.getField("t")),
      x => x)
    events
      // isin (not the CASE-derived index) so the step filter pushes into
      // the parquet scan — non-funnel events never leave the files
      .where(etype.isin(stepNames: _*))
      .select(user.as("user_id"), si.as("si"), unix_micros(time).as("t"))
      .groupBy(col("user_id"))
      .agg(sort_array(collect_list(struct(col("t"), col("si")))).as("evs"))
      .select(col("user_id"),
        when(dupT, raise_error(concat(lit("funnel: user "), col("user_id"),
          lit(" has two funnel events at the same microsecond — " +
            "'strictly after' is ambiguous; disambiguate upstream"))))
          .otherwise(
            aggregate(evs, lit(0), (k, ev) =>
              when(k < n && ev.getField("si") === k, k + 1).otherwise(k)))
          .cast("long").as("steps_completed"))
      .withColumn("converted", col("steps_completed") === n)
  }

  /** Time-to-convert for the users who COMPLETE the funnel: the same
    * greedy earliest-match fold as [[steps]], additionally carrying
    * the first matched step's time and the last advance's time —
    * (user_id, start_us, end_us, latency_us), converted users only.
    * Feed `latency_us` to [[Quantiles.percentiles]] for the
    * conversion-latency distribution. Same one-exchange shape and
    * same-microsecond ambiguity guard as [[steps]].
    */
  def conversionLatency(events: DataFrame, user: Column, etype: Column,
                        time: Column, stepNames: Seq[String]): DataFrame = {
    require(stepNames.nonEmpty, "funnel: at least one step")
    require(stepNames.distinct.size == stepNames.size,
      s"funnel: steps must be distinct, got ${stepNames.mkString(", ")}")
    val n = stepNames.size
    val si = stepNames.zipWithIndex.foldLeft(lit(-1)) {
      case (acc, (s, i)) => when(etype === s, lit(i)).otherwise(acc)
    }
    val evs = col("evs")
    val dupT = exists(
      zip_with(
        slice(evs, lit(1), greatest(size(evs) - 1, lit(0))),
        slice(evs, lit(2), greatest(size(evs) - 1, lit(0))),
        (a, b) => a.getField("t") === b.getField("t")),
      x => x)
    val zero = struct(lit(0).as("k"),
      lit(null).cast("long").as("ft"), lit(null).cast("long").as("lt"))
    events
      .where(etype.isin(stepNames: _*))
      .select(user.as("user_id"), si.as("si"), unix_micros(time).as("t"))
      .groupBy(col("user_id"))
      .agg(sort_array(collect_list(struct(col("t"), col("si")))).as("evs"))
      .select(col("user_id"),
        when(dupT, raise_error(concat(lit("funnel: user "), col("user_id"),
          lit(" has two funnel events at the same microsecond — " +
            "'strictly after' is ambiguous; disambiguate upstream"))))
          .otherwise(
            aggregate(evs, zero, (acc, ev) =>
              when(acc.getField("k") < n &&
                ev.getField("si") === acc.getField("k"),
                struct((acc.getField("k") + 1).as("k"),
                  when(acc.getField("k") === 0, ev.getField("t"))
                    .otherwise(acc.getField("ft")).as("ft"),
                  ev.getField("t").as("lt")))
                .otherwise(acc)))
          .as("__f"))
      .where(col("__f.k") === n)
      .select(col("user_id"), col("__f.ft").as("start_us"),
        col("__f.lt").as("end_us"),
        (col("__f.lt") - col("__f.ft")).as("latency_us"))
  }

  /** The same funnel CONTINUOUSLY: per-user state machine on the keyed
    * state store ([[graft.streaming.KeyedProcess]]), emitting a user's
    * progress whenever it advances (Update output). State per user is
    * two fields — steps completed and the matched step's time — not an
    * event list.
    *
    * Ordering contract: each micro-batch's events apply in event-time
    * order, and the machine only advances forward. If delivery is
    * event-time ordered across batches (the watermarked-source case),
    * this equals [[steps]] on the same events (spec-asserted). A
    * straggler arriving after the machine advanced past its slot is a
    * missed opportunity, not an error — the streaming twin of the
    * engine's documented late-drop divergence. A same-microsecond
    * candidate simply does not satisfy "strictly after" (batch mode
    * fails loudly instead: it can SEE the ambiguity; a stream cannot).
    */
  def stepsStream(events: DataFrame, user: Column, etype: Column, time: Column,
                  stepNames: Seq[String]): DataFrame = {
    require(stepNames.nonEmpty, "funnel: at least one step")
    require(stepNames.distinct.size == stepNames.size,
      s"funnel: steps must be distinct, got ${stepNames.mkString(", ")}")
    val n = stepNames.size
    val si = stepNames.zipWithIndex.foldLeft(lit(-1)) {
      case (acc, (s, i)) => when(etype === s, lit(i)).otherwise(acc)
    }
    val sp = events.sparkSession
    implicit val rowEnc: org.apache.spark.sql.Encoder[(Long, Int, Long)] =
      sp.implicits.newProductEncoder
    implicit val stateEnc: org.apache.spark.sql.Encoder[(Int, Long)] =
      sp.implicits.newProductEncoder
    implicit val outEnc: org.apache.spark.sql.Encoder[(Long, Long, Boolean)] =
      sp.implicits.newProductEncoder
    implicit val keyEnc: org.apache.spark.sql.Encoder[Long] =
      sp.implicits.newLongEncoder
    val e = events
      .where(etype.isin(stepNames: _*))
      .select(user.cast("long").as("user_id"), si.as("si"), unix_micros(time).as("t"))
      .as[(Long, Int, Long)]
    graft.streaming.KeyedProcess[Long, (Long, Int, Long), (Int, Long), (Long, Long, Boolean)](
      e, _._1,
      outputMode = org.apache.spark.sql.streaming.OutputMode.Update()) {
      (u, evs, state) =>
        var (k, tLast) = if (state.exists) state.get else (0, Long.MinValue)
        val k0 = k
        evs.toSeq.sortBy(r => (r._3, r._2)).foreach { case (_, s, t) =>
          if (k < n && s == k && t > tLast) { k += 1; tLast = t }
        }
        state.update((k, tLast))
        if (k != k0) Iterator((u, k.toLong, k == n)) else Iterator.empty
    }.toDF("user_id", "steps_completed", "converted")
  }
}
