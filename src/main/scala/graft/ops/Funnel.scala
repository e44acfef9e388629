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
}
