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
}
