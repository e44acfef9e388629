package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental JOIN-view maintenance — the missing half of the
  * materialized-view family: [[Diff.maintainAgg]] keeps an AGGREGATE
  * view current under a changelog; this keeps an EQUI-JOIN view
  * current under insert-only CDC on BOTH sides, without ever
  * re-running the join over the full tables.
  *
  * The delta algebra (insert-only): with per-batch inserts ΔL, ΔR,
  *
  *   (L ∪ ΔL) ⋈ (R ∪ ΔR) = L⋈R ∪ ΔL⋈(R ∪ ΔR) ∪ L⋈ΔR
  *
  * so the view grows by exactly two delta-sized joins per batch —
  * the arriving rows against the OTHER side's standing table (plus
  * the in-batch ΔL⋈ΔR, folded into the first term). Deletes/updates
  * are the keyed-aggregate path ([[Diff.maintainAggStream]] /
  * [[Diff.scd2Stream]]); a join view under retraction needs
  * per-row multiplicity bookkeeping this deliberately does not carry.
  *
  * Storage/atomicity ride [[graft.core.Catalog]]: `left`, `right`,
  * and `view` are three stores under ONE manifest swap, so a crash
  * mid-fold can never leave the view inconsistent with the sides it
  * was derived from — and savepoints, time travel, replication, and
  * the writer lease all apply to the join view for free.
  *
  * Scale shape per trigger: the deltas BROADCAST (batch-sized) onto
  * scans of the standing sides — the stored tables are read but never
  * shuffled, and nothing corpus-sized exchanges. The standing-side
  * scan per trigger is the price of generality; at extreme table
  * sizes, key-partition the stores (the bucketed-index posture) so
  * the scan prunes to the delta's key range.
  */
object JoinView {

  private def requireDisjoint(left: DataFrame, right: DataFrame,
                              keys: Seq[String]): Unit = {
    require(keys.nonEmpty, "JoinView: at least one key column")
    keys.foreach { k =>
      require(left.columns.contains(k) && right.columns.contains(k),
        s"JoinView: key '$k' must exist on both sides")
    }
    val clash = left.columns.filterNot(keys.contains)
      .intersect(right.columns.filterNot(keys.contains))
    require(clash.isEmpty,
      s"JoinView: non-key columns collide across sides (${clash.mkString(", ")}) " +
        "— alias them apart; the view carries keys ++ left ++ right")
  }

  /** Stand up the catalog: the initial sides and their join as three
    * stores behind one manifest. Empty initial sides (`df.limit(0)`)
    * start a from-scratch continuous build.
    */
  def init(spark: SparkSession, base: String, left0: DataFrame,
           right0: DataFrame, keys: Seq[String]): Unit = {
    requireDisjoint(left0, right0, keys)
    graft.core.Catalog.init(base, Map(
      "left" -> left0, "right" -> right0,
      "view" -> left0.join(right0, keys)))
  }

  /** The three Catalog folds for one CDC batch: rows with `isLeft`
    * true fold into `left` via `projectLeft` (and symmetrically for
    * the right side); the view grows by the two delta joins. Feed to
    * [[graft.core.Catalog.ingest]] / [[graft.core.Catalog.ingestStream]]
    * — mid-ingest reads of `left`/`right` resolve through the
    * pre-swap manifest, so both delta joins see the OLD standing
    * sides regardless of fold order (the Catalog's atomicity point is
    * exactly what makes the algebra's L and R well-defined).
    */
  def folds(spark: SparkSession, base: String, keys: Seq[String],
            isLeft: Column,
            projectLeft: DataFrame => DataFrame,
            projectRight: DataFrame => DataFrame)
      : Seq[(String, (DataFrame, DataFrame) => DataFrame)] = Seq(
    "left" -> ((cur: DataFrame, b: DataFrame) =>
      cur.unionByName(projectLeft(b.where(isLeft)))),
    "right" -> ((cur: DataFrame, b: DataFrame) =>
      cur.unionByName(projectRight(b.where(!isLeft)))),
    "view" -> ((cur: DataFrame, b: DataFrame) =>
      cur.unionByName(
        delta(spark, base, keys, isLeft, projectLeft, projectRight)(b)
          .select(cur.columns.map(col): _*))))

  /** The batch's contribution to the join view — ΔL ⋈ (R ∪ ΔR) ∪
    * L ⋈ ΔR, deltas broadcast, standing sides scan-only. Public so
    * DERIVED stores can fold the same delta under the same manifest
    * swap: appending `("agg", (cur, b) => cur ∪ aggregate(delta(...)(b)))`
    * to [[folds]] maintains a join-plus-aggregate view that can never
    * tear from the join it summarizes (q234's composition).
    */
  def delta(spark: SparkSession, base: String, keys: Seq[String],
            isLeft: Column,
            projectLeft: DataFrame => DataFrame,
            projectRight: DataFrame => DataFrame)(b: DataFrame): DataFrame = {
    val dl = projectLeft(b.where(isLeft))
    val dr = projectRight(b.where(!isLeft))
    val lOld = graft.core.Catalog.read(spark, base, "left")
    val rOld = graft.core.Catalog.read(spark, base, "right")
    broadcast(dl).join(rOld.unionByName(dr), keys)
      .unionByName(lOld.join(broadcast(dr), keys))
  }

  /** The current join view (keys ++ left columns ++ right columns). */
  def read(spark: SparkSession, base: String): DataFrame =
    graft.core.Catalog.read(spark, base, "view")
}
