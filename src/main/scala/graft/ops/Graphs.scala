package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Link-analysis operators for corpus curation (north-star extension) —
  * web-scale training corpora weight documents by host/page authority,
  * and clickstream transition graphs rank interaction states; both are
  * PageRank over a weighted edge list.
  *
  * The rank is computed in FIXED-POINT integer arithmetic: every quantity
  * is a BIGINT multiple of 1/scale, every division is an integer floor
  * div, and iteration count is fixed — so the result is bit-identical
  * across runs, partitionings, AND engines (float PageRank is not: the
  * per-node contribution sum has no defined order). The price is a floor
  * per division (total rank mass leaks ≲ one edge count per iteration,
  * and dangling-node mass is dropped — the standard simplification);
  * ranks are ORDINALLY faithful, which is what curation uses.
  */
object Graphs {

  /** Weighted PageRank over (src, dst, weight) edges, fixed-point.
    * Returns (v, rank_fp) where rank_fp ≈ pagerank(v) · scale.
    *
    * Scale shape: edges aggregate once into a pinned (src, dst, w) list;
    * each iteration shuffles (node, contribution) pairs — edge-bounded,
    * never corpus-bounded — through one partial-aggregated groupBy, plus
    * one broadcast-size (v, r) frame; ranks localCheckpoint every few
    * rounds to truncate lineage (the [[Clusters.connectedComponents]]
    * pattern). Node count is collected once (a scalar, like the
    * clustering convergence probe).
    */
  def pagerank(edges: DataFrame, src: Column, dst: Column,
               weight: Column = lit(1L), iters: Int = 10,
               scale: Long = 1000000000000L, dampingPct: Int = 85): DataFrame = {
    require(iters >= 1, "iters must be >= 1")
    require(dampingPct > 0 && dampingPct < 100, "dampingPct must be in (0, 100)")
    // upper bound keeps scale·(100-damping) and dampingPct·mass in Long
    // range (mass stays ≤ ~scale), and keeps the w-bound check meaningful
    require(scale > 0 && scale <= Long.MaxValue / 200,
      s"scale must be in (0, ${Long.MaxValue / 200}]")
    val e = edges
      .select(src.as("src"), dst.as("dst"),
        coalesce(weight.cast("long"), lit(1L)).as("w"))
      .where(col("src").isNotNull && col("dst").isNotNull)
      .groupBy(col("src"), col("dst")).agg(sum(col("w")).as("w"))
      .localCheckpoint()
    // fail fast on weight range BEFORE iterating, one aggregate pass:
    // non-positive weights — both engines truncate integer division
    // toward zero (Spark `div` and DuckDB `//` agree: -7 // 2 = -3), but
    // a zero total out-weight divides by zero; and weights
    // large enough that `r * w` can exceed Long range (a rank is at most
    // ~scale, so max(w) must stay under Long.MaxValue / (2·scale)) —
    // under ANSI mode the overflow kills the job mid-iteration, and on
    // non-ANSI engines it silently wraps. Either way: corrupt ranks.
    val wBound = Long.MaxValue / (2 * scale)
    val wStats = e.agg(min(col("w")).as("mn"), max(col("w")).as("mx")).head
    if (!wStats.isNullAt(0)) {
      require(wStats.getLong(0) > 0,
        "pagerank edge weights must be positive (a zero total out-weight " +
          "divides by zero; negative mass has no pagerank meaning)")
      require(wStats.getLong(1) <= wBound,
        s"pagerank aggregated edge weight ${wStats.getLong(1)} exceeds the " +
          s"overflow-safe bound $wBound for scale=$scale — r*w would exceed " +
          "Long range; lower `scale` or pre-normalize the weights")
    }
    val nodes = e.select(col("src").as("v")).union(e.select(col("dst").as("v")))
      .distinct().localCheckpoint()
    val n = nodes.count()
    require(n > 0, "pagerank needs a non-empty graph")
    val outW = e.groupBy(col("src")).agg(sum(col("w")).as("wout"))
    val base = scale * (100 - dampingPct) / (100 * n)
    var rank = nodes.select(col("v"), lit(scale / n).as("r"))
    for (i <- 1 to iters) {
      val contrib = e.join(outW, "src")
        .join(rank.select(col("v").as("src"), col("r")), "src")
        .select(col("dst").as("v"), expr("(r * w) div wout").as("c"))
      val inSum = contrib.groupBy(col("v")).agg(sum(col("c")).as("s"))
      rank = nodes.join(inSum, Seq("v"), "left")
        .select(col("v"),
          (lit(base) + expr(s"($dampingPct * coalesce(s, 0L)) div 100")).as("r"))
      if (i % 4 == 0 || i == iters) rank = rank.localCheckpoint()
    }
    rank.select(col("v"), col("r").as("rank_fp"))
  }

  /** Per-user consecutive-event transition edges from an event log —
    * (prev event_type, event_type) per user in (ts, tiebreak) order; the
    * natural input for [[pagerank]] over interaction states. Per-user
    * windows are small; skewed users would need the usual salting.
    */
  def transitionEdges(events: DataFrame, user: Column, state: Column,
                      ts: Column, tiebreak: Column): DataFrame = {
    events.select(user.as("u"), state.as("dst"), ts.as("t"), tiebreak.as("tb"))
      .withColumn("src", lag(col("dst"), 1).over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("u")).orderBy(col("t"), col("tb"))))
      .where(col("src").isNotNull)
      .select(col("src"), col("dst"))
  }
}
