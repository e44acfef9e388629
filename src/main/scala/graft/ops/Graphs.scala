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
  /** EXACT per-vertex triangle counts over an undirected simple graph
    * (self-loops and duplicate/reversed edges normalized away) — the
    * clustering-coefficient / community-density primitive.
    *
    * Scale shape: the classic degree-orientation algorithm. Each edge
    * orients from its lower (degree, id) endpoint to its higher one, so
    * every triangle is generated EXACTLY ONCE as a wedge at its
    * lowest-ranked vertex, and — the load-bearing property — oriented
    * out-degree is O(√m) even for power-law graphs: a hub's edges all
    * point INTO it, so the hub never fans out a quadratic wedge set.
    * Everything is equi-joins on edge keys (hash-partitioned, AQE
    * skew-splittable); no nested loop appears (spec-asserted). The
    * canonical edge list pins via localCheckpoint ([[pagerank]]'s
    * pattern) because three passes read it.
    *
    * Output: (id, n_tri) for vertices in ≥ 1 triangle.
    */
  def triangles(edges: DataFrame, src: Column, dst: Column): DataFrame = {
    val raw = edges.select(src.as("x"), dst.as("y"))
    Seq("x", "y").foreach { c =>
      val dt = raw.schema(c).dataType.simpleString
      require(Seq("bigint", "int", "smallint", "tinyint").contains(dt),
        s"triangles: vertex ids must be integral, got $dt")
    }
    val canon = raw
      .where(col("x").isNotNull && col("y").isNotNull && col("x") =!= col("y"))
      .select(least(col("x"), col("y")).cast("long").as("a"),
        greatest(col("x"), col("y")).cast("long").as("b"))
      .distinct().localCheckpoint()
    val deg = canon.select(col("a").as("v")).unionAll(canon.select(col("b")))
      .groupBy(col("v")).agg(count(lit(1)).as("deg"))
    // orient: u = endpoint with the smaller (deg, id), w = the larger
    val keyed = canon
      .join(deg.select(col("v").as("a"), col("deg").as("da")), Seq("a"))
      .join(deg.select(col("v").as("b"), col("deg").as("db")), Seq("b"))
    val oriented = keyed.select(
      when(struct(col("da"), col("a")) < struct(col("db"), col("b")),
        struct(col("a").as("id"), col("da").as("dg"))).otherwise(
        struct(col("b").as("id"), col("db").as("dg"))).as("u"),
      when(struct(col("da"), col("a")) < struct(col("db"), col("b")),
        struct(col("b").as("id"), col("db").as("dg"))).otherwise(
        struct(col("a").as("id"), col("da").as("dg"))).as("w"))
      .select(col("u.id").as("u"), col("w.id").as("w"),
        struct(col("w.dg"), col("w.id")).as("wk"))
    // wedges at u (ordered within the wedge by orientation key), closed
    // by the oriented edge (v1, v2)
    val w1 = oriented.select(col("u"), col("w").as("v1"), col("wk").as("k1"))
    val w2 = oriented.select(col("u"), col("w").as("v2"), col("wk").as("k2"))
    val tri = w1.join(w2, Seq("u")).where(col("k1") < col("k2"))
      .join(oriented.select(col("u").as("v1"), col("w").as("v2")), Seq("v1", "v2"))
    tri.select(explode(array(col("u"), col("v1"), col("v2"))).as("id"))
      .groupBy(col("id")).agg(count(lit(1)).as("n_tri"))
  }

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
