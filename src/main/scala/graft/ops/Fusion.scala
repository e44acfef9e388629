package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Rank fusion for hybrid retrieval: combine any number of ranked
  * candidate lists (lexical [[Bm25Index]], embedding [[Similarity]] /
  * [[IvfIndex]], or any other ranker) into one consensus ranking via
  * reciprocal rank fusion (Cormack, Clarke & Buettcher, SIGIR '09):
  *
  *   rrf(q, d) = Σ_lists FP div (kConst + rk_list(q, d))
  *
  * in FP = 2^20 fixed point — EXACT integer arithmetic like every graft
  * scoring kernel, so fused rankings are bit-identical across runs,
  * partitionings and engines, and the DuckDB oracle replays them. A doc
  * absent from a list contributes nothing for that list (the standard
  * RRF convention); ties break on doc_id.
  *
  * Scale shape: inputs are already top-k lists — k rows per query per
  * list — so fusion is query-sized, never corpus-sized: one union, one
  * (qid, doc_id) partial-agg exchange, and the bounded-heap
  * `collect_bottom_k` per-query top-k.
  */
object Fusion {

  /** Fuse ranked lists, each shaped (qid, doc_id, rk) with rk 1-based.
    * Output (qid, doc_id, rrf_fp, rk), top `k` per qid by fused score
    * descending, doc_id ascending.
    */
  def rrf(lists: Seq[DataFrame], k: Int, kConst: Int = 60,
          fp: Long = 1L << 20): DataFrame = {
    require(lists.nonEmpty, "rrf: at least one ranked list")
    require(k > 0, "rrf: k must be positive")
    require(kConst >= 0, "rrf: kConst must be non-negative")
    require(fp > 0, "rrf: fixed-point scale must be positive")
    val shaped = lists.map { l =>
      require(Seq("qid", "doc_id", "rk").forall(l.columns.contains),
        s"rrf: each list needs (qid, doc_id, rk); got ${l.columns.mkString(", ")}")
      l.select(col("qid"), col("doc_id"),
        expr(s"${fp}L div (${kConst}L + rk)").as("c"))
    }
    shaped.reduce(_ unionByName _)
      .groupBy(col("qid"), col("doc_id"))
      .agg(sum(col("c")).as("rrf_fp"))
      .select(col("qid"), struct((-col("rrf_fp")).as("ns"), col("doc_id")).as("s"))
      .groupBy(col("qid"))
      .agg(graft.functions.Kernels.collect_bottom_k(col("s"), k).as("top"))
      .select(col("qid"), posexplode(col("top")).as(Seq("pos", "s")))
      .select(col("qid"), col("s").getField("doc_id").as("doc_id"),
        (-col("s").getField("ns")).as("rrf_fp"),
        (col("pos") + 1).cast("long").as("rk"))
  }
}
