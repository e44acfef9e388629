package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fixed-point Lloyd's k-means over embedding columns (north-star
  * extension) — the clustering stage of semantic curation pipelines
  * (SemDeDup-style within-cluster dedup, cluster-balanced sampling,
  * trained IVF coarse quantizers à la FAISS `IndexIVF` training).
  *
  * Every quantity is an integer: vectors quantize to BIGINT multiples of
  * 1/`q` (floor), distances are integer squared-L2, and the centroid
  * update is an integer truncating division (Spark `div` ≡ DuckDB `//` —
  * both truncate toward zero) — so for a fixed iteration count the fit is
  * BIT-IDENTICAL across runs, partitionings, and engines. Float Lloyd's
  * is not: the per-cluster component sum has no defined order. The price
  * is quantization (≤ 1/q per component, immaterial against embedding
  * noise); ties in assignment go to the lowest cell.
  *
  * Scale shape per iteration (the only loop — iterations are few and
  * fixed, never data-sized):
  *   - assignment is a narrow map against the ONE broadcast centroid row
  *     ([[Similarity.assignCells]]'s shape) — zero corpus shuffle;
  *   - the update is `posexplode` (narrow) into a `groupBy(cell, d)` SUM
  *     whose map-side partial aggregation bounds the exchange to
  *     ≤ k·dim rows PER MAP PARTITION — never corpus-sized;
  *   - the new centroid row (k·dim longs) pins via `localCheckpoint`, so
  *     the plan does not grow with iterations.
  * The quantized corpus is persisted for the duration of the fit (it is
  * scanned once per iteration plus once for init); at 100 TB that cache
  * spills to executor disk — still strictly cheaper than re-decoding
  * parquet per iteration.
  *
  * Overflow posture (fail-fast, same discipline as
  * [[Graphs.pagerank]]'s weight guard): with A = max |quantized
  * component|, assignment needs dim·(2A)² ≤ Long.Max and the update
  * needs rows·A ≤ Long.Max; both are checked from ONE tiny aggregate
  * over the (cached) quantized corpus before iterating.
  *
  * Reference analogue: the platform's GUI demos cluster synthetic
  * points driver-side (gui/app_gcp.py's demo orchestration); this is
  * the distributed, engine-exact form.
  */
object KMeans {

  /** Quantize a float/double array column to BIGINT fixed point. */
  private[ops] def quantize(vec: Column, q: Long): Column =
    transform(vec, x => floor(x.cast("double") * q).cast("long"))

  /** Integer squared-L2 between two equal-length BIGINT arrays. */
  private[ops] def l2sqLong(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)), lit(0L), (acc, v) => acc + v)

  /** Nearest cell by integer squared-L2, ties to the lowest cell, against
    * a broadcast (cell, centroid) struct-array column.
    */
  private def nearestCell(cents: Column, xq: Column): Column =
    array_min(transform(cents, cc =>
      struct(l2sqLong(cc.getField("centroid"), xq).as("d"),
        cc.getField("cell").as("cell")))).getField("cell")

  /** Fit k centroids with `iters` Lloyd iterations. Returns ONE row,
    * `cents: array<struct<cell:int, centroid:array<bigint>>>` — the
    * broadcastable centroid form, fixed-point at scale `q`.
    *
    * Init is the deterministic engine-portable sample of
    * [[Similarity.centroidArray]]: the k ids with smallest (md5(id), id),
    * cell = rank in that order. A cell left empty by an iteration keeps
    * its previous centroid (the standard Lloyd's convention that never
    * loses a cell).
    */
  def fit(corpus: DataFrame, id: Column, vec: Column,
          k: Int, iters: Int, q: Long = 1000000L): DataFrame = {
    require(k > 0, "k must be positive")
    require(iters >= 0, "iters must be >= 0")
    require(q > 0, "fixed-point scale q must be positive")
    val c0 = corpus.select(id.as("cand_id"), quantize(vec, q).as("xq"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // one tiny aggregate proves the integer arithmetic cannot overflow:
      // dim·(2A)² for distances, rows·A for the update sums
      val g = c0.select(size(col("xq")).as("dim"),
          aggregate(col("xq"), lit(0L), (acc, x) => greatest(acc, abs(x))).as("a"))
        .agg(max(col("dim")).as("dim"), max(col("a")).as("a"), count(lit(1)).as("n")).head
      if (!g.isNullAt(0)) {
        val (dim, a, n) = (g.getInt(0), g.getLong(1), g.getLong(2))
        require(a == 0 || (dim.toLong * 4 * a * a) / a / 4 / dim == a,
          s"quantized components (max |x|=$a, dim=$dim) overflow the integer " +
            s"distance at scale q=$q — lower q or normalize the vectors")
        require(a == 0 || n <= Long.MaxValue / a,
          s"corpus size $n × max |x|=$a overflows the centroid update sum " +
            s"at scale q=$q — lower q or fit on a sample")
      }
      var cents = Similarity.centroidArray(c0.select(col("cand_id"), col("xq").as("cv")), k)
        .localCheckpoint()
      for (_ <- 1 to iters) {
        val assigned = c0.crossJoin(broadcast(cents))
          .select(nearestCell(col("cents"), col("xq")).as("cell"), col("xq"))
        // partial-aggregated (cell, d) sums: exchange ≤ k·dim rows per map
        // partition; count(*) per (cell, d) is the cluster size
        val sums = assigned
          .select(col("cell"), posexplode(col("xq")).as(Seq("d", "x")))
          .groupBy(col("cell"), col("d"))
          .agg(sum(col("x")).as("s"), count(lit(1)).as("n"))
          .select(col("cell"), col("d"), expr("s div n").as("c"))
        // fold the ≤ k·dim refreshed components into one map row, then
        // rebuild the centroid array keeping prior centroids for cells
        // that received no points this round
        val refreshed = sums.groupBy(col("cell"))
          .agg(array_sort(collect_list(struct(col("d"), col("c")))).as("dc"))
          .select(col("cell"), transform(col("dc"), x => x.getField("c")).as("centroid"))
          .agg(map_from_entries(collect_list(struct(col("cell"), col("centroid")))).as("m"))
        cents = cents.crossJoin(refreshed)
          .select(transform(col("cents"), cc =>
            struct(cc.getField("cell").as("cell"),
              coalesce(element_at(col("m"), cc.getField("cell")),
                cc.getField("centroid")).as("centroid"))).as("cents"))
          .localCheckpoint()
      }
      cents
    } finally c0.unpersist()
  }

  /** (cell, id, xq) for an ALREADY-QUANTIZED (id, xq) frame — the same
    * narrow broadcast argmin as [[assign]], carrying the vector through
    * so statistics passes need no re-join (an id-keyed join would
    * shuffle the corpus).
    */
  private[ops] def assignQuantized(c: DataFrame, cents: DataFrame): DataFrame =
    c.crossJoin(broadcast(cents))
      .select(nearestCell(col("cents"), col("xq")).as("cell"), col("id"), col("xq"))

  /** Assign every row to its fitted cell: (id, cell). Narrow map against
    * the broadcast centroid row — zero corpus shuffle. `q` must equal the
    * fit-time scale (quantization is part of the metric).
    */
  def assign(corpus: DataFrame, id: Column, vec: Column,
             cents: DataFrame, q: Long = 1000000L): DataFrame =
    corpus.select(id.as("id"), quantize(vec, q).as("xq"))
      .crossJoin(broadcast(cents))
      .select(col("id"), nearestCell(col("cents"), col("xq")).as("cell"))

  /** Fitted centroids in [[Similarity]]'s double-array (cell, centroid)
    * struct-array form — dequantized as c/q (exact-integer-valued doubles
    * through one IEEE division, engine-portable) — so a TRAINED coarse
    * quantizer plugs directly into the IVF family where the default is a
    * corpus sample: `Similarity.ivfTopK`-style probe/assign via
    * [[Similarity.assignCells]]/[[Similarity.probeCells]], or a persisted
    * [[IvfIndex]] built from these cells.
    */
  def centroidsAsDouble(cents: DataFrame, q: Long = 1000000L): DataFrame =
    cents.select(transform(col("cents"), cc =>
      struct(cc.getField("cell").as("cell"),
        transform(cc.getField("centroid"), x => x.cast("double") / q).as("centroid")))
      .as("cents"))

  /** IVF top-k with a TRAINED coarse quantizer: fit fixed-point k-means
    * on the corpus and use the fitted cells where
    * [[Similarity.ivfTopK]] uses a raw corpus sample — the FAISS
    * `IndexIVF.train` composition. Trained cells track the data's density
    * (balanced cells, centroids at cluster means), which is what keeps
    * probe recall stable when the corpus is far from uniform. Scale shape
    * is the fit's (iters narrow passes) plus ivfTopK's (corpus never
    * hash-partitioned, broadcast probes, k-bounded ranking exchange).
    */
  def ivfTopKTrained(queries: DataFrame, corpus: DataFrame,
                     queryId: Column, queryVec: Column,
                     corpusId: Column, corpusVec: Column,
                     k: Int, nCells: Int = 16, iters: Int = 2,
                     nProbe: Int = 4, q: Long = 1000000L): DataFrame = {
    val c = corpus.select(corpusId.as("cand_id"),
      transform(corpusVec, x => x.cast("double")).as("cv"))
    val cents = centroidsAsDouble(fit(c, col("cand_id"), col("cv"), nCells, iters, q), q)
    val assigned = Similarity.assignCells(c, cents)
    val qd = queries.select(queryId.as("query_id"),
      transform(queryVec, x => x.cast("double")).as("qv"))
    val probes = Similarity.probeCells(qd, cents, nProbe)
    val scored = assigned.join(broadcast(probes), Seq("cell"))
      .where(col("query_id") =!= col("cand_id"))
      .select(col("query_id"), col("cand_id"),
        Similarity.cosine(col("qv"), col("cv")).as("cos"))
    Similarity.rankScored(scored, k)
  }

  /** SemDeDup-style semantic dedup (Abbas et al. '23): k-means-cluster
    * the embeddings, then WITHIN each cluster drop every row that has a
    * lower-id near-duplicate (exact cosine ≥ `threshold` over the
    * original float vectors). Returns the surviving (id, cell) rows.
    *
    * The pairwise verify is cluster-scoped — the cross-cluster quadratic
    * never materializes; size k so clusters stay pairwise-feasible (the
    * published recipe uses k in the tens of thousands at corpus scale).
    * For corpora where even one cluster is too hot for its self-join,
    * [[Similarity.cosineNearDupPairs]] is the banded-LSH alternative
    * (q79's path).
    */
  def semanticDedup(corpus: DataFrame, id: Column, vec: Column,
                    k: Int, iters: Int, threshold: Double,
                    q: Long = 1000000L): DataFrame = {
    // the corpus is scanned by the fit (which caches its own quantized
    // projection) and by ONE assignment pass below — like the LSH dedup
    // operators, these are narrow RE-SCANS of the source, never a
    // corpus-sized materialization (a localCheckpoint here would copy
    // the whole embedding corpus to executor storage at 100 TB). The
    // source must therefore be deterministic across scans (file sources
    // are; a rand()-derived frame is not — same contract as minhashLsh's
    // verify re-scan).
    val c = corpus.select(id.as("id"), vec.as("v"))
    val cents = fit(c, col("id"), col("v"), k, iters, q)
    // The original vector rides THROUGH the broadcast argmin instead of
    // being re-joined by id afterwards (an id-keyed join back to the
    // source is two corpus-sized exchanges at 100 TB), and "has a
    // lower-id near-duplicate in my cluster" is ONE left_anti self-join
    // with the cosine test in the join condition — not an inner
    // pair-join + distinct + id-anti-join. Both sides of the anti join
    // are the same subtree requiring the same hashpartitioning(cell), so
    // exchange reuse materializes the assignment pass ONCE (plan-asserted
    // in PlanQualitySpec): the whole operator runs the fit's narrow
    // passes plus a single corpus-sized cell exchange. The anti form
    // also short-circuits: a row stops probing its cell at the first
    // dominating match, where the inner form enumerated all of them.
    // The explicit isnotnull filters mirror what InferFiltersFromConstraints
    // derives for the anti join's RIGHT side only (a left_anti keeps
    // null-keyed left rows, so nothing is inferred on the left) — without
    // them the two sides canonicalize differently and the cell exchange
    // is NOT reused. Ids must be non-null (same contract as the dedup
    // family); a null cell cannot occur while cents is non-empty.
    val assigned = c.select(col("id"), quantize(col("v"), q).as("xq"), col("v"))
      .crossJoin(broadcast(cents))
      .select(col("id"), nearestCell(col("cents"), col("xq")).as("cell"), col("v"))
      .where(col("id").isNotNull && col("cell").isNotNull)
    assigned.as("a").join(assigned.as("b"),
        col("a.cell") === col("b.cell") && col("b.id") < col("a.id") &&
          Similarity.cosine(col("a.v"), col("b.v")) >= threshold,
        "left_anti")
      .select(col("a.id").as("id"), col("a.cell").as("cell"))
  }
}
