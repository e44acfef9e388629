package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (north-star extension).
  *
  * Embeddings are `Array[Float]` columns; all arithmetic is promoted to
  * Double and folded in index order (`aggregate` over `zip_with`) so the
  * result is IEEE-deterministic and engine-portable. No UDFs — these are
  * Catalyst higher-order functions, codegen-eligible and null-safe.
  *
  * Scale design: brute-force top-k broadcasts the (small) query set and
  * scans the corpus once — a map-only join, no corpus shuffle; the per-query
  * rank then shuffles only (query, candidate, score) triples. The
  * LSH-bucketed variant (`lshCosineBuckets`) bounds candidates per query by
  * random-hyperplane bucketing, the standard sub-linear path when the query
  * set itself is large.
  */
object Similarity {

  /** Dot product of two numeric arrays, in Double, index order.
    * Higher-order-function reference form; the hot path uses the fused
    * kernel below.
    */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity; 0 when either vector has zero norm. Single-pass
    * custom expression (graft.functions.Kernels.CosineSimilarity).
    */
  def cosine(a: Column, b: Column): Column =
    graft.functions.Kernels.cosine_similarity(a, b)

  /** Brute-force cosine top-k: for each row of `queries`, the k most
    * similar rows of `corpus` (self-matches excluded by id). Query side is
    * broadcast — the corpus is never shuffled, only scored triples are.
    */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame,
                     queryId: Column, queryVec: Column,
                     corpusId: Column, corpusVec: Column,
                     k: Int): DataFrame = {
    val q = queries.select(queryId.as("query_id"), queryVec.as("qv"))
    val c = corpus.select(corpusId.as("cand_id"), corpusVec.as("cv"))
    val scored = c.join(broadcast(q), col("query_id") =!= col("cand_id"))
      .select(col("query_id"), col("cand_id"), cosine(col("qv"), col("cv")).as("cos"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("cand_id").asc)
    scored.withColumn("rk", row_number().over(w))
      .where(col("rk") <= k)
      .select(col("query_id"), col("cand_id"), col("rk"))
  }

  /** Embedding near-duplicate pairs: all (id_a < id_b) pairs with cosine
    * above `threshold`. Candidates come from random-hyperplane LSH buckets
    * (sign bits of dot products with deterministic pseudo-random planes),
    * so the cross product is per-bucket, not global.
    */
  def cosineNearDupPairs(df: DataFrame, id: Column, vec: Column,
                         dim: Int, planes: Int = 8,
                         threshold: Double = 0.95): DataFrame = {
    val sig = hyperplaneSignature(vec, dim, planes)
    val b = df.select(id.as("id"), vec.as("v"), sig.as("bucket"))
    val l = b.select(col("bucket"), col("id").as("id_a"), col("v").as("va"))
    val r = b.select(col("bucket"), col("id").as("id_b"), col("v").as("vb"))
    l.join(r, Seq("bucket"))
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), cosine(col("va"), col("vb")).as("cos"))
      .where(col("cos") >= threshold)
      .distinct()
  }

  /** IVF-style ANN: restrict each query's search to the `nProbe` nearest
    * of `nCells` coarse cells (inverted-file structure, à la FAISS IVF).
    *
    * Centroids are a deterministic hash-spread sample of the corpus; each
    * corpus vector is assigned to its nearest centroid (one broadcast
    * scan); each query probes its nProbe nearest cells and ranks only the
    * vectors in those cells. At 100 TB the full scan of bruteForceTopK
    * becomes a per-cell scan of ~nProbe/nCells of the corpus, and the
    * cell-keyed join shuffles corpus vectors once (re-usable across query
    * batches if persisted cell-partitioned).
    */
  def ivfTopK(queries: DataFrame, corpus: DataFrame,
              queryId: Column, queryVec: Column,
              corpusId: Column, corpusVec: Column,
              k: Int, nCells: Int = 16, nProbe: Int = 4): DataFrame = {
    val c = corpus.select(corpusId.as("cand_id"), corpusVec.as("cv"))
    // deterministic pseudo-random centroid sample
    val cent = c.orderBy(xxhash64(col("cand_id")), col("cand_id")).limit(nCells)
      .select(monotonically_increasing_id().as("cell_tmp"), col("cv").as("centroid"))
      .withColumn("cell", row_number().over(Window.orderBy(col("cell_tmp"))) - 1)
      .select(col("cell"), col("centroid"))
    // assign corpus vectors to nearest centroid
    val wAssign = Window.partitionBy(col("cand_id"))
      .orderBy(col("cs").desc, col("cell").asc)
    val assigned = c.join(broadcast(cent), lit(true))
      .select(col("cand_id"), col("cv"), col("cell"), cosine(col("cv"), col("centroid")).as("cs"))
      .withColumn("rk", row_number().over(wAssign)).where(col("rk") === 1)
      .select(col("cell"), col("cand_id"), col("cv"))
    // queries probe their nProbe nearest cells
    val q = queries.select(queryId.as("query_id"), queryVec.as("qv"))
    val wProbe = Window.partitionBy(col("query_id"))
      .orderBy(col("cs").desc, col("cell").asc)
    val probes = q.join(broadcast(cent), lit(true))
      .select(col("query_id"), col("qv"), col("cell"), cosine(col("qv"), col("centroid")).as("cs"))
      .withColumn("rk", row_number().over(wProbe)).where(col("rk") <= nProbe)
      .select(col("cell"), col("query_id"), col("qv"))
    // rank within probed cells only
    val wTop = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("cand_id").asc)
    probes.join(assigned, Seq("cell"))
      .where(col("query_id") =!= col("cand_id"))
      .select(col("query_id"), col("cand_id"), cosine(col("qv"), col("cv")).as("cos"))
      .withColumn("rk", row_number().over(wTop))
      .where(col("rk") <= k)
      .select(col("query_id"), col("cand_id"), col("rk"))
  }

  /** Sign-bit signature of `planes` random hyperplanes. Plane components
    * are deterministic pseudo-randoms derived from xxh64(plane, dim) —
    * reproducible across runs/partitions, no RNG state. Single-pass
    * custom expression (graft.functions.Kernels.HyperplaneSignature); the
    * `dim` parameter is retained for API stability but unused (the kernel
    * reads the vector's own length).
    */
  def hyperplaneSignature(vec: Column, dim: Int, planes: Int): Column =
    graft.functions.Kernels.hyperplane_signature(vec, planes)
}
