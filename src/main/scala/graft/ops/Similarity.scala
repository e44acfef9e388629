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

  /** Rank scored (query_id, cand_id, cos) triples: top k per query by
    * (cos desc, cand_id asc) — same order as a row_number window, but via
    * a bounded-heap aggregate with map-side partial merge
    * ([[graft.functions.Kernels.collect_bottom_k]] on struct(-cos, id)),
    * so the ranking exchange carries at most k rows per query per map
    * partition instead of every scored candidate. At 100 TB this is the
    * difference between shuffling k·|queries|·partitions rows and
    * shuffling the whole scored corpus.
    */
  private def rankTopK(scored: DataFrame, k: Int): DataFrame =
    scored
      .select(col("query_id"), struct((-col("cos")).as("nc"), col("cand_id")).as("s"))
      .groupBy(col("query_id"))
      .agg(graft.functions.Kernels.collect_bottom_k(col("s"), k).as("top"))
      .select(col("query_id"), posexplode(col("top")).as(Seq("pos", "s")))
      .select(col("query_id"), col("s").getField("cand_id").as("cand_id"),
        (col("pos") + 1).cast("long").as("rk"))

  /** Brute-force cosine top-k: for each row of `queries`, the k most
    * similar rows of `corpus` (self-matches excluded by id). Query side is
    * broadcast — the corpus is never shuffled; the ranking exchange
    * carries only partial top-k rows (see [[rankTopK]]).
    */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame,
                     queryId: Column, queryVec: Column,
                     corpusId: Column, corpusVec: Column,
                     k: Int): DataFrame = {
    val q = queries.select(queryId.as("query_id"), queryVec.as("qv"))
    val c = corpus.select(corpusId.as("cand_id"), corpusVec.as("cv"))
    val scored = c.join(broadcast(q), col("query_id") =!= col("cand_id"))
      .select(col("query_id"), col("cand_id"), cosine(col("qv"), col("cv")).as("cos"))
    rankTopK(scored, k)
  }

  /** Embedding near-duplicate pairs: all (id_a < id_b) pairs with cosine
    * above `threshold`, found by banded (multi-table) random-hyperplane
    * LSH and verified with exact cosine — the same
    * candidates-then-verify shape as [[Dedup.minhashLsh]].
    *
    * Each of the `bands` tables hashes the vector with its own independent
    * set of `rowsPerBand` hyperplanes (seeded kernel), giving 2^rowsPerBand
    * buckets per table; a pair is a candidate iff it collides in at least
    * one table. For a pair at angle θ the per-plane agreement probability
    * is p = 1-θ/π, so miss probability is (1-p^r)^b — at the near-dup
    * regime (cosine ≥ 0.95, p ≥ 0.90) the defaults b=8, r=16 miss < 1e-7,
    * while a random pair (p ≈ 0.5) collides with probability ≈ b·p^r ≈
    * 1.2e-4, so candidates stay ~linear in the corpus. Bucket count 2^r
    * grows with r — size r so 2^r ≫ the expected corpus partition count
    * (r up to 63). The candidate exchange carries (band, bucket, id) only;
    * vectors are re-read for the (rare) candidates via a broadcast
    * semi-filter, never shuffled corpus-wide.
    */
  def cosineNearDupPairs(df: DataFrame, id: Column, vec: Column,
                         dim: Int, bands: Int = 8, rowsPerBand: Int = 16,
                         threshold: Double = 0.95): DataFrame = {
    val b0 = df.select(id.as("id"), vec.as("v"))
    Banding.verifyPairs(
      Banding.candidatePairs(hyperplaneBanded(b0, bands, rowsPerBand)),
      b0.select(col("id"), col("v").as("p")),
      cosine, "cos", threshold)
  }

  /** Cross-CORPUS embedding near-dup join: (id_a from `a`, id_b from `b`,
    * cos) for cross pairs with exact cosine >= threshold — the vector
    * analogue of [[Dedup.minhashLshJoin]] (align two embedding snapshots,
    * match a new acquisition against a deduped corpus). The hyperplane
    * kernels are seed-deterministic, so both corpora band identically and
    * the same (1-p^r)^b miss bound applies to every cross pair; the A×B
    * candidate exchange carries triples only, and each side's vectors are
    * fetched for candidates behind its own broadcast semi-filter.
    */
  def cosineNearDupJoin(a: DataFrame, aId: Column, aVec: Column,
                        b: DataFrame, bId: Column, bVec: Column,
                        dim: Int, bands: Int = 8, rowsPerBand: Int = 16,
                        threshold: Double = 0.95): DataFrame = {
    val a0 = a.select(aId.as("id"), aVec.as("v"))
    val b0 = b.select(bId.as("id"), bVec.as("v"))
    Banding.verifyPairsAcross(
      Banding.candidatePairsAcross(
        hyperplaneBanded(a0, bands, rowsPerBand),
        hyperplaneBanded(b0, bands, rowsPerBand)),
      a0.select(col("id"), col("v").as("p")),
      b0.select(col("id"), col("v").as("p")),
      cosine, "cos", threshold)
  }

  /** (band, bucket, id) triples from `bands` independent hyperplane
    * tables over an (id, v) frame — shared by the self-join and cross-join
    * forms (seeded kernel ⇒ identical banding across frames).
    */
  private def hyperplaneBanded(b0: DataFrame, bands: Int, rowsPerBand: Int): DataFrame = {
    val bandCols = (0 until bands).map { t =>
      struct(lit(t).as("band"),
        graft.functions.Kernels.hyperplane_signature(col("v"), rowsPerBand, seed = t).as("bucket"))
    }
    b0.select(col("id"), explode(array(bandCols: _*)).as("bb"))
      .select(col("bb.band").as("band"), col("bb.bucket").as("bucket"), col("id"))
  }

  /** IVF-style ANN: restrict each query's search to the `nProbe` nearest
    * of `nCells` coarse cells (inverted-file structure, à la FAISS IVF).
    *
    * Centroids are a deterministic, engine-portable sample of the corpus
    * (the nCells ids with smallest md5 — a distributed top-k, no global
    * sort). The whole centroid set is folded into ONE broadcast row, so
    * cell assignment is an inline argmax over that broadcast array — a
    * narrow map over the corpus with zero shuffle (the previous shape,
    * corpus × nCells cross-join + per-id window, shuffled 16× the corpus
    * just to pick a centroid; asserted gone in PlanQualitySpec). Probe
    * selection broadcasts the same row to the (small) query set, and the
    * probed-cell join broadcasts the probe list — the corpus is never
    * hash-partitioned at all; the final ranking is a bounded-heap
    * aggregate ([[rankTopK]]) whose exchange carries at most k rows per
    * query per map partition. At 100 TB: one scan for centroid top-k,
    * one narrow scan for assignment, ~nProbe/nCells of the corpus scored
    * per query batch, k-bounded shuffle to rank.
    */
  def ivfTopK(queries: DataFrame, corpus: DataFrame,
              queryId: Column, queryVec: Column,
              corpusId: Column, corpusVec: Column,
              k: Int, nCells: Int = 16, nProbe: Int = 4): DataFrame = {
    val c = corpus.select(corpusId.as("cand_id"), corpusVec.as("cv"))
    val centArr = centroidArray(c, nCells)
    val assigned = assignCells(c, centArr)
    val q = queries.select(queryId.as("query_id"), queryVec.as("qv"))
    val probes = probeCells(q, centArr, nProbe)
    // rank within probed cells only; probe list broadcast, corpus
    // unshuffled, ranking exchange bounded to partial top-k rows
    val scored = assigned.join(broadcast(probes), Seq("cell"))
      .where(col("query_id") =!= col("cand_id"))
      .select(col("query_id"), col("cand_id"), cosine(col("qv"), col("cv")).as("cos"))
    rankTopK(scored, k)
  }

  /** Deterministic engine-portable centroid sample folded into ONE row:
    * the nCells ids with smallest (md5(id), id) — a distributed top-k,
    * then a window over just nCells rows — as an array of (cell,
    * centroid) structs ready to broadcast.
    */
  private[ops] def centroidArray(c: DataFrame, nCells: Int): DataFrame = {
    val sampled = c.select(md5(col("cand_id").cast("string")).as("mk"), col("cand_id"), col("cv"))
      .orderBy(col("mk"), col("cand_id")).limit(nCells)
    sampled
      .withColumn("cell",
        (row_number().over(Window.orderBy(col("mk"), col("cand_id"))) - 1).cast("int"))
      .select(col("cell"), col("cv").as("centroid"))
      .agg(collect_list(struct(col("cell"), col("centroid"))).as("cents"))
  }

  /** Cell assignment as a narrow map: inline argmax against the broadcast
    * centroid array — max struct of (cosine, -cell) picks the nearest
    * centroid, ties to the lowest cell. Zero shuffle of the corpus.
    */
  private[ops] def assignCells(c: DataFrame, centArr: DataFrame): DataFrame = {
    def nearestCell(cents: Column, v: Column): Column = {
      val best = array_max(transform(cents, cc =>
        struct(cosine(cc.getField("centroid"), v).as("cs"),
          (-cc.getField("cell")).as("negCell"))))
      (-best.getField("negCell")).cast("int")
    }
    c.crossJoin(broadcast(centArr))
      .select(nearestCell(col("cents"), col("cv")).as("cell"), col("cand_id"), col("cv"))
  }

  /** Each query's nProbe nearest cells (same broadcast centroid row). */
  private[ops] def probeCells(q: DataFrame, centArr: DataFrame, nProbe: Int): DataFrame =
    q.crossJoin(broadcast(centArr))
      .select(col("query_id"), col("qv"),
        explode(slice(array_sort(transform(col("cents"), cc =>
          struct((-cosine(cc.getField("centroid"), col("qv"))).as("ncs"),
            cc.getField("cell").as("cell")))), 1, nProbe)).as("pc"))
      .select(col("pc.cell").as("cell"), col("query_id"), col("qv"))

  private[ops] def rankScored(scored: DataFrame, k: Int): DataFrame = rankTopK(scored, k)

  /** Squared L2 distance between two equal-length numeric arrays, in
    * Double, folded in index order (engine-exact, like [[dot]]).
    */
  def l2sq(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x.cast("double") - y.cast("double")) *
      (x.cast("double") - y.cast("double"))), lit(0.0), (acc, v) => acc + v)

  /** Product-quantization encode (Jégou et al. '11, à la FAISS PQ): the
    * vector splits into `m` contiguous subspaces of dim/m components; each
    * subspace is assigned the id of its nearest codeword (squared-L2,
    * ties to the lowest codeword id). The codebook is the same
    * deterministic engine-portable sample as the IVF centroids
    * ([[centroidArray]]) — `ksub` corpus rows by smallest (md5(id), id),
    * each contributing its m subvectors as the per-subspace codewords.
    * Encoding is a narrow map against the ONE broadcast codebook row: the
    * corpus is never shuffled, and the output carries m small ints per
    * vector instead of the vector — the ~32× memory compression PQ exists
    * for (8 codes vs 64 floats at the default geometry).
    */
  private[ops] def pqCodes(withVec: DataFrame, vecCol: String, centArr: DataFrame,
                           m: Int, dsub: Int): DataFrame =
    withVec.crossJoin(broadcast(centArr))
      .withColumn("codes",
        transform(sequence(lit(0), lit(m - 1)), mm =>
          array_min(transform(col("cents"), cc =>
            struct(l2sq(slice(col(vecCol), mm * dsub + 1, lit(dsub)),
              slice(cc.getField("centroid"), mm * dsub + 1, lit(dsub))).as("d"),
              cc.getField("cell").as("c")))).getField("c")))
      .drop("cents")

  /** ADC (asymmetric distance computation) score: sum over subspaces of
    * the squared L2 between the query's subvector and the candidate's
    * ASSIGNED codeword subvector — the query stays exact, the candidate is
    * its quantized reconstruction. `cents` must be the broadcast codebook
    * row; fold order is fixed (subspace 0..m-1, components in index order)
    * so the score is engine-exact.
    */
  private[ops] def adcDist(qv: Column, codes: Column, cents: Column,
                           m: Int, dsub: Int): Column =
    aggregate(sequence(lit(0), lit(m - 1)), lit(0.0), (acc, mm) =>
      acc + l2sq(slice(qv, mm * dsub + 1, lit(dsub)),
        slice(element_at(array_sort(cents), element_at(codes, mm + 1) + 1)
          .getField("centroid"), mm * dsub + 1, lit(dsub))))

  /** Exhaustive PQ top-k: every corpus vector is PQ-encoded once, queries
    * rank candidates by ADC distance (asc, ties by cand_id). This is the
    * memory-compressed brute force — at 100 TB the scored scan reads m
    * bytes of codes per candidate instead of the full vector, the query
    * set and codebook are broadcast (no corpus shuffle), and the ranking
    * exchange is k-bounded ([[rankTopK]]).
    */
  def pqTopK(queries: DataFrame, corpus: DataFrame,
             queryId: Column, queryVec: Column,
             corpusId: Column, corpusVec: Column,
             k: Int, dim: Int, m: Int = 8, ksub: Int = 16): DataFrame = {
    require(m > 0 && dim % m == 0, s"m=$m must divide dim=$dim")
    val dsub = dim / m
    val c = corpus.select(corpusId.as("cand_id"),
      transform(corpusVec, x => x.cast("double")).as("cv"))
    val centArr = centroidArray(c, ksub)
    val enc = pqCodes(c, "cv", centArr, m, dsub).select(col("cand_id"), col("codes"))
    val q = queries.select(queryId.as("query_id"),
      transform(queryVec, x => x.cast("double")).as("qv"))
    val scored = enc.join(broadcast(q), col("query_id") =!= col("cand_id"))
      .crossJoin(broadcast(centArr))
      .select(col("query_id"), col("cand_id"),
        adcDist(col("qv"), col("codes"), col("cents"), m, dsub).as("adist"))
    rankTopK(scored.select(col("query_id"), col("cand_id"), (-col("adist")).as("cos")), k)
  }

  /** Centroid of `cell` from a (cell, centroid)-struct array column. */
  private[ops] def centroidOf(cents: Column, cell: Column): Column =
    element_at(array_sort(cents), cell + 1).getField("centroid")

  /** The rows [[centroidArraySalted]] would sample, fetched WITHOUT
    * computing the upstream of every corpus row: the salted md5 top-n id
    * pick needs only the id column (a narrow top-k), and the n winning
    * rows come back through a broadcast join. Feeding an expensive
    * per-row pipeline (e.g. residual encoding) through this before
    * sampling turns a corpus-sized computation into an n-row one — same
    * rows, same order, bit-identical fold.
    */
  private[ops] def saltedSampleRows(c: DataFrame, n: Int, salt: String): DataFrame = {
    val ids = c.select(col("cand_id"),
        md5(concat(col("cand_id").cast("string"), lit(salt))).as("mk"))
      .orderBy(col("mk"), col("cand_id")).limit(n)
      .select(col("cand_id"))
    c.join(broadcast(ids), Seq("cand_id"))
  }

  /** [[centroidArray]] with a salt mixed into the sampling hash — used
    * when a second deterministic sample must differ from the first (the
    * residual-PQ codebook: the md5-min rows ARE the coarse centroids, so
    * their residuals are ~zero and would make a degenerate codebook).
    */
  private[ops] def centroidArraySalted(c: DataFrame, n: Int, salt: String): DataFrame = {
    val sampled = c.select(
        md5(concat(col("cand_id").cast("string"), lit(salt))).as("mk"),
        col("cand_id"), col("cv"))
      .orderBy(col("mk"), col("cand_id")).limit(n)
    sampled
      .withColumn("cell",
        (row_number().over(Window.orderBy(col("mk"), col("cand_id"))) - 1).cast("int"))
      .select(col("cell"), col("cv").as("centroid"))
      .agg(collect_list(struct(col("cell"), col("centroid"))).as("cents"))
  }

  /** Residual IVF-PQ top-k — the full FAISS IVFPQ: candidates are PQ-
    * encoded on their RESIDUAL from the assigned coarse centroid, and
    * each query probes a cell with its own residual from that cell's
    * centroid. Residual magnitudes are much smaller than vector
    * magnitudes, so the same codebook budget quantizes finer — better
    * recall at identical memory than [[ivfPqTopK]]'s direct encoding.
    * The PQ codebook is a salted deterministic sample of the residuals
    * (unsalted, the sample rows would be the coarse centroids themselves,
    * whose residuals are ~zero). Same scale posture as [[ivfPqTopK]]:
    * corpus never hash-partitioned, narrow encode against broadcast
    * codebooks, k-bounded ranking exchange.
    */
  def ivfPqResidualTopK(queries: DataFrame, corpus: DataFrame,
                        queryId: Column, queryVec: Column,
                        corpusId: Column, corpusVec: Column,
                        k: Int, dim: Int, nCells: Int = 16, nProbe: Int = 4,
                        m: Int = 8, ksub: Int = 16): DataFrame = {
    require(m > 0 && dim % m == 0, s"m=$m must divide dim=$dim")
    val dsub = dim / m
    val c = corpus.select(corpusId.as("cand_id"),
      transform(corpusVec, x => x.cast("double")).as("cv"))
    val coarse = centroidArray(c, nCells)
    def residOf(rows: DataFrame): DataFrame =
      assignCells(rows, coarse).crossJoin(broadcast(coarse))
        .select(col("cell"), col("cand_id"),
          zip_with(col("cv"), centroidOf(col("cents"), col("cell")), (x, y) => x - y).as("cv"))
    // codebook sample membership depends only on ids — fetch the ksub
    // winning rows raw and residual-encode just those, so the corpus-sized
    // residual pass runs once (the encode), not twice
    val book = centroidArraySalted(
      residOf(saltedSampleRows(c, ksub, ":pq")).select(col("cand_id"), col("cv")),
      ksub, ":pq")
    val enc = pqCodes(residOf(c), "cv", book, m, dsub)
      .select(col("cell"), col("cand_id"), col("codes"))
    val q = queries.select(queryId.as("query_id"),
      transform(queryVec, x => x.cast("double")).as("qv"))
    val qres = probeCells(q, coarse, nProbe).crossJoin(broadcast(coarse))
      .select(col("cell"), col("query_id"),
        zip_with(col("qv"), centroidOf(col("cents"), col("cell")), (x, y) => x - y).as("qv"))
    val scored = enc.join(broadcast(qres), Seq("cell"))
      .where(col("query_id") =!= col("cand_id"))
      .crossJoin(broadcast(book))
      .select(col("query_id"), col("cand_id"),
        adcDist(col("qv"), col("codes"), col("cents"), m, dsub).as("adist"))
    rankTopK(scored.select(col("query_id"), col("cand_id"), (-col("adist")).as("cos")), k)
  }

  /** Scalar-quantized top-k (SQ8, à la FAISS SQ): every dimension maps
    * linearly to an int8 code against per-dimension corpus min/max — 4×
    * compression with near-exact recall (vs PQ's ~32× with coarser
    * quantization; the two ends of the FAISS compression spectrum).
    * Training is ONE tiny aggregate (dim rows of min/max, folded into a
    * one-row broadcast), encode is a narrow map, scoring dequantizes
    * per-component in fixed index order (engine-exact), ranking is the
    * k-bounded aggregate. Constant dimensions (max == min) encode to 0
    * and dequantize to the constant.
    */
  def sq8TopK(queries: DataFrame, corpus: DataFrame,
              queryId: Column, queryVec: Column,
              corpusId: Column, corpusVec: Column,
              k: Int, dim: Int): DataFrame = {
    val c = corpus.select(corpusId.as("cand_id"),
      transform(corpusVec, x => x.cast("double")).as("cv"))
    val st = c.select(posexplode(col("cv")).as(Seq("d", "x")))
      .groupBy(col("d")).agg(min(col("x")).as("mn"), max(col("x")).as("mx"))
      .agg(array_sort(collect_list(struct(col("d"), col("mn"), col("mx")))).as("st"))
      .select(transform(col("st"), s => s.getField("mn")).as("mns"),
        transform(col("st"), s => s.getField("mx")).as("mxs"))
    val enc = c.crossJoin(broadcast(st)).select(col("cand_id"),
      transform(sequence(lit(0), lit(dim - 1)), d => {
        val x = element_at(col("cv"), d + 1)
        val mn = element_at(col("mns"), d + 1)
        val mx = element_at(col("mxs"), d + 1)
        when(mx === mn, lit(0)).otherwise(
          least(greatest(floor((x - mn) * 255 / (mx - mn)), lit(0L)), lit(255L)).cast("int"))
      }).as("codes"))
    val q = queries.select(queryId.as("query_id"),
      transform(queryVec, x => x.cast("double")).as("qv"))
    val scored = enc.join(broadcast(q), col("query_id") =!= col("cand_id"))
      .crossJoin(broadcast(st))
      .select(col("query_id"), col("cand_id"),
        aggregate(sequence(lit(0), lit(dim - 1)), lit(0.0), (acc, d) => {
          val mn = element_at(col("mns"), d + 1)
          val mx = element_at(col("mxs"), d + 1)
          val deq = mn + element_at(col("codes"), d + 1) * (mx - mn) / 255
          val diff = element_at(col("qv"), d + 1) - deq
          acc + diff * diff
        }).as("adist"))
    rankTopK(scored.select(col("query_id"), col("cand_id"), (-col("adist")).as("cos")), k)
  }

  /** IVF-PQ top-k (the FAISS IVFPQ composition, without residual
    * refinement): the IVF coarse structure restricts each query to its
    * nProbe nearest cells, and within the probed cells candidates are
    * ranked by PQ ADC distance instead of exact vector math. Scale story
    * compounds both halves: ~nProbe/nCells of the corpus considered per
    * query batch, and each considered candidate costs m code-lookups
    * rather than a dim-component scan. Coarse cells and the PQ codebook
    * share the deterministic md5-order sample; cell assignment stays
    * cosine (matching [[ivfTopK]]'s geometry) while ADC is squared-L2
    * (matching [[pqTopK]]).
    */
  def ivfPqTopK(queries: DataFrame, corpus: DataFrame,
                queryId: Column, queryVec: Column,
                corpusId: Column, corpusVec: Column,
                k: Int, dim: Int, nCells: Int = 16, nProbe: Int = 4,
                m: Int = 8, ksub: Int = 16): DataFrame = {
    require(m > 0 && dim % m == 0, s"m=$m must divide dim=$dim")
    val dsub = dim / m
    val c = corpus.select(corpusId.as("cand_id"),
      transform(corpusVec, x => x.cast("double")).as("cv"))
    val coarse = centroidArray(c, nCells)
    val book = centroidArray(c, ksub)
    val assigned = assignCells(c, coarse)
    val enc = pqCodes(assigned, "cv", book, m, dsub)
      .select(col("cell"), col("cand_id"), col("codes"))
    val q = queries.select(queryId.as("query_id"),
      transform(queryVec, x => x.cast("double")).as("qv"))
    val probes = probeCells(q, coarse, nProbe)
    val scored = enc.join(broadcast(probes), Seq("cell"))
      .where(col("query_id") =!= col("cand_id"))
      .crossJoin(broadcast(book))
      .select(col("query_id"), col("cand_id"),
        adcDist(col("qv"), col("codes"), col("cents"), m, dsub).as("adist"))
    rankTopK(scored.select(col("query_id"), col("cand_id"), (-col("adist")).as("cos")), k)
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

  /** Deterministic ±1 sign matrix for [[randomProjection]] —
    * `signs(j)(i)` is the j-th output component's weight on input
    * dimension i, derived from the splitmix64 finalizer (the portable
    * hash family's mixer) of `seed·GOLDEN + (i·outDim + j + 1)`.
    * Exposed so callers (and the oracle) can inline the SAME literals.
    */
  def projectionSigns(inDim: Int, outDim: Int, seed: Long): Array[Array[Long]] = {
    import graft.functions.KernelOps.{splitmix, GOLDEN}
    Array.tabulate(outDim, inDim)((j, i) =>
      if ((splitmix(seed * GOLDEN + (i.toLong * outDim + j + 1)) & 1L) == 1L) 1L
      else -1L)
  }

  /** Johnson–Lindenstrauss random projection with ±1 (Achlioptas '01)
    * signs — the dimensionality-reduction front of an embedding
    * pipeline (project 1024-d vectors to 64-d before IVF/k-means; JL
    * guarantees pairwise distances survive within 1±ε for
    * outDim = O(log n / ε²), and the ±1 matrix needs no Gaussian
    * sampling). Components are quantized FIRST — qᵢ = ⌊xᵢ·2^quantBits⌋
    * as doubles (float→double widening and a power-of-two multiply are
    * both exact) — so every output v_j = Σᵢ signs(j)(i)·qᵢ is EXACT
    * integer arithmetic: deterministic across runs, partitionings, and
    * engines (the oracle inlines the same sign literals).
    *
    * Scale shape: map-only — the sign matrix is a plan literal (tiny:
    * inDim·outDim longs), the projection is a per-row expression, no
    * exchange anywhere; at corpus scale this is one codegen'd scan.
    * A vector of the wrong length raises in-plan rather than silently
    * mis-projecting.
    *
    * Output: (id, j, v) long form — one row per vector per output
    * dimension (0-based j), robust to downstream schema tooling that
    * can't hash arrays.
    */
  def randomProjection(df: DataFrame, id: Column, vec: Column,
                       inDim: Int, outDim: Int, quantBits: Int = 20,
                       seed: Long = 7L): DataFrame = {
    require(inDim >= 1 && outDim >= 1 && outDim <= inDim,
      s"randomProjection: need 1 <= outDim <= inDim, got $outDim/$inDim")
    require(quantBits >= 1 && quantBits <= 30,
      s"randomProjection: 1 <= quantBits <= 30, got $quantBits")
    val signs = projectionSigns(inDim, outDim, seed)
    val scale = (1L << quantBits).toDouble
    val checked = when(size(vec) === inDim, vec)
      .otherwise(raise_error(concat(
        lit(s"randomProjection: expected $inDim-dim vector, got "),
        size(vec).cast("string"))))
    val q = transform(checked, x => floor(x.cast("double") * lit(scale)))
    val comps = (0 until outDim).map { j =>
      struct(lit(j.toLong).as("j"),
        aggregate(
          zip_with(q, typedLit(signs(j).toSeq), (a, s) => a * s),
          lit(0L), (acc, v) => acc + v).as("v"))
    }
    df.select(id.as("id"), explode(array(comps: _*)).as("__c"))
      .select(col("id"), col("__c.j").as("j"), col("__c.v").as("v"))
  }
}
