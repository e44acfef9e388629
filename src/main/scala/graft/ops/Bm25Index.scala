package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Lexical retrieval: BM25 top-k search over a document corpus, as a
  * one-shot operator ([[topK]]) and as a persisted standing index
  * ([[build]]/[[search]]/[[append]]/[[remove]]/[[compact]] — the lexical
  * member of the standing-index family next to the embedding-side
  * [[IvfIndex]]/[[IvfPqIndex]]: retrieval over 100 TB means BOTH a
  * vector index and an inverted text index).
  *
  * The score is the classic BM25 shape re-expressed in EXACT integer
  * arithmetic (the codebase's engine-portable posture — no
  * transcendentals, no IEEE division, so DuckDB replays it bit for bit
  * and results are identical across runs/partitionings/engines):
  *
  *   idf_bits(t)   = bitlen(N div df(t))           — ≥ 1, the bitlen
  *                   surrogate of log2(N/df) used by [[TextAnalysis]]'s
  *                   LM surprisal (bitlen(x) = floor(log2 x)+1)
  *   rel(d)        = (dl·S) div avgdl              — dl/avgdl in S=1024
  *                   fixed point, avgdl = max(1, totTokens div N)
  *   sat(t,d)      = (tf·(k1+1)·W·S) div (tf·S + k1·((1−b)·S + b·rel))
  *                   with k1 = 6/5 and b = 3/4 cleared to integers:
  *                   (tf·44·S·W) div (tf·20·S + 6·S + 18·rel), W=1024
  *   score(q,d)    = Σ_{t∈q∩d} idf_bits(t) · sat(t,d)
  *
  * sat is the standard k1/b saturation curve in W=1024 fixed point
  * (monotone in tf, asymptote (k1+1)·W·idf_bits per term); ties break
  * on doc_id.
  *
  * Scale shape: postings carry dl DENORMALIZED, so scoring never joins
  * a doc-length table — the only corpus-sized work is the postings scan,
  * and that scan is pruned to the query's terms by a pushed `term IN
  * (...)` parquet filter (query vocabularies are tiny; the pushdown is
  * plan-asserted). df and meta are broadcast-sized. The single data
  * exchange hashes slim (qid, doc_id, contrib) rows, and the per-query
  * top-k goes through the bounded-heap `collect_bottom_k` aggregate
  * (map-side partial merge), never a global sort or window.
  *
  * Reference scope: the reference platform has no retrieval surface at
  * all (SURVEY §2.8 stops at ad-hoc scalar closures); this is part of
  * the LLM-pipeline extension, the lexical complement of q39/q42's ANN.
  */
object Bm25Index {

  // k1 = K1N/K1D = 1.2, b = BN/BD = 0.75, cleared denominators below
  private val S = 1024L // dl/avgdl fixed point
  private val W = 1024L // output score fixed point

  private def toks(text: Column): Column = Stateless.tokens(text)

  private def bitlen(c: Column): Column = length(bin(c)).cast("long")

  /** (term, doc_id, tf, dl) postings of a corpus — tf with multiplicity,
    * dl the doc's total token count carried on every posting row.
    */
  private[ops] def postings(docs: DataFrame, id: Column, text: Column): DataFrame =
    docs.select(id.as("doc_id"), toks(text).as("ts"))
      .select(col("doc_id"), size(col("ts")).cast("long").as("dl"),
        explode(col("ts")).as("term"))
      .groupBy(col("term"), col("doc_id"))
      .agg(count(lit(1)).as("tf"), first(col("dl")).as("dl"))

  /** Doc registry (doc_id, dl) — includes zero-token docs, so index
    * maintenance can account for every document (postings alone lose
    * docs whose token list is empty).
    */
  private[ops] def docLengths(docs: DataFrame, id: Column, text: Column): DataFrame =
    docs.select(id.as("doc_id"), size(toks(text)).cast("long").as("dl"))

  /** Score query terms against postings — the shared scoring pass.
    * `qterms` is (qid, term) DISTINCT; `df` is (term, df); both must be
    * broadcast-sized (query vocabularies are). Output one row per
    * (qid, doc) match: the summed integer BM25 score.
    */
  private def scores(post: DataFrame, qterms: DataFrame, df: DataFrame,
                     nDocs: Long, avgdl: Long): DataFrame = {
    require(nDocs > 0, "bm25: empty corpus (n_docs = 0)")
    require(avgdl > 0, "bm25: avgdl must be positive")
    val qdf = qterms.join(df, Seq("term")) // unseen query terms drop: df=0 ⇒ no postings anyway
      .withColumn("idfb", bitlen(expr(s"${nDocs}L div df")))
    post
      .join(broadcast(qdf), Seq("term"))
      .withColumn("rel", expr(s"(dl * $S) div ${avgdl}L"))
      .withColumn("sat",
        expr(s"(tf * ${44 * S * W}L) div (tf * ${20 * S}L + ${6 * S}L + 18L * rel)"))
      .groupBy(col("qid"), col("doc_id"))
      .agg(sum(col("idfb") * col("sat")).as("score_fp"))
  }

  /** Bounded-heap top-k per query over scored matches: (qid, doc_id,
    * score_fp, rk), rk 1-based by (score desc, doc_id asc).
    */
  private def rank(scored: DataFrame, k: Int): DataFrame = {
    require(k > 0, "bm25: k must be positive")
    scored
      .select(col("qid"),
        struct((-col("score_fp")).as("ns"), col("doc_id")).as("s"))
      .groupBy(col("qid"))
      .agg(graft.functions.Kernels.collect_bottom_k(col("s"), k).as("top"))
      .select(col("qid"), posexplode(col("top")).as(Seq("pos", "s")))
      .select(col("qid"), col("s").getField("doc_id").as("doc_id"),
        (-col("s").getField("ns")).as("score_fp"),
        (col("pos") + 1).cast("long").as("rk"))
  }

  /** One-shot BM25 top-k: queries (qid, qtext) against docs (id, text).
    * Two corpus passes (postings + df/meta derive from the same
    * aggregate), no persistence — the ad-hoc form of [[search]].
    */
  def topK(docs: DataFrame, id: Column, text: Column,
           queries: DataFrame, qid: Column, qtext: Column, k: Int): DataFrame = {
    // pin the bounded postings table: the df table, the meta totals and
    // the scoring join all read it — unpinned, the corpus tokenize+count
    // pass would run three times
    val post = postings(docs, id, text).localCheckpoint()
    val df = post.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val lens = docLengths(docs, id, text)
    val m = lens.agg(count(lit(1)).as("n"),
      coalesce(sum(col("dl")), lit(0L)).as("tot"),
      coalesce(max(col("dl")), lit(0L)).as("mx")).head
    guardDl(m.getLong(2))
    val (n, tot) = (m.getLong(0), m.getLong(1))
    val qt = queries.select(qid.as("qid"), explode(toks(qtext)).as("term")).distinct()
    rank(scores(post, qt, df, n, math.max(1L, if (n == 0) 1L else tot / n)), k)
  }

  // ---- standing index: _post/ (term,doc_id,tf,dl), _df/ (term,df),
  // ----                 _len/ (doc_id,dl), _meta/ (n_docs,tot_tokens)

  /** Build the persisted index: one tokenize pass over the corpus.
    * Postings repartition on term so each parquet file covers a term
    * range — [[search]]'s pushed `term IN` filter then prunes by
    * footer min/max stats, not just row groups.
    */
  def build(docs: DataFrame, id: Column, text: Column, path: String): Unit = {
    val spark = docs.sparkSession
    val post = postings(docs, id, text).localCheckpoint()
    post.repartitionByRange(col("term")).sortWithinPartitions(col("term"))
      .write.mode("overwrite").parquet(s"$path/_post")
    post.groupBy(col("term")).agg(count(lit(1)).as("df"))
      .write.mode("overwrite").parquet(s"$path/_df")
    val lens = docLengths(docs, id, text).localCheckpoint()
    lens.write.mode("overwrite").parquet(s"$path/_len")
    writeMeta(spark, path)
  }

  // fail-fast overflow posture (KMeans.fit's discipline): tf ≤ dl and the
  // saturation numerator is tf·44·S·W ≈ tf·2^25.5, so dl must stay under
  // 2^37 for the arithmetic to be exact in a Long — a "document" past 137
  // billion tokens is a pipeline bug, not a document
  private def guardDl(maxDl: Long): Unit =
    require(maxDl < (1L << 37),
      s"bm25: max doc length $maxDl exceeds 2^37 tokens — the integer " +
        "saturation arithmetic would overflow Long; split the document")

  private def writeMeta(spark: SparkSession, path: String): Unit = {
    val m = spark.read.parquet(s"$path/_len")
      .agg(count(lit(1)).as("n"), coalesce(sum(col("dl")), lit(0L)).as("tot"),
        coalesce(max(col("dl")), lit(0L)).as("mx")).head
    guardDl(m.getLong(2))
    spark.range(1)
      .select(lit(m.getLong(0)).as("n_docs"), lit(m.getLong(1)).as("tot_tokens"))
      .write.mode("overwrite").parquet(s"$path/_meta")
  }

  private def meta(spark: SparkSession, path: String): (Long, Long) = {
    val m = spark.read.parquet(s"$path/_meta")
      .select(col("n_docs"), col("tot_tokens")).head
    (m.getLong(0), m.getLong(1))
  }

  /** Search the standing index. The query's distinct terms are collected
    * (query vocabularies are tiny by construction — bounded by
    * `maxQueryTerms`, fail-fast above it) and pushed into the postings
    * scan as a parquet `In` filter: the corpus-sized table is PRUNED AT
    * THE SCAN, never fully read, never shuffled.
    */
  def search(spark: SparkSession, queries: DataFrame, qid: Column, qtext: Column,
             path: String, k: Int, maxQueryTerms: Int = 10000): DataFrame = {
    val qt = queries.select(qid.as("qid"), explode(toks(qtext)).as("term"))
      .distinct().localCheckpoint()
    val terms = qt.select(col("term")).distinct().collect().map(_.getString(0))
    require(terms.length <= maxQueryTerms,
      s"bm25 search: ${terms.length} distinct query terms exceed " +
        s"maxQueryTerms=$maxQueryTerms — raise the cap or batch the queries")
    val (n, tot) = meta(spark, path)
    val post = spark.read.parquet(s"$path/_post")
      .where(col("term").isin(terms.toSeq: _*))
    val df = spark.read.parquet(s"$path/_df")
      .where(col("term").isin(terms.toSeq: _*))
    rank(scores(post, qt, df, n, math.max(1L, if (n == 0) 1L else tot / n)), k)
  }

  /** Fold a new batch of documents in. Postings/lengths append (batch
    * ids must be new — postings are per-(term, doc) and a re-ingested id
    * would double-count); df and meta are additive, so the result equals
    * a fresh [[build]] over the union (spec-asserted bit-identical).
    */
  def append(docs: DataFrame, id: Column, text: Column, path: String): Unit = {
    val spark = docs.sparkSession
    val post = postings(docs, id, text).localCheckpoint()
    post.repartitionByRange(col("term")).sortWithinPartitions(col("term"))
      .write.mode("append").parquet(s"$path/_post")
    docLengths(docs, id, text).write.mode("append").parquet(s"$path/_len")
    val grown = spark.read.parquet(s"$path/_df")
      .union(post.groupBy(col("term")).agg(count(lit(1)).as("df")))
      .groupBy(col("term")).agg(sum(col("df")).as("df"))
    rewrite(spark, s"$path/_df", grown)
    writeMeta(spark, path)
  }

  /** Takedown: drop the given doc ids. Index-sized work — postings and
    * lengths rewrite through a broadcast anti join, df decrements by the
    * removed docs' term memberships (read from the index itself, no
    * corpus re-read), meta re-derives from the surviving registry. The
    * result equals a fresh [[build]] over the survivors (spec-asserted).
    */
  def remove(spark: SparkSession, ids: DataFrame, idCol: Column, path: String): Unit = {
    val gone = ids.select(idCol.as("doc_id")).distinct().localCheckpoint()
    val post = spark.read.parquet(s"$path/_post").localCheckpoint()
    val dropped = post.join(broadcast(gone), Seq("doc_id"), "left_semi")
      .groupBy(col("term")).agg(count(lit(1)).as("gone_df"))
    val shrunk = spark.read.parquet(s"$path/_df")
      .join(broadcast(dropped), Seq("term"), "left_outer")
      .select(col("term"), (col("df") - coalesce(col("gone_df"), lit(0L))).as("df"))
      .where(col("df") > 0)
    val kept = post.join(broadcast(gone), Seq("doc_id"), "left_anti")
    rewrite(spark, s"$path/_post", kept.repartitionByRange(col("term")).sortWithinPartitions(col("term")))
    rewrite(spark, s"$path/_df", shrunk)
    val lens = spark.read.parquet(s"$path/_len")
      .join(broadcast(gone), Seq("doc_id"), "left_anti")
    rewrite(spark, s"$path/_len", lens)
    writeMeta(spark, path)
  }

  /** Rewrite postings one-file-per-term-range (small-file compaction
    * after many [[append]]s); results are unchanged (spec-asserted).
    */
  def compact(spark: SparkSession, path: String, partitions: Int = 32): Unit = {
    val post = spark.read.parquet(s"$path/_post")
    rewrite(spark, s"$path/_post",
      post.repartitionByRange(partitions, col("term")).sortWithinPartitions(col("term")))
  }

  private def rewrite(spark: SparkSession, dir: String, df: DataFrame): Unit = {
    val tmp = s"$dir.next"
    df.write.mode("overwrite").parquet(tmp)
    IvfIndex.swapDirs(spark, dir, tmp)
  }
}
