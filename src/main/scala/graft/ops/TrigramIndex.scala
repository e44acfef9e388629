package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Substring search ("grep") over a document corpus through a standing
  * character-trigram index — the accelerated form of `text LIKE
  * '%pattern%'`, which no token index can answer (patterns cross token
  * boundaries and match inside words).
  *
  * Postings are the DISTINCT character 3-grams of the lowercased text:
  * `(gram, doc_id)`. A pattern of length ≥ 3 contains each of its own
  * 3-grams contiguously, so every matching document carries ALL the
  * pattern's grams — candidates are the docs whose matched-gram count
  * equals the pattern's distinct-gram count (the same counting AND as
  * [[Bm25Index.searchAll]]), then only the candidates' text is fetched
  * for the exact `contains` verify (grams are necessary, not
  * sufficient: "abcabd" carries the grams of "abcd" without the
  * substring).
  *
  * Scale shape: the postings scan is pruned to the pattern's grams by a
  * pushed `gram IN (...)` parquet filter over range-partitioned,
  * sorted gram files (footer min/max skips whole files); the corpus is
  * read only for the candidate semi join. Nothing corpus-sized ever
  * shuffles — the one exchange hashes slim (qid, doc_id) candidate
  * rows. Case folds via `lower` on both index and query side.
  *
  * Reference scope: the reference platform has no retrieval surface
  * (SURVEY §2.8); this extends the standing-index family
  * ([[Bm25Index]] lexical, [[IvfIndex]] vector) with the substring
  * axis an LLM-data pipeline needs for contamination greps, PII
  * pattern sweeps, and boilerplate hunting over 100 TB.
  */
object TrigramIndex {

  private val N = 3 // character n-gram width

  private def norm(text: Column): Column = lower(text)

  /** Distinct character 3-grams of a (already normalized) string
    * column; empty array below 3 chars (Spark's `sequence(1, 0)`
    * DESCENDS, so the short case must short-circuit).
    */
  private[ops] def grams(s: Column): Column =
    when(length(s) < N, array().cast("array<string>"))
      .otherwise(array_distinct(transform(
        sequence(lit(1), length(s) - (N - 1)),
        i => substr(s, i, lit(N)))))

  private val postSchema = org.apache.spark.sql.types.StructType.fromDDL(
    "gram STRING, doc_id BIGINT")

  private def requireIntegralId(df: DataFrame): DataFrame = {
    val dt = df.schema("doc_id").dataType
    require(Seq("bigint", "int", "smallint", "tinyint").contains(dt.simpleString),
      s"trigram: doc id must be integral, got ${dt.simpleString}")
    df.withColumn("doc_id", col("doc_id").cast("long"))
  }

  private def postings(docs: DataFrame, id: Column, text: Column): DataFrame =
    requireIntegralId(
      docs.select(id.as("doc_id"), grams(norm(text)).as("gs"))
        .select(col("doc_id"), explode(col("gs")).as("gram")))

  private def readPost(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(postSchema).parquet(s"$path/_post")
      .select(col("gram"), col("doc_id"))

  private case class Meta(folds: Long, lastBatch: Long)

  private def meta(spark: SparkSession, path: String): Meta = {
    val m = spark.read.parquet(s"$path/_model/meta")
      .select(col("folds"), col("last_batch")).head
    Meta(m.getLong(0), m.getLong(1))
  }

  private def writeMeta(spark: SparkSession, dir: String, m: Meta): Unit =
    spark.range(1)
      .select(lit(m.folds).as("folds"), lit(m.lastBatch).as("last_batch"))
      .write.mode("overwrite").parquet(s"$dir/meta")

  private def commitFold(df: DataFrame, dir: String, fold: Long): Unit = {
    val spark = df.sparkSession
    val staging = s"$dir/_staging"
    df.write.mode("overwrite").parquet(staging)
    val conf = spark.sparkContext.hadoopConfiguration
    val src = new org.apache.hadoop.fs.Path(staging)
    val dst = new org.apache.hadoop.fs.Path(s"$dir/fold=$fold")
    val fs = dst.getFileSystem(conf)
    fs.delete(dst, true) // replayed crashed commit: same bytes, re-rename
    require(fs.rename(src, dst), s"trigram: fold commit failed: $staging -> $dst")
  }

  /** Build the persisted index at `path`: one tokenize pass into fold 0,
    * gram-range-partitioned and sorted so [[search]]'s pushed filter
    * skips whole files by footer min/max.
    */
  def build(docs: DataFrame, id: Column, text: Column, path: String): Unit = {
    val spark = docs.sparkSession
    commitFold(postings(docs, id, text)
      .repartitionByRange(col("gram")).sortWithinPartitions(col("gram")),
      s"$path/_post", 0L)
    writeMeta(spark, s"$path/_model", Meta(folds = 0L, lastBatch = -1L))
  }

  /** Substring search: `queries` is (qid, pattern); output (qid,
    * doc_id) for every document whose text contains the pattern
    * (case-insensitive). Patterns shorter than 3 characters fail fast —
    * a trigram index cannot prune them and a silent corpus scan is
    * never what an index caller wants.
    */
  def search(spark: SparkSession, queries: DataFrame, qid: Column, qtext: Column,
             corpus: DataFrame, id: Column, text: Column, path: String,
             maxQueryGrams: Int = 10000): DataFrame = {
    val q = queries.select(qid.cast("long").as("qid"), norm(qtext).as("pat"))
      .localCheckpoint()
    val nShort = q.where(length(col("pat")) < N).count()
    require(nShort == 0,
      s"trigram search: $nShort pattern(s) shorter than $N chars — the index " +
        "cannot prune them; filter or pad the patterns")
    val qg = q.select(col("qid"), explode(grams(col("pat"))).as("gram"))
      .localCheckpoint()
    val gs = qg.select(col("gram")).distinct().collect().map(_.getString(0))
    require(gs.length <= maxQueryGrams,
      s"trigram search: ${gs.length} distinct query grams exceed " +
        s"maxQueryGrams=$maxQueryGrams — batch the queries")
    val qn = qg.groupBy(col("qid")).agg(count(lit(1)).as("__qn"))
    val cands = readPost(spark, path).where(col("gram").isin(gs.toSeq: _*))
      .join(broadcast(qg), Seq("gram"))
      .groupBy(col("qid"), col("doc_id")).agg(count(lit(1)).as("__m"))
      .join(broadcast(qn), Seq("qid"))
      .where(col("__m") === col("__qn"))
      .select(col("qid"), col("doc_id"))
    val docs = requireIntegralId(corpus.select(id.as("doc_id"), norm(text).as("__s")))
      .join(cands.select(col("doc_id")).distinct(), Seq("doc_id"))
    cands.join(broadcast(q), Seq("qid")).join(docs, Seq("doc_id"))
      .where(contains(col("__s"), col("pat")))
      .select(col("qid"), col("doc_id"))
  }

  /** Fold a batch of NEW documents in as fold `folds+1` — exactly-once
    * under streaming replay via the `last_batch` ledger in the `_model`
    * swap ([[Bm25Index.append]]'s discipline: fold files commit first by
    * idempotent staging rename, then the ledger commits atomically).
    */
  def append(docs: DataFrame, id: Column, text: Column, path: String,
             batchId: Long = -1L): Unit = {
    val spark = docs.sparkSession
    val m = meta(spark, path)
    if (batchId >= 0 && batchId <= m.lastBatch) return // re-delivery
    val fold = m.folds + 1
    commitFold(postings(docs, id, text)
      .repartitionByRange(col("gram")).sortWithinPartitions(col("gram")),
      s"$path/_post", fold)
    val tmp = s"$path/_model.next"
    writeMeta(spark, tmp, Meta(fold, math.max(batchId, m.lastBatch)))
    IvfIndex.swapDirs(spark, s"$path/_model", tmp)
  }

  /** Continuous ingestion: [[append]] per micro-batch — the live-corpus
    * twin of [[searchStream]], exactly-once under replay.
    */
  def appendStream(spark: SparkSession, docStream: DataFrame, id: Column,
                   text: Column, path: String): org.apache.spark.sql.streaming.StreamingQuery =
    docStream.writeStream
      .foreachBatch { (batch: DataFrame, bid: Long) =>
        IvfIndex.retryingStaleReads() {
          append(batch, id, text, path, batchId = bid)
        }
      }
      .start()

  /** Continuous retrieval: [[search]] per micro-batch of patterns — the
    * standing-grep shape (PII sweeps, contamination alerts). Index
    * swaps from a concurrent [[append]] are picked up across batches;
    * `onBatch` must be idempotent under replay.
    */
  def searchStream(spark: SparkSession, queryStream: DataFrame, qid: Column,
                   qtext: Column, corpus: DataFrame, id: Column, text: Column,
                   path: String)
                  (onBatch: DataFrame => Unit): org.apache.spark.sql.streaming.StreamingQuery =
    queryStream.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        IvfIndex.retryingStaleReads() {
          onBatch(search(spark, batch, qid, qtext, corpus, id, text, path))
        }
      }
      .start()
}
