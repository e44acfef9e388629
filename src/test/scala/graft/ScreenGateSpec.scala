package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops._
import graft.sources.Tables

/** End-to-end parity for the q136-q142 continuous-screening gates: the
  * multi-micro-batch replay union must equal the one-shot batch operator
  * over the same input — the contract that makes the batch oracles valid
  * for the streaming queries. The per-operator MemoryStream parity lives
  * in each index's own spec; this exercises the actual SparkEntry query
  * glue (slice staging, foreachBatch parquet fold, schema-pinned read).
  */
class ScreenGateSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val sf = "/root/testdata/sf0.001"

  private def rows(df: DataFrame): Set[Seq[Any]] = df.collect().map(_.toSeq).toSet

  test("q136: multi-batch LSH screening == direct cross-corpus near-dup join") {
    val docs = Tables(spark, sf).documents
    val streamed = SparkEntry.queries("q136_lsh_screen_stream")(spark, sf)
      .select(col("new_id"), col("dup_id"), col("jaccard"))
    val direct = Dedup.minhashLshJoin(
        docs.where(col("doc_id") % 2 === 1), col("doc_id"), col("text"),
        docs.where(col("doc_id") % 2 === 0), col("doc_id"), col("text"),
        shingleN = 3, numHashes = 32, bands = 16, rowsPerBand = 2,
        threshold = 0.8)
      .select(col("id_a").as("new_id"), col("id_b").as("dup_id"), col("jaccard"))
    assert(rows(streamed) == rows(direct))
  }

  test("q137: multi-batch decontamination screening == batch containmentPairs") {
    val docs = Tables(spark, sf).documents
    val streamed = SparkEntry.queries("q137_decon_screen_stream")(spark, sf)
    val direct = Decontamination.containmentPairs(
      docs.where(col("doc_id") % 50 =!= 0), col("doc_id"), col("text"),
      docs.where(col("doc_id") % 50 === 0), col("doc_id"), col("text"),
      n = 3, threshold = 0.3)
    assert(rows(streamed) == rows(direct))
  }

  test("q139: per-batch persisted-IVF search == one-shot ivfTopK") {
    val em = Tables(spark, sf).embeddings
    val streamed = SparkEntry.queries("q139_ivf_search_stream")(spark, sf)
    val direct = Similarity.ivfTopK(
      em.where(col("vec_id") < 10), em,
      col("vec_id"), col("embedding"), col("vec_id"), col("embedding"),
      k = 5, nCells = 16, nProbe = 4)
    assert(rows(streamed) == rows(direct) && streamed.count() > 0)
  }

  test("q142: per-batch count folds against the stored baseline == direct tokenDrift") {
    val docs = Tables(spark, sf).documents
    val half = substring(md5(col("doc_id").cast("string")), 1, 1)
    val streamed = SparkEntry.queries("q142_drift_stream")(spark, sf)
    val direct = TextAnalysis.tokenDrift(
        docs.where(half < "8"), docs.where(half >= "8"),
        col("text"), col("text"))
      .orderBy(col("move").desc, col("token").asc)
      .limit(50)
      .withColumn("move", col("move").cast("long"))
    // both ordered identically (move desc, token asc — total order per
    // tie-break), so compare as sequences
    assert(streamed.collect().map(_.toSeq).toSeq ==
      direct.collect().map(_.toSeq).toSeq)
  }

  test("q143: per-batch assignment against the stored model == direct fit+assign") {
    val em = Tables(spark, sf).embeddings
    val streamed = SparkEntry.queries("q143_kmeans_assign_stream")(spark, sf)
    val direct = KMeans.assign(em, col("vec_id"), col("embedding"),
      KMeans.fit(em, col("vec_id"), col("embedding"), k = 8, iters = 2))
    assert(rows(streamed) == rows(direct) && streamed.count() > 0)
  }

  test("q144: search through the stream-grown index == one-shot topK over the full corpus") {
    import spark.implicits._
    val docs = Tables(spark, sf).documents
    val qs = Seq((0L, "merge sort join table"), (1L, "stream window filter slow"),
      (2L, "customer order supplier part")).toDF("qid", "qtext")
    val streamed = SparkEntry.queries("q144_bm25_ingest_stream")(spark, sf)
    val direct = Bm25Index.topK(docs, col("doc_id"), col("text"),
      qs, col("qid"), col("qtext"), k = 10)
    assert(rows(streamed) == rows(direct) && streamed.count() > 0)
  }

  test("q145: per-batch persisted IVF-PQ search == one-shot residual IVF-PQ") {
    val em = Tables(spark, sf).embeddings
    val streamed = SparkEntry.queries("q145_ivfpq_search_stream")(spark, sf)
    val direct = Similarity.ivfPqResidualTopK(
      em.where(col("vec_id") < 10), em,
      col("vec_id"), col("embedding"), col("vec_id"), col("embedding"),
      k = 5, dim = 64, nCells = 16, nProbe = 4, m = 8, ksub = 16)
    assert(rows(streamed) == rows(direct) && streamed.count() > 0)
  }

  test("q146: per-batch scoring against the stored DSIR model == one-shot importanceWeights") {
    val docs = Tables(spark, sf).documents
    val streamed = SparkEntry.queries("q146_dsir_score_stream")(spark, sf)
    val direct = Sampling.importanceWeights(docs,
        docs.where(col("source") === "src0"),
        col("doc_id"), col("text"), buckets = 1024)
      .withColumnRenamed("id", "doc_id")
    assert(rows(streamed) == rows(direct) && streamed.count() > 0)
  }

  test("q147: per-batch real PNG decode == one-shot batch decode") {
    import spark.implicits._
    val ids = Tables(spark, sf).embeddings.select(col("vec_id")).as[Long]
    val streamed = SparkEntry.queries("q147_media_decode_stream")(spark, sf)
    val direct = Multimodal.decodeImages(
        Multimodal.syntheticPngMediaFor(ids), dim = 16)
      .toDF().select(col("media_id"), col("width"), col("height"),
        col("mean_intensity"))
    assert(rows(streamed) == rows(direct) && streamed.count() > 0)
  }

  test("q148: stream-static enrichment join == batch join") {
    val t = Tables(spark, sf)
    val streamed = SparkEntry.queries("q148_stream_static_join")(spark, sf)
    val direct = t.events.join(
        t.customer.select(col("c_custkey"), col("c_nationkey")),
        col("user_id") === col("c_custkey"))
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("c_nationkey"))
    assert(rows(streamed) == rows(direct) && streamed.count() > 0)
  }
}
