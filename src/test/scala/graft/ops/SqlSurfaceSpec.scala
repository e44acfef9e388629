package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.sources.Tables

/** End-to-end SQL-surface parity: every graft kernel must be reachable
  * from `spark.sql(...)` (via GraftExtensions, which GraftSession installs)
  * over the registered views (Tables.registerAll), and produce exactly the
  * DataFrame API's results. The reference has no SQL layer (SURVEY §0) —
  * this locks the widened surface down as a first-class, tested API.
  */
class SqlSurfaceSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"
  private lazy val registered = { Tables(spark, sf).registerAll(); true }

  test("word count as SQL equals the FlatMap/groupBy DataFrame form") {
    assert(registered)
    val sql = spark.sql(
      """SELECT tok AS word, count(*) AS n
        |FROM (SELECT explode(graft_tokens(text)) AS tok FROM documents)
        |GROUP BY tok""".stripMargin)
      .as[(String, Long)].collect().toSet
    val df = Tables(spark, sf).documents
      .select(explode(Stateless.tokens(col("text"))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toSet
    assert(sql == df, s"sql=${sql.size} df=${df.size}")
    assert(sql.nonEmpty)
  }

  test("minhash signature + shingles as SQL equal the Dedup column form") {
    assert(registered)
    val sql = spark.sql(
      """SELECT doc_id, minhash_signature(word_shingles(graft_tokens(text), 3), 32) AS sig
        |FROM documents""".stripMargin)
      .as[(Long, Array[Long])].collect().map { case (i, s) => (i, s.toSeq) }.toSet
    val df = Tables(spark, sf).documents
      .select(col("doc_id"),
        Dedup.minhashSignature(Dedup.shingles(col("text"), 3), 32).as("sig"))
      .as[(Long, Array[Long])].collect().map { case (i, s) => (i, s.toSeq) }.toSet
    assert(sql == df)
    assert(sql.nonEmpty)
  }

  test("cosine similarity as SQL equals the Similarity column form") {
    assert(registered)
    val sql = spark.sql(
      """SELECT a.vec_id AS ia, b.vec_id AS ib,
        |       cosine_similarity(a.embedding, b.embedding) AS cos
        |FROM embeddings a JOIN embeddings b
        |  ON a.vec_id < 5 AND b.vec_id < 5 AND a.vec_id < b.vec_id""".stripMargin)
      .as[(Long, Long, Double)].collect().toSet
    val em = Tables(spark, sf).embeddings
    val a = em.select(col("vec_id").as("ia"), col("embedding").as("va")).where(col("ia") < 5)
    val b = em.select(col("vec_id").as("ib"), col("embedding").as("vb")).where(col("ib") < 5)
    val df = a.join(b, col("ia") < col("ib"))
      .select(col("ia"), col("ib"), Similarity.cosine(col("va"), col("vb")).as("cos"))
      .as[(Long, Long, Double)].collect().toSet
    assert(sql == df)
    assert(sql.size == 10)
  }

  test("simhash, hyperplane and rolling-fingerprint kernels as SQL equal column forms") {
    assert(registered)
    val sql = spark.sql(
      """SELECT doc_id,
        |       simhash64(graft_tokens(text)) AS sh,
        |       hyperplane_signature(CAST(array(1.0, 2.0, 3.0) AS ARRAY<DOUBLE>), 16, 1) AS hp,
        |       rolling_fingerprint(graft_tokens(text), 4) AS rf
        |FROM documents""".stripMargin)
      .as[(Long, Long, Long, Long)].collect().toSet
    val df = Tables(spark, sf).documents
      .select(col("doc_id"),
        Dedup.simhash(col("text")).as("sh"),
        graft.functions.Kernels.hyperplane_signature(
          array(lit(1.0), lit(2.0), lit(3.0)), 16, seed = 1).as("hp"),
        graft.functions.Kernels.rolling_fingerprint(
          Stateless.tokens(col("text")), 4).as("rf"))
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(sql == df)
    assert(sql.nonEmpty)
  }

  test("composed text/sampling operators as SQL equal the column forms") {
    assert(registered)
    val sql = spark.sql(
      """SELECT doc_id,
        |       redact_pii(text || ' mail x@y.io ip 10.0.0.1') AS red,
        |       pii_counts(text || ' mail x@y.io ip 10.0.0.1').emails AS n_em,
        |       lang_id(text) AS lang_pred,
        |       token_count(text) AS n_toks,
        |       doc_fingerprint(text) AS fp,
        |       hash_bucket(doc_id) AS hb
        |FROM documents""".stripMargin)
      .as[(Long, String, Int, String, Int, String, Int)].collect().toSet
    val df = Tables(spark, sf).documents
      .select(col("doc_id"),
        TextAnalysis.redactPii(concat(col("text"), lit(" mail x@y.io ip 10.0.0.1"))).as("red"),
        TextAnalysis.piiCounts(concat(col("text"), lit(" mail x@y.io ip 10.0.0.1")))
          .getField("emails").as("n_em"),
        TextAnalysis.langId(col("text")).as("lang_pred"),
        TextAnalysis.tokenCount(col("text")).as("n_toks"),
        TextAnalysis.fingerprint(col("text")).as("fp"),
        Sampling.hashBucket(col("doc_id")).as("hb"))
      .as[(Long, String, Int, String, Int, String, Int)].collect().toSet
    assert(sql == df)
    assert(sql.exists(_._2.contains("<EMAIL>")))
    assert(sql.forall(_._3 == 1))
  }

  test("a full dedup candidate query runs as pure SQL") {
    assert(registered)
    // the q37 bucket-join shape, written by a SQL user with no DataFrame
    // code at all — kernels + views + lateral explode
    val pairs = spark.sql(
      """WITH banded AS (
        |  SELECT doc_id, b.band, b.bucket
        |  FROM (SELECT doc_id,
        |          minhash_signature(word_shingles(graft_tokens(text), 3), 32) AS sig
        |        FROM documents)
        |  LATERAL VIEW explode(
        |    transform(sequence(0, 15), i ->
        |      struct(i AS band,
        |             xxhash64(i, array_join(slice(sig, i * 2 + 1, 2), ',')) AS bucket))) t AS b
        |)
        |SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b
        |FROM banded l JOIN banded r
        |  ON l.band = r.band AND l.bucket = r.bucket AND l.doc_id < r.doc_id""".stripMargin)
      .as[(Long, Long)].collect().toSet
    val direct = {
      val sh = Tables(spark, sf).documents
        .select(col("doc_id").as("id"), Dedup.shingles(col("text"), 3).as("sh"))
        .where(size(col("sh")) > 0)
      val banded = sh.select(col("id"),
          explode(Dedup.lshBands(Dedup.minhashSignature(col("sh"), 32), 16, 2)).as("bb"))
        .select(col("bb.band").as("band"), col("bb.bucket").as("bucket"), col("id"))
      banded.as("l").join(banded.as("r"),
          col("l.band") === col("r.band") && col("l.bucket") === col("r.bucket") &&
            col("l.id") < col("r.id"))
        .select(col("l.id"), col("r.id")).distinct()
        .as[(Long, Long)].collect().toSet
    }
    assert(pairs == direct, s"sql=${pairs.size} direct=${direct.size}")
    assert(pairs.nonEmpty)
  }
}
