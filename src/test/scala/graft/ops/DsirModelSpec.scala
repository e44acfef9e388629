package graft.ops

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.sources.Tables

class DsirModelSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def weights(path: String, df: org.apache.spark.sql.DataFrame) =
    DsirModel.score(spark, df, col("doc_id"), col("text"), path)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap

  test("stored model scores == one-shot importanceWeights") {
    val docs = Tables(spark, sf).documents
    val target = docs.where(col("source") === "src0")
    val dir = Files.createTempDirectory("graft_dsir").toString + "/m"
    DsirModel.build(docs, target, col("doc_id"), col("text"), dir, buckets = 1024)
    val fromModel = weights(dir, docs)
    val oneShot = Sampling.importanceWeights(docs, target,
        col("doc_id"), col("text"), buckets = 1024)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(fromModel == oneShot && fromModel.size == 500)
  }

  test("update folds a raw batch exactly: grown model == fresh build on the grown corpus") {
    val docs = Tables(spark, sf).documents
    val target = docs.where(col("source") === "src0")
    val base = docs.where(col("doc_id") < 300)
    val batch = docs.where(col("doc_id") >= 300)
    val d1 = Files.createTempDirectory("graft_dsir").toString + "/m"
    val d2 = Files.createTempDirectory("graft_dsir").toString + "/m"
    DsirModel.build(base, target, col("doc_id"), col("text"), d1, buckets = 1024)
    DsirModel.update(spark, batch, col("doc_id"), col("text"), d1)
    DsirModel.build(docs, target, col("doc_id"), col("text"), d2, buckets = 1024)
    assert(weights(d1, docs) == weights(d2, docs))
    // swap hygiene
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(s"$d1.fold")))
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(s"$d1.old")))
  }

  test("remove subtracts exactly: shrunk model == fresh build on the survivors") {
    val docs = Tables(spark, sf).documents
    val target = docs.where(col("source") === "src0")
    val removed = docs.where(col("doc_id") % 5 === 0)
    val survivors = docs.where(col("doc_id") % 5 =!= 0)
    val d1 = Files.createTempDirectory("graft_dsir").toString + "/m"
    val d2 = Files.createTempDirectory("graft_dsir").toString + "/m"
    DsirModel.build(docs, target, col("doc_id"), col("text"), d1, buckets = 1024)
    DsirModel.remove(spark, removed, col("doc_id"), col("text"), d1)
    DsirModel.build(survivors, target, col("doc_id"), col("text"), d2, buckets = 1024)
    assert(weights(d1, survivors) == weights(d2, survivors))
  }

  test("scoreStream: micro-batches scored against the standing model") {
    implicit val ctx = spark.sqlContext
    val docs = Tables(spark, sf).documents
    val target = docs.where(col("source") === "src0")
    val dir = Files.createTempDirectory("graft_dsir_s").toString + "/m"
    DsirModel.build(docs, target, col("doc_id"), col("text"), dir, buckets = 1024)
    val expected = weights(dir, docs.where(col("doc_id") < 6))

    val in = MemoryStream[(Long, String)]
    val got = new java.util.concurrent.ConcurrentHashMap[Long, (Long, Long)]()
    val q = DsirModel.scoreStream(spark, in.toDF().toDF("doc_id", "text"),
        col("doc_id"), col("text"), dir) { scored =>
      scored.as[(Long, Long, Long)].collect()
        .foreach(r => got.put(r._1, (r._2, r._3)))
    }
    try {
      val rows = docs.where(col("doc_id") < 6)
        .select(col("doc_id"), col("text")).as[(Long, String)].collect()
      in.addData(rows.take(3).toIndexedSeq: _*)
      q.processAllAvailable()
      in.addData(rows.drop(3).toIndexedSeq: _*)
      q.processAllAvailable()
    } finally q.stop()
    import scala.jdk.CollectionConverters._
    assert(got.asScala.toMap == expected)
  }
}
