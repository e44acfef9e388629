package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.sources.Tables

class IvfIndexSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("persisted index returns exactly what one-shot ivfTopK returns") {
    val em = Tables(spark, sf).embeddings
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf").toString
    IvfIndex.build(em, col("vec_id"), col("embedding"), nCells = 16, dir)

    val q = em.where(col("vec_id") < 10)
    val fromIndex = IvfIndex.query(spark, dir, q, col("vec_id"), col("embedding"),
        k = 5, nProbe = 4)
      .as[(Long, Long, Long)].collect().toSet
    val oneShot = Similarity.ivfTopK(q, em,
        col("vec_id"), col("embedding"), col("vec_id"), col("embedding"),
        k = 5, nCells = 16, nProbe = 4)
      .as[(Long, Long, Long)].collect().toSet
    assert(fromIndex == oneShot,
      s"index result diverges (index=${fromIndex.size}, oneShot=${oneShot.size})")
  }

  test("appended vectors are assigned to stored centroids and found by queries") {
    val em = Tables(spark, sf).embeddings
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf_app").toString
    IvfIndex.build(em, col("vec_id"), col("embedding"), nCells = 16, dir)
    // append a near-copy of vector 5 under a new id — a query with
    // vector 5 probes its own cell, so the near-copy must rank first
    val copy = em.where(col("vec_id") === 5)
      .select((col("vec_id") + 500000L).as("vid"),
        transform(col("embedding"), x => x * 1.0f).as("emb"))
    IvfIndex.append(spark, copy, col("vid"), col("emb"), dir)
    val q = em.where(col("vec_id") === 5)
    val top = IvfIndex.query(spark, dir, q, col("vec_id"), col("embedding"),
        k = 3, nProbe = 4)
      .orderBy("rk").as[(Long, Long, Long)].collect()
    assert(top.head._2 == 500005L, s"appended near-copy not ranked first: ${top.toSeq}")
  }

  test("index query scan is dynamically partition-pruned to probed cells") {
    val em = Tables(spark, sf).embeddings
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf_dpp").toString
    IvfIndex.build(em, col("vec_id"), col("embedding"), nCells = 16, dir)
    val q = em.where(col("vec_id") < 3)
    val df = IvfIndex.query(spark, dir, q, col("vec_id"), col("embedding"),
      k = 5, nProbe = 2)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("dynamicpruning") || p.contains("PartitionFilters: [isnotnull(cell"),
      s"index scan not partition-pruned:\n$p")
    // and it still produces full top-k output for every query
    val rows = df.as[(Long, Long, Long)].collect()
    assert(rows.length == 3 * 5)
  }
}
