package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class IvfPqIndexSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"
  private def tmp() =
    java.nio.file.Files.createTempDirectory("graft_ivfpq").toString

  test("build + query equals the one-shot residual IVF-PQ exactly") {
    val em = graft.sources.Tables(spark, sf).embeddings
    val dir = tmp()
    IvfPqIndex.build(em, col("vec_id"), col("embedding"),
      nCells = 16, dir, m = 8, ksub = 16)
    val q = em.where(col("vec_id") < 6)
    val viaIndex = IvfPqIndex.query(spark, dir, q, col("vec_id"), col("embedding"),
      k = 5, nProbe = 4).as[(Long, Long, Long)].collect().toSet
    val oneShot = Similarity.ivfPqResidualTopK(q, em,
      col("vec_id"), col("embedding"), col("vec_id"), col("embedding"),
      k = 5, dim = 64, nCells = 16, nProbe = 4, m = 8, ksub = 16)
      .as[(Long, Long, Long)].collect().toSet
    assert(viaIndex == oneShot)
    assert(viaIndex.nonEmpty)
  }

  test("query scan is partition-pruned to the probed cells; codes only, no vectors") {
    val em = graft.sources.Tables(spark, sf).embeddings
    val dir = tmp()
    IvfPqIndex.build(em, col("vec_id"), col("embedding"), nCells = 16, dir)
    val df = IvfPqIndex.query(spark, dir,
      em.where(col("vec_id") < 3), col("vec_id"), col("embedding"),
      k = 5, nProbe = 2)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("dynamicpruning") || p.contains("PartitionFilters: [isnotnull(cell"),
      s"index scan not partition-pruned:\n$p")
    // the index read projects codes, never a vector column
    val scanLine = p.linesIterator.find(l => l.contains("FileScan") && l.contains("codes"))
    assert(scanLine.isDefined, s"codes scan not found:\n$p")
    assert(!scanLine.get.contains("cv"), s"index scan reads vectors:\n${scanLine.get}")
    assert(df.as[(Long, Long, Long)].collect().length == 3 * 5)
  }

  test("append: new vectors are encoded against the frozen codebook and become findable") {
    val em = graft.sources.Tables(spark, sf).embeddings
    val dir = tmp()
    IvfPqIndex.build(em.where(col("vec_id") < 400), col("vec_id"), col("embedding"),
      nCells = 8, dir)
    val extra = em.where(col("vec_id") >= 400)
    IvfPqIndex.append(spark, extra, col("vec_id"), col("embedding"), dir)
    // probing every cell must now surface appended ids among candidates
    val got = IvfPqIndex.query(spark, dir,
      extra.limit(2), col("vec_id"), col("embedding"), k = 3, nProbe = 8)
      .as[(Long, Long, Long)].collect()
    assert(got.nonEmpty)
    // an appended vector's nearest neighbors may include other appended
    // rows; at minimum the index must contain them all
    val n = spark.read.parquet(dir).count()
    assert(n == em.count())
    // compact: query results identical, per-cell file count collapses to 1
    val before = IvfPqIndex.query(spark, dir,
      extra.limit(2), col("vec_id"), col("embedding"), k = 3, nProbe = 8)
      .as[(Long, Long, Long)].collect().toSet
    IvfPqIndex.compact(spark, dir)
    val after = IvfPqIndex.query(spark, dir,
      extra.limit(2), col("vec_id"), col("embedding"), k = 3, nProbe = 8)
      .as[(Long, Long, Long)].collect().toSet
    assert(after == before)
    val cellDirs = new java.io.File(dir).listFiles().filter(_.getName.startsWith("cell="))
    assert(cellDirs.nonEmpty && cellDirs.forall(
      _.listFiles().count(_.getName.endsWith(".parquet")) == 1),
      "compact left more than one file in a cell")
  }

  test("searchStream: micro-batch answers equal the one-shot query") {
    implicit val ctx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val em = graft.sources.Tables(spark, sf).embeddings
    val dir = tmp()
    IvfPqIndex.build(em, col("vec_id"), col("embedding"),
      nCells = 16, dir, m = 8, ksub = 16)
    val in = MemoryStream[Long]
    val got = new java.util.concurrent.ConcurrentHashMap[Long, Set[(Long, Long)]]()
    val q = IvfPqIndex.searchStream(spark,
      in.toDF().toDF("qid")
        .join(em.select(col("vec_id").as("qid"), col("embedding")), Seq("qid")),
      col("qid"), col("embedding"), dir, k = 5, nProbe = 4) { res =>
      res.as[(Long, Long, Long)].collect()
        .groupBy(_._1).foreach { case (id, rs) =>
          got.put(id, rs.map(r => (r._2, r._3)).toSet)
        }
    }
    try {
      in.addData(0L, 1L); q.processAllAvailable()
      in.addData(2L); q.processAllAvailable()
    } finally q.stop()
    val expect = IvfPqIndex.query(spark, dir, em.where(col("vec_id") < 3),
        col("vec_id"), col("embedding"), k = 5, nProbe = 4)
      .as[(Long, Long, Long)].collect()
      .groupBy(_._1).map { case (id, rs) => id -> rs.map(r => (r._2, r._3)).toSet }
    assert((0L to 2L).forall(id => got.get(id) == expect(id)),
      s"stream answers diverge from one-shot: $got vs $expect")
  }
}
