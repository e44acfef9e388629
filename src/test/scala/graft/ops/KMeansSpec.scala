package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.sources.Tables

class KMeansSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"
  private val Q = 1000000L

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  /** Driver-side replica of the fixed-point Lloyd fit: same quantization,
    * same md5-order init, same integer L2 / lowest-cell ties, same
    * truncating-division update, same keep-on-empty rule.
    */
  private def refFit(data: Seq[(Long, Array[Double])], k: Int, iters: Int)
      : Vector[Array[Long]] = {
    val xq = data.map { case (id, v) => id -> v.map(x => math.floor(x * Q).toLong) }
    var cents: Vector[Array[Long]] = xq
      .sortBy { case (id, _) => (md5hex(id.toString), id) }.take(k).map(_._2).toVector
    def l2(a: Array[Long], b: Array[Long]): Long =
      a.indices.map(i => (a(i) - b(i)) * (a(i) - b(i))).sum
    for (_ <- 1 to iters) {
      val assigned = xq.map { case (_, x) =>
        (cents.zipWithIndex.map { case (c, cell) => (l2(c, x), cell) }.min._2, x)
      }
      cents = cents.zipWithIndex.map { case (old, cell) =>
        val members = assigned.filter(_._1 == cell).map(_._2)
        if (members.isEmpty) old
        else Array.tabulate(old.length)(d => members.map(_(d)).sum / members.size)
      }.toVector
    }
    cents
  }

  private def refAssign(data: Seq[(Long, Array[Double])],
                        cents: Vector[Array[Long]]): Map[Long, Int] = {
    def l2(a: Array[Long], b: Array[Long]): Long =
      a.indices.map(i => (a(i) - b(i)) * (a(i) - b(i))).sum
    data.map { case (id, v) =>
      val x = v.map(y => math.floor(y * Q).toLong)
      id -> cents.zipWithIndex.map { case (c, cell) => (l2(c, x), cell) }.min._2
    }.toMap
  }

  private def sample(n: Int): Seq[(Long, Array[Double])] = {
    val em = Tables(spark, sf).embeddings.where(col("vec_id") < n)
      .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")))
      .as[(Long, Array[Double])].collect().toSeq
    assert(em.size == n)
    em
  }

  test("fit equals the driver-side fixed-point replica exactly") {
    val data = sample(200)
    val df = data.toDF("id", "v")
    val got = KMeans.fit(df, col("id"), col("v"), k = 5, iters = 3)
      .select(explode(col("cents")).as("c"))
      .select(col("c.cell"), col("c.centroid"))
      .as[(Int, Array[Long])].collect().sortBy(_._1)
    val want = refFit(data, k = 5, iters = 3)
    assert(got.length == 5)
    got.foreach { case (cell, cent) =>
      assert(cent.toSeq == want(cell).toSeq, s"cell $cell centroid diverges")
    }
  }

  test("assign equals the driver-side replica and is deterministic under repartitioning") {
    val data = sample(200)
    val df = data.toDF("id", "v")
    val cents = KMeans.fit(df, col("id"), col("v"), k = 5, iters = 2)
    val a = KMeans.assign(df, col("id"), col("v"), cents)
      .as[(Long, Int)].collect().toMap
    val b = KMeans.assign(df.repartition(13), col("id"), col("v"), cents)
      .as[(Long, Int)].collect().toMap
    assert(a == b)
    assert(a == refAssign(data, refFit(data, k = 5, iters = 2)))
    assert(a.values.toSet.size > 1, "degenerate fit: everything in one cell")
  }

  test("a cell emptied by an iteration keeps its previous centroid") {
    // all vectors identical -> after one iteration every point sits in one
    // cell; the other cells must keep their init centroids, and the fit
    // must still return k cells
    val data = (0L until 10L).map(i => (i, Array(1.0, 2.0, 3.0, 4.0)))
    val df = data.toDF("id", "v")
    val cents = KMeans.fit(df, col("id"), col("v"), k = 3, iters = 2)
      .select(explode(col("cents")).as("c"))
      .select(col("c.cell"), col("c.centroid"))
      .as[(Int, Array[Long])].collect()
    assert(cents.length == 3)
    val want = Array(1000000L, 2000000L, 3000000L, 4000000L).toSeq
    cents.foreach { case (_, c) => assert(c.toSeq == want) }
  }

  test("overflow guard fails fast on components too large for the integer metric") {
    val df = Seq((1L, Array(3.0e6, 1.0)), (2L, Array(-3.0e6, 2.0))).toDF("id", "v")
    val ex = intercept[IllegalArgumentException] {
      KMeans.fit(df, col("id"), col("v"), k = 2, iters = 1)
    }
    assert(ex.getMessage.contains("overflow"))
    // same data fits at a small enough fixed-point scale: dim·(2·3e6·q)²
    // must stay under Long range, so q=100 passes where q=1e6 cannot
    assert(KMeans.fit(df, col("id"), col("v"), k = 2, iters = 1, q = 100L)
      .select(size(col("cents"))).head.getInt(0) == 2)
  }

  test("semanticDedup drops planted within-cluster near-dups, keeps lowest id") {
    val em = Tables(spark, sf).embeddings
    val base = em.select(col("vec_id").as("id"),
      transform(col("embedding"), x => x.cast("double")).as("v"))
    val copies = em.where(col("vec_id") % 20 === 0)
      .select((col("vec_id") + 10000000L).as("id"),
        transform(col("embedding"), (x, i) =>
          x.cast("double") * (lit(1.0) + lit(0.01) * (i % 3 - 1))).as("v"))
    val corpus = base.union(copies)
    val survivors = KMeans.semanticDedup(corpus, col("id"), col("v"),
        k = 4, iters = 2, threshold = 0.95)
      .as[(Long, Int)].collect().map(_._1).toSet
    val originals = base.select(col("id")).as[Long].collect().toSet
    val planted = copies.select(col("id")).as[Long].collect().toSet
    // a perturbed copy sits at cosine ~0.99995 from its source; both land
    // in the same cluster (tiny perturbation), so the higher-id copy dies
    assert(planted.intersect(survivors).isEmpty,
      s"planted copies survived: ${planted.intersect(survivors).take(5)}")
    assert(originals.subsetOf(survivors),
      "an original (lowest-id representative) was dropped")
  }

  test("trained centroids plug into the IVF probe/assign plumbing") {
    val em = Tables(spark, sf).embeddings
    val c = em.select(col("vec_id").as("cand_id"),
      transform(col("embedding"), x => x.cast("double")).as("cv"))
    val cents = KMeans.centroidsAsDouble(
      KMeans.fit(c, col("cand_id"), col("cv"), k = 8, iters = 2))
    val assigned = Similarity.assignCells(c, cents)
    val sizes = assigned.groupBy("cell").count().as[(Int, Long)].collect().toMap
    assert(sizes.values.sum == c.count())
    assert(sizes.keys.forall(k => k >= 0 && k < 8))
    // trained cells are usable for probing: every query gets k results
    val q = c.where(col("cand_id") < 5)
      .select(col("cand_id").as("query_id"), col("cv").as("qv"))
    val probes = Similarity.probeCells(q, cents, nProbe = 8)
    val scored = assigned.join(broadcast(probes), Seq("cell"))
      .where(col("query_id") =!= col("cand_id"))
      .select(col("query_id"), col("cand_id"),
        Similarity.cosine(col("qv"), col("cv")).as("cos"))
    assert(Similarity.rankScored(scored, 5).count() == 25)
  }
}
