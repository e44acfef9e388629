package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class PqSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // deterministic distinct vectors: v(i)(j) = (31*i + 17*j) mod 23
  private def vec(i: Int, dim: Int): Seq[Double] =
    (0 until dim).map(j => ((31 * i + 17 * j) % 23).toDouble)

  private def corpus(n: Int, dim: Int) =
    (0 until n).map(i => (i.toLong, vec(i, dim))).toDF("vec_id", "embedding")

  test("pqTopK: exactness regime — corpus == codebook reproduces brute-force L2 ranking") {
    // with ksub == |corpus| every vector IS a codeword, each subspace
    // encodes to itself at distance 0, and ADC degenerates to the exact
    // squared L2 — so PQ ranks must equal the brute-force ranking
    val dim = 8; val n = 16
    val df = corpus(n, dim)
    val got = Similarity.pqTopK(df.where(col("vec_id") < 3), df,
        col("vec_id"), col("embedding"), col("vec_id"), col("embedding"),
        k = 4, dim = dim, m = 2, ksub = n)
      .as[(Long, Long, Long)].collect().toSet
    val expect = (for {
      q <- 0 until 3
      ranked = (0 until n).filter(_ != q)
        .map(c => (c, vec(q, dim).zip(vec(c, dim)).map { case (a, b) => (a - b) * (a - b) }.sum))
        .sortBy { case (c, d) => (d, c) }.take(4)
      (r, idx) <- ranked.zipWithIndex
    } yield (q.toLong, r._1.toLong, (idx + 1).toLong)).toSet
    assert(got == expect)
  }

  test("ivfPqTopK: probing every cell equals exhaustive pqTopK") {
    val dim = 8; val n = 40
    val df = corpus(n, dim)
    def run(f: => org.apache.spark.sql.DataFrame) = f.as[(Long, Long, Long)].collect().toSet
    val pq = run(Similarity.pqTopK(df.where(col("vec_id") < 5), df,
      col("vec_id"), col("embedding"), col("vec_id"), col("embedding"),
      k = 3, dim = dim, m = 2, ksub = 8))
    val ivfpq = run(Similarity.ivfPqTopK(df.where(col("vec_id") < 5), df,
      col("vec_id"), col("embedding"), col("vec_id"), col("embedding"),
      k = 3, dim = dim, nCells = 8, nProbe = 8, m = 2, ksub = 8))
    assert(pq == ivfpq)
  }

  test("pqCodes: one code per subspace, all within [0, ksub)") {
    val dim = 8; val m = 4; val ksub = 6
    val c = corpus(30, dim).select(col("vec_id").as("cand_id"),
      transform(col("embedding"), x => x.cast("double")).as("cv"))
    val codes = Similarity.pqCodes(c, "cv", Similarity.centroidArray(c, ksub), m, dim / m)
      .select(col("codes")).as[Seq[Int]].collect()
    assert(codes.length == 30)
    assert(codes.forall(cs => cs.length == m && cs.forall(x => x >= 0 && x < ksub)))
  }

  test("ivfPqResidualTopK: well-formed ranking, deterministic under repartitioning") {
    val df = corpus(40, 8)
    def run(d: org.apache.spark.sql.DataFrame) =
      Similarity.ivfPqResidualTopK(d.where(col("vec_id") < 5), d,
        col("vec_id"), col("embedding"), col("vec_id"), col("embedding"),
        k = 3, dim = 8, nCells = 8, nProbe = 8, m = 2, ksub = 8)
        .as[(Long, Long, Long)].collect()
    val a = run(df)
    // k rows per query, ranks 1..k, self excluded
    val byQ = a.groupBy(_._1)
    assert(byQ.keySet == (0L until 5L).toSet)
    assert(byQ.values.forall(rs => rs.map(_._3).sorted.toSeq == Seq(1L, 2L, 3L)))
    assert(a.forall(r => r._1 != r._2))
    assert(a.toSet == run(df.repartition(7)).toSet)
  }

  test("sq8TopK: exactness regime — integer-grid corpus with planted endpoints equals brute force") {
    // per-dim values are integers in [0, 255] with both endpoints planted,
    // so span = 255 and encode/decode is the identity: SQ8 ranks must
    // equal the exact squared-L2 brute force
    val dim = 8; val n = 20
    def gv(i: Int): Seq[Double] =
      if (i == 0) Seq.fill(dim)(0.0)
      else if (i == 1) Seq.fill(dim)(255.0)
      else (0 until dim).map(j => ((i * 37 + j * 91) % 256).toDouble)
    val df = (0 until n).map(i => (i.toLong, gv(i))).toDF("vec_id", "embedding")
    val got = Similarity.sq8TopK(df.where(col("vec_id") < 3), df,
        col("vec_id"), col("embedding"), col("vec_id"), col("embedding"),
        k = 4, dim = dim)
      .as[(Long, Long, Long)].collect().toSet
    val expect = (for {
      q <- 0 until 3
      ranked = (0 until n).filter(_ != q)
        .map(c => (c, gv(q).zip(gv(c)).map { case (a, b) => (a - b) * (a - b) }.sum))
        .sortBy { case (c, dd) => (dd, c) }.take(4)
      (r, idx) <- ranked.zipWithIndex
    } yield (q.toLong, r._1.toLong, (idx + 1).toLong)).toSet
    assert(got == expect)
  }

  test("pqTopK: deterministic under repartitioning") {
    val df = corpus(25, 8)
    def run(d: org.apache.spark.sql.DataFrame) =
      Similarity.pqTopK(d.where(col("vec_id") < 4), d,
        col("vec_id"), col("embedding"), col("vec_id"), col("embedding"),
        k = 3, dim = 8, m = 2, ksub = 8).collect().toSet
    assert(run(df) == run(df.repartition(7)))
  }
}
