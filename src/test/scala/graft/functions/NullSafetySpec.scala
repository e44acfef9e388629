package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.ops.{Dedup, Similarity, TextAnalysis}

/** Null/empty robustness: corpus-scale data always contains null text,
  * empty docs, and ragged vectors — none of the kernels may throw.
  */
class NullSafetySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("text kernels on null/empty/whitespace text: null-propagate or degrade, never throw") {
    val df = Seq((1L, null: String), (2L, ""), (3L, "   "), (4L, "ok text here"))
      .toDF("id", "t")
    val out = df.select(
      col("id"),
      Dedup.simhash(col("t")).as("sh"),
      TextAnalysis.fingerprint(col("t")).as("fp"),
      TextAnalysis.rollingFingerprint(col("t"), 3).as("rf"),
      Dedup.shingles(col("t"), 3).as("shg"),
      TextAnalysis.langId(col("t")).as("lang"),
      size(TextAnalysis.tokens(col("t"))).as("n"))
    val rows = out.collect()
    assert(rows.length == 4)
    // null text -> null-propagating outputs; empty/whitespace -> defined degenerates
    val r1 = rows.find(_.getLong(0) == 1L).get
    assert(r1.isNullAt(1) && r1.isNullAt(2) && r1.isNullAt(3))
    val r3 = rows.find(_.getLong(0) == 3L).get
    assert(r3.getInt(6) == 0) // whitespace-only: zero tokens
  }

  test("round-7 kernels: null/empty/short inputs; ngrams == naive formulation") {
    val df = Seq((1L, null: String), (2L, ""), (3L, "one"), (4L, "a b"),
      (5L, "w1 w2 w3 w4 w5 w6 w7 w8"))
      .toDF("id", "t")
    val toks = graft.ops.TextAnalysis.tokens(col("t"))
    val out = df.select(col("id"),
      Kernels.rolling_hashes(toks, 5).as("rh"),
      Kernels.word_ngrams(toks, 2).as("ng"))
    val rows = out.collect()
    val byId = rows.map(r => r.getLong(0) -> r).toMap
    assert(byId(1L).isNullAt(1) && byId(1L).isNullAt(2)) // null text propagates
    assert(byId(2L).getSeq[Long](1).isEmpty && byId(2L).getSeq[String](2).isEmpty)
    assert(byId(3L).getSeq[Long](1).length == 1)  // w clamps to n=1
    assert(byId(3L).getSeq[String](2).isEmpty)    // no bigram from one token
    assert(byId(4L).getSeq[String](2) == Seq("a b"))
    // ngrams == the naive sliding formulation, with multiplicity
    val naive = "w1 w2 w3 w4 w5 w6 w7 w8".split(" ").sliding(2).map(_.mkString(" ")).toSeq
    assert(byId(5L).getSeq[String](2) == naive)
    // rolling_hashes length n-w+1; its min IS the fingerprint
    assert(byId(5L).getSeq[Long](1).length == 4)
    val fp = df.where(col("id") === 5L)
      .select(graft.ops.TextAnalysis.rollingFingerprint(col("t"), 5)).head.getLong(0)
    assert(byId(5L).getSeq[Long](1).min == fp)
  }

  test("cosine: null vector, length mismatch, zero norm") {
    val df = Seq(
      (1L, Seq(1.0f, 2.0f), Seq(1.0f, 2.0f)),
      (2L, null: Seq[Float], Seq(1.0f, 2.0f)),
      (3L, Seq(1.0f, 2.0f, 3.0f), Seq(1.0f, 2.0f)),
      (4L, Seq(0.0f, 0.0f), Seq(1.0f, 2.0f)))
      .toDF("id", "a", "b")
    val got = df.select(col("id"), Similarity.cosine(col("a"), col("b")).as("c")).collect()
    assert(math.abs(got.find(_.getLong(0) == 1L).get.getDouble(1) - 1.0) < 1e-9)
    assert(got.find(_.getLong(0) == 2L).get.isNullAt(1)) // null input
    assert(got.find(_.getLong(0) == 3L).get.isNullAt(1)) // length mismatch
    assert(got.find(_.getLong(0) == 4L).get.getDouble(1) == 0.0) // zero norm
  }

  test("dedup/minhash pipelines survive a corpus with null and empty docs") {
    val df = Seq((1L, null: String), (2L, ""), (3L, "a b c d e f g"), (4L, "a b c d e f g"))
      .toDF("doc_id", "text")
    val exact = Dedup.exact(df, col("doc_id"), col("text")).collect()
    assert(exact.nonEmpty)
    val pairs = Dedup.minhashLsh(df, col("doc_id"), col("text"), threshold = 0.9)
      .as[(Long, Long, Double)].collect()
    assert(pairs.map(p => (p._1, p._2)).toSet == Set((3L, 4L)))
  }
}
