package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class BpeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // the classic Sennrich et al. corpus: low x5, lower x2, newest x6, widest x3
  private def corpus = {
    val words = Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")
    Seq((1L, words.mkString(" "))).toDF("id", "text")
  }

  test("trainMerges: reproduces the classic BPE merge sequence") {
    // round 1: e-s / s-t / t-</w> all tie at 9 -> lexicographic picks (e,s);
    // then (es,t) 9, (est,</w>) 9, (l,o) 7 over (o,w) by tie-break, (lo,w) 7
    val merges = Bpe.trainMerges(corpus, col("text"), numMerges = 5)
    assert(merges == Seq(("e", "s"), ("es", "t"), ("est", "</w>"),
      ("l", "o"), ("lo", "w")))
  }

  test("encodeWord: trained merges tokenize an unseen word the classic way") {
    val merges = Seq(("e", "s"), ("es", "t"), ("est", "</w>"), ("l", "o"), ("lo", "w"))
    val got = Seq("lowest", "low", "bah").toDF("w")
      .select(Bpe.encodeWord(col("w"), merges).as("syms")).as[Seq[String]].collect()
    assert(got(0) == Seq("low", "est</w>"))
    assert(got(1) == Seq("low", "</w>"))
    assert(got(2) == Seq("b", "a", "h", "</w>"))
  }

  test("mergePair: greedy left-to-right, non-overlapping (aaa under (a,a) -> aa, a)") {
    val got = Seq(Seq("a", "a", "a"), Seq("x", "a", "a", "y"), Seq("a"))
      .toDF("syms").select(Bpe.mergePair(col("syms"), "a", "a").as("m"))
      .as[Seq[String]].collect()
    assert(got(0) == Seq("aa", "a"))
    assert(got(1) == Seq("x", "aa", "y"))
    assert(got(2) == Seq("a"))
  }

  test("trainMerges: stops early when no pair reaches minFreq") {
    val tiny = Seq((1L, "ab cd")).toDF("id", "text")
    assert(Bpe.trainMerges(tiny, col("text"), numMerges = 10, minFreq = 2).isEmpty)
  }

  test("pairCounts: weighted by occurrence, deterministic") {
    val m = Bpe.pairCounts(corpus, col("text"))
      .as[(String, String, Long)].collect().map(r => (r._1, r._2) -> r._3).toMap
    assert(m(("e", "s")) == 9L)   // newest 6 + widest 3
    assert(m(("t", "</w>")) == 9L)
    assert(m(("l", "o")) == 7L)   // low 5 + lower 2
    assert(m(("w", "e")) == 8L)   // newest 6 + lower 2
  }
}
