package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class SpanDedupSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // d1/d2 share the 5-token run p1..p5; d3 duplicates d1 entirely; d4's
  // only repetition is WITHIN itself (not cross-document)
  private def corpus = Seq(
    (1L, "u1 u2 p1 p2 p3 p4 p5 u3 u4"),
    (2L, "v1 p1 p2 p3 p4 p5 v2 v3"),
    (3L, "u1 u2 p1 p2 p3 p4 p5 u3 u4"),
    (4L, "w1 w2 w3 w4 w1 w2 w3 w4")).toDF("id", "text")

  test("duplicateSpans: maximal cross-doc spans from merged 4-gram hits") {
    val got = SpanDedup.duplicateSpans(corpus, col("id"), col("text"), n = 4)
      .as[(Long, Long, Long, Long)].collect().toSet
    // d1 and d3 are identical 9-token docs -> whole doc is one span [0,9);
    // d2's shared run p1..p5 sits at positions 1..5 -> span [1,6); within
    // d1/d3 the p-run [2,7) is subsumed by the whole-doc span. d4's
    // self-repetition is NOT cross-document and must not appear.
    assert(got == Set((1L, 0L, 9L, 9L), (3L, 0L, 9L, 9L), (2L, 1L, 6L, 5L)))
  }

  test("duplicateSpans: cross-doc only — single-doc repetition is not a duplicate") {
    val solo = Seq((4L, "w1 w2 w3 w4 w1 w2 w3 w4")).toDF("id", "text")
    assert(SpanDedup.duplicateSpans(solo, col("id"), col("text"), n = 4).count() == 0)
  }

  test("duplicateSpans: two disjoint shared runs stay two spans") {
    val df = Seq(
      (10L, "a1 a2 a3 a4 x1 x2 x3 x4 x5 b1 b2 b3 b4"),
      (20L, "a1 a2 a3 a4 y1 y2 y3 y4 y5 b1 b2 b3 b4")).toDF("id", "text")
    val got = SpanDedup.duplicateSpans(df, col("id"), col("text"), n = 4)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got == Set((10L, 0L, 4L, 4L), (10L, 9L, 13L, 4L),
      (20L, 0L, 4L, 4L), (20L, 9L, 13L, 4L)))
  }

  test("duplicateSpans: deterministic under repartitioning") {
    val base = SpanDedup.duplicateSpans(corpus, col("id"), col("text"), n = 4)
      .collect().toSet
    val re = SpanDedup.duplicateSpans(corpus.repartition(7), col("id"), col("text"), n = 4)
      .collect().toSet
    assert(base == re)
  }

  test("scrubDuplicateSpans: keep-first — canonical doc unchanged, copies scrubbed") {
    val got = SpanDedup.scrubDuplicateSpans(corpus, col("id"), col("text"), n = 4)
      .as[(Long, Long, Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    // d1 owns every canonical occurrence -> untouched
    assert(got(1L) == ((9L, 0L, "u1 u2 p1 p2 p3 p4 p5 u3 u4")))
    // d2's copy of the shared run is removed
    assert(got(2L) == ((8L, 5L, "v1 v2 v3")))
    // d3 duplicates d1 entirely -> scrubs to empty
    assert(got(3L) == ((9L, 9L, "")))
    // d4's within-doc repetition is not cross-document -> untouched
    assert(got(4L) == ((8L, 0L, "w1 w2 w3 w4 w1 w2 w3 w4")))
  }

  test("scrubDuplicateSpans: every input doc appears exactly once in the output") {
    val out = SpanDedup.scrubDuplicateSpans(corpus, col("id"), col("text"), n = 4)
    assert(out.count() == 4)
    assert(out.select("doc_id").distinct().count() == 4)
  }

  test("duplicateSpans property: random small-vocab corpora equal a driver-side brute force") {
    // tiny vocabulary so cross-doc 3-gram collisions are plentiful and
    // merges/adjacency actually exercise
    def brute(docs: Seq[(Long, Seq[String])], n: Int): Set[(Long, Long, Long, Long)] = {
      val grams = docs.flatMap { case (id, t) =>
        t.sliding(n).zipWithIndex.collect { case (g, i) if g.size == n => (g.mkString(" "), id, i.toLong) }
      }
      val dup = grams.groupBy(_._1).filter(_._2.map(_._2).distinct.size >= 2).keySet
      val byDoc = grams.filter(g => dup(g._1)).map(g => (g._2, g._3)).distinct
        .groupBy(_._1).view.mapValues(_.map(_._2).sorted)
      byDoc.flatMap { case (id, ps) =>
        val spans = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
        for (p <- ps) {
          if (spans.nonEmpty && p <= spans.last._2) {
            val (s0, _) = spans.remove(spans.length - 1); spans += ((s0, p + n))
          } else spans += ((p, p + n))
        }
        spans.map { case (s0, e0) => (id, s0, e0, e0 - s0) }
      }.toSet
    }
    val vocab = Vector("u", "v", "w", "x", "y", "z")
    for (iter <- 0 until 4) {
      val rnd = new scala.util.Random(42 + iter)
      val docs = (0L until 30L).map { i =>
        (i, Seq.fill(5 + rnd.nextInt(11))(vocab(rnd.nextInt(vocab.size))))
      }
      val got = SpanDedup.duplicateSpans(
          docs.map { case (i, t) => (i, t.mkString(" ")) }.toDF("id", "text"),
          col("id"), col("text"), n = 3)
        .as[(Long, Long, Long, Long)].collect().toSet
      assert(got == brute(docs, 3), s"iter=$iter")
    }
  }

  test("scrubDuplicateSpans: null text hardens to zero tokens and empty scrub") {
    val df = Seq((1L, Option("s1 s2 s3 s4 s5")), (2L, Option("s1 s2 s3 s4 s5")),
      (3L, None: Option[String])).toDF("id", "text")
    val got = SpanDedup.scrubDuplicateSpans(df, col("id"), col("text"), n = 4)
      .as[(Long, Long, Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got(3L) == ((0L, 0L, "")))
    assert(got(1L) == ((5L, 0L, "s1 s2 s3 s4 s5")))
    assert(got(2L) == ((5L, 5L, "")))
  }
}
