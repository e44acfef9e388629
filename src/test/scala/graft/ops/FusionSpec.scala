package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class FusionSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def df(rows: (Long, Long, Long)*) =
    rows.toDF("qid", "doc_id", "rk")

  private def run(lists: Seq[org.apache.spark.sql.DataFrame], k: Int) =
    Fusion.rrf(lists, k).as[(Long, Long, Long, Long)].collect().sorted.toSeq

  test("rrf == hand replica: consensus docs outrank single-list docs") {
    // doc 7 is rank 2 in both lists; doc 1 is rank 1 lexical only, doc 9
    // rank 1 semantic only
    val lex = df((0L, 1L, 1L), (0L, 7L, 2L), (0L, 3L, 3L))
    val sem = df((0L, 9L, 1L), (0L, 7L, 2L), (0L, 4L, 3L))
    def c(rk: Long) = 1048576L / (60L + rk)
    val want = Seq(
      (7L, c(2) + c(2)), (1L, c(1)), (9L, c(1)), (3L, c(3)), (4L, c(3)))
      .sortBy { case (id, s) => (-s, id) }.zipWithIndex
      .map { case ((id, s), i) => (0L, id, s, i + 1L) }.sorted
    assert(run(Seq(lex, sem), 10) == want)
    // and the consensus doc is rank 1 overall despite topping neither list
    assert(run(Seq(lex, sem), 1).head._2 == 7L)
  }

  test("three lists, multiple queries, k truncation and doc_id tie-break") {
    val a = df((0L, 1L, 1L), (1L, 5L, 1L))
    val b = df((0L, 2L, 1L), (1L, 5L, 2L))
    val c3 = df((0L, 3L, 1L), (1L, 6L, 1L))
    val got = run(Seq(a, b, c3), 2)
    // qid 0: three docs all at rank 1 -> identical scores, doc_id breaks
    // the tie, k=2 truncates
    assert(got.filter(_._1 == 0L).map(_._2) == Seq(1L, 2L))
    assert(got.filter(_._1 == 0L).map(_._4) == Seq(1L, 2L))
    // qid 1: doc 5 in two lists beats doc 6 in one
    assert(got.filter(_._1 == 1L).map(r => (r._2, r._4)) == Seq((5L, 1L), (6L, 2L)))
  }

  test("fusion is query-sized: plan exchanges hash only qid keys") {
    val fused = Fusion.rrf(Seq(df((0L, 1L, 1L)), df((0L, 2L, 1L))), 5)
    val hashEx = fused.queryExecution.executedPlan.toString.linesIterator
      .filter(_.contains("Exchange hashpartitioning")).toSeq
    assert(hashEx.nonEmpty && hashEx.forall(_.contains("hashpartitioning(qid#")),
      s"unexpected exchange:\n${hashEx.mkString("\n")}")
  }

  test("guards: empty list set, bad k, malformed list shape") {
    assertThrows[IllegalArgumentException] { Fusion.rrf(Seq.empty, 5) }
    assertThrows[IllegalArgumentException] { Fusion.rrf(Seq(df((0L, 1L, 1L))), 0) }
    assertThrows[IllegalArgumentException] {
      Fusion.rrf(Seq(Seq((0L, 1L)).toDF("qid", "doc_id")), 5)
    }
  }
}
