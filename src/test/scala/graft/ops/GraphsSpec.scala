package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class GraphsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // driver-side replica of the exact fixed-point arithmetic
  private def refPagerank(edges: Seq[(String, String, Long)], iters: Int,
                          scale: Long = 1000000000000L, d: Int = 85): Map[String, Long] = {
    val e = edges.groupBy(x => (x._1, x._2)).map { case ((s, t), xs) => (s, t, xs.map(_._3).sum) }.toSeq
    val nodes = (e.map(_._1) ++ e.map(_._2)).distinct.sorted
    val n = nodes.size.toLong
    val outW = e.groupBy(_._1).map { case (s, xs) => s -> xs.map(_._3).sum }
    val base = scale * (100 - d) / (100 * n)
    var r = nodes.map(_ -> scale / n).toMap
    for (_ <- 1 to iters) {
      val in = e.groupBy(_._2).map { case (t, xs) =>
        t -> xs.map(x => r(x._1) * x._3 / outW(x._1)).sum
      }
      r = nodes.map(v => v -> (base + d * in.getOrElse(v, 0L) / 100)).toMap
    }
    r
  }

  test("pagerank: fixed-point ranks equal the driver-side replica exactly") {
    val edges = Seq(("a", "b", 3L), ("a", "c", 1L), ("b", "c", 2L),
      ("c", "a", 1L), ("d", "c", 5L), ("b", "a", 1L))
    val got = Graphs.pagerank(edges.toDF("s", "t", "w"),
        col("s"), col("t"), col("w"), iters = 5)
      .as[(String, Long)].collect().toMap
    assert(got == refPagerank(edges, iters = 5))
  }

  test("pagerank: sink-heavy graph ranks the sink highest; dangling mass dropped") {
    // star into c: c collects rank; a/b/d keep ~base share. d has no
    // in-edges and no out-edge handling surprises (dangling = c's mass)
    val edges = Seq(("a", "c", 1L), ("b", "c", 1L), ("d", "c", 1L))
    val got = Graphs.pagerank(edges.toDF("s", "t", "w"),
        col("s"), col("t"), col("w"), iters = 3)
      .as[(String, Long)].collect().toMap
    assert(got("c") > got("a") && got("a") == got("b") && got("b") == got("d"))
    assert(got == refPagerank(edges, iters = 3))
  }

  test("pagerank: deterministic under repartitioning") {
    val edges = (0 until 200).map(i =>
      (s"n${i % 23}", s"n${(i * 7 + 3) % 23}", (i % 5 + 1).toLong))
    val a = Graphs.pagerank(edges.toDF("s", "t", "w"),
      col("s"), col("t"), col("w"), iters = 4).as[(String, Long)].collect().toSet
    val b = Graphs.pagerank(edges.toDF("s", "t", "w").repartition(11),
      col("s"), col("t"), col("w"), iters = 4).as[(String, Long)].collect().toSet
    assert(a == b)
    assert(a == refPagerank(edges, iters = 4).toSet)
  }

  test("pagerank: fails fast on non-positive weights (floor-div semantics guard)") {
    val bad = Seq(("a", "b", 1L), ("b", "a", -2L)).toDF("s", "t", "w")
    val ex = intercept[IllegalArgumentException] {
      Graphs.pagerank(bad, col("s"), col("t"), col("w"), iters = 1)
    }
    assert(ex.getMessage.contains("positive"))
  }

  test("pagerank: fails fast on weights large enough to overflow r*w") {
    // max aggregated weight must stay under Long.MaxValue / (2*scale);
    // at the default scale=1e12 a 1e7 weight crosses it
    val big = Seq(("a", "b", 10000000L), ("b", "a", 1L)).toDF("s", "t", "w")
    val ex = intercept[IllegalArgumentException] {
      Graphs.pagerank(big, col("s"), col("t"), col("w"), iters = 1)
    }
    assert(ex.getMessage.contains("overflow-safe bound"))
    // the same weights are fine at a smaller scale
    assert(Graphs.pagerank(big, col("s"), col("t"), col("w"), iters = 1,
      scale = 1000000L).count() == 2)
  }

  test("triangles: K4, triangle-free square, normalization of dups/loops/reversals") {
    // K4 on {1,2,3,4}: four triangles, every vertex in three of them;
    // square 10-11-12-13 without diagonals: none; noise edges are
    // duplicated, reversed and self-looping to exercise normalization
    val e = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (2L, 1L), (1L, 2L), (1L, 1L),
      (10L, 11L), (11L, 12L), (12L, 13L), (13L, 10L)).toDF("s", "t")
    val got = Graphs.triangles(e, col("s"), col("t"))
      .as[(Long, Long)].collect().sorted.toSeq
    assert(got == Seq((1L, 3L), (2L, 3L), (3L, 3L), (4L, 3L)))
  }

  test("triangles: naive triple-join replica on a hub-heavy graph; equi-joins only") {
    // star hub 0 + pseudo-random edges: hub degree ~n, so a wedge fan-out
    // at the hub would be quadratic — orientation must point edges INTO it
    val n = 400
    val rnd = (0 until 1200).map { i =>
      val a = (i * 2654435761L) % n; val b = (i * 40503L + 7) % n; (a, b)
    }
    val star = (1 until n).map(i => (0L, i.toLong))
    val edges = (rnd ++ star).toDF("s", "t")
    val got = Graphs.triangles(edges, col("s"), col("t"))
      .as[(Long, Long)].collect().sorted.toSeq
    val canon = (rnd ++ star).filter { case (a, b) => a != b }
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }.distinct
    val es = canon.toSet
    val naive = (for {
      (u, v) <- canon; (u2, w) <- canon
      if u2 == u && v < w && es.contains((v, w))
    } yield Seq(u, v, w)).flatten
      .groupBy(identity).map { case (id, xs) => (id, xs.size.toLong) }.toSeq.sorted
    assert(got == naive && got.nonEmpty)
    val plan = Graphs.triangles(edges, col("s"), col("t"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"),
      s"triangles must stay equi-join only:\n$plan")
  }

  test("triangles guard: non-integral vertex ids rejected") {
    assertThrows[IllegalArgumentException] {
      Graphs.triangles(Seq(("a", "b")).toDF("s", "t"), col("s"), col("t"))
    }
  }

  test("transitionEdges: per-user consecutive states in (ts, tiebreak) order") {
    val ev = Seq(
      (1L, "login", 10L, 100L), (1L, "browse", 20L, 101L), (1L, "buy", 30L, 102L),
      (2L, "login", 10L, 103L), (2L, "logout", 15L, 104L),
      (3L, "solo", 5L, 105L)).toDF("u", "typ", "t", "eid")
    val got = Graphs.transitionEdges(ev, col("u"), col("typ"), col("t"), col("eid"))
      .as[(String, String)].collect().sorted.toSeq
    assert(got == Seq(("browse", "buy"), ("login", "browse"), ("login", "logout")))
  }
}
