package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class DiffSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("added / removed / changed / unchanged, null-safe compares") {
    val before = Seq(
      (1L, Some("a"), 10L), (2L, Some("b"), 20L), (3L, None, 30L),
      (4L, Some("d"), 40L), (5L, None, 50L)).toDF("k", "s", "v")
    val after = Seq(
      (2L, Some("b"), 20L),       // unchanged -> absent
      (3L, Some("c"), 30L),       // null -> value: changed
      (4L, Some("d"), 41L),       // value changed
      (5L, None, 50L),            // null == null: unchanged -> absent
      (6L, Some("f"), 60L)).toDF("k", "s", "v") // added
    val got = Diff.snapshots(before, after, Seq("k"))
      .as[(Long, String)].collect().sorted.toSeq
    assert(got == Seq((1L, "removed"), (3L, "changed"), (4L, "changed"), (6L, "added")))
  }

  test("composite keys; all-key tables diff on presence only") {
    val b = Seq((1L, "x", 5L), (1L, "y", 6L)).toDF("k1", "k2", "v")
    val a = Seq((1L, "y", 6L), (2L, "x", 7L)).toDF("k1", "k2", "v")
    val got = Diff.snapshots(b, a, Seq("k1", "k2"))
      .as[(Long, String, String)].collect().sorted.toSeq
    assert(got == Seq((1L, "x", "removed"), (2L, "x", "added")))
  }

  test("guards: duplicate keys, schema mismatch, missing key") {
    val ok = Seq((1L, 2L)).toDF("k", "v")
    val dup = Seq((1L, 2L), (1L, 3L)).toDF("k", "v")
    assertThrows[IllegalArgumentException] { Diff.snapshots(dup, ok, Seq("k")) }
    assertThrows[IllegalArgumentException] { Diff.snapshots(ok, dup, Seq("k")) }
    assertThrows[IllegalArgumentException] {
      Diff.snapshots(ok, Seq((1L, 2L)).toDF("k", "w"), Seq("k"))
    }
    assertThrows[IllegalArgumentException] { Diff.snapshots(ok, ok, Seq("nope")) }
    assertThrows[IllegalArgumentException] { Diff.snapshots(ok, ok, Seq.empty) }
  }

  test("both sides stay distributed: full-outer sort-merge join, no broadcast") {
    val o = graft.sources.Tables(spark, "/root/testdata/sf0.001").orders
    val plan = Diff.snapshots(o.where(col("o_orderkey") % 2 === 0),
        o.where(col("o_orderkey") % 3 === 0), Seq("o_orderkey"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin") && plan.contains("FullOuter"),
      s"expected a full-outer sort-merge join:\n$plan")
    assert(!plan.contains("BroadcastHashJoin"), s"diff must not broadcast a snapshot:\n$plan")
  }
}
