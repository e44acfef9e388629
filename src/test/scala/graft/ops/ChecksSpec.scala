package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class ChecksSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("violation counts, null-counts-as-violation, declaration order") {
    val df = Seq[(java.lang.Long, java.lang.Long)](
      (1L, 10L), (2L, null), (3L, -5L), (null, 20L)).toDF("k", "v")
    val got = Checks.validate(df, Seq(
      "k_not_null" -> col("k").isNotNull,
      "v_positive" -> (col("v") > 0),   // null v is a violation
      "all_good" -> lit(true)))
      .as[(String, Long, Long, Boolean)].collect().toSeq
    assert(got == Seq(
      ("k_not_null", 4L, 1L, false),
      ("v_positive", 4L, 2L, false),   // null + negative
      ("all_good", 4L, 0L, true)))
  }

  test("empty table: zero rows, every rule passes vacuously") {
    val got = Checks.validate(
      Seq.empty[(Long, Long)].toDF("k", "v"), Seq("r" -> (col("k") > 0)))
      .as[(String, Long, Long, Boolean)].collect().toSeq
    assert(got == Seq(("r", 0L, 0L, true)))
  }

  test("one scan for the whole suite: a single aggregate, no shuffle beyond it") {
    val li = graft.sources.Tables(spark, "/root/testdata/sf0.001").lineitem
    // validate() executes eagerly; assert the shape on the equivalent agg
    val plan = li.agg(count(lit(1)),
        sum(when(col("l_quantity") > 0, 0L).otherwise(1L)),
        sum(when(col("l_extendedprice") > 0, 0L).otherwise(1L)))
      .queryExecution.executedPlan.toString
    assert(plan.contains("Exchange SinglePartition") &&
      !plan.contains("Exchange hashpartitioning"),
      s"rule suite should be one partial agg + single-row exchange:\n$plan")
  }

  test("guards: empty and duplicate rule names") {
    val df = Seq((1L, 2L)).toDF("k", "v")
    assertThrows[IllegalArgumentException] { Checks.validate(df, Seq.empty) }
    assertThrows[IllegalArgumentException] {
      Checks.validate(df, Seq("r" -> lit(true), "r" -> lit(false)))
    }
  }
}
