package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.sources.Tables

class QuantilesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("exactRank == sorted array at every rank on a mixed corpus") {
    // negatives, duplicates, a huge-range outlier (forces several
    // bisection passes), nulls excluded
    val raw: Seq[java.lang.Long] = Seq[java.lang.Long](
      5L, -3L, 5L, 0L, 9L, 5L, -3L, 1L << 40, 7L, null, 2L)
    val df = raw.toDF("v")
    val sorted = raw.filter(_ != null).map(_.toLong).sorted
    for (k <- 1 to sorted.size)
      assert(Quantiles.exactRank(df, col("v"), k) == sorted(k - 1), s"rank $k")
  }

  test("percentiles == row_number replica on lineitem cents") {
    val li = Tables(spark, "/root/testdata/sf0.001").lineitem
      .select((col("l_extendedprice").cast("decimal(18,2)") * 100)
        .cast("long").as("cents"))
    val got = Quantiles.percentiles(li, col("cents"), Seq(1, 50, 90, 99, 100))
      .as[(Long, Long, Long)].collect().sorted.toSeq
    val sorted = li.as[Long].collect().sorted
    val n = sorted.length.toLong
    val want = Seq(1, 50, 90, 99, 100).map { p =>
      val rk = math.max(1L, (p * n + 99L) / 100L)
      (p.toLong, rk, sorted((rk - 1).toInt))
    }.sorted
    assert(got == want)
  }

  test("guards: empty input, rank bounds, non-integral column") {
    val empty = Seq.empty[Long].toDF("v")
    assertThrows[IllegalArgumentException] { Quantiles.exactRank(empty, col("v"), 1) }
    val three = Seq(1L, 2L, 3L).toDF("v")
    assertThrows[IllegalArgumentException] { Quantiles.exactRank(three, col("v"), 0) }
    assertThrows[IllegalArgumentException] { Quantiles.exactRank(three, col("v"), 4) }
    assertThrows[IllegalArgumentException] {
      Quantiles.exactRank(Seq(1.5).toDF("v"), col("v"), 1)
    }
    assertThrows[IllegalArgumentException] {
      Quantiles.percentiles(three, col("v"), Seq(0))
    }
  }

  test("full-Long-domain guard fails loudly instead of overflowing") {
    val df = Seq(Long.MinValue, Long.MaxValue).toDF("v")
    assertThrows[IllegalArgumentException] { Quantiles.exactRank(df, col("v"), 1) }
  }

  test("histogram passes push the range filter into the scan") {
    // after the first pass, descend()'s scans carry v BETWEEN lo AND hi;
    // assert the filter reaches the parquet source on a table-backed frame
    val li = Tables(spark, "/root/testdata/sf0.001").lineitem
      .select(col("l_orderkey").as("v"))
    val plan = li.where(col("v").between(100L, 200L))
      .select(expr("(v - 100L) div 1L").as("b")).groupBy(col("b"))
      .agg(count(lit(1))).queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(l_orderkey), " +
      "GreaterThanOrEqual(l_orderkey,100), LessThanOrEqual(l_orderkey,200)]"),
      s"range filter not pushed:\n$plan")
  }
}
