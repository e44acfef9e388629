package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.sources.Bucketed

class ScaleJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("salted join: same result as plain join under a hot key") {
    // hot key: 9000 of 10000 rows share key 1
    val skewed = spark.range(10000)
      .select(when(col("id") < 9000, 1L).otherwise(col("id")).as("k"), col("id").as("v"))
    val small = Seq((1L, "hot"), (9500L, "cold")).toDF("k2", "label")
    val plain = skewed.join(small, col("k") === col("k2"))
      .groupBy("label").count().as[(String, Long)].collect().toMap
    val salted = Joins.saltedJoin(skewed, small, col("k"), col("k2"),
        saltCols = Seq(col("v")), buckets = 8)
      .groupBy("label").count().as[(String, Long)].collect().toMap
    assert(salted == plain)
    assert(salted("hot") == 9000L && salted("cold") == 1L)
  }

  test("salted join: row-to-bucket placement is stable across partitionings") {
    // the salt is a hash of stable row columns, so the (row -> bucket)
    // assignment itself — not just the joined output — must be identical
    // when the input arrives with a different partitioning (as it would
    // under task retry or a different upstream plan), and must spread the
    // hot key across buckets
    val skewed = spark.range(5000)
      .select(when(col("id") < 4500, 1L).otherwise(col("id")).as("k"), col("id").as("v"))
    def buckets(df: org.apache.spark.sql.DataFrame): Map[Long, Int] =
      df.select(col("v"), Joins.saltExpr(Seq(col("v")), 8).as("salt"))
        .as[(Long, Int)].collect().toMap
    val a = buckets(skewed.repartition(3, col("v")))
    val b = buckets(skewed.repartition(17))
    assert(a == b)
    assert(a.values.toSet.size == 8, "hot-key rows should spread over all buckets")
  }

  test("bucketed tables join without exchange on the bucket key") {
    val a = spark.range(1000).select(col("id").as("k"), (col("id") * 2).as("va"))
    val b = spark.range(1000).select(col("id").as("k"), (col("id") * 3).as("vb"))
    Bucketed.write(a, "bk_a", "k", 4)
    Bucketed.write(b, "bk_b", "k", 4)
    // tiny tables would broadcast (which bypasses bucketing entirely);
    // force the sort-merge path a 100 TB same-key join takes
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = Bucketed.read(spark, "bk_a")
        .join(Bucketed.read(spark, "bk_b"), "k")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join still shuffles:\n$plan")
      assert(plan.contains("SortMergeJoin"))
      assert(joined.count() == 1000)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
