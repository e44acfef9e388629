package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class SketchesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // (group, bucket, value): two groups, four buckets, overlapping values
  private def rows = Seq(
    ("x", 0L, 1L), ("x", 0L, 2L), ("x", 0L, 2L),        // dup inside bucket
    ("x", 1L, 2L), ("x", 1L, 3L),                        // overlap across buckets
    ("x", 2L, 4L), ("x", 3L, 1L), ("x", 3L, 5L),
    ("y", 0L, 10L), ("y", 1L, 10L), ("y", 2L, 11L), ("y", 3L, 12L))
  private def df = rows.toDF("g", "b", "v")
  private def buckets = Sketches.thetaBuckets(df, Seq(col("g")), col("b"), col("v"))

  test("distinctOver == exact COUNT DISTINCT for every bucket range (exact regime)") {
    for (lo <- 0L to 3L; hi <- lo to 3L) {
      val got = Sketches.distinctOver(buckets, Seq("g"), col("bucket").between(lo, hi))
        .as[(String, Long)].collect().toMap
      val want = rows.filter(r => r._2 >= lo && r._2 <= hi)
        .groupBy(_._1).map { case (g, rs) => g -> rs.map(_._3).distinct.size.toLong }
      assert(got == want, s"range [$lo,$hi]")
    }
  }

  test("overlapOver: intersection / difference / totals equal exact set algebra") {
    val got = Sketches.overlapOver(buckets, Seq("g"),
        col("bucket") <= 1, col("bucket") >= 2)
      .as[(String, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6))).toMap
    def setOf(g: String, p: Long => Boolean) =
      rows.filter(r => r._1 == g && p(r._2)).map(_._3).toSet
    for (g <- Seq("x", "y")) {
      val (a, b) = (setOf(g, _ <= 1), setOf(g, _ >= 2))
      assert(got(g) == ((a.intersect(b).size.toLong, (a -- b).size.toLong,
        (b -- a).size.toLong, a.size.toLong, b.size.toLong)), s"group $g")
    }
  }

  test("union of bucket sketches == one direct sketch over the filtered rows") {
    val direct = df.where(col("b") <= 2).groupBy("g")
      .agg(theta_sketch_estimate(theta_sketch_agg(col("v"), 20)).as("d"))
      .as[(String, Long)].collect().toMap
    val rolled = Sketches.distinctOver(buckets, Seq("g"), col("bucket") <= 2)
      .as[(String, Long)].collect().toMap
    assert(rolled == direct)
  }

  test("exact regime holds at realistic scale: 50k distinct longs, bit-exact") {
    val big = spark.range(200000)
      .select((col("id") % 50000).as("v"), (col("id") % 8).as("b"), lit("g").as("g"))
    val bk = Sketches.thetaBuckets(big, Seq(col("g")), col("b"), col("v"))
    val got = Sketches.distinctOver(bk, Seq("g"), lit(true))
      .as[(String, Long)].collect().head._2
    assert(got == 50000L)
  }

  test("an empty slice: groups with no matching buckets disappear; one-sided overlap") {
    assert(Sketches.distinctOver(buckets, Seq("g"), col("bucket") > 100).count() == 0)
    // y has buckets on both sides of b=3 split only in A; B empty for neither
    val oneSided = Sketches.overlapOver(buckets, Seq("g"), col("bucket") <= 3, col("bucket") > 100)
    // A-only slice: in_both / only_b must be 0, only_a = a_total
    val r = oneSided.where(col("g") === "x")
      .as[(String, Long, Long, Long, Long, Long)].collect()
    if (r.nonEmpty) {
      assert(r.head._2 == 0L && r.head._4 == 0L && r.head._3 == r.head._5)
    }
  }

  test("build plan: map-side partial sketch aggregation, one exchange; range query touches only the bucket table") {
    val li = graft.sources.Tables(spark, "/root/testdata/sf0.001").events
    val bk = Sketches.thetaBuckets(li, Seq(col("event_type")),
      (unix_millis(col("ts")) / lit(86400000L)).cast("long"), col("user_id"))
    val buildPlan = bk.queryExecution.executedPlan.toString
    assert(buildPlan.contains("ObjectHashAggregate") || buildPlan.contains("HashAggregate"),
      s"sketch build must hash-aggregate:\n$buildPlan")
    assert("Exchange".r.findAllIn(buildPlan).size == 1,
      s"one exchange for the build:\n$buildPlan")
    val q = Sketches.distinctOver(bk.localCheckpoint(), Seq("event_type"), lit(true))
    val qPlan = q.queryExecution.executedPlan.toString
    assert(!qPlan.contains("FileScan") && !qPlan.contains("parquet"),
      s"range query must not re-read the corpus:\n$qPlan")
  }

  test("guards: lgK bounds") {
    assertThrows[IllegalArgumentException] {
      Sketches.thetaBuckets(df, Seq(col("g")), col("b"), col("v"), lgK = 2)
    }
    assertThrows[IllegalArgumentException] {
      Sketches.thetaBuckets(df, Seq(col("g")), col("b"), col("v"), lgK = 30)
    }
  }
}
