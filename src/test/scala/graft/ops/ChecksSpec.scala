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
    assertThrows[IllegalArgumentException] { Checks.validateStream(df, Seq.empty) }
    assertThrows[IllegalArgumentException] {
      Checks.validateStream(df, Seq("r" -> lit(true), "r" -> lit(false)))
    }
  }

  private val parityRules = Seq(
    "k_not_null" -> col("k").isNotNull,
    "v_positive" -> (col("v") > 0),   // null v is a violation
    "all_good" -> lit(true))

  private def sortedGate(df: org.apache.spark.sql.DataFrame) =
    df.select("rule", "n_rows", "n_violations", "pass")
      .as[(String, Long, Long, Boolean)].collect().toSeq.sortBy(_._1)

  test("validateStream: running totals equal the batch gate over everything seen") {
    implicit val ctx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val b1 = Seq[(java.lang.Long, java.lang.Long)]((1L, 10L), (2L, null))
    val b2 = Seq[(java.lang.Long, java.lang.Long)]((3L, -5L), (null, 20L), (5L, 7L))
    val in = MemoryStream[(Option[Long], Option[Long])]
    val gate = Checks.validateStream(in.toDF().toDF("k", "v"), parityRules)
    val q = gate.writeStream.format("memory").queryName("checks_gate")
      .outputMode("complete").start()
    try {
      in.addData(b1.map(r => (Option(r._1).map(_.toLong), Option(r._2).map(_.toLong))): _*)
      q.processAllAvailable()
      // mid-stream: the gate is the batch gate over batch 1 alone
      assert(sortedGate(spark.table("checks_gate")) ==
        sortedGate(Checks.validate(b1.toDF("k", "v"), parityRules)))
      in.addData(b2.map(r => (Option(r._1).map(_.toLong), Option(r._2).map(_.toLong))): _*)
      q.processAllAvailable()
      // after the final micro-batch: equals the batch gate over the union
      assert(sortedGate(spark.table("checks_gate")) ==
        sortedGate(Checks.validate((b1 ++ b2).toDF("k", "v"), parityRules)))
    } finally q.stop()
  }

  test("validateStream: grouped-aggregate form on a plain batch frame matches validate") {
    val df = Seq[(java.lang.Long, java.lang.Long)](
      (1L, 10L), (2L, null), (3L, -5L), (null, 20L)).toDF("k", "v")
    assert(sortedGate(Checks.validateStream(df, parityRules)) ==
      sortedGate(Checks.validate(df, parityRules)))
  }

  test("profile: exact per-column stats in one pass, nulls counted not profiled") {
    val df = Seq(
      (Some(1L), Some(2.5), "a"),
      (Some(1L), None, "b"),
      (Some(3L), Some(-1.0), "a"),
      (None, Some(2.5), "c")).toDF("k", "v", "s")
    val got = Checks.profile(df, Seq("k", "v"))
      .as[(String, Long, Long, Long, Option[Double], Option[Double])]
      .collect().sortBy(_._1).toSeq
    assert(got == Seq(
      ("k", 4L, 1L, 2L, Some(1.0), Some(3.0)),
      ("v", 4L, 1L, 2L, Some(-1.0), Some(2.5))))
    // a single aggregate over a single scan — no join, no second scan
    val plan = Checks.profile(df, Seq("k", "v")).queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"profile must not join:\n$plan")
    intercept[IllegalArgumentException] { Checks.profile(df, Seq.empty) }
    intercept[IllegalArgumentException] { Checks.profile(df, Seq("k", "k")) }
    intercept[IllegalArgumentException] { Checks.profile(df, Seq("nope")) }
  }

  test("joinSkewReport: exact contributions, totals, deterministic top-k") {
    val left = Seq("a", "a", "a", "b", "b", "c", "d").toDF("k")
    val right = Seq("a", "a", "b", "b", "b", "c", "z").toDF("k")
    // contrib: a=3*2=6, b=2*3=6, c=1*1=1; d/z one-sided -> absent; tot=13
    val got = Checks.joinSkewReport(left, col("k"), right, col("k"), 2)
      .as[(String, Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      ("a", 3L, 2L, 6L, 13L, 6L * 1000000 / 13),
      ("b", 2L, 3L, 6L, 13L, 6L * 1000000 / 13)))
    // the reported total equals the real join cardinality
    val real = left.join(right, Seq("k")).count()
    assert(got.head._5 == real)
  }

  test("correlations: exact pairwise moments, pairwise-complete nulls, one scan") {
    val rnd = new scala.util.Random(43)
    val rows = (1 to 300).map { i =>
      val x = rnd.nextInt(1000).toLong
      (x, x * 2 + rnd.nextInt(50), rnd.nextInt(1000).toLong)
    }
    val df = rows.toDF("x", "y", "z")
    val got = Checks.correlations(df,
      Seq("x" -> col("x"), "y" -> col("y"), "z" -> col("z")))
      .select($"col_a", $"col_b", $"n", $"r")
      .as[(String, String, Long, Option[Double])].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    def pearson(xs: Seq[Long], ys: Seq[Long]): Double = {
      val n = xs.size.toDouble
      val (sx, sy) = (xs.sum.toDouble, ys.sum.toDouble)
      val sxy = xs.zip(ys).map { case (a, b) => a.toDouble * b }.sum
      val sxx = xs.map(a => a.toDouble * a).sum
      val syy = ys.map(b => b.toDouble * b).sum
      (n * sxy - sx * sy) / (math.sqrt(n * sxx - sx * sx) * math.sqrt(n * syy - sy * sy))
    }
    val rxy = pearson(rows.map(_._1), rows.map(_._2))
    assert(math.abs(got(("x", "y"))._2.get - rxy) < 1e-9)
    assert(got(("x", "y"))._2.get > 0.99, "y is nearly linear in x")
    assert(math.abs(got(("x", "z"))._2.get) < 0.2, "z is independent noise")
    assert(got.keySet == Set(("x", "y"), ("x", "z"), ("y", "z")))
    // pairwise-complete: a null on one side drops the row for that pair only
    val withNull = Seq((Some(1L), Some(2L), Some(3L)),
      (Some(2L), None, Some(5L)), (Some(3L), Some(6L), Some(7L)),
      (Some(4L), Some(9L), None)).toDF("x", "y", "z")
    val n2 = Checks.correlations(withNull,
      Seq("x" -> col("x"), "y" -> col("y"), "z" -> col("z")))
      .select($"col_a", $"col_b", $"n").as[(String, String, Long)]
      .collect().map(r => (r._1, r._2) -> r._3).toMap
    assert(n2 == Map(("x", "y") -> 3L, ("x", "z") -> 3L, ("y", "z") -> 2L))
    // zero variance reports null, not NaN
    val const = Seq((1L, 5L), (2L, 5L), (3L, 5L)).toDF("x", "y")
    val r0 = Checks.correlations(const, Seq("x" -> col("x"), "y" -> col("y")))
      .select($"r").as[Option[Double]].head()
    assert(r0.isEmpty)
    // one scan, no join
    val plan = Checks.correlations(df, Seq("x" -> col("x"), "y" -> col("y")))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"correlations must not join:\n$plan")
    intercept[IllegalArgumentException] {
      Checks.correlations(df, Seq("x" -> col("x")))
    }
    intercept[IllegalArgumentException] {
      Checks.correlations(df.withColumn("d", col("x").cast("double")),
        Seq("x" -> col("x"), "d" -> col("d")))
    }
  }
  test("deltaAttribution: exact per-key movement, shares sum to 1, zero-net is NULL") {
    val df = Seq(
      ("a", false, 100L), ("a", true, 250L),   // delta +150
      ("b", false, 300L), ("b", true, 200L),   // delta -100
      ("c", false, 40L)                         // delta  -40 (no current rows)
    ).toDF("k", "cur", "cents")                 // net movement: +10
    val out = Checks.deltaAttribution(df, Seq("k"), col("cur"), col("cents"))
      .select($"k", $"prev", $"cur", $"delta", $"share")
      .as[(String, Long, Long, Long, Option[Double])].collect()
      .map(r => r._1 -> r).toMap
    // shares against the NET: movers against the direction go negative,
    // and a dominant mover exceeds 1 — the mix-shift signal
    assert(out("a") == (("a", 100L, 250L, 150L, Some(15.0))))
    assert(out("b") == (("b", 300L, 200L, -100L, Some(-10.0))))
    assert(out("c") == (("c", 40L, 0L, -40L, Some(-4.0))))
    // net = 0: share must be NULL, not a divide-by-zero error
    val flat = Checks.deltaAttribution(
      Seq(("a", false, 10L), ("a", true, 10L)).toDF("k", "cur", "cents"),
      Seq("k"), col("cur"), col("cents"))
      .select($"share").as[Option[Double]].head()
    assert(flat.isEmpty)
    intercept[IllegalArgumentException] {
      Checks.deltaAttribution(df.withColumn("d", col("cents").cast("double")),
        Seq("k"), col("cur"), col("d"))
    }
  }
}
