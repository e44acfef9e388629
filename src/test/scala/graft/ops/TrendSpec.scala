package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class TrendSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("fit: perfect line recovers exact fixed-point slope and intercept") {
    // y = 2x + 1 -> slope_fp = 2_000_000, intercept_fp = 1_000_000 at the
    // default 1e6 scale, no rounding anywhere
    val df = Seq(("a", 0L, 1L), ("a", 1L, 3L), ("a", 2L, 5L)).toDF("k", "x", "y")
    val got = Trend.fit(df, Seq("k"), "x", "y")
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(got == Seq(("a", 3L, 2000000L, 1000000L)))
  }

  test("fit: non-exact quotients truncate toward zero (both signs)") {
    // hand-computed: n=3 sx=3 sy=3 sxy=2 sxx=5 -> num = 3*2-9 = -3, den = 6;
    // scale 7 -> -21 div 6 = -3 (toward zero; floor would be -4);
    // intercept = (7*3 - (-3)*3) div 3 = 10
    val neg = Seq(("a", 0L, 2L), ("a", 1L, 0L), ("a", 2L, 1L)).toDF("k", "x", "y")
    val gotNeg = Trend.fit(neg, Seq("k"), "x", "y", scale = 7L)
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(gotNeg == Seq(("a", 3L, -3L, 10L)))
    // positive mirror: y flipped -> num = +3, slope_fp = 21 div 6 = 3,
    // intercept = (7*3 - 3*3) div 3 = 4
    val pos = Seq(("a", 0L, 0L), ("a", 1L, 2L), ("a", 2L, 1L)).toDF("k", "x", "y")
    val gotPos = Trend.fit(pos, Seq("k"), "x", "y", scale = 7L)
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(gotPos == Seq(("a", 3L, 3L, 4L)))
  }

  test("fit: single distinct x has no slope -> nulls; keys are independent") {
    val df = Seq(("flat", 5L, 1L), ("flat", 5L, 9L),
      ("line", 0L, 0L), ("line", 1L, 4L)).toDF("k", "x", "y")
    val got = Trend.fit(df, Seq("k"), "x", "y")
      .select("k", "n", "slope_fp", "intercept_fp")
      .collect().map(r => (r.getString(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)),
        if (r.isNullAt(3)) None else Some(r.getLong(3)))).toSeq.sortBy(_._1)
    assert(got == Seq(
      ("flat", 2L, None, None),
      ("line", 2L, Some(4000000L), Some(0L))))
  }

  test("fit: null x or y rows are dropped before the sums") {
    val df = Seq((Some("a"), Some(0L), Some(1L)), (Some("a"), Some(1L), Some(3L)),
      (Some("a"), None, Some(99L)), (Some("a"), Some(9L), None))
      .toDF("k", "x", "y")
    val got = Trend.fit(df, Seq("k"), "x", "y")
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(got == Seq(("a", 2L, 2000000L, 1000000L)))
  }

  test("fit: bit-identical across partitionings") {
    val base = (0 until 500).map(i => (s"k${i % 7}", i.toLong, (i * 3 % 101).toLong))
    val a = Trend.fit(base.toDF("k", "x", "y"), Seq("k"), "x", "y")
      .collect().map(_.toString).sorted.toSeq
    val b = Trend.fit(base.toDF("k", "x", "y").repartition(13), Seq("k"), "x", "y")
      .collect().map(_.toString).sorted.toSeq
    assert(a == b)
  }

  test("fit guards: types, reserved/colliding names, overflow fail-fast") {
    val ok = Seq(("a", 0L, 1L)).toDF("k", "x", "y")
    assertThrows[IllegalArgumentException] { // non-integral y
      Trend.fit(ok.withColumn("y", col("y").cast("double")), Seq("k"), "x", "y")
    }
    assertThrows[IllegalArgumentException] { // reserved working name
      Trend.fit(ok.withColumn("__sx", lit(1L)), Seq("k"), "x", "y")
    }
    assertThrows[IllegalArgumentException] { // key collides with output column
      Trend.fit(ok.withColumnRenamed("k", "n"), Seq("n"), "x", "y")
    }
    assertThrows[IllegalArgumentException] { // scale must be positive
      Trend.fit(ok, Seq("k"), "x", "y", scale = 0L)
    }
    // n^2 * max|x|^2 * 2 = 4 * 2.25e18 * 2 = 1.8e19 past Long range ->
    // abort with the rescale hint, not wrap. The guard rides the fit
    // aggregate (no separate pre-pass job), so it fires at action time;
    // x chosen so the RAW sums stay in Long range (Σx² = 4.5e18) and the
    // worst-case-bound raise_error — not ANSI's ARITHMETIC_OVERFLOW — is
    // what aborts.
    val big = Seq(("a", 1500000000L, 1L), ("a", 1500000001L, 2L)).toDF("k", "x", "y")
    val e = intercept[Throwable] { Trend.fit(big, Seq("k"), "x", "y").collect() }
    def chain(t: Throwable): String =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(10)
        .map(x => Option(x.getMessage).getOrElse("")).mkString("\n")
    assert(chain(e).contains("rescale"), s"unexpected failure:\n${chain(e)}")
  }

  test("fit: random corpus equals a BigInt driver-side replica (post guard-fold)") {
    // the guard fold moved the bound check into the aggregate — hold the
    // actual fit arithmetic against an independent replica on data with
    // negative values, duplicate x, single-x keys and a null sprinkle
    val rnd = new scala.util.Random(20260813L)
    val rows = (0 until 4000).map { i =>
      val k = s"k${i % 23}"
      val x = if (i % 97 == 0) 5L else (rnd.nextInt(20001) - 10000).toLong
      val y = (rnd.nextInt(2000001) - 1000000).toLong
      (k, x, y)
    }
    val scale = 1000L
    val got = Trend.fit(rows.toDF("k", "x", "y"), Seq("k"), "x", "y", scale)
      .collect().map(r => (r.getString(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)),
        if (r.isNullAt(3)) None else Some(r.getLong(3)))).toSeq.sortBy(_._1)
    val expect = rows.groupBy(_._1).map { case (k, rs) =>
      val n = BigInt(rs.size)
      val sx = rs.map(r => BigInt(r._2)).sum
      val sy = rs.map(r => BigInt(r._3)).sum
      val sxy = rs.map(r => BigInt(r._2) * r._3).sum
      val sxx = rs.map(r => BigInt(r._2) * r._2).sum
      val den = n * sxx - sx * sx
      if (den == 0) (k, rs.size.toLong, None, None)
      else {
        // BigInt '/' truncates toward zero, matching Spark/DuckDB div
        val slope = (BigInt(scale) * (n * sxy - sx * sy)) / den
        val icept = (BigInt(scale) * sy - slope * sx) / n
        (k, rs.size.toLong, Some(slope.toLong), Some(icept.toLong))
      }
    }.toSeq.sortBy(_._1)
    assert(got == expect)
  }

  test("fit plan: one partial-aggregated exchange, no join") {
    val df = Trend.fit(
      (0 until 1000).map(i => (i % 11L, i.toLong, i.toLong * 2)).toDF("k", "x", "y"),
      Seq("k"), "x", "y")
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"trend must not join:\n$plan")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges == 1, s"trend is one key exchange, got $exchanges:\n$plan")
    assert(plan.contains("partial_"), s"map-side combine expected:\n$plan")
  }
}
