package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class TimeseriesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("gapFill: regular grid per key, forward fill, boundary obs closes its bucket") {
    // step 10: key 1 observes at 12, 19, 41 -> buckets 10..40
    val obs = Seq(
      (1L, 12L, 1.0), (1L, 19L, 2.0), (1L, 41L, 3.0),
      (2L, 100L, 9.0)).toDF("k", "ts", "v")
    val got = Timeseries.gapFill(obs, Seq("k"), "ts", 10L, Seq("v"))
      .as[(Long, Long, Double)].collect().sorted.toSeq
    assert(got == Seq(
      (1L, 10L, 2.0),   // bucket [10,20): last obs at 19
      (1L, 20L, 2.0),   // empty -> forward fill
      (1L, 30L, 2.0),   // empty -> forward fill
      (1L, 40L, 3.0),   // obs at 41 inside [40,50)
      (2L, 100L, 9.0)))
  }

  test("gapFill: multiple value columns fill together; single-obs key = one bucket") {
    val obs = Seq((7L, 25L, 1.5, "a")).toDF("k", "ts", "x", "s")
    val got = Timeseries.gapFill(obs, Seq("k"), "ts", 10L, Seq("x", "s"))
      .as[(Long, Long, Double, String)].collect().toSeq
    assert(got == Seq((7L, 20L, 1.5, "a")))
  }

  test("gapFill: observation exactly on a bucket-end tick belongs to that bucket") {
    val obs = Seq((1L, 10L, 1.0), (1L, 29L, 2.0), (1L, 30L, 3.0)).toDF("k", "ts", "v")
    val got = Timeseries.gapFill(obs, Seq("k"), "ts", 10L, Seq("v"))
      .as[(Long, Long, Double)].collect().sorted.toSeq
    // 29 is the last tick of [20,30); 30 opens [30,40)
    assert(got == Seq((1L, 10L, 1.0), (1L, 20L, 2.0), (1L, 30L, 3.0)))
  }

  test("gapFill: empty input yields empty output; null key/ts rows are dropped") {
    val empty = Seq.empty[(Long, Long, Double)].toDF("k", "ts", "v")
    assert(Timeseries.gapFill(empty, Seq("k"), "ts", 10L, Seq("v")).count() == 0)
    val withNulls = Seq((Some(1L), Some(15L), 1.0), (None, Some(5L), 2.0),
      (Some(1L), None, 3.0)).toDF("k", "ts", "v")
    val got = Timeseries.gapFill(withNulls, Seq("k"), "ts", 10L, Seq("v"))
      .as[(Long, Long, Double)].collect().toSeq
    assert(got == Seq((1L, 10L, 1.0)))
  }

  test("gapFill guards: dup ticks, negative ticks, runaway spine, bad types") {
    val obs = Seq((1L, 10L, 1.0)).toDF("k", "ts", "v")
    assertThrows[IllegalArgumentException] {
      Timeseries.gapFill(Seq((1L, 10L, 1.0), (1L, 10L, 2.0)).toDF("k", "ts", "v"),
        Seq("k"), "ts", 10L, Seq("v"))
    }
    assertThrows[IllegalArgumentException] {
      Timeseries.gapFill(Seq((1L, -5L, 1.0)).toDF("k", "ts", "v"),
        Seq("k"), "ts", 10L, Seq("v"))
    }
    assertThrows[IllegalArgumentException] {
      Timeseries.gapFill(Seq((1L, 0L, 1.0), (1L, 1000000L, 2.0)).toDF("k", "ts", "v"),
        Seq("k"), "ts", 1L, Seq("v"), maxBucketsPerKey = 1000)
    }
    assertThrows[IllegalArgumentException] {
      Timeseries.gapFill(obs.withColumn("ts", col("ts").cast("double")),
        Seq("k"), "ts", 10L, Seq("v"))
    }
    assertThrows[IllegalArgumentException] {
      Timeseries.gapFill(obs, Seq("k"), "ts", 0L, Seq("v"))
    }
  }

  test("gapFill plan: union-window fill, no join node") {
    val e = graft.sources.Tables(spark, "/root/testdata/sf0.001").events
    val obs = e.where(col("event_type") === "purchase")
      .groupBy(col("user_id"), unix_millis(col("ts")).as("ms"))
      .agg(max(col("value")).as("value"))
    val df = Timeseries.gapFill(obs, Seq("user_id"), "ms", 21600000L, Seq("value"))
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"gapFill must not contain a join node:\n$plan")
    assert(plan.contains("Window"), s"the fill is a window:\n$plan")
    // grid sanity at real scale: every key's bucket count matches its span
    val bad = df.groupBy(col("user_id")).agg(count(lit(1)).as("n"),
        (max(col("ms")) - min(col("ms"))).as("span"))
      .where(col("n") =!= col("span") / 21600000L + 1).count()
    assert(bad == 0, "per-key grid must be contiguous")
  }

  // sequential reference for the cusum scan identity
  private def cusumRef(xs: Seq[Long], target: Long, h: Long): (Long, Long, Option[Int]) = {
    var s = 0L; var mx = 0L; var nb = 0L; var first = Option.empty[Int]
    xs.zipWithIndex.foreach { case (x, i) =>
      s = math.max(0L, s + (x - target))
      mx = math.max(mx, s)
      if (s > h) { nb += 1; if (first.isEmpty) first = Some(i) }
    }
    (mx, nb, first)
  }

  test("cusum scan identity matches the sequential recurrence, randomized") {
    val rnd = new scala.util.Random(11)
    val series = (0 until 5).map(k =>
      k.toLong -> (0 until 200).map(_ => rnd.nextInt(100).toLong))
    val rows = for ((k, xs) <- series; (x, i) <- xs.zipWithIndex)
      yield (k, new java.sql.Timestamp(1700000000000L + i * 1000L), i.toLong, x)
    val df = rows.toDF("k", "ts", "eid", "x")
    val got = Timeseries.cusum(df, Seq("k"), col("ts"), col("eid"), col("x"),
      target = 50L, threshold = 300L)
      .select(col("k"), col("max_cusum"), col("n_breach"), col("first_breach_us"))
      .as[(Long, Long, Long, Option[Long])].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    series.foreach { case (k, xs) =>
      val (mx, nb, first) = cusumRef(xs, 50L, 300L)
      val expFirst = first.map(i => (1700000000000L + i * 1000L) * 1000L)
      assert(got(k) == ((mx, nb, expFirst)), s"key $k")
    }
  }

  test("cusum rejects non-integral values and plans one exchange") {
    intercept[IllegalArgumentException] {
      Timeseries.cusum(Seq((1L, 1L, 1.5)).toDF("k", "t", "v"), Seq("k"),
        col("t"), col("t"), col("v"), 0L, 1L)
    }
    val df = Timeseries.cusum(
      Seq((1L, new java.sql.Timestamp(0L), 0L, 5L)).toDF("k", "ts", "eid", "x"),
      Seq("k"), col("ts"), col("eid"), col("x"), 1L, 2L)
    val plan = df.queryExecution.executedPlan.toString
    // window partitioning must be reused by the aggregate: exactly one
    // hash exchange on k in the whole plan
    val exchanges = "hashpartitioning".r.findAllIn(plan.toLowerCase).size
    assert(exchanges <= 1, s"cusum should shuffle once:\n$plan")
  }

  test("stream-grown cusum state equals the batch scan; replay no-ops") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx = spark.sqlContext
    val rnd = new scala.util.Random(17)
    val rows = (0 until 600).map { i =>
      (i.toLong % 5, new java.sql.Timestamp(1700000000000L + i * 1000L),
        i.toLong, rnd.nextInt(100).toLong)
    }
    val (seed, rest) = rows.splitAt(150)
    val path = graft.core.TempDirs.create("graft_cusum_store")
    Timeseries.initCusumStore(seed.toDF("k", "ts", "eid", "x"), Seq("k"),
      col("ts"), col("eid"), col("x"), target = 50L, threshold = 300L, path)
    val in = MemoryStream[(Long, java.sql.Timestamp, Long, Long)]
    val q = Timeseries.cusumStream(spark, in.toDF().toDF("k", "ts", "eid", "x"),
      Seq("k"), col("ts"), col("eid"), col("x"), 50L, 300L, path,
      ephemeralOk = true)
    // event-time-ordered delivery: contiguous chunks in row order
    try {
      rest.grouped(150).foreach { b => in.addData(b: _*); q.processAllAvailable() }
    } finally q.stop()
    val got = Timeseries.readCusumStore(spark, path)
      .select(col("k"), col("n"), col("max_cusum"), col("n_breach"),
        col("first_breach_us"))
      .as[(Long, Long, Long, Long, Option[Long])].collect().toSet
    val want = Timeseries.cusum(rows.toDF("k", "ts", "eid", "x"), Seq("k"),
      col("ts"), col("eid"), col("x"), 50L, 300L)
      .as[(Long, Long, Long, Long, Option[Long])].collect().toSet
    assert(got == want)
    // exactly-once: re-folding an applied batch id leaves the store as is
    graft.core.SwapStore.fold(spark, path, batchId = 0L)(cur => cur.limit(0))
    assert(Timeseries.readCusumStore(spark, path)
      .select(col("k"), col("n"), col("max_cusum"), col("n_breach"),
        col("first_breach_us"))
      .as[(Long, Long, Long, Long, Option[Long])].collect().toSet == want)
  }

  test("rolling: trailing range sums are gap-correct and reuse one exchange") {
    // key 1 ticks: 1, 2, 5 (gap) with values 10, 20, 40; window 3
    val df = Seq((1L, 1L, 10L), (1L, 2L, 20L), (1L, 2L, 5L), (1L, 5L, 40L),
      (2L, 1L, 7L)).toDF("k", "d", "x")
    val got = Timeseries.rolling(df, Seq("k"), col("d"), col("x"), 3L)
      .select(col("k"), col("tick"), col("v"), col("trail_sum"), col("trail_ticks"))
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(got == Set(
      (1L, 1L, 10L, 10L, 1L),
      (1L, 2L, 25L, 35L, 2L),      // pre-aggregated 20+5; trailing covers 1,2
      (1L, 5L, 40L, 40L, 1L),      // ticks 3,4 absent: the gap contributes nothing
      (2L, 1L, 7L, 7L, 1L)))
    // two exchanges by design: the row-sized one carries PARTIALLY
    // AGGREGATED (k, tick) rows, the window's k-only one moves the
    // tick-sized frame
    val plan = Timeseries.rolling(df, Seq("k"), col("d"), col("x"), 3L)
      .queryExecution.executedPlan.toString
    val exchanges = plan.linesIterator.filter(_.contains("Exchange hashpartitioning")).toSeq
    assert(exchanges.size == 2, s"expected the two-exchange shape:\n$plan")
    assert(plan.contains("HashAggregate"), s"pre-aggregate missing:\n$plan")
    intercept[IllegalArgumentException] {
      Timeseries.rolling(df.withColumn("d", col("d").cast("double")),
        Seq("k"), col("d"), col("x"), 3L)
    }
  }

  test("rollingDistinct: trailing distinct actives, gap ticks report, randomized") {
    // users: u1 on days 1,2; u2 on day 1; u3 on day 5 — window 3
    val df = Seq((1L, "u1"), (1L, "u1"), (2L, "u1"), (1L, "u2"), (5L, "u3"))
      .toDF("d", "u")
    val got = Timeseries.rollingDistinct(df, col("d"), col("u"), 3L)
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set(
      (1L, 2L, 2L), (2L, 1L, 2L), (3L, 0L, 2L),  // day 3: window {1,2} actives
      (4L, 0L, 1L),                               // only u1's day-2 activity
      (5L, 1L, 1L)))                              // u3 (window clipped at max)
    // randomized vs brute force
    val rnd = new scala.util.Random(59)
    val acts = (1 to 400).map(_ => (rnd.nextInt(30).toLong, "u" + rnd.nextInt(25)))
    val g2 = Timeseries.rollingDistinct(acts.toDF("d", "u"), col("d"), col("u"), 7L)
      .as[(Long, Long, Long)].collect().toSet
    val mx = acts.map(_._1).max
    val brute = (acts.map(_._1).min to mx).flatMap { d =>
      val w = acts.filter(a => a._1 <= d && a._1 > d - 7).map(_._2).distinct.size
      if (w == 0 && !acts.exists(_._1 == d)) None
      else Some((d, acts.filter(_._1 == d).map(_._2).distinct.size.toLong, w.toLong))
    }.filter(_._3 > 0).toSet
    assert(g2 == brute)
  }

  test("maxConcurrency: closed-interval sweep, boundary touch counts, randomized") {
    // [1,5] [3,8] [5,6]: at tick 5 all three are active
    val iv = Seq((1L, 5L), (3L, 8L), (5L, 6L)).toDF("s", "e")
    val got = Timeseries.maxConcurrency(iv, col("s"), col("e"))
      .as[(Long, Option[Long])].head()
    assert(got == ((3L, Some(5L))))
    // back-to-back closed intervals ARE concurrent at the shared tick
    val touch = Timeseries.maxConcurrency(
      Seq((1L, 3L), (3L, 7L)).toDF("s", "e"), col("s"), col("e"))
      .as[(Long, Option[Long])].head()
    assert(touch == ((2L, Some(3L))))
    // empty input
    val none = Timeseries.maxConcurrency(iv.where(lit(false)), col("s"), col("e"))
      .as[(Long, Option[Long])].head()
    assert(none == ((0L, None)))
    // randomized vs brute force over a small tick domain
    val rnd = new scala.util.Random(53)
    val rs = (1 to 200).map { _ =>
      val s = rnd.nextInt(100).toLong; (s, s + rnd.nextInt(20)) }
    val brute = (0L to 130L).map(t => (rs.count(r => r._1 <= t && t <= r._2), t))
      .maxBy(p => (p._1, -p._2))
    val g2 = Timeseries.maxConcurrency(rs.toDF("s", "e"), col("s"), col("e"))
      .as[(Long, Option[Long])].head()
    assert(g2 == ((brute._1.toLong, Some(brute._2))))
    intercept[Exception] {
      Timeseries.maxConcurrency(Seq((5L, 3L)).toDF("s", "e"),
        col("s"), col("e")).collect()
    }
  }

  test("changepoint finds the planted level shift; brute-force agreement") {
    val rnd = new scala.util.Random(19)
    // key 0: level 100 then 500 after index 60; key 1: pure noise
    val series = Map(
      0L -> ((0 until 100).map(i =>
        (if (i < 60) 100L else 500L) + rnd.nextInt(20))),
      1L -> (0 until 80).map(_ => rnd.nextInt(1000).toLong))
    val rows = for ((k, xs) <- series.toSeq; (x, i) <- xs.zipWithIndex)
      yield (k, new java.sql.Timestamp(1700000000000L + i * 1000L), i.toLong, x)
    val got = Timeseries.changepoint(rows.toDF("k", "ts", "eid", "x"),
      Seq("k"), col("ts"), col("eid"), col("x"))
      .select(col("k"), col("n"), col("cp_idx"), col("gain"))
      .as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    def brute(xs: Seq[Long]): (Long, Double) = {
      val n = xs.size
      val st = xs.sum.toDouble
      (1 until n).map { i =>
        val s = xs.take(i).sum.toDouble
        (i.toLong, s * s / i + (st - s) * (st - s) / (n - i) - st * st / n)
      }.maxBy { case (i, g) => (g, -i) }
    }
    series.foreach { case (k, xs) =>
      val (bi, bg) = brute(xs)
      assert(got(k)._1 == xs.size.toLong)
      assert(got(k)._2 == bi, s"key $k")
      assert(math.abs(got(k)._3 - bg) < 1e-6, s"key $k gain")
    }
    assert(got(0L)._2 == 60L, "the planted shift is at index 60")
    // single-observation keys have no split
    val one = Timeseries.changepoint(
      Seq((9L, new java.sql.Timestamp(0L), 0L, 5L)).toDF("k", "ts", "eid", "x"),
      Seq("k"), col("ts"), col("eid"), col("x"))
    assert(one.count() == 0)
  }

  test("ewmaHalf folds in (ts, tie) order and matches the recurrence") {
    val rnd = new scala.util.Random(13)
    val series = (0 until 4).map(k =>
      k.toLong -> (0 until 100).map(_ => rnd.nextInt(10000).toLong))
    // shuffle row order to prove the sort governs, not arrival order
    val rows = rnd.shuffle(for ((k, xs) <- series; (x, i) <- xs.zipWithIndex)
      yield (k, i.toLong, (i % 7).toLong * 1000 + i, x))
    // ts deliberately non-unique ACROSS keys; (ts=i, tie) unique per key
    val df = rows.toDF("k", "ts", "tie", "x")
    val got = Timeseries.ewmaHalf(df, Seq("k"), col("ts"), col("tie"), col("x"))
      .select(col("k"), col("n"), col("ewma"))
      .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    series.foreach { case (k, xs) =>
      val exp = xs.tail.foldLeft(xs.head)((a, x) => (a + x) >> 1)
      assert(got(k) == ((xs.size.toLong, exp)), s"key $k")
    }
  }

  test("autocorr matches the exact BigInt replica lag for lag") {
    // deterministic pseudo-random series per key (no RNG state)
    def mk(seed: Long, n: Int): Seq[Long] =
      (0 until n).map(i => ((seed * 6364136223846793005L + i * 1442695040888963407L) >>> 40) % 97)
    val series = Map(1L -> mk(3, 24), 2L -> mk(11, 24), 3L -> mk(7, 5))
    def refAcf(xs: Seq[Long], maxLag: Int): Map[Long, Long] = {
      val n = BigInt(xs.size); val s = BigInt(xs.sum)
      val q = xs.map(x => n * x - s)
      val den = q.map(v => v * v).sum
      (1 to maxLag).flatMap { k =>
        if (k >= xs.size || den == 0) None
        else {
          val t = (0 until xs.size - k).map(i => q(i) * q(i + k)).sum * 1000000
          Some(k.toLong -> ((t - t.mod(den)) / den).toLong)
        }
      }.toMap
    }
    val df = series.toSeq.flatMap { case (k, xs) =>
      xs.zipWithIndex.map { case (x, t) => (k, t.toLong, x) }
    }.toDF("k", "t", "x")
    val got = Timeseries.autocorr(df, Seq("k"), col("t"), col("x"), maxLag = 7)
      .select(col("k"), col("lag"), col("acf_ppm"))
      .as[(Long, Long, Long)].collect()
      .groupBy(_._1).map { case (k, rs) => k -> rs.map(r => r._2 -> r._3).toMap }
    series.foreach { case (k, xs) =>
      assert(got.getOrElse(k, Map.empty) == refAcf(xs, 7), s"key $k")
    }
    // key 3 has 5 points: lags 5..7 have no overlapping pairs
    assert(got(3L).keySet == Set(1L, 2L, 3L, 4L))
  }

  test("autocorr: constant series omitted; duplicate ticks fail loudly; non-integral x rejected") {
    val const = Seq((1L, 0L, 5L), (1L, 1L, 5L), (1L, 2L, 5L)).toDF("k", "t", "x")
    assert(Timeseries.autocorr(const, Seq("k"), col("t"), col("x"), 2).count() == 0,
      "zero-variance ACF is undefined and must be omitted, not divided by zero")
    val dup = Seq((1L, 0L, 1L), (1L, 0L, 2L), (1L, 1L, 3L)).toDF("k", "t", "x")
    val e = intercept[Exception] {
      Timeseries.autocorr(dup, Seq("k"), col("t"), col("x"), 2).collect()
    }
    def msg(t: Throwable): String =
      (Option(t.getMessage) ++ Option(t.getCause).map(_.getMessage)).mkString(" ")
    assert(msg(e).contains("duplicate ordering"))
    // NULL ticks: an all-NULL key would slip the duplicate check (lead
    // pairs equal keys in arbitrary order) — both shapes must raise
    val withNull = Seq((1L, Some(0L), 1L), (1L, None, 2L), (1L, Some(1L), 3L))
      .toDF("k", "t", "x")
    val eN = intercept[Exception] {
      Timeseries.autocorr(withNull, Seq("k"), col("t"), col("x"), 2).collect()
    }
    assert(msg(eN).contains("NULL ordering"))
    val allNull = Seq((1L, Option.empty[Long], 1L), (1L, Option.empty[Long], 2L))
      .toDF("k", "t", "x")
    val eA = intercept[Exception] {
      Timeseries.autocorr(allNull, Seq("k"), col("t"), col("x"), 2).collect()
    }
    assert(msg(eA).contains("NULL ordering"))
    intercept[IllegalArgumentException] {
      Timeseries.autocorr(Seq((1L, 0L, 1.5)).toDF("k", "t", "x"),
        Seq("k"), col("t"), col("x"), 2)
    }
  }

  test("ewmaHalf: single-element series returns the element; negatives fail") {
    val one = Timeseries.ewmaHalf(Seq((1L, 5L, 0L, 42L)).toDF("k", "ts", "tie", "x"),
      Seq("k"), col("ts"), col("tie"), col("x"))
      .select(col("n"), col("ewma")).as[(Long, Long)].head()
    assert(one == ((1L, 42L)))
    val e = intercept[Exception] {
      Timeseries.ewmaHalf(Seq((1L, 1L, 0L, -3L)).toDF("k", "ts", "tie", "x"),
        Seq("k"), col("ts"), col("tie"), col("x")).collect()
    }
    assert(e.getMessage.contains("negative") ||
      (e.getCause != null && e.getCause.getMessage.contains("negative")))
  }
}
