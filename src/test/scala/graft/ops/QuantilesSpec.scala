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

  test("madOutliers == sorted-replica medians and count; degenerate and null handling") {
    // group 1: sorted (8,10,11,15,100), rank ⌈2.5⌉=3 -> median 11;
    // deviations sorted (0,1,3,4,89) -> MAD 3; dev > 9: the 100 only
    // group 2: all values equal -> MAD 0, zero outliers under strict >
    // group 3: MAD 0 with ONE off-median value -> that value flags
    val rows = Seq(
      (1L, 10L), (1L, 11L), (1L, 8L), (1L, 15L), (1L, 100L),
      (2L, 7L), (2L, 7L), (2L, 7L),
      (3L, 5L), (3L, 5L), (3L, 5L), (3L, 9L)).toDF("g", "v")
      .unionByName(Seq((1L, Option.empty[Long])).toDF("g", "v")) // null excluded
    val got = Quantiles.madOutliers(rows, Seq("g"), col("v"))
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(got == Seq(
      (1L, 5L, 11L, 3L, 1L),
      (2L, 3L, 7L, 0L, 0L),
      (3L, 4L, 5L, 0L, 1L)))
    // guards
    intercept[IllegalArgumentException] {
      Quantiles.madOutliers(rows, Seq("g"), col("v"), k = -1)
    }
    intercept[IllegalArgumentException] {
      Quantiles.madOutliers(rows.withColumnRenamed("v", "__x"), Seq("g"), col("__x"))
    }
    intercept[IllegalArgumentException] {
      Quantiles.madOutliers(rows.withColumnRenamed("g", "median"),
        Seq("median"), col("v"))
    }
  }

  test("ksDistance: textbook hand example, tie convention, identical and one-sided inputs") {
    // a=(1,2,3), b=(2,4): D peaks after v=3 — F_a=1, F_b=1/2 -> 1/2
    val a = Seq((1L, 1L), (1L, 2L), (1L, 3L)).toDF("g", "v")
    val b = Seq((1L, 2L), (1L, 4L)).toDF("g", "v")
    val got = Quantiles.ksDistance(a, b, Seq("g"), col("v"))
      .as[(Long, Long, Long, Long, Double)].collect().toSeq
    assert(got == Seq((1L, 3L, 2L, 3L, 0.5)))
    // identical samples -> D = 0 exactly
    assert(Quantiles.ksDistance(a, a, Seq("g"), col("v"))
      .as[(Long, Long, Long, Long, Double)].collect().toSeq
      == Seq((1L, 3L, 3L, 0L, 0.0)))
    // a group present on one side only yields no row (D undefined)
    val b2 = Seq((2L, 5L)).toDF("g", "v")
    assert(Quantiles.ksDistance(a, b2, Seq("g"), col("v")).isEmpty)
    intercept[IllegalArgumentException] {
      Quantiles.ksDistance(a.withColumnRenamed("v", "__v"), b, Seq("g"), col("__v"))
    }
  }

  test("exactPercentileByKey == per-group sorted replica on supplier price cents") {
    val li = Tables(spark, "/root/testdata/sf0.001").lineitem
      .select(col("l_suppkey"), (col("l_extendedprice") * 100).cast("long").as("cents"))
    for (p <- Seq(50, 95)) {
      val got = Quantiles.exactPercentileByKey(li, Seq("l_suppkey"), col("cents"), p)
        .as[(Long, Long, Long, Long)].collect().toSeq.sortBy(_._1)
      val replica = li.as[(Long, Long)].collect().groupBy(_._1).map { case (s, rs) =>
        val sorted = rs.map(_._2).sorted
        val rk = math.max(1L, (p.toLong * sorted.length + 99L) / 100L)
        (s, sorted.length.toLong, rk, sorted((rk - 1).toInt))
      }.toSeq.sortBy(_._1)
      assert(got == replica && got.size >= 10, s"pct $p")
    }
  }

  test("exactPercentilesByKey: multi-pct run equals per-pct runs (shared passes)") {
    val li = Tables(spark, "/root/testdata/sf0.001").lineitem
      .select(col("l_suppkey"), (col("l_extendedprice") * 100).cast("long").as("cents"))
    val multi = Quantiles.exactPercentilesByKey(li, Seq("l_suppkey"), col("cents"),
        Seq(50, 95, 99))
      .select(col("l_suppkey"), col("q_pct"), col("n"), col("rk"), col("value"))
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    val singles = Seq(50, 95, 99).flatMap { p =>
      Quantiles.exactPercentileByKey(li, Seq("l_suppkey"), col("cents"), p)
        .as[(Long, Long, Long, Long)].collect()
        .map(r => (r._1, p.toLong, r._2, r._3, r._4))
    }.toSet
    assert(multi == singles && multi.size == 30)
    assertThrows[IllegalArgumentException] {
      Quantiles.exactPercentilesByKey(li, Seq("l_suppkey"), col("cents"), Seq(50, 50))
    }
  }

  test("exactPercentileByKey: one-group input agrees with the global exactRank; edge ranks") {
    val raw: Seq[java.lang.Long] = Seq[java.lang.Long](
      5L, -3L, 5L, 0L, 9L, 5L, -3L, 1L << 40, 7L, null, 2L)
    val df = raw.toDF("v").withColumn("g", lit("all"))
    val sorted = raw.filter(_ != null).map(_.toLong).sorted
    for (p <- Seq(1, 50, 100)) {
      val rk = math.max(1L, (p.toLong * sorted.size + 99L) / 100L)
      val got = Quantiles.exactPercentileByKey(df, Seq("g"), col("v"), p)
        .as[(String, Long, Long, Long)].collect().toSeq
      assert(got == Seq(("all", sorted.size.toLong, rk, sorted((rk - 1).toInt))), s"pct $p")
      assert(got.head._4 == Quantiles.exactRank(df, col("v"), rk))
    }
    // guards
    assertThrows[IllegalArgumentException] {
      Quantiles.exactPercentileByKey(df, Seq.empty, col("v"), 50)
    }
    assertThrows[IllegalArgumentException] {
      Quantiles.exactPercentileByKey(df, Seq("g"), col("v"), 0)
    }
    assertThrows[IllegalArgumentException] { // non-integral
      Quantiles.exactPercentileByKey(df.withColumn("v", col("v").cast("double")),
        Seq("g"), col("v"), 50)
    }
  }

  test("winsorize clamps to the exact per-group band; nulls stay null") {
    val rnd = new scala.util.Random(31)
    val rows = for (g <- Seq("a", "b"); i <- 1 to 200)
      yield (g, i.toLong, rnd.nextInt(1000).toLong)
    val df = rows.toDF("g", "id", "v")
    val got = Quantiles.winsorize(df, Seq("g"), col("v"), 5, 95)
      .select($"g", $"id", $"winsorized").as[(String, Long, Long)]
      .collect().map(r => (r._1, r._2) -> r._3).toMap
    // reference: q121's inclusive-rank convention
    def bound(g: String, pct: Int): Long = {
      val vs = rows.filter(_._1 == g).map(_._3).sorted
      vs(math.max(1, (pct * vs.size + 99) / 100).toInt - 1)
    }
    for ((g, id, v) <- rows) {
      val exp = math.min(math.max(v, bound(g, 5)), bound(g, 95))
      assert(got((g, id)) == exp, s"($g,$id)")
    }
    // null value passes through as null, all original columns kept
    val withNull = df.unionByName(
      Seq(("a", 999L, null.asInstanceOf[java.lang.Long])).toDF("g", "id", "v"))
    val out = Quantiles.winsorize(withNull, Seq("g"), col("v"), 5, 95)
    assert(out.where($"id" === 999L).select($"winsorized").head().isNullAt(0))
    assert(out.columns.toSeq == Seq("g", "id", "v", "winsorized"))
    assertThrows[IllegalArgumentException] {
      Quantiles.winsorize(df, Seq("g"), col("v"), 95, 5)
    }
  }

  test("weighted percentile: smallest value whose cumulative weight reaches the rank") {
    val rnd = new scala.util.Random(37)
    val rows = for (g <- Seq("a", "b"); _ <- 1 to 300)
      yield (g, rnd.nextInt(10000).toLong, (rnd.nextInt(9) + 1).toLong)
    val df = rows.toDF("g", "v", "w")
    for (p <- Seq(50, 90)) {
      val got = Quantiles.exactWeightedPercentileByKey(df, Seq("g"),
        col("v"), col("w"), p)
        .select($"g", $"n", $"value").as[(String, Long, Long)]
        .collect().map(r => r._1 -> ((r._2, r._3))).toMap
      for (g <- Seq("a", "b")) {
        val gs = rows.filter(_._1 == g).map(t => (t._2, t._3)).sortBy(_._1)
        val wTot = gs.map(_._2).sum
        val rk = math.max(1L, (p * wTot + 99) / 100)
        var cum = 0L
        val exp = gs.find { case (_, w) => cum += w; cum >= rk }.get._1
        assert(got(g) == ((wTot, exp)), s"g=$g p=$p")
      }
    }
    // weight 1 degenerates to the unweighted percentile
    val uw = Quantiles.exactPercentileByKey(df, Seq("g"), col("v"), 50)
      .select($"g", $"value").as[(String, Long)].collect().toSet
    val w1 = Quantiles.exactWeightedPercentileByKey(df, Seq("g"), col("v"),
      lit(1L), 50).select($"g", $"value").as[(String, Long)].collect().toSet
    assert(uw == w1)
    // negative weights fail loudly; fractional weight types rejected
    intercept[Exception] {
      Quantiles.exactWeightedPercentileByKey(
        Seq(("a", 1L, -1L)).toDF("g", "v", "w"), Seq("g"),
        col("v"), col("w"), 50).collect()
    }
    intercept[IllegalArgumentException] {
      Quantiles.exactWeightedPercentileByKey(
        Seq(("a", 1L, 0.5)).toDF("g", "v", "w"), Seq("g"),
        col("v"), col("w"), 50)
    }
  }

  test("cdfRank: exact reference fraction <= value, edges and unknown keys") {
    val ref = Seq(("a", 10L), ("a", 20L), ("a", 20L), ("a", 30L),
      ("b", 5L)).toDF("k", "v")
    val q = Seq(("a", 1L, 9L), ("a", 2L, 10L), ("a", 3L, 20L),
      ("a", 4L, 25L), ("a", 5L, 99L), ("b", 6L, 5L), ("zzz", 7L, 1L))
      .toDF("k", "id", "v")
    val got = Quantiles.cdfRank(q, col("k"), col("v"),
      ref, col("k"), col("v"))
      .select($"id", $"cdf_fp").as[(Long, Option[Long])].collect().toMap
    assert(got == Map(
      1L -> Some(0L),            // below all 4 refs
      2L -> Some(2500L),         // 1/4
      3L -> Some(7500L),         // 3/4 (ties counted)
      4L -> Some(7500L),         // floor at 20
      5L -> Some(10000L),        // above all
      6L -> Some(10000L),        // b: 1/1
      7L -> None))               // unknown key
    // randomized parity with the naive definition
    val rnd = new scala.util.Random(61)
    val refR = (1 to 500).map(_ => ("g", rnd.nextInt(100).toLong))
    val qR = (1 to 200).map(i => ("g", i.toLong, rnd.nextInt(120).toLong - 10))
    val g2 = Quantiles.cdfRank(qR.toDF("k", "id", "v"), col("k"), col("v"),
      refR.toDF("k", "v"), col("k"), col("v"))
      .select($"id", $"cdf_fp").as[(Long, Long)].collect().toMap
    qR.foreach { case (_, i, x) =>
      val exp = refR.count(_._2 <= x).toLong * 10000 / refR.size
      assert(g2(i) == exp, s"query $i value $x")
    }
  }

  test("giniByKey: fixed-point Gini matches the sorted-rank formula") {
    val rnd = new scala.util.Random(47)
    val rows = (for (g <- Seq("a", "b"); _ <- 1 to 150)
      yield (g, rnd.nextInt(10000).toLong)) ++
      Seq(("eq", 5L), ("eq", 5L), ("eq", 5L),   // perfect equality -> 0-ish
        ("one", 9L),                             // singleton -> null
        ("zero", 0L), ("zero", 0L))              // zero total -> null
    val df = rows.toDF("g", "v")
    val got = Quantiles.giniByKey(df, Seq("g"), col("v"))
      .select($"g", $"n", $"total", $"gini_fp")
      .as[(String, Long, Long, Option[Long])].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    for (g <- Seq("a", "b", "eq")) {
      val vs = rows.filter(_._1 == g).map(_._2).sorted
      val n = vs.size.toLong
      val tot = vs.sum
      val six = vs.zipWithIndex.map { case (x, i) => BigInt(i + 1) * x }.sum
      val exp = ((2 * six - BigInt(n + 1) * tot) * 10000 / (BigInt(n) * tot)).toLong
      assert(got(g) == ((n, tot, Some(exp))), s"group $g")
    }
    assert(got("eq")._3.contains(0L))
    assert(got("one")._3.isEmpty && got("zero")._3.isEmpty)
    intercept[Exception] {
      Quantiles.giniByKey(Seq(("x", -1L)).toDF("g", "v"), Seq("g"), col("v"))
        .collect()
    }
  }

  test("quantileBins: equal-count bins over the global (value, key) order") {
    val rnd = new scala.util.Random(41)
    val rows = (1L to 1000L).map(i => (i, rnd.nextInt(50).toLong))
    val df = rows.toDF("id", "v")
    val got = Quantiles.quantileBins(df, col("id"), col("v"), 8)
      .select($"key", $"rank", $"bin").as[(Long, Long, Long)].collect()
    // reference: sort by (v, id), rank = position, bin from the formula
    val ref = rows.sortBy(r => (r._2, r._1)).zipWithIndex
      .map { case ((id, _), i) => id -> ((i + 1).toLong, (i.toLong * 8) / 1000 + 1) }
      .toMap
    got.foreach { case (id, rk, b) => assert((rk, b) == ref(id), s"id $id") }
    // every bin holds exactly N/nBins rows when divisible
    val sizes = got.groupBy(_._3).map(_._2.length).toSet
    assert(sizes == Set(125))
    // survives a downstream coalesce(1) (the q59 structural-id lesson)
    val one = Quantiles.quantileBins(df, col("id"), col("v"), 8)
      .coalesce(1).select($"key", $"rank").as[(Long, Long)].collect()
    one.foreach { case (id, rk) => assert(rk == ref(id)._1) }
  }

  test("madProfile == madOutliers' (median, mad) columns") {
    val df = Seq(("a", 1L), ("a", 2L), ("a", 3L), ("a", 100L),
      ("b", 10L), ("b", 10L), ("b", 40L)).toDF("k", "v")
    val prof = Quantiles.madProfile(df, Seq("k"), col("v"))
      .as[(String, Long, Long)].collect().toSet
    val full = Quantiles.madOutliers(df, Seq("k"), col("v"))
      .select($"k", $"median", $"mad").as[(String, Long, Long)].collect().toSet
    assert(prof == full)
  }

  test("madMonitorStream: micro-batched flags == the one-shot batch screen; replays no-op") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx = spark.sqlContext
    // reference: tight cluster per key, so the bounds are meaningful
    val ref = Seq.tabulate(40)(i => ("a", 100L + i % 5)) ++
      Seq.tabulate(40)(i => ("b", 200L + i % 11))
    // arrivals: mostly in-band, a few wild outliers, an unmonitored key
    val arrivals = Seq(("a", 101L), ("a", 103L), ("a", 9999L), ("a", 102L),
      ("b", 205L), ("b", -500L), ("b", 201L), ("b", 777L), ("c", 1L))
    val path = graft.core.TempDirs.create("graft_mad_monitor")
    val prof = Quantiles.madProfile(ref.toDF("k", "v"), Seq("k"), col("v"))
    Quantiles.initMadMonitor(prof, path)
    val in = MemoryStream[(String, Long)]
    val q = Quantiles.madMonitorStream(spark, in.toDF().toDF("k", "v"),
      Seq("k"), col("v"), path, ephemeralOk = true)
    try {
      arrivals.grouped(3).foreach { b => in.addData(b: _*); q.processAllAvailable() }
    } finally q.stop()
    val got = Quantiles.readMadMonitor(spark, path)
      .select($"k", $"median", $"mad", $"n_seen", $"n_flagged")
      .as[(String, Long, Long, Long, Long)].collect().toMap2
    // batch twin: same profile, flags over the whole arrival union
    val pm = prof.as[(String, Long, Long)].collect()
      .map { case (k, m, d) => k -> ((m, d)) }.toMap
    val want = arrivals.filter { case (k, _) => pm.contains(k) }
      .groupBy(_._1).map { case (k, rows) =>
        val (m, d) = pm(k)
        k -> ((m, d, rows.size.toLong,
          rows.count { case (_, x) => math.abs(x - m) > 3.0 * d }.toLong))
      }
    assert(got == want)
    // the unmonitored key contributed nothing and minted no group
    assert(!got.contains("c"))
    // exactly-once: re-folding an applied batch id is a no-op
    graft.core.SwapStore.fold(spark, path, batchId = 0L) { cur =>
      Quantiles.foldMadMonitor(cur, Seq(("a", 9999L)).toDF("k", "v"),
        Seq("k"), col("v"), 3.0)
    }
    val again = Quantiles.readMadMonitor(spark, path)
      .select($"k", $"median", $"mad", $"n_seen", $"n_flagged")
      .as[(String, Long, Long, Long, Long)].collect().toMap2
    assert(again == got)
  }

  private implicit class Tup5Ops(rows: Array[(String, Long, Long, Long, Long)]) {
    def toMap2: Map[String, (Long, Long, Long, Long)] =
      rows.map { case (k, a, b, c, d) => k -> ((a, b, c, d)) }.toMap
  }
}
