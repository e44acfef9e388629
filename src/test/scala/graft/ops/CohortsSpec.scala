package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.sources.Tables

class CohortsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val W = 1000L // tiny period for hand cases

  private def run(rows: Seq[(Long, String, Long)]) =
    Cohorts.retention(
      rows.toDF("user_id", "event_type", "ms")
        .select(col("user_id"), col("event_type"),
          timestamp_millis(col("ms")).as("ts")),
      col("user_id"), col("event_type"), col("ts"), "signup", periodMs = W)
      .as[(Long, Long, Long)].collect().sorted.toSeq

  test("retention triangle: cohorting, offsets, pre-anchor activity dropped") {
    val got = run(Seq(
      (1L, "signup", 0L), (1L, "view", 500L), (1L, "view", 2500L),  // cohort 0: active 0,2
      (2L, "signup", 1500L), (2L, "click", 3500L),                  // cohort 1: active 1,3
      (3L, "view", 0L), (3L, "signup", 1000L),                      // pre-anchor week 0 dropped
      (4L, "view", 9000L)))                                         // never anchored: absent
    assert(got == Seq(
      (0L, 0L, 1L), (0L, 2L, 1L),           // user 1
      (1000L, 0L, 2L),                      // users 2 and 3 both cohort week 1
      (1000L, 2L, 1L)))                     // user 2 at offset 2
  }

  test("corpus replica; the lineup join reuses the user_id partitioning") {
    val ev = Tables(spark, "/root/testdata/sf0.001").events
    val fast = Cohorts.retention(ev, col("user_id"), col("event_type"),
      col("ts"), "signup").as[(Long, Long, Long)].collect().sorted.toSeq
    val raw = ev.select(col("user_id"), col("event_type"), unix_millis(col("ts")))
      .as[(Long, String, Long)].collect()
    val week = 7L * 24 * 3600 * 1000
    val p0 = raw.filter(_._2 == "signup").groupBy(_._1)
      .map { case (u, rs) => u -> rs.map(_._3 / week).min }
    val naive = raw.flatMap { case (u, _, ms) =>
      p0.get(u).filter(_ <= ms / week).map(c => (c, ms / week))
    }.distinct // one (cohort, week) per user counted once… needs user identity:
    val naiveCells = raw.flatMap { case (u, _, ms) =>
      p0.get(u).filter(_ <= ms / week).map(c => (u, c, ms / week))
    }.distinct.groupBy { case (_, c, p) => (c, p) }
      .map { case ((c, p), xs) => (c * week, p - c, xs.size.toLong) }.toSeq.sorted
    assert(fast == naiveCells && fast.nonEmpty && naive.nonEmpty)
    // exactly three hash exchanges: the two user_id aggs (reused by the
    // join) and the final tiny cohort-cell agg
    val plan = Cohorts.retention(ev, col("user_id"), col("event_type"),
      col("ts"), "signup").queryExecution.executedPlan.toString
    val hashEx = plan.linesIterator.filter(_.contains("Exchange hashpartitioning")).toSeq
    assert(hashEx.size == 3, s"expected 3 exchanges (2 user aggs + cells):\n${hashEx.mkString("\n")}")
    assert(hashEx.count(_.contains("hashpartitioning(user_id#")) == 2,
      s"user_id aggs should partition the join:\n${hashEx.mkString("\n")}")
  }

  test("guard: non-positive period") {
    assertThrows[IllegalArgumentException] {
      Cohorts.retention(Seq((1L, "signup", 0L)).toDF("user_id", "event_type", "ms"),
        col("user_id"), col("event_type"), col("ms"), "signup", periodMs = 0L)
    }
    assertThrows[IllegalArgumentException] {
      Cohorts.retentionStream(Seq((1L, "signup", 0L)).toDF("user_id", "event_type", "ms"),
        col("user_id"), col("event_type"), col("ms"), "signup", periodMs = 0L)
    }
  }

  private def streamRetention(batches: Seq[Seq[(Long, String, Long)]],
                              periodMs: Long): Seq[(Long, Long, Long)] = {
    implicit val ctx = spark.sqlContext
    val in = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String, Long)](spark)
    val out = Cohorts.retentionStream(
      in.toDF().toDF("user_id", "event_type", "ms")
        .select(col("user_id"), col("event_type"),
          timestamp_millis(col("ms")).as("ts")),
      col("user_id"), col("event_type"), col("ts"), "signup", periodMs = periodMs)
    val q = out.writeStream.outputMode("complete")
      .format("memory").queryName("cohort_stream").start()
    try {
      batches.foreach { b => in.addData(b: _*); q.processAllAvailable() }
      spark.table("cohort_stream").as[(Long, Long, Long)].collect().sorted.toSeq
    } finally q.stop()
  }

  test("retentionStream: in-order delivery == batch triangle on the corpus") {
    val ev = Tables(spark, "/root/testdata/sf0.001").events
    val rows = ev.select(col("user_id"), col("event_type"), unix_millis(col("ts")))
      .as[(Long, String, Long)].collect().sortBy(_._3)
    val week = 7L * 24 * 3600 * 1000
    val (b1, rest) = rows.toSeq.splitAt(rows.length / 3)
    val (b2, b3) = rest.splitAt(rest.length / 3)
    val streamed = streamRetention(Seq(b1, b2, b3), week)
    val batch = Cohorts.retention(ev, col("user_id"), col("event_type"),
      col("ts"), "signup").as[(Long, Long, Long)].collect().sorted.toSeq
    assert(streamed == batch && streamed.nonEmpty)
  }

  test("retentionStream: pre-anchor activity buffers; a late EARLIER anchor drops") {
    // user 1's views land a batch before the signup: the seen-period set
    // buffers them, and the cells (offsets 0 and 2 from the period-1
    // anchor) emit retroactively once the anchor arrives — parity with
    // batch even though activity outran the anchor
    val buffered = streamRetention(Seq(
      Seq((1L, "view", 1500L), (1L, "view", 3500L)),
      Seq((1L, "signup", 1000L))), periodMs = W)
    assert(buffered == Seq((1000L, 0L, 1L), (1000L, 2L, 1L)))
    // a straggler anchor EARLIER than the pinned one is dropped (the
    // pinned cohort keeps its emitted cells; batch would re-cohort to
    // period 0 — the documented divergence)
    val straggler = streamRetention(Seq(
      Seq((2L, "signup", 5000L)),
      Seq((2L, "signup", 0L), (2L, "view", 6500L))), periodMs = W)
    assert(straggler == Seq((5000L, 0L, 1L), (5000L, 1L, 1L)))
  }

  test("transitions: consecutive pairs per key, firsts contribute nothing") {
    import org.apache.spark.sql.functions.col
    // key 1: a->b->b->c ; key 2: a->c ; key 3: lone event
    val ev = Seq(
      (1L, 10L, 0L, "a"), (1L, 20L, 1L, "b"), (1L, 30L, 2L, "b"),
      (1L, 40L, 3L, "c"),
      (2L, 15L, 4L, "a"), (2L, 25L, 5L, "c"),
      (3L, 99L, 6L, "z")).toDF("k", "ts", "eid", "et")
    val got = Cohorts.transitions(ev, col("k"), col("ts"), col("eid"), col("et"))
      .as[(String, String, Long)].collect().toSet
    assert(got == Set(("a", "b", 1L), ("b", "b", 1L), ("b", "c", 1L),
      ("a", "c", 1L)))
    // tie-break column governs equal timestamps
    val tied = Seq((1L, 10L, 0L, "x"), (1L, 10L, 1L, "y"))
      .toDF("k", "ts", "eid", "et")
    val g2 = Cohorts.transitions(tied, col("k"), col("ts"), col("eid"), col("et"))
      .as[(String, String, Long)].collect().toSet
    assert(g2 == Set(("x", "y", 1L)))
  }

  test("modeByKey: most frequent value, largest wins ties, nulls out") {
    import org.apache.spark.sql.functions.col
    val df = Seq((1L, Some("a")), (1L, Some("a")), (1L, Some("b")),
      (2L, Some("x")), (2L, Some("y")),      // tie -> "y" (largest)
      (3L, None), (3L, Some("q"))).toDF("k", "v")
    val got = Aggregates.modeByKey(df, col("v"), col("k"))
      .as[(Long, String, Long)].collect().toSet
    assert(got == Set((1L, "a", 2L), (2L, "y", 1L), (3L, "q", 1L)))
  }

  test("basketLift: fixed-point lift, within-basket dedup, support floor") {
    import org.apache.spark.sql.functions.col
    // baskets: {a,b}, {a,b}, {a,c}, {b} — n=4, n_a=3, n_b=3, n_c=1
    // n_ab=2 -> lift = 4*2/(3*3) = 0.888..; n_ac=1 -> 4/(3*1) = 1.333..
    val df = Seq(
      (1L, "a"), (1L, "b"), (1L, "a"),   // duplicate item in basket 1
      (2L, "a"), (2L, "b"),
      (3L, "a"), (3L, "c"),
      (4L, "b")).toDF("bk", "it")
    val got = Cohorts.basketLift(df, Seq(col("bk")), col("it"))
      .select(col("a"), col("b"), col("n_ab"), col("lift_fp"))
      .as[(String, String, Long, Long)].collect().toSet
    assert(got == Set(
      ("a", "b", 2L, 4L * 2 * 10000 / 9),
      ("a", "c", 1L, 4L * 1 * 10000 / 3)))
    val floored = Cohorts.basketLift(df, Seq(col("bk")), col("it"),
      minPairSupport = 2L).select(col("a"), col("b"))
      .as[(String, String)].collect().toSet
    assert(floored == Set(("a", "b")))
  }

  test("zscoreByKey: exact moments, degenerate groups and nulls score null") {
    import org.apache.spark.sql.functions.col
    val df = Seq((1L, Some(10L)), (1L, Some(20L)), (1L, Some(30L)),
      (1L, None),
      (2L, Some(7L)), (2L, Some(7L)),    // zero variance
      (3L, Some(99L))                     // singleton
    ).toDF("k", "v")
    val got = Aggregates.zscoreByKey(df, col("v"), Seq("k"))
      .select($"k", $"v", $"z").as[(Long, Option[Long], Option[Double])]
      .collect().toSet
    // key 1: mean 20, population sigma = sqrt(200/3)
    val sd = math.sqrt(200.0 / 3.0)
    def z(x: Long) = (x - 20.0) / sd
    assert(got.filter(_._1 == 1L) == Set(
      (1L, Some(10L), Some(z(10))), (1L, Some(20L), Some(z(20))),
      (1L, Some(30L), Some(z(30))), (1L, None, None)))
    assert(got.filter(_._1 != 1L).forall(_._3.isEmpty))
    intercept[IllegalArgumentException] {
      Aggregates.zscoreByKey(df.withColumn("v", col("v").cast("double")),
        col("v"), Seq("k"))
    }
  }

  test("sessionizeStream: sessions continue across batches; equals batch labeling") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions.col
    implicit val ctx = spark.sqlContext
    val rnd = new scala.util.Random(29)
    // per key: events every 10-90s, gap 60s -> sessions break and
    // CONTINUE across the batch cuts
    var t = 0L
    val rows = (0 until 300).map { i =>
      t += (rnd.nextInt(9) + 1) * 10000L
      (i.toLong % 3, new java.sql.Timestamp(t), i.toLong)
    }
    val (seed, rest) = rows.splitAt(60)
    val path = graft.core.TempDirs.create("graft_sess_store")
    EventTimeWindows.initSessionStore(seed.toDF("k", "ts", "eid"),
      Seq("k"), col("ts"), col("eid"), 60000L, path)
    val in = MemoryStream[(Long, java.sql.Timestamp, Long)]
    val got = scala.collection.mutable.ArrayBuffer[(Long, Long, Long, Long)]()
    val q = EventTimeWindows.sessionizeStream(spark,
      in.toDF().toDF("k", "ts", "eid"), Seq("k"), col("ts"), col("eid"),
      60000L, path, ephemeralOk = true) { out =>
      got ++= out.select(col("k"), col("tie"), col("session_idx"), col("event_idx"))
        .as[(Long, Long, Long, Long)].collect()
    }
    try {
      rest.grouped(80).foreach { b => in.addData(b: _*); q.processAllAvailable() }
    } finally q.stop()
    val batchAll = EventTimeWindows.sessionize(rows.toDF("k", "ts", "eid"),
      Seq("k"), col("ts"), col("eid"), 60000L)
      .select(col("k"), col("tie"), col("session_idx"), col("event_idx"))
      .as[(Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    assert(got.nonEmpty)
    got.foreach { case (k, tie, s, e) =>
      assert(batchAll((k, tie)) == ((s, e)), s"key $k tie $tie")
    }
    // replay no-op: re-folding an applied batch id leaves state as is
    val before = graft.core.SwapStore.read(spark, path)
      .as[(Long, Long, Long, Long)].collect().toSet
    graft.core.SwapStore.fold(spark, path, batchId = 0L)(cur => cur.limit(0))
    assert(graft.core.SwapStore.read(spark, path)
      .as[(Long, Long, Long, Long)].collect().toSet == before)
  }

  test("sessionize: gap rule, ordinals, within-session positions, one exchange") {
    import org.apache.spark.sql.functions.col
    def t(ms: Long) = new java.sql.Timestamp(ms)
    // key 1: events at 0s, 10s, 100s, 105s, 400s with gap 60s
    //        -> sessions [0,10], [100,105], [400]
    val ev = Seq(
      (1L, t(0L), 0L), (1L, t(10000L), 1L), (1L, t(100000L), 2L),
      (1L, t(105000L), 3L), (1L, t(400000L), 4L),
      (2L, t(5000L), 5L)).toDF("k", "ts", "eid")
    val got = EventTimeWindows.sessionize(ev, Seq("k"), col("ts"), col("eid"), 60000L)
      .select(col("k"), col("tie"), col("session_idx"), col("event_idx"))
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got == Set(
      (1L, 0L, 1L, 1L), (1L, 1L, 1L, 2L), (1L, 2L, 2L, 1L),
      (1L, 3L, 2L, 2L), (1L, 4L, 3L, 1L), (2L, 5L, 1L, 1L)))
    // a gap of exactly gapMs continues the session
    val edge = Seq((1L, t(0L), 0L), (1L, t(60000L), 1L)).toDF("k", "ts", "eid")
    val g2 = EventTimeWindows.sessionize(edge, Seq("k"), col("ts"), col("eid"), 60000L)
      .select(col("session_idx")).as[Long].collect().toSet
    assert(g2 == Set(1L))
    // single keyed exchange: all three windows share one sort
    val plan = EventTimeWindows.sessionize(ev, Seq("k"), col("ts"), col("eid"), 60000L)
      .queryExecution.executedPlan.toString
    assert("hashpartitioning".r.findAllIn(plan.toLowerCase).size <= 1,
      s"sessionize should shuffle once:\n$plan")
  }

  test("attribution: five models, deterministic ties, lookback, and direct-conversion exclusion") {
    // (user, ms, id, type) — lookback 100 ms; ages ≪ the default 1-day
    // half-life, so every decay weight is 2^30 and decay == linear here
    val rows = Seq(
      (1L, 1L, 1L, "view"), (1L, 2L, 2L, "click"),
      (1L, 50L, 3L, "purchase"), (1L, 60L, 4L, "purchase"),
      (2L, 10L, 5L, "click"), (2L, 11L, 6L, "purchase"),
      (3L, 100L, 7L, "purchase"),                    // direct: no touches
      (4L, 0L, 8L, "view"), (4L, 150L, 9L, "purchase"), // touch too old
      (5L, 5L, 10L, "view"), (5L, 5L, 11L, "click"),    // tie on ts
      (5L, 6L, 12L, "purchase"),
      // n=4 U-shape: first view 400k, last click 400k, middles 100k each
      (7L, 1L, 16L, "view"), (7L, 2L, 17L, "click"),
      (7L, 3L, 18L, "click"), (7L, 4L, 19L, "click"),
      (7L, 5L, 20L, "purchase"))
    val ev = rows.toDF("u", "ms", "eid", "etype")
      .select(col("u"), timestamp_millis(col("ms")).as("ts"),
        col("eid"), col("etype"))
    val got = Cohorts.attribution(ev, col("u"), col("ts"), col("eid"),
        col("etype"), col("etype") === "purchase", lookbackMs = 100L)
      .as[(String, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6))).toMap
    // conv e3/e4: {view@1, click@2}: 500k each under linear AND u (n=2);
    // conv e6: {click} alone (1e6); conv e12: tie breaks on event_id ->
    // first view(e10), last click(e11); conv e20: linear 250k/touch,
    // u = 400k(first view) + 100k + 100k + 400k(last click);
    // e7 direct and e9 (outside lookback) contribute nothing
    assert(got == Map(
      "view" -> ((4L, 0L, 1750000L, 1900000L, 1750000L)),
      "click" -> ((1L, 5L, 3250000L, 3100000L, 3250000L))))
    // time decay with halfLife 30 ms: view age 100 -> w = 2^27, click
    // age 10 -> w = 2^30; sw = 9*2^27 -> view 1e6/9, click 8e6/9
    val decayRows = Seq((6L, 0L, 13L, "view"), (6L, 90L, 14L, "click"),
      (6L, 100L, 15L, "purchase"))
    val dev = decayRows.toDF("u", "ms", "eid", "etype")
      .select(col("u"), timestamp_millis(col("ms")).as("ts"),
        col("eid"), col("etype"))
    val dgot = Cohorts.attribution(dev, col("u"), col("ts"), col("eid"),
        col("etype"), col("etype") === "purchase",
        lookbackMs = 200L, halfLifeMs = 30L)
      .select(col("channel"), col("decay_ppm"))
      .as[(String, Long)].collect().toMap
    assert(dgot == Map("view" -> 111111L, "click" -> 888888L))
    intercept[IllegalArgumentException] {
      Cohorts.attribution(ev, col("u"), col("ts"), col("eid"),
        col("etype"), col("etype") === "purchase", lookbackMs = 0L)
    }
    intercept[IllegalArgumentException] {
      Cohorts.attribution(ev, col("u"), col("ts"), col("eid"),
        col("etype"), col("etype") === "purchase", lookbackMs = 100L,
        halfLifeMs = 0L)
    }
  }
}
