package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Streaming semantics of the reference's operators on Structured
  * Streaming: watermark-fired windows (WindowOperator,
  * stateful.py:198-247), late-data drop (divergence from the reference's
  * re-fire, SURVEY §7.4.1), update-mode running aggregates
  * (AggregateOperator, stateful.py:265-342), dedup, interval join
  * (JoinOperator, stateful.py:345-465), keyed process (stateful.py:88-144).
  */
class StreamingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(sec: Long) = new Timestamp(sec * 1000)

  test("trending tokens: chained stateful aggs — windowed counts then bounded-heap top-k") {
    // two stateful operators in one streaming query (windowed count,
    // then per-window top-k via the CollectTopK kernel): the first agg
    // finalizes (window, word, cnt) rows on watermark, the second ranks
    // them — the streaming form of q60's trending-token ranking
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[(String, Timestamp)]
    val counts = in.toDF().toDF("word", "ts")
      .withWatermark("ts", "5 seconds")
      .groupBy(window(col("ts"), "10 seconds"), col("word"))
      .agg(count(lit(1)).as("cnt"))
    val topk = counts
      .groupBy(col("window"))
      .agg(graft.functions.Kernels.collect_bottom_k(
        struct((-col("cnt")).as("nc"), col("word")).as("s"), 2).as("top"))
      .select(unix_millis(col("window.start")).as("win_ms"), posexplode(col("top")).as(Seq("pos", "s")))
      .select(col("win_ms"), col("s.word").as("word"), (-col("s.nc")).as("cnt"))
    val q = topk.writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("trending").start()
    try {
      in.addData(("a", ts(1)), ("a", ts(2)), ("b", ts(3)), ("b", ts(4)), ("c", ts(5)), ("a", ts(6)))
      q.processAllAvailable()
      in.addData(("later", ts(30)))   // watermark 25s > window end 10s: finalize
      q.processAllAvailable()
      in.addData(("flush", ts(60)))   // advance again so the second agg emits
      q.processAllAvailable()
      val all = spark.table("trending").as[(Long, String, Long)].collect().toSet
      val firstWindow = all.filter(_._1 == 0L)
      assert(firstWindow == Set((0L, "a", 3L), (0L, "b", 2L)), s"got $all")
      // c (count 1) must be cut by k=2; later windows finalize independently
      assert(!all.exists(_._2 == "c"), s"k=2 heap leaked rank-3 token: $all")
    } finally q.stop()
  }

  test("windowed count fires on watermark; late rows are dropped") {
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[(String, Timestamp)]
    val agg = StreamOps.windowedAgg(
      in.toDF().toDF("word", "ts"), "ts", "5 seconds", "10 seconds", None,
      Seq(col("word")), Seq(count(lit(1)).as("cnt")))
    val q = agg.writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("wc_fire").start()
    try {
      in.addData(("a", ts(1)), ("a", ts(3)), ("b", ts(8)))
      q.processAllAvailable()
      // watermark still at 8-5=3s < 10s: nothing final yet
      assert(spark.table("wc_fire").count() == 0)
      // advance watermark past window end (needs wm >= 10: event at 16s)
      in.addData(("c", ts(16)))
      q.processAllAvailable()
      val rows = spark.table("wc_fire")
        .select(unix_millis(col("window.start")).as("s"), col("word"), col("cnt"))
        .as[(Long, String, Long)].collect().toSet
      assert(rows == Set((0L, "a", 2L), (0L, "b", 1L)))
      // late arrival for the already-fired window -> dropped, no re-fire
      in.addData(("a", ts(2)), ("d", ts(30)))
      q.processAllAvailable()
      assert(spark.table("wc_fire").where(col("word") === "a").count() == 1)
    } finally q.stop()
  }

  test("running aggregate emits changelog in update mode") {
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[(String, Double)]
    val agg = StreamOps.runningAgg(in.toDF().toDF("k", "v"),
      Seq(col("k")), Seq(sum(graft.ops.Aggregates.dec(col("v"))).cast("double").as("s")))
    val q = agg.writeStream.outputMode(OutputMode.Update())
      .format("memory").queryName("run_agg").start()
    try {
      in.addData(("k1", 1.0), ("k2", 5.0))
      q.processAllAvailable()
      in.addData(("k1", 2.0))
      q.processAllAvailable()
      val rows = spark.table("run_agg").as[(String, Double)].collect().toSeq
      // update mode: k1 appears twice (1.0 then 3.0) — the changelog the
      // reference emits per record, batched per micro-batch
      assert(rows.count(_._1 == "k1") == 2)
      assert(rows.filter(_._1 == "k1").map(_._2).sorted == Seq(1.0, 3.0))
      assert(rows.filter(_._1 == "k2").map(_._2) == Seq(5.0))
    } finally q.stop()
  }

  test("dedup within watermark drops duplicate ids") {
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[(String, String, Timestamp)]
    val out = StreamOps.dedup(in.toDF().toDF("user", "event_id", "ts"), "ts", "10 seconds",
      Seq("user", "event_id"))
    val q = out.writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("dedup_wm").start()
    try {
      in.addData(("u1", "e1", ts(1)), ("u1", "e1", ts(2)), ("u1", "e2", ts(3)), ("u2", "e1", ts(4)))
      q.processAllAvailable()
      assert(spark.table("dedup_wm").count() == 3)
      in.addData(("u1", "e1", ts(5))) // still within watermark: duplicate
      q.processAllAvailable()
      assert(spark.table("dedup_wm").count() == 3)
    } finally q.stop()
  }

  test("stream-stream interval join matches within bound, inner only") {
    implicit val ctx = spark.sqlContext
    val clicks = MemoryStream[(String, String, Timestamp)]
    val imps = MemoryStream[(String, String, Timestamp)]
    val joined = StreamOps.intervalJoin(
      clicks.toDF().toDF("c_ad", "click_id", "c_ts"), "c_ts", "5 seconds",
      imps.toDF().toDF("i_ad", "imp_id", "i_ts"), "i_ts", "5 seconds",
      col("c_ad") === col("i_ad"),
      "c_ts BETWEEN i_ts - INTERVAL 10 SECONDS AND i_ts + INTERVAL 10 SECONDS")
    val q = joined.writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("ij").start()
    try {
      imps.addData(("ad1", "i1", ts(5)), ("ad2", "i2", ts(6)))
      clicks.addData(("ad1", "c1", ts(8)), ("ad1", "c2", ts(40)), ("ad3", "c3", ts(9)))
      q.processAllAvailable()
      val rows = spark.table("ij").select("click_id", "imp_id").as[(String, String)].collect().toSet
      // c1 within 10s of i1; c2 too far; c3 no key match
      assert(rows == Set(("c1", "i1")))
    } finally q.stop()
  }

  test("keyed process: capped dedup persists state across batches (reference bug fixed)") {
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[(String, String)]
    val out = KeyedProcess.dedupCapped[(String, String)](in.toDS(), _._1, _._2)
    val q = out.toDF("user", "event").writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("kp_dedup").start()
    try {
      in.addData(("u1", "e1"), ("u1", "e2"))
      q.processAllAvailable()
      // second batch: e1 is a duplicate — the reference would forget it
      // (stateful.py:123-131 never stores state for new keys)
      in.addData(("u1", "e1"), ("u1", "e3"))
      q.processAllAvailable()
      val rows = spark.table("kp_dedup").as[(String, String)].collect().toSet
      assert(rows == Set(("u1", "e1"), ("u1", "e2"), ("u1", "e3")))
    } finally q.stop()
  }

  test("interval join state is bounded by the watermark (SURVEY §7.4.3)") {
    implicit val ctx = spark.sqlContext
    val l = MemoryStream[(String, Timestamp)]
    val r = MemoryStream[(String, Timestamp)]
    val joined = StreamOps.intervalJoin(
      l.toDF().toDF("lk", "lts"), "lts", "1 hour",
      r.toDF().toDF("rk", "rts"), "rts", "1 hour",
      col("lk") === col("rk"),
      "lts BETWEEN rts - INTERVAL 2 SECONDS AND rts + INTERVAL 2 SECONDS")
    val q = joined.writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("ij_state").start()
    try {
      // fill state, then advance watermarks far past it
      l.addData((1 to 50).map(i => (s"k$i", ts(i))): _*)
      r.addData((1 to 50).map(i => (s"k$i", ts(i))): _*)
      q.processAllAvailable()
      val full = q.lastProgress.stateOperators.map(_.numRowsTotal).sum
      l.addData(("zz", ts(1000000)))
      r.addData(("zz", ts(1000000)))
      q.processAllAvailable()
      // one more batch so eviction metrics settle
      l.addData(("zz2", ts(1000010)))
      r.addData(("zz2", ts(1000010)))
      q.processAllAvailable()
      val after = q.lastProgress.stateOperators.map(_.numRowsTotal).sum
      assert(full >= 100, s"state never filled: $full")
      assert(after < full, s"state not evicted behind the watermark: $full -> $after")
    } finally q.stop()
  }

  test("session window streaming: sessions close when watermark passes gap") {
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[(String, Timestamp)]
    val agg = StreamOps.sessionAgg(in.toDF().toDF("user", "ts"), "ts", "2 seconds", "10 seconds",
      Seq(col("user")), Seq(count(lit(1)).as("n")))
    val q = agg.writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("sess").start()
    try {
      in.addData(("u1", ts(1)), ("u1", ts(5)), ("u1", ts(8)))
      q.processAllAvailable()
      in.addData(("u1", ts(60))) // watermark 58s > 8+10: session closes
      q.processAllAvailable()
      val rows = spark.table("sess")
        .select(unix_millis(col("session_window.start")).as("s"), col("n"))
        .as[(Long, Long)].collect()
      assert(rows.toSet == Set((1000L, 3L)))
    } finally q.stop()
  }

  // ---- replay-harness twins: the parity contracts the q122/q123/q124
  // oracles rely on, each proven on a synthetic corpus ----

  test("replay twin: sentinel-advanced append-mode windows equal the batch aggregate") {
    // without the sentinel the LAST window never flushes in append mode
    // (processAllAvailable is not end-of-stream) — equality with the
    // batch aggregate, which includes that window, proves the sentinel
    // advanced the final watermark and that no real row was late-dropped.
    // The sentinel guard MUST be a predicate on the event-time column:
    // a `typ != sentinel` filter is pushed below the EventTimeWatermark
    // node (conjuncts not referencing the watermark attribute are
    // pushable) and the sentinel's event time never registers — observed
    // as the last window silently staying open
    val rows = Seq( // deliberately unordered; ts spread over [1s, 38s)
      (1L, "view", 2.0, ts(35)), (2L, "view", 1.0, ts(1)), (3L, "click", 4.0, ts(12)),
      (4L, "view", 8.0, ts(22)), (5L, "click", 3.0, ts(8)), (6L, "view", 5.0, ts(37)),
      (7L, "click", 6.0, ts(19)), (8L, "view", 7.0, ts(28)))
    val df = rows.toDF("id", "typ", "value", "ts")
    val dir = java.nio.file.Files.createTempDirectory("graft_twin_win").toString
    Replay.writeOrderedSlices(df, unix_millis(col("ts")), dir, slices = 4)
    Replay.appendSlice(dir,
      Seq((-1L, "__sentinel__", 0.0, ts(3600))).toDF("id", "typ", "value", "ts"), 4)

    val out = Replay.orderedStream(spark, dir, df.schema)
      .withWatermark("ts", "0 seconds")
      .where(col("ts") < ts(1800))
      .groupBy(window(col("ts"), "10 seconds"), col("typ"))
      .agg(count(lit(1)).as("cnt"), sum(col("value")).as("sum_v"))
      .select(unix_millis(col("window.start")).as("win_ms"), col("typ"),
        col("cnt"), col("sum_v"))
    val q = out.writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("twin_win").start()
    try q.processAllAvailable() finally q.stop()

    val batch = df.groupBy(window(col("ts"), "10 seconds"), col("typ"))
      .agg(count(lit(1)).as("cnt"), sum(col("value")).as("sum_v"))
      .select(unix_millis(col("window.start")).as("win_ms"), col("typ"),
        col("cnt"), col("sum_v"))
      .as[(Long, String, Long, Double)].collect().toSet
    val streamed = spark.table("twin_win")
      .as[(Long, String, Long, Double)].collect().toSet
    assert(streamed == batch, s"append windows != batch: $streamed vs $batch")
    assert(streamed.exists(_._1 == 30000L), "last window missing — sentinel did not flush it")
  }

  test("out-of-order replay: the late-drop set is deterministic and matches the q130 formula") {
    // q130's contract in miniature, hand-computed. 4 content slices over
    // ms [0, 3500]: {0,500} {1000,1500} {2000,2500} {3000,3500},
    // delivered as 2,3,0,1 under a 0-second watermark and 1 s tumbling
    // windows. Spark filters late rows against the watermark LAGGED ONE
    // BATCH behind eviction (SPARK-40925: batch p's late filter uses
    // max event time through batch p-2, its eviction uses p-1) — a row
    // drops iff its window end <= max ms over positions <= p-2:
    //   pos0 slice2 — kept (no watermark yet);
    //   pos1 slice3 — kept (late filter still sees no watermark);
    //   pos2 slice0 — late wm 2500 (slice2's max), end 1000: DROPPED;
    //   pos3 slice1 — late wm 3500 (slice3's max), end 2000: DROPPED.
    // An adjacent-pair swap would drop NOTHING under the lag — that is
    // exactly the trap the q130 oracle's 2-PRECEDING frame encodes.
    val rows = Seq((1L, 0L), (2L, 500L), (3L, 1000L), (4L, 1500L),
      (5L, 2000L), (6L, 2500L), (7L, 3000L), (8L, 3500L))
    val df = rows.toDF("id", "ms")
      .select(col("id"), timestamp_millis(col("ms")).as("ts"))
    val dir = java.nio.file.Files.createTempDirectory("graft_late").toString
    Replay.writeShuffledSlices(df, unix_millis(col("ts")), dir, Seq(2, 3, 0, 1))
    Replay.appendSlice(dir,
      Seq(-1L).toDF("id").select(col("id"),
        timestamp_millis(lit(10000000L)).as("ts")), 4)

    val out = Replay.orderedStream(spark, dir, df.schema)
      .withWatermark("ts", "0 seconds")
      .where(col("ts") < timestamp_millis(lit(5000000L)))
      .groupBy(window(col("ts"), "1 second"))
      .agg(count(lit(1)).as("cnt"))
      .select(unix_millis(col("window.start")).as("win_ms"), col("cnt"))
    val q = out.writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("late_drop").start()
    try q.processAllAvailable() finally q.stop()

    val got = spark.table("late_drop").as[(Long, Long)].collect().toSet
    assert(got == Set((2000L, 2L), (3000L, 2L)),
      s"late-drop set diverged from the pinned formula: $got")
    // the drops happened IN the stateful operator's late filter, not a
    // user-level filter. The metric counts POST-partial-agg rows — each
    // dropped slice collapses to one (window, cnt) row before the
    // stateful operator sees it, so 4 input rows register as 2.
    val dropped = q.recentProgress
      .flatMap(p => Option(p.stateOperators).toSeq.flatMap(_.toSeq))
      .map(_.numRowsDroppedByWatermark).sum
    assert(dropped == 2L, s"expected 2 late-dropped partial-agg rows, got $dropped")
  }

  test("replay twin: update-mode running agg log snapshots to the batch aggregate") {
    // q123's recovery rule: n only grows so max(n) is the final update,
    // and a running min's final value is the min over the whole log —
    // both ordering-free, so this parity needs no in-order regime
    val rows = Seq((10L, "a", 1000L), (11L, "b", 2000L), (12L, "a", 3000L),
      (13L, "a", 5000L), (14L, "b", 6000L), (15L, "c", 7000L))
    val df = rows.toDF("id", "k", "ms")
    val dir = java.nio.file.Files.createTempDirectory("graft_twin_agg").toString
    Replay.writeOrderedSlices(df, col("ms"), dir, slices = 3)

    val out = StreamOps.runningAgg(Replay.orderedStream(spark, dir, df.schema),
      Seq(col("k")), Seq(min(col("id")).as("first_id"), count(lit(1)).as("n")))
    val q = out.writeStream.outputMode(OutputMode.Update())
      .format("memory").queryName("twin_agg").start()
    try q.processAllAvailable() finally q.stop()

    val snapshot = spark.table("twin_agg").groupBy(col("k"))
      .agg(min(col("first_id")).as("first_id"), max(col("n")).as("n"))
      .as[(String, Long, Long)].collect().toSet
    val batch = df.groupBy(col("k"))
      .agg(min(col("id")).as("first_id"), count(lit(1)).as("n"))
      .as[(String, Long, Long)].collect().toSet
    assert(snapshot == batch, s"update-log snapshot != batch: $snapshot vs $batch")
    // the log must contain MORE rows than the snapshot for keys updated
    // across batches — otherwise this test never exercised the running path
    assert(spark.table("twin_agg").count() > snapshot.size,
      "every key updated exactly once — replay did not split any key across batches")
  }

  test("replay twin: stream-stream interval join over file replay equals the batch join") {
    // two INDEPENDENT readStreams over the same ordered slices (q124's
    // shape) — an inner join's output set must equal the batch interval
    // join no matter how micro-batches interleave the two sides
    val rows = Seq( // (id, user, typ, ts): hand-computable ±5 s matches
      (1L, 1L, "purchase", ts(20)), (2L, 1L, "click", ts(17)),
      (3L, 1L, "click", ts(19)), (4L, 1L, "click", ts(26)),
      (5L, 2L, "purchase", ts(5)), (6L, 2L, "click", ts(11)),
      (7L, 2L, "click", ts(8)), (8L, 3L, "click", ts(21)))
    val df = rows.toDF("id", "user", "typ", "ts")
    val dir = java.nio.file.Files.createTempDirectory("graft_twin_join").toString
    Replay.writeOrderedSlices(df, unix_millis(col("ts")), dir, slices = 3)

    def side(t: String, idAs: String, userAs: String, tsAs: String) =
      Replay.orderedStream(spark, dir, df.schema).where(col("typ") === t)
        .select(col("id").as(idAs), col("user").as(userAs), col("ts").as(tsAs))
    val joined = StreamOps.intervalJoin(
      side("purchase", "p_id", "p_user", "p_ts"), "p_ts", "0 seconds",
      side("click", "c_id", "c_user", "c_ts"), "c_ts", "0 seconds",
      col("p_user") === col("c_user"),
      "p_ts BETWEEN c_ts - INTERVAL 5 SECONDS AND c_ts + INTERVAL 5 SECONDS")
      .select(col("p_id"), col("c_id"))
    val q = joined.writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("twin_join").start()
    try q.processAllAvailable() finally q.stop()

    val streamed = spark.table("twin_join").as[(Long, Long)].collect().toSet
    // |20-17|=3, |20-19|=1 match; |20-26|=6 out; |5-8|=3 matches; |5-11|=6 out
    assert(streamed == Set((1L, 2L), (1L, 3L), (5L, 7L)), s"got $streamed")
  }
}
