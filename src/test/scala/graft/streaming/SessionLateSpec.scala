package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Session windows under LATE / OUT-OF-ORDER delivery — the pinned
  * semantics behind q167's oracle. Tumbling windows (q130) drop a late
  * row iff its window's end ≤ the (lagged) watermark; session windows
  * need their own pins because (a) a late row's "window" is its
  * PROVISIONAL single-event session [ts, ts+gap) — the merge target is
  * unknown at filter time — and (b) a surviving late row can overlap a
  * session that was already emitted and evicted, which Spark answers
  * with a SECOND, time-overlapping session (state is gone; there is
  * nothing to merge into) — the documented divergence from a batch
  * recompute over the surviving rows. q167's replay geometry keeps
  * every emitted-session end below the late-filter watermark of every
  * later batch (the 240 h delay with ~68 h slice jumps, same shape the
  * no-bridging argument in the gate comment walks through), so the
  * batch-recompute oracle is exact THERE; this spec pins what happens
  * when that safety margin is violated.
  */
class SessionLateSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(sec: Long) = new Timestamp(sec * 1000)

  private def sessions(name: String): Set[(Long, Long, Long)] =
    spark.table(name)
      .select(unix_millis(col("session_window.start")).as("s"),
        col("user"), col("n"))
      .as[(Long, Long, Long)].collect().toSet

  test("late filter drops a row iff its PROVISIONAL session end <= watermark") {
    // batches at 100/200/300 s push the watermark (delay 5 s) to 295 s
    // for the probe batch. gap 10 s: a probe at t survives iff
    // t + 10 > 295. Probes (one user each): 180/188/196/250 must drop,
    // 290/296 must survive — a raw-ts rule (t >= 295) would also drop
    // 290, a window-END rule keeps it.
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[(Long, Timestamp)]
    val agg = in.toDF().toDF("user", "ts")
      .withWatermark("ts", "5 seconds")
      .groupBy(session_window(col("ts"), "10 seconds"), col("user"))
      .agg(count(lit(1)).as("n"))
    val q = agg.writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("sess_late_probe").start()
    try {
      in.addData((1L, ts(100))); q.processAllAvailable()
      in.addData((1L, ts(200))); q.processAllAvailable()
      in.addData((1L, ts(300))); q.processAllAvailable()
      // probe batch: watermark now 300 - 5 = 295
      in.addData((2L, ts(180)), (3L, ts(188)), (4L, ts(196)),
        (5L, ts(250)), (6L, ts(290)), (7L, ts(296)))
      q.processAllAvailable()
      in.addData((1L, ts(1000))); q.processAllAvailable() // flush
      val kept = sessions("sess_late_probe").map(_._2).toSet
      assert(!kept.exists(Set(2L, 3L, 4L, 5L)),
        s"probes with session end <= watermark must drop, got $kept")
      assert(Set(6L, 7L).subsetOf(kept),
        s"probes with session end > watermark must survive " +
          s"(a raw-ts rule would kill user 6), got $kept")
    } finally q.stop()
  }

  test("a surviving late row overlapping an EMITTED session starts a second session") {
    // gap 10 s, delay 5 s, one user. [100, 115) is emitted at the
    // 124-s batch (watermark 116 >= its end); then a late row at 110 s
    // arrives with filter watermark 119 — provisional end 120 > 119
    // keeps it, but its merge target is gone, so the append log ends
    // up with TWO sessions whose intervals overlap: [100, 115) and
    // [110, 120). A batch recompute over the same surviving rows would
    // have merged them — the divergence q167's geometry avoids and
    // this test pins.
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[(Long, Timestamp)]
    val agg = in.toDF().toDF("user", "ts")
      .withWatermark("ts", "5 seconds")
      .groupBy(session_window(col("ts"), "10 seconds"), col("user"))
      .agg(count(lit(1)).as("n"))
    val q = agg.writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("sess_late_bridge").start()
    try {
      in.addData((1L, ts(100)), (1L, ts(105))); q.processAllAvailable()
      in.addData((1L, ts(121))); q.processAllAvailable() // wm -> 116
      in.addData((1L, ts(124))); q.processAllAvailable() // emits [100,115)
      assert(sessions("sess_late_bridge") == Set((100000L, 1L, 2L)),
        "the first session must be emitted before the late row arrives")
      in.addData((1L, ts(110))); q.processAllAvailable() // late, survives
      in.addData((1L, ts(400))); q.processAllAvailable()
      in.addData((1L, ts(500))); q.processAllAvailable() // flush
      val got = sessions("sess_late_bridge")
      assert(got.contains((100000L, 1L, 2L)) && got.contains((110000L, 1L, 1L)),
        s"expected the re-opened [110,120) session ALONGSIDE the emitted " +
          s"[100,115) one, got $got")
      assert(got.contains((121000L, 1L, 2L)),
        s"the live [121,134) session must be unaffected, got $got")
    } finally q.stop()
  }
}
