package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.sources.Tables

class FunnelSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val STEPS = Seq("view", "click", "purchase")

  private def run(rows: Seq[(Long, String, Long)]) =
    Funnel.steps(
      rows.toDF("user_id", "event_type", "us")
        .select(col("user_id"), col("event_type"),
          timestamp_micros(col("us")).as("ts")),
      col("user_id"), col("event_type"), col("ts"), STEPS)
      .as[(Long, Long, Boolean)].collect().sorted.toSeq

  test("completion semantics: order matters, skips do not count, repeats retry") {
    val got = run(Seq(
      (1L, "view", 10L), (1L, "click", 20L), (1L, "purchase", 30L), // converts
      (2L, "view", 10L), (2L, "purchase", 20L),                     // skip click -> 1
      (3L, "click", 10L), (3L, "purchase", 20L), (3L, "view", 30L), // wrong order -> 1
      (4L, "view", 10L), (4L, "click", 5L), (4L, "click", 20L),     // early click ignored, later counts
      (5L, "error", 10L),                                           // never in funnel: absent
      (6L, "purchase", 10L)))                                       // only late step -> 0
    assert(got == Seq((1L, 3L, true), (2L, 1L, false), (3L, 1L, false),
      (4L, 2L, false), (6L, 0L, false)))
  }

  test("greedy earliest-match is a fold, not per-pair joins: corpus replica") {
    val ev = Tables(spark, "/root/testdata/sf0.001").events
    val fast = Funnel.steps(ev, col("user_id"), col("event_type"), col("ts"), STEPS)
      .as[(Long, Long, Boolean)].collect().sorted.toSeq
    // naive replica: chained conditional mins, driver side
    val raw = ev.where(col("event_type").isin(STEPS: _*))
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")))
      .as[(Long, String, Long)].collect()
    val naive = raw.groupBy(_._1).map { case (u, rows) =>
      var last = Long.MinValue
      var k = 0
      var advanced = true
      while (advanced && k < STEPS.size) {
        val nxt = rows.filter(r => r._2 == STEPS(k) && r._3 > last).map(_._3)
        if (nxt.isEmpty) advanced = false
        else { last = nxt.min; k += 1 }
      }
      (u, k.toLong, k == STEPS.size)
    }.toSeq.sorted
    assert(fast == naive && fast.nonEmpty)
    // funnel has one user-keyed exchange; the step filter reaches the scan
    val plan = Funnel.steps(ev, col("user_id"), col("event_type"), col("ts"), STEPS)
      .queryExecution.executedPlan.toString
    val hashEx = plan.linesIterator.filter(_.contains("Exchange hashpartitioning")).toSeq
    assert(hashEx.size == 1 && hashEx.head.contains("hashpartitioning(user_id#"),
      s"expected exactly one user-keyed exchange:\n${hashEx.mkString("\n")}")
    assert(plan.contains("PushedFilters: [In(event_type"),
      s"step filter not pushed:\n$plan")
  }

  test("stepsStream: in-order delivery == batch funnel; stragglers drop, state advances only") {
    val ev = Tables(spark, "/root/testdata/sf0.001").events
    val rows = ev.where(col("event_type").isin(STEPS: _*))
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")))
      .as[(Long, String, Long)].collect().sortBy(_._3)
    val in = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String, Long)](spark)
    val out = Funnel.stepsStream(
      in.toDF().toDF("user_id", "event_type", "us")
        .select(col("user_id"), col("event_type"), timestamp_micros(col("us")).as("ts")),
      col("user_id"), col("event_type"), col("ts"), STEPS)
    val q = out.writeStream.outputMode("update")
      .format("memory").queryName("funnel_stream").start()
    try {
      // event-time-ordered delivery in three batches
      val (b1, rest) = rows.splitAt(rows.length / 3)
      val (b2, b3) = rest.splitAt(rest.length / 3)
      Seq(b1, b2, b3).foreach { b => in.addData(b.toSeq); q.processAllAvailable() }
      // last emitted progress per user == the batch funnel (users at 0
      // steps never emit — the machine never advanced)
      val updates = spark.table("funnel_stream").as[(Long, Long, Boolean)].collect()
      val last = updates.zipWithIndex.groupBy(_._1._1)
        .map { case (u, xs) => xs.maxBy(_._2)._1 }.toSeq
        .map(r => (r._1, r._2, r._3)).sorted
      val batch = Funnel.steps(ev, col("user_id"), col("event_type"), col("ts"), STEPS)
        .as[(Long, Long, Boolean)].collect().filter(_._2 > 0).toSeq.sorted
      assert(last == batch && last.nonEmpty)
      // a straggler behind the machine is ignored, not an error
      val u = last.head._1
      in.addData(Seq((u, STEPS.head, 1L))) // ancient first-step event
      q.processAllAvailable()
      val again = spark.table("funnel_stream").as[(Long, Long, Boolean)].collect()
      assert(again.length == updates.length, "straggler must not emit or regress")
    } finally q.stop()
  }

  test("guards: ambiguous same-microsecond events fail loudly; bad step lists rejected") {
    val e = intercept[Exception] {
      run(Seq((1L, "view", 10L), (1L, "click", 10L)))
    }
    assert(e.getMessage != null && e.getMessage.contains("same microsecond")
      || e.getCause != null)
    assertThrows[IllegalArgumentException] {
      Funnel.steps(Seq((1L, "view", 10L)).toDF("user_id", "event_type", "us"),
        col("user_id"), col("event_type"), col("us"), Seq.empty)
    }
    assertThrows[IllegalArgumentException] {
      Funnel.steps(Seq((1L, "view", 10L)).toDF("user_id", "event_type", "us"),
        col("user_id"), col("event_type"), col("us"), Seq("view", "view"))
    }
  }

  test("conversionLatency: first-match to final-advance, converted only") {
    def t(us: Long) = new java.sql.Timestamp(us / 1000) // ms precision here
    val ev = Seq(
      // user 1 converts: view@1s (earliest), click@3s, purchase@7s
      (1L, "view", t(1000000L)), (1L, "view", t(2000000L)),
      (1L, "click", t(3000000L)), (1L, "purchase", t(7000000L)),
      // user 2 stalls at click
      (2L, "view", t(1000000L)), (2L, "click", t(2000000L)),
      // user 3: purchase BEFORE click -> not converted
      (3L, "view", t(1000000L)), (3L, "purchase", t(2000000L))
    ).toDF("user_id", "event_type", "ts")
    val got = Funnel.conversionLatency(ev, col("user_id"), col("event_type"),
      col("ts"), Seq("view", "click", "purchase"))
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 1000000L, 7000000L, 6000000L)))
    // latency agrees with steps' conversion set on the corpus
    val e = graft.sources.Tables(spark, "/root/testdata/sf0.001").events
    val conv = Funnel.steps(e, col("user_id"), col("event_type"), col("ts"),
      Seq("view", "click", "purchase")).where(col("converted"))
      .select(col("user_id")).as[Long].collect().toSet
    val lat = Funnel.conversionLatency(e, col("user_id"), col("event_type"),
      col("ts"), Seq("view", "click", "purchase"))
    assert(lat.select(col("user_id")).as[Long].collect().toSet == conv)
    assert(lat.where(col("latency_us") <= 0).count() == 0)
  }
}
