package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Recovery semantics (reference: checkpoint/savepoint/recover surface,
  * jobmanager/checkpoint_coordinator.py + api.py:446-515 + Kafka offset
  * seek at sources.py:137-166): a stopped query restarted from the same
  * checkpointLocation resumes with its aggregation state and source
  * offsets intact — no lost and no double-counted records.
  */
class RecoverySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("stateful aggregation on the RocksDB state backend (reference STATE_BACKEND=rocksdb)") {
    implicit val ctx = spark.sqlContext
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    graft.core.GraftSession.useRocksDBStateStore(spark)
    val in = MemoryStream[(String, Double)]
    val q = StreamOps.runningAgg(in.toDF().toDF("k", "v"),
        Seq(col("k")), Seq(sum(graft.ops.Aggregates.dec(col("v"))).cast("double").as("s")))
      .writeStream.outputMode(OutputMode.Complete())
      .format("memory").queryName("rocks_agg").start()
    try {
      in.addData(("a", 1.0), ("b", 2.0))
      q.processAllAvailable()
      in.addData(("a", 3.0))
      q.processAllAvailable()
      assert(spark.table("rocks_agg").as[(String, Double)].collect().toMap ==
        Map("a" -> 4.0, "b" -> 2.0))
      // confirm the query actually ran on RocksDB, not the default store
      val provider = q.lastProgress.stateOperators.head.customMetrics
      assert(provider.containsKey("rocksdbGetCount") || provider.containsKey("rocksdbCommitCompactLatency"),
        s"no rocksdb metrics in progress: $provider")
    } finally {
      q.stop()
      prev match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("restart from checkpoint resumes state and offsets exactly once") {
    implicit val ctx = spark.sqlContext
    val ckpt = Files.createTempDirectory("graft_ckpt").toString
    val in = MemoryStream[(String, Double)]

    def start() = StreamOps.runningAgg(in.toDF().toDF("k", "v"),
        Seq(col("k")), Seq(sum(graft.ops.Aggregates.dec(col("v"))).cast("double").as("s")))
      .writeStream.outputMode(OutputMode.Complete())
      .option("checkpointLocation", ckpt)
      .format("memory").queryName("recov").start()

    val q1 = start()
    in.addData(("a", 1.0), ("a", 2.0), ("b", 10.0))
    q1.processAllAvailable()
    assert(spark.table("recov").as[(String, Double)].collect().toMap == Map("a" -> 3.0, "b" -> 10.0))
    q1.stop()

    // restart from the same checkpoint; feed one more record.
    // offsets: the first batch must NOT be re-consumed (its sums would
    // double); state: the running totals must survive the restart.
    val q2 = start()
    in.addData(("a", 4.0))
    q2.processAllAvailable()
    val after = spark.table("recov").as[(String, Double)].collect().toMap
    assert(after == Map("a" -> 7.0, "b" -> 10.0), s"got $after")
    q2.stop()
  }

  test("file-sink restart mid-replay is exactly-once: final table equals the batch aggregate") {
    // q129's contract in miniature: phase A delivers only the first 2 of
    // 4 ordered slices into an append-mode windowed aggregate writing a
    // parquet FILE sink (manifest = exactly-once), stops mid-replay with
    // committed offsets and live window state in the checkpoint; phase B
    // stages the rest + a flushing sentinel and restarts from the SAME
    // checkpoint. The re-read (through _spark_metadata) must equal the
    // batch aggregate: a replayed batch double-counts, a lost one drops
    // windows, stale state corrupts the boundary-straddling window.
    val rows = Seq((1L, 1000L), (2L, 2500L), (3L, 4000L), (4L, 5500L),
      (5L, 7000L), (6L, 8500L), (7L, 10000L), (8L, 11500L))
    val df = rows.toDF("id", "ms")
      .select(col("id"), timestamp_millis(col("ms")).as("ts"))
    val stage = java.nio.file.Files.createTempDirectory("graft_rst_stage").toString
    Replay.writeOrderedSlices(df, unix_millis(col("ts")), stage, slices = 4)
    Replay.appendSlice(stage,
      Seq(-1L).toDF("id").select(col("id"),
        timestamp_millis(lit(10000000L)).as("ts")), 4)
    val work = java.nio.file.Files.createTempDirectory("graft_rst_work").toString
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$work/in"))
    def copySlices(r: Range): Unit = r.foreach { i =>
      java.nio.file.Files.copy(
        java.nio.file.Paths.get(s"$stage/in/slice$i.parquet"),
        java.nio.file.Paths.get(s"$work/in/slice$i.parquet"),
        java.nio.file.StandardCopyOption.COPY_ATTRIBUTES)
    }
    def runPhase(): Int = {
      val q = spark.readStream.schema(df.schema)
        .option("maxFilesPerTrigger", 1).parquet(s"$work/in")
        .withWatermark("ts", "0 seconds")
        .where(col("ts") < timestamp_millis(lit(5000000L)))
        .groupBy(window(col("ts"), "3 seconds"))
        .agg(count(lit(1)).as("cnt"))
        .select(unix_millis(col("window.start")).as("win_ms"), col("cnt"))
        .writeStream.format("parquet")
        .option("path", s"$work/out").option("checkpointLocation", s"$work/ckpt")
        .outputMode(OutputMode.Append()).start()
      try {
        q.processAllAvailable()
        q.recentProgress.count(_.numInputRows > 0)
      } finally q.stop()
    }
    val phaseABatches = { copySlices(0 to 1); runPhase() }
    assert(phaseABatches >= 2, s"phase A must stop after >=2 data triggers, saw $phaseABatches")
    copySlices(2 to 4); runPhase()

    val got = spark.read.parquet(s"$work/out")
      .as[(Long, Long)].collect().toSet
    val batch = df.groupBy(window(col("ts"), "3 seconds"))
      .agg(count(lit(1)).as("cnt"))
      .select(unix_millis(col("window.start")).as("win_ms"), col("cnt"))
      .as[(Long, Long)].collect().toSet
    assert(got == batch, s"restart broke exactly-once: $got vs $batch")
    // the window straddling the phase boundary must have accumulated
    // across the restart (rows 3000-5999 span slices on both sides)
    assert(batch.contains((3000L, 2L)), s"fixture lost its straddling window: $batch")
  }

  test("custom keyed state survives a mid-replay restart (flatMapGroupsWithState checkpoint)") {
    // q134's contract in miniature: the retention machine's PER-USER
    // state (anchor period + seen periods) is custom state, not a
    // built-in aggregation buffer — stop after the first slices, then
    // restart from the checkpoint; users whose activity straddles the
    // stop must keep their pinned cohort and period set.
    val rows = Seq(
      (1L, "signup", 0L), (1L, "view", 500L),      // phase A
      (2L, "signup", 1500L), (3L, "signup", 1800L), // phase A
      (1L, "view", 2500L),                          // phase B: user 1 week 2
      (2L, "click", 3500L), (3L, "view", 3900L))    // phase B
    val df = rows.toDF("user_id", "event_type", "ms")
      .select(col("user_id"), col("event_type"), timestamp_millis(col("ms")).as("ts"))
    val stage = java.nio.file.Files.createTempDirectory("graft_crst_stage").toString
    Replay.writeOrderedSlices(df, unix_millis(col("ts")), stage, slices = 4)
    val work = java.nio.file.Files.createTempDirectory("graft_crst_work").toString
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$work/in"))
    def copySlices(r: Range): Unit = r.foreach { i =>
      java.nio.file.Files.copy(
        java.nio.file.Paths.get(s"$stage/in/slice$i.parquet"),
        java.nio.file.Paths.get(s"$work/in/slice$i.parquet"),
        java.nio.file.StandardCopyOption.COPY_ATTRIBUTES)
    }
    def runPhase(): Unit = {
      val q = graft.ops.Cohorts.retentionStream(
        spark.readStream.schema(df.schema)
          .option("maxFilesPerTrigger", 1).parquet(s"$work/in"),
        col("user_id"), col("event_type"), col("ts"), "signup", periodMs = 1000L)
        .writeStream.format("memory").queryName("crst_gate")
        .option("checkpointLocation", s"$work/ckpt")
        .outputMode(OutputMode.Complete()).start()
      try q.processAllAvailable() finally q.stop()
    }
    copySlices(0 to 1); runPhase()
    copySlices(2 to 3); runPhase()
    val got = spark.table("crst_gate").as[(Long, Long, Long)].collect().sorted.toSeq
    val batch = graft.ops.Cohorts.retention(df, col("user_id"), col("event_type"),
      col("ts"), "signup", periodMs = 1000L).as[(Long, Long, Long)].collect().sorted.toSeq
    assert(got == batch, s"custom state lost across restart: $got vs $batch")
    // the straddle matters: user 1's cohort was pinned in phase A and
    // its week-2 activity arrived in phase B
    assert(batch.contains((0L, 2L, 1L)), s"fixture lost its straddling cell: $batch")
  }

  test("retention gate runs green on RocksDB: stream == batch, rocksdb metrics present") {
    // q133's spec twin: the SAME retentionStream operator, state on
    // RocksDB, equals the batch retention triangle — and the progress
    // metrics prove the backend was really RocksDB
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    graft.core.GraftSession.useRocksDBStateStore(spark)
    try {
      implicit val ctx = spark.sqlContext
      val in = MemoryStream[(Long, String, Long)]
      val out = graft.ops.Cohorts.retentionStream(
        in.toDF().toDF("user_id", "event_type", "ms")
          .select(col("user_id"), col("event_type"),
            timestamp_millis(col("ms")).as("ts")),
        col("user_id"), col("event_type"), col("ts"), "signup", periodMs = 1000L)
      val q = out.writeStream.outputMode(OutputMode.Complete())
        .format("memory").queryName("rocks_retention").start()
      val rows = Seq(
        (1L, "signup", 0L), (1L, "view", 500L), (1L, "view", 2500L),
        (2L, "signup", 1500L), (2L, "click", 3500L), (3L, "signup", 1000L))
      try {
        in.addData(rows.take(3))
        q.processAllAvailable()
        in.addData(rows.drop(3))
        q.processAllAvailable()
        val got = spark.table("rocks_retention")
          .as[(Long, Long, Long)].collect().sorted.toSeq
        val batch = graft.ops.Cohorts.retention(
          rows.toDF("user_id", "event_type", "ms")
            .select(col("user_id"), col("event_type"),
              timestamp_millis(col("ms")).as("ts")),
          col("user_id"), col("event_type"), col("ts"), "signup", periodMs = 1000L)
          .as[(Long, Long, Long)].collect().sorted.toSeq
        assert(got == batch, s"rocksdb retention != batch: $got vs $batch")
        val metrics = q.lastProgress.stateOperators.head.customMetrics
        assert(metrics.containsKey("rocksdbGetCount") ||
            metrics.containsKey("rocksdbCommitCompactLatency"),
          s"no rocksdb metrics in progress: $metrics")
      } finally q.stop()
    } finally prev match {
      case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
      case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("named savepoint: snapshot forks, original and recovered jobs advance independently") {
    // reference: POST /jobs/{id}/savepoint + /jobs/recover
    // (jobmanager/api.py:446-515) — a named snapshot of a stopped job's
    // checkpoint that new jobs can start from while the original keeps
    // its own checkpoint
    implicit val ctx = spark.sqlContext
    val js = new graft.api.JobServer(spark)
    val ckpt = Files.createTempDirectory("graft_sp_ckpt").toString
    val spRoot = Files.createTempDirectory("graft_savepoints").toString
    val in = MemoryStream[(String, Double)]

    def agg = StreamOps.runningAgg(in.toDF().toDF("k", "v"),
      Seq(col("k")), Seq(sum(graft.ops.Aggregates.dec(col("v"))).cast("double").as("s")))
    def start(where: String, sink: String) = agg
      .writeStream.outputMode(OutputMode.Complete())
      .option("checkpointLocation", where)
      .format("memory").queryName(sink).start()

    // run, accumulate state, stop
    val q1 = start(ckpt, "sp_orig")
    in.addData(("a", 1.0), ("b", 10.0))
    q1.processAllAvailable()

    // savepoint refused while the owning query runs
    assertThrows[IllegalArgumentException] { js.savepoint(ckpt, "live", spRoot) }
    q1.stop()

    val spPath = js.savepoint(ckpt, "after_first_batch", spRoot)
    assert(java.nio.file.Files.isDirectory(java.nio.file.Paths.get(spPath, "offsets")))
    // a second savepoint under the same name is refused, not overwritten
    assertThrows[IllegalArgumentException] { js.savepoint(ckpt, "after_first_batch", spRoot) }

    // recovered job starts from the snapshot: sees pre-fork state exactly
    // once plus whatever arrives after
    in.addData(("a", 4.0))
    val rec = js.recover(spRoot, "after_first_batch")(p => start(p, "sp_rec"))
    rec.query.processAllAvailable()
    val recovered = spark.table("sp_rec").as[(String, Double)].collect().toMap
    assert(recovered == Map("a" -> 5.0, "b" -> 10.0), s"got $recovered")
    rec.query.stop()

    // the original checkpoint was not disturbed by the fork: restarting it
    // consumes the same post-fork record once, on top of its own state
    val q3 = start(ckpt, "sp_orig2")
    in.addData(("b", 2.0))
    q3.processAllAvailable()
    val original = spark.table("sp_orig2").as[(String, Double)].collect().toMap
    assert(original == Map("a" -> 5.0, "b" -> 12.0), s"got $original")
    q3.stop()
    js.close()
  }
}
