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
