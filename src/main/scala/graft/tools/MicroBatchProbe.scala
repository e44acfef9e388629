package graft.tools

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

import graft.core.GraftSession

/** Where does steady-state micro-batch time go, and what does async
  * progress tracking buy back?
  *
  * Prints the engine's own durationMs breakdown at steady state for the
  * default (per-batch offset/commit WAL) and async-progress-tracking
  * configurations. Measured on this container: default ≈ 160 ms/batch
  * (walCommit ≈ 38 ms + commitOffsets ≈ 38 ms + addBatch ≈ 70 ms +
  * planning ≈ 15 ms); async ≈ 90 ms/batch (both logs leave the critical
  * path). Async tracking trades exactly-once for at-least-once between
  * checkpoints — the same guarantee as the reference's
  * flush-on-checkpoint sinks (sinks.py:19-104).
  */
object MicroBatchProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(8, "mb_probe")
    import spark.implicits._
    implicit val ctx = spark.sqlContext

    def run(tag: String, async: Boolean): Unit = {
      val in = MemoryStream[(Long, Long)]
      var w = in.toDF().toDF("v", "ingest")
        .withColumn("mapped", col("v") * 2 + 1)
        .where(col("mapped") % 7 =!= 0)
        .writeStream.outputMode(OutputMode.Append())
        .trigger(Trigger.ProcessingTime("5 milliseconds"))
        .format("memory").queryName(s"mb_probe_$tag")
      if (async) w = w.option("asyncProgressTrackingEnabled", "true")
        .option("asyncProgressTrackingCheckpointIntervalMs", "1000")
      val q = w.start()
      (1 to 40).foreach { i =>
        in.addData((1 to 100).map(j => (i * 1000L + j, System.nanoTime())): _*)
        Thread.sleep(100)
      }
      q.processAllAvailable()
      val steady = q.recentProgress.takeRight(10)
      val avg = steady.map(_.batchDuration).sum / steady.length
      println(s"[$tag] avg steady batch=${avg}ms; sample=${steady.last.durationMs}")
      q.stop()
    }

    run("default", async = false)
    run("async", async = true)

    // stateful lane: keyed running aggregation (update mode) — the floor
    // every windowed/keyed operator pays per batch
    def runStateful(tag: String, async: Boolean, parts: Option[Int] = None): Unit = {
      val prev = spark.conf.get("spark.sql.shuffle.partitions")
      parts.foreach(p => spark.conf.set("spark.sql.shuffle.partitions", p.toString))
      val in = MemoryStream[(Long, Long)]
      var w = graft.streaming.StreamOps.runningAgg(
          in.toDF().toDF("k", "ingest").withColumn("k", col("k") % 50),
          Seq(col("k")), Seq(count(lit(1)).as("n")))
        .writeStream.outputMode(OutputMode.Update())
        .trigger(Trigger.ProcessingTime("5 milliseconds"))
        .format("memory").queryName(s"mb_probe_state_$tag")
      if (async) w = w.option("asyncProgressTrackingEnabled", "true")
        .option("asyncProgressTrackingCheckpointIntervalMs", "1000")
      try {
        val q = w.start()
        (1 to 40).foreach { i =>
          in.addData((1 to 100).map(j => (i * 100L + j, System.nanoTime())): _*)
          Thread.sleep(100)
        }
        q.processAllAvailable()
        val steady = q.recentProgress.takeRight(10)
        val avg = steady.map(_.batchDuration).sum / steady.length
        println(s"[stateful-$tag] avg steady batch=${avg}ms; sample=${steady.last.durationMs}")
        q.stop()
      } catch {
        case e: Exception =>
          println(s"[stateful-$tag] unsupported: ${e.getMessage.linesIterator.next()}")
      } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    }
    // cluster-default partitioning vs GraftSession.forStreaming's
    // key-cardinality sizing (50 keys -> 7 partitions): the per-batch
    // state-store commit cost scales with partition count
    runStateful("p32", async = false, parts = Some(32))
    runStateful("p16", async = false, parts = Some(16))
    runStateful("p8", async = false, parts = Some(8))
    runStateful("p4", async = false, parts = Some(4))
    runStateful("p2", async = false, parts = Some(2))
    GraftSession.forStreaming(spark, distinctKeys = 50)
    runStateful("tuned", async = false,
      parts = Some(spark.conf.get("spark.sql.shuffle.partitions").toInt))
    runStateful("async", async = true)
    spark.stop()
  }
}
