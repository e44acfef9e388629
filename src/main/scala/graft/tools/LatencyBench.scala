package graft.tools

import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.sql.Row
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

import graft.core.GraftSession

/** End-to-end streaming latency vs the reference's claims
  * (reference: docs/realistic_benchmarking.md — stateless P99 10-50 ms,
  * E2E 20-150 ms stateless / 100-500 ms stateful).
  *
  * Two scenarios:
  *  1. CONTINUOUS (Trigger.Continuous): the engine's low-latency lane for
  *     stateless map/filter pipelines — long-running tasks, per-record
  *     flow, epoch-based commits. Rows come from the rate source, whose
  *     timestamp column is the row's scheduled emission time; the foreach
  *     sink records (arrival - emission) per record.
  *  2. MICRO-BATCH (Trigger.ProcessingTime): the default lane every
  *     stateful operator runs on; its floor is the batch planning/commit
  *     cycle. Measured the same way via ingest-stamped MemoryStream rows.
  *
  * Run: `sbt "runMain graft.tools.LatencyBench [microRounds] [contSecs]"`.
  */
object LatencyBench {

  /** Continuous-mode sink records land here — the foreach writer runs in
    * this JVM under local[*], so a static queue is the lowest-overhead
    * collection point (no extra hop that would inflate the measurement).
    */
  val contLatencies = new ConcurrentLinkedQueue[java.lang.Double]()

  private def report(tag: String, raw: Array[Double], dropWarmupHalf: Boolean): Unit = {
    val xs = (if (dropWarmupHalf) raw.drop(raw.length / 2) else raw).sorted
    if (xs.isEmpty) { println(s"$tag: no records"); return }
    def pct(p: Double) = xs(math.min(xs.length - 1, (xs.length * p).toInt))
    println(f"$tag: records=${xs.length} p50=${pct(0.5)}%.1f ms p95=${pct(0.95)}%.1f ms p99=${pct(0.99)}%.1f ms max=${xs.last}%.1f ms")
  }

  def main(args: Array[String]): Unit = {
    val microRounds = args.headOption.map(_.toInt).getOrElse(30)
    val contSecs = args.drop(1).headOption.map(_.toInt).getOrElse(20)
    val spark = GraftSession.local(8, "latency")
    import spark.implicits._
    implicit val ctx = spark.sqlContext

    // ---- scenario 1: continuous trigger, stateless map->filter ----
    contLatencies.clear()
    val cont = spark.readStream.format("rate")
      .option("rowsPerSecond", "1000")
      .option("numPartitions", "2")
      .load()
      .withColumn("mapped", col("value") * 2 + 1)
      .where(col("mapped") % 7 =!= 0)
      .select(col("timestamp"), col("mapped"))
      .writeStream.outputMode(OutputMode.Append())
      .trigger(Trigger.Continuous("1 second"))
      .foreach(new org.apache.spark.sql.ForeachWriter[Row] {
        override def open(partitionId: Long, epochId: Long): Boolean = true
        override def process(r: Row): Unit = {
          val emitted = r.getTimestamp(0).getTime
          LatencyBench.contLatencies.add(System.currentTimeMillis() - emitted.toDouble)
        }
        override def close(errorOrNull: Throwable): Unit = ()
      })
      .start()
    Thread.sleep(contSecs * 1000L)
    cont.stop()
    val contAll = contLatencies.toArray.map(_.asInstanceOf[java.lang.Double].doubleValue())
    report("continuous stateless", contAll, dropWarmupHalf = true)

    // ---- scenario 2: micro-batch, same pipeline (the stateful floor) ----
    val in = MemoryStream[(Long, Long)] // (payload, ingestNanos)
    val latencies = new ConcurrentLinkedQueue[Double]()
    val q = in.toDF().toDF("v", "ingest")
      .withColumn("mapped", col("v") * 2 + 1)
      .where(col("mapped") % 7 =!= 0)
      .writeStream.outputMode(OutputMode.Append())
      .trigger(Trigger.ProcessingTime("5 milliseconds"))
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val now = System.nanoTime()
        batch.select("ingest").collect().foreach { r =>
          latencies.add((now - r.getLong(0)) / 1e6)
        }
      }
      .start()
    (1 to microRounds).foreach { i =>
      in.addData((1 to 100).map(j => (i * 1000L + j, System.nanoTime())): _*)
      Thread.sleep(100)
    }
    q.processAllAvailable()
    q.stop()
    report("micro-batch stateless", latencies.toArray.map(_.asInstanceOf[Double]),
      dropWarmupHalf = true)

    spark.stop()
  }
}
