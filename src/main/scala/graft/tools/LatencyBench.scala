package graft.tools

import java.sql.Timestamp
import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

import graft.core.GraftSession

/** End-to-end micro-batch latency vs the reference's claims
  * (reference: docs/realistic_benchmarking.md — stateless P99 10-50 ms,
  * E2E 20-150 ms stateless / 100-500 ms stateful).
  *
  * Method mirrors its scenario 1: stamp records with ingest wall-clock,
  * run a Map→Filter streaming query on a fast trigger, measure
  * sink-arrival minus stamp per record.
  */
object LatencyBench {
  def main(args: Array[String]): Unit = {
    val rounds = args.headOption.map(_.toInt).getOrElse(30)
    val spark = GraftSession.local(8, "latency")
    import spark.implicits._
    implicit val ctx = spark.sqlContext

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

    // steady-state: emit a small batch, wait for it to drain, repeat;
    // the first half is JVM/codegen warmup and is discarded below
    (1 to rounds).foreach { i =>
      in.addData((1 to 100).map(j => (i * 1000L + j, System.nanoTime())): _*)
      Thread.sleep(100)
    }
    q.processAllAvailable()
    q.stop()

    val all = latencies.toArray.map(_.asInstanceOf[Double])
    val xs = all.drop(all.length / 2).sorted
    def pct(p: Double) = xs(math.min(xs.length - 1, (xs.length * p).toInt))
    println(f"records=${xs.length} p50=${pct(0.5)}%.1f ms p95=${pct(0.95)}%.1f ms p99=${pct(0.99)}%.1f ms max=${xs.last}%.1f ms")
    spark.stop()
  }
}
