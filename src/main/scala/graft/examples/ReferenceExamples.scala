package graft.examples

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.api.StreamEnv
import graft.core.GraftSession
import graft.ops.Stateless
import graft.streaming.{KeyedProcess, StreamOps}

/** Every shipped example of the reference, as a graft pipeline — the
  * "switch your job over" demonstration. Sources are in-memory streams
  * (the reference's CollectionSource testing pattern, sources.py:201-261).
  *
  *  1. word_count          (reference: examples/word_count.py)
  *  2. windowed_aggregation (examples/windowed_aggregation.py — sliding
  *     30s/10s sensor mean; theirs is an order-dependent pairwise average,
  *     ours a true mean — documented divergence, SURVEY §2.8)
  *  3. stream_join          (examples/stream_join.py — click/impression
  *     attribution within a time bound on ad_id)
  *  4. stateful_deduplication (examples/stateful_deduplication.py — with
  *     state that actually persists, unlike the reference §2.7)
  *  5. anomaly detection    (examples/test_with_real_data.py:40-44 rules)
  */
object ReferenceExamples {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(8, "reference-examples")
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    def ts(sec: Long) = new Timestamp(sec * 1000)

    // 1. word count (streaming, windowed, count > threshold)
    locally {
      val in = MemoryStream[(String, Timestamp)]
      val q = StreamEnv(spark).fromBatch(in.toDF().toDF("line", "ts"))
        .flatMapRecords(Stateless.tokens(col("line")), "word")
        .withEventTime("ts", "5 seconds")
        .keyBy(col("word")).window(col("ts"), "10 seconds")
        .agg(count(lit(1)).as("cnt"))
        .toMemorySink("ex_wordcount", OutputMode.Append())
      in.addData(("to be or not to be", ts(1)), ("be like that", ts(4)))
      q.processAllAvailable()
      in.addData(("flush", ts(30)))
      q.processAllAvailable()
      println("== word_count ==")
      spark.table("ex_wordcount").where(col("cnt") > 1)
        .select("word", "cnt").show(false)
      q.stop()
    }

    // 2. sliding-window sensor aggregation (true mean)
    locally {
      val in = MemoryStream[(String, Double, Timestamp)]
      val agg = StreamOps.windowedAgg(
        in.toDF().toDF("sensor_id", "temperature", "ts"), "ts", "5 seconds",
        "30 seconds", Some("10 seconds"),
        Seq(col("sensor_id")),
        Seq(avg(col("temperature")).as("avg_temp")))
      val q = agg.writeStream.outputMode(OutputMode.Append())
        .format("memory").queryName("ex_sensor").start()
      in.addData(("s1", 20.0, ts(5)), ("s1", 22.0, ts(12)), ("s2", 99.0, ts(15)))
      q.processAllAvailable()
      in.addData(("s1", 0.0, ts(120)))
      q.processAllAvailable()
      println("== windowed_aggregation (sliding 30s/10s) ==")
      spark.table("ex_sensor")
        .select(unix_millis(col("window.start")).as("win"), col("sensor_id"), col("avg_temp"))
        .orderBy("win", "sensor_id").show(false)
      q.stop()
    }

    // 3. click/impression attribution join on ad_id within 60s
    locally {
      val clicks = MemoryStream[(String, String, Timestamp)]
      val imps = MemoryStream[(String, String, Timestamp)]
      val joined = StreamOps.intervalJoin(
        clicks.toDF().toDF("ad_id", "click_user", "click_ts"), "click_ts", "10 seconds",
        imps.toDF().toDF("i_ad_id", "imp_user", "imp_ts"), "imp_ts", "10 seconds",
        col("ad_id") === col("i_ad_id"),
        "click_ts BETWEEN imp_ts AND imp_ts + INTERVAL 60 SECONDS")
        .withColumn("time_to_click_ms", unix_millis(col("click_ts")) - unix_millis(col("imp_ts")))
      val q = joined.writeStream.outputMode(OutputMode.Append())
        .format("memory").queryName("ex_join").start()
      imps.addData(("ad1", "u9", ts(10)))
      clicks.addData(("ad1", "u1", ts(25)), ("ad1", "u2", ts(300)))
      q.processAllAvailable()
      println("== stream_join (attribution within 60s) ==")
      spark.table("ex_join").select("ad_id", "click_user", "time_to_click_ms").show(false)
      q.stop()
    }

    // 4. stateful dedup by (user, event id), capped state
    locally {
      val in = MemoryStream[(String, String)]
      val out = KeyedProcess.dedupCapped[(String, String)](in.toDS(), _._1, _._2, cap = 10000)
      val q = out.toDF("user_id", "event_id").writeStream.outputMode(OutputMode.Append())
        .format("memory").queryName("ex_dedup").start()
      in.addData(("u1", "e1"), ("u1", "e1"), ("u1", "e2"))
      q.processAllAvailable()
      in.addData(("u1", "e1"), ("u2", "e1"))
      q.processAllAvailable()
      println("== stateful_deduplication (3 unique of 5 inputs) ==")
      spark.table("ex_dedup").show(false)
      q.stop()
    }

    // 5. anomaly detection rules over sensor records
    locally {
      val sensors = Seq(
        ("sensor_001", 22.1, 55.0), ("sensor_002", 48.0, 50.0),
        ("sensor_003", -999.9, 40.0), ("sensor_004", 21.0, 95.0))
        .toDF("sensor_id", "temperature", "humidity")
      val flagged = graft.ops.FileOps.anomalyRules(sensors, Seq(
        "temp_range" -> (col("temperature") < 10 || col("temperature") > 35),
        "humidity_range" -> (col("humidity") < 20 || col("humidity") > 80),
        "sensor_failure" -> (col("temperature") === -999.9)))
      println("== anomaly detection ==")
      flagged.select("sensor_id", "is_anomaly", "fired_rules").show(false)
    }

    spark.stop()
  }
}
