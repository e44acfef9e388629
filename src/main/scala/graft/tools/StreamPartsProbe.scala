package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.EntryHelpers._
import graft.sources.Tables

/** Dev probe: per-batch cost of the replay-gated streaming queries as a
  * function of the streaming shuffle-partition count (each partition of
  * a stateful query is a state-store instance committed per micro-batch
  * — the forStreaming sizing rule). Prints wall time and the engine's
  * own durationMs breakdown at each partition count for the q122
  * pipeline shape.
  */
object StreamPartsProbe {
  def main(args: Array[String]): Unit = {
    val d = "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries",
        graft.core.GraftSession.CodegenCacheMaxEntries)
      .getOrCreate()
    graft.core.GraftSession.tune(s)
    s.sparkContext.setLogLevel("WARN")
    // stage the replay once (cached per process, like Bench)
    sentinelReplayDir(s, d)

    Seq(8, 8, 4, 2, 1, 8).zipWithIndex.foreach { case (parts, i) =>
      val prev = s.conf.get("spark.sql.shuffle.partitions")
      s.conf.set("spark.sql.shuffle.partitions", parts.toString)
      val t0 = System.nanoTime()
      try {
        val stream = graft.streaming.Replay.orderedStream(s,
          sentinelReplayDir(s, d), Tables(s, d).events.select(replayCols: _*).schema)
        val out = stream.withWatermark("ts", "0 seconds")
          .where(col("ts") < sentinelCutoff)
          .groupBy(window(col("ts"), "1 hour"), col("event_type"))
          .agg(count(lit(1)).as("cnt"),
            sum(dec(col("value"))).cast("double").as("sum_v"))
          .select(unix_millis(col("window.start")).as("win_start_ms"),
            col("event_type"), col("cnt"), col("sum_v"))
        val q = out.writeStream.format("memory").queryName(s"probe_w$i")
          .outputMode("append").start()
        try q.processAllAvailable() finally q.stop()
        val wall = (System.nanoTime() - t0) / 1e6
        val n = s.table(s"probe_w$i").count()
        val progs = q.recentProgress.toSeq
        def sumDur(k: String) = progs.flatMap(p =>
          Option(p.durationMs.get(k)).map(_.toLong)).sum
        println(f"[parts=$parts run$i] wall=${wall}%.0fms rows=$n " +
          s"batches=${progs.size} " +
          s"addBatch=${sumDur("addBatch")} walCommit=${sumDur("walCommit")} " +
          s"commitOffsets=${sumDur("commitOffsets")} " +
          s"queryPlanning=${sumDur("queryPlanning")} " +
          s"getBatch=${sumDur("getBatch")} latestOffset=${sumDur("latestOffset")}")
      } finally s.conf.set("spark.sql.shuffle.partitions", prev)
    }
    s.stop()
  }
}
