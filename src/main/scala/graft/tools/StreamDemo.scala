package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.apache.spark.sql.types._

import graft.api.StreamEnv
import graft.core.GraftSession

/** Dev demo main: the reference's flagship pipeline (word count,
  * examples/word_count.py) as a real streaming job over a file-watch
  * source, driven through the fluent API.
  */
object StreamDemo {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(8, "stream-demo")
    val dir = Files.createTempDirectory("graft_stream_in").toFile
    val schema = StructType(Seq(
      StructField("line", StringType), StructField("ts", TimestampType)))

    def write(name: String, rows: Seq[String]): Unit = {
      val f = new java.io.File(dir, name)
      val w = new java.io.PrintWriter(f)
      rows.foreach(w.println); w.close()
    }
    write("b1.json",
      Seq("""{"line":"spark streams spark","ts":"2024-01-01T00:00:02Z"}""",
          """{"line":"flink spark","ts":"2024-01-01T00:00:07Z"}"""))

    val env = StreamEnv(spark)
    val q = env.fromFileStream(dir.getAbsolutePath, "json", schema)
      .flatMapRecords(graft.ops.Stateless.tokens(col("line")), "word")
      .withEventTime("ts", "5 seconds")
      .keyBy(col("word"))
      .window(col("ts"), "10 seconds")
      .agg(count(lit(1)).as("cnt"))
      .toMemorySink("demo_wc", OutputMode.Append())
    q.processAllAvailable()
    println(s"after batch 1 (watermark below window end): ${spark.table("demo_wc").count()} rows")
    // advance the watermark past the first window
    write("b2.json", Seq("""{"line":"later","ts":"2024-01-01T00:00:30Z"}"""))
    q.processAllAvailable()
    println("after watermark advance:")
    spark.table("demo_wc")
      .select(unix_millis(col("window.start")).as("win_ms"), col("word"), col("cnt"))
      .orderBy(col("word")).show(false)
    q.stop()
    spark.stop()
  }
}
