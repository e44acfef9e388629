package graft.tools

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}
import graft.core.GraftSession

/** Dev scratch: measure the micro-batch commit floor under each
  * checkpoint file manager. The FileContext-based default pays Hadoop
  * Shell forks (readLink per rename, chmod per create) on every
  * offsets/commits log write when the native Hadoop library is absent
  * — sampled stacks showed Shell.execCommand under walCommit.
  */
object StackProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(8, "stack_probe")
    import spark.implicits._
    implicit val ctx = spark.sqlContext

    def run(tag: String, mgr: Option[String]): Unit = {
      mgr match {
        case Some(c) => spark.conf.set("spark.sql.streaming.checkpointFileManagerClass", c)
        case None => spark.conf.unset("spark.sql.streaming.checkpointFileManagerClass")
      }
      val in = MemoryStream[Long]
      val q = in.toDF().toDF("v").withColumn("m", col("v") * 2)
        .writeStream.outputMode(OutputMode.Append())
        .trigger(Trigger.ProcessingTime("1 milliseconds"))
        .format("memory").queryName(s"sp_$tag").start()
      (1 to 60).foreach { i => in.addData(1L to 50L); Thread.sleep(50) }
      q.processAllAvailable()
      val steady = q.recentProgress.takeRight(15)
      val avg = steady.map(_.batchDuration).sum / steady.length
      println(s"[$tag] avg steady batch=${avg}ms sample=${steady.last.durationMs}")
      q.stop()
    }
    run("default", None)
    run("fsbased",
      Some("org.apache.spark.sql.execution.streaming.checkpointing.FileSystemBasedCheckpointFileManager"))
    run("default2", None)
    spark.stop()
  }
}
