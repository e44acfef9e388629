package graft.tools

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.core.GraftSession
import graft.streaming.StateTypes

/** Dev scratch main — drive transformWithState state surface. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(4, "scratch")
    GraftSession.useRocksDBStateStore(spark)
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[(String, String, Double)]
    val q = StateTypes.keyedProfile(in.toDS(), recentN = 3)
      .toDF("key", "count", "recent", "distinctTypes")
      .writeStream.outputMode(OutputMode.Update())
      .format("memory").queryName("scratch_state").start()
    in.addData(("u1", "click", 1.0), ("u1", "view", 2.0))
    q.processAllAvailable()
    in.addData(("u1", "buy", 3.0), ("u1", "click", 4.0), ("u1", "view", 5.0))
    q.processAllAvailable()
    spark.table("scratch_state").show(false)
    q.stop()
    spark.stop()
  }
}
