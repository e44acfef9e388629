package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Value/List/Map state handles (the reference's state_types.py surface)
  * on transformWithState + RocksDB — state persists across micro-batches,
  * the list buffer stays bounded, the map tracks per-subtype counts.
  */
class StateTypesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("keyed profile: ValueState count, bounded ListState, MapState subtype counts") {
    implicit val ctx = spark.sqlContext
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    graft.core.GraftSession.useRocksDBStateStore(spark)
    val in = MemoryStream[(String, String, Double)]
    val q = StateTypes.keyedProfile(in.toDS(), recentN = 3)
      .toDF("key", "count", "recent", "distinctTypes")
      .writeStream.outputMode(OutputMode.Update())
      .format("memory").queryName("state_profile").start()
    try {
      in.addData(("u1", "click", 1.0), ("u1", "view", 2.0), ("u2", "click", 9.0))
      q.processAllAvailable()
      in.addData(("u1", "click", 3.0), ("u1", "buy", 4.0), ("u1", "click", 5.0))
      q.processAllAvailable()
      val last = spark.table("state_profile")
        .as[(String, Long, Seq[Double], Int)].collect()
        .groupBy(_._1).map { case (k, rows) => k -> rows.maxBy(_._2) }
      // u1: 5 events total (state persisted across batches), recent
      // bounded to last 3, 3 distinct event types
      assert(last("u1") == ("u1", 5L, Seq(3.0, 4.0, 5.0), 3))
      assert(last("u2") == ("u2", 1L, Seq(9.0), 1))
    } finally {
      q.stop()
      prev match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }
}
