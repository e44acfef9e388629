package graft.tools

import graft.core.GraftSession

/** Dev scratch main — drives the driver contract surface locally. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(8, "scratch")
    // t1 smoke: flagship entry on sf0.001, driver checks rows > 0
    val e = graft.SparkEntry.entry(spark)
    e.show(5, false)
    println(s"entry rows: ${e.count()}")
    spark.stop()
  }
}
