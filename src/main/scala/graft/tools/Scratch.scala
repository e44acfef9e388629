package graft.tools

import graft.core.GraftSession
import graft.ops.{Multimodal, Stateless}

/** Dev scratch main — typed-closure + binary parquet round-trip drive. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(4, "scratch")
    import spark.implicits._
    val ds = Seq("the quick fox", "jumps high").toDS()
    val out = Stateless.filterTyped(
      Stateless.mapTyped(Stateless.flatMapTyped(ds)(_.split(" ")))(_.toUpperCase))(_.length > 3)
    println("typed pipeline: " + out.collect().mkString(", "))
    val dir = java.nio.file.Files.createTempDirectory("graft_media").toString
    Multimodal.syntheticMedia(spark, 10).write.mode("overwrite").parquet(dir)
    val feats = Multimodal.decodeAndEmbed(spark.read.parquet(dir).as[Multimodal.MediaRecord], dim = 4)
    feats.show(3, false)
    spark.stop()
  }
}
