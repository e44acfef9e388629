package graft.tools

import org.apache.spark.sql.functions._

import graft.core.GraftSession
import graft.ops.Dedup

/** Dev scratch main — LSH stage profiling. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(32, "scratch")
    val docs = graft.sources.Tables(spark, "/root/testdata/sf0.1").documents
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val sh = docs.select(col("doc_id").as("id"), Dedup.shingles(col("text"), 3).as("sh"))
      .where(size(col("sh")) > 0)
    time("shingles only")(sh.write.format("noop").mode("overwrite").save())
    val sig = sh.select(col("id"), Dedup.minhashSignature(col("sh"), 32).as("sig"))
    time("shingles+sig")(sig.write.format("noop").mode("overwrite").save())
    val banded = sh
      .select(col("id"), explode(Dedup.lshBands(Dedup.minhashSignature(col("sh"), 32), 8, 4)).as("bb"))
      .select(col("bb.band").as("band"), col("bb.bucket").as("bucket"), col("id"))
    time("banded")(banded.write.format("noop").mode("overwrite").save())
    val cand = banded.as("l").join(banded.as("r"),
        col("l.band") === col("r.band") && col("l.bucket") === col("r.bucket") &&
          col("l.id") < col("r.id"))
      .select(col("l.id").as("id_a"), col("r.id").as("id_b")).distinct()
    println("candidates: " + time("cand count")(cand.count()))
    val full = Dedup.minhashLsh(docs, col("doc_id"), col("text"),
      numHashes = 32, bands = 8, rowsPerBand = 4, threshold = 0.8)
    time("full pipeline")(full.write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
