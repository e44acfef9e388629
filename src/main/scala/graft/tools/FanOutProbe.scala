package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops._
import graft.sources.Tables

/** Dev probe: does fanning a single-file scan out to core count before
  * the CPU-heavy kernels (shingles/minhash/banding) pay for its
  * exchange? (guide §2.5 — unsplittable input, repartition after read).
  */
object FanOutProbe {
  def main(args: Array[String]): Unit = {
    val d = "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries",
        graft.core.GraftSession.CodegenCacheMaxEntries)
      .withExtensions(new graft.functions.GraftExtensions)
      .getOrCreate()
    graft.core.GraftSession.tune(s)
    s.sparkContext.setLogLevel("WARN")

    def time(tag: String)(mk: => org.apache.spark.sql.DataFrame): Unit = {
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        mk.write.format("noop").mode("overwrite").save()
        println(f"[$tag run$i] ${(System.nanoTime() - t0) / 1e6}%.0fms")
      }
    }

    val docs = Tables(s, d).documents
    time("q52 as-is") {
      Dedup.ngramJaccardPairs(docs, col("doc_id"), col("text"), n = 3, threshold = 0.8)
    }
    time("q52 fanout") {
      Dedup.ngramJaccardPairs(docs.repartition(32), col("doc_id"), col("text"),
        n = 3, threshold = 0.8)
    }
    time("q233 as-is") {
      Dedup.jaccardJoin(docs, col("doc_id"),
        Dedup.shingles(lower(col("text")), 3), threshold = 0.4)
    }
    time("q233 fanout") {
      Dedup.jaccardJoin(docs.repartition(32), col("doc_id"),
        Dedup.shingles(lower(col("text")), 3), threshold = 0.4)
    }
    val li = Tables(s, d).lineitem
    time("q186 as-is") {
      Quantiles.madOutliers(
        li.select(col("l_suppkey"),
          (Aggregates.dec(col("l_extendedprice")) * 100).cast("long").as("cents")),
        Seq("l_suppkey"), col("cents"))
    }
    time("q186 fanout") {
      Quantiles.madOutliers(
        li.repartition(32).select(col("l_suppkey"),
          (Aggregates.dec(col("l_extendedprice")) * 100).cast("long").as("cents")),
        Seq("l_suppkey"), col("cents"))
    }
    s.stop()
  }
}
