package graft.tools

import org.apache.spark.sql.functions._
import graft.ops._
import graft.sources.Tables

/** Dev probe: where does q233 (jaccardJoin) spend its dominant stage —
  * candidate volume, array sizes, verify cost.
  */
object JaccardProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession.local(32, "jacprobe")
    val d = "/root/testdata/sf0.1"
    val docs = Tables(spark, d).documents
    val toks = docs
      .select(col("doc_id").as("id"),
        explode(Dedup.shingles(lower(col("text")), 3)).as("tok"))
      .where(length(col("tok")) > 0).distinct().localCheckpoint()
    println("tok rows: " + toks.count())
    println("docs: " + toks.select("id").distinct().count())
    val dfreq = toks.groupBy(col("tok")).agg(count(lit(1)).as("__df"))
    println("vocab: " + dfreq.count())
    println("df>100 tokens: " + dfreq.where(col("__df") > 100).count())
    val t1e4 = 4000
    val ranked = toks.join(dfreq, "tok")
      .withColumn("__rk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("id"))
          .orderBy(col("__df"), col("tok"))))
    val arrs = toks.groupBy(col("id"))
      .agg(sort_array(collect_list(col("tok"))).as("__ts"), count(lit(1)).as("__n"))
    val sizes = arrs.select(col("id"), col("__n"))
    println("avg tokens/doc: " + sizes.agg(avg("__n")).head.getDouble(0))
    val prefix = ranked.join(sizes, "id")
      .where(col("__rk") <= col("__n") - expr(s"(($t1e4 * __n + 9999) div 10000)") + 1)
      .select(col("id"), col("tok"))
    println("prefix rows: " + prefix.count())
    val hot = prefix.groupBy("tok").agg(count(lit(1)).as("c")).orderBy(desc("c"))
    hot.show(10, false)
    val t0 = System.nanoTime()
    val cands = prefix.as("a").join(prefix.as("b"), Seq("tok"))
      .where(col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct().localCheckpoint()
    println(f"cands: ${cands.count()} in ${(System.nanoTime()-t0)/1e9}%.1fs")
    val t2 = System.nanoTime()
    val ver = cands
      .join(arrs.select(col("id").as("id_a"), col("__ts").as("__ta"), col("__n").as("n_a")), Seq("id_a"))
      .join(arrs.select(col("id").as("id_b"), col("__ts").as("__tb"), col("__n").as("n_b")), Seq("id_b"))
      .withColumn("inter", size(array_intersect(col("__ta"), col("__tb"))).cast("long"))
      .where(col("inter") * 10000 >= lit(t1e4) * (col("n_a") + col("n_b") - col("inter")))
    println(f"verified: ${ver.count()} in ${(System.nanoTime()-t2)/1e9}%.1fs")
    spark.stop()
  }
}
