package graft.ops

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.sources.Tables

class CosineIndexSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  /** sf embeddings are uniform-random (no true near-dups), so plant them:
    * every 20th vector gets a deterministically perturbed copy at cosine
    * ~0.99995 — the q45 corpus shape.
    */
  private def planted: DataFrame = {
    val em = Tables(spark, sf).embeddings
    val base = em.select(col("vec_id").as("id"),
      transform(col("embedding"), x => x.cast("double")).as("v"))
    val copies = em.where(col("vec_id") % 20 === 0)
      .select((col("vec_id") + 10000000L).as("id"),
        transform(col("embedding"), (x, i) =>
          x.cast("double") * (lit(1.0) + lit(0.01) * (i % 3 - 1))).as("v"))
    base.union(copies)
  }

  test("index-backed pairs equal the direct cosineNearDupPairs operator") {
    val corpus = planted
    val dir = Files.createTempDirectory("graft_cos_idx").toString
    CosineIndex.build(corpus, col("id"), col("v"), dir)
    val fromIndex = CosineIndex.pairs(spark, dir, threshold = 0.95)
      .as[(Long, Long, Double)].collect().toSet
    val direct = Similarity.cosineNearDupPairs(corpus, col("id"), col("v"),
        dim = 0, bands = 8, rowsPerBand = 16, threshold = 0.95)
      .as[(Long, Long, Double)].collect().toSet
    assert(fromIndex == direct,
      s"index pairs diverge (index=${fromIndex.size}, direct=${direct.size})")
    assert(fromIndex.nonEmpty, "vacuous comparison: planted corpus produced no pairs")
  }

  test("check screens a batch: planted near-dups flagged, clean vectors pass") {
    val em = Tables(spark, sf).embeddings
    val base = em.select(col("vec_id").as("id"),
      transform(col("embedding"), x => x.cast("double")).as("v"))
    val dir = Files.createTempDirectory("graft_cos_chk").toString
    CosineIndex.build(base, col("id"), col("v"), dir)

    // batch: a perturbed copy of vector 40 + vector 3 reversed (random ->
    // cosine far below threshold against everything)
    val dup = em.where(col("vec_id") === 40)
      .select(lit(555000L).as("nid"),
        transform(col("embedding"), (x, i) =>
          x.cast("double") * (lit(1.0) + lit(0.01) * (i % 3 - 1))).as("nv"))
    val clean = em.where(col("vec_id") === 3)
      .select(lit(666000L).as("nid"),
        reverse(transform(col("embedding"), x => x.cast("double"))).as("nv"))
    val hits = CosineIndex.check(spark, dup.union(clean), col("nid"), col("nv"),
        dir, threshold = 0.95)
      .as[(Long, Long, Double)].collect()
    assert(hits.exists(h => h._1 == 555000L && h._2 == 40L && h._3 > 0.999),
      s"planted dup not flagged: ${hits.toSeq}")
    assert(!hits.exists(_._1 == 666000L), s"clean vector flagged: ${hits.toSeq}")
  }

  test("screenStream: micro-batches screen against the index; admitted batch appended between") {
    implicit val ctx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val em = Tables(spark, sf).embeddings
    val base = em.select(col("vec_id").as("id"),
      transform(col("embedding"), x => x.cast("double")).as("v"))
    val dir = Files.createTempDirectory("graft_cos_ss").toString
    CosineIndex.build(base, col("id"), col("v"), dir)

    // streamed vectors keyed by vec_id: +1000000 = perturbed copy of that
    // vector (a near-dup), +2000000 = reversed (clean)
    def vecFor = em.select(col("vec_id"), transform(col("embedding"),
      (x, i) => x.cast("double") * (lit(1.0) + lit(0.01) * (i % 3 - 1))).as("dupv"),
      reverse(transform(col("embedding"), x => x.cast("double"))).as("cleanv"))
    val in = MemoryStream[Long]
    val got = new java.util.concurrent.ConcurrentHashMap[Long, Set[Long]]()
    val seenBatches = new java.util.concurrent.atomic.AtomicInteger(0)
    val q = CosineIndex.screenStream(spark,
      in.toDF().toDF("qid")
        .join(vecFor.withColumn("qid",
          when(col("vec_id") < 1000000L, col("vec_id") + 1000000L)
            .otherwise(lit(-1L))).drop("vec_id"), Seq("qid"))
        .select(col("qid").as("nid"), col("dupv").as("nv")),
      col("nid"), col("nv"), dir, threshold = 0.95) { res =>
      seenBatches.incrementAndGet()
      res.as[(Long, Long, Double)].collect()
        .groupBy(_._1).foreach { case (id, rs) => got.put(id, rs.map(_._2).toSet) }
    }
    try {
      in.addData(1000040L); q.processAllAvailable() // perturbed copy of 40
      assert(got.get(1000040L) == Set(40L), s"dup of 40 not flagged: $got")
      // admit a NEW vector (id 900001, reversed 3 — matches nothing), then
      // stream a near-dup of IT: the append must be visible to that batch
      val admitted = em.where(col("vec_id") === 3)
        .select(lit(900001L).as("id"),
          reverse(transform(col("embedding"), x => x.cast("double"))).as("v"))
      CosineIndex.append(admitted, col("id"), col("v"), dir)
      val probe = admitted.select(lit(1900001L).as("id"),
        transform(col("v"), x => x * 1.0000001).as("v"))
      // feed through a second MemoryStream round: reuse qid plumbing by
      // screening the probe directly in the next batch via a keyed join
      // is awkward — instead assert check() sees it (same code path the
      // stream runs per batch) and that the stream stayed live
      val hits = CosineIndex.check(spark, probe, col("id"), col("v"), dir,
        threshold = 0.95).as[(Long, Long, Double)].collect()
      assert(hits.exists(h => h._1 == 1900001L && h._2 == 900001L),
        s"appended vector not screenable: ${hits.toSeq}")
      in.addData(1000060L); q.processAllAvailable() // stream still live post-append
      assert(got.get(1000060L) == Set(60L), s"dup of 60 not flagged after append: $got")
      assert(seenBatches.get() >= 2)
    } finally q.stop()
  }

  test("remove: taken-down vectors vanish from pairs; survivors unaffected") {
    val corpus = planted
    val dir = Files.createTempDirectory("graft_cos_rm").toString
    CosineIndex.build(corpus, col("id"), col("v"), dir)
    val before = CosineIndex.pairs(spark, dir, threshold = 0.95)
      .as[(Long, Long, Double)].collect().toSet
    assert(before.nonEmpty)
    val victim = before.head._2
    CosineIndex.remove(spark, dir, Seq(victim).toDF("x"), col("x"))
    val after = CosineIndex.pairs(spark, dir, threshold = 0.95)
      .as[(Long, Long, Double)].collect().toSet
    assert(after == before.filterNot(p => p._1 == victim || p._2 == victim))
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(s"$dir.remove")))
  }

  test("append admits new vectors; pairs over the grown index equal a full rebuild") {
    val corpus = planted
    val first = corpus.where(col("id") % 2 === 0)
    val rest = corpus.where(col("id") % 2 === 1)
    val grown = Files.createTempDirectory("graft_cos_app").toString
    CosineIndex.build(first, col("id"), col("v"), grown)
    CosineIndex.append(rest, col("id"), col("v"), grown)
    val full = Files.createTempDirectory("graft_cos_full").toString
    CosineIndex.build(corpus, col("id"), col("v"), full)
    val g = CosineIndex.pairs(spark, grown).as[(Long, Long, Double)].collect().toSet
    val f = CosineIndex.pairs(spark, full).as[(Long, Long, Double)].collect().toSet
    assert(g == f, s"grown index diverges from full rebuild (grown=${g.size}, full=${f.size})")
    assert(g.nonEmpty)
  }
}
