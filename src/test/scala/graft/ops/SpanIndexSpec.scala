package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class SpanIndexSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmp() =
    java.nio.file.Files.createTempDirectory("graft_spanidx").toString

  // corpus: two docs sharing nothing with each other
  private def corpus = Seq(
    (1L, "c1 c2 p1 p2 p3 p4 p5 c3 c4"),
    (2L, "d1 d2 d3 d4 d5 d6 d7 d8")).toDF("id", "text")

  test("build + check: incoming spans that exist in the indexed corpus") {
    val path = tmp()
    SpanIndex.build(corpus, col("id"), col("text"), path, n = 4)
    val incoming = Seq(
      (10L, "x1 p1 p2 p3 p4 p5 x2"),   // carries doc 1's p-run at pos 1..5
      (11L, "y1 y2 y3 y4 y5 y6 y7")).toDF("id", "text") // nothing indexed
    val got = SpanIndex.check(spark, incoming, col("id"), col("text"), path, n = 4)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got == Set((10L, 1L, 6L, 5L)))
  }

  test("check does not flag within-batch repetition — only standing-corpus overlap") {
    val path = tmp()
    SpanIndex.build(corpus, col("id"), col("text"), path, n = 4)
    val incoming = Seq(
      (20L, "z1 z2 z3 z4 z5 z6 z7"),
      (21L, "z1 z2 z3 z4 z5 z6 z7")).toDF("id", "text") // dup of each other, not of corpus
    assert(SpanIndex.check(spark, incoming, col("id"), col("text"), path, n = 4).count() == 0)
  }

  test("append admits a batch; later checks see its grams; compact preserves results") {
    val path = tmp()
    SpanIndex.build(corpus, col("id"), col("text"), path, n = 4)
    val batch = Seq((30L, "q1 q2 q3 q4 q5 q6")).toDF("id", "text")
    assert(SpanIndex.check(spark, batch, col("id"), col("text"), path, n = 4).count() == 0)
    for (i <- 0 until 5)
      SpanIndex.append(batch.select((col("id") + i * 100).as("id"), col("text")),
        col("id"), col("text"), path, n = 4)
    val probe = Seq((40L, "a1 q1 q2 q3 q4 q5 q6 a2")).toDF("id", "text")
    val before = SpanIndex.check(spark, probe, col("id"), col("text"), path, n = 4)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(before == Set((40L, 1L, 7L, 6L)))
    SpanIndex.compact(spark, path, filesPerTable = 2)
    val after = SpanIndex.check(spark, probe, col("id"), col("text"), path, n = 4)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(after == before)
    val files = new java.io.File(s"$path/grams").listFiles()
      .count(f => f.getName.endsWith(".parquet"))
    assert(files <= 2, s"compact left $files data files")
  }

  test("dupSpans: within-index detection equals the direct operator, incl. minDocs > 2") {
    val docs = Seq(
      (1L, "u1 u2 p1 p2 p3 p4 p5 u3 u4"),
      (2L, "v1 p1 p2 p3 p4 p5 v2 v3"),
      (3L, "u1 u2 p1 p2 p3 p4 p5 u3 u4"),
      (4L, "w1 w2 w3 w4 w1 w2 w3 w4")).toDF("id", "text")
    val path = tmp()
    SpanIndex.build(docs, col("id"), col("text"), path, n = 4)
    for (minDocs <- Seq(2, 3)) {
      val viaIndex = SpanIndex.dupSpans(spark, path, n = 4, minDocs = minDocs)
        .as[(Long, Long, Long, Long)].collect().toSet
      val direct = SpanDedup.duplicateSpans(docs, col("id"), col("text"), n = 4, minDocs = minDocs)
        .as[(Long, Long, Long, Long)].collect().toSet
      assert(viaIndex == direct, s"minDocs=$minDocs")
      assert(viaIndex.nonEmpty)
    }
  }

  test("crossSpans: two stored indexes, no text — equals check over the same docs") {
    val pathA = tmp(); val pathB = tmp()
    SpanIndex.build(corpus, col("id"), col("text"), pathA, n = 4)
    val incoming = Seq(
      (10L, "x1 p1 p2 p3 p4 p5 x2"),
      (11L, "y1 y2 y3 y4 y5 y6 y7")).toDF("id", "text")
    SpanIndex.build(incoming, col("id"), col("text"), pathB, n = 4)
    val viaIndexes = SpanIndex.crossSpans(spark, pathB, pathA, n = 4)
      .as[(Long, Long, Long, Long)].collect().toSet
    val viaText = SpanIndex.check(spark, incoming, col("id"), col("text"), pathA, n = 4)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(viaIndexes == viaText)
    assert(viaIndexes == Set((10L, 1L, 6L, 5L)))
  }

  test("scrub: incoming text rebuilt without indexed spans; clean docs pass through") {
    val path = tmp()
    SpanIndex.build(corpus, col("id"), col("text"), path, n = 4)
    val incoming = Seq(
      (60L, "x1 p1 p2 p3 p4 p5 x2"),   // indexed p-run at [1,6)
      (61L, "y1 y2 y3 y4")).toDF("id", "text")
    val got = SpanIndex.scrub(spark, incoming, col("id"), col("text"), path, n = 4)
      .as[(Long, Long, Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got(60L) == ((7L, 5L, "x1 x2")))
    assert(got(61L) == ((4L, 0L, "y1 y2 y3 y4")))
  }

  test("remove: a taken-down doc's spans stop matching; other docs' spans still do") {
    val path = tmp()
    SpanIndex.build(corpus, col("id"), col("text"), path, n = 4)
    val incoming = Seq(
      (10L, "x1 p1 p2 p3 p4 p5 x2"),     // doc 1's run
      (11L, "y1 d1 d2 d3 d4 d5 y2")).toDF("id", "text") // doc 2's run
    assert(SpanIndex.check(spark, incoming, col("id"), col("text"), path, n = 4)
      .count() == 2)
    SpanIndex.remove(spark, path, Seq(1L).toDF("x"), col("x"))
    val after = SpanIndex.check(spark, incoming, col("id"), col("text"), path, n = 4)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(after.map(_._1) == Set(11L),
      s"doc 1's spans should be gone, doc 2's intact: $after")
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(s"$path.remove")))
  }

  test("bucketed index: same results as the path index, stored side never shuffles") {
    val path = tmp()
    val table = "graft_spanidx_bucketed_test"
    SpanIndex.build(corpus, col("id"), col("text"), path, n = 4)
    SpanIndex.buildBucketed(corpus, col("id"), col("text"), table, n = 4, buckets = 8)
    try {
      val incoming = Seq(
        (10L, "x1 p1 p2 p3 p4 p5 x2"),
        (11L, "y1 d5 d6 d7 d8 y2 y3")).toDF("id", "text")
      val viaPath = SpanIndex.check(spark, incoming, col("id"), col("text"), path, n = 4)
        .as[(Long, Long, Long, Long)].collect().toSet
      val viaTable = SpanIndex.checkBucketed(spark, incoming, col("id"), col("text"), table, n = 4)
        .as[(Long, Long, Long, Long)].collect().toSet
      assert(viaTable == viaPath && viaTable.nonEmpty)

      // appended grams are picked up, still equal to the path form
      val extra = Seq((3L, "e1 e2 e3 e4 e5 e6")).toDF("id", "text")
      SpanIndex.append(extra, col("id"), col("text"), path, n = 4)
      SpanIndex.appendBucketed(extra, col("id"), col("text"), table, n = 4, buckets = 8)
      val incoming2 = Seq((12L, "w1 e1 e2 e3 e4 e5 w2")).toDF("id", "text")
      val p2 = SpanIndex.check(spark, incoming2, col("id"), col("text"), path, n = 4)
        .as[(Long, Long, Long, Long)].collect().toSet
      val t2 = SpanIndex.checkBucketed(spark, incoming2, col("id"), col("text"), table, n = 4)
        .as[(Long, Long, Long, Long)].collect().toSet
      assert(t2 == p2 && t2.nonEmpty)

      // the scale property: with broadcast off (the at-scale join shape),
      // the bucketed scan itself satisfies the join partitioning — no
      // Exchange sits between the table scan and the join
      val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val plan = SpanIndex.checkBucketed(spark, incoming, col("id"), col("text"), table, n = 4)
          .queryExecution.executedPlan.toString
        assert(plan.contains("SelectedBucketsCount") || plan.contains("Bucketed: true"),
          s"stored side not read as bucketed:\n$plan")
        // exactly ONE gram-keyed hash exchange in the join: the batch
        // side moving into the bucket layout. A second one would mean
        // the stored table is being shuffled too. (The downstream span
        // merge legitimately exchanges by doc id — not counted.)
        val gramExchanges = plan.linesIterator
          .count(l => l.contains("Exchange hashpartitioning(gram"))
        assert(gramExchanges == 1,
          s"expected 1 gram exchange (batch side only), found $gramExchanges:\n$plan")
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    } finally spark.sql(s"DROP TABLE IF EXISTS `$table`")
  }

  test("bucketed remove: equals rebuilt-from-survivors; stored side still bucket-aligned") {
    val table = "graft_spanidx_rm_test"
    val rebuilt = "graft_spanidx_rm_rebuilt"
    val extra = Seq((3L, "e1 e2 e3 e4 e5 e6")).toDF("id", "text")
    SpanIndex.buildBucketed(corpus, col("id"), col("text"), table, n = 4, buckets = 8)
    SpanIndex.appendBucketed(extra, col("id"), col("text"), table, n = 4, buckets = 8)
    try {
      val incoming = Seq(
        (10L, "x1 p1 p2 p3 p4 p5 x2"),   // doc 1's run — must vanish on removal
        (11L, "y1 d1 d2 d3 d4 d5 y2"),   // doc 2's run — must survive
        (12L, "w1 e1 e2 e3 e4 e5 w2")).toDF("id", "text") // appended doc 3's run
      assert(SpanIndex.checkBucketed(spark, incoming, col("id"), col("text"), table, n = 4)
        .as[(Long, Long, Long, Long)].collect().map(_._1).toSet == Set(10L, 11L, 12L))

      SpanIndex.removeBucketed(spark, table, Seq(1L).toDF("x"), col("x"))

      // parity: the post-remove index answers exactly like one built
      // fresh from the survivors (docs 2 and 3)
      SpanIndex.buildBucketed(corpus.where(col("id") =!= 1L).union(extra),
        col("id"), col("text"), rebuilt, n = 4, buckets = 8)
      val afterRemove = SpanIndex.checkBucketed(spark, incoming, col("id"), col("text"), table, n = 4)
        .as[(Long, Long, Long, Long)].collect().toSet
      val fresh = SpanIndex.checkBucketed(spark, incoming, col("id"), col("text"), rebuilt, n = 4)
        .as[(Long, Long, Long, Long)].collect().toSet
      assert(afterRemove == fresh && afterRemove.map(_._1) == Set(11L, 12L),
        s"post-remove $afterRemove != rebuilt $fresh")
      // the crash-window temp table was cleaned up by the rename
      assert(!spark.catalog.tableExists(s"${table}__removing"))

      // the scale property holds through the remove rewrite: stored side
      // reads straight from buckets, one gram exchange (batch side only)
      val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val plan = SpanIndex.checkBucketed(spark, incoming, col("id"), col("text"), table, n = 4)
          .queryExecution.executedPlan.toString
        assert(plan.contains("SelectedBucketsCount") || plan.contains("Bucketed: true"),
          s"stored side not read as bucketed after remove:\n$plan")
        val gramExchanges = plan.linesIterator
          .count(l => l.contains("Exchange hashpartitioning(gram"))
        assert(gramExchanges == 1,
          s"expected 1 gram exchange after remove, found $gramExchanges:\n$plan")
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)

      // guard: removeBucketed refuses a non-bucketed table
      spark.range(1).selectExpr("id", "CAST(id AS STRING) AS gram")
        .write.mode("overwrite").format("parquet").saveAsTable("graft_spanidx_flat")
      try assertThrows[IllegalArgumentException] {
        SpanIndex.removeBucketed(spark, "graft_spanidx_flat", Seq(1L).toDF("x"), col("x"))
      } finally spark.sql("DROP TABLE IF EXISTS graft_spanidx_flat")
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS `$table`")
      spark.sql(s"DROP TABLE IF EXISTS `$rebuilt`")
      spark.sql(s"DROP TABLE IF EXISTS `${table}__removing`")
    }
  }

  test("screenStream: micro-batches screen against the standing index") {
    val path = tmp()
    SpanIndex.build(corpus, col("id"), col("text"), path, n = 4)
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[(Long, String)]
    val collected = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long, Long, Long)]()
    val q = SpanIndex.screenStream(spark,
      source.toDF().toDF("id", "text"), col("id"), col("text"), path, n = 4) { out =>
      out.as[(Long, Long, Long, Long)].collect().foreach(collected.add)
    }
    try {
      source.addData((50L, "m1 p1 p2 p3 p4 m2"))
      q.processAllAvailable()
      source.addData((51L, "d1 d2 d3 d4 d5 n1"))
      q.processAllAvailable()
    } finally q.stop()
    val got = collected.toArray.map(_.asInstanceOf[(Long, Long, Long, Long)]).toSet
    assert(got == Set((50L, 1L, 5L, 4L), (51L, 0L, 5L, 5L)))
  }
}
