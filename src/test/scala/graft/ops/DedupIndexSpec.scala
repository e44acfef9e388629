package graft.ops

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.sources.Tables

class DedupIndexSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("batch check finds near-dups of indexed docs, passes clean docs") {
    val docs = Tables(spark, sf).documents
    val dir = Files.createTempDirectory("graft_dedup_idx").toString
    DedupIndex.build(docs, col("doc_id"), col("text"), dir)

    // new batch: an exact copy of indexed doc 7, a perturbed copy of doc
    // 11 (one appended token), and a clean unrelated doc
    val doc7 = docs.where(col("doc_id") === 7).select("text").as[String].head()
    val doc11 = docs.where(col("doc_id") === 11).select("text").as[String].head()
    val incoming = Seq(
      (1007L, doc7),
      (1011L, doc11 + " appended"),
      (9999L, (1 to 60).map(i => s"novel$i").mkString(" "))).toDF("nid", "t")

    val hits = DedupIndex.check(spark, incoming, col("nid"), col("t"), dir, threshold = 0.5)
      .as[(Long, Long, Double)].collect()
    val byNew = hits.groupBy(_._1)
    assert(byNew.contains(1007L) && byNew(1007L).exists(h => h._2 == 7L && h._3 == 1.0))
    assert(byNew.contains(1011L) && byNew(1011L).exists(h => h._2 == 11L && h._3 > 0.8))
    assert(!byNew.contains(9999L), s"clean doc flagged: ${byNew.get(9999L)}")
    // no duplicate (new, dup) pairs despite multi-band collisions
    assert(hits.map(h => (h._1, h._2)).distinct.length == hits.length)
  }

  test("build scans corpus text once; bands derive from the stored shingles") {
    val docs = Tables(spark, sf).documents
    val dir = Files.createTempDirectory("graft_dedup_scan").toString
    val plans = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(f: String, qe: org.apache.spark.sql.execution.QueryExecution,
                             d: Long): Unit = plans.add(qe.executedPlan.toString)
      override def onFailure(f: String, qe: org.apache.spark.sql.execution.QueryExecution,
                             e: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      DedupIndex.build(docs, col("doc_id"), col("text"), dir)
      // listener events are async — wait for both write plans to land
      val deadline = System.nanoTime() + 10L * 1000 * 1000 * 1000
      def mine = plans.toArray(Array.empty[String]).filter(_.contains(dir))
      while (mine.length < 2 && System.nanoTime() < deadline) Thread.sleep(100)
      val writes = mine
      assert(writes.length == 2, s"expected 2 index writes, saw ${writes.length}")
      val corpusScans = writes.count(_.contains("documents.parquet"))
      assert(corpusScans == 1,
        s"corpus text must be scanned exactly once at build, saw $corpusScans scans")
      val bandsWrite = writes.find(_.contains(s"$dir/bands")).get
      assert(bandsWrite.contains(s"$dir/shingles") && !bandsWrite.contains("documents.parquet"),
        "bands write must read the stored shingles, not the corpus")
    } finally spark.listenerManager.unregister(listener)
  }

  test("index-backed pairs equal the direct minhashLsh operator (q37 params)") {
    val docs = Tables(spark, sf).documents
    val dir = Files.createTempDirectory("graft_dedup_pairs").toString
    DedupIndex.build(docs, col("doc_id"), col("text"), dir,
      shingleN = 3, numHashes = 32, bands = 16, rowsPerBand = 2)
    val fromIndex = DedupIndex.pairs(spark, dir, threshold = 0.4)
      .as[(Long, Long, Double)].collect().toSet
    val direct = Dedup.minhashLsh(docs, col("doc_id"), col("text"),
        shingleN = 3, numHashes = 32, bands = 16, rowsPerBand = 2, threshold = 0.4)
      .as[(Long, Long, Double)].collect().toSet
    assert(fromIndex == direct,
      s"index pairs diverge from direct operator (index=${fromIndex.size}, direct=${direct.size})")
    assert(fromIndex.nonEmpty, "vacuous comparison: no near-dup pairs at sf0.001")
  }

  test("duplicate groups straight from the standing index (pairs -> clusters)") {
    // the full dedup-group path with NO corpus re-read: the persisted
    // signature index yields pairs, connected components merges them into
    // groups whose transitive structure matches a driver-side closure
    val docs = Tables(spark, sf).documents
    val dir = Files.createTempDirectory("graft_dedup_cc").toString
    DedupIndex.build(docs, col("doc_id"), col("text"), dir,
      shingleN = 3, numHashes = 32, bands = 16, rowsPerBand = 2)
    val pairs = DedupIndex.pairs(spark, dir, threshold = 0.4)
    val got = Clusters.connectedComponents(pairs, col("id_a"), col("id_b"))
      .as[(Long, Long)].collect().toMap
    // driver-side union-find over the same pairs
    val edges = pairs.select("id_a", "id_b").as[(Long, Long)].collect()
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = { val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r } }
    for ((a, b) <- edges) parent(find(a)) = find(b)
    val roots = parent.keys.map(k => k -> find(k)).toMap
    val want = roots.map { case (k, r) =>
      k -> roots.collect { case (k2, r2) if r2 == r => k2 }.min }
    assert(got == want, s"clusters diverge (got=${got.size}, want=${want.size})")
    assert(got.nonEmpty)
  }

  test("append admits new docs; pairs over the grown index equal a full rebuild") {
    val docs = Tables(spark, sf).documents
    val first = docs.where(col("doc_id") % 2 === 0)
    val rest = docs.where(col("doc_id") % 2 === 1)
    val grown = Files.createTempDirectory("graft_dedup_app").toString
    DedupIndex.build(first, col("doc_id"), col("text"), grown,
      shingleN = 3, numHashes = 32, bands = 16, rowsPerBand = 2)
    DedupIndex.append(rest, col("doc_id"), col("text"), grown,
      shingleN = 3, numHashes = 32, bands = 16, rowsPerBand = 2)
    val full = Files.createTempDirectory("graft_dedup_full").toString
    DedupIndex.build(docs, col("doc_id"), col("text"), full,
      shingleN = 3, numHashes = 32, bands = 16, rowsPerBand = 2)
    val g = DedupIndex.pairs(spark, grown, threshold = 0.4)
      .as[(Long, Long, Double)].collect().toSet
    val f = DedupIndex.pairs(spark, full, threshold = 0.4)
      .as[(Long, Long, Double)].collect().toSet
    assert(g == f, s"grown index diverges from full rebuild (grown=${g.size}, full=${f.size})")
  }

  test("crossPairs between two standing indexes equals the direct cross-corpus join") {
    val docs = Tables(spark, sf).documents
    val a = docs.where(col("doc_id") % 2 === 0)
    val b = docs.where(col("doc_id") % 2 === 1)
    val dirA = Files.createTempDirectory("graft_dedup_xa").toString
    val dirB = Files.createTempDirectory("graft_dedup_xb").toString
    DedupIndex.build(a, col("doc_id"), col("text"), dirA,
      shingleN = 3, numHashes = 32, bands = 16, rowsPerBand = 2)
    DedupIndex.build(b, col("doc_id"), col("text"), dirB,
      shingleN = 3, numHashes = 32, bands = 16, rowsPerBand = 2)
    val fromIndexes = DedupIndex.crossPairs(spark, dirA, dirB, threshold = 0.5)
      .as[(Long, Long, Double)].collect().toSet
    val direct = Dedup.minhashLshJoin(a, col("doc_id"), col("text"),
        b, col("doc_id"), col("text"),
        shingleN = 3, numHashes = 32, bands = 16, rowsPerBand = 2, threshold = 0.5)
      .as[(Long, Long, Double)].collect().toSet
    assert(fromIndexes == direct,
      s"index cross pairs diverge (index=${fromIndexes.size}, direct=${direct.size})")
    assert(fromIndexes.nonEmpty, "vacuous: no cross pairs at sf0.001")
  }

  test("compact: N appends then compact — identical pairs/check, file count bounded") {
    val docs = Tables(spark, sf).documents
    val dir = Files.createTempDirectory("graft_dedup_cmp").toString
    DedupIndex.build(docs.where(col("doc_id") % 5 === 0),
      col("doc_id"), col("text"), dir,
      shingleN = 3, numHashes = 32, bands = 16, rowsPerBand = 2)
    for (r <- 1 to 4) // continuous ingestion: small batches pile up files
      DedupIndex.append(docs.where(col("doc_id") % 5 === r),
        col("doc_id"), col("text"), dir,
        shingleN = 3, numHashes = 32, bands = 16, rowsPerBand = 2)
    def parquetFiles(sub: String): Long =
      java.nio.file.Files.list(java.nio.file.Paths.get(s"$dir/$sub")).filter(
        p => p.getFileName.toString.startsWith("part-")).count()
    val before = DedupIndex.pairs(spark, dir, threshold = 0.4)
      .as[(Long, Long, Double)].collect().toSet
    val doc3 = docs.where(col("doc_id") === 3).select("text").as[String].head()
    val checkBefore = DedupIndex.check(spark,
        Seq((5003L, doc3)).toDF("nid", "t"), col("nid"), col("t"), dir,
        threshold = 0.5, shingleN = 3, numHashes = 32, bands = 16, rowsPerBand = 2)
      .as[(Long, Long, Double)].collect().toSet
    val filesBefore = parquetFiles("shingles") + parquetFiles("bands")
    DedupIndex.compact(spark, dir, filesPerTable = 2)
    val filesAfter = parquetFiles("shingles") + parquetFiles("bands")
    assert(filesAfter <= 4, s"compaction left $filesAfter files")
    assert(filesAfter < filesBefore,
      s"compaction did not shrink file count ($filesBefore -> $filesAfter)")
    val after = DedupIndex.pairs(spark, dir, threshold = 0.4)
      .as[(Long, Long, Double)].collect().toSet
    assert(after == before, s"pairs changed across compaction " +
      s"(before=${before.size}, after=${after.size})")
    val checkAfter = DedupIndex.check(spark,
        Seq((5003L, doc3)).toDF("nid", "t"), col("nid"), col("t"), dir,
        threshold = 0.5, shingleN = 3, numHashes = 32, bands = 16, rowsPerBand = 2)
      .as[(Long, Long, Double)].collect().toSet
    assert(checkAfter == checkBefore && checkAfter.exists(_._2 == 3L))
    // the swap left no residue
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(s"$dir.old")))
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(s"$dir.compact")))
  }

  test("remove: taken-down docs vanish from pairs and checks; survivors unaffected") {
    val docs = Tables(spark, sf).documents
    val dir = Files.createTempDirectory("graft_dedup_rm").toString
    DedupIndex.build(docs, col("doc_id"), col("text"), dir)
    val before = DedupIndex.pairs(spark, dir, threshold = 0.4)
      .as[(Long, Long, Double)].collect().toSet
    assert(before.nonEmpty)
    val victim = before.head._1
    DedupIndex.remove(spark, dir, Seq(victim).toDF("x"), col("x"))
    val after = DedupIndex.pairs(spark, dir, threshold = 0.4)
      .as[(Long, Long, Double)].collect().toSet
    assert(after == before.filterNot(p => p._1 == victim || p._2 == victim),
      "remove changed pairs beyond the victim's")
    // a copy of the removed doc now screens clean; swap hygiene holds
    val victimText = docs.where(col("doc_id") === victim)
      .select("text").as[String].head()
    val hits = DedupIndex.check(spark,
        Seq((555000L, victimText)).toDF("nid", "t"), col("nid"), col("t"), dir,
        threshold = 0.5)
      .as[(Long, Long, Double)].collect()
    assert(!hits.exists(_._2 == victim), s"removed doc still matchable: ${hits.toSeq}")
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(s"$dir.remove")))
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(s"$dir.old")))
  }

  test("bucketed index: check/remove/compact equal the path form, stored side never shuffles") {
    val docs = Tables(spark, sf).documents
    val dir = Files.createTempDirectory("graft_dedup_bkt").toString
    val base = "graft_dedupidx_bucketed_test"
    DedupIndex.build(docs, col("doc_id"), col("text"), dir)
    DedupIndex.buildBucketed(docs, col("doc_id"), col("text"), base, buckets = 8)
    try {
      val doc7 = docs.where(col("doc_id") === 7).select("text").as[String].head()
      val incoming = Seq(
        (1007L, doc7),
        (9999L, (1 to 60).map(i => s"novel$i").mkString(" "))).toDF("nid", "t")
      def viaPath = DedupIndex.check(spark, incoming, col("nid"), col("t"), dir,
        threshold = 0.5).as[(Long, Long, Double)].collect().toSet
      def viaTable = DedupIndex.checkBucketed(spark, incoming, col("nid"), col("t"),
        base, threshold = 0.5).as[(Long, Long, Double)].collect().toSet
      assert(viaTable == viaPath && viaTable.nonEmpty)

      // appended docs are picked up, still equal to the path form
      val extra = Seq((500L, doc7 + " grown")).toDF("nid", "t")
      DedupIndex.append(extra, col("nid"), col("t"), dir)
      DedupIndex.appendBucketed(extra, col("nid"), col("t"), base, buckets = 8)
      assert(viaTable == viaPath && viaTable.exists(_._2 == 500L))

      // the scale property: with broadcast off (the at-scale join shape),
      // both stored tables are read as bucketed scans and the only hash
      // exchanges carry BATCH-derived frames — the candidate join's
      // (band, bucket) exchange and the verify join's id-side exchange
      // move batch data into the stored layout, never the reverse
      val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val plan = DedupIndex.checkBucketed(spark, incoming, col("nid"), col("t"),
          base, threshold = 0.5).queryExecution.executedPlan.toString
        assert(plan.contains("SelectedBucketsCount") || plan.contains("Bucketed: true"),
          s"stored side not read as bucketed:\n$plan")
        val bandExchanges = plan.linesIterator
          .count(l => l.contains("Exchange hashpartitioning(band"))
        val idExchanges = plan.linesIterator
          .count(l => l.contains("Exchange hashpartitioning(dup_id"))
        assert(bandExchanges == 1 && idExchanges <= 1,
          s"stored side shuffled: band=$bandExchanges id=$idExchanges:\n$plan")
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)

      // takedown mirrors the path form
      DedupIndex.remove(spark, dir, Seq(7L).toDF("x"), col("x"))
      DedupIndex.removeBucketed(spark, base, Seq(7L).toDF("x"), col("x"), buckets = 8)
      assert(viaTable == viaPath && !viaTable.exists(_._2 == 7L))

      // compaction is row-identical and keeps the layout
      DedupIndex.compactBucketed(spark, base, buckets = 8)
      assert(viaTable == viaPath)
      val planAfter = DedupIndex.checkBucketed(spark, incoming, col("nid"), col("t"),
        base, threshold = 0.5).queryExecution.executedPlan.toString
      assert(planAfter.contains("SelectedBucketsCount") || planAfter.contains("Bucketed: true"))
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS `${base}_shingles`")
      spark.sql(s"DROP TABLE IF EXISTS `${base}_bands`")
      spark.sql(s"DROP TABLE IF EXISTS `${base}_shingles_tmp`")
      spark.sql(s"DROP TABLE IF EXISTS `${base}_bands_tmp`")
    }
  }

  test("streaming screen: micro-batches checked against the static index") {
    implicit val ctx = spark.sqlContext
    val docs = Tables(spark, sf).documents
    val dir = Files.createTempDirectory("graft_dedup_idx_s").toString
    DedupIndex.build(docs, col("doc_id"), col("text"), dir)

    val doc3 = docs.where(col("doc_id") === 3).select("text").as[String].head()
    val in = MemoryStream[(Long, String)]
    val collected = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long)]()
    val q = DedupIndex.screenStream(spark, in.toDF().toDF("nid", "t"),
        col("nid"), col("t"), dir, threshold = 0.5) { pairs =>
      pairs.select("new_id", "dup_id").as[(Long, Long)].collect()
        .foreach(collected.add)
    }
    try {
      in.addData((2003L, doc3), (8888L, (1 to 50).map(i => s"fresh$i").mkString(" ")))
      q.processAllAvailable()
      in.addData((3003L, doc3 + " tail"))
      q.processAllAvailable()
      val hits = collected.toArray.map(_.asInstanceOf[(Long, Long)]).toSet
      assert(hits.contains((2003L, 3L)), s"got $hits")
      assert(hits.contains((3003L, 3L)), s"got $hits")
      assert(!hits.exists(_._1 == 8888L), s"clean doc flagged: $hits")
    } finally q.stop()
  }
}
