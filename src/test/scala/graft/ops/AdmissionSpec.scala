package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.core.{Catalog, TempDirs}

class AdmissionSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def docsDF(rows: (Long, String, String)*): DataFrame =
    rows.toDF("doc_id", "source", "text")

  private val bench = Seq((9000L, "bench", "one two three four")).toDF("doc_id", "source", "text")

  private def folds: Seq[(String, (DataFrame, DataFrame) => DataFrame)] = Seq(
    "fps" -> ((cur, b) => cur.unionByName(b.select(col("__fp").as("fp"))).distinct()),
    "stats" -> ((cur, b) => cur.unionByName(
        b.groupBy(col("source")).agg(count(lit(1)).as("n_docs")))
      .groupBy(col("source")).agg(sum(col("n_docs")).as("n_docs"))))

  private def initCatalog(): String = {
    val p = TempDirs.create("admission_spec")
    val empty = docsDF()
    Catalog.init(p, Map(
      "fps" -> empty.select(TextAnalysis.fingerprint(col("text")).as("fp")),
      "stats" -> empty.groupBy(col("source")).agg(count(lit(1)).as("n_docs"))))
    p
  }

  private def admittedIds(base: String, batch: DataFrame): Set[Long] =
    Admission.screen(spark, base, "fps", batch, col("doc_id"), col("text"),
      bench, col("doc_id"), col("text"), n = 3, threshold = 0.3)
      .select("doc_id").as[Long].collect().toSet

  test("screen: in-batch dups, cross-batch dups, and contaminated docs are rejected") {
    val base = initCatalog()
    val b1 = docsDF(
      (1L, "s0", "alpha beta gamma delta"),
      (2L, "s0", "alpha beta gamma delta"),    // in-batch dup of 1 (higher id loses)
      (3L, "s1", "zz one two three four zz"))  // contains 100% of bench's 3-grams
    val a1 = Admission.screen(spark, base, "fps", b1, col("doc_id"), col("text"),
      bench, col("doc_id"), col("text"), n = 3, threshold = 0.3)
    assert(a1.select("doc_id").as[Long].collect().toSet == Set(1L))
    Admission.ingest(spark, base, 0L, a1, folds)
    assert(Catalog.lastBatch(spark, base) == 0L)
    // batch 2: a cross-batch dup of doc 1 must be rejected against the
    // STANDING store; fresh content passes
    val b2 = docsDF(
      (4L, "s0", "alpha beta gamma delta"),
      (5L, "s1", "fresh unique content entirely new"))
    assert(admittedIds(base, b2) == Set(5L))
  }

  test("ingest: admitted rows land in every store; replays are no-ops; empty batches fold cleanly") {
    val base = initCatalog()
    val b1 = docsDF((1L, "s0", "alpha beta gamma delta"),
      (2L, "s1", "epsilon zeta eta theta"))
    val a1 = Admission.screen(spark, base, "fps", b1, col("doc_id"), col("text"),
      bench, col("doc_id"), col("text"))
    Admission.ingest(spark, base, 0L, a1, folds)
    def stats = Catalog.read(spark, base, "stats").as[(String, Long)].collect().toMap
    assert(stats == Map("s0" -> 1L, "s1" -> 1L))
    assert(Catalog.read(spark, base, "fps").count() == 2)
    // replay of batch 0 with DIFFERENT content: ledger no-op
    Admission.ingest(spark, base, 0L,
      Admission.screen(spark, base, "fps",
        docsDF((9L, "s9", "should never land")), col("doc_id"), col("text"),
        bench, col("doc_id"), col("text")), folds)
    assert(stats == Map("s0" -> 1L, "s1" -> 1L))
    // an all-rejected batch folds as zero rows without erroring
    val a2 = Admission.screen(spark, base, "fps",
      docsDF((7L, "s0", "alpha beta gamma delta")), col("doc_id"), col("text"),
      bench, col("doc_id"), col("text"))
    Admission.ingest(spark, base, 1L, a2, folds)
    assert(Catalog.lastBatch(spark, base) == 1L)
    assert(stats == Map("s0" -> 1L, "s1" -> 1L))
  }

  test("takedown: Admission.retractFolds subtracts a source from every store atomically; its content re-admits") {
    val p = TempDirs.create("admission_retract")
    val empty = docsDF()
    Catalog.init(p, Map(
      "fps" -> empty.select(TextAnalysis.fingerprint(col("text")).as("fp")),
      "stats" -> empty.groupBy(col("source")).agg(count(lit(1)).as("n_docs"),
        sum(TextAnalysis.tokenCount(col("text"))).as("n_tokens")),
      "docs" -> empty.select(col("doc_id"), col("source"),
        TextAnalysis.fingerprint(col("text")).as("fp"),
        TextAnalysis.tokenCount(col("text")).as("n_tokens"))))
    val foldsL: Seq[(String, (DataFrame, DataFrame) => DataFrame)] = Seq(
      "fps" -> ((cur, b) => cur.unionByName(b.select(col("__fp").as("fp"))).distinct()),
      "stats" -> ((cur, b) => cur.unionByName(
          b.groupBy(col("source")).agg(count(lit(1)).as("n_docs"),
            sum(TextAnalysis.tokenCount(col("text"))).as("n_tokens")))
        .groupBy(col("source")).agg(sum(col("n_docs")).as("n_docs"),
          sum(col("n_tokens")).as("n_tokens"))),
      "docs" -> ((cur, b) => cur.unionByName(b.select(col("doc_id"), col("source"),
        col("__fp").as("fp"), TextAnalysis.tokenCount(col("text")).as("n_tokens")))))
    Admission.ingest(spark, p, 0L, Admission.screen(spark, p, "fps",
      docsDF((1L, "s0", "alpha beta gamma delta"),
        (2L, "s1", "epsilon zeta eta theta")),
      col("doc_id"), col("text"), bench, col("doc_id"), col("text")), foldsL)
    // the retraction ticket comes FROM the lineage store; the folds
    // come from the library (no vocab store in this catalog)
    val ticket = Catalog.read(spark, p, "docs").where(col("source") === "s0")
    Catalog.ingest(spark, p, 1L, ticket,
      Admission.retractFolds(vocab = Seq.empty))
    assert(Catalog.read(spark, p, "stats").as[(String, Long, Long)].collect().toList
      == List(("s1", 1L, 4L)), "the zero-doc source row is dropped, not left at 0")
    assert(Catalog.read(spark, p, "docs").count() == 1)
    assert(Catalog.read(spark, p, "fps").count() == 1)
    // the retracted fingerprint is gone, so the SAME text re-admits
    assert(admittedIds(p, docsDF((9L, "s0", "alpha beta gamma delta"))) == Set(9L))
  }

  test("screen with a standing-side Bloom prefilter: identical result, standing side broadcasts") {
    val base = initCatalog()
    Admission.ingest(spark, base, 0L, Admission.screen(spark, base, "fps",
      docsDF((1L, "s0", "alpha beta gamma delta"),
        (2L, "s1", "epsilon zeta eta theta")),
      col("doc_id"), col("text"), bench, col("doc_id"), col("text")), folds)
    val b2 = docsDF(
      (4L, "s0", "alpha beta gamma delta"),      // standing dup
      (5L, "s1", "epsilon zeta eta theta"),      // standing dup
      (6L, "s1", "fresh unique content entirely new"))
    def ids(df: DataFrame) = df.select("doc_id").as[Long].collect().toSet
    val plain = Admission.screen(spark, base, "fps", b2, col("doc_id"),
      col("text"), bench, col("doc_id"), col("text"))
    val pre = Admission.screen(spark, base, "fps", b2, col("doc_id"),
      col("text"), bench, col("doc_id"), col("text"),
      standingBloomFpp = Some(0.01))
    assert(ids(pre) == ids(plain) && ids(pre) == Set(6L),
      "the Bloom prefilter must not change the admitted set")
    // the scale contract: with auto-broadcast off, the plain form sort-
    // merges the standing anti join, the prefiltered form broadcasts it
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      def antiJoins(df: DataFrame) = df.queryExecution.executedPlan.toString
        .linesIterator.filter(_.contains("LeftAnti")).toSeq
      assert(antiJoins(Admission.screen(spark, base, "fps", b2, col("doc_id"),
          col("text"), bench, col("doc_id"), col("text"),
          standingBloomFpp = Some(0.01)))
        .exists(_.contains("BroadcastHashJoin")),
        "prefiltered standing side must broadcast")
      assert(!antiJoins(Admission.screen(spark, base, "fps", b2, col("doc_id"),
          col("text"), bench, col("doc_id"), col("text")))
        .exists(_.contains("BroadcastHashJoin")),
        "sanity: without the prefilter nothing forces the broadcast")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("audit: every row carries a verdict, and the admitted slice is row-for-row screen()") {
    val base = initCatalog()
    val b1 = docsDF((1L, "s0", "alpha beta gamma delta"))
    Admission.ingest(spark, base, 0L,
      Admission.screen(spark, base, "fps", b1, col("doc_id"), col("text"),
        bench, col("doc_id"), col("text")), folds)
    val b2 = docsDF(
      (4L, "s0", "alpha beta gamma delta"),     // dup_standing (batch 0 holds it)
      (5L, "s1", "brand new text here today"),  // admitted
      (6L, "s1", "brand new text here today"),  // dup_in_batch (5 wins the tie)
      (7L, "s1", "zz one two three four zz"))   // contaminated vs bench
    val a = Admission.audit(spark, base, "fps", b2, col("doc_id"), col("text"),
      bench, col("doc_id"), col("text"))
    assert(a.count() == 4, "audit must return every batch row")
    val verdicts = a.select(col("doc_id"), col("reason"))
      .as[(Long, Option[String])].collect().toMap
    assert(verdicts == Map(4L -> Some("dup_standing"), 5L -> None,
      6L -> Some("dup_in_batch"), 7L -> Some("contaminated")))
    val screened = Admission.screen(spark, base, "fps", b2, col("doc_id"),
        col("text"), bench, col("doc_id"), col("text"))
      .select("doc_id").as[Long].collect().toSet
    assert(a.where(col("admitted")).select("doc_id").as[Long].collect().toSet
      == screened)
  }

  test("ingestStream: each trigger screens against the store grown by the previous one; restart resumes batch ids") {
    val base = initCatalog()
    val stage = TempDirs.create("admission_stream_replay")
    val ckpt = TempDirs.create("admission_stream_ckpt")
    // phase A, two slices by doc_id: slice 0 = docs 1,2 (2 an in-batch
    // dup of 1), slice 1 = docs 3 (CROSS-batch dup of 1 — must be
    // rejected against the store as grown by trigger 0) and 4 (fresh)
    val phaseA = docsDF(
      (1L, "s0", "alpha beta gamma delta"),
      (2L, "s0", "alpha beta gamma delta"),
      (3L, "s1", "alpha beta gamma delta"),
      (4L, "s1", "epsilon zeta eta theta"))
    graft.streaming.Replay.writeOrderedSlices(phaseA, col("doc_id"), stage, 2)
    def startIngest() = Admission.ingestStream(spark, base, "fps",
      graft.streaming.Replay.orderedStream(spark, stage, phaseA.schema),
      col("doc_id"), col("text"), bench, col("doc_id"), col("text"),
      folds, checkpoint = Some(ckpt))
    val q1 = startIngest()
    try q1.processAllAvailable() finally q1.stop()
    assert(Catalog.lastBatch(spark, base) == 1L)
    def stats = Catalog.read(spark, base, "stats")
      .as[(String, Long)].collect().toMap
    assert(stats == Map("s0" -> 1L, "s1" -> 1L))
    assert(Catalog.read(spark, base, "fps").count() == 2)
    // phase B arrives while the query is DOWN: a cross-RESTART dup of
    // doc 4, one fresh doc, one contaminated doc. The durable
    // checkpoint restart continues at batch id 2 and the standing
    // store carries the phase-A fingerprints across the restart.
    graft.streaming.Replay.appendSlice(stage, docsDF(
      (5L, "s0", "epsilon zeta eta theta"),
      (6L, "s1", "fresh unique content entirely new"),
      (7L, "s1", "zz one two three four zz")), 2)
    val q2 = startIngest()
    try q2.processAllAvailable() finally q2.stop()
    assert(Catalog.lastBatch(spark, base) == 2L)
    assert(stats == Map("s0" -> 1L, "s1" -> 2L))
    assert(Catalog.read(spark, base, "fps").count() == 3)
  }
}
