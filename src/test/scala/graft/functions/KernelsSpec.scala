package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class KernelsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("rolling fingerprint: shift-invariant for shared runs, content-sensitive") {
    val df = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta"),
      (2L, "PREFIX alpha beta gamma delta epsilon zeta eta"), // shifted copy
      (3L, "totally different words in this one here")).toDF("id", "t")
      .select(col("id"), graft.ops.TextAnalysis.rollingFingerprint(col("t"), 5).as("fp"))
    val m = df.as[(Long, Long)].collect().toMap
    // the 5-token min-window hash survives a prefix shift when the minimal
    // window lies in the shared suffix — and doc 3 shares nothing
    assert(m(1L) == m(2L) || m(2L) != m(3L))
    assert(m(1L) != m(3L))
  }

  test("Tokens kernel is exactly the filter(split(lower)) formulation (property)") {
    // the kernel replaced the higher-order-function stack for codegen;
    // semantics must be bit-identical on adversarial inputs — unicode,
    // ascii/unicode whitespace, empties, case-folding edge cases
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val piece = Gen.oneOf(
      Gen.alphaNumStr.map(_.take(8)),
      Gen.oneOf(" ", "\t", "\n", "\r", "\f", "  ", " \t\n"),
      Gen.oneOf("Ünïcödé", "ΣΊΣΥΦΟΣ", "İstanbul", "ß", "straße", "中文 词语", " ", ""))
    val gen = Gen.listOfN(12, piece).map(_.mkString)
    val samples = (0 until 300).flatMap(i => gen.apply(Gen.Parameters.default, Seed(i))) :+
      "" :+ " " :+ "  " :+ "a b"
    val df = samples.toDF("t")
    val both = df.select(
      graft.functions.Kernels.graft_tokens(col("t")).as("kernel"),
      filter(split(lower(col("t")), "\\s+"), x => length(x) > 0).as("hof"))
    val mismatches = both.where(not(col("kernel") === col("hof"))).count()
    assert(mismatches == 0, {
      val bad = both.where(not(col("kernel") === col("hof"))).take(3).toSeq
      s"kernel diverges from HOF formulation: $bad"
    })
  }

  test("nfc_normalize: composes decomposed sequences, idempotent, ASCII passthrough") {
    val rows = Seq(
      "café",          // e + combining acute -> é
      "naïve",         // i + combining diaeresis -> ï
      "café",           // already composed
      "plain ascii text",
      "Å")        // A + ring -> Å
      .zipWithIndex.map(_.swap)
    val got = rows.toDF("i", "t")
      .select(col("i"), graft.functions.Kernels.nfc_normalize(col("t")).as("n"))
      .as[(Int, String)].collect().toMap
    val want = rows.map { case (i, t) =>
      i -> java.text.Normalizer.normalize(t, java.text.Normalizer.Form.NFC) }.toMap
    assert(got == want)
    assert(got(0) == "café" && got(0).length == 4)
    assert(got(4) == "Å")
    // idempotent: normalizing the normalized form changes nothing
    val twice = rows.toDF("i", "t").select(col("i"),
        graft.functions.Kernels.nfc_normalize(
          graft.functions.Kernels.nfc_normalize(col("t"))).as("n"))
      .as[(Int, String)].collect().toMap
    assert(twice == want)
  }

  test("nfkc_normalize: compatibility folds on top of composition") {
    // ﬁ ligature -> fi, superscript two -> 2, and canonical composition
    val rows = Seq((0, "ﬁle ² café"))
    val got = rows.toDF("i", "t")
      .select(graft.functions.Kernels.nfkc_normalize(col("t")))
      .as[String].collect().head
    assert(got == "file 2 café")
    // NFC alone must NOT fold compatibility characters
    val nfcOnly = rows.toDF("i", "t")
      .select(graft.functions.Kernels.nfc_normalize(col("t")))
      .as[String].collect().head
    assert(nfcOnly == "ﬁle ² café")
  }

  test("sorted_intersect_count == size(array_intersect) on sorted distinct arrays (property)") {
    // the q233 verify contract: on the frames jaccardJoin builds
    // (sort_array'd distinct string arrays) the merge kernel must equal
    // array_intersect's cardinality exactly — randomized across sizes,
    // overlaps, empties, and non-ASCII so the UTF8String binary-order
    // merge is held to sort_array's own ordering
    val rnd = new scala.util.Random(17)
    val vocab = Seq.tabulate(50)(i => s"w$i") ++ Seq("ü", "é", "ß", "zéta", "")
    val rows = Seq.tabulate(300) { i =>
      val a = rnd.shuffle(vocab).take(rnd.nextInt(vocab.size)).filter(_.nonEmpty)
      val b = rnd.shuffle(vocab).take(rnd.nextInt(vocab.size)).filter(_.nonEmpty)
      (i.toLong, a, b)
    } :+ ((300L, Seq.empty[String], Seq("w1")))
    val df = rows.toDF("id", "a", "b")
      .select(col("id"), sort_array(array_distinct(col("a"))).as("a"),
        sort_array(array_distinct(col("b"))).as("b"))
    val got = df.select(col("id"),
        graft.functions.Kernels.sorted_intersect_count(col("a"), col("b")).as("m"),
        size(array_intersect(col("a"), col("b"))).cast("long").as("ref"))
      .as[(Long, Long, Long)].collect()
    got.foreach { case (id, m, ref) => assert(m == ref, s"row $id") }
  }

  test("kernels usable from SQL via GraftExtensions") {
    // GraftSession builds with .withExtensions(new GraftExtensions), so
    // the SQL functions are present on the shared test session
    Seq(("the quick brown fox", 1)).toDF("t", "i").createOrReplaceTempView("kern_t")
    val out = spark.sql(
      """SELECT simhash64(split(t, ' ')) AS sh,
        |       cosine_similarity(array(1.0D, 0.0D), array(1.0D, 0.0D)) AS cs,
        |       word_shingles(split(t, ' '), 2) AS ws,
        |       rolling_fingerprint(split(t, ' '), 2) AS rf,
        |       rolling_hashes(split(t, ' '), 2) AS rh,
        |       nfc_normalize('cafe' || '́') AS nfc
        |FROM kern_t""".stripMargin)
    val r = out.collect().head
    assert(r.getLong(0) != 0L)
    assert(r.getDouble(1) == 1.0)
    assert(r.getSeq[String](2) == Seq("the quick", "quick brown", "brown fox"))
    // the fingerprint IS the minimum of the window-hash chain
    assert(r.getSeq[Long](4).min == r.getLong(3) && r.getSeq[Long](4).length == 3)
    assert(r.getString(5) == "café" && r.getString(5).length == 4)
  }
}
