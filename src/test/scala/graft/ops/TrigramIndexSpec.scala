package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class TrigramIndexSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmp() =
    java.nio.file.Files.createTempDirectory("graft_trigram").toString

  private def corpus = Seq(
    (1L, "merge sort join"),
    (2L, "the big MERGE Sort"),      // case folds
    (3L, "sorted merges"),           // substrings inside words
    (4L, "abc then bcd apart")).toDF("id", "text") // grams of "abcd" w/o the substring

  private def search(qs: Seq[(Long, String)], path: String) =
    TrigramIndex.search(spark, qs.toDF("qid", "pat"), col("qid"), col("pat"),
      corpus, col("id"), col("text"), path)
      .as[(Long, Long)].collect().toSet

  test("substring search crosses token boundaries, folds case, verifies grams") {
    val path = tmp()
    TrigramIndex.build(corpus, col("id"), col("text"), path)
    assert(search(Seq((0L, "merge sort")), path) == Set((0L, 1L), (0L, 2L)))
    assert(search(Seq((1L, "sort")), path) == Set((1L, 1L), (1L, 2L), (1L, 3L)))
    // doc 4 carries grams {abc, bcd} but not the contiguous "abcd":
    // the candidate stage admits it, the contains verify must drop it
    assert(search(Seq((2L, "abcd")), path) == Set.empty)
    assert(search(Seq((3L, "ted mer")), path) == Set((3L, 3L)))
  }

  test("rarest-gram selection stays complete at any gramsPerQuery") {
    val path = tmp()
    TrigramIndex.build(corpus, col("id"), col("text"), path)
    val full = search(Seq((0L, "merge sort"), (1L, "sort")), path)
    for (k <- Seq(1, 2, 8)) {
      val got = TrigramIndex.search(spark,
        Seq((0L, "merge sort"), (1L, "sort")).toDF("qid", "pat"),
        col("qid"), col("pat"), corpus, col("id"), col("text"), path,
        gramsPerQuery = k)
        .as[(Long, Long)].collect().toSet
      assert(got == full, s"gramsPerQuery=$k")
    }
  }

  test("searchWithContext: first-match position and edge-clipped snippets") {
    val path = tmp()
    TrigramIndex.build(corpus, col("id"), col("text"), path)
    val got = TrigramIndex.searchWithContext(spark,
      Seq((0L, "merge sort"), (1L, "apart")).toDF("qid", "pat"),
      col("qid"), col("pat"), corpus, col("id"), col("text"), path,
      context = 4)
      .as[(Long, Long, Long, String)].collect().toSet
    assert(got == Set(
      (0L, 1L, 1L, "merge sort joi"),      // doc 1: left edge clips, right extends
      (0L, 2L, 9L, "big merge sort"),      // doc 2 lowercased, right edge clips
      (1L, 4L, 14L, "bcd apart")))         // doc 4 "abc then bcd apart"
  }

  test("patterns shorter than 3 chars fail fast") {
    val path = tmp()
    TrigramIndex.build(corpus, col("id"), col("text"), path)
    val e = intercept[IllegalArgumentException] {
      search(Seq((0L, "ab")), path)
    }
    assert(e.getMessage.contains("shorter than 3"))
  }

  test("postings scan is pruned by a pushed gram filter") {
    val path = tmp()
    TrigramIndex.build(corpus, col("id"), col("text"), path)
    // the candidate stage un-executed (search eagerly materializes it,
    // hiding the postings scan behind the checkpoint)
    val gs = Seq("mer", "erg", "rge")
    val plan = TrigramIndex.candidateStage(spark, path, gs,
      Seq((0L, "mer"), (0L, "erg"), (0L, "rge")).toDF("qid", "gram"),
      Seq((0L, 3L)).toDF("qid", "__qn"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [In(gram"), s"gram filter not pushed:\n$plan")
  }

  test("remove takes a doc down and its grams' df shrinks; compact preserves results") {
    val path = tmp()
    TrigramIndex.build(corpus, col("id"), col("text"), path)
    TrigramIndex.remove(spark, Seq(1L).toDF("id"), col("id"), path)
    // doc 1 ("merge sort join") no longer matches; doc 2 still does
    assert(search(Seq((0L, "merge sort")), path) == Set((0L, 2L)))
    // df rederived from survivors: "joi" appeared only in doc 1
    val dfJoi = spark.read.parquet(s"$path/_model/df")
      .where(col("gram") === "joi").count()
    assert(dfJoi == 0)
    val before = search(Seq((1L, "sort")), path)
    TrigramIndex.compact(spark, path, partitions = 2)
    assert(search(Seq((1L, "sort")), path) == before)
  }

  test("searchLike: anchored LIKE semantics with required-run pruning") {
    val path = tmp()
    TrigramIndex.build(corpus, col("id"), col("text"), path)
    def like(qs: Seq[(Long, String)]) =
      TrigramIndex.searchLike(spark, qs.toDF("qid", "pat"), col("qid"), col("pat"),
        corpus, col("id"), col("text"), path)
        .as[(Long, Long)].collect().toSet
    // multi-run %: ordered terms; doc 3 "sorted merges" fails the order
    assert(like(Seq((0L, "%merge%sort%"))) == Set((0L, 1L), (0L, 2L)))
    // _ inside a run; anchored prefix
    assert(like(Seq((1L, "the_big%"))) == Set((1L, 2L)))
    // no 3+-char literal run -> loud failure, never a silent scan
    intercept[IllegalArgumentException] { like(Seq((2L, "%ab%cd%"))) }
    intercept[IllegalArgumentException] { like(Seq((3L, "%mer\\%ge%"))) }
  }

  test("regexLiteralRuns: required runs under . * + ?") {
    import TrigramIndex.regexLiteralRuns
    assert(regexLiteralRuns("merge.*batch") == Seq("merge", "batch"))
    assert(regexLiteralRuns("sorts? merge") == Seq("sort", " merge"))
    assert(regexLiteralRuns("table .able") == Seq("table ", "able"))
    assert(regexLiteralRuns("ab+cd") == Seq("ab", "cd"))
    assert(regexLiteralRuns("colou?r") == Seq("colo", "r"))
    assert(regexLiteralRuns(".*") == Seq.empty)
  }

  test("searchRegex: unanchored find semantics on candidates only; guards fire") {
    val path = tmp()
    TrigramIndex.build(corpus, col("id"), col("text"), path)
    def re(qs: Seq[(Long, String)]) =
      TrigramIndex.searchRegex(spark, qs.toDF("qid", "pat"), col("qid"), col("pat"),
        corpus, col("id"), col("text"), path)
        .as[(Long, Long)].collect().toSet
    // .* ordering; sorts? optional char; matches the naive rlike scan
    for (pat <- Seq("merge.*sort", "sorts? ", "the .ig")) {
      val naive = corpus.where(lower(col("text")).rlike(pat))
        .select(lit(0L), col("id")).as[(Long, Long)].collect().toSet
      assert(re(Seq((0L, pat))) == naive, s"pattern $pat")
    }
    // unsupported metacharacters and unprunable patterns fail fast
    intercept[IllegalArgumentException] { re(Seq((0L, "me(rge|ta)"))) }
    intercept[IllegalArgumentException] { re(Seq((0L, "^merge"))) }
    intercept[IllegalArgumentException] { re(Seq((0L, "a.b.c"))) }
  }

  test("searchRegex: top-level alternation is the OR of its branches' counting-ANDs") {
    val path = tmp()
    TrigramIndex.build(corpus, col("id"), col("text"), path)
    def re(qs: Seq[(Long, String)]) =
      TrigramIndex.searchRegex(spark, qs.toDF("qid", "pat"), col("qid"), col("pat"),
        corpus, col("id"), col("text"), path)
        .as[(Long, Long)].collect().toSet
    def naive(q: Long, pat: String) = corpus.where(lower(col("text")).rlike(pat))
      .select(lit(q), col("id")).as[(Long, Long)].collect().toSet
    // branches hitting different docs; overlapping branches dedup;
    // per-branch . * + ? still work; a mixed batch keeps per-query ids
    for (pat <- Seq("sorted|abc then", "merge.*sort|big", "merges|merge sort",
                    "sorts?.*join|then bcd")) {
      assert(re(Seq((0L, pat))) == naive(0L, pat), s"pattern $pat")
    }
    val mixed = Seq((0L, "sorted|abc then"), (1L, "merge.*sort"))
    assert(re(mixed) == naive(0L, "sorted|abc then") ++ naive(1L, "merge.*sort"))
    // EVERY branch must be prunable: an empty or runless branch raises
    intercept[IllegalArgumentException] { re(Seq((0L, "merge|ab"))) }
    intercept[IllegalArgumentException] { re(Seq((0L, "merge|"))) }
    intercept[IllegalArgumentException] { re(Seq((0L, "|merge"))) }
  }

  test("the pattern collect is bounded: past maxPatterns the search fails fast") {
    val path = tmp()
    TrigramIndex.build(corpus, col("id"), col("text"), path)
    val many = Seq((0L, "merge"), (1L, "sort"), (2L, "join")).toDF("qid", "pat")
    val e = intercept[IllegalArgumentException] {
      TrigramIndex.search(spark, many, col("qid"), col("pat"),
        corpus, col("id"), col("text"), path, maxPatterns = 2)
    }
    assert(e.getMessage.contains("maxPatterns"))
    val e2 = intercept[IllegalArgumentException] {
      TrigramIndex.searchRegex(spark, many, col("qid"), col("pat"),
        corpus, col("id"), col("text"), path, maxPatterns = 2)
    }
    assert(e2.getMessage.contains("maxPatterns"))
    val e3 = intercept[IllegalArgumentException] {
      TrigramIndex.searchLike(spark,
        Seq((0L, "%merge%"), (1L, "%sort%"), (2L, "%join%")).toDF("qid", "pat"),
        col("qid"), col("pat"), corpus, col("id"), col("text"), path,
        maxPatterns = 2)
    }
    assert(e3.getMessage.contains("maxPatterns"))
    // at the bound, all three still answer
    assert(TrigramIndex.search(spark, many, col("qid"), col("pat"),
      corpus, col("id"), col("text"), path, maxPatterns = 3).count() > 0)
  }

  test("append folds new docs in exactly-once under batch-id replay") {
    val path = tmp()
    TrigramIndex.build(corpus, col("id"), col("text"), path)
    val batch = Seq((10L, "fresh quicksort pass")).toDF("id", "text")
    TrigramIndex.append(batch, col("id"), col("text"), path, batchId = 0L)
    val after = TrigramIndex.search(spark, Seq((0L, "quicksort")).toDF("qid", "pat"),
      col("qid"), col("pat"), corpus.unionByName(batch), col("id"), col("text"), path)
      .as[(Long, Long)].collect().toSet
    assert(after == Set((0L, 10L)))
    // re-delivered batch id: a no-op, postings must not double
    TrigramIndex.append(batch, col("id"), col("text"), path, batchId = 0L)
    val post = spark.read.parquet(s"$path/_post")
      .where(col("doc_id") === 10L).count()
    assert(post == spark.read.parquet(s"$path/_post/fold=1").count())
  }
}
