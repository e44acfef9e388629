package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class OpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("tokens: lowercase, whitespace split, empties dropped") {
    val got = Seq("  Hello   WORLD  ", "a\tb\nc", "").toDF("t")
      .select(Stateless.tokens(col("t")).as("toks")).as[Seq[String]].collect()
    assert(got(0) == Seq("hello", "world"))
    assert(got(1) == Seq("a", "b", "c"))
    assert(got(2) == Seq())
  }

  test("shingles: 3-gram over tokens, distinct, short-doc fallback") {
    val got = Seq("a b c d", "a b").toDF("t")
      .select(Dedup.shingles(col("t"), 3).as("s")).as[Seq[String]].collect()
    assert(got(0) == Seq("a b c", "b c d"))
    assert(got(1) == Seq("a b"))
  }

  test("jaccard: exact set similarity") {
    val got = Seq(1).toDF("x").select(
      Dedup.jaccard(array(lit("a"), lit("b"), lit("c")), array(lit("b"), lit("c"), lit("d"))).as("j"))
      .as[Double].head()
    assert(math.abs(got - 0.5) < 1e-12)
  }

  test("simhash: equal texts equal hashes; hamming 0/positive") {
    val df = Seq(("x", "the quick brown fox jumps"), ("y", "the quick brown fox jumps"),
      ("z", "entirely different words here altogether")).toDF("id", "t")
      .select(col("id"), Dedup.simhash(col("t")).as("h"))
    val m = df.as[(String, Long)].collect().toMap
    assert(m("x") == m("y"))
    val dist = Seq(1).toDF("i").select(
      Dedup.hamming64(lit(m("x")), lit(m("z"))).as("d")).as[Int].head()
    assert(dist > 0)
  }

  test("cosine: identical vectors 1.0, orthogonal 0.0") {
    val one = Seq(1).toDF("i").select(
      Similarity.cosine(array(lit(1.0f), lit(2.0f)), array(lit(1.0f), lit(2.0f))).as("c")).as[Double].head()
    assert(math.abs(one - 1.0) < 1e-9)
    val zero = Seq(1).toDF("i").select(
      Similarity.cosine(array(lit(1.0f), lit(0.0f)), array(lit(0.0f), lit(1.0f))).as("c")).as[Double].head()
    assert(zero == 0.0)
  }

  test("langId: clear-cut stopword text classifies") {
    val got = Seq("the cat is on the mat and it is warm", "der hund ist nicht mit der katze")
      .toDF("t").select(TextAnalysis.langId(col("t")).as("l")).as[String].collect()
    assert(got(0) == "en")
    assert(got(1) == "de")
  }

  test("exact dedup: planted duplicate collapses, keeps lowest id") {
    val df = Seq((1L, "same   Text here"), (2L, "same text HERE"), (3L, "other doc")).toDF("id", "t")
    val got = Dedup.exact(df, col("id"), col("t"))
      .orderBy(col("keep_id")).as[(String, Long, Long)].collect()
    assert(got.length == 2)
    assert(got(0)._2 == 1L && got(0)._3 == 2L) // ids 1+2 merged (case/ws-insensitive)
    assert(got(1)._2 == 3L && got(1)._3 == 1L)
  }

  test("minhashLsh: planted near-dup found, disjoint docs not paired") {
    val base = (1 to 40).map(i => s"tok$i").mkString(" ")
    val nearDup = (1 to 40).map(i => if (i == 20) "CHANGED" else s"tok$i").mkString(" ")
    val other = (100 to 140).map(i => s"z$i").mkString(" ")
    val df = Seq((1L, base), (2L, nearDup), (3L, other)).toDF("id", "t")
    val pairs = Dedup.minhashLsh(df, col("id"), col("t"), threshold = 0.5)
      .as[(Long, Long, Double)].collect()
    assert(pairs.map(p => (p._1, p._2)).toSet == Set((1L, 2L)))
    assert(pairs.head._3 > 0.8)
  }

  test("minhashLshJoin: cross-corpus pairs equal driver-side brute force") {
    // two disjoint corpora from the real docs; cross near-dup join must
    // equal the exact all-cross-pairs jaccard at the q52 recall banding
    val docs = graft.sources.Tables(spark, "/root/testdata/sf0.001").documents
    val a = docs.where(col("doc_id") % 2 === 0)
    val b = docs.where(col("doc_id") % 2 === 1)
    val got = Dedup.minhashLshJoin(a, col("doc_id"), col("text"),
        b, col("doc_id"), col("text"),
        shingleN = 3, numHashes = 32, bands = 16, rowsPerBand = 2, threshold = 0.5)
      .as[(Long, Long, Double)].collect().toSet
    def sh(t: String): Set[String] = {
      val toks = t.toLowerCase.split("\\s+").filter(_.nonEmpty)
      toks.sliding(3).filter(_.length == 3).map(_.mkString(" ")).toSet
    }
    val av = a.select("doc_id", "text").as[(Long, String)].collect().map { case (i, t) => (i, sh(t)) }
    val bv = b.select("doc_id", "text").as[(Long, String)].collect().map { case (i, t) => (i, sh(t)) }
    val truth = (for {
      (ia, sa) <- av; (ib, sb) <- bv
      if sa.nonEmpty && sb.nonEmpty
      j = (sa & sb).size.toDouble / (sa | sb).size
      if j >= 0.5
    } yield (ia, ib, j)).toSet
    assert(truth.nonEmpty, "vacuous: no cross pairs at sf0.001 θ=0.5")
    assert(got == truth, s"cross join != brute force (got=${got.size}, truth=${truth.size})")
    // and no same-parity (within-corpus) pair leaks into the cross join
    assert(got.forall { case (ia, ib, _) => ia % 2 == 0 && ib % 2 == 1 })
  }

  test("minhashLshJoin property: random corpora — exact precision, exact recall above margin") {
    // randomized sweep against a driver-side brute-force oracle. Two-sided
    // soundness: (1) every reported pair is a true pair with the exact
    // jaccard (the verify step is deterministic, so precision is exact at
    // ANY score); (2) every pair at jaccard >= 0.9 is found (banding miss
    // at 16 bands x 2 rows is (1-j^2)^16 < 3e-12 there — pairs between
    // 0.5 and 0.9 may legitimately miss with small probability, which is
    // the documented LSH contract, so the recall assert keeps the margin)
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    def sh3(t: String): Set[String] = {
      val toks = t.toLowerCase.split("\\s+").filter(_.nonEmpty)
      toks.sliding(3).filter(_.length == 3).map(_.mkString(" ")).toSet
    }
    val cases = (1 to 4).flatMap { i =>
      val g = for {
        na <- Gen.choose(15, 40)
        nb <- Gen.choose(15, 40)
        vocab <- Gen.choose(5, 10) // tiny vocab -> organic cross collisions
        mkDoc = Gen.choose(8, 20).flatMap(l =>
          Gen.listOfN(l, Gen.choose(0, vocab)).map(_.map(w => s"w$w").mkString(" ")))
        aDocs <- Gen.listOfN(na, mkDoc)
        bInd <- Gen.listOfN(nb, mkDoc)
      } yield (aDocs, bInd)
      g.apply(Gen.Parameters.default, Seed(7000 + i))
    }
    assert(cases.nonEmpty)
    for ((aDocs, bInd) <- cases) {
      val bDocs = bInd ++ aDocs.take(5).map(_ + " w0") // planted near-copies
      val a = aDocs.zipWithIndex.map { case (t, j) => (j.toLong, t) }.toDF("id", "t")
      val b = bDocs.zipWithIndex.map { case (t, j) => (1000L + j, t) }.toDF("id", "t")
      val got = Dedup.minhashLshJoin(a, col("id"), col("t"), b, col("id"), col("t"),
          shingleN = 3, numHashes = 32, bands = 16, rowsPerBand = 2, threshold = 0.5)
        .as[(Long, Long, Double)].collect()
      val av = aDocs.zipWithIndex.map { case (t, j) => (j.toLong, sh3(t)) }
      val bv = bDocs.zipWithIndex.map { case (t, j) => (1000L + j, sh3(t)) }
      val truth = (for {
        (ia, sa) <- av; (ib, sb) <- bv
        if sa.nonEmpty && sb.nonEmpty
        j = (sa & sb).size.toDouble / (sa | sb).size
        if j >= 0.5
      } yield ((ia, ib), j)).toMap
      got.foreach { case (ia, ib, j) =>
        assert(truth.get((ia, ib)).contains(j), s"false or mis-scored pair ($ia,$ib,$j)")
      }
      val gotSet = got.map(p => (p._1, p._2)).toSet
      truth.filter(_._2 >= 0.9).keys.foreach { k =>
        assert(gotSet.contains(k), s"missed high-jaccard pair $k")
      }
    }
  }

  test("cosineNearDupJoin: cross-corpus vector pairs equal brute force") {
    val em = graft.sources.Tables(spark, "/root/testdata/sf0.001").embeddings
    val a = em.select(col("vec_id").as("id"),
      transform(col("embedding"), x => x.cast("double")).as("v"))
    // b: perturbed copy of every 10th vector (cosine ≈ 0.9999+) plus its id
    val b = em.where(col("vec_id") % 10 === 0)
      .select((col("vec_id") + 50000L).as("id"),
        transform(col("embedding"), (x, i) =>
          x.cast("double") * (lit(1.0) + lit(0.005) * (i % 3 - 1).cast("double"))).as("v"))
    val got = Similarity.cosineNearDupJoin(a, col("id"), col("v"), b, col("id"), col("v"),
        dim = 64, bands = 8, rowsPerBand = 16, threshold = 0.95)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val av = a.as[(Long, Array[Double])].collect()
    val bv = b.as[(Long, Array[Double])].collect()
    def cos(x: Array[Double], y: Array[Double]): Double = {
      var d = 0.0; var nx = 0.0; var ny = 0.0
      for (i <- x.indices) { d += x(i) * y(i); nx += x(i) * x(i); ny += y(i) * y(i) }
      if (nx == 0 || ny == 0) 0.0 else d / math.sqrt(nx * ny)
    }
    val truth = (for {
      (ia, xa) <- av; (ib, xb) <- bv if cos(xa, xb) >= 0.95
    } yield (ia, ib)).toSet
    assert(truth.nonEmpty)
    assert(got == truth, s"cross vector join != brute force (got=${got.size}, truth=${truth.size})")
  }

  test("simhashPairs equals brute-force hamming pairs on a planted corpus") {
    // corpus: real docs + exact copies (hamming 0) + lightly-edited copies
    // (small hamming); banded candidates must equal the brute-force pair
    // set — pigeonhole banding is exact, not probabilistic
    val docs = graft.sources.Tables(spark, "/root/testdata/sf0.001").documents
      .select(col("doc_id").as("id"), col("text").as("t"))
    val copies = docs.where(col("id") % 25 === 0)
      .select((col("id") + 100000L).as("id"), col("t"))
    val edited = docs.where(col("id") % 25 === 1)
      .select((col("id") + 200000L).as("id"), concat(col("t"), lit(" extra token")).as("t"))
    val corpus = docs.union(copies).union(edited)
    val maxH = 6
    val got = Dedup.simhashPairs(corpus, col("id"), col("t"), maxHamming = maxH, bands = 8)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val fps = corpus.select(col("id"), Dedup.simhash(col("t")).as("fp"))
      .as[(Long, Long)].collect()
    val truth = (for {
      (ia, fa) <- fps; (ib, fb) <- fps
      if ia < ib && java.lang.Long.bitCount(fa ^ fb) <= maxH
    } yield (ia, ib)).toSet
    assert(truth.nonEmpty, "expected planted pairs within hamming bound")
    assert(got == truth, s"banded pairs != brute force (got=${got.size}, truth=${truth.size})")
    // every exact copy must be found at hamming 0
    val copyPairs = fps.map(_._1).filter(i => i < 100000 && i % 25 == 0)
      .map(i => (i, i + 100000L)).toSet
    assert(copyPairs.subsetOf(got))
  }

  test("lmSurprisal: integer bit-length score equals the hand-computed LM") {
    // d1 "a b a b": bigrams (a,b)x2 (b,a)x1; d2 "a b c": (a,b) (b,c);
    // d3 single token -> excluded. Corpus counts: c2(a,b)=3, c2(b,a)=1,
    // c2(b,c)=1; heads c1(a)=3, c1(b)=2. bitlen: 3->2, 2->2, 1->1.
    // d1: 2*(2-2) + 1*(2-1) = 1 over 3 bigrams; d2: (2-2) + (2-1) = 1 over 2.
    val df = Seq((1L, "a b a b"), (2L, "a b c"), (3L, "x")).toDF("id", "text")
    val got = TextAnalysis.lmSurprisal(df, col("id"), col("text"))
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 3L, 1L), (2L, 2L, 1L)))
  }

  test("lmSurprisalAgainst: reference-trained scoring with OOV accounting") {
    // ref "a b a b a c": c2 (a,b)=2 (b,a)=2 (a,c)=1; heads c1 a=3, b=2.
    // scored "a b a c x": (a,b) 2-2=0; (b,a) 2-2=0 wait c1(b)=2 bl2,
    // c2(b,a)=2 bl2 -> 0; (a,c) bl(3)-bl(1)=2-1=1; (c,x) fully unseen ->
    // defaults 1,1 -> 0, counted OOV. Total bits 1, oov 1, n 4.
    val ref = Seq((10L, "a b a b a c")).toDF("id", "text")
    val got = TextAnalysis.lmSurprisalAgainst(
        Seq((1L, "a b a c x")).toDF("id", "text"), col("id"), col("text"),
        TextAnalysis.lmCounts(ref, col("text")))
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 4L, 1L, 1L)))
  }

  test("fileops: filter/aggregate/anomaly recipes") {
    val df = Seq(("a", 1.0), ("b", 5.0), ("a", 3.0)).toDF("k", "v")
    assert(FileOps.filterOp(df, "k", "equals", "a").count() == 2)
    assert(FileOps.filterOp(df, "v", "greater_than", "2").count() == 2)
    val agg = FileOps.aggregateOp(df, "k", "sum", "v").as[(String, Double)].collect().toMap
    assert(agg("a") == 4.0 && agg("b") == 5.0)
    val an = FileOps.anomalyOp(df, "v", 4.0).where(col("is_anomaly")).count()
    assert(an == 1)
  }

  test("keyedStats: decimal-exact sum/avg") {
    val df = Seq(("k", 0.1), ("k", 0.2), ("k", 0.3)).toDF("g", "v")
    val r = Aggregates.keyedStats(df, col("v"), col("g"))
      .select("cnt", "sum_v", "avg_v").as[(Long, Double, Double)].head()
    // decimal path: sum exactly 0.6; avg is that double divided by 3
    assert(r._1 == 3 && r._2 == 0.6 && r._3 == 0.6 / 3)
  }

  test("randomProjection: exact signed-sum replica, linearity, wrong-dim guard") {
    val signs = Similarity.projectionSigns(4, 3, seed = 7L)
    // the sign matrix is deterministic and genuinely mixed
    assert(signs.flatten.toSet == Set(1L, -1L))
    assert(Similarity.projectionSigns(4, 3, 7L).map(_.toSeq).toSeq ==
      signs.map(_.toSeq).toSeq, "same seed, same matrix")
    val vecs = Seq(
      (1L, Seq(0.5f, -0.25f, 0.125f, 1.0f)),
      (2L, Seq(0.0f, 0.0f, 0.0f, 0.0f)),
      (3L, Seq(-1.0f, 1.0f, -1.0f, 1.0f)))
    val df = vecs.toDF("id", "v")
    val got = Similarity.randomProjection(df, col("id"), col("v"),
        inDim = 4, outDim = 3, quantBits = 20, seed = 7L)
      .as[(Long, Long, Long)].collect()
      .map { case (i, j, x) => (i, j) -> x }.toMap
    val want = vecs.flatMap { case (i, v) =>
      val q = v.map(x => math.floor(x.toDouble * 1048576.0).toLong)
      (0 until 3).map(j => (i, j.toLong) ->
        q.zip(signs(j)).map { case (a, s) => a * s }.sum)
    }.toMap
    assert(got == want)
    // quantized exactly representable inputs: the zero vector projects to 0
    assert((0 until 3).forall(j => got((2L, j.toLong)) == 0L))
    val e = intercept[Exception] {
      Similarity.randomProjection(Seq((1L, Seq(1.0f, 2.0f))).toDF("id", "v"),
        col("id"), col("v"), inDim = 4, outDim = 2).collect()
    }
    def msg(t: Throwable): String =
      (Option(t.getMessage) ++ Option(t.getCause).map(_.getMessage)).mkString(" ")
    assert(msg(e).contains("expected 4-dim"))
    intercept[IllegalArgumentException] {
      Similarity.randomProjection(df, col("id"), col("v"), inDim = 4, outDim = 5)
    }
  }
}
