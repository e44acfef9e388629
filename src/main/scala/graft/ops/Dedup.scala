package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for corpus-scale pipelines (north-star
  * extension). The reference's only dedup is a (buggy) keyed-process
  * example (reference: examples/stateful_deduplication.py:18-49 — state
  * write-back is dead code, SURVEY §2.7); here the intended semantics are
  * implemented as distributed batch operators:
  *
  *  - exact: hash-groupBy on a normalized fingerprint, one shuffle of
  *    (fingerprint, id) pairs only — holds at 100 TB because the text
  *    itself is never shuffled.
  *  - MinHash/LSH: shingle → k-minhash signature → band buckets →
  *    bucket-join for candidates → exact Jaccard verify. The classic
  *    near-dup pipeline (Broder '97); all signature math is column
  *    expressions (codegen), candidates come from an equi-join on
  *    (band, bandHash) so Spark shuffles signatures, not documents.
  *  - SimHash: 64-bit sign-of-weighted-bits fingerprint (Charikar '02);
  *    near-dup iff small Hamming distance.
  *
  * All element hashing is the engine-portable splitmix64(polyBase ^
  * k*GOLDEN) family (graft.functions.KernelOps), so results are
  * deterministic across runs, partitionings, AND engines — the full
  * LSH chain replays in the DuckDB oracle. Band buckets use xxhash64
  * purely as an equality key (never replayed; the oracle joins on the
  * band slice itself).
  */
object Dedup {

  /** Word n-gram shingles of the token array (distinct). Single-pass
    * custom expression (graft.functions.Kernels.WordShingles).
    */
  def shingles(text: Column, n: Int): Column =
    graft.functions.Kernels.word_shingles(Stateless.tokens(text), n)

  /** k-wise MinHash signature over the shingle set: sig[i] = min over
    * shingles s of the portable hash family (see
    * [[graft.functions.Kernels.MinHashSignature]]). Single-pass custom expression
    * (graft.functions.Kernels) — the equivalent nested higher-order
    * functions evaluate interpreted and are ~50x slower on a corpus scan.
    */
  def minhashSignature(shingleCol: Column, k: Int): Column =
    graft.functions.Kernels.minhash_signature(shingleCol, k)

  /** LSH banding: hash r consecutive signature entries per band.
    * Two docs land in the same (bandIdx, bandHash) bucket iff that band of
    * their signatures matches exactly.
    */
  def lshBands(sigCol: Column, bands: Int, rows: Int): Column =
    transform(sequence(lit(0), lit(bands - 1)),
      b => struct(b.as("band"), xxhash64(b, array_join(slice(sigCol, b * lit(rows) + lit(1), lit(rows)), ",")).as("bucket")))

  /** Exact Jaccard similarity of two (distinct-element) arrays. */
  def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") /
      size(array_union(a, b)).cast("double")

  /** Exact dedup: keep the lowest id per fingerprint. Output: one row per
    * distinct document with its duplicate count.
    */
  def exact(df: DataFrame, id: Column, text: Column): DataFrame =
    df.select(id.as("id"), TextAnalysis.fingerprint(text).as("fp"))
      .groupBy(col("fp"))
      .agg(min(col("id")).as("keep_id"), count(lit(1)).as("n_dups"))

  /** MinHash+LSH near-duplicate pairs, verified by exact Jaccard >= threshold.
    * Returns (id_a, id_b, jaccard) with id_a < id_b, deduplicated across
    * bands. `numHashes` must equal bands*rowsPerBand.
    */
  def minhashLsh(df: DataFrame, id: Column, text: Column,
                 shingleN: Int = 3, numHashes: Int = 32,
                 bands: Int = 8, rowsPerBand: Int = 4,
                 threshold: Double = 0.5): DataFrame = {
    require(bands * rowsPerBand == numHashes, "bands*rowsPerBand must equal numHashes")
    val sh = df.select(id.as("id"), shingles(text, shingleN).as("sh"))
      .where(size(col("sh")) > 0)
    // Bucket join carries only (band, bucket, id) triples — the shingle
    // arrays (i.e. the documents) never enter this shuffle, which is what
    // keeps the candidate-generation stage cheap at corpus scale. The
    // banded frame feeds both join sides through one hashpartitioning
    // exchange; AQE's runtime exchange reuse (ReusedExchange in the final
    // adaptive plan, asserted in PlanQualitySpec) computes the corpus
    // scan+shingle+signature pass once for both sides.
    val banded = sh
      .select(col("id"), explode(lshBands(minhashSignature(col("sh"), numHashes), bands, rowsPerBand)).as("bb"))
      .select(col("bb.band").as("band"), col("bb.bucket").as("bucket"), col("id"))
    // Verify candidates with exact Jaccard. Near-dup candidates are rare
    // relative to the corpus, so instead of shuffling every document's
    // shingle set by id (a full-data shuffle) or caching the shingle frame
    // (unbounded executor memory across queries), re-scan the corpus with a
    // broadcast semi-filter on candidate ids: Catalyst pushes the semi-join
    // below the shingle projection, so shingles are recomputed only for
    // rows that survive the filter, and the verify joins shuffle candidate
    // shingle sets only (Banding.verifyPairs).
    Banding.verifyPairs(
      Banding.candidatePairs(banded),
      df.select(id.as("id"), shingles(text, shingleN).as("p")),
      jaccard, "jaccard", threshold)
  }

  /** All-pairs n-gram Jaccard above a threshold via LSH candidates —
    * convenience wrapper with aggressive banding (high recall).
    */
  def ngramJaccardPairs(df: DataFrame, id: Column, text: Column,
                        n: Int = 3, threshold: Double = 0.8): DataFrame =
    minhashLsh(df, id, text, shingleN = n, numHashes = 32, bands = 16, rowsPerBand = 2,
      threshold = threshold)

  /** Cross-CORPUS near-duplicate join: (id_a from `a`, id_b from `b`,
    * jaccard) for every cross pair with exact n-gram Jaccard >= threshold —
    * dataset-overlap analysis between two corpora (two crawl snapshots, a
    * training set vs a candidate acquisition, two dedup shards). Distinct
    * from [[minhashLsh]] (self-join within ONE corpus) and from
    * [[Decontamination.containmentPairs]] (asymmetric score, small bench
    * side): both sides are full corpora and the score is symmetric
    * Jaccard. Scale shape is the same banding contract: each corpus is
    * scanned once into (band, bucket, id) triples, the A×B candidate join
    * exchanges triples only, and each side's shingle sets are re-derived
    * for candidates only behind its own broadcast semi-filter — no
    * corpus-wide payload shuffle on either side.
    */
  def minhashLshJoin(a: DataFrame, aId: Column, aText: Column,
                     b: DataFrame, bId: Column, bText: Column,
                     shingleN: Int = 3, numHashes: Int = 32,
                     bands: Int = 8, rowsPerBand: Int = 4,
                     threshold: Double = 0.5): DataFrame = {
    require(bands * rowsPerBand == numHashes, "bands*rowsPerBand must equal numHashes")
    def banded(df: DataFrame, id: Column, text: Column) =
      df.select(id.as("id"), shingles(text, shingleN).as("sh"))
        .where(size(col("sh")) > 0)
        .select(col("id"),
          explode(lshBands(minhashSignature(col("sh"), numHashes), bands, rowsPerBand)).as("bb"))
        .select(col("bb.band").as("band"), col("bb.bucket").as("bucket"), col("id"))
    Banding.verifyPairsAcross(
      Banding.candidatePairsAcross(banded(a, aId, aText), banded(b, bId, bText)),
      a.select(aId.as("id"), shingles(aText, shingleN).as("p")),
      b.select(bId.as("id"), shingles(bText, shingleN).as("p")),
      jaccard, "jaccard", threshold)
  }

  /** Membership screen with a Bloom prefilter: return the `incoming` rows
    * whose (long) key is NOT in `seen` — the "which of these documents/
    * URLs have we already ingested" gate at the front of a corpus
    * pipeline. A Bloom filter has NO false negatives, so a negative probe
    * proves the row is new and skips the join entirely; only the
    * positives (true hits + fpp of the new rows) reach the exact
    * `left_anti` join. At 100 TB that turns an incoming-sized join into
    * one narrow scan plus a join over ~|seen ∩ incoming| rows — and the
    * prefilter CANNOT change the result (oracle-checked as a plain anti
    * join, q70). The filter itself is built distributed
    * (`stat.bloomFilter` partial-aggregates) but lives on the driver and
    * ships to executors with the probe closure: ~1.2 GB per 10⁹ keys at
    * 1% fpp — size `expectedItems`/`fpp` to the seen-set; beyond driver
    * memory, [[DedupIndex]] is the disk-backed screen. Null keys screen
    * as new (a Bloom can't represent them; the exact join would keep them
    * too).
    *
    * COST NOTE — the `expectedItems = 0` default runs a full `count()`
    * job over the seen-set to size the filter BEFORE the bloomFilter
    * aggregate builds it: two passes over a potentially corpus-sized
    * frame where a sized call pays one. Convenient for small/medium
    * seen-sets; for a large one, pass `expectedItems` (an upper bound is
    * fine — fpp only improves) and skip the counting pass.
    */
  def bloomScreen(seen: DataFrame, seenKey: Column,
                  incoming: DataFrame, inKey: Column,
                  expectedItems: Long = 0L, fpp: Double = 0.01): DataFrame = {
    requireIntegralKey(seen, seenKey, "seen")
    requireIntegralKey(incoming, inKey, "incoming")
    val keyed = seen.select(seenKey.cast("long").as("__seen_k"))
    val n = if (expectedItems > 0) expectedItems else keyed.count()
    val bf = keyed.stat.bloomFilter(col("__seen_k"), math.max(n, 1L), fpp)
    screenWith(bf, keyed, incoming, inKey)
  }

  /** Continuous-ingestion form of [[bloomScreen]]: the filter is built
    * ONCE over the seen-set, then every micro-batch of `stream` is
    * screened against it (prefilter + exact anti join, same no-false-
    * negative contract) and the surviving new rows go to `onBatch`.
    * foreachBatch because the screen is a batch composition (the Bloom
    * probe + anti join) — and the one-time filter build must not re-run
    * per batch. The seen-set is FROZEN at start: rows admitted during the
    * stream are not added to the filter (screen-then-admit pipelines
    * rebuild the filter on their ingestion cadence, like
    * [[DedupIndex.append]]/`screenStream`). Same cost note as
    * [[bloomScreen]]: the `expectedItems = 0` default adds a one-time
    * `count()` pass over the seen-set before the filter build — pass a
    * sized upper bound for large seen-sets.
    */
  def bloomScreenStream(seen: DataFrame, seenKey: Column,
                        stream: DataFrame, inKey: Column,
                        expectedItems: Long = 0L, fpp: Double = 0.01)
                       (onBatch: DataFrame => Unit): org.apache.spark.sql.streaming.StreamingQuery = {
    requireIntegralKey(seen, seenKey, "seen")
    requireIntegralKey(stream, inKey, "stream")
    val keyed = seen.select(seenKey.cast("long").as("__seen_k"))
    val n = if (expectedItems > 0) expectedItems else keyed.count()
    val bf = keyed.stat.bloomFilter(col("__seen_k"), math.max(n, 1L), fpp)
    stream.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        onBatch(screenWith(bf, keyed, batch, inKey))
      }
      .start()
  }

  // guard BEFORE any job: a string key would cast(long) to null on every
  // row (non-ANSI), silently screening 100% of incoming — duplicates
  // included — as "definitely new"; hash non-numeric keys to longs
  // (xxhash64) upstream instead
  private def requireIntegralKey(df: DataFrame, key: Column, side: String): Unit = {
    val dt = df.select(key).schema.head.dataType
    require(dt match {
      case org.apache.spark.sql.types.ByteType | org.apache.spark.sql.types.ShortType |
           org.apache.spark.sql.types.IntegerType | org.apache.spark.sql.types.LongType => true
      case _ => false
    }, s"bloomScreen $side key must be integral (byte/short/int/long), got " +
      s"${dt.simpleString} — hash non-numeric keys to longs (e.g. xxhash64) first")
  }

  private def screenWith(bf: org.apache.spark.util.sketch.BloomFilter,
                         keyed: DataFrame, incoming: DataFrame,
                         inKey: Column): DataFrame = {
    val might = udf((k: Long) => bf.mightContainLong(k))
    val flagged = incoming.withColumn("__maybe",
      coalesce(might(inKey.cast("long")), lit(false)))
    val definitelyNew = flagged.where(!col("__maybe")).drop("__maybe")
    val verifiedNew = flagged.where(col("__maybe")).drop("__maybe")
      .join(keyed, inKey.cast("long") === col("__seen_k"), "left_anti")
    definitelyNew.union(verifiedNew)
  }

  /** 64-bit SimHash over tokens: each token's hash votes +1/-1 on every bit
    * position; the sign of each bit-sum forms the fingerprint. Single-pass
    * custom expression (graft.functions.Kernels).
    */
  def simhash(text: Column): Column =
    graft.functions.Kernels.simhash64(Stateless.tokens(text))

  /** Hamming distance between two 64-bit fingerprints. */
  def hamming64(a: Column, b: Column): Column =
    bit_count(a.bitwiseXOR(b))

  /** SimHash near-duplicate pairs: all (id_a < id_b) with fingerprint
    * Hamming distance <= maxHamming (the Manku et al. WWW'07 simhash
    * dedup shape). Candidates by pigeonhole banding — the 64-bit
    * fingerprint splits into `bands` contiguous chunks, and two
    * fingerprints within maxHamming < bands differing bits MUST agree on
    * at least one whole chunk — so candidate generation is an equi-join
    * on (band, chunk) with EXACT recall, no probabilistic miss. The
    * fingerprint is 8 bytes, so it rides along in the banding shuffle and
    * pairs verify inline (no second corpus scan, unlike the
    * shingle/vector verifies). Exchange carries (band, chunk, id, fp)
    * only; per-chunk bucket count is 2^(64/bands).
    */
  def simhashPairs(df: DataFrame, id: Column, text: Column,
                   maxHamming: Int = 3, bands: Int = 4): DataFrame = {
    require(bands > maxHamming,
      "pigeonhole guarantee needs bands > maxHamming (else a pair can differ in every chunk)")
    require(64 % bands == 0, "bands must divide 64")
    val width = 64 / bands
    val mask = if (width == 64) -1L else (1L << width) - 1
    val fp = df.select(id.as("id"), simhash(text).as("fp"))
    val chunks = (0 until bands).map { b =>
      struct(lit(b).as("band"),
        shiftright(col("fp"), b * width).bitwiseAND(lit(mask)).as("chunk"))
    }
    val banded = fp.select(col("id"), col("fp"), explode(array(chunks: _*)).as("bc"))
      .select(col("bc.band").as("band"), col("bc.chunk").as("chunk"), col("id"), col("fp"))
    banded.as("l").join(banded.as("r"),
        col("l.band") === col("r.band") && col("l.chunk") === col("r.chunk") &&
          col("l.id") < col("r.id"))
      .select(col("l.id").as("id_a"), col("r.id").as("id_b"),
        hamming64(col("l.fp"), col("r.fp")).as("hamming"))
      .where(col("hamming") <= maxHamming)
      .distinct()
  }
  /** EXACT set-similarity self-join by PREFIX FILTERING (the ssjoin /
    * PPJoin family) — every unordered pair of docs whose distinct
    * token sets have Jaccard >= `threshold`, with NO false negatives:
    * the exact complement to [[minhashLsh]]'s probabilistic banding.
    *
    * The prefix principle: order every doc's tokens by GLOBAL
    * rarity (document frequency, ties by token — `tokenSet` is any
    * array column: words, shingles, n-grams; the element space's
    * rarity profile is what makes the prefix cut bite), and keep only each
    * doc's first n − ⌈t·n⌉ + 1 tokens as its PREFIX. Two sets with
    * Jaccard >= t must share at least one prefix token — if all
    * shared tokens hid past both prefixes, the overlap would be too
    * small by counting. So candidates = prefix-token equi-join, and
    * rare-first ordering makes those collision lists the SHORTEST
    * ones. The verify is exact integer arithmetic:
    * c·10⁴ >= t₁e₄·(n_a + n_b − c), no floats anywhere.
    *
    * Scale shape: one distinct pass, one token-df aggregate, one
    * per-doc sort window (doc-local), a prefix equi-join whose lists
    * are rare tokens only, and one pair-keyed count — never the |D|²
    * cross join the oracle runs. Output: (id_a, id_b, inter, n_a,
    * n_b) with id_a < id_b.
    */
  def jaccardJoin(df: DataFrame, id: Column, tokenSet: Column,
                  threshold: Double): DataFrame = {
    require(threshold > 0 && threshold <= 1,
      s"jaccardJoin: threshold must be in (0, 1], got $threshold")
    val t1e4 = math.round(threshold * 10000)
    val toks = df
      .select(id.as("id"), explode(tokenSet).as("tok"))
      .where(length(col("tok")) > 0).distinct().localCheckpoint()
    val dfreq = toks.groupBy(col("tok")).agg(count(lit(1)).as("__df"))
    val ranked = toks.join(dfreq, "tok")
      .withColumn("__rk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("id"))
          .orderBy(col("__df"), col("tok"))))
    // one per-id aggregate definition serves both consumers: the prefix
    // cut reads only (id, __n) — ColumnPruning drops the collect_list
    // from that branch — and the verify reads the sorted arrays too
    val arrs = toks.groupBy(col("id"))
      .agg(sort_array(collect_list(col("tok"))).as("__ts"),
        count(lit(1)).as("__n"))
    val sizes = arrs.select(col("id"), col("__n"))
    // prefix length n - ceil(t*n) + 1, integer ceil = (t1e4*n + 9999) div 10000
    val prefix = ranked.join(sizes, "id")
      .where(col("__rk") <=
        col("__n") - expr(s"(($t1e4 * __n + 9999) div 10000)") + 1)
      .select(col("id"), col("tok"), col("__n"), col("__rk"))
    // LENGTH FILTER (ssjoin standard, zero false negatives): Jaccard ≥ t
    // forces t·max(n_a,n_b) ≤ min(n_a,n_b) (the overlap is at most the
    // smaller set, the union at least the larger), so size-incompatible
    // prefix collisions are dropped BEFORE the pair ever reaches distinct
    // + verify — at threshold 0.4 this is the difference between
    // verifying every pair of docs sharing one common-ish prefix token
    // and verifying only plausibly-similar ones.
    // POSITIONAL FILTER (ppjoin standard, also zero false negatives):
    // J ≥ t needs o·(10⁴ + t1e4) ≥ t1e4·(n_a + n_b), and a collision at
    // ranks (rk_a, rk_b) admits o ≤ min(n_a − rk_a, n_b − rk_b) + 1 when
    // no shared token precedes it. That premise holds at each pair's
    // FIRST in-prefix collision (a shared token ordered before it would
    // sit at smaller ranks on both sides — inside both prefixes, an
    // earlier collision), so a true pair always survives that collision
    // and only collisions too deep in both prefixes are dropped — before
    // distinct + verify instead of after the intersect count.
    val cands = prefix.as("a").join(prefix.as("b"), Seq("tok"))
      .where(col("a.id") < col("b.id") &&
        least(col("a.__n"), col("b.__n")) * 10000 >=
          lit(t1e4) * greatest(col("a.__n"), col("b.__n")) &&
        (least(col("a.__n") - col("a.__rk"), col("b.__n") - col("b.__rk")) + 1) *
          lit(10000 + t1e4) >= lit(t1e4) * (col("a.__n") + col("b.__n")))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
    // verify on PAIR-sized frames: each candidate pair picks up the two
    // (sorted, distinct) token arrays and counts the exact intersection
    // per row — two id-keyed joins total, instead of exploding every
    // pair back to (pair × tokens) rows and re-joining token strings
    // (the exploded frame dominated the runtime: P·n̄ rows ≫ corpus).
    // The count is the allocation-free sorted-merge kernel, not
    // array_intersect's per-row hash set (~350 µs/pair measured —
    // the query's dominant cost at weak thresholds)
    cands
      .join(arrs.select(col("id").as("id_a"), col("__ts").as("__ta"),
        col("__n").as("n_a")), Seq("id_a"))
      .join(arrs.select(col("id").as("id_b"), col("__ts").as("__tb"),
        col("__n").as("n_b")), Seq("id_b"))
      .withColumn("inter",
        graft.functions.Kernels.sorted_intersect_count(col("__ta"), col("__tb")))
      .where(col("inter") * 10000 >= lit(t1e4) * (col("n_a") + col("n_b") - col("inter")))
      .select(col("id_a"), col("id_b"), col("inter"), col("n_a"), col("n_b"))
  }
}
