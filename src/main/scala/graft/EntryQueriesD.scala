package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops._
import graft.sources.Tables
import graft.EntryHelpers._

/** [[SparkEntry.queries]] chunk 4/4 (q189_phrase_search … q167_session_late_stream),
  * in the contract's declaration order — split out of SparkEntry purely
  * for navigability; SparkEntry concatenates the chunks unchanged.
  */
private[graft] object EntryQueriesD {
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q246_autocorrelation" -> ((s, d) => {
      // EXACT ACF — Timeseries.autocorr over the per-type daily event
      // counts: r_k = Σq_t·q_{t+k}/Σq_t² with q_t = n·x_t − Σx, all
      // integers, ⌊10⁶·r_k⌋ in decimal(38,0) — no floating point, the
      // oracle replays it with window leads. One keyed exchange+sort;
      // the lag explode runs on the key-sized aggregate frame.
      Timeseries.autocorr(dailyEventCounts(Tables(s, d).events),
        Seq("event_type"), col("day"), col("x"), maxLag = 7)
    }),
    "q247_chi2_tokens" -> ((s, d) =>
      // χ² FEATURE SELECTION — TextAnalysis.chiSquareTokens: the top
      // positively-discriminative tokens per language over the corpus
      // (2×2 presence contingency, exact integer χ² ppm, deterministic
      // tie-break). One (doc,token) explode → one (token,label) hash
      // agg; label totals broadcast; the top-k window runs over the
      // vocabulary frame.
      TextAnalysis.chiSquareTokens(Tables(s, d).documents,
        col("doc_id"), col("text"), col("lang"), topK = 10, minDocs = 3L)),
    "q248_random_projection" -> ((s, d) =>
      // JL RANDOM PROJECTION — Similarity.randomProjection: 64-d float
      // embeddings → 8-d exact integer vectors via a ±1 Achlioptas
      // sign matrix (splitmix-derived literals, inlined identically in
      // the oracle) over 2^20-quantized components. Map-only: no
      // exchange, the projection is one codegen'd expression per row.
      Similarity.randomProjection(Tables(s, d).embeddings,
        col("vec_id"), col("embedding"), inDim = 64, outDim = 8)),
    "q249_bag_setops" -> ((s, d) => {
      // BAG SET OPS — Dataset.intersectAll/exceptAll (multiset
      // INTERSECT ALL / EXCEPT ALL, which q33's distinct set ops don't
      // cover): the (user, event_type) activity bags of even vs odd
      // days. Both are ONE hash aggregate per side + a count-merge —
      // no sort, no window; at scale they shuffle the grouped bag
      // (distinct rows + counts), never raw rows.
      val ev = Tables(s, d).events.select(col("user_id"), col("event_type"),
        pmod(dayBucket(col("ts")), lit(2L)).as("par"))
      val a = ev.where(col("par") === 0L).drop("par")
      val b = ev.where(col("par") === 1L).drop("par")
      a.intersectAll(b).select(lit("intersect").as("op"), col("user_id"), col("event_type"))
        .unionAll(
          a.exceptAll(b).select(lit("except").as("op"), col("user_id"), col("event_type")))
    }),
    "q252_chi2_tokens_stream" -> ((s, d) => {
      // CONTINUOUS χ² VOCABULARY — the feature-selection stats as a
      // STANDING STORE PAIR under Catalog.ingestStream: each arriving
      // corpus slice folds its (token, label) presence increments AND
      // its label doc totals under ONE manifest swap (the two stores
      // can never tear apart — a χ² scored between them would lie),
      // and scoring is a read-side chiSquareFromCounts over the
      // vocabulary-sized stores. Counts are additive, so the fold is
      // delivery-order independent and q247's batch oracle holds
      // verbatim for the final store state.
      val base = q252CatalogCache.computeIfAbsent(d, { dir =>
        val p = graft.core.TempDirs.create("graft_q252_cat") + "/chi2"
        val docs = Tables(s, dir).documents
          .select(col("doc_id"), col("lang"), col("text"))
        graft.core.Catalog.init(p, Map(
          "tl" -> docs.limit(0).select(lit("").as("token"),
            col("lang").as("label"), lit(0L).as("n_docs")),
          "lbl" -> docs.limit(0).select(col("lang").as("label"),
            lit(0L).as("n"))))
        // the increments are THE batch twin's own aggregates
        // (TextAnalysis.presenceCounts/labelCounts — one definition, no
        // drift between the one-shot q247 and this standing store)
        val tlFold = (cur: DataFrame, b: DataFrame) =>
          cur.unionByName(TextAnalysis.presenceCounts(b, col("text"), col("lang")))
            .groupBy(col("token"), col("label"))
            .agg(sum(col("n_docs")).as("n_docs"))
        val lblFold = (cur: DataFrame, b: DataFrame) =>
          cur.unionByName(TextAnalysis.labelCounts(b, col("lang")))
            .groupBy(col("label")).agg(sum(col("n")).as("n"))
        withShufflePartitions(s, 8) {
          // NULL-safe replay order: writeOrderedSlices drops NULL order
          // values, and a dropped row would break the shared-verbatim
          // oracle contract (doc_id is non-null here, but the contract
          // shouldn't depend on it)
          val stage = screenReplayDir(s"$dir#q252", docs,
            coalesce(col("doc_id"), lit(Long.MinValue)), 4)
          val stream = graft.streaming.Replay.orderedStream(s, stage, docs.schema)
          val q = graft.core.Catalog.ingestStream(s, stream, p,
            Seq("tl" -> tlFold, "lbl" -> lblFold), ephemeralOk = true)
          try q.processAllAvailable() finally q.stop()
        }
        p
      })
      TextAnalysis.chiSquareFromCounts(
        graft.core.Catalog.read(s, base, "tl"),
        graft.core.Catalog.read(s, base, "lbl"), topK = 10, minDocs = 3L)
    }),
    "q253_autocorr_stream" -> ((s, d) => {
      // CONTINUOUS ACF — the per-(type, day) count series as a standing
      // store: each arriving event slice folds additive daily counts
      // (delivery-order independent), and the seasonality probe is a
      // READ-side Timeseries.autocorr over the key-sized series — the
      // monitor re-scores at any moment without touching raw events.
      // Oracle: q246's SQL verbatim (the fold roundtrip is invisible).
      val base = q253CatalogCache.computeIfAbsent(d, { dir =>
        val p = graft.core.TempDirs.create("graft_q253_cat") + "/acf"
        val ev = Tables(s, dir).events
          .select(col("event_type"), col("ts"), col("event_id"))
        graft.core.Catalog.init(p, Map(
          "daily" -> ev.limit(0).select(col("event_type"),
            lit(0L).as("day"), lit(0L).as("x"))))
        val fold = (cur: DataFrame, b: DataFrame) =>
          cur.unionByName(dailyEventCounts(b))
            .groupBy(col("event_type"), col("day")).agg(sum(col("x")).as("x"))
        withShufflePartitions(s, 8) {
          // NULL-safe replay order (see q252): a NULL ts must reach the
          // store — where the shared autocorr NULL-tick guard raises,
          // exactly as the batch twin would — not silently vanish
          val stage = screenReplayDir(s"$dir#q253", ev,
            coalesce(unix_micros(col("ts")), lit(Long.MinValue)), 4)
          val stream = graft.streaming.Replay.orderedStream(s, stage, ev.schema)
          val q = graft.core.Catalog.ingestStream(s, stream, p,
            Seq("daily" -> fold), ephemeralOk = true)
          try q.processAllAvailable() finally q.stop()
        }
        p
      })
      Timeseries.autocorr(graft.core.Catalog.read(s, base, "daily"),
        Seq("event_type"), col("day"), col("x"), maxLag = 7)
    }),
    "q251_attribution" -> ((s, d) =>
      // MULTI-TOUCH ATTRIBUTION — Cohorts.attribution: the five
      // standard models (first/last/linear/U-shaped/time-decay) per
      // channel for every purchase's 7-day touch window; 1-day decay
      // half-life (ages span 0–7 days, so the gate exercises real
      // weight variation). One user-keyed equi-join (the time range
      // rides it) + one conversion-keyed window exchange + a channel
      // rollup; every credit is exact integer ppm (per-touch floors,
      // power-of-two decay weights) so the oracle replays them
      // integer-for-integer.
      Cohorts.attribution(Tables(s, d).events,
        col("user_id"), col("ts"), col("event_id"),
        col("event_type"), col("event_type") === "purchase",
        lookbackMs = 7L * 86400000L)),
    "q250_pseudonymize" -> ((s, d) =>
      // PSEUDONYMIZATION — Privacy.pseudonymize: stable keyed tokens
      // (md5(salt:col:value), the engine-portable keyed-hash pattern)
      // replace customer names; joinability survives, raw PII doesn't.
      // Map-only codegen'd scan; the re-identification vault (tested in
      // PrivacySpec) stays under separate access control.
      Privacy.pseudonymize(Tables(s, d).customer, Seq("c_name"), "graft-r14")
        .select(col("c_custkey"), col("c_name").as("name_token"),
          col("c_nationkey"))),
    "q189_phrase_search" -> ((s, d) => {
      // PHRASE RETRIEVAL — Bm25Index.searchPhrase: docs containing
      // the query tokens as a CONSECUTIVE sequence. Candidates cut by
      // the boolean AND over the scan-pruned postings, then only the
      // candidates' token arrays fetch from the corpus (semi join)
      // for a positional slice-equality verify — per-candidate work,
      // never corpus-wide. Oracle: space-joined token string contains
      // the space-joined phrase with boundary pads (tokens cannot
      // contain whitespace, so string containment == sequence match).
      val idx = q103IndexCache.computeIfAbsent(d, { dir =>
        val p = graft.core.TempDirs.create("graft_q103_idx") + "/bm25"
        Bm25Index.build(Tables(s, dir).documents, col("doc_id"), col("text"), p)
        p
      })
      import s.implicits._
      val qs = Seq((0L, "table hash"), (1L, "customer join"),
        (2L, "merge batch part")).toDF("qid", "qtext")
      Bm25Index.searchPhrase(s, qs, col("qid"), col("qtext"),
        Tables(s, d).documents, col("doc_id"), col("text"), idx)
    }),
    "q191_substring_search" -> ((s, d) => {
      // SUBSTRING RETRIEVAL — TrigramIndex.search: accelerated
      // `LIKE '%pat%'` over a standing character-trigram index;
      // patterns cross token boundaries ("ge bat" spans "merge batch")
      // and match inside words, which no token index can answer.
      // Candidates are cut by the counting AND over the gram-pruned
      // postings scan, then only candidates' text fetches for the
      // exact contains verify. Oracle: the plain corpus-scan LIKE.
      val idx = q191IndexCache.computeIfAbsent(d, { dir =>
        val p = graft.core.TempDirs.create("graft_q191_idx") + "/tri"
        TrigramIndex.build(Tables(s, dir).documents, col("doc_id"), col("text"), p)
        p
      })
      import s.implicits._
      val qs = Seq((0L, "ge bat"), (1L, "le sor"), (2L, "rt join"))
        .toDF("qid", "pat")
      TrigramIndex.search(s, qs, col("qid"), col("pat"),
        Tables(s, d).documents, col("doc_id"), col("text"), idx)
    }),
    "q223_wildcard_search" -> ((s, d) => {
      // WILDCARD (LIKE) RETRIEVAL — TrigramIndex.searchLike: full
      // anchored SQL LIKE over the SAME standing index as q191. The
      // code-search move: every literal run of the pattern must appear
      // contiguously in a matching document, so the union of the runs'
      // trigrams are REQUIRED grams — candidate pruning is the same
      // counting AND, then the exact per-row LIKE verify on candidates
      // only. The three patterns exercise multi-run `%` (ordered
      // terms), a `_` single-char wildcard inside a run boundary, and
      // a prefix anchor. Oracle: the plain corpus-scan LIKE.
      val idx = q191IndexCache.computeIfAbsent(d, { dir =>
        val p = graft.core.TempDirs.create("graft_q191_idx") + "/tri"
        TrigramIndex.build(Tables(s, dir).documents, col("doc_id"), col("text"), p)
        p
      })
      import s.implicits._
      val qs = Seq((0L, "%merge%join%"), (1L, "%sort%tab_e%"),
        (2L, "the%stream%")).toDF("qid", "pat")
      TrigramIndex.searchLike(s, qs, col("qid"), col("pat"),
        Tables(s, d).documents, col("doc_id"), col("text"), idx)
    }),
    "q226_regex_search" -> ((s, d) => {
      // REGEX RETRIEVAL — TrigramIndex.searchRegex: the full
      // code-search trick over the SAME standing index as q191/q223.
      // Required literal runs extracted from a restricted regex
      // (literals + . * + ?) become the counting-AND grams; the exact
      // regexp_like verify (unanchored find semantics, engine-portable
      // for this subset) runs on candidates only. The three patterns
      // exercise .* (ordered terms), X? (optional char splitting a
      // run), and . (single wildcard inside a run). Alternation/
      // groups/classes/escapes/anchors fail fast, as do patterns with
      // no 3+-char literal run. Oracle: DuckDB regexp_matches over
      // the lowercased corpus.
      val idx = q191IndexCache.computeIfAbsent(d, { dir =>
        val p = graft.core.TempDirs.create("graft_q191_idx") + "/tri"
        TrigramIndex.build(Tables(s, dir).documents, col("doc_id"), col("text"), p)
        p
      })
      import s.implicits._
      val qs = Seq((0L, "merge.*batch"), (1L, "sorts? merge"),
        (2L, "table .able")).toDF("qid", "pat")
      TrigramIndex.searchRegex(s, qs, col("qid"), col("pat"),
        Tables(s, d).documents, col("doc_id"), col("text"), idx)
    }),
    "q228_join_view_stream" -> ((s, d) => {
      // INCREMENTAL JOIN-VIEW MAINTENANCE — JoinView.folds under
      // Catalog.ingestStream: the materialized orders⋈lineitem view
      // kept current under insert-only CDC arriving on BOTH sides,
      // interleaved and batch-cut arbitrarily (an order's lines can
      // land triggers before or after the order row itself — the
      // delta algebra ΔL⋈(R∪ΔR) ∪ L⋈ΔR makes every pairing emit
      // exactly once whichever side arrives first). Deltas broadcast
      // onto scans of the standing sides (never shuffled); left,
      // right, and view advance under ONE manifest swap, so no crash
      // can tear the view from the sides it derives from. Oracle:
      // the plain batch join.
      val base = q228CatalogCache.computeIfAbsent(d, { dir =>
        val p = graft.core.TempDirs.create("graft_q228_cat") + "/jv"
        val o = Tables(s, dir).orders
          .select(col("o_orderkey").as("k"), col("o_custkey"))
        val l = Tables(s, dir).lineitem
          .select(col("l_orderkey").as("k"),
            col("l_linenumber").cast("long").as("l_linenumber"),
            (dec(col("l_extendedprice")) * 100).cast("long").as("cents"))
        val changes = o.select(lit(true).as("is_left"), col("k"),
            col("o_custkey"), lit(null).cast("long").as("l_linenumber"),
            lit(null).cast("long").as("cents"))
          .unionByName(l.select(lit(false).as("is_left"), col("k"),
            lit(null).cast("long").as("o_custkey"),
            col("l_linenumber"), col("cents")))
        JoinView.init(s, p, o.limit(0), l.limit(0), Seq("k"))
        withShufflePartitions(s, 8) {
          val stage = screenReplayDir(s"$dir#q228", changes,
            col("k") * 8 + coalesce(col("l_linenumber"), lit(0L)), 4)
          val stream = graft.streaming.Replay.orderedStream(s, stage, changes.schema)
          val q = graft.core.Catalog.ingestStream(s, stream, p,
            JoinView.folds(s, p, Seq("k"), col("is_left"),
              b => b.select(col("k"), col("o_custkey")),
              b => b.select(col("k"), col("l_linenumber"), col("cents"))),
            ephemeralOk = true)
          try q.processAllAvailable() finally q.stop()
        }
        p
      })
      JoinView.read(s, base).select(col("k").as("o_orderkey"),
        col("o_custkey"), col("l_linenumber"), col("cents"))
    }),
    "q230_feature_hash" -> ((s, d) =>
      // HASHING-TRICK BAG-OF-WORDS — TextAnalysis.hashedBow: the
      // vocabulary-free CountVectorizer. bucket = splitmix64(
      // polyBase(token)) pmod 256 via the registered portable-hash
      // kernel (single-element minhash signature — the q37/q38/q47
      // family), counts at (doc, bucket) grain with multiplicity.
      // One explode + one map-side-partial aggregate; power-of-two
      // buckets keep signed pmod == unsigned mod (2^64 ≡ 0 mod 2^k),
      // so the oracle replays the finalizer on HUGEINT and buckets
      // unsigned. 256 buckets (not 2^18) to make collisions REAL in
      // the gate, not just possible.
      TextAnalysis.hashedBow(Tables(s, d).documents, col("doc_id"),
        lower(col("text")), buckets = 256)
        .select(col("id").as("doc_id"), col("bucket"), col("cnt"))),
    "q231_delta_attribution" -> ((s, d) => {
      // PERIOD-OVER-PERIOD DELTA ATTRIBUTION — Checks.deltaAttribution:
      // which nations drove the revenue move from the 1995-97 period
      // to 1998+? Exact cents totals per key in one partial-aggregated
      // scan, net movement broadcast back, share as one deterministic
      // double expression over the exact longs (NULL if the net delta
      // were zero). The mix-shift diagnostic every metrics review
      // starts with. Oracle replays totals and the identical division.
      val t = Tables(s, d)
      val j = t.orders.join(broadcast(t.customer
            .select(col("c_custkey"), col("c_nationkey"))),
          col("o_custkey") === col("c_custkey"))
        .select(col("c_nationkey").as("nation"),
          (year(col("o_orderdate")) >= 1998).as("is_cur"),
          (dec(col("o_totalprice")) * 100).cast("long").as("cents"))
      Checks.deltaAttribution(j, Seq("nation"), col("is_cur"), col("cents"))
    }),
    "q232_coordinated_sample" -> ((s, d) => {
      // COORDINATED (CONSISTENT-HASH) SAMPLING — Sampling.
      // coordinatedSample: both tables keep exactly the orderkeys
      // hashing into the first 16 of 256 buckets, so the ~6% slice is
      // JOINABLE — sample(orders) ⋈ sample(lineitem) == sample of the
      // join, where uniform per-row sampling destroys the join by
      // construction. Scan-level filter, zero shuffle, deterministic
      // across runs (the portable hash family), and monotone in
      // `keep` (a ramp-up only adds keys). Oracle replays the
      // splitmix bucket on the key's decimal string and the same
      // join+aggregate over the kept keys.
      val t = Tables(s, d)
      val o = Sampling.coordinatedSample(t.orders, col("o_orderkey"), 256, 16)
      val l = Sampling.coordinatedSample(t.lineitem, col("l_orderkey"), 256, 16)
      o.join(l, col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"),
          countDistinct(col("o_orderkey")).as("n_orders"),
          sum((dec(col("l_extendedprice")) * 100).cast("long")).as("cents"))
    }),
    "q233_jaccard_join" -> ((s, d) =>
      // EXACT SET-SIMILARITY SELF-JOIN — Dedup.jaccardJoin: every doc
      // pair with token-set Jaccard >= 0.5 by PREFIX FILTERING (the
      // ssjoin/PPJoin family): rare-first global token order, prefix
      // length n − ⌈t·n⌉ + 1, candidates from the prefix equi-join
      // (two qualifying sets MUST share a prefix token — the counting
      // argument), then an exact integer verify c·10⁴ ≥ t₁ₑ₄·(n_a +
      // n_b − c). Zero false negatives — the exact complement to
      // q37's probabilistic MinHash banding — and never the |D|²
      // cross join the oracle runs.
      Dedup.jaccardJoin(
        ScanLayout.fanOut(Tables(s, d).documents.select(col("doc_id"), col("text"))),
        col("doc_id"), Dedup.shingles(lower(col("text")), 3), threshold = 0.4)),
    "q234_join_agg_view_stream" -> ((s, d) => {
      // JOIN + AGGREGATE VIEW, incrementally — the q228 composition:
      // a 4th store folds the SAME per-batch join delta
      // (JoinView.delta) into per-customer (n_items, revenue cents)
      // under the SAME manifest swap, so the aggregate can never tear
      // from the join it summarizes and never re-reads it either —
      // per trigger the aggregate pays delta-sized work plus its own
      // key-grain table. Oracle: the one-shot join + group-by.
      val base = q234CatalogCache.computeIfAbsent(d, { dir =>
        val p = graft.core.TempDirs.create("graft_q234_cat") + "/jv"
        val o = Tables(s, dir).orders
          .select(col("o_orderkey").as("k"), col("o_custkey"))
        val l = Tables(s, dir).lineitem
          .select(col("l_orderkey").as("k"),
            col("l_linenumber").cast("long").as("l_linenumber"),
            (dec(col("l_extendedprice")) * 100).cast("long").as("cents"))
        val changes = o.select(lit(true).as("is_left"), col("k"),
            col("o_custkey"), lit(null).cast("long").as("l_linenumber"),
            lit(null).cast("long").as("cents"))
          .unionByName(l.select(lit(false).as("is_left"), col("k"),
            lit(null).cast("long").as("o_custkey"),
            col("l_linenumber"), col("cents")))
        JoinView.init(s, p, o.limit(0), l.limit(0), Seq("k"))
        import s.implicits._
        graft.core.Catalog.addStore(s, p, "agg",
          Seq.empty[(Long, Long, Long)].toDF("o_custkey", "n", "cents"))
        val projL = (b: DataFrame) => b.select(col("k"), col("o_custkey"))
        val projR = (b: DataFrame) =>
          b.select(col("k"), col("l_linenumber"), col("cents"))
        val dlt = JoinView.delta(s, p, Seq("k"), col("is_left"), projL, projR) _
        val folds = JoinView.folds(s, p, Seq("k"), col("is_left"), projL, projR) :+
          ("agg" -> ((cur: DataFrame, b: DataFrame) =>
            cur.unionByName(dlt(b).groupBy(col("o_custkey"))
                .agg(count(lit(1)).as("n"), sum(col("cents")).as("cents")))
              .groupBy(col("o_custkey"))
              .agg(sum(col("n")).as("n"), sum(col("cents")).as("cents"))))
        withShufflePartitions(s, 8) {
          // the SAME staged slices as q228 (memoized by key)
          val stage = screenReplayDir(s"$dir#q228", changes,
            col("k") * 8 + coalesce(col("l_linenumber"), lit(0L)), 4)
          val stream = graft.streaming.Replay.orderedStream(s, stage, changes.schema)
          val q = graft.core.Catalog.ingestStream(s, stream, p, folds,
            ephemeralOk = true)
          try q.processAllAvailable() finally q.stop()
        }
        p
      })
      graft.core.Catalog.read(s, base, "agg")
    }),
    "q236_join_view_restart" -> ((s, d) => {
      // q228 ACROSS A STOP/RESTART — the join view's exactly-once
      // claim made oracle-visible: phase A folds the even-key half of
      // the CDC (2 batches) and STOPS; the odd-key half arrives while
      // the query is DOWN; a new query on the SAME durable checkpoint
      // must resume batch ids at 2 (a fresh checkpoint would renumber
      // from 0 and the ledger would silently no-op the new data — the
      // requireDurableCheckpoint hazard, here exercised end-to-end).
      // Any resume drift, double-fold, or torn store breaks the
      // compare with the one-shot batch join.
      val base = q236CatalogCache.computeIfAbsent(d, { dir =>
        val p = graft.core.TempDirs.create("graft_q236_cat") + "/jv"
        val o = Tables(s, dir).orders
          .select(col("o_orderkey").as("k"), col("o_custkey"))
        val l = Tables(s, dir).lineitem
          .select(col("l_orderkey").as("k"),
            col("l_linenumber").cast("long").as("l_linenumber"),
            (dec(col("l_extendedprice")) * 100).cast("long").as("cents"))
        val changes = o.select(lit(true).as("is_left"), col("k"),
            col("o_custkey"), lit(null).cast("long").as("l_linenumber"),
            lit(null).cast("long").as("cents"))
          .unionByName(l.select(lit(false).as("is_left"), col("k"),
            lit(null).cast("long").as("o_custkey"),
            col("l_linenumber"), col("cents")))
        JoinView.init(s, p, o.limit(0), l.limit(0), Seq("k"))
        val folds = JoinView.folds(s, p, Seq("k"), col("is_left"),
          b => b.select(col("k"), col("o_custkey")),
          b => b.select(col("k"), col("l_linenumber"), col("cents")))
        val stage = graft.core.TempDirs.create("graft_q236_replay")
        val ckpt = graft.core.TempDirs.create("graft_q236_ckpt")
        def run(): Unit = withShufflePartitions(s, 8) {
          val q = graft.core.Catalog.ingestStream(s,
            graft.streaming.Replay.orderedStream(s, stage, changes.schema),
            p, folds, checkpoint = Some(ckpt))
          try q.processAllAvailable() finally q.stop()
        }
        val ord = col("k") * 8 + coalesce(col("l_linenumber"), lit(0L))
        graft.streaming.Replay.writeOrderedSlices(
          changes.where(col("k") % 2 === 0), ord, stage, 2)
        run()
        require(graft.core.Catalog.lastBatch(s, p) == 1L,
          "q236: phase A must land batches 0 and 1")
        graft.streaming.Replay.appendSlice(stage,
          changes.where(col("k") % 4 === 1), 2)
        graft.streaming.Replay.appendSlice(stage,
          changes.where(col("k") % 4 === 3), 3)
        run()
        require(graft.core.Catalog.lastBatch(s, p) == 3L,
          "q236: the restart must resume batch ids at 2, not renumber from 0")
        p
      })
      JoinView.read(s, base).select(col("k").as("o_orderkey"),
        col("o_custkey"), col("l_linenumber"), col("cents"))
    }),
    "q187_boolean_search" -> ((s, d) => {
      // BOOLEAN AND RETRIEVAL — Bm25Index.searchAll: the docs
      // containing EVERY query term, over the SAME standing inverted
      // index as q103 (alerting rules, mandatory-term filters,
      // candidate cuts before ranking). Postings scan pruned to the
      // query vocabulary at the source; the AND is a counting
      // aggregate against broadcast per-query term counts. Oracle
      // re-derives postings and the same count-equality in SQL.
      val idx = q103IndexCache.computeIfAbsent(d, { dir =>
        val p = graft.core.TempDirs.create("graft_q103_idx") + "/bm25"
        Bm25Index.build(Tables(s, dir).documents, col("doc_id"), col("text"), p)
        p
      })
      Bm25Index.searchAll(s, bm25Queries(s), col("qid"), col("qtext"), idx)
    }),
    "q138_bm25_search_stream" -> ((s, d) => {
      // Bm25Index.searchStream: standing-query retrieval — q103's three
      // queries arrive one per micro-batch and search the SAME standing
      // inverted index; per-query independence makes q103's oracle the
      // stream's oracle verbatim.
      val idx = q103IndexCache.computeIfAbsent(d, { dir =>
        val p = graft.core.TempDirs.create("graft_q103_idx") + "/bm25"
        Bm25Index.build(Tables(s, dir).documents, col("doc_id"), col("text"), p)
        p
      })
      withShufflePartitions(s, 8) {
        val stage = screenReplayDir(s"$d#q138", bm25Queries(s), col("qid"), 3)
        val stream = graft.streaming.Replay.orderedStream(s, stage,
          bm25Queries(s).schema)
        collectScreenBatches(s) { onBatch =>
          Bm25Index.searchStream(s, stream, col("qid"), col("qtext"), idx,
            k = 10)(onBatch)
        }
      }
    }),
    "q139_ivf_search_stream" -> ((s, d) => {
      // IvfIndex.build + searchStream: q42's ANN workload through the
      // PERSISTED cell-partitioned index (same md5 centroid sample and
      // shared assignment code, so q42's unrolled oracle holds — this one
      // query gates both the standing IVF index's search path and its
      // continuous form), queries arriving in 4 micro-batches.
      val em = Tables(s, d).embeddings
      val idx = q139IndexCache.computeIfAbsent(d, { dir =>
        val p = graft.core.TempDirs.create("graft_q139_idx") + "/ivf"
        IvfIndex.build(Tables(s, dir).embeddings,
          col("vec_id"), col("embedding"), nCells = 16, p)
        p
      })
      withShufflePartitions(s, 8) {
        val stage = screenReplayDir(s"$d#q139",
          em.where(col("vec_id") < 10).select(col("vec_id"), col("embedding")),
          col("vec_id"), 4)
        val stream = graft.streaming.Replay.orderedStream(s, stage,
          em.select(col("vec_id"), col("embedding")).schema)
        collectScreenBatches(s) { onBatch =>
          IvfIndex.searchStream(s, stream, col("vec_id"), col("embedding"), idx,
            k = 5, nProbe = 4)(onBatch)
        }
      }
    }),
    "q140_cosine_screen_stream" -> ((s, d) => {
      // CosineIndex.screenStream: continuous embedding near-dup admission
      // — q72's planted perturbed corpus arrives in 4 micro-batches and
      // screens against the standing index of the base corpus. Planted
      // cosines sit at ~0.99997 vs threshold 0.95, so banding cannot miss
      // and the brute-force cross oracle is exact; cos is dropped from
      // the output like q72 (pair SET is the cross-engine-stable result).
      val em = Tables(s, d).embeddings
      val idx = q140IndexCache.computeIfAbsent(d, { dir =>
        val p = graft.core.TempDirs.create("graft_q140_idx")
        CosineIndex.build(
          Tables(s, dir).embeddings.select(col("vec_id").as("id"),
            transform(col("embedding"), x => x.cast("double")).as("v")),
          col("id"), col("v"), p, bands = 8, rowsPerBand = 16)
        p
      })
      withShufflePartitions(s, 8) {
        val stage = screenReplayDir(s"$d#q140",
          em.where(col("vec_id") % 20 === 0)
            .select((col("vec_id") + 10000000L).as("id"),
              transform(col("embedding"), (x, i) =>
                x.cast("double") * (lit(1.0) + lit(0.01) * (i % 3 - 1).cast("double"))).as("v")),
          col("id"), 4)
        val stream = graft.streaming.Replay.orderedStream(s, stage,
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("id",
              org.apache.spark.sql.types.LongType),
            org.apache.spark.sql.types.StructField("v",
              org.apache.spark.sql.types.ArrayType(
                org.apache.spark.sql.types.DoubleType)))))
        collectScreenBatches(s) { onBatch =>
          CosineIndex.screenStream(s, stream, col("id"), col("v"), idx,
            threshold = 0.95, bands = 8, rowsPerBand = 16)(b =>
            onBatch(b.select(col("new_id"), col("dup_id"))))
        }
      }
    }),
    "q141_span_screen_stream" -> ((s, d) => {
      // SpanIndex.screenStream: continuous verbatim-substring screening —
      // odd-id docs arrive in 4 micro-batches against q80's standing gram
      // index. Span merging is PER document and doc_id slicing keeps each
      // doc whole in one batch, so q80's oracle holds unchanged.
      val docs = Tables(s, d).documents
      val idx = q80IndexCache.computeIfAbsent(d, { dir =>
        val p = graft.core.TempDirs.create("graft_q80_idx")
        SpanIndex.build(Tables(s, dir).documents.where(col("doc_id") % 2 === 0),
          col("doc_id"), col("text"), p, n = 8)
        p
      })
      withShufflePartitions(s, 8) {
        val stage = screenReplayDir(s"$d#q141",
          docs.where(col("doc_id") % 2 === 1).select(col("doc_id"), col("text")),
          col("doc_id"), 4)
        val stream = graft.streaming.Replay.orderedStream(s, stage,
          docs.select(col("doc_id"), col("text")).schema)
        collectScreenBatches(s) { onBatch =>
          SpanIndex.screenStream(s, stream, col("doc_id"), col("text"), idx,
            n = 8)(onBatch)
        }
      }
    }),
    "q142_drift_stream" -> ((s, d) => {
      // the drift monitor's CONTINUOUS posture: the check corpus arrives
      // in 4 micro-batches, each folds its vocabCounts increment into the
      // staging store (counts are additive, so the fold is delivery-order
      // independent), and the final drift check runs the summed counts
      // against q132's PERSISTED baseline — build the baseline once,
      // drift-check every arriving batch forever. Oracle = q127's (the
      // whole roundtrip — slicing, per-batch counting, fold, stored
      // baseline — must be invisible).
      val docs = Tables(s, d).documents
      val half = substring(md5(col("doc_id").cast("string")), 1, 1)
      val base = q132BaselineCache.computeIfAbsent(d, _ => {
        val t = graft.core.TempDirs.create("graft_q132")
        TextAnalysis.vocabCounts(docs.where(half < "8"), col("text"))
          .write.mode("overwrite").parquet(s"$t/baseline")
        s"$t/baseline"
      })
      withShufflePartitions(s, 8) {
        val stage = screenReplayDir(s"$d#q142",
          docs.where(half >= "8").select(col("doc_id"), col("text")),
          col("doc_id"), 4)
        val stream = graft.streaming.Replay.orderedStream(s, stage,
          docs.select(col("doc_id"), col("text")).schema)
        val perBatch = collectScreenBatches(s) { onBatch =>
          stream.writeStream
            .foreachBatch { (b: DataFrame, _: Long) =>
              onBatch(TextAnalysis.vocabCounts(b, col("text")))
            }
            .start()
        }
        TextAnalysis.tokenDriftCounts(
          s.read.parquet(base).select(col("token"), col("n")),
          perBatch.groupBy(col("token")).agg(sum(col("n")).cast("long").as("n")))
          .orderBy(col("move").desc, col("token").asc)
          .limit(50)
          .withColumn("move", col("move").cast("long"))
      }
    }),
    "q143_kmeans_assign_stream" -> ((s, d) => {
      // KMeansIndex.build + assignStream: continuous classification
      // against the standing model — the corpus arrives in 4 micro-
      // batches and each assigns against the STORED centroids (broadcast
      // argmin, nothing corpus-sized moves). The stored fit is
      // KMeans.fit's own (shared code, integer-exact), so q88's unrolled
      // Lloyd oracle holds for the batch-by-batch assignment union.
      val em = Tables(s, d).embeddings
      val idx = q143IndexCache.computeIfAbsent(d, { dir =>
        val p = graft.core.TempDirs.create("graft_q143_idx") + "/km"
        KMeansIndex.build(Tables(s, dir).embeddings,
          col("vec_id"), col("embedding"), k = 8, iters = 2, p)
        p
      })
      withShufflePartitions(s, 8) {
        val stage = screenReplayDir(s"$d#q143",
          em.select(col("vec_id"), col("embedding")), col("vec_id"), 4)
        val stream = graft.streaming.Replay.orderedStream(s, stage,
          em.select(col("vec_id"), col("embedding")).schema)
        collectScreenBatches(s) { onBatch =>
          KMeansIndex.assignStream(s, stream, col("vec_id"), col("embedding"),
            idx)(onBatch)
        }
      }
    }),
    "q144_bm25_ingest_stream" -> ((s, d) => {
      // Bm25Index.appendStream: continuous EXACTLY-ONCE index ingestion.
      // The standing index starts from the even-id half and the odd-id
      // half arrives in 4 ledgered micro-batch folds (Bm25IndexSpec:
      // streaming folds == one-shot build; a re-delivered batch id is
      // skipped); q103's retrieval then runs THROUGH the grown index, so
      // its full-corpus oracle gates the whole ingest-then-search
      // lifecycle. Ingestion is memoized per (process, sf dir) like
      // every standing index — and a re-run of the same fold stream is
      // a no-op by the batch-id ledger anyway.
      val idx = q144IndexCache.computeIfAbsent(d, { dir =>
        val p = graft.core.TempDirs.create("graft_q144_idx") + "/bm25"
        val docs = Tables(s, dir).documents
        Bm25Index.build(docs.where(col("doc_id") % 2 === 0),
          col("doc_id"), col("text"), p)
        withShufflePartitions(s, 8) {
          val stage = screenReplayDir(s"$dir#q144",
            docs.where(col("doc_id") % 2 === 1).select(col("doc_id"), col("text")),
            col("doc_id"), 4)
          val stream = graft.streaming.Replay.orderedStream(s, stage,
            docs.select(col("doc_id"), col("text")).schema)
          val q = Bm25Index.appendStream(s, stream, col("doc_id"), col("text"), p)
          try q.processAllAvailable() finally q.stop()
        }
        p
      })
      Bm25Index.search(s, bm25Queries(s), col("qid"), col("qtext"), idx, k = 10)
    }),
    "q209_substring_search_stream" -> ((s, d) => {
      // TrigramIndex.searchStream: standing-grep retrieval — q191's
      // three patterns arrive one per micro-batch and search the SAME
      // standing trigram index; per-pattern independence makes q191's
      // LIKE oracle the stream's oracle verbatim (the q138 pattern for
      // the substring axis).
      val idx = q191IndexCache.computeIfAbsent(d, { dir =>
        val p = graft.core.TempDirs.create("graft_q191_idx") + "/tri"
        TrigramIndex.build(Tables(s, dir).documents, col("doc_id"), col("text"), p)
        p
      })
      import s.implicits._
      val pats = Seq((0L, "ge bat"), (1L, "le sor"), (2L, "rt join"))
        .toDF("qid", "pat")
      withShufflePartitions(s, 8) {
        val stage = screenReplayDir(s"$d#q209", pats, col("qid"), 3)
        val stream = graft.streaming.Replay.orderedStream(s, stage, pats.schema)
        collectScreenBatches(s) { onBatch =>
          TrigramIndex.searchStream(s, stream, col("qid"), col("pat"),
            Tables(s, d).documents, col("doc_id"), col("text"), idx)(onBatch)
        }
      }
    }),
    "q237_regex_search_stream" -> ((s, d) => {
      // TrigramIndex.searchRegexStream: standing regex alerting —
      // q226's three patterns arrive one per micro-batch against the
      // SAME standing index; per-pattern independence makes q226's
      // regexp_matches oracle the stream's oracle verbatim (the q209
      // posture for the regex axis).
      val idx = q191IndexCache.computeIfAbsent(d, { dir =>
        val p = graft.core.TempDirs.create("graft_q191_idx") + "/tri"
        TrigramIndex.build(Tables(s, dir).documents, col("doc_id"), col("text"), p)
        p
      })
      import s.implicits._
      val pats = Seq((0L, "merge.*batch"), (1L, "sorts? merge"),
        (2L, "table .able")).toDF("qid", "pat")
      withShufflePartitions(s, 8) {
        val stage = screenReplayDir(s"$d#q237", pats, col("qid"), 3)
        val stream = graft.streaming.Replay.orderedStream(s, stage, pats.schema)
        collectScreenBatches(s) { onBatch =>
          TrigramIndex.searchRegexStream(s, stream, col("qid"), col("pat"),
            Tables(s, d).documents, col("doc_id"), col("text"), idx)(onBatch)
        }
      }
    }),
    "q238_join_view_cdc" -> ((s, d) => {
      // JOIN VIEW UNDER FULL CDC — JoinView.ingestCdcStream: q228's
      // orders⋈lineitem view kept current under a changelog with real
      // RETRACTIONS, banded so folds are batch-sized. The stream
      // replays: every row inserted (+I), then every order with key %
      // 10 == 0 updated (-U/+U custkey+1e6), orders with key % 7 == 3
      // (and not updated) deleted, lineitems with linenumber >= 5
      // deleted, and linenumber-1 rows of key % 13 == 0 orders
      // inserted TWICE (real multiplicity 2 in the net bag). Sides
      // and view are Z-multisets in 8 hash-band stores under one
      // manifest: each micro-batch folds only its keys' bands, counts
      // multiply through the delta joins ΔL⋈(R⊎ΔR) ⊎ L⋈ΔR, and rows
      // retire at count zero. Oracle: the one-shot join of the NET
      // tables with the duplicate slice unioned back in.
      val base = q238CatalogCache.computeIfAbsent(d, { dir =>
        val p = graft.core.TempDirs.create("graft_q238_cat") + "/jv"
        val t = Tables(s, dir)
        val o = t.orders.select(col("o_orderkey").as("k"),
          col("o_custkey").cast("long").as("o_custkey"))
        val l = t.lineitem.select(col("l_orderkey").as("k"),
          col("l_linenumber").cast("long").as("l_linenumber"),
          (dec(col("l_extendedprice")) * 100).cast("long").as("cents"))
        def oRow(op: String, ck: Column, seq: Long)(df: org.apache.spark.sql.DataFrame) =
          df.select(lit(op).as("op"), lit(true).as("is_left"), col("k"),
            ck.as("o_custkey"), lit(null).cast("long").as("l_linenumber"),
            lit(null).cast("long").as("cents"), lit(seq).as("seq"))
        def lRow(op: String, seq: Long)(df: org.apache.spark.sql.DataFrame) =
          df.select(lit(op).as("op"), lit(false).as("is_left"), col("k"),
            lit(null).cast("long").as("o_custkey"), col("l_linenumber"),
            col("cents"), lit(seq).as("seq"))
        val changes = oRow("+I", col("o_custkey"), 0)(o)
          .unionByName(oRow("-U", col("o_custkey"), 1)(o.where(col("k") % 10 === 0)))
          .unionByName(oRow("+U", col("o_custkey") + 1000000L, 2)(
            o.where(col("k") % 10 === 0)))
          .unionByName(oRow("-D", col("o_custkey"), 1)(
            o.where(col("k") % 7 === 3 && col("k") % 10 =!= 0)))
          .unionByName(lRow("+I", 0)(l))
          .unionByName(lRow("+I", 1)(
            l.where(col("l_linenumber") === 1 && col("k") % 13 === 0)))
          .unionByName(lRow("-D", 2)(l.where(col("l_linenumber") >= 5)))
        JoinView.initCdc(s, p,
          o.limit(0), l.limit(0), Seq("k"), bands = 8)
        withShufflePartitions(s, 8) {
          val stage = screenReplayDir(s"$d#q238", changes,
            col("seq") * 100000000L + col("k") * 8 +
              coalesce(col("l_linenumber"), lit(0L)), 3)
          val stream = graft.streaming.Replay.orderedStream(s, stage, changes.schema)
          val q = JoinView.ingestCdcStream(s, stream, p, col("is_left"), "op",
            Seq(col("k"), col("o_custkey")),
            Seq(col("k"), col("l_linenumber"), col("cents")),
            ephemeralOk = true)
          try q.processAllAvailable() finally q.stop()
        }
        p
      })
      JoinView.readCdc(s, base).select(col("k").as("o_orderkey"),
        col("o_custkey"), col("l_linenumber"), col("cents"))
    }),
    "q240_regex_alternation" -> ((s, d) => {
      // REGEX ALTERNATION RETRIEVAL — searchRegex over the SAME
      // standing index as q226, with top-level `|` handled as the OR
      // of its branches' counting-ANDs: every branch contributes its
      // own required-literal grams and candidate set, candidates
      // union, and the exact regexp_like verify runs against the FULL
      // pattern so exactness never rests on the branch split. Groups
      // still fail fast (a literal inside `(a|b)` is not required and
      // nested extraction would be unsound); every branch must carry a
      // 3+-char literal run or the index cannot prune it. Oracle:
      // DuckDB regexp_matches (RE2) over the lowercased corpus.
      val idx = q191IndexCache.computeIfAbsent(d, { dir =>
        val p = graft.core.TempDirs.create("graft_q191_idx") + "/tri"
        TrigramIndex.build(Tables(s, dir).documents, col("doc_id"), col("text"), p)
        p
      })
      import s.implicits._
      val qs = Seq((0L, "merge.*batch|hash join"),
        (1L, "sorts? merge|columnar scan"),
        (2L, "table .able|index build")).toDF("qid", "pat")
      TrigramIndex.searchRegex(s, qs, col("qid"), col("pat"),
        Tables(s, d).documents, col("doc_id"), col("text"), idx)
    }),
    "q241_join_agg_view_cdc" -> ((s, d) => {
      // JOIN + AGGREGATE VIEW UNDER FULL CDC — q234's composition made
      // retraction-capable: a per-customer (n, cents) aggregate store
      // folds the SAME SIGNED view delta as q238's banded join view,
      // under the SAME manifest swap — counts and sums both add AND
      // subtract (Σmult / Σcents·mult), groups retire when their net
      // multiplicity reaches zero, and the aggregate can never tear
      // from the join it summarizes. Per-trigger aggregate work is
      // delta-sized plus the key-grain table. Oracle: the one-shot
      // join of the net tables grouped by customer.
      val base = q241CatalogCache.computeIfAbsent(d, { dir =>
        val p = graft.core.TempDirs.create("graft_q241_cat") + "/jv"
        val t = Tables(s, dir)
        val o = t.orders.select(col("o_orderkey").as("k"),
          col("o_custkey").cast("long").as("o_custkey"))
        val l = t.lineitem.select(col("l_orderkey").as("k"),
          col("l_linenumber").cast("long").as("l_linenumber"),
          (dec(col("l_extendedprice")) * 100).cast("long").as("cents"))
        def oRow(op: String, ck: Column, seq: Long)(df: org.apache.spark.sql.DataFrame) =
          df.select(lit(op).as("op"), lit(true).as("is_left"), col("k"),
            ck.as("o_custkey"), lit(null).cast("long").as("l_linenumber"),
            lit(null).cast("long").as("cents"), lit(seq).as("seq"))
        def lRow(op: String, seq: Long)(df: org.apache.spark.sql.DataFrame) =
          df.select(lit(op).as("op"), lit(false).as("is_left"), col("k"),
            lit(null).cast("long").as("o_custkey"), col("l_linenumber"),
            col("cents"), lit(seq).as("seq"))
        val changes = oRow("+I", col("o_custkey"), 0)(o)
          .unionByName(oRow("-U", col("o_custkey"), 1)(o.where(col("k") % 10 === 0)))
          .unionByName(oRow("+U", col("o_custkey") + 1000000L, 2)(
            o.where(col("k") % 10 === 0)))
          .unionByName(oRow("-D", col("o_custkey"), 1)(
            o.where(col("k") % 7 === 3 && col("k") % 10 =!= 0)))
          .unionByName(lRow("+I", 0)(l))
          .unionByName(lRow("+I", 1)(
            l.where(col("l_linenumber") === 1 && col("k") % 13 === 0)))
          .unionByName(lRow("-D", 2)(l.where(col("l_linenumber") >= 5)))
        JoinView.initCdc(s, p, o.limit(0), l.limit(0), Seq("k"), bands = 8)
        graft.core.Catalog.addStore(s, p, "agg",
          o.limit(0).join(l.limit(0), "k")
            .groupBy(col("o_custkey"))
            .agg(sum(lit(1L)).as("n"), sum(col("cents")).as("cents")))
        val aggFold = Seq("agg" -> ((cur: org.apache.spark.sql.DataFrame,
                                     dv: org.apache.spark.sql.DataFrame) =>
          cur.unionByName(dv.groupBy(col("o_custkey"))
              .agg(sum(col(JoinView.MultCol)).as("n"),
                sum(col("cents") * col(JoinView.MultCol)).as("cents")))
            .groupBy(col("o_custkey"))
            .agg(sum(col("n")).as("n"), sum(col("cents")).as("cents"))
            // retire only when EVERY measure is zero: under out-of-order
            // CDC a group can net n=0 with a nonzero sum in flight
            // (delete-before-insert of a different-valued row) —
            // dropping it then would corrupt the aggregate forever
            .where(col("n") =!= 0 || col("cents") =!= 0)))
        withShufflePartitions(s, 8) {
          val stage = screenReplayDir(s"$d#q238", changes,
            col("seq") * 100000000L + col("k") * 8 +
              coalesce(col("l_linenumber"), lit(0L)), 3)
          val stream = graft.streaming.Replay.orderedStream(s, stage, changes.schema)
          val q = JoinView.ingestCdcStream(s, stream, p, col("is_left"), "op",
            Seq(col("k"), col("o_custkey")),
            Seq(col("k"), col("l_linenumber"), col("cents")),
            ephemeralOk = true, derived = aggFold)
          try q.processAllAvailable() finally q.stop()
        }
        p
      })
      graft.core.Catalog.read(s, base, "agg")
        .select(col("o_custkey"), col("n"), col("cents"))
    }),
    "q242_join_view_cdc_restart" -> ((s, d) => {
      // q238 ACROSS A STOP/RESTART — the banded CDC view's exactly-once
      // claim made oracle-visible (q236's lifecycle for the retraction
      // path): phase A folds the INSERT half of the changelog (2
      // batches) and STOPS; every retraction/update arrives while the
      // query is DOWN; a new query on the SAME durable checkpoint must
      // resume batch ids at 2 — a fresh checkpoint would renumber from
      // 0 and the shared ledger would silently no-op the retractions,
      // leaving the view un-retracted (hash-visible against the net
      // oracle). Any double-fold doubles multiplicities and breaks the
      // compare the same way.
      val base = q242CatalogCache.computeIfAbsent(d, { dir =>
        val p = graft.core.TempDirs.create("graft_q242_cat") + "/jv"
        val t = Tables(s, dir)
        val o = t.orders.select(col("o_orderkey").as("k"),
          col("o_custkey").cast("long").as("o_custkey"))
        val l = t.lineitem.select(col("l_orderkey").as("k"),
          col("l_linenumber").cast("long").as("l_linenumber"),
          (dec(col("l_extendedprice")) * 100).cast("long").as("cents"))
        def oRow(op: String, ck: Column)(df: org.apache.spark.sql.DataFrame) =
          df.select(lit(op).as("op"), lit(true).as("is_left"), col("k"),
            ck.as("o_custkey"), lit(null).cast("long").as("l_linenumber"),
            lit(null).cast("long").as("cents"))
        def lRow(op: String)(df: org.apache.spark.sql.DataFrame) =
          df.select(lit(op).as("op"), lit(false).as("is_left"), col("k"),
            lit(null).cast("long").as("o_custkey"), col("l_linenumber"),
            col("cents"))
        JoinView.initCdc(s, p, o.limit(0), l.limit(0), Seq("k"), bands = 8)
        val stage = graft.core.TempDirs.create("graft_q242_replay")
        val ckpt = graft.core.TempDirs.create("graft_q242_ckpt")
        val schema = oRow("+I", col("o_custkey"))(o).schema
        def run(): Unit = withShufflePartitions(s, 8) {
          val q = JoinView.ingestCdcStream(s,
            graft.streaming.Replay.orderedStream(s, stage, schema),
            p, col("is_left"), "op",
            Seq(col("k"), col("o_custkey")),
            Seq(col("k"), col("l_linenumber"), col("cents")),
            checkpoint = Some(ckpt))
          try q.processAllAvailable() finally q.stop()
        }
        // phase A: the insert half, two batches
        graft.streaming.Replay.writeOrderedSlices(
          oRow("+I", col("o_custkey"))(o),
          col("k"), stage, 1)
        graft.streaming.Replay.appendSlice(stage, lRow("+I")(l), 1)
        run()
        require(graft.core.Catalog.lastBatch(s, p) == 1L,
          "q242: phase A must land batches 0 and 1")
        // the ENTIRE retraction/update phase arrives while down
        graft.streaming.Replay.appendSlice(stage,
          oRow("-U", col("o_custkey"))(o.where(col("k") % 10 === 0))
            .unionByName(oRow("+U", col("o_custkey") + 1000000L)(
              o.where(col("k") % 10 === 0)))
            .unionByName(oRow("-D", col("o_custkey"))(
              o.where(col("k") % 7 === 3 && col("k") % 10 =!= 0))), 2)
        graft.streaming.Replay.appendSlice(stage,
          lRow("+I")(l.where(col("l_linenumber") === 1 && col("k") % 13 === 0))
            .unionByName(lRow("-D")(l.where(col("l_linenumber") >= 5))), 3)
        run()
        require(graft.core.Catalog.lastBatch(s, p) == 3L,
          "q242: the restart must resume batch ids at 2, not renumber from 0")
        p
      })
      JoinView.readCdc(s, base).select(col("k").as("o_orderkey"),
        col("o_custkey"), col("l_linenumber"), col("cents"))
    }),
    "q243_join_view_cdc_timetravel" -> ((s, d) => {
      // TIME TRAVEL OF THE CDC VIEW — the banded catalog is 25 stores
      // behind one manifest, and savepoint/restore are POINTER
      // operations on it: pin the catalog after the insert phase (one
      // tiny write — generations are immutable), let the whole
      // retraction phase fold through (the view visibly shrinks),
      // then RESTORE the pin — every band store and the ledger rewind
      // in one manifest swap, and the view must equal the plain
      // insert-only join again, byte for byte (q228's oracle, shared).
      // Any band store missed by the rewind, or a GC that swept a
      // pinned generation, breaks the compare.
      val base = q243CatalogCache.computeIfAbsent(d, { dir =>
        val p = graft.core.TempDirs.create("graft_q243_cat") + "/jv"
        val t = Tables(s, dir)
        val o = t.orders.select(col("o_orderkey").as("k"),
          col("o_custkey").cast("long").as("o_custkey"))
        val l = t.lineitem.select(col("l_orderkey").as("k"),
          col("l_linenumber").cast("long").as("l_linenumber"),
          (dec(col("l_extendedprice")) * 100).cast("long").as("cents"))
        def oRow(op: String, ck: Column)(df: org.apache.spark.sql.DataFrame) =
          df.select(lit(op).as("op"), lit(true).as("is_left"), col("k"),
            ck.as("o_custkey"), lit(null).cast("long").as("l_linenumber"),
            lit(null).cast("long").as("cents"))
        def lRow(op: String)(df: org.apache.spark.sql.DataFrame) =
          df.select(lit(op).as("op"), lit(false).as("is_left"), col("k"),
            lit(null).cast("long").as("o_custkey"), col("l_linenumber"),
            col("cents"))
        JoinView.initCdc(s, p, o.limit(0), l.limit(0), Seq("k"), bands = 8)
        def ingest(bid: Long, b: org.apache.spark.sql.DataFrame): Unit =
          JoinView.ingestCdc(s, p, bid, b, col("is_left"), "op",
            Seq(col("k"), col("o_custkey")),
            Seq(col("k"), col("l_linenumber"), col("cents")))
        withShufflePartitions(s, 8) {
          ingest(0L, oRow("+I", col("o_custkey"))(o))
          ingest(1L, lRow("+I")(l))
          val full = JoinView.readCdc(s, p).count()
          graft.core.Catalog.savepoint(s, p, "preretract")
          // the whole retraction phase folds through the pin
          ingest(2L, oRow("-D", col("o_custkey"))(o.where(col("k") % 7 === 3)))
          ingest(3L, lRow("-D")(l.where(col("l_linenumber") >= 5)))
          require(graft.core.Catalog.lastBatch(s, p) == 3L)
          require(JoinView.readCdc(s, p).count() < full,
            "q243: the retraction phase must visibly shrink the view")
          graft.core.Catalog.restore(s, p, "preretract")
          require(graft.core.Catalog.lastBatch(s, p) == 1L,
            "q243: restore must rewind the shared ledger to the pin")
        }
        p
      })
      JoinView.readCdc(s, base).select(col("k").as("o_orderkey"),
        col("o_custkey"), col("l_linenumber"), col("cents"))
    }),
    "q244_join_view_cdc_replicate" -> ((s, d) => {
      // INCREMENTAL REPLICATION OF THE BANDED CDC VIEW — the banding
      // claim extended to disaster recovery: a replica syncs by
      // copying only generations it lacks, and banded stores change
      // generation ONLY when a fold touches them, so each sync ships
      // exactly the bands the CDC touched since the last one. The
      // first sync copies all 25 stores; the orders-only retraction
      // then ships NO right-side band, the lineitem-only retraction
      // ships NO left-side band (both asserted on replicate's copied
      // map). Oracle: the net join, read FROM THE REPLICA.
      val rep = q244CatalogCache.computeIfAbsent(d, { dir =>
        val p = graft.core.TempDirs.create("graft_q244_cat") + "/jv"
        val r = graft.core.TempDirs.create("graft_q244_rep") + "/jv"
        val t = Tables(s, dir)
        val o = t.orders.select(col("o_orderkey").as("k"),
          col("o_custkey").cast("long").as("o_custkey"))
        val l = t.lineitem.select(col("l_orderkey").as("k"),
          col("l_linenumber").cast("long").as("l_linenumber"),
          (dec(col("l_extendedprice")) * 100).cast("long").as("cents"))
        def oRow(op: String)(df: org.apache.spark.sql.DataFrame) =
          df.select(lit(op).as("op"), lit(true).as("is_left"), col("k"),
            col("o_custkey"), lit(null).cast("long").as("l_linenumber"),
            lit(null).cast("long").as("cents"))
        def lRow(op: String)(df: org.apache.spark.sql.DataFrame) =
          df.select(lit(op).as("op"), lit(false).as("is_left"), col("k"),
            lit(null).cast("long").as("o_custkey"), col("l_linenumber"),
            col("cents"))
        JoinView.initCdc(s, p, o.limit(0), l.limit(0), Seq("k"), bands = 8)
        def ingest(bid: Long, b: org.apache.spark.sql.DataFrame): Unit =
          JoinView.ingestCdc(s, p, bid, b, col("is_left"), "op",
            Seq(col("k"), col("o_custkey")),
            Seq(col("k"), col("l_linenumber"), col("cents")))
        withShufflePartitions(s, 8) {
          ingest(0L, oRow("+I")(o))
          ingest(1L, lRow("+I")(l))
          val first = graft.core.Catalog.replicate(s, p, r)
          require(first.size == 25,
            s"q244: the first sync ships every store (24 bands + meta), got ${first.size}")
          ingest(2L, oRow("-D")(o.where(col("k") % 7 === 3)))
          val second = graft.core.Catalog.replicate(s, p, r)
          require(second.nonEmpty && second.size < first.size &&
              second.keys.forall(n => !n.startsWith("right__")),
            s"q244: an orders-only retraction must ship no right-side band, " +
              s"got ${second.keys.toSeq.sorted.mkString(", ")}")
          ingest(3L, lRow("-D")(l.where(col("l_linenumber") >= 5)))
          val third = graft.core.Catalog.replicate(s, p, r)
          require(third.nonEmpty && third.keys.forall(n => !n.startsWith("left__")),
            s"q244: a lineitem-only retraction must ship no left-side band, " +
              s"got ${third.keys.toSeq.sorted.mkString(", ")}")
        }
        r
      })
      JoinView.readCdc(s, rep).select(col("k").as("o_orderkey"),
        col("o_custkey"), col("l_linenumber"), col("cents"))
    }),
    "q197_substring_ingest_stream" -> ((s, d) => {
      // TrigramIndex.appendStream: continuous exactly-once ingestion
      // into the substring index — q144's lifecycle for the trigram
      // family. Standing index starts from the even-id half, the odd
      // half arrives in 4 ledgered micro-batch folds, then q191's
      // patterns search THROUGH the grown index — so q191's
      // full-corpus LIKE oracle gates ingest-then-search end to end.
      val idx = q197IndexCache.computeIfAbsent(d, { dir =>
        val p = graft.core.TempDirs.create("graft_q197_idx") + "/tri"
        val docs = Tables(s, dir).documents
        TrigramIndex.build(docs.where(col("doc_id") % 2 === 0),
          col("doc_id"), col("text"), p)
        withShufflePartitions(s, 8) {
          val stage = screenReplayDir(s"$dir#q197",
            docs.where(col("doc_id") % 2 === 1).select(col("doc_id"), col("text")),
            col("doc_id"), 4)
          val stream = graft.streaming.Replay.orderedStream(s, stage,
            docs.select(col("doc_id"), col("text")).schema)
          val q = TrigramIndex.appendStream(s, stream, col("doc_id"), col("text"), p)
          try q.processAllAvailable() finally q.stop()
        }
        p
      })
      import s.implicits._
      val qs = Seq((0L, "ge bat"), (1L, "le sor"), (2L, "rt join"))
        .toDF("qid", "pat")
      TrigramIndex.search(s, qs, col("qid"), col("pat"),
        Tables(s, d).documents, col("doc_id"), col("text"), idx)
    }),
    "q145_ivfpq_search_stream" -> ((s, d) => {
      // IvfPqIndex.build + searchStream: q86's residual IVF-PQ workload
      // through the PERSISTED compressed index (codes partitioned by
      // cell, codebook + coarse centroids as broadcast sidecars; shared
      // sampling/encode code, so q86's oracle holds — IvfPqIndexSpec:
      // build+query == one-shot residual IVF-PQ exactly), queries
      // arriving in 4 micro-batches. Completes the continuous form of
      // the last standing ANN index.
      val em = Tables(s, d).embeddings
      val idx = q145IndexCache.computeIfAbsent(d, { dir =>
        val p = graft.core.TempDirs.create("graft_q145_idx") + "/ivfpq"
        IvfPqIndex.build(Tables(s, dir).embeddings,
          col("vec_id"), col("embedding"), nCells = 16, p, m = 8, ksub = 16)
        p
      })
      withShufflePartitions(s, 8) {
        val stage = screenReplayDir(s"$d#q145",
          em.where(col("vec_id") < 10).select(col("vec_id"), col("embedding")),
          col("vec_id"), 4)
        val stream = graft.streaming.Replay.orderedStream(s, stage,
          em.select(col("vec_id"), col("embedding")).schema)
        collectScreenBatches(s) { onBatch =>
          IvfPqIndex.searchStream(s, stream, col("vec_id"), col("embedding"),
            idx, k = 5, nProbe = 4)(onBatch)
        }
      }
    }),
    "q146_dsir_score_stream" -> ((s, d) => {
      // DsirModel.build + scoreStream: continuous domain-targeted
      // admission scoring — documents arrive in 4 micro-batches and each
      // scores against the STORED count tables (broadcast, integer-exact
      // bitlen arithmetic; DsirModelSpec: stored model == one-shot
      // importanceWeights), so q100's full replay oracle holds.
      val docs = Tables(s, d).documents
      val idx = q146IndexCache.computeIfAbsent(d, { dir =>
        val p = graft.core.TempDirs.create("graft_q146_idx") + "/dsir"
        val dd = Tables(s, dir).documents
        DsirModel.build(dd, dd.where(col("source") === "src0"),
          col("doc_id"), col("text"), p, buckets = 1024)
        p
      })
      withShufflePartitions(s, 8) {
        val stage = screenReplayDir(s"$d#q146",
          docs.select(col("doc_id"), col("text")), col("doc_id"), 4)
        val stream = graft.streaming.Replay.orderedStream(s, stage,
          docs.select(col("doc_id"), col("text")).schema)
        collectScreenBatches(s) { onBatch =>
          DsirModel.scoreStream(s, stream, col("doc_id"), col("text"), idx)(b =>
            onBatch(b.withColumnRenamed("id", "doc_id")))
        }
      }
    }),
    "q147_media_decode_stream" -> ((s, d) => {
      // continuous multimodal ingest: the PNG corpus arrives in 4 micro-
      // batches of opaque binary rows and each batch runs the REAL
      // ImageIO decode + feature pass (q68's operator, per-row
      // independent — its pixel-formula oracle verifies the whole
      // encode→stream→decode roundtrip batch by batch). The 100 TB shape
      // is the batch lane's: content bytes stay inside a narrow
      // mapPartitions per micro-batch, nothing media-sized exchanges.
      import s.implicits._
      withShufflePartitions(s, 8) {
        val ids = Tables(s, d).embeddings.select(col("vec_id")).as[Long]
        val stage = screenReplayDir(s"$d#q147",
          Multimodal.syntheticPngMediaFor(ids).toDF(), col("media_id"), 4)
        val stream = graft.streaming.Replay.orderedStream(s, stage,
          org.apache.spark.sql.Encoders.product[Multimodal.MediaRecord].schema)
        collectScreenBatches(s) { onBatch =>
          stream.writeStream
            .foreachBatch { (b: DataFrame, _: Long) =>
              onBatch(Multimodal.decodeImages(b.as[Multimodal.MediaRecord], dim = 16)
                .toDF().select(col("media_id"), col("width"), col("height"),
                  col("mean_intensity")))
            }
            .start()
        }
      }
    }),
    "q148_stream_static_join" -> ((s, d) => {
      // stream-static enrichment join INSIDE the streaming plan — the
      // one streaming join class q124's stream-stream gate doesn't
      // cover: each arriving event joins the static customer dim, which
      // Spark re-plans (and at this size broadcasts) per micro-batch.
      // Stateless per row, so the append output set equals the batch
      // join and the plain SQL join is the oracle.
      withShufflePartitions(s, 8) {
        val stream = eventsReplayStream(s, d)
        val cust = Tables(s, d).customer
          .select(col("c_custkey"), col("c_nationkey"))
        val out = stream.join(cust, col("user_id") === col("c_custkey"))
          .select(col("event_id"), col("user_id"), col("event_type"),
            col("c_nationkey"))
        val q = out.writeStream.format("memory").queryName("graft_q148_enrich")
          .outputMode("append").start()
        try q.processAllAvailable() finally q.stop()
        s.table("graft_q148_enrich")
      }
    }),
    "q149_trending_stream" -> ((s, d) => {
      // CHAINED stateful aggregations in one streaming query — windowed
      // counts then per-window top-3 (the streaming form of q60's
      // trending ranking, spec-proven in StreamingSpec and here made
      // oracle-visible): the first agg finalizes (window, event_type)
      // counts when the watermark passes the window end, the second
      // ranks the finalized rows with the bounded-heap CollectBottomK
      // kernel and fires one batch later. The replay carries TWO
      // sentinel slices (see trendReplayDir) so both levels flush; rank
      // ties break on event_type ascending in both engines. In-order
      // 0-delay delivery means no real row is late-dropped, so the
      // append output set equals the batch hourly top-3. State is ~720
      // windows × 5 types upstream + ~720 3-element heaps downstream.
      withShufflePartitions(s, 8) {
        val stream = graft.streaming.Replay.orderedStream(s, trendReplayDir(s, d),
          Tables(s, d).events.select(replayCols: _*).schema)
        val counts = stream.withWatermark("ts", "0 seconds")
          .where(col("ts") < sentinelCutoff)
          .groupBy(window(col("ts"), "1 hour"), col("event_type"))
          .agg(count(lit(1)).as("cnt"))
        val topk = counts
          .groupBy(col("window"))
          .agg(graft.functions.Kernels.collect_bottom_k(
            struct((-col("cnt")).as("nc"), col("event_type").as("event_type")), 3).as("top"))
          .select(unix_millis(col("window.start")).as("win_start_ms"),
            posexplode(col("top")).as(Seq("pos", "e")))
          .select(col("win_start_ms"), col("e.event_type").as("event_type"),
            (-col("e.nc")).as("cnt"), (col("pos") + 1).cast("long").as("rk"))
        val q = topk.writeStream.format("memory").queryName("graft_q149_trending")
          .outputMode("append").start()
        try q.processAllAvailable() finally q.stop()
        s.table("graft_q149_trending")
      }
    }),
    "q150_kmeans_update_stream" -> ((s, d) => {
      // KMeansIndex.updateStream: continuous mini-batch k-means
      // (Sculley '10) made oracle-visible — the last standing-index
      // continuous form that was spec-gated only. The model builds on
      // the even-id half; the odd-id half arrives in 2 ordered
      // micro-batch folds, each assigning against the CURRENT centroids
      // and merging its (cell, d) sums into the stored statistics
      // (centroids re-derived as s div n). Every step is integer-exact,
      // so the oracle replays build + both folds unrolled in SQL. The
      // batch-id ledger makes re-runs no-ops (a re-delivered fold is
      // skipped), so the bench's repeats read the SAME final model —
      // exactly-once ingestion proven by stability across replays. The
      // result is the full model dump: centroids flattened to
      // (cell, d, c) joined with the folded statistics (s, n).
      val em = Tables(s, d).embeddings
      val idx = q150IndexCache.computeIfAbsent(d, { dir =>
        val p = graft.core.TempDirs.create("graft_q150_idx") + "/km"
        KMeansIndex.build(Tables(s, dir).embeddings.where(col("vec_id") % 2 === 0),
          col("vec_id"), col("embedding"), k = 8, iters = 2, p)
        p
      })
      withShufflePartitions(s, 8) {
        val inc = em.where(col("vec_id") % 2 === 1)
          .select(col("vec_id"), col("embedding"))
        val stage = screenReplayDir(s"$d#q150", inc, col("vec_id"), 2)
        val stream = graft.streaming.Replay.orderedStream(s, stage, inc.schema)
        val q = KMeansIndex.updateStream(s, stream, col("vec_id"),
          col("embedding"), idx)(_ => ())
        try q.processAllAvailable() finally q.stop()
      }
      val cents = KMeansIndex.centroids(s, idx)
        .select(explode(col("cents")).as("cc"))
        .select(col("cc.cell").as("cell"),
          posexplode(col("cc.centroid")).as(Seq("d", "c")))
      val stats = s.read.parquet(s"$idx/_model/_stats")
      cents.join(stats, Seq("cell", "d"), "left_outer")
        .select(col("cell"), col("d"), col("c"), col("s"), col("n"))
    }),
    "q151_cluster_merge" -> ((s, d) => {
      // Clusters.merge made oracle-visible — the incremental-ingestion
      // step after DedupIndex.append + check: near-dup pairs among the
      // even-id docs form the EXISTING clustering, then the remaining
      // pairs (every pair touching an odd id — the "new batch") fold in
      // via merge. Each old assignment is a member→representative edge,
      // so merge runs connected components over cluster-graph-sized
      // edges (one per clustered doc + the new pairs), never the corpus;
      // the result must equal the full rebuild over ALL pairs — q55's
      // oracle verbatim (PipelineOpsSpec asserts the same equivalence
      // structurally; this puts it in the correctness record). Pairs
      // come off q55's memoized standing index: zero extra corpus scans.
      val idx = q55IndexCache.computeIfAbsent(d, { dir =>
        val p = graft.core.TempDirs.create("graft_q55_idx")
        DedupIndex.build(Tables(s, dir).documents, col("doc_id"), col("text"), p,
          shingleN = 3, numHashes = 32, bands = 16, rowsPerBand = 2)
        p
      })
      val pairs = DedupIndex.pairs(s, idx, threshold = 0.8)
      val bothEven = col("id_a") % 2 === 0 && col("id_b") % 2 === 0
      val assignments = Clusters.connectedComponents(
        pairs.where(bothEven), col("id_a"), col("id_b"))
      Clusters.merge(assignments, pairs.where(!bothEven),
        col("id_a"), col("id_b"))
    }),
    "q152_salted_join" -> ((s, d) => {
      // Joins.saltedJoin in the correctness record: the hot-key
      // straggler-flattening join (skewed side salted on a stable row
      // identity, small side exploded across the salt buckets) must be
      // RESULT-IDENTICAL to the plain join — scenario 6 measures the
      // 2x straggler win at a 50%-hot-key fact; this gates that the
      // rewrite never changes the output (ScaleJoinSpec asserts it
      // structurally; the oracle is the plain SQL join). The salt
      // column is dropped before returning, so schema matches too.
      val t = Tables(s, d)
      Joins.saltedJoin(t.events, t.customer.select(col("c_custkey"), col("c_nationkey")),
          col("user_id"), col("c_custkey"), Seq(col("event_id")), buckets = 8)
        .select(col("event_id"), col("user_id"), col("event_type"),
          col("c_nationkey"))
    }),
    "q153_view_maintain" -> ((s, d) => {
      // incremental materialized-view refresh: a per-customer (order
      // count, total spend) view maintained from a row-level
      // +I/-U/+U/-D changelog — Diff.maintainAgg touches ONLY changed
      // keys (delta collapse is changelog-sized; the merge broadcasts
      // the deltas, so the view itself never shuffles — DiffSpec
      // plan-asserts zero shuffled joins). Changelog recipe + oracle
      // are shared with q160 (viewMaintainInput/viewMaintainOracle).
      val (base, changes) = viewMaintainInput(s, d)
      val view = base.groupBy("o_custkey")
        .agg(count(lit(1)).as("cnt"), sum("o_totalprice").as("total"))
      Diff.maintainAgg(view, changes, Seq("o_custkey"), "op", "cnt",
          Seq("total" -> "p"))
        .select(col("o_custkey"), col("cnt"), col("total").cast("double").as("total"))
    }),
    "q154_sketch_rollup" -> ((s, d) => {
      // sketch-partitioned distinct: ONE corpus pass builds per-
      // (event_type, day) theta sketches; "distinct users over an
      // arbitrary day slice" is then a union of bucket sketches with
      // zero corpus re-reads (SketchesSpec plan-asserts no FileScan on
      // the query side). Exactness regime: every sketch holds far fewer
      // than 2^20 nominal entries, so theta stays 1 and union is a
      // literal hash-set union — asserted IN the plan (q44 convention):
      // each group carries the exact distinct count and any divergence
      // raises a named error rather than an opaque hash mismatch.
      val e = Tables(s, d).events
      def day(ts: Column) = dayBucket(ts)
      val bk = Sketches.thetaBuckets(e, Seq(col("event_type")),
        day(col("ts")), col("user_id"))
      val est = Sketches.distinctOver(bk, Seq("event_type"),
        col("bucket") % 3 =!= 1, out = "__a")
      val exact = e.where(day(col("ts")) % 3 =!= 1)
        .select(col("event_type"), col("user_id")).distinct()
        .groupBy("event_type").agg(count(lit(1)).as("__e"))
      est.join(exact, Seq("event_type"))
        .select(col("event_type"),
          when(col("__a") =!= col("__e"), raise_error(concat(
            lit("q154 exactness regime broke: sketch="), col("__a").cast("string"),
            lit(" exact="), col("__e").cast("string"))).cast("long"))
            .otherwise(col("__a")).as("users"))
    }),
    "q155_sketch_overlap" -> ((s, d) => {
      // sketch SET ALGEBRA the plain distinct count cannot answer
      // without a re-scan: from the same standing bucket table, how
      // many users are active on BOTH even and odd days (in_both), and
      // how many churn either way (only_a / only_b) — theta
      // intersection/difference per event_type over bucket-sketch
      // unions. Exact in the same regime, and the gate carries the
      // exact per-user replay alongside and raises on any divergence.
      val e = Tables(s, d).events
      def day(ts: Column) = dayBucket(ts)
      val bk = Sketches.thetaBuckets(e, Seq(col("event_type")),
        day(col("ts")), col("user_id"))
      val est = Sketches.overlapOver(bk, Seq("event_type"),
        col("bucket") % 2 === 0, col("bucket") % 2 === 1)
      val exact = e
        .select(col("event_type"), col("user_id"),
          (day(col("ts")) % 2 === 0).as("__ea"), (day(col("ts")) % 2 === 1).as("__eb"))
        .groupBy("event_type", "user_id")
        .agg(max(col("__ea")).as("__ia"), max(col("__eb")).as("__ib"))
        .groupBy("event_type")
        .agg(sum(when(col("__ia") && col("__ib"), 1L).otherwise(0L)).as("__both"),
          sum(when(col("__ia") && !col("__ib"), 1L).otherwise(0L)).as("__oa"),
          sum(when(col("__ib") && !col("__ia"), 1L).otherwise(0L)).as("__ob"),
          sum(when(col("__ia"), 1L).otherwise(0L)).as("__at"),
          sum(when(col("__ib"), 1L).otherwise(0L)).as("__bt"))
      def gated = exactnessGate("q155") _
      est.join(exact, Seq("event_type"))
        .select(col("event_type"),
          gated("in_both", "__both", "in_both"),
          gated("only_a", "__oa", "only_a"),
          gated("only_b", "__ob", "only_b"),
          gated("a_total", "__at", "a_total"),
          gated("b_total", "__bt", "b_total"))
    }),
    "q156_quota_stream" -> ((s, d) => {
      // continuous per-source token-budget admission: documents arrive
      // in 4 doc_id-ordered micro-batches and each source's stream is
      // truncated at the 5000-char budget line
      // (Sampling.quotaFillStream — per-domain state is ONE long). In
      // the in-key-order replay regime the admitted set equals the
      // batch window prefix-sum truncation, which is the DuckDB oracle.
      val docs = Tables(s, d).documents
      withShufflePartitions(s, 4) {
        val stage = screenReplayDir(s"$d#q156",
          docs.select(col("doc_id"), col("source"), col("n_chars")),
          col("doc_id"), 4)
        val stream = graft.streaming.Replay.orderedStream(s, stage,
          docs.select(col("doc_id"), col("source"), col("n_chars")).schema)
        val out = Sampling.quotaFillStream(stream, col("source"),
          col("doc_id"), col("n_chars"), budget = 5000L)
        val q = out.writeStream.format("memory").queryName("graft_q156_quota")
          .outputMode("append").start()
        try q.processAllAvailable() finally q.stop()
        s.table("graft_q156_quota")
      }
    }),
    "q157_quantile_rollup" -> ((s, d) => {
      // mergeable quantile roll-up — the KLL twin of q154: per-
      // (event_type, weekday, day) KLL sketches built in ONE corpus
      // pass answer "the value distribution per type and weekday over
      // an arbitrary day slice" by merging bucket sketches, never
      // re-reading events. Exactness regime: merged item counts stay
      // ≤ k = 65535 (≈11k per group at sf0.1), so every sketch is
      // uncompacted and the INCLUSIVE-rank quantile equals SQL
      // percentile_disc — asserted in-plan against the exact percentile
      // (which doubles as the regime guard at any future SF).
      val e = Tables(s, d).events
      def day(ts: Column) = dayBucket(ts)
      val qb = Sketches.kllBuckets(e,
        Seq(col("event_type"), (day(col("ts")) % 7).as("dow")),
        day(col("ts")), floor(col("value")), k = 65535)
      val est = Sketches.quantilesOver(qb, Seq("event_type", "dow"),
        col("bucket") % 3 =!= 1, Seq(0.5, 0.9), k = 65535)
      val exact = e.where(day(col("ts")) % 3 =!= 1)
        .select(col("event_type"), (day(col("ts")) % 7).as("dow"),
          floor(col("value")).cast("long").as("fv"))
        .groupBy("event_type", "dow")
        .agg(expr("CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY fv) AS BIGINT)").as("__e50"),
          expr("CAST(percentile_disc(0.9) WITHIN GROUP (ORDER BY fv) AS BIGINT)").as("__e90"))
      def gated = exactnessGate("q157") _
      est.join(exact, Seq("event_type", "dow"))
        .select(col("event_type"), col("dow"),
          gated("p50", "__e50", "p50"), gated("p90", "__e90", "p90"))
    }),
    "q158_distinct_stream" -> ((s, d) => {
      // q154's STREAMING form: a continuously-maintained distinct-users
      // count per event_type — update-mode running theta sketch over
      // the 8-slice ordered event replay. Per-group state is the
      // sketch (≤8·distinct bytes), NEVER the user set as rows; the
      // estimate is monotone per group so the final snapshot is the
      // MAX over the update log (ordering-free), and in the exact
      // regime it equals the batch distinct count — enforced in-plan
      // against the exact side (q44 convention), oracle = plain
      // COUNT(DISTINCT).
      val updates = withShufflePartitions(s, 4) {
        val out = Sketches.runningDistinct(eventsReplayStream(s, d),
          Seq(col("event_type")), col("user_id"))
        val q = out.writeStream.format("memory").queryName("graft_q158_distinct")
          .outputMode("update").start()
        try q.processAllAvailable() finally q.stop()
        s.table("graft_q158_distinct")
      }
      val fin = updates.groupBy("event_type")
        .agg(max(col("distinct_count")).as("__a"))
      val exact = Tables(s, d).events
        .select(col("event_type"), col("user_id")).distinct()
        .groupBy("event_type").agg(count(lit(1)).as("__e"))
      fin.join(exact, Seq("event_type"))
        .select(col("event_type"),
          when(col("__a") =!= col("__e"), raise_error(concat(
            lit("q158 exactness regime broke: sketch="), col("__a").cast("string"),
            lit(" exact="), col("__e").cast("string"))).cast("long"))
            .otherwise(col("__a")).as("users"))
    }),
    "q159_topk_rollup" -> ((s, d) => {
      // heavy-hitters roll-up — the frequent-items member of the
      // standing-sketch family (theta q154, KLL q157): per-(lang,
      // source) approx_top_k accumulate sketches built in ONE corpus
      // pass answer "top tokens per lang over any source slice" by
      // COMBINING sketches, zero corpus re-reads. q64's exactness
      // regime (capacity 10k ≫ the 31-word vocab — combine preserves
      // it since the item union still fits) plus the deterministic
      // (count desc, item asc) re-rank make the plain GROUP BY truth
      // the oracle.
      val docs = Tables(s, d).documents
      val tb = Sketches.topKBuckets(
        docs.select(col("lang"), col("source"),
          explode(Stateless.tokens(col("text"))).as("w")),
        Seq(col("lang")), col("source"), col("w"))
      Sketches.topKOver(tb, Seq("lang"), col("bucket").rlike("[02468]$"), k = 5)
        .select(col("lang"), col("item"), col("cnt"), col("rk").cast("long").as("rk"))
    }),
    "q160_view_maintain_stream" -> ((s, d) => {
      // q153's CONTINUOUS form: the SAME changelog (viewMaintainInput)
      // arrives as 4 orderkey-ordered micro-batches and folds into the
      // PERSISTED view via Diff.maintainAggStream — per trigger the
      // batch collapses to key deltas, broadcasts, and merges through
      // two narrow scans of the current view, landing with the
      // advanced batch ledger in one crash-safe swap. Deltas are
      // additive and commutative per key, so the final view is
      // slicing-independent and equals q153's one-shot refresh (oracle
      // = viewMaintainOracle, shared); bench re-runs replay batch ids
      // the ledger already holds, so they are no-ops and the standing
      // view stays correct (exactly-once under redelivery, the q144
      // posture).
      val (base, changes) = viewMaintainInput(s, d)
      val path = q160ViewCache.computeIfAbsent(d, { _ =>
        val p = graft.core.TempDirs.create("graft_q160_view")
        Diff.initView(base.groupBy("o_custkey")
          .agg(count(lit(1)).as("cnt"), sum("o_totalprice").as("total")), p)
        p
      })
      withShufflePartitions(s, 4) {
        val stage = screenReplayDir(s"$d#q160", changes, col("o_orderkey"), 4)
        val stream = graft.streaming.Replay.orderedStream(s, stage, changes.schema)
        val q = Diff.maintainAggStream(s, stream, path, Seq("o_custkey"),
          "op", "cnt", Seq("total" -> "p"), ephemeralOk = true)
        try q.processAllAvailable() finally q.stop()
      }
      Diff.readView(s, path)
        .select(col("o_custkey"), col("cnt"), col("total").cast("double").as("total"))
    }),
    "q161_sketch_ingest_stream" -> ((s, d) => {
      // q154's standing table made CONTINUOUS (the q144 ingest-then-
      // query lifecycle for distinct analytics): the store starts from
      // the even-event_id half, the odd half arrives in 4 ordered
      // micro-batches, each folding batch-sized sketches into the
      // persisted bucket table through the SwapStore ledger (re-runs
      // replay applied batch ids — no-ops). Sketch union is
      // associative and idempotent-per-value, so the grown store
      // answers q154's slice EXACTLY as a one-shot build over all
      // events would — same oracle, same in-plan exactness assert.
      val e = Tables(s, d).events
      def day(ts: Column) = dayBucket(ts)
      val path = q161StoreCache.computeIfAbsent(d, { _ =>
        val p = graft.core.TempDirs.create("graft_q161_store")
        Sketches.initThetaStore(e.where(col("event_id") % 2 === 0),
          Seq(col("event_type")), day(col("ts")), col("user_id"), p)
        p
      })
      withShufflePartitions(s, 4) {
        val stage = screenReplayDir(s"$d#q161",
          e.where(col("event_id") % 2 === 1)
            .select(col("event_id"), col("event_type"), col("user_id"), col("ts")),
          col("event_id"), 4)
        val stream = graft.streaming.Replay.orderedStream(s, stage,
          e.select(col("event_id"), col("event_type"), col("user_id"), col("ts")).schema)
        val q = Sketches.ingestThetaStream(s, stream, Seq(col("event_type")),
          day(col("ts")), col("user_id"), path, ephemeralOk = true)
        try q.processAllAvailable() finally q.stop()
      }
      val est = Sketches.distinctOver(Sketches.readThetaStore(s, path),
        Seq("event_type"), col("bucket") % 3 =!= 1, out = "__a")
      val exact = e.where(day(col("ts")) % 3 =!= 1)
        .select(col("event_type"), col("user_id")).distinct()
        .groupBy("event_type").agg(count(lit(1)).as("__e"))
      est.join(exact, Seq("event_type"))
        .select(col("event_type"),
          when(col("__a") =!= col("__e"), raise_error(concat(
            lit("q161 exactness regime broke: sketch="), col("__a").cast("string"),
            lit(" exact="), col("__e").cast("string"))).cast("long"))
            .otherwise(col("__a")).as("users"))
    }),
    "q162_kll_ingest_stream" -> ((s, d) => {
      // q157's standing table made CONTINUOUS — the quantile member of
      // the sketch-store family (theta q161, heavy-hitters q163): the
      // per-(event_type, weekday, day) KLL store starts from the
      // even-event_id half, the odd half folds in over 4 ordered
      // micro-batches through the SwapStore ledger. Merging uncompacted
      // sketches is lossless, so the grown store answers q157's slice
      // quantiles EXACTLY like a one-shot build — same oracle, same
      // in-plan percentile_disc assert.
      val e = Tables(s, d).events
      def day(ts: Column) = dayBucket(ts)
      def prep(df: DataFrame) = df.select(col("event_id"), col("event_type"),
        (day(col("ts")) % 7).as("dow"), day(col("ts")).as("day"),
        floor(col("value")).cast("long").as("fv"))
      val path = q162StoreCache.computeIfAbsent(d, { _ =>
        val p = graft.core.TempDirs.create("graft_q162_store")
        Sketches.initKllStore(prep(e.where(col("event_id") % 2 === 0)),
          Seq(col("event_type"), col("dow")), col("day"), col("fv"), p, k = 65535)
        p
      })
      withShufflePartitions(s, 4) {
        val stage = screenReplayDir(s"$d#q162",
          prep(e.where(col("event_id") % 2 === 1)), col("event_id"), 4)
        val stream = graft.streaming.Replay.orderedStream(s, stage,
          prep(e).schema)
        val q = Sketches.ingestKllStream(s, stream,
          Seq(col("event_type"), col("dow")), col("day"), col("fv"), path,
          k = 65535, ephemeralOk = true)
        try q.processAllAvailable() finally q.stop()
      }
      val est = Sketches.quantilesOver(Sketches.readKllStore(s, path),
        Seq("event_type", "dow"), col("bucket") % 3 =!= 1, Seq(0.5, 0.9), k = 65535)
      val exact = prep(e).where(col("day") % 3 =!= 1)
        .groupBy("event_type", "dow")
        .agg(expr("CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY fv) AS BIGINT)").as("__e50"),
          expr("CAST(percentile_disc(0.9) WITHIN GROUP (ORDER BY fv) AS BIGINT)").as("__e90"))
      def gated = exactnessGate("q162") _
      est.join(exact, Seq("event_type", "dow"))
        .select(col("event_type"), col("dow"),
          gated("p50", "__e50", "p50"), gated("p90", "__e90", "p90"))
    }),
    "q163_topk_ingest_stream" -> ((s, d) => {
      // q159's standing table made CONTINUOUS: the per-(lang, source)
      // frequent-items store starts from the even-doc_id half; odd
      // docs arrive (pre-exploded to words, sliced by doc_id) in 4
      // micro-batches and COMBINE into the store. In the capacity
      // regime the grown store's deterministic top-5 equals the plain
      // GROUP BY truth over all documents — q159's oracle.
      val docs = Tables(s, d).documents
      def prep(df: DataFrame) = df.select(col("doc_id"), col("lang"),
        col("source"), explode(Stateless.tokens(col("text"))).as("w"))
      val path = q163StoreCache.computeIfAbsent(d, { _ =>
        val p = graft.core.TempDirs.create("graft_q163_store")
        Sketches.initTopKStore(prep(docs.where(col("doc_id") % 2 === 0)),
          Seq(col("lang")), col("source"), col("w"), p)
        p
      })
      withShufflePartitions(s, 4) {
        val stage = screenReplayDir(s"$d#q163",
          prep(docs.where(col("doc_id") % 2 === 1)), col("doc_id"), 4)
        val stream = graft.streaming.Replay.orderedStream(s, stage,
          prep(docs).schema)
        val q = Sketches.ingestTopKStream(s, stream, Seq(col("lang")),
          col("source"), col("w"), path, ephemeralOk = true)
        try q.processAllAvailable() finally q.stop()
      }
      Sketches.topKOver(Sketches.readTopKStore(s, path), Seq("lang"),
          col("bucket").rlike("[02468]$"), k = 5)
        .select(col("lang"), col("item"), col("cnt"), col("rk").cast("long").as("rk"))
    }),
    "q164_catalog_ingest" -> ((s, d) => {
      // ATOMIC MULTI-STORE INGESTION under one shared batch ledger —
      // the honest version of the reference's claimed-but-sequential
      // transactional checkpoint commit (jobmanager/
      // checkpoint_coordinator.py:485-527): each admitted batch folds
      // into THREE standing sketch stores (theta distinct-users, KLL
      // value quantiles, frequent-user top-k, all per event_type) via
      // Catalog.ingest, whose single manifest swap makes the fold
      // all-or-nothing. The build INJECTS A CRASH mid-batch-1 (two of
      // three store generations written, manifest untouched), asserts
      // the catalog still answers pre-batch, then replays batch 1 —
      // the foreachBatch restart path — before batch 2. The gate then
      // answers all three questions FROM THE STORES, exactness-gated
      // in-plan, while the oracle re-derives every answer from the raw
      // events: any torn or double-applied fold in any store breaks
      // the compare.
      val e = Tables(s, d).events
      val base = q164CatalogCache.computeIfAbsent(d, { _ =>
        val p = graft.core.TempDirs.create("graft_q164_catalog")
        catalogInit(p, catalogPrep(e.where(col("event_id") % 2 === 0)))
        // the odd half arrives as three admitted batches (odd event_ids
        // have event_id % 6 in {1, 3, 5})
        def slice(i: Int) = catalogPrep(e.where(col("event_id") % 6 === 2 * i + 1))
        withShufflePartitions(s, 4) {
          graft.core.Catalog.ingest(s, p, 0L, slice(0), catalogFolds)
          try graft.core.Catalog.ingestImpl(s, p, 1L, slice(1), catalogFolds,
            failAfter = 2)
          catch { case _: IllegalStateException => () }
          require(graft.core.Catalog.lastBatch(s, p) == 0L,
            "q164: a torn batch must never become visible")
          graft.core.Catalog.ingest(s, p, 1L, slice(1), catalogFolds)
          graft.core.Catalog.ingest(s, p, 2L, slice(2), catalogFolds)
        }
        p
      })
      catalogAnswers(s, d, base, "q164")
    }),
    "q168_catalog_ingest_stream" -> ((s, d) => {
      // q164's CONTINUOUS form: the same three-store catalog, with the
      // odd half arriving as 4 ordered micro-batches through
      // Catalog.ingestStream — every trigger folds into ALL three
      // stores and lands behind the ONE manifest swap (all-or-nothing
      // per trigger; bench re-runs re-deliver applied batch ids, which
      // the shared ledger no-ops). Work per trigger is batch-sized plus
      // the three tiny bucket tables; the events already summarized are
      // never revisited. Oracle = q164's rebuild-from-scratch answers.
      val e = Tables(s, d).events
      val base = q168CatalogCache.computeIfAbsent(d, { _ =>
        val p = graft.core.TempDirs.create("graft_q168_catalog")
        catalogInit(p, catalogPrep(e.where(col("event_id") % 2 === 0)))
        withShufflePartitions(s, 4) {
          val stage = screenReplayDir(s"$d#q168",
            catalogPrep(e.where(col("event_id") % 2 === 1)), col("event_id"), 4)
          val stream = graft.streaming.Replay.orderedStream(s, stage,
            catalogPrep(e).schema)
          val q = graft.core.Catalog.ingestStream(s, stream, p, catalogFolds,
            ephemeralOk = true)
          try q.processAllAvailable() finally q.stop()
        }
        p
      })
      catalogAnswers(s, d, base, "q168")
    }),
    "q169_admission_pipeline" -> ((s, d) => {
      // END-TO-END CORPUS ADMISSION — the composition the standing
      // pieces exist for: every arriving batch passes ALL screens
      // (first-occurrence-wins exact dedup against the standing
      // fingerprint store; 3-gram containment decontamination against
      // the broadcast benchmark set) or is turned away, and the
      // admitted rows fold ATOMICALLY into three catalog stores
      // (fingerprint set, per-source stats, per-source vocabulary
      // top-k) under the shared ledger. The corpus is the non-benchmark
      // documents PLUS a planted echo of every one (+100000 ids, same
      // text), delivered as four ascending-id batches — every echo
      // arrives batches after its original and must be rejected by the
      // CROSS-BATCH screen; the q66 contamination pair is rejected by
      // the decon screen. The oracle re-derives the admitted set (min
      // id per fingerprint class, minus contaminated) and the store
      // answers from scratch: any screen miss, torn fold, or
      // double-apply breaks the compare.
      val (corpus, bench) = admissionCorpus(s, d)
      val base = q169CatalogCache.computeIfAbsent(d, { _ =>
        val p = graft.core.TempDirs.create("graft_q169_catalog")
        admissionInit(p, corpus)
        withShufflePartitions(s, 4) {
          (0 until 4).foreach(
            admissionIngestBatch(s, p, corpus, bench, _, admissionFolds))
        }
        p
      })
      admissionAnswers(s, base)
    }),
    "q171_admission_stream" -> ((s, d) => {
      // q169's CONTINUOUS form — the admission front door as ONE
      // streaming query (Admission.ingestStream): each micro-batch
      // screens against the fingerprint store AS GROWN by the previous
      // trigger, then folds the admitted rows into all three stores
      // behind the one manifest swap. The replay slices the corpus by
      // doc_id span, so the originals arrive before the echo block and
      // the cross-batch dedup screen carries the rejections; re-runs
      // re-deliver applied batch ids, which return after one manifest
      // read. Oracle = q169's from-scratch derivation.
      val (corpus, bench) = admissionCorpus(s, d)
      val base = q171CatalogCache.computeIfAbsent(d, { _ =>
        val p = graft.core.TempDirs.create("graft_q171_catalog")
        admissionInit(p, corpus)
        withShufflePartitions(s, 4) {
          val stage = screenReplayDir(s"$d#q171", corpus, col("doc_id"), 4)
          val stream = graft.streaming.Replay.orderedStream(s, stage, corpus.schema)
          val q = Admission.ingestStream(s, p, "fps", stream,
            col("doc_id"), col("text"), bench, col("doc_id"), col("text"),
            admissionFolds, ephemeralOk = true)
          try q.processAllAvailable() finally q.stop()
        }
        p
      })
      admissionAnswers(s, base)
    }),
    "q172_admission_audit" -> ((s, d) => {
      // REJECTION LINEAGE — the audit form of the admission front
      // door: batch 0 (the originals) is ingested through the standing
      // catalog, then the echo block is AUDITED against the store
      // batch 0 grew — every row comes back with a verdict instead of
      // silently vanishing at an anti join. Echoes whose original (or
      // its lower-id text twin) was admitted → dup_standing; echo-
      // block fingerprint ties → dup_in_batch; echoes of CONTAMINATED
      // originals were never admitted, so their fingerprints are not
      // standing and they re-trip the containment screen →
      // contaminated. Output = per-source verdict counts, the
      // admission-rate dashboard a real pipeline watches; the oracle
      // re-derives every verdict from scratch.
      val (corpus, bench) = admissionCorpus(s, d)
      val base = q172CatalogCache.computeIfAbsent(d, { _ =>
        val p = graft.core.TempDirs.create("graft_q172_catalog")
        admissionInit(p, corpus)
        withShufflePartitions(s, 4) {
          val originals = corpus.where(col("doc_id") < 100000)
          Admission.ingest(s, p, 0L, Admission.screen(s, p, "fps",
            originals, col("doc_id"), col("text"),
            bench, col("doc_id"), col("text"),
            n = 3, threshold = 0.3), admissionFolds)
        }
        p
      })
      val echoes = corpus.where(col("doc_id") >= 100000)
      Admission.audit(s, base, "fps", echoes, col("doc_id"), col("text"),
          bench, col("doc_id"), col("text"), n = 3, threshold = 0.3)
        .groupBy(col("source"),
          coalesce(col("reason"), lit("admitted")).as("verdict"))
        .agg(count(lit(1)).as("n"))
    }),
    "q173_catalog_savepoint" -> ((s, d) => {
      // CATALOG TIME TRAVEL — a savepoint is a POINTER SET over the
      // immutable generations (store gens + the shared ledger), not a
      // copy: pinning a 100 TB catalog costs one manifest read, and
      // restore is two renames. The gate drives the full fork cycle
      // through q169's pipeline: ingest the FIRST original batch, PIN,
      // ingest the remaining three, RESTORE to the pin (ledger
      // rewinds, pinned generations must have survived three folds of
      // GC), then replay the tail from the fork. The pin sits BEFORE
      // batch 1 — the second half of the originals, which admits
      // hundreds of rows — so the post-restore replay re-folds real
      // data: a restore that rewound the ledger but failed to roll the
      // store generations back would double-fold batch 1 and break the
      // from-scratch oracle compare (as would a stale pin or a GC'd
      // generation).
      val (corpus, bench) = admissionCorpus(s, d)
      val base = q173CatalogCache.computeIfAbsent(d, { _ =>
        val p = graft.core.TempDirs.create("graft_q173_catalog")
        admissionInit(p, corpus)
        withShufflePartitions(s, 4) {
          def ingestBatch(i: Int): Unit =
            admissionIngestBatch(s, p, corpus, bench, i, admissionFolds)
          ingestBatch(0)
          graft.core.Catalog.savepoint(s, p, "after-first-batch")
          (1 until 4).foreach(ingestBatch)
          graft.core.Catalog.restore(s, p, "after-first-batch")
          require(graft.core.Catalog.lastBatch(s, p) == 0L,
            "q173: restore must rewind the ledger to the fork point")
          (1 until 4).foreach(ingestBatch)
        }
        p
      })
      admissionAnswers(s, base)
    }),
    "q175_admission_restart" -> ((s, d) => {
      // q171 ACROSS A STOP/RESTART — the reference's flagship recovery
      // claim applied to the whole admission catalog: the continuous
      // front door runs over the original batches, STOPS, more data
      // (the echo block) arrives while it is down, and a new query
      // restarts from the same durable checkpoint. Batch ids must
      // continue where the ledger left off (a fresh checkpoint would
      // silently no-op the new batches — the documented hazard), and
      // the standing fingerprint store must carry the pre-restart
      // screen decisions so the echoes are rejected cross-RESTART.
      // Oracle = q169's from-scratch derivation: any resume drift,
      // double-fold, or lost screen state breaks the compare.
      val (corpus, bench) = admissionCorpus(s, d)
      val base = q175CatalogCache.computeIfAbsent(d, { _ =>
        val p = graft.core.TempDirs.create("graft_q175_catalog")
        admissionInit(p, corpus)
        val stage = graft.core.TempDirs.create("graft_q175_replay")
        val ckpt = graft.core.TempDirs.create("graft_q175_ckpt")
        def run(): Unit = withShufflePartitions(s, 4) {
          val q = Admission.ingestStream(s, p, "fps",
            graft.streaming.Replay.orderedStream(s, stage, corpus.schema),
            col("doc_id"), col("text"), bench, col("doc_id"), col("text"),
            admissionFolds, checkpoint = Some(ckpt))
          try q.processAllAvailable() finally q.stop()
        }
        // phase A: the originals, two slices; then the query STOPS
        graft.streaming.Replay.writeOrderedSlices(
          corpus.where(col("doc_id") < 100000), col("doc_id"), stage, 2)
        run()
        require(graft.core.Catalog.lastBatch(s, p) == 1L,
          "q175: phase A must land batches 0 and 1")
        // phase B: the echo block arrives while the query is DOWN;
        // the restart resumes at batch id 2 from the durable checkpoint
        graft.streaming.Replay.appendSlice(stage,
          corpus.where(col("doc_id") >= 100000 && col("doc_id") < 100250), 2)
        graft.streaming.Replay.appendSlice(stage,
          corpus.where(col("doc_id") >= 100250), 3)
        run()
        require(graft.core.Catalog.lastBatch(s, p) == 3L,
          "q175: the restart must resume batch ids at 2, not restart at 0")
        p
      })
      admissionAnswers(s, base)
    }),
    "q176_catalog_addstore" -> ((s, d) => {
      // ADD AN INDEX TO A LIVE CORPUS — Catalog.addStore: the
      // per-(source, lang) stats store does not exist for the first
      // batch; it is added mid-stream with a BACKFILL derived from the
      // doc-level lineage store, then folds like a founding member.
      // The add sits BEFORE batch 1 — the second half of the
      // originals, which admits hundreds of rows — so the post-add
      // fold path carries real data: a broken fold (or a backfill
      // inconsistent with the ledger) breaks the compare against the
      // from-scratch oracle, which demands the store be
      // indistinguishable from one that existed from batch 0. 100 TB
      // shape: the backfill reads the lineage store's scalar rows,
      // never the corpus, and the manifest swap makes the store appear
      // atomically with a table already consistent with the ledger.
      val (corpus, bench) = admissionCorpus(s, d)
      val base = q176CatalogCache.computeIfAbsent(d, { _ =>
        val p = graft.core.TempDirs.create("graft_q176_catalog")
        admissionInit(p, corpus, withLineage = true)
        val langStatsFold: (String, (DataFrame, DataFrame) => DataFrame) =
          "lang_stats" -> ((cur, b) => cur.unionByName(
              b.groupBy(col("source"), col("lang")).agg(
                count(lit(1)).as("n_docs"),
                sum(TextAnalysis.tokenCount(col("text"))).as("n_tokens")))
            .groupBy(col("source"), col("lang")).agg(
              sum(col("n_docs")).as("n_docs"),
              sum(col("n_tokens")).as("n_tokens")))
        withShufflePartitions(s, 4) {
          admissionIngestBatch(s, p, corpus, bench, 0,
            admissionFolds :+ admissionLineageFold)
          graft.core.Catalog.addStore(s, p, "lang_stats",
            graft.core.Catalog.read(s, p, "docs")
              .groupBy(col("source"), col("lang")).agg(
                count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("n_tokens")))
          (1 until 4).foreach(admissionIngestBatch(s, p, corpus, bench, _,
            admissionFolds :+ admissionLineageFold :+ langStatsFold))
        }
        p
      })
      graft.core.Catalog.read(s, base, "lang_stats")
        .select(col("source"), col("lang"), col("n_docs"), col("n_tokens"))
    }),
    "q177_catalog_timetravel" -> ((s, d) => {
      // TIME-TRAVEL READS — Catalog.readAt: answer from the pinned
      // generations of a savepoint WITHOUT restoring, while the live
      // catalog has long since advanced. The gate pins after the first
      // batch, folds the remaining three (whose GC must leave the
      // pinned generations alone), and answers AS OF the pin — the
      // oracle is the from-scratch derivation over the first batch's
      // id span only. A GC'd pinned generation, a pin that drifted
      // with the live stores, or a manifest resolved live instead of
      // at the pin all break the compare. Cost model on a 100 TB
      // catalog: the snapshot view is pointer chasing — no data copied
      // at pin time, none at read time.
      val (corpus, bench) = admissionCorpus(s, d)
      val base = q177CatalogCache.computeIfAbsent(d, { _ =>
        val p = graft.core.TempDirs.create("graft_q177_catalog")
        admissionInit(p, corpus)
        withShufflePartitions(s, 4) {
          admissionIngestBatch(s, p, corpus, bench, 0, admissionFolds)
          graft.core.Catalog.savepoint(s, p, "asof-batch0")
          (1 until 4).foreach(
            admissionIngestBatch(s, p, corpus, bench, _, admissionFolds))
        }
        p
      })
      admissionAnswersFrom(graft.core.Catalog.readAt(s, base, "asof-batch0"))
    }),
    "q178_catalog_replicate" -> ((s, d) => {
      // DISASTER RECOVERY — Catalog.replicate: the full admission
      // catalog ships to a second base path as pointers plus
      // generation copies under a pinned snapshot, with a crash
      // injected after two of the three store copies and the re-run
      // converging on the SAME snapshot (already-complete copies skip
      // by their _SUCCESS markers; the cutover is one manifest swap).
      // The gate answers from the REPLICA: a torn copy, a stale
      // generation, or ledger drift breaks the from-scratch oracle.
      // 100 TB shape: replication cost is the changed stores' bytes
      // (generation diff against the replica's manifest, never catalog
      // size), the pin keeps the long copy phase stable against
      // concurrent primary folds and their GC, and the final call
      // proves convergence is a copy-free pointer compare.
      val (corpus, bench) = admissionCorpus(s, d)
      val rep = q178CatalogCache.computeIfAbsent(d, { _ =>
        val p = graft.core.TempDirs.create("graft_q178_primary")
        val r = graft.core.TempDirs.create("graft_q178_replica")
        admissionInit(p, corpus)
        withShufflePartitions(s, 4) {
          (0 until 4).foreach(
            admissionIngestBatch(s, p, corpus, bench, _, admissionFolds))
          try graft.core.Catalog.replicateImpl(s, p, r, full = false, failAfter = 2)
          catch { case _: IllegalStateException => () }
          graft.core.Catalog.replicate(s, p, r)
          require(graft.core.Catalog.lastBatch(s, r) == 3L,
            "q178: the cutover must carry the pinned ledger")
          require(graft.core.Catalog.replicate(s, p, r).isEmpty,
            "q178: a converged replica must copy nothing")
        }
        r
      })
      admissionAnswers(s, rep)
    }),
    "q179_catalog_logship" -> ((s, d) => {
      // LOG-SHIPPING REPLICATION — the steady-state complement to
      // q178's physical copy: bootstrap the replica physically at
      // batch 1, then catch up by replaying the RAW batches through
      // the SAME screen + folds. Determinism makes this state-machine
      // replication: the replica's standing fingerprint store equals
      // the primary's at the fork point, so every screen decision
      // replays identically, and the shared ledger makes re-delivery
      // exactly-once. Cost model at 100 TB: batch-sized work per
      // shipped batch, never store-sized — the mode a cross-region
      // follower runs between (rarer) physical syncs. Oracle = the
      // full from-scratch derivation over all four batches, answered
      // from the REPLICA: any bootstrap drift cascades into wrong
      // screen decisions downstream and breaks the compare.
      val (corpus, bench) = admissionCorpus(s, d)
      val rep = q179CatalogCache.computeIfAbsent(d, { _ =>
        val p = graft.core.TempDirs.create("graft_q179_primary")
        val r = graft.core.TempDirs.create("graft_q179_replica")
        admissionInit(p, corpus)
        withShufflePartitions(s, 4) {
          (0 until 2).foreach(
            admissionIngestBatch(s, p, corpus, bench, _, admissionFolds))
          graft.core.Catalog.replicate(s, p, r) // physical bootstrap at batch 1
          (2 until 4).foreach { i =>            // primary advances...
            admissionIngestBatch(s, p, corpus, bench, i, admissionFolds)
            admissionIngestBatch(s, r, corpus, bench, i, admissionFolds)
          }                                     // ...and the replica replays the log
          require(graft.core.Catalog.lastBatch(s, r) == 3L,
            "q179: the replayed log must advance the replica's ledger")
        }
        r
      })
      admissionAnswers(s, rep)
    }),
    "q181_catalog_follow" -> ((s, d) => {
      // CONTINUOUS FOLLOWER — Catalog.replicateStream: q178's DR sync
      // as a standing query beside the ingest, one incremental sync
      // per tick. The follower carries NO checkpoint by design:
      // replicate is idempotent and convergent, so a restarted
      // follower re-syncs from wherever both sides stand — gated by
      // stopping it mid-build and finishing under a fresh one. Each
      // sync ships only the generations the replica lacks (changed
      // bytes, never catalog size); convergence is verified with
      // CONTENT fingerprints (verifyReplica — a pointer compare
      // cannot see fork divergence), and the gate answers from the
      // REPLICA against the full from-scratch oracle.
      val (corpus, bench) = admissionCorpus(s, d)
      val rep = q181CatalogCache.computeIfAbsent(d, { _ =>
        val p = graft.core.TempDirs.create("graft_q181_primary")
        val r = graft.core.TempDirs.create("graft_q181_replica")
        admissionInit(p, corpus)
        implicit val sqlCtx = s.sqlContext
        import s.implicits._
        withShufflePartitions(s, 4) {
          def syncedBatches(range: Range): Unit = {
            val ticks =
              org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Int]
            val q = graft.core.Catalog.replicateStream(s, p, r,
              ticks = Some(ticks.toDF()))
            try range.foreach { i =>
              admissionIngestBatch(s, p, corpus, bench, i, admissionFolds)
              ticks.addData(i); q.processAllAvailable()
            } finally q.stop()
          }
          syncedBatches(0 until 2)
          syncedBatches(2 until 4) // a FRESH follower: nothing to recover
          require(graft.core.Catalog.lastBatch(s, r) == 3L,
            "q181: the follower must have synced the final batch")
          require(graft.core.Catalog.verifyReplica(s, p, r)
            .where(!col("consistent")).isEmpty,
            "q181: content fingerprints must verify every store")
        }
        r
      })
      admissionAnswers(s, rep)
    }),
    "q185_admission_follow" -> ((s, d) => {
      // THE DR CAPSTONE — a LIVE follower racing a continuous
      // admission stream: q171's front door folds the corpus while
      // Catalog.replicateStream syncs every 200 ms against the moving
      // primary. The mid-run syncs exercise the whole concurrency
      // surface for real — savepoint's consistent (gens, ledger)
      // capture beside live folds, pin-vs-GC survival, the dead-pin
      // self-heal, the pointer-compare fast path — and any torn pin
      // or stale copy would cut a corrupted snapshot over the replica.
      // After the ingest finishes, one deterministic final sync
      // converges the replica, content fingerprints verify every
      // store, and the gate answers FROM THE REPLICA against the
      // from-scratch oracle.
      val (corpus, bench) = admissionCorpus(s, d)
      val rep = q185CatalogCache.computeIfAbsent(d, { _ =>
        val p = graft.core.TempDirs.create("graft_q185_primary")
        val r = graft.core.TempDirs.create("graft_q185_replica")
        admissionInit(p, corpus)
        withShufflePartitions(s, 4) {
          val follower = graft.core.Catalog.replicateStream(s, p, r,
            intervalMs = 200)
          try {
            val stage = screenReplayDir(s"$d#q185", corpus, col("doc_id"), 4)
            val stream = graft.streaming.Replay.orderedStream(s, stage, corpus.schema)
            val q = Admission.ingestStream(s, p, "fps", stream,
              col("doc_id"), col("text"), bench, col("doc_id"), col("text"),
              admissionFolds, ephemeralOk = true)
            try q.processAllAvailable() finally q.stop()
          } finally follower.stop()
          graft.core.Catalog.replicate(s, p, r) // deterministic final sync
          require(graft.core.Catalog.lastBatch(s, r) == 3L,
            "q185: the converged replica must carry the final ledger")
          require(graft.core.Catalog.verifyReplica(s, p, r)
            .where(!col("consistent")).isEmpty,
            "q185: content fingerprints must verify every store after the race")
        }
        r
      })
      admissionAnswers(s, rep)
    }),
    "q180_catalog_vacuum" -> ((s, d) => {
      // STORAGE HYGIENE — Catalog.vacuum: crashed ingests strand
      // partial g<batch> dirs (batch 4 below dies after one store
      // write and never commits) and the per-fold GC keeps each
      // previous generation alive for racing readers; vacuum sweeps
      // everything that is neither current nor savepoint-pinned. The
      // gate pins after batch 0, builds out, strands an orphan,
      // vacuums, then answers BOTH live (oracle compare) and as-of
      // the pin (require) — a sweep that touched a referenced or a
      // pinned generation breaks one of the two. At 100 TB this is
      // the reclamation path that bounds catalog storage at
      // ~current + pins instead of one generation per batch ever run.
      val (corpus, bench) = admissionCorpus(s, d)
      val base = q180CatalogCache.computeIfAbsent(d, { _ =>
        val p = graft.core.TempDirs.create("graft_q180_catalog")
        admissionInit(p, corpus)
        withShufflePartitions(s, 4) {
          admissionIngestBatch(s, p, corpus, bench, 0, admissionFolds)
          graft.core.Catalog.savepoint(s, p, "pin0")
          (1 until 4).foreach(
            admissionIngestBatch(s, p, corpus, bench, _, admissionFolds))
          try graft.core.Catalog.ingestImpl(s, p, 4L,
            corpus.where(col("doc_id") < 0)
              .withColumn("__fp", TextAnalysis.fingerprint(col("text"))),
            admissionFolds, failAfter = 1)
          catch { case _: IllegalStateException => () }
          val swept = graft.core.Catalog.vacuum(s, p)
          require(swept.exists(_.endsWith("/g4")),
            "q180: the crashed batch's orphan generation must be swept")
          require(graft.core.Catalog.readAt(s, p, "pin0")("fps").count() > 0,
            "q180: the pinned snapshot must survive the sweep")
        }
        p
      })
      admissionAnswers(s, base)
    }),
    "q174_catalog_takedown" -> ((s, d) => {
      // ATOMIC TAKEDOWN — a retraction is an ingest whose folds
      // SUBTRACT. The catalog carries a doc-level lineage store
      // (doc_id, source, lang, fp, n_tokens) alongside fps/stats/
      // vocab; retracting a source derives the ticket FROM the lineage
      // store and folds the removal into every store under one ledger
      // batch — same all-or-nothing visibility as admission, so no
      // reader ever sees the source half-removed. Per-store cost:
      // lineage + fps are ticket-sized anti joins (admitted docs own
      // their fingerprint exclusively, so fp removal is exact and the
      // content becomes re-admittable); stats subtracts the ticket's
      // per-source aggregates and drops rows reaching zero; vocab's
      // top-k sketches are NOT invertible, but the store is bucketed
      // BY the takedown key, so retracting a source deletes its
      // bucket rows exactly — no corpus re-read (a finer-than-bucket
      // predicate would rebuild only the affected buckets). Oracle =
      // the from-scratch derivation minus the retracted source.
      val (corpus, bench) = admissionCorpus(s, d)
      val base = q174CatalogCache.computeIfAbsent(d, { _ =>
        val p = graft.core.TempDirs.create("graft_q174_catalog")
        admissionInit(p, corpus, withLineage = true)
        withShufflePartitions(s, 4) {
          (0 until 4).foreach(admissionIngestBatch(s, p, corpus, bench, _,
            admissionFolds :+ admissionLineageFold))
          val ticket = graft.core.Catalog.read(s, p, "docs")
            .where(col("source") === "src7")
          graft.core.Catalog.ingest(s, p, 4L, ticket, Admission.retractFolds())
        }
        p
      })
      admissionAnswers(s, base)
    }),
    "q170_view_minmax" -> ((s, d) => {
      // Insert-only materialized-view maintenance WITH min/max: under
      // an append-only changelog (the dominant lakehouse ingest shape)
      // the extremes ARE self-maintainable — the view's min/max fold
      // monotonically against each batch's extremes, while the in-plan
      // guard raises on any retraction op (q153's count/sum protocol
      // stays the full-retraction path). View = per-customer stats over
      // the %5-excluded orders; the held-out %5 rows arrive as +I
      // inserts; the maintained view must equal the re-aggregate over
      // ALL orders.
      val o = Tables(s, d).orders.select(col("o_orderkey"), col("o_custkey"),
        col("o_totalprice").cast("decimal(18,2)").as("p"))
      val view = o.where(col("o_orderkey") % 5 =!= 0)
        .groupBy("o_custkey").agg(count(lit(1)).as("cnt"),
          sum(col("p")).as("total"), min(col("p")).as("min_p"),
          max(col("p")).as("max_p"))
      val changes = o.where(col("o_orderkey") % 5 === 0)
        .withColumn("op", lit("+I"))
      Diff.maintainAgg(view, changes, Seq("o_custkey"), "op", "cnt",
          Seq("total" -> "p"), mins = Seq("min_p" -> "p"),
          maxs = Seq("max_p" -> "p"))
        .select(col("o_custkey"), col("cnt"),
          col("total").cast("double").as("total"),
          col("min_p").cast("double").as("min_p"),
          col("max_p").cast("double").as("max_p"))
    }),
    "q165_scd2_history" -> ((s, d) => {
      // Diff.scd2 oracle-gated (was spec-only, VERDICT-r10 #5): SCD-2
      // dimension history from the events changelog — each user's
      // purchase events, collapsed to one version per (user, ms) so
      // (key, seq) is total, become half-open validity intervals via
      // ONE keyed window pass (no self-join). Oracle = the same lead()
      // replay in DuckDB.
      val versions = Tables(s, d).events
        .where(col("event_type") === "purchase")
        .groupBy(col("user_id"), ms(col("ts")).as("vms"))
        .agg(max(col("value")).as("p_value"))
      Diff.scd2(versions, Seq("user_id"), "vms")
        .select(col("user_id"), col("vms"), col("p_value"),
          col("valid_to"), col("is_current").cast("int").as("is_current"))
    }),
    "q182_scd2_apply" -> ((s, d) => {
      // INCREMENTAL SCD-2 — Diff.scd2Apply: q165's dimension history
      // maintained by FOLDING a later changelog slice into a standing
      // history instead of rebuilding. The versions split at the
      // midpoint of their time range (per-key order holds because the
      // split is on the seq itself); the history builds over the
      // prefix, the suffix applies as a fold: close each affected
      // key's current row at its first new version, chain the batch,
      // union. The oracle IS q165's full-replay derivation — any
      // interval the fold closes at the wrong seq, double-applies, or
      // leaves open breaks the compare. Scale shape: the standing
      // history is touched only by a broadcast batch-key join (never
      // shuffled, never re-windowed); the suffix alone pays the keyed
      // window exchange — per-fold cost is batch-sized, not
      // history-sized.
      val versions = Tables(s, d).events
        .where(col("event_type") === "purchase")
        .groupBy(col("user_id"), ms(col("ts")).as("vms"))
        .agg(max(col("value")).as("p_value"))
      val bounds = versions.agg(min(col("vms")), max(col("vms"))).head
      val mid = (bounds.getLong(0) + bounds.getLong(1)) / 2
      val history =
        Diff.scd2(versions.where(col("vms") < mid), Seq("user_id"), "vms")
      Diff.scd2Apply(history, versions.where(col("vms") >= mid),
          Seq("user_id"), "vms")
        .select(col("user_id"), col("vms"), col("p_value"),
          col("valid_to"), col("is_current").cast("int").as("is_current"))
    }),
    "q183_scd2_stream" -> ((s, d) => {
      // CONTINUOUS SCD-2 — Diff.scd2Stream: q182's fold as a standing
      // streaming query over a PERSISTED history, ACROSS a stop/
      // restart. Three vms-ordered slices; the query stops after two,
      // the tail arrives while it is down, and the restart resumes
      // from the durable checkpoint — batch ids continue, the ledger
      // no-ops only true re-deliveries, and the final history must
      // equal q165's full rebuild (oracle). A fresh-checkpoint restart
      // would silently no-op the new batch (the documented hazard);
      // per-key version order holds across slices because the slicing
      // is by the seq itself.
      val store = q183StoreCache.computeIfAbsent(d, { _ =>
        val p = graft.core.TempDirs.create("graft_q183_store")
        val stage = graft.core.TempDirs.create("graft_q183_replay")
        val ckpt = graft.core.TempDirs.create("graft_q183_ckpt")
        val versions = Tables(s, d).events
          .where(col("event_type") === "purchase")
          .groupBy(col("user_id"), ms(col("ts")).as("vms"))
          .agg(max(col("value")).as("p_value"))
        graft.core.SwapStore.init(
          Diff.scd2(versions.where(lit(false)), Seq("user_id"), "vms"), p)
        val bounds = versions.agg(min(col("vms")), max(col("vms"))).head
        val mid = (bounds.getLong(0) + bounds.getLong(1)) / 2
        def run(): Unit = withShufflePartitions(s, 4) {
          val q = Diff.scd2Stream(s,
            graft.streaming.Replay.orderedStream(s, stage, versions.schema),
            p, Seq("user_id"), "vms", checkpoint = Some(ckpt))
          try q.processAllAvailable() finally q.stop()
        }
        graft.streaming.Replay.writeOrderedSlices(
          versions.where(col("vms") < mid), col("vms"), stage, 2)
        run()
        graft.streaming.Replay.appendSlice(stage,
          versions.where(col("vms") >= mid), 2)
        run()
        require(graft.core.SwapStore.lastBatch(s, p) == 2L,
          "q183: the restart must resume batch ids from the durable checkpoint")
        p
      })
      graft.core.SwapStore.read(s, store)
        .select(col("user_id"), col("vms"), col("p_value"),
          col("valid_to"), col("is_current").cast("int").as("is_current"))
    }),
    "q184_temporal_attach_stream" -> ((s, d) => {
      // CONTINUOUS POINT-IN-TIME ATTACH — Diff.temporalJoinStream over
      // a GROWING dimension: fact batch 1 attaches while only the
      // first half of the version history is folded (a click whose
      // as-of version arrives later comes back NULL), the second
      // scd2Apply fold lands BETWEEN triggers, and fact batch 2
      // attaches against the full history — attach-at-processing-time,
      // each fact stamped with the catalog as it stood on arrival.
      // Oracle: two ASOF branches (half dim for early facts, full dim
      // for late) with the same midpoint cuts computed in SQL — a
      // batch that saw the wrong store generation lands in the wrong
      // branch and breaks the compare.
      val outDir = q184OutCache.computeIfAbsent(d, { _ =>
        val e = Tables(s, d).events
        val versions = e.where(col("event_type") === "purchase")
          .groupBy(col("user_id"), ms(col("ts")).as("vms"))
          .agg(max(col("value")).as("p_value"))
        val facts = e.where(col("event_type") === "click")
          .select(col("event_id"), col("user_id"), ms(col("ts")).as("cms"))
        val vb = versions.agg(min(col("vms")), max(col("vms"))).head
        val dimMid = (vb.getLong(0) + vb.getLong(1)) / 2
        val fb = facts.agg(min(col("cms")), max(col("cms"))).head
        val factMid = (fb.getLong(0) + fb.getLong(1)) / 2
        val out = graft.core.TempDirs.create("graft_q184_out")
        withShufflePartitions(s, 8) {
          val dim = graft.core.TempDirs.create("graft_q184_dim")
          graft.core.SwapStore.init(
            Diff.scd2(versions.where(lit(false)), Seq("user_id"), "vms"), dim)
          graft.core.SwapStore.fold(s, dim, 0L)(h => Diff.scd2Apply(h,
            versions.where(col("vms") < dimMid), Seq("user_id"), "vms"))
          val stage = graft.core.TempDirs.create("graft_q184_replay")
          graft.streaming.Replay.writeOrderedSlices(
            facts.where(col("cms") < factMid), col("cms"), stage, 1)
          val stream = graft.streaming.Replay.orderedStream(s, stage, facts.schema)
          val q = Diff.temporalJoinStream(s, stream, dim, Seq("user_id"),
            "cms", "vms", "valid_to", Seq("p_value")) { b =>
            b.write.mode("append").parquet(out)
          }
          try {
            q.processAllAvailable()
            graft.core.SwapStore.fold(s, dim, 1L)(h => Diff.scd2Apply(h,
              versions.where(col("vms") >= dimMid), Seq("user_id"), "vms"))
            graft.streaming.Replay.appendSlice(stage,
              facts.where(col("cms") >= factMid), 1)
            q.processAllAvailable()
          } finally q.stop()
        }
        out
      })
      s.read.parquet(outDir)
    }),
    "q166_temporal_attach" -> ((s, d) => {
      // Diff.temporalJoin oracle-gated (was spec-only, VERDICT-r10 #5):
      // the point-in-time attach a training pipeline uses — every
      // click gets the purchase-version attributes valid AT ITS
      // event time. The dimension is q165's SCD-2 history with the
      // odd-ms versions REMOVED, leaving real gaps: a click landing in
      // a dropped version's interval must come back NULL (the retained
      // predecessor's valid_to excludes it) — the expired-version miss
      // branch. One union-plus-window keyed exchange, no join node;
      // oracle = DuckDB ASOF LEFT JOIN plus the same coverage CASE.
      val e = Tables(s, d).events
      val versions = e.where(col("event_type") === "purchase")
        .groupBy(col("user_id"), ms(col("ts")).as("vms"))
        .agg(max(col("value")).as("p_value"))
      val dim = Diff.scd2(versions, Seq("user_id"), "vms")
        .where(col("vms") % 2 === 0)
        .select(col("user_id"), col("vms"), col("valid_to"), col("p_value"))
      val facts = e.where(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), ms(col("ts")).as("cms"))
      Diff.temporalJoin(facts, dim, Seq("user_id"), "cms", "vms", "valid_to",
        Seq("p_value"))
    }),
    "q167_session_late_stream" -> ((s, d) => {
      // SESSION windows under OUT-OF-ORDER delivery — q130's
      // deterministic late-drop regime applied to the one windowed path
      // whose state MERGES. Same stage (q130Order slices, 240 h delay,
      // sentinel), but the drop rule is the session form pinned in
      // SessionLateSpec: a row is dropped iff its PROVISIONAL
      // single-event session end (ts + 30 min) ≤ the one-batch-lagged
      // watermark. Late survivors then merge into live per-user session
      // state. The batch-recompute oracle (sessions over exactly the
      // surviving rows) is valid because this geometry never lets a
      // survivor overlap an ALREADY-EMITTED session: when late slice i
      // arrives, sessions emitted so far ended ≤ the eviction watermark
      // of the previous batch == this batch's FILTER watermark (the
      // SPARK-40925 lag), and they came from slices ≥ two event-time
      // ranges below it — the newest emitted end sits a full slice span
      // (~3.75 d at sf0.01) below the oldest surviving ts, dwarfing the
      // 30 min bridge reach (SessionLateSpec pins what would happen if
      // this margin were violated: a second, overlapping session).
      // ts is ms-truncated BEFORE the watermark (q23/q126's precision
      // rule) so gap splits and watermark stats are engine-exact.
      withShufflePartitions(s, 8) {
        val stream = graft.streaming.Replay.orderedStream(s,
            shuffledReplayDir(s, d),
            Tables(s, d).events.select(replayCols: _*).schema)
          .withColumn("ts", timestamp_millis(unix_millis(col("ts"))))
        val out = stream.withWatermark("ts", "240 hours")
          .where(col("ts") < sentinelCutoff)
          .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
          .agg(count(lit(1)).as("n_events"))
          .select(unix_millis(col("session_window.start")).as("session_start_ms"),
            col("user_id"), col("n_events"))
        val q = out.writeStream.format("memory").queryName("graft_q167_sessions")
          .outputMode("append").start()
        try q.processAllAvailable() finally q.stop()
      }
      s.table("graft_q167_sessions")
    }),
  )
}
