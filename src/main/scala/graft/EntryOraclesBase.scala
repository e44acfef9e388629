package graft

/** The per-query DuckDB oracle bodies behind [[SparkEntry.oracleSql]]
  * — the batch half; [[EntryOraclesExt]] layers the streaming aliases
  * on top. Split out of SparkEntry purely for navigability.
  */
private[graft] object EntryOraclesBase {
  import graft.EntryHelpers._

  val base: Map[String, String] = Map(
    "q01_map_project" ->
      """SELECT l_orderkey, l_linenumber,
        |CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS net_price
        |FROM lineitem""".stripMargin,
    "q02_filter" ->
      """SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
        |WHERE l_shipdate < TIMESTAMP '1998-01-01' AND l_quantity > 30""".stripMargin,
    "q03_flatmap_tokens" ->
      """SELECT doc_id, word FROM (
        |  SELECT doc_id, unnest(string_split_regex(lower(text), '\s+')) AS word FROM documents
        |) WHERE word <> ''""".stripMargin,
    "q04_wordcount" ->
      """SELECT word, count(*) AS cnt FROM (
        |  SELECT unnest(string_split_regex(lower(text), '\s+')) AS word FROM documents
        |) WHERE word <> '' GROUP BY word HAVING count(*) > 5""".stripMargin,
    "q05_keyed_stats" ->
      """SELECT user_id, count(*) AS cnt,
        |CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_v,
        |CAST(min(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS min_v,
        |CAST(max(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS max_v,
        |CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_v
        |FROM events GROUP BY user_id""".stripMargin,
    "q06_agg_pricing" ->
      """SELECT l_returnflag, l_linestatus,
        |CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
        |CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_qty,
        |count(*) AS count_order
        |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin,
    "q07_distinct" ->
      "SELECT DISTINCT user_id, event_type FROM events",
    "q08_dedup_keyfirst" ->
      """SELECT user_id, event_type, min(event_id) AS first_event_id, count(*) AS n
        |FROM events GROUP BY user_id, event_type""".stripMargin,
    "q09_topk" ->
      """SELECT event_id, user_id, value FROM events
        |ORDER BY value DESC, event_id ASC LIMIT 100""".stripMargin,
    "q10_except" ->
      """SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'
        |EXCEPT SELECT DISTINCT user_id FROM events WHERE event_type = 'error' AND value > 195""".stripMargin,
    "q11_intersect" ->
      """SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'
        |INTERSECT SELECT DISTINCT user_id FROM events WHERE event_type = 'signup'""".stripMargin,
    "q12_union" ->
      """SELECT event_id, user_id FROM events WHERE event_type = 'purchase'
        |UNION ALL SELECT event_id, user_id FROM events WHERE event_type = 'signup'""".stripMargin,
    "q13_join_inner" ->
      """SELECT c_mktsegment, count(*) AS n_orders,
        |CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment""".stripMargin,
    "q14_join_broadcast" ->
      """SELECT r_name, count(*) AS n_cust,
        |CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS acctbal
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name""".stripMargin,
    "q15_join_semi" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""".stripMargin,
    "q16_join_anti" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 400000)""".stripMargin,
    "q17_join_outer" ->
      """SELECT n_name, count(c_custkey) AS n_cust
        |FROM nation LEFT JOIN customer ON n_nationkey = c_nationkey
        |GROUP BY n_name""".stripMargin,
    "q18_window_rank" ->
      """SELECT event_id, user_id,
        |row_number() OVER (PARTITION BY user_id ORDER BY epoch_ms(ts), event_id) AS rn,
        |rank() OVER (PARTITION BY user_id ORDER BY value DESC) AS val_rank
        |FROM events""".stripMargin,
    "q19_window_lag" ->
      """SELECT event_id, user_id,
        |epoch_ms(ts) - lag(epoch_ms(ts), 1) OVER (PARTITION BY user_id ORDER BY epoch_ms(ts), event_id) AS gap_ms
        |FROM events""".stripMargin,
    "q20_window_running" ->
      """SELECT event_id, user_id,
        |CAST(sum(CAST(value AS DECIMAL(18,2))) OVER (PARTITION BY user_id ORDER BY epoch_ms(ts), event_id
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_sum
        |FROM events""".stripMargin,
    "q21_tumbling" ->
      """SELECT (epoch_ms(ts) // 3600000) * 3600000 AS win_start_ms, event_type,
        |count(*) AS cnt, CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_v
        |FROM events GROUP BY 1, 2""".stripMargin,
    "q22_sliding" ->
      """SELECT (epoch_ms(ts) // 1200000 - k.k) * 1200000 AS win_start_ms, event_type,
        |count(*) AS cnt, CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_v
        |FROM events, (VALUES (0),(1),(2)) k(k)
        |GROUP BY 1, 2""".stripMargin,
    "q23_session" ->
      """WITH e AS (SELECT user_id, epoch_ms(ts) AS ems FROM events),
        |d AS (SELECT user_id, ems,
        |  CASE WHEN lag(ems) OVER (PARTITION BY user_id ORDER BY ems) IS NULL
        |         OR ems - lag(ems) OVER (PARTITION BY user_id ORDER BY ems) >= 1800000
        |       THEN 1 ELSE 0 END AS new_s FROM e),
        |s AS (SELECT user_id, ems,
        |  sum(new_s) OVER (PARTITION BY user_id ORDER BY ems ROWS UNBOUNDED PRECEDING) AS sid FROM d)
        |SELECT min(ems) AS session_start_ms, user_id, count(*) AS n_events
        |FROM s GROUP BY user_id, sid""".stripMargin,
    "q24_interval_join" ->
      """SELECT p.event_id AS purchase_id, c.event_id AS click_id,
        |epoch_ms(p.ts) - epoch_ms(c.ts) AS delta_ms
        |FROM events p JOIN events c
        |ON p.user_id = c.user_id AND p.event_type = 'purchase' AND c.event_type = 'click'
        |AND abs(epoch_ms(p.ts) - epoch_ms(c.ts)) <= 21600000""".stripMargin,
    "q25_scalar_json" ->
      """SELECT CAST(json_extract_string(props, '$.k') AS INTEGER) AS k, count(*) AS cnt
        |FROM events GROUP BY 1""".stripMargin,
    "q26_scalar_datetime" ->
      """SELECT EXTRACT(year FROM o_orderdate) AS yr, EXTRACT(month FROM o_orderdate) AS mo,
        |count(*) AS n, CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM orders GROUP BY 1, 2""".stripMargin,
    "q27_scalar_string" ->
      """SELECT c_custkey, upper(c_name) AS name_up, length(c_name) AS name_len,
        |substring(c_name, 1, 8) AS name_pfx,
        |CAST(contains(c_name, '1') AS INTEGER) AS has_one
        |FROM customer""".stripMargin,
    "q28_fileop_filter" ->
      "SELECT event_id, user_id, value FROM events WHERE event_type = 'purchase'",
    "q29_fileop_transform" ->
      """SELECT n_nationkey, upper(n_name) AS n_name, n_regionkey,
        |'2024-01-01T00:00:00' AS _processed_at FROM nation""".stripMargin,
    "q30_fileop_aggregate" ->
      """SELECT event_type,
        |CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS agg_value
        |FROM events GROUP BY event_type""".stripMargin,
    "q31_fileop_anomaly" ->
      "SELECT event_id, value > 180.0 AS is_anomaly FROM events",
    "q32_text_quality" ->
      """WITH t AS (SELECT doc_id, n_chars,
        |  list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '') AS toks FROM documents)
        |SELECT doc_id, len(toks) AS n_tokens,
        |CAST(list_sum(list_transform(toks, x -> length(x))) AS DOUBLE) / greatest(len(toks), 1) AS mean_tok_len,
        |CAST(len(list_filter(toks, x -> list_contains(['the','a','an','and','or','of','to','in','is','it','for','on','with','as','at','by','be','this','that','are'], x))) AS DOUBLE) / greatest(len(toks), 1) AS stop_ratio,
        |len(toks) >= 5 AND (CAST(list_sum(list_transform(toks, x -> length(x))) AS DOUBLE) / greatest(len(toks), 1)) > 2
        |  AND (CAST(list_sum(list_transform(toks, x -> length(x))) AS DOUBLE) / greatest(len(toks), 1)) < 12 AS quality_keep
        |FROM t""".stripMargin,
    "q34_text_fingerprint" ->
      """SELECT md5(array_to_string(list_filter(string_split_regex(lower(text), '\s+'), x -> x <> ''), ' ')) AS fp,
        |min(doc_id) AS keep_id, count(*) AS n_dups
        |FROM documents GROUP BY 1""".stripMargin,
    "q33_distinct_per_key" ->
      "SELECT event_type, count(DISTINCT user_id) AS n_distinct FROM events GROUP BY event_type",
    "q35_token_count" ->
      """SELECT source, count(*) AS n_docs,
        |CAST(sum(len(list_filter(string_split_regex(lower(text), '\s+'), x -> x <> ''))) AS BIGINT) AS n_tokens
        |FROM documents GROUP BY source""".stripMargin,
    "q36_rollup" ->
      """SELECT r_name, n_name, count(*) AS cnt,
        |CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_v
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP (r_name, n_name)""".stripMargin,
    "q40_reduce" ->
      """SELECT user_id, event_id, value FROM (
        |  SELECT user_id, event_id, value,
        |  row_number() OVER (PARTITION BY user_id ORDER BY value DESC, event_id ASC) AS rk
        |  FROM events) WHERE rk = 1""".stripMargin,
    "q41_cube" ->
      """SELECT o_orderstatus, o_orderpriority, count(*) AS cnt,
        |CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_v
        |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)""".stripMargin,
    "q46_regex_tokens" ->
      """SELECT doc_id, CAST(len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS BIGINT) AS n_regex_tokens
        |FROM documents""".stripMargin,
    "q47_rolling_fingerprint" ->
      // full replay of the winnowing kernel (KernelOps.rollingFingerprint,
      // engine-portable by construction): token hash = seed-7 polynomial
      // fold of Unicode code points, window hash = same base-B polynomial
      // over token hashes, fingerprint = SIGNED min across windows. All
      // in HUGEINT mod-2^64 arithmetic; the 64-bit wrap-around multiply
      // splits into 32-bit halves (x·y mod 2^64 = lo·lo + ((hi·lo +
      // lo·hi) mod 2^32)·2^32), and the literal list holds B^0..B^4
      // mod 2^64 so each window is one list_sum — no modpow loop.
      """WITH t AS (
        |  SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '') AS toks
        |  FROM documents),
        |th AS (
        |  SELECT doc_id, len(toks) AS n,
        |    list_transform(toks, tk ->
        |      list_reduce(
        |        list_prepend(CAST(7 AS HUGEINT),
        |          list_transform(range(length(tk)), i -> CAST(unicode(substr(tk, CAST(i+1 AS INT), 1)) AS HUGEINT))),
        |        (h, c) -> (((h % 4294967296) * 1000003
        |                    + (((h // 4294967296) * 1000003) % 4294967296) * 4294967296)
        |                   + c) % 18446744073709551616
        |      )) AS th
        |  FROM t),
        |wh AS (
        |  SELECT doc_id,
        |    CASE WHEN n = 0 THEN CAST(0 AS BIGINT) ELSE
        |      list_min(list_transform(range(n - least(5, n) + 1), s ->
        |        list_transform(
        |          [list_sum(list_transform(range(least(5, n)), j ->
        |             ((th[s+j+1] % 4294967296)
        |                * ([CAST(1 AS HUGEINT), 1000003, 1000006000009, 1000009000027000027, 14003818205314896721][CAST(least(5,n)-j AS INT)] % 4294967296)
        |              + (((th[s+j+1] // 4294967296)
        |                    * ([CAST(1 AS HUGEINT), 1000003, 1000006000009, 1000009000027000027, 14003818205314896721][CAST(least(5,n)-j AS INT)] % 4294967296)
        |                  + (th[s+j+1] % 4294967296)
        |                    * ([CAST(1 AS HUGEINT), 1000003, 1000006000009, 1000009000027000027, 14003818205314896721][CAST(least(5,n)-j AS INT)] // 4294967296))
        |                 % 4294967296) * 4294967296)
        |             % 18446744073709551616
        |           )) % 18446744073709551616],
        |          u -> CAST(CASE WHEN u >= 9223372036854775808 THEN u - 18446744073709551616 ELSE u END AS BIGINT))[1]
        |      ))
        |    END AS fp
        |  FROM th)
        |SELECT fp, min(doc_id) AS keep_id, count(*) AS n_docs FROM wh GROUP BY fp""".stripMargin,
    "q48_text_langid" ->
      """WITH t AS (SELECT doc_id,
        |  list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '') AS toks FROM documents)
        |SELECT doc_id, list_aggregate([
        |  {'score': len(list_filter(toks, x -> list_contains(['the','and','of','to','in','is','that','for','with','it'], x))), 'lang': 'en'},
        |  {'score': len(list_filter(toks, x -> list_contains(['der','die','das','und','ist','nicht','mit','ein','von','zu'], x))), 'lang': 'de'},
        |  {'score': len(list_filter(toks, x -> list_contains(['el','la','los','las','es','y','de','que','un','una'], x))), 'lang': 'es'},
        |  {'score': len(list_filter(toks, x -> list_contains(['le','la','les','et','est','que','des','un','une','du'], x))), 'lang': 'fr'},
        |  {'score': len(list_filter(toks, x -> list_contains(['的','是','不','了','在','人','有','我','他','这'], x))), 'lang': 'zh'}
        |], 'max').lang AS lang_pred
        |FROM t""".stripMargin,
    "q44_approx_distinct" ->
      // exact replay is valid because the Spark side pins the exactness
      // regime: ≤5 distinct strings per group, 2^14 HLL registers, no
      // register collision among the 5 hashes → linear counting rounds
      // to exactly k (see the query's doc comment)
      """SELECT user_id, count(DISTINCT event_type) AS n_approx
        |FROM events WHERE value > 150 GROUP BY 1""".stripMargin,
    "q54_approx_percentile" ->
      // exact replay: accuracy 1e6 retains every sample, so the sketch
      // returns the element at rank ceil(p·n) computed in DOUBLE (the
      // CAST matters: DuckDB's 0.95 literal is DECIMAL, whose exact
      // product can ceil differently than IEEE doubles)
      """WITH r AS (SELECT event_type, value,
        |  row_number() OVER (PARTITION BY event_type ORDER BY value) AS rk,
        |  count(*) OVER (PARTITION BY event_type) AS n FROM events)
        |SELECT event_type,
        |  max(CASE WHEN rk = CAST(ceil(CAST(0.5 AS DOUBLE)*n) AS BIGINT) THEN value END) AS p50,
        |  max(CASE WHEN rk = CAST(ceil(CAST(0.95 AS DOUBLE)*n) AS BIGINT) THEN value END) AS p95
        |FROM r GROUP BY 1""".stripMargin,
    "q53_train_split" ->
      // md5-prefix buckets: 0.8*256=205=0xcd, +0.1*256=26 -> 231=0xe7;
      // lexicographic hex compare == numeric bucket compare
      """SELECT CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'cd' THEN 'train'
        |            WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'e7' THEN 'val'
        |            ELSE 'test' END AS fold, lang, count(*) AS n_docs
        |FROM documents GROUP BY 1, 2""".stripMargin,
    "q52_ngram_jaccard" ->
      """WITH t AS (SELECT doc_id,
        |  list_distinct(list_transform(range(len(toks)-2), i -> array_to_string(toks[i+1:i+3], ' '))) AS sh
        |  FROM (SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '') AS toks
        |        FROM documents))
        |SELECT * FROM (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |         CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) / len(list_distinct(a.sh || b.sh)) AS jaccard
        |  FROM t a, t b WHERE a.doc_id < b.doc_id
        |) WHERE jaccard >= 0.8""".stripMargin,
    "q51_scalar_math" ->
      """SELECT l_orderkey, l_linenumber, sqrt(l_quantity) AS sqrt_qty,
        |abs(l_discount - 0.05) AS abs_disc,
        |CAST(floor(l_extendedprice) AS BIGINT) AS floor_price,
        |CAST(ceil(l_extendedprice) AS BIGINT) AS ceil_price,
        |l_orderkey % 7 AS mod7 FROM lineitem""".stripMargin,
    "q49_anomaly_rules" ->
      """SELECT event_id, (value > 190 OR value = -999.9 OR (event_type = 'error' AND value > 150)) AS is_anomaly,
        |concat_ws(',',
        |  CASE WHEN value > 190 THEN 'value_high' END,
        |  CASE WHEN value = -999.9 THEN 'value_sentinel' END,
        |  CASE WHEN event_type = 'error' AND value > 150 THEN 'error_burst' END) AS rules
        |FROM events""".stripMargin,
    "q50_pivot" ->
      """SELECT user_id,
        |CAST(sum(CASE WHEN event_type = 'click' THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE) AS click,
        |CAST(sum(CASE WHEN event_type = 'error' THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE) AS error,
        |CAST(sum(CASE WHEN event_type = 'purchase' THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE) AS purchase,
        |CAST(sum(CASE WHEN event_type = 'signup' THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE) AS signup,
        |CAST(sum(CASE WHEN event_type = 'view' THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE) AS view
        |FROM events GROUP BY user_id""".stripMargin,
    // The ANN trio IS oracle-checked: ranks (not raw cosines) cross engines
    // safely — per-query cosine gaps are ~1e-2 vs engine float noise
    // ~1e-15, so orderings agree even though bit-level cosine values may
    // not. q42's whole IVF structure (md5-sampled centroids, argmax cell
    // assignment, probe selection) is deterministic and engine-portable,
    // so the oracle replays the algorithm, approximation and all.
    "q39_ann_topk" ->
      """SELECT query_id, cand_id, rk FROM (
        |  SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
        |    row_number() OVER (PARTITION BY q.vec_id
        |      ORDER BY list_cosine_similarity(CAST(q.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[])) DESC,
        |               c.vec_id ASC) AS rk
        |  FROM embeddings q JOIN embeddings c ON q.vec_id <> c.vec_id
        |  WHERE q.vec_id < 10
        |) WHERE rk <= 5""".stripMargin,
    "q42_ivf_topk" ->
      """WITH sampled AS (
        |  SELECT vec_id, embedding, md5(CAST(vec_id AS VARCHAR)) AS mk
        |  FROM embeddings ORDER BY mk, vec_id LIMIT 16
        |), cent AS (
        |  SELECT CAST(row_number() OVER (ORDER BY mk, vec_id) - 1 AS INTEGER) AS cell,
        |         CAST(embedding AS DOUBLE[]) AS centroid
        |  FROM sampled
        |), assigned AS (
        |  SELECT cell, cand_id, cv FROM (
        |    SELECT c.cell, e.vec_id AS cand_id, CAST(e.embedding AS DOUBLE[]) AS cv,
        |      row_number() OVER (PARTITION BY e.vec_id
        |        ORDER BY list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), c.centroid) DESC, c.cell ASC) AS rk
        |    FROM embeddings e CROSS JOIN cent c
        |  ) WHERE rk = 1
        |), probes AS (
        |  SELECT cell, query_id, qv FROM (
        |    SELECT c.cell, q.vec_id AS query_id, CAST(q.embedding AS DOUBLE[]) AS qv,
        |      row_number() OVER (PARTITION BY q.vec_id
        |        ORDER BY list_cosine_similarity(CAST(q.embedding AS DOUBLE[]), c.centroid) DESC, c.cell ASC) AS rk
        |    FROM embeddings q CROSS JOIN cent c WHERE q.vec_id < 10
        |  ) WHERE rk <= 4
        |)
        |SELECT query_id, cand_id, rk FROM (
        |  SELECT p.query_id, a.cand_id,
        |    row_number() OVER (PARTITION BY p.query_id
        |      ORDER BY list_cosine_similarity(p.qv, a.cv) DESC, a.cand_id ASC) AS rk
        |  FROM probes p JOIN assigned a USING (cell)
        |  WHERE p.query_id <> a.cand_id
        |) WHERE rk <= 5""".stripMargin,
    "q45_embedding_neardup" ->
      // brute-force all-pairs ground truth over the same planted corpus;
      // DuckDB list_transform's lambda index is 1-based, Spark's 0-based
      """WITH corpus AS (
        |  SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
        |  UNION ALL
        |  SELECT vec_id + 10000000 AS id,
        |         list_transform(CAST(embedding AS DOUBLE[]),
        |                        (x, i) -> x * (1.0 + 0.01 * ((i - 1) % 3 - 1))) AS v
        |  FROM embeddings WHERE vec_id % 20 = 0
        |)
        |SELECT id_a, id_b FROM (
        |  SELECT a.id AS id_a, b.id AS id_b, list_cosine_similarity(a.v, b.v) AS c
        |  FROM corpus a JOIN corpus b ON a.id < b.id
        |) WHERE c >= 0.95""".stripMargin,
    "q55_dup_clusters" ->
      // recursive min-label reachability == connected components: (id,
      // label) is derived iff label reaches id through the pair graph,
      // so min(label) per id is the component minimum — the same fixpoint
      // the Spark operator converges to
      """WITH RECURSIVE t AS (SELECT doc_id,
        |  list_distinct(list_transform(range(len(toks)-2), i -> array_to_string(toks[i+1:i+3], ' '))) AS sh
        |  FROM (SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '') AS toks
        |        FROM documents)),
        |pr AS (SELECT id_a, id_b FROM (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |         CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) / len(list_distinct(a.sh || b.sh)) AS jaccard
        |  FROM t a, t b WHERE a.doc_id < b.doc_id
        |) WHERE jaccard >= 0.8),
        |edges AS (SELECT id_a AS src, id_b AS dst FROM pr UNION SELECT id_b, id_a FROM pr),
        |cc AS (
        |  SELECT src AS id, src AS label FROM edges
        |  UNION
        |  SELECT e.dst AS id, cc.label FROM cc JOIN edges e ON e.src = cc.id)
        |SELECT id, min(label) AS cluster FROM cc GROUP BY id""".stripMargin,
    "q56_repetition" ->
      """WITH t AS (SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '') AS toks FROM documents),
        |b AS (SELECT doc_id, len(toks) AS n,
        |  CAST(len(toks) - len(list_distinct(toks)) AS DOUBLE) / greatest(len(toks), 1) AS dup_token_frac FROM t),
        |bg AS (SELECT doc_id, unnest(list_transform(range(len(toks) - 1), i -> toks[i+1] || ' ' || toks[i+2])) AS bigram
        |       FROM t WHERE len(toks) >= 2),
        |tc AS (SELECT doc_id, max(c) AS top_c FROM (SELECT doc_id, bigram, count(*) AS c FROM bg GROUP BY 1, 2) GROUP BY 1)
        |SELECT b.doc_id, b.dup_token_frac,
        |  coalesce(CAST(tc.top_c AS DOUBLE) / (b.n - 1), 0.0) AS top_bigram_frac
        |FROM b LEFT JOIN tc USING (doc_id)""".stripMargin,
    "q57_pii_redact" ->
      """WITH p AS (SELECT doc_id,
        |  text || ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com from 10.0.0.' ||
        |  CAST(doc_id % 250 AS VARCHAR) || ' phone 555-867-5309' AS text FROM documents)
        |SELECT doc_id,
        |  regexp_replace(regexp_replace(regexp_replace(text,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |    '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g'),
        |    '\b\d{3}-\d{3}-\d{4}\b', '<PHONE>', 'g') AS redacted,
        |  len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n_emails
        |FROM p""".stripMargin,
    "q58_mixture_sample" ->
      // hex-prefix thresholds: 1.0→keep all, 0.75→0xc0, 0.5→0x80,
      // 0.25→0x40, default 0.125→0x20 (same /256 bucket contract as q53)
      """SELECT source, count(*) AS n_docs FROM documents
        |WHERE substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) <
        |  CASE source WHEN 'src0' THEN 'zz' WHEN 'src1' THEN 'c0'
        |              WHEN 'src2' THEN '80' WHEN 'src3' THEN '40' ELSE '20' END
        |GROUP BY source""".stripMargin,
    "q59_seq_packing" ->
      """WITH t AS (SELECT doc_id,
        |  CAST(len(list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '')) AS BIGINT) AS n_tok
        |  FROM documents)
        |SELECT doc_id, n_tok,
        |  CAST(floor(CAST(sum(n_tok) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) - n_tok AS DOUBLE) / 512) AS BIGINT) AS bin
        |FROM t""".stripMargin,
    "q60_top_tokens" ->
      """SELECT lang, word, cnt, rk FROM (
        |  SELECT lang, word, cnt,
        |    row_number() OVER (PARTITION BY lang ORDER BY cnt DESC, word ASC) AS rk
        |  FROM (
        |    SELECT lang, word, count(*) AS cnt FROM (
        |      SELECT lang, unnest(list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '')) AS word
        |      FROM documents) GROUP BY lang, word)
        |) WHERE rk <= 10""".stripMargin,
    "q61_corpus_pipeline" ->
      // composed C4-style pipeline: quality gate (q32's rule), exact-dedup
      // keep-first (q34's fingerprint), domain mixture (q58's thresholds
      // at default 0.5 → 0x80), per-language doc/token budget
      """WITH t AS (SELECT doc_id, source, lang,
        |    list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '') AS toks
        |  FROM documents),
        |q AS (SELECT doc_id, source, lang, toks FROM t
        |  WHERE len(toks) >= 5
        |    AND CAST(list_sum(list_transform(toks, x -> length(x))) AS DOUBLE) / greatest(len(toks), 1) > 2
        |    AND CAST(list_sum(list_transform(toks, x -> length(x))) AS DOUBLE) / greatest(len(toks), 1) < 12),
        |f AS (SELECT *, md5(array_to_string(toks, ' ')) AS fp FROM q),
        |k AS (SELECT fp, min(doc_id) AS keep_id FROM f GROUP BY fp),
        |dd AS (SELECT f.* FROM f JOIN k ON f.doc_id = k.keep_id),
        |m AS (SELECT * FROM dd
        |  WHERE substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) <
        |    CASE source WHEN 'src0' THEN 'zz' WHEN 'src1' THEN 'c0'
        |                WHEN 'src2' THEN '80' WHEN 'src3' THEN '40' ELSE '80' END)
        |SELECT lang, count(*) AS n_docs, CAST(sum(len(toks)) AS BIGINT) AS n_tokens
        |FROM m GROUP BY lang""".stripMargin,
    "q62_asof_join" ->
      // DuckDB's native ASOF JOIN is the ground truth for the operator
      """WITH p AS (SELECT event_id, user_id, epoch_ms(ts) AS p_ms
        |           FROM events WHERE event_type = 'purchase'),
        |c AS (SELECT user_id AS c_user, epoch_ms(ts) AS c_ms, max(event_id) AS click_id
        |      FROM events WHERE event_type = 'click' GROUP BY 1, 2)
        |SELECT p.event_id, p.user_id, p.p_ms, c.click_id, c.c_ms AS click_ms
        |FROM p ASOF LEFT JOIN c ON p.user_id = c.c_user AND p.p_ms >= c.c_ms""".stripMargin,
    "q63_salient_terms" ->
      // same integer-ratio score — ln() would not be cross-engine-exact
      """WITH terms AS (SELECT doc_id,
        |    unnest(list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '')) AS term
        |  FROM documents),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM terms GROUP BY 1, 2),
        |dfq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
        |n AS (SELECT count(*) AS n_docs FROM documents)
        |SELECT doc_id, term, score, rk FROM (
        |  SELECT tf.doc_id, tf.term,
        |    CAST(tf.tf * n.n_docs AS DOUBLE) / dfq.df AS score,
        |    row_number() OVER (PARTITION BY tf.doc_id
        |      ORDER BY CAST(tf.tf * n.n_docs AS DOUBLE) / dfq.df DESC, tf.term ASC) AS rk
        |  FROM tf JOIN dfq USING (term) CROSS JOIN n
        |) WHERE rk <= 3""".stripMargin,
    "q65_stratified_take" ->
      // exactly-n-per-domain by md5-of-key order (distinct ids — no ties)
      """SELECT source, doc_id, rk FROM (
        |  SELECT source, doc_id,
        |    row_number() OVER (PARTITION BY source
        |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
        |  FROM documents) WHERE rk <= 5""".stripMargin,
    "q66_decontaminate" ->
      // asymmetric containment |train∩bench| / |bench| — all-pairs is fine
      // as an oracle at sf0.01 (the operator itself broadcasts the bench)
      """WITH sh AS (SELECT doc_id,
        |    list_distinct(list_transform(range(len(toks)-2), i -> array_to_string(toks[i+1:i+3], ' '))) AS s
        |  FROM (SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '') AS toks
        |        FROM documents)),
        |t AS (SELECT doc_id AS train_id, s AS tsh FROM sh WHERE doc_id % 50 <> 0 AND len(s) > 0),
        |b AS (SELECT doc_id AS bench_id, s AS bsh FROM sh WHERE doc_id % 50 = 0 AND len(s) > 0)
        |SELECT train_id, bench_id, containment FROM (
        |  SELECT train_id, bench_id,
        |    CAST(len(list_intersect(tsh, bsh)) AS DOUBLE) / len(bsh) AS containment
        |  FROM t, b
        |) WHERE containment >= 0.3""".stripMargin,
    "q67_chunking" ->
      // DuckDB list slices are 1-based and end-inclusive: [a, a+c-1] is a
      // c-token window
      """WITH t AS (SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '') AS toks
        |           FROM documents)
        |SELECT doc_id, i AS chunk_idx,
        |  array_to_string(toks[i*24+1 : i*24+32], ' ') AS chunk_text,
        |  len(toks[i*24+1 : i*24+32]) AS n_chunk_tokens
        |FROM (SELECT doc_id, toks, unnest(range((len(toks)-1)//24 + 1)) AS i
        |      FROM t WHERE len(toks) > 0)""".stripMargin,
    "q43_multimodal" ->
      // replay the synthetic corpus + stub decode: content byte j of media
      // i is (i*7349 + j*131 + (i%97)*(j%89)) % 256 (plain integer
      // arithmetic, see Multimodal.syntheticMediaFor), and the decoded
      // mean is ONE double division of exact integers — bit-identical
      // across engines (q51's determinism rule)
      """WITH m AS (SELECT vec_id AS media_id,
        |  CASE WHEN vec_id % 5 = 4 THEN 'video' ELSE 'image' END AS media_type,
        |  CAST(32 + (vec_id % 4) * 16 AS INTEGER) AS width,
        |  CAST(32 + (vec_id % 3) * 16 AS INTEGER) AS height
        |  FROM embeddings)
        |SELECT media_id, media_type, width, height,
        |  CAST(list_sum(list_transform(range(CAST(width AS BIGINT) * height),
        |    j -> (media_id * 7349 + j * 131 + (media_id % 97) * (j % 89)) % 256)) AS DOUBLE)
        |    / (width * height) AS mean_intensity
        |FROM m""".stripMargin,
    "q68_image_decode" ->
      // same pixel formula as q43, but the Spark side round-trips the
      // pixels through a REAL PNG encode+decode (JDK ImageIO) — PNG is
      // lossless, so the decoded means must equal the formula exactly;
      // any codec distortion fails this hash compare
      """WITH m AS (SELECT vec_id AS media_id,
        |  CAST(32 + (vec_id % 4) * 16 AS INTEGER) AS width,
        |  CAST(32 + (vec_id % 3) * 16 AS INTEGER) AS height
        |  FROM embeddings)
        |SELECT media_id, width, height,
        |  CAST(list_sum(list_transform(range(CAST(width AS BIGINT) * height),
        |    j -> (media_id * 7349 + j * 131 + (media_id % 97) * (j % 89)) % 256)) AS DOUBLE)
        |    / (width * height) AS mean_intensity
        |FROM m""".stripMargin,
    "q69_audio_decode" ->
      // sample t of clip i is ((i*7349 + t*131) % 2048) - 1024; the Spark
      // side round-trips these through a real RIFF/PCM16 WAV encode and a
      // javax.sound.sampled decode — lossless, so exact-integer stats match
      """WITH s AS (SELECT vec_id AS media_id,
        |  list_transform(range(4096),
        |    t -> (media_id * 7349 + t * 131) % 2048 - 1024) AS smp
        |  FROM embeddings)
        |SELECT media_id, CAST(4096 AS BIGINT) AS n_samples,
        |  CAST(list_sum(list_transform(smp, x -> abs(x))) AS DOUBLE) / 4096 AS mean_abs,
        |  CAST(list_sum(list_transform(smp, x -> x * x)) AS DOUBLE) / 4096 AS mean_square
        |FROM s""".stripMargin,
    "q64_approx_top_tokens" ->
      // the sketch is exact while capacity > |vocab| (31 here, 10k
      // tracked), so the deterministically re-ranked top 10 equals the
      // plain GROUP BY truth
      """WITH t AS (SELECT unnest(list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '')) AS word
        |           FROM documents),
        |c AS (SELECT word, count(*) AS cnt FROM t GROUP BY word)
        |SELECT word, cnt, rk FROM (
        |  SELECT word, cnt, CAST(row_number() OVER (ORDER BY cnt DESC, word) AS BIGINT) AS rk
        |  FROM c) WHERE rk <= 10""".stripMargin,
    "q70_bloom_screen" ->
      """SELECT a.doc_id, a.source FROM documents a
        |WHERE NOT EXISTS (SELECT 1 FROM documents b
        |                  WHERE b.doc_id = a.doc_id AND b.doc_id % 3 <> 0)""".stripMargin,
    "q73_token_budget" ->
      // same deterministic order (md5 of the key string) and exclusive
      // running sum per domain; DuckDB's window computes the naive form
      // the distributed two-phase prefix sum must equal exactly
      """WITH t AS (SELECT doc_id, source,
        |    CAST(len(list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '')) AS BIGINT) AS n_tok,
        |    md5(CAST(doc_id AS VARCHAR)) AS h
        |  FROM documents),
        |c AS (SELECT doc_id, source, n_tok,
        |    CAST(sum(n_tok) OVER (PARTITION BY source ORDER BY h ROWS UNBOUNDED PRECEDING) - n_tok AS BIGINT) AS prefix_excl
        |  FROM t)
        |SELECT doc_id, source, n_tok, prefix_excl FROM c
        |WHERE prefix_excl < CASE source WHEN 'src0' THEN 3000 WHEN 'src1' THEN 2000
        |                                WHEN 'src2' THEN 1000 ELSE 500 END""".stripMargin,
    "q74_dup_spans" ->
      // full replay of the substring-dedup detection: 8-gram md5
      // fingerprints, duplicated = in >= 2 distinct docs, overlapping hits
      // merged by the same lag/running-sum chain (DuckDB list slices are
      // 1-based end-inclusive; positions stay 0-based like Spark's)
      """WITH t AS (SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '') AS toks
        |           FROM documents),
        |g AS (SELECT doc_id, i AS pos, md5(array_to_string(toks[i+1 : i+8], ' ')) AS gram
        |      FROM (SELECT doc_id, toks, unnest(range(len(toks) - 7)) AS i FROM t WHERE len(toks) >= 8)),
        |dup AS (SELECT gram FROM g GROUP BY gram HAVING count(DISTINCT doc_id) >= 2),
        |h AS (SELECT g.doc_id, g.pos FROM g JOIN dup USING (gram)),
        |b AS (SELECT doc_id, pos,
        |        CASE WHEN pos <= lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) + 8 THEN 0 ELSE 1 END AS brk
        |      FROM h),
        |m AS (SELECT doc_id, pos,
        |        sum(brk) OVER (PARTITION BY doc_id ORDER BY pos ROWS UNBOUNDED PRECEDING) AS grp
        |      FROM b)
        |SELECT doc_id, min(pos) AS span_start, max(pos) + 8 AS span_end,
        |       max(pos) + 8 - min(pos) AS n_span_tokens
        |FROM m GROUP BY doc_id, grp""".stripMargin,
    "q75_span_scrub" ->
      // keep-first scrub replay: canonical occurrence = lexicographic min
      // (doc_id, pos) per duplicated gram (two-step min here — min doc,
      // then min pos within it — equals Spark's one-pass struct min);
      // removal spans merge as in q74 and the text is rebuilt from the
      // token positions outside them
      """WITH t AS (SELECT doc_id,
        |             coalesce(list_filter(string_split_regex(lower(text), '\s+'), x -> x <> ''), []) AS toks
        |           FROM documents),
        |g AS (SELECT doc_id, i AS pos, md5(array_to_string(toks[i+1 : i+8], ' ')) AS gram
        |      FROM (SELECT doc_id, toks, unnest(range(len(toks) - 7)) AS i FROM t WHERE len(toks) >= 8)),
        |dup AS (SELECT gram, min(doc_id) AS kid FROM g GROUP BY gram HAVING count(DISTINCT doc_id) >= 2),
        |k AS (SELECT g.gram, dup.kid, min(g.pos) AS kpos
        |      FROM g JOIN dup ON g.gram = dup.gram AND g.doc_id = dup.kid
        |      GROUP BY g.gram, dup.kid),
        |rem AS (SELECT g.doc_id, g.pos FROM g JOIN k ON g.gram = k.gram
        |        WHERE NOT (g.doc_id = k.kid AND g.pos = k.kpos)),
        |b AS (SELECT doc_id, pos,
        |        CASE WHEN pos <= lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) + 8 THEN 0 ELSE 1 END AS brk
        |      FROM rem),
        |m AS (SELECT doc_id, pos,
        |        sum(brk) OVER (PARTITION BY doc_id ORDER BY pos ROWS UNBOUNDED PRECEDING) AS grp
        |      FROM b),
        |spans AS (SELECT doc_id, min(pos) AS s, max(pos) + 8 AS e FROM m GROUP BY doc_id, grp),
        |rm AS (SELECT doc_id, CAST(sum(e - s) AS BIGINT) AS n_removed FROM spans GROUP BY doc_id),
        |p AS (SELECT doc_id, toks, unnest(range(len(toks))) AS i FROM t),
        |kept AS (SELECT p.doc_id, p.i, p.toks[p.i + 1] AS tok FROM p
        |         WHERE NOT EXISTS (SELECT 1 FROM spans s
        |                           WHERE s.doc_id = p.doc_id AND p.i >= s.s AND p.i < s.e)),
        |agg AS (SELECT doc_id, string_agg(tok, ' ' ORDER BY i) AS scrubbed FROM kept GROUP BY doc_id)
        |SELECT t.doc_id, CAST(len(t.toks) AS BIGINT) AS n_tokens,
        |       coalesce(rm.n_removed, 0) AS n_removed,
        |       coalesce(agg.scrubbed, '') AS scrubbed_text
        |FROM t LEFT JOIN rm USING (doc_id) LEFT JOIN agg USING (doc_id)""".stripMargin,
    "q87_sq8_topk" ->
      // per-dim min/max, linear int8 encode (floor + clamp), dequantized
      // L2 — identical double arithmetic and fold order in both engines
      """WITH dims AS (SELECT unnest(range(64)) AS d),
        |st AS (SELECT d, min(CAST(embedding[d+1] AS DOUBLE)) AS mn,
        |              max(CAST(embedding[d+1] AS DOUBLE)) AS mx
        |       FROM embeddings CROSS JOIN dims GROUP BY d),
        |stl AS (SELECT list(mn ORDER BY d) AS mns, list(mx ORDER BY d) AS mxs FROM st),
        |enc AS (
        |  SELECT vec_id AS cand_id,
        |    list_transform(range(64), d ->
        |      CASE WHEN mxs[d+1] = mns[d+1] THEN 0
        |           ELSE CAST(least(greatest(floor(
        |             (CAST(embedding[d+1] AS DOUBLE) - mns[d+1]) * 255 / (mxs[d+1] - mns[d+1])), 0), 255) AS INTEGER)
        |      END) AS codes
        |  FROM embeddings CROSS JOIN stl
        |), scored AS (
        |  SELECT q.vec_id AS query_id, e.cand_id,
        |    list_sum(list_transform(range(64), d ->
        |      (CAST(q.embedding[d+1] AS DOUBLE) - (mns[d+1] + e.codes[d+1] * (mxs[d+1] - mns[d+1]) / 255))
        |      * (CAST(q.embedding[d+1] AS DOUBLE) - (mns[d+1] + e.codes[d+1] * (mxs[d+1] - mns[d+1]) / 255))))
        |      AS adist
        |  FROM enc e CROSS JOIN stl
        |  CROSS JOIN embeddings q WHERE q.vec_id < 10 AND q.vec_id <> e.cand_id
        |)
        |SELECT query_id, cand_id, rk FROM (
        |  SELECT query_id, cand_id,
        |    row_number() OVER (PARTITION BY query_id ORDER BY adist ASC, cand_id ASC) AS rk
        |  FROM scored) WHERE rk <= 5""".stripMargin,
    "q88_kmeans_assign" ->
      // the fixed-point Lloyd fit unrolled (2 iterations, k=8) + final
      // assignment — all-integer arithmetic, so bit-identical to Spark
      s"""WITH corpus AS (
         |  SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
         |),
         |${kmeansCtes(k = 8, iters = 2, dim = 64, q = 1000000L)}
         |SELECT id, cell FROM af""".stripMargin,
    "q89_kmeans_ivf_topk" ->
      // trained-quantizer IVF: the k-means unroll supplies the coarse
      // cells, then the q42-style probe/assign/rank replay runs against
      // the DEQUANTIZED (cent/q — exact-integer-valued doubles) centroids
      s"""WITH corpus AS (
         |  SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
         |),
         |${kmeansCtes(k = 8, iters = 2, dim = 64, q = 1000000L)},
         |cd AS (SELECT cell, list_transform(cent, c -> CAST(c AS DOUBLE) / 1000000) AS centroid FROM c2),
         |assigned AS (
         |  SELECT cell, cand_id, cv FROM (
         |    SELECT c.cell, e.id AS cand_id, e.v AS cv,
         |      row_number() OVER (PARTITION BY e.id
         |        ORDER BY list_cosine_similarity(e.v, c.centroid) DESC, c.cell ASC) AS rk
         |    FROM corpus e CROSS JOIN cd c
         |  ) WHERE rk = 1
         |),
         |probes AS (
         |  SELECT cell, query_id, qv FROM (
         |    SELECT c.cell, e.id AS query_id, e.v AS qv,
         |      row_number() OVER (PARTITION BY e.id
         |        ORDER BY list_cosine_similarity(e.v, c.centroid) DESC, c.cell ASC) AS rk
         |    FROM corpus e CROSS JOIN cd c WHERE e.id < 10
         |  ) WHERE rk <= 4
         |)
         |SELECT query_id, cand_id, rk FROM (
         |  SELECT p.query_id, a.cand_id,
         |    row_number() OVER (PARTITION BY p.query_id
         |      ORDER BY list_cosine_similarity(p.qv, a.cv) DESC, a.cand_id ASC) AS rk
         |  FROM probes p JOIN assigned a ON p.cell = a.cell
         |  WHERE p.query_id <> a.cand_id
         |) WHERE rk <= 5""".stripMargin,
    "q90_kmeans_semdedup" ->
      // SemDeDup over the q45 planted corpus: k-means unroll, final
      // assignment, then drop every id with a lower-id same-cluster
      // neighbor at cosine >= 0.95 over the ORIGINAL double vectors
      s"""WITH corpus AS (
         |  SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
         |  UNION ALL
         |  SELECT vec_id + 10000000 AS id,
         |         list_transform(CAST(embedding AS DOUBLE[]),
         |                        (x, i) -> x * (1.0 + 0.01 * ((i - 1) % 3 - 1))) AS v
         |  FROM embeddings WHERE vec_id % 20 = 0
         |),
         |${kmeansCtes(k = 8, iters = 2, dim = 64, q = 1000000L)},
         |dom AS (
         |  SELECT DISTINCT a.id
         |  FROM af a JOIN af b ON a.cell = b.cell AND b.id < a.id
         |  JOIN corpus ca ON ca.id = a.id
         |  JOIN corpus cb ON cb.id = b.id
         |  WHERE list_cosine_similarity(ca.v, cb.v) >= 0.95
         |)
         |SELECT id, cell FROM af
         |WHERE NOT EXISTS (SELECT 1 FROM dom WHERE dom.id = af.id)""".stripMargin,
    "q91_quality_classify" ->
      // same integer feature extraction and linear score; // is the same
      // truncating division as Spark's div (nonnegative operands here)
      """WITH t AS (
        |  SELECT doc_id, text,
        |    list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '') AS toks
        |  FROM documents
        |),
        |f AS (
        |  SELECT doc_id,
        |    CAST(len(toks) AS BIGINT) AS n_tokens,
        |    CAST(coalesce(list_sum(list_transform(toks, tk -> CAST(length(tk) AS BIGINT))), 0) AS BIGINT) AS tot,
        |    CAST(len(list_filter(toks, tk -> list_contains(['the','a','an','and','or','of','to','in','is','it','for','on','with','as','at','by','be','this','that','are'], tk))) AS BIGINT) AS n_stop,
        |    CAST(len(list_distinct(toks)) AS BIGINT) AS n_uniq,
        |    CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS BIGINT) AS n_digit,
        |    CAST(length(regexp_replace(text, '[A-Za-z0-9\s]', '', 'g')) AS BIGINT) AS n_punct,
        |    CAST(length(text) AS BIGINT) AS n_chars
        |  FROM t
        |),
        |g AS (
        |  SELECT doc_id,
        |    (n_stop * 1000) // greatest(n_tokens, 1) AS stop_fp,
        |    (n_uniq * 1000) // greatest(n_tokens, 1) AS uniq_fp,
        |    (n_digit * 1000) // greatest(n_chars, 1) AS digit_fp,
        |    (n_punct * 1000) // greatest(n_chars, 1) AS punct_fp
        |  FROM f
        |)
        |SELECT doc_id AS id, score, score >= 0 AS keep FROM (
        |  SELECT doc_id,
        |    stop_fp * 4 + uniq_fp * 2 + digit_fp * (-3) + punct_fp * (-2) - 900 AS score
        |  FROM g
        |)""".stripMargin,
    "q92_zorder_value" ->
      // same integer normalize (// is Spark's exact division here — the
      // numerator is pre-reduced mod span) and the 16-bit interleave
      // unrolled; bit i of column j lands at position 2i+j
      s"""WITH st AS (
         |  SELECT min(l_partkey) AS mn0, max(l_partkey) AS mx0,
         |         min(l_suppkey) AS mn1, max(l_suppkey) AS mx1
         |  FROM lineitem
         |),
         |n AS (
         |  SELECT l_orderkey, l_linenumber,
         |    ((l_partkey - mn0) * 65535) // greatest(mx0 - mn0, 1) AS nz0,
         |    ((l_suppkey - mn1) * 65535) // greatest(mx1 - mn1, 1) AS nz1
         |  FROM lineitem CROSS JOIN st
         |)
         |SELECT l_orderkey, l_linenumber,
         |  ${(0 until 16).flatMap(i => Seq(
              s"(((nz0 >> $i) & 1) << ${2 * i})",
              s"(((nz1 >> $i) & 1) << ${2 * i + 1})")).mkString(" + ")} AS zval
         |FROM n""".stripMargin,
    "q98_cdc_chunks" ->
      // full replay of the CDC chain: the q47 token-hash fold, every
      // window hash via a per-window list_reduce (multiplier B < 2^32,
      // so the wrap-around multiply needs only the small-constant
      // split), boundaries where the UNSIGNED hash mod 16 is 0, chunk
      // ends closed by the final token, md5 chunk fingerprints
      """WITH t AS (
        |  SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '') AS toks
        |  FROM documents),
        |th AS (
        |  SELECT doc_id, toks, len(toks) AS n, least(5, len(toks)) AS w,
        |    list_transform(toks, tk ->
        |      list_reduce(
        |        list_prepend(CAST(7 AS HUGEINT),
        |          list_transform(range(length(tk)), i -> CAST(unicode(substr(tk, CAST(i+1 AS INT), 1)) AS HUGEINT))),
        |        (h, c) -> (((h % 4294967296) * 1000003
        |                    + (((h // 4294967296) * 1000003) % 4294967296) * 4294967296)
        |                   + c) % 18446744073709551616
        |      )) AS th
        |  FROM t WHERE len(toks) > 0),
        |ws AS (
        |  SELECT doc_id, toks, n, w,
        |    list_transform(range(n - w + 1), s ->
        |      list_reduce(list_prepend(CAST(0 AS HUGEINT), th[s+1:s+w]),
        |        (h, tt) -> (((h % 4294967296) * 1000003
        |                     + (((h // 4294967296) * 1000003) % 4294967296) * 4294967296)
        |                    + tt) % 18446744073709551616)) AS ws
        |  FROM th),
        |e AS (
        |  SELECT doc_id, toks,
        |    CASE WHEN len(b) > 0 AND b[-1] = n - 1 THEN b ELSE list_append(b, n - 1) END AS ends
        |  FROM (SELECT doc_id, toks, n,
        |          list_filter(list_transform(range(n - w + 1), s ->
        |            CASE WHEN ws[s+1] % 16 = 0 THEN s + w - 1 ELSE -1 END), x -> x >= 0) AS b
        |        FROM ws)),
        |u AS (SELECT doc_id, toks, ends, unnest(range(len(ends))) AS k FROM e)
        |SELECT doc_id, k AS chunk_idx,
        |  CAST(CASE WHEN k = 0 THEN 0 ELSE ends[CAST(k AS INT)] + 1 END AS BIGINT) AS start_pos,
        |  CAST(ends[CAST(k+1 AS INT)] - CASE WHEN k = 0 THEN 0 ELSE ends[CAST(k AS INT)] + 1 END + 1 AS BIGINT) AS n_chunk_tokens,
        |  md5(array_to_string(toks[CAST(CASE WHEN k = 0 THEN 1 ELSE ends[CAST(k AS INT)] + 2 END AS INT):CAST(ends[CAST(k+1 AS INT)] + 1 AS INT)], ' ')) AS chunk_fp
        |FROM u""".stripMargin,
    "q101_bpe_encode" ->
      // unrolled train-and-encode replay (see bpeCtes)
      s"""${bpeCtes(8)}
         |SELECT word, freq, CAST(len(syms) AS BIGINT) AS n_tok,
         |  array_to_string(syms, ' ') AS toks
         |FROM v8""".stripMargin,
    "q102_bm25_topk" -> bm25OracleSql,
    "q103_bm25_search" -> bm25OracleSql,
    "q187_boolean_search" -> booleanSearchOracle,
    "q190_ks_drift" ->
      // the same RANGE-frame CDF replay, integer cross-multiplied
      """WITH o AS (SELECT o_orderpriority AS pri, o_orderkey,
        |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS v FROM orders),
        |u AS (SELECT pri, v,
        |    CASE WHEN o_orderkey % 2 = 0 THEN 1 ELSE 0 END AS a,
        |    CASE WHEN o_orderkey % 2 = 0 THEN 0 ELSE 1 END AS b FROM o),
        |c AS (SELECT pri, v,
        |    sum(a) OVER (PARTITION BY pri ORDER BY v
        |                 RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ca,
        |    sum(b) OVER (PARTITION BY pri ORDER BY v
        |                 RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cb,
        |    sum(a) OVER (PARTITION BY pri) AS na,
        |    sum(b) OVER (PARTITION BY pri) AS nb
        |  FROM u)
        |SELECT pri, CAST(min(na) AS BIGINT) AS n_a, CAST(min(nb) AS BIGINT) AS n_b,
        |  CAST(max(abs(ca*nb - cb*na)) AS BIGINT) AS d_num,
        |  CAST(max(abs(ca*nb - cb*na)) AS DOUBLE) /
        |    (CAST(min(na) AS DOUBLE) * CAST(min(nb) AS DOUBLE)) AS d
        |FROM c GROUP BY 1""".stripMargin,
    "q191_substring_search" ->
      // the unaccelerated form: a full corpus LIKE scan
      """WITH t AS (SELECT doc_id, lower(text) AS s FROM documents),
        |q(qid, pat) AS (VALUES (0, 'ge bat'), (1, 'le sor'), (2, 'rt join'))
        |SELECT CAST(q.qid AS BIGINT) AS qid, t.doc_id
        |FROM q JOIN t ON instr(t.s, q.pat) > 0""".stripMargin,
    "q223_wildcard_search" ->
      // the unaccelerated form: a full corpus-scan anchored LIKE (no
      // backslashes in any pattern, so DuckDB's no-escape default and
      // Spark's \-escape default agree)
      """WITH t AS (SELECT doc_id, lower(text) AS s FROM documents),
        |q(qid, pat) AS (VALUES (0, '%merge%join%'), (1, '%sort%tab_e%'),
        |                       (2, 'the%stream%'))
        |SELECT CAST(q.qid AS BIGINT) AS qid, t.doc_id
        |FROM q JOIN t ON t.s LIKE q.pat""".stripMargin,
    "q189_phrase_search" ->
      // boundary-padded containment over the space-joined tokens —
      // exact sequence semantics because tokens contain no whitespace
      """WITH t AS (SELECT doc_id,
        |    ' ' || array_to_string(list_filter(string_split_regex(lower(text), '\s+'),
        |                                       x -> x <> ''), ' ') || ' ' AS s
        |  FROM documents),
        |q(qid, ph) AS (VALUES (0, 'table hash'), (1, 'customer join'),
        |                      (2, 'merge batch part'))
        |SELECT CAST(q.qid AS BIGINT) AS qid, t.doc_id
        |FROM q JOIN t ON instr(t.s, ' ' || q.ph || ' ') > 0""".stripMargin,
    "q188_table_profile" ->
      // per-column aggregates replayed verbatim, one UNION branch per
      // profiled column
      Seq("l_suppkey", "l_quantity", "l_extendedprice", "l_tax").map { c =>
        s"""SELECT '$c' AS col_name, CAST(count(*) AS BIGINT) AS n_rows,
           |  CAST(count(*) - count($c) AS BIGINT) AS n_nulls,
           |  CAST(count(DISTINCT $c) AS BIGINT) AS n_distinct,
           |  min(CAST($c AS DOUBLE)) AS min_d, max(CAST($c AS DOUBLE)) AS max_d
           |FROM lineitem""".stripMargin
      }.mkString("\nUNION ALL\n"),
    "q104_hybrid_rrf" -> rrfOracleSql,
    "q112_changelog_apply" ->
      // replay: same three-part log, latest-wins by row_number over
      // seq DESC ((key, seq) unique by construction), full outer
      // merge, winning 'D' filtered out
      """WITH o AS (SELECT o_orderkey, o_custkey, o_totalprice FROM orders),
        |snap AS (SELECT * FROM o WHERE o_orderkey % 11 <> 0),
        |ch AS (
        |  SELECT o_orderkey, o_custkey, o_totalprice, 1 AS seq, 'U' AS op
        |  FROM o WHERE o_orderkey % 11 = 0
        |  UNION ALL
        |  SELECT o_orderkey, o_custkey + 1000000, o_totalprice, 2, 'U'
        |  FROM o WHERE o_orderkey % 7 = 0
        |  UNION ALL
        |  SELECT o_orderkey, o_custkey, o_totalprice, 3, 'D'
        |  FROM o WHERE o_orderkey % 13 = 0),
        |w AS (SELECT * FROM (
        |  SELECT ch.*, row_number() OVER (PARTITION BY o_orderkey ORDER BY seq DESC) AS rn
        |  FROM ch) WHERE rn = 1)
        |SELECT COALESCE(w.o_orderkey, snap.o_orderkey) AS o_orderkey,
        |  CAST(CASE WHEN w.o_orderkey IS NOT NULL THEN w.o_custkey
        |            ELSE snap.o_custkey END AS BIGINT) AS o_custkey,
        |  CASE WHEN w.o_orderkey IS NOT NULL THEN w.o_totalprice
        |       ELSE snap.o_totalprice END AS o_totalprice
        |FROM snap FULL JOIN w ON snap.o_orderkey = w.o_orderkey
        |WHERE w.op IS NULL OR w.op <> 'D'""".stripMargin,
    "q113_scd2" ->
      // replay: the lead window is the whole operator; BIGINT event
      // ids, boolean currency flag
      """SELECT user_id, event_id, event_type,
        |  lead(event_id) OVER (PARTITION BY user_id ORDER BY event_id) AS valid_to,
        |  (lead(event_id) OVER (PARTITION BY user_id ORDER BY event_id)) IS NULL AS is_current
        |FROM events""".stripMargin,
    "q116_trend" ->
      // replay: the same five sums and the same truncating integer
      // division; DuckDB's HUGEINT sums are cast back to BIGINT on
      // output (the driver's hasher is type-sensitive)
      """WITH t AS (SELECT l_suppkey,
        |             (epoch_ms(l_shipdate) // 86400000) - 9000 AS x,
        |             CAST(l_quantity AS BIGINT) AS y FROM lineitem),
        |a AS (SELECT l_suppkey, count(*) AS n, sum(x) AS sx, sum(y) AS sy,
        |             sum(x*y) AS sxy, sum(x*x) AS sxx FROM t GROUP BY 1),
        |b AS (SELECT l_suppkey, n, sx, sy,
        |             CASE WHEN n*sxx - sx*sx = 0 THEN NULL
        |                  ELSE (1000 * (n*sxy - sx*sy)) // (n*sxx - sx*sx) END AS slope_fp
        |      FROM a)
        |SELECT l_suppkey, CAST(n AS BIGINT) AS n,
        |       CAST(slope_fp AS BIGINT) AS slope_fp,
        |       CAST((1000 * sy - slope_fp * sx) // n AS BIGINT) AS intercept_fp
        |FROM b""".stripMargin,
    "q114_temporal_join" ->
      // replay: DuckDB's native ASOF JOIN is the ground truth (scd2
      // intervals are contiguous per key, so as-of == validity lookup)
      """WITH p AS (SELECT user_id, event_id AS version_id, value AS version_value
        |           FROM events WHERE event_type = 'purchase'),
        |f AS (SELECT user_id, event_id, event_type FROM events
        |      WHERE event_type <> 'purchase')
        |SELECT f.user_id, f.event_id, f.event_type, p.version_id, p.version_value
        |FROM f ASOF LEFT JOIN p
        |  ON f.user_id = p.user_id AND f.event_id >= p.version_id""".stripMargin,
    "q115_gap_fill" ->
      // replay: per-key bucket spine via generate_series, fill via ASOF
      // join to the bucket END (ts < t + step ⇔ bucket-end tick >= ts)
      """WITH o AS (SELECT user_id, epoch_ms(ts) AS ms, max(value) AS value
        |           FROM events WHERE event_type = 'purchase' GROUP BY 1, 2),
        |b AS (SELECT user_id, min(ms) AS mn, max(ms) AS mx FROM o GROUP BY 1),
        |s AS (SELECT user_id,
        |             unnest(generate_series(mn // 21600000, mx // 21600000)) * 21600000 AS ms
        |      FROM b),
        |se AS (SELECT user_id, ms, ms + 21599999 AS bucket_end FROM s)
        |SELECT se.user_id, se.ms, o.value
        |FROM se ASOF LEFT JOIN o
        |  ON se.user_id = o.user_id AND se.bucket_end >= o.ms""".stripMargin,
    "q111_quality_checks" ->
      // replay: the same five conditional counts; coalesce models the
      // null-counts-as-violation rule
      """WITH m AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CASE WHEN coalesce(l_orderkey IS NOT NULL AND l_partkey IS NOT NULL, false) THEN 0 ELSE 1 END) AS BIGINT) AS v1,
        |  CAST(sum(CASE WHEN coalesce(l_quantity BETWEEN 1 AND 50, false) THEN 0 ELSE 1 END) AS BIGINT) AS v2,
        |  CAST(sum(CASE WHEN coalesce(l_quantity < 30, false) THEN 0 ELSE 1 END) AS BIGINT) AS v3,
        |  CAST(sum(CASE WHEN coalesce(l_extendedprice > 0, false) THEN 0 ELSE 1 END) AS BIGINT) AS v4,
        |  CAST(sum(CASE WHEN coalesce(l_discount BETWEEN 0 AND 0.1, false) THEN 0 ELSE 1 END) AS BIGINT) AS v5
        |  FROM lineitem)
        |SELECT rule, n AS n_rows, v AS n_violations, v = 0 AS pass FROM (
        |  SELECT 'keys_not_null' AS rule, n, v1 AS v FROM m
        |  UNION ALL SELECT 'qty_range', n, v2 FROM m
        |  UNION ALL SELECT 'qty_under_30', n, v3 FROM m
        |  UNION ALL SELECT 'price_positive', n, v4 FROM m
        |  UNION ALL SELECT 'discount_range', n, v5 FROM m)""".stripMargin,
    "q117_quality_checks_stream" ->
      // replay: identical to q111's — the streaming gate's final totals
      // equal the batch gate by the parity contract, and DuckDB replays
      // the batch side
      """WITH m AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CASE WHEN coalesce(l_orderkey IS NOT NULL AND l_partkey IS NOT NULL, false) THEN 0 ELSE 1 END) AS BIGINT) AS v1,
        |  CAST(sum(CASE WHEN coalesce(l_quantity BETWEEN 1 AND 50, false) THEN 0 ELSE 1 END) AS BIGINT) AS v2,
        |  CAST(sum(CASE WHEN coalesce(l_quantity < 30, false) THEN 0 ELSE 1 END) AS BIGINT) AS v3,
        |  CAST(sum(CASE WHEN coalesce(l_extendedprice > 0, false) THEN 0 ELSE 1 END) AS BIGINT) AS v4,
        |  CAST(sum(CASE WHEN coalesce(l_discount BETWEEN 0 AND 0.1, false) THEN 0 ELSE 1 END) AS BIGINT) AS v5
        |  FROM lineitem)
        |SELECT rule, n AS n_rows, v AS n_violations, v = 0 AS pass FROM (
        |  SELECT 'keys_not_null' AS rule, n, v1 AS v FROM m
        |  UNION ALL SELECT 'qty_range', n, v2 FROM m
        |  UNION ALL SELECT 'qty_under_30', n, v3 FROM m
        |  UNION ALL SELECT 'price_positive', n, v4 FROM m
        |  UNION ALL SELECT 'discount_range', n, v5 FROM m)""".stripMargin,
    "q110_triangles" ->
      // replay: same md5 edge derivation ('0x' hex cast, q100's trick),
      // canonical a<b edges, the u<v<w triple join, three rotations
      """WITH r AS (SELECT doc_id AS x,
        |    CAST('0x' || substr(md5(doc_id || ':' || i), 1, 8) AS BIGINT) % 500 AS y
        |  FROM documents, (VALUES (0), (1), (2)) AS t(i)),
        |e AS (SELECT DISTINCT least(x, y) AS a, greatest(x, y) AS b
        |      FROM r WHERE x <> y),
        |tr AS (SELECT e1.a AS u, e1.b AS v, e2.b AS w
        |       FROM e e1 JOIN e e2 ON e2.a = e1.a AND e2.b > e1.b
        |       JOIN e e3 ON e3.a = e1.b AND e3.b = e2.b)
        |SELECT id, CAST(count(*) AS BIGINT) AS n_tri FROM (
        |  SELECT u AS id FROM tr UNION ALL SELECT v FROM tr
        |  UNION ALL SELECT w FROM tr
        |) GROUP BY id""".stripMargin,
    "q121_groupwise_median" ->
      // replay: per-group rank arithmetic, value by partitioned
      // row_number — the per-group sort the engine side avoids
      """WITH v AS (SELECT l_suppkey,
        |    CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS c
        |  FROM lineitem),
        |r AS (SELECT l_suppkey, c,
        |    row_number() OVER (PARTITION BY l_suppkey ORDER BY c) AS rn,
        |    count(*) OVER (PARTITION BY l_suppkey) AS cnt FROM v)
        |SELECT l_suppkey, CAST(cnt AS BIGINT) AS n,
        |  CAST(greatest(1, (50 * cnt + 99) // 100) AS BIGINT) AS rk,
        |  c AS value
        |FROM r WHERE rn = greatest(1, (50 * cnt + 99) // 100)""".stripMargin,
    "q221_kwic" ->
      // instr + the same edge-clipped substring arithmetic
      """WITH t AS (SELECT doc_id, lower(text) AS s FROM documents),
        |q(qid, pat) AS (VALUES (0, 'ge bat'), (1, 'le sor'), (2, 'rt join')),
        |h AS (SELECT q.qid, t.doc_id, t.s, q.pat,
        |    instr(t.s, q.pat) AS pos
        |  FROM q JOIN t ON instr(t.s, q.pat) > 0)
        |SELECT CAST(qid AS BIGINT) AS qid, doc_id, CAST(pos AS BIGINT) AS pos,
        |  substring(s, CAST(greatest(pos - 15, 1) AS INT),
        |    CAST(least(pos + length(pat) + 15, length(s) + 1) -
        |         greatest(pos - 15, 1) AS INT)) AS snippet
        |FROM h""".stripMargin,
    "q220_cdf_rank" ->
      // the naive per-row reference count the as-of CDF replaces
      """WITH e AS (SELECT event_id, event_type AS k,
        |    epoch_ms(ts) // 86400000 AS day,
        |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
        |  FROM events),
        |r AS (SELECT k, cents FROM e WHERE day % 2 = 0),
        |q AS (SELECT event_id, k, cents FROM e WHERE day % 2 = 1),
        |t AS (SELECT k, count(*) AS n FROM r GROUP BY 1),
        |c AS (SELECT q.event_id, count(r.cents) AS cnt
        |  FROM q LEFT JOIN r ON r.k = q.k AND r.cents <= q.cents
        |  GROUP BY 1)
        |SELECT q.event_id, q.k, q.cents,
        |  CASE WHEN t.n IS NOT NULL
        |       THEN CAST(c.cnt * 10000 // t.n AS BIGINT) END AS cdf_fp
        |FROM q JOIN c USING (event_id) LEFT JOIN t USING (k)""".stripMargin,
    "q219_funnel_latency" ->
      // chained conditional mins -> latencies -> q121 rank convention
      """WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS t FROM events
        |           WHERE event_type IN ('view', 'click', 'purchase')),
        |t1 AS (SELECT user_id, min(t) AS t FROM e WHERE event_type = 'view' GROUP BY user_id),
        |t2 AS (SELECT e.user_id, min(e.t) AS t FROM e JOIN t1 USING (user_id)
        |       WHERE e.event_type = 'click' AND e.t > t1.t GROUP BY e.user_id),
        |t3 AS (SELECT e.user_id, min(e.t) AS t FROM e JOIN t2 USING (user_id)
        |       WHERE e.event_type = 'purchase' AND e.t > t2.t GROUP BY e.user_id),
        |l AS (SELECT t3.t - t1.t AS lat FROM t3 JOIN t1 USING (user_id)),
        |r AS (SELECT lat, row_number() OVER (ORDER BY lat) AS rn,
        |    count(*) OVER () AS n FROM l),
        |ks(q_pct) AS (VALUES (50), (90), (99))
        |SELECT CAST(ks.q_pct AS BIGINT) AS q_pct,
        |  CAST(greatest(1, (ks.q_pct * r.n + 99) // 100) AS BIGINT) AS rk,
        |  r.lat AS value
        |FROM r, ks WHERE r.rn = greatest(1, (ks.q_pct * r.n + 99) // 100)""".stripMargin,
    "q218_rolling_wau" ->
      // the same contribution span, clipped at the observed max
      """WITH p AS (SELECT DISTINCT epoch_ms(ts) // 86400000 AS day,
        |    user_id AS u FROM events),
        |m AS (SELECT max(day) AS mx FROM p),
        |w AS (SELECT p.day + s.g AS tick, p.u FROM p
        |      CROSS JOIN generate_series(0, 6) AS s(g), m
        |      WHERE p.day + s.g <= m.mx),
        |ww AS (SELECT tick, count(DISTINCT u) AS n_window FROM w GROUP BY 1),
        |dd AS (SELECT day AS tick, count(DISTINCT u) AS n_active
        |       FROM p GROUP BY 1)
        |SELECT ww.tick, CAST(coalesce(dd.n_active, 0) AS BIGINT) AS n_active,
        |  CAST(ww.n_window AS BIGINT) AS n_window
        |FROM ww LEFT JOIN dd ON ww.tick = dd.tick""".stripMargin,
    "q217_peak_sessions" ->
      // sessionize replay -> intervals -> tick-aggregated sweep
      """WITH e AS (SELECT user_id, epoch_us(ts) AS us, event_id FROM events),
        |r AS (SELECT user_id, us, event_id,
        |    CASE WHEN us - lag(us) OVER (PARTITION BY user_id
        |           ORDER BY us, event_id) > 1800000000 THEN 1 ELSE 0 END AS brk
        |  FROM e),
        |s AS (SELECT user_id, us,
        |    sum(brk) OVER (PARTITION BY user_id ORDER BY us, event_id
        |                   ROWS UNBOUNDED PRECEDING) + 1 AS sidx
        |  FROM r),
        |iv AS (SELECT user_id, sidx, min(us) AS st, max(us) AS en
        |  FROM s GROUP BY 1, 2),
        |d AS (SELECT st AS tick, 1 AS dd FROM iv
        |      UNION ALL SELECT en + 1, -1 FROM iv),
        |dt AS (SELECT tick, sum(dd) AS dd FROM d GROUP BY 1),
        |rr AS (SELECT tick,
        |    sum(dd) OVER (ORDER BY tick ROWS UNBOUNDED PRECEDING) AS run
        |  FROM dt)
        |SELECT CAST(run AS BIGINT) AS max_concurrent,
        |  CAST(tick AS BIGINT) AS at_tick
        |FROM rr ORDER BY run DESC, tick ASC LIMIT 1""".stripMargin,
    "q216_nearest_join" ->
      // per-left min |dt|, ties to the earlier right row
      """WITH l AS (SELECT user_id, event_id, epoch_us(ts) AS us
        |  FROM events WHERE event_type = 'error'),
        |r AS (SELECT user_id, epoch_us(ts) AS rus,
        |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
        |  FROM events WHERE event_type = 'purchase'),
        |j AS (SELECT l.user_id, l.event_id, l.us, r.rus, r.cents,
        |    abs(r.rus - l.us) AS ad FROM l JOIN r USING (user_id)),
        |p AS (SELECT *, row_number() OVER (PARTITION BY user_id, event_id
        |                ORDER BY ad, rus) AS rn FROM j)
        |SELECT l.user_id, l.event_id, CAST(l.us AS BIGINT) AS us,
        |  p.cents AS nearest_cents, CAST(p.rus - l.us AS BIGINT) AS nearest_dt
        |FROM l LEFT JOIN (SELECT * FROM p WHERE rn = 1) p
        |  ON l.user_id = p.user_id AND l.event_id = p.event_id""".stripMargin,
    "q215_vocab_canonicalize" ->
      // recursive min-string-label reachability, seeded from every word
      """WITH RECURSIVE v AS (SELECT DISTINCT lower(w) AS w FROM (
        |    SELECT unnest(string_split(p_name, ' ')) AS w FROM part
        |    UNION ALL SELECT unnest(string_split(p_type, ' ')) FROM part
        |    UNION ALL SELECT unnest(string_split(p_brand, ' ')) FROM part
        |    UNION ALL SELECT unnest(string_split(lower(text), ' ')) FROM documents)
        |  WHERE length(w) > 0),
        |pr AS (SELECT a.w AS a, b.w AS b FROM v a JOIN v b
        |       ON a.w < b.w AND levenshtein(a.w, b.w) <= 1),
        |edges AS (SELECT a AS src, b AS dst FROM pr
        |          UNION SELECT b, a FROM pr),
        |cc AS (
        |  SELECT w AS id, w AS label FROM v
        |  UNION
        |  SELECT e.dst AS id, cc.label FROM cc JOIN edges e ON e.src = cc.id)
        |SELECT id AS w, min(label) AS canon FROM cc GROUP BY 1""".stripMargin,
    "q214_join_skew" ->
      // the same counts, exact products, and deterministic pick
      """WITH c AS (SELECT event_type AS key, count(*) AS n FROM events
        |           WHERE event_type IS NOT NULL GROUP BY 1),
        |per AS (SELECT a.key, a.n AS n_left, b.n AS n_right,
        |    CAST(a.n AS HUGEINT) * b.n AS contrib
        |  FROM c a JOIN c b USING (key)),
        |tot AS (SELECT sum(contrib) AS t FROM per)
        |SELECT key, CAST(n_left AS BIGINT) AS n_left,
        |  CAST(n_right AS BIGINT) AS n_right,
        |  CAST(contrib AS BIGINT) AS contrib,
        |  CAST(t AS BIGINT) AS total_rows,
        |  CAST(contrib * 1000000 // t AS BIGINT) AS share_fp
        |FROM per CROSS JOIN tot
        |ORDER BY contrib DESC, key LIMIT 3""".stripMargin,
    "q213_gini" ->
      // the same sorted-rank moment in HUGEINT, floor-divided
      """WITH v AS (SELECT l_suppkey,
        |    CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS x
        |  FROM lineitem),
        |r AS (SELECT l_suppkey, x,
        |    row_number() OVER (PARTITION BY l_suppkey ORDER BY x) AS i FROM v),
        |g AS (SELECT l_suppkey, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(x) AS BIGINT) AS total,
        |    sum(CAST(i AS HUGEINT) * CAST(x AS HUGEINT)) AS six
        |  FROM r GROUP BY 1)
        |SELECT l_suppkey, n, total,
        |  CAST(CASE WHEN n >= 2 AND total > 0 THEN
        |    (2 * six - (CAST(n AS HUGEINT) + 1) * CAST(total AS HUGEINT)) * 10000
        |      // (CAST(n AS HUGEINT) * CAST(total AS HUGEINT)) END AS BIGINT)
        |    AS gini_fp
        |FROM g""".stripMargin,
    "q212_rolling_sum" ->
      // the identical RANGE frame over the per-day pre-aggregate
      """WITH e AS (SELECT user_id, epoch_ms(ts) // 86400000 AS tick,
        |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS c
        |  FROM events),
        |p AS (SELECT user_id, tick, CAST(sum(c) AS BIGINT) AS v
        |  FROM e GROUP BY 1, 2)
        |SELECT user_id, tick, v,
        |  CAST(sum(v) OVER (PARTITION BY user_id ORDER BY tick
        |    RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS BIGINT) AS trail_sum,
        |  CAST(count(*) OVER (PARTITION BY user_id ORDER BY tick
        |    RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS BIGINT) AS trail_ticks
        |FROM p""".stripMargin,
    "q211_basket_lift" ->
      // the same distinct baskets, pair join, and fixed-point lift
      """WITH b AS (SELECT DISTINCT user_id,
        |    epoch_ms(ts) // 86400000 AS day, event_type FROM events
        |  WHERE event_type IS NOT NULL),
        |n AS (SELECT count(*) AS nb FROM
        |      (SELECT DISTINCT user_id, day FROM b)),
        |i AS (SELECT event_type, count(*) AS ni FROM b GROUP BY 1),
        |p AS (SELECT x.event_type AS a, y.event_type AS b2,
        |    count(*) AS n_ab
        |  FROM b x JOIN b y ON x.user_id = y.user_id AND x.day = y.day
        |    AND x.event_type < y.event_type GROUP BY 1, 2)
        |SELECT p.a, p.b2 AS b, CAST(p.n_ab AS BIGINT) AS n_ab,
        |  CAST(ia.ni AS BIGINT) AS n_a, CAST(ib.ni AS BIGINT) AS n_b,
        |  CAST(n.nb AS BIGINT) AS n_baskets,
        |  CAST((n.nb * p.n_ab * 10000) // (ia.ni * ib.ni) AS BIGINT) AS lift_fp
        |FROM p CROSS JOIN n
        |  JOIN i ia ON ia.event_type = p.a
        |  JOIN i ib ON ib.event_type = p.b2""".stripMargin,
    "q207_sessionize" ->
      // the same lag/run-sum/last-break windows
      """WITH e AS (SELECT user_id, epoch_us(ts) AS us, event_id FROM events),
        |r AS (SELECT user_id, us, event_id,
        |    CASE WHEN us - lag(us) OVER (PARTITION BY user_id
        |           ORDER BY us, event_id) > 1800000000 THEN 1 ELSE 0 END AS brk,
        |    row_number() OVER (PARTITION BY user_id ORDER BY us, event_id) AS rn
        |  FROM e),
        |s AS (SELECT user_id, us, event_id, rn,
        |    sum(brk) OVER (PARTITION BY user_id ORDER BY rn
        |                   ROWS UNBOUNDED PRECEDING) + 1 AS sidx,
        |    max(CASE WHEN brk = 1 THEN rn END)
        |      OVER (PARTITION BY user_id ORDER BY rn
        |            ROWS UNBOUNDED PRECEDING) AS lastb
        |  FROM r)
        |SELECT user_id, CAST(us AS BIGINT) AS us, event_id AS tie,
        |  CAST(sidx AS BIGINT) AS session_idx,
        |  CAST(rn - coalesce(lastb, 1) + 1 AS BIGINT) AS event_idx
        |FROM s""".stripMargin,
    "q208_zscore" ->
      // the identical decimal moments + double formula per user
      """WITH v AS (SELECT user_id, event_id,
        |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
        |  FROM events),
        |m AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n,
        |    sum(CAST(cents AS DECIMAL(38,0))) AS sx,
        |    sum(CAST(cents AS DECIMAL(38,0)) * CAST(cents AS DECIMAL(38,0))) AS sxx
        |  FROM v GROUP BY 1)
        |SELECT v.user_id, v.event_id, v.cents,
        |  CASE WHEN m.n >= 2 AND
        |    ((CAST(sxx AS DOUBLE) / CAST(n AS DOUBLE)) -
        |     ((CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)) *
        |      (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)))) > 0
        |  THEN (CAST(v.cents AS DOUBLE) - (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))) /
        |    sqrt((CAST(sxx AS DOUBLE) / CAST(n AS DOUBLE)) -
        |         ((CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)) *
        |          (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))))
        |  END AS z
        |FROM v JOIN m USING (user_id)""".stripMargin,
    "q206_weighted_median" ->
      // smallest value whose cumulative weight reaches the rank
      """WITH v AS (SELECT l_suppkey,
        |    CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS c,
        |    CAST(l_quantity AS BIGINT) AS w FROM lineitem),
        |t AS (SELECT l_suppkey, sum(w) AS wt FROM v GROUP BY 1),
        |r AS (SELECT l_suppkey, c,
        |    sum(w) OVER (PARTITION BY l_suppkey ORDER BY c
        |                 ROWS UNBOUNDED PRECEDING) AS cum FROM v),
        |j AS (SELECT r.l_suppkey, t.wt,
        |    greatest(1, (50 * t.wt + 99) // 100) AS rk, r.c, r.cum
        |  FROM r JOIN t USING (l_suppkey))
        |SELECT l_suppkey, CAST(wt AS BIGINT) AS n, CAST(rk AS BIGINT) AS rk,
        |  CAST(min(c) AS BIGINT) AS value
        |FROM j WHERE cum >= rk GROUP BY 1, 2, 3""".stripMargin,
    "q205_changepoint" ->
      // the same prefix-sum windows, double formula, and argmax pick
      """WITH e AS (SELECT user_id, ts, event_id,
        |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS c FROM events),
        |r AS (SELECT user_id, epoch_us(ts) AS us,
        |    sum(c) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                 ROWS UNBOUNDED PRECEDING) AS s,
        |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS i,
        |    sum(c) OVER (PARTITION BY user_id) AS st,
        |    count(*) OVER (PARTITION BY user_id) AS n
        |  FROM e),
        |g AS (SELECT user_id, n, i, us,
        |    (((CAST(s AS DOUBLE) * CAST(s AS DOUBLE)) / CAST(i AS DOUBLE)) +
        |     (((CAST(st AS DOUBLE) - CAST(s AS DOUBLE)) *
        |       (CAST(st AS DOUBLE) - CAST(s AS DOUBLE))) /
        |      (CAST(n AS DOUBLE) - CAST(i AS DOUBLE)))) -
        |    ((CAST(st AS DOUBLE) * CAST(st AS DOUBLE)) / CAST(n AS DOUBLE))
        |      AS gain
        |  FROM r WHERE i < n),
        |p AS (SELECT *, row_number() OVER (PARTITION BY user_id
        |                ORDER BY gain DESC, i ASC) AS rn FROM g)
        |SELECT user_id, CAST(n AS BIGINT) AS n, CAST(i AS BIGINT) AS cp_idx,
        |  CAST(us AS BIGINT) AS cp_us, gain
        |FROM p WHERE rn = 1""".stripMargin,
    "q203_mode" ->
      // counts, per-key max count, then the same largest-value pick
      """WITH c AS (SELECT user_id, event_type, count(*) AS n FROM events
        |           WHERE event_type IS NOT NULL GROUP BY 1, 2),
        |m AS (SELECT user_id, max(n) AS mn FROM c GROUP BY 1)
        |SELECT c.user_id, max(c.event_type) AS mode,
        |  CAST(min(c.n) AS BIGINT) AS mode_n
        |FROM c JOIN m ON c.user_id = m.user_id AND c.n = m.mn
        |GROUP BY 1""".stripMargin,
    "q204_transitions" ->
      // the same lag replay
      """WITH e AS (SELECT user_id, event_type,
        |    lag(event_type) OVER (PARTITION BY user_id
        |                          ORDER BY ts, event_id) AS prev
        |  FROM events)
        |SELECT prev AS from_state, event_type AS to_state,
        |  CAST(count(*) AS BIGINT) AS n
        |FROM e WHERE prev IS NOT NULL GROUP BY 1, 2""".stripMargin,
    "q202_correlations" -> corrOracle,
    "q201_quantile_bins" ->
      // the naive global window the two-phase rank replaces
      """WITH v AS (SELECT l_orderkey * 8 + l_linenumber AS lid,
        |    CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
        |  FROM lineitem),
        |r AS (SELECT lid, row_number() OVER (ORDER BY cents, lid) AS rk,
        |    count(*) OVER () AS n FROM v)
        |SELECT lid AS key, CAST(rk AS BIGINT) AS rank,
        |  CAST((rk - 1) * 16 // n + 1 AS BIGINT) AS bin FROM r""".stripMargin,
    "q199_winsorize" ->
      // q121's inclusive-rank percentiles per group, then the clamp
      """WITH v AS (SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
        |    l_suppkey,
        |    CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
        |  FROM lineitem),
        |r AS (SELECT l_suppkey, cents AS c,
        |    row_number() OVER (PARTITION BY l_suppkey ORDER BY cents) AS rn,
        |    count(*) OVER (PARTITION BY l_suppkey) AS cnt FROM v),
        |b AS (SELECT l_suppkey,
        |    max(CASE WHEN rn = greatest(1, (5 * cnt + 99) // 100) THEN c END) AS lo,
        |    max(CASE WHEN rn = greatest(1, (95 * cnt + 99) // 100) THEN c END) AS hi
        |  FROM r GROUP BY 1)
        |SELECT v.l_orderkey, v.l_linenumber, v.l_suppkey, v.cents,
        |  CAST(least(greatest(v.cents, b.lo), b.hi) AS BIGINT) AS cents_w
        |FROM v JOIN b USING (l_suppkey)""".stripMargin,
    "q196_ewma_fold" ->
      // the same left-to-right fold over the same ordered list
      """WITH e AS (SELECT user_id, ts, event_id,
        |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS v
        |  FROM events)
        |SELECT user_id, CAST(len(vs) AS BIGINT) AS n,
        |  CAST(list_reduce(vs, (x, y) -> (x + y) // 2) AS BIGINT) AS ewma
        |FROM (SELECT user_id, list(v ORDER BY ts, event_id) AS vs
        |      FROM e GROUP BY 1)""".stripMargin,
    "q195_cusum" ->
      // the same scan identity: s = P - least(0, running min P)
      """WITH e AS (SELECT user_id, ts, event_id,
        |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) - 5000 AS d
        |  FROM events),
        |c1 AS (SELECT user_id, ts, event_id, d,
        |    sum(d) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                 ROWS UNBOUNDED PRECEDING) AS p FROM e),
        |c2 AS (SELECT user_id, ts, p,
        |    least(0, min(p) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                          ROWS UNBOUNDED PRECEDING)) AS m FROM c1),
        |s AS (SELECT user_id, ts, p - m AS s FROM c2)
        |SELECT user_id, CAST(count(*) AS BIGINT) AS n,
        |  CAST(max(s) AS BIGINT) AS max_cusum,
        |  CAST(sum(CASE WHEN s > 20000 THEN 1 ELSE 0 END) AS BIGINT) AS n_breach,
        |  CAST(min(CASE WHEN s > 20000 THEN epoch_us(ts) END) AS BIGINT)
        |    AS first_breach_us
        |FROM s GROUP BY 1""".stripMargin,
    "q224_mad_monitor_stream" ->
      // the profile under q186's rank convention (even days), then the
      // identical flags counted over the odd-day union
      """WITH v AS (SELECT event_type,
        |    epoch_ms(ts) // 86400000 AS day,
        |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS x
        |  FROM events),
        |r AS (SELECT event_type, x FROM v WHERE day % 2 = 0),
        |m AS (SELECT event_type, x AS med FROM (
        |    SELECT event_type, x, row_number() OVER (PARTITION BY event_type ORDER BY x) AS rn,
        |           count(*) OVER (PARTITION BY event_type) AS cnt FROM r)
        |  WHERE rn = greatest(1, (50 * cnt + 99) // 100)),
        |dv AS (SELECT r.event_type, abs(r.x - m.med) AS dev
        |       FROM r JOIN m USING (event_type)),
        |md AS (SELECT event_type, dev AS mad FROM (
        |    SELECT event_type, dev, row_number() OVER (PARTITION BY event_type ORDER BY dev) AS rn,
        |           count(*) OVER (PARTITION BY event_type) AS cnt FROM dv)
        |  WHERE rn = greatest(1, (50 * cnt + 99) // 100)),
        |q AS (SELECT event_type, x FROM v WHERE day % 2 = 1)
        |SELECT m.event_type, m.med AS median, md.mad AS mad,
        |  CAST(count(q.x) AS BIGINT) AS n_seen,
        |  CAST(coalesce(sum(CASE WHEN abs(q.x - m.med) > 3.0 * md.mad
        |                         THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_flagged
        |FROM m JOIN md USING (event_type) LEFT JOIN q USING (event_type)
        |GROUP BY 1, 2, 3""".stripMargin,
    "q194_k_anonymize" ->
      // the three level counts and the same finest-first CASE pick
      """WITH q AS (SELECT c_custkey, c_nationkey AS nation,
        |    c_mktsegment AS seg,
        |    CAST(floor(c_acctbal / 2000.0) AS BIGINT) AS bal FROM customer),
        |n0 AS (SELECT nation, seg, bal, count(*) AS c FROM q GROUP BY 1, 2, 3),
        |n1 AS (SELECT nation, seg, count(*) AS c FROM q GROUP BY 1, 2),
        |n2 AS (SELECT seg, count(*) AS c FROM q GROUP BY 1)
        |SELECT q.c_custkey,
        |  CAST(CASE WHEN n0.c >= 8 THEN 0 WHEN n1.c >= 8 THEN 1
        |            WHEN n2.c >= 8 THEN 2 END AS BIGINT) AS lvl,
        |  CAST(CASE WHEN n0.c >= 8 THEN n0.c WHEN n1.c >= 8 THEN n1.c
        |            WHEN n2.c >= 8 THEN n2.c END AS BIGINT) AS grp_n
        |FROM q JOIN n0 USING (nation, seg, bal)
        |  JOIN n1 USING (nation, seg) JOIN n2 USING (seg)
        |WHERE n0.c >= 8 OR n1.c >= 8 OR n2.c >= 8""".stripMargin,
    "q225_l_diversity" ->
      // both floors per level (count + distinct segments) and the same
      // finest-first CASE pick
      """WITH q AS (SELECT c_custkey, c_nationkey AS nation,
        |    CAST(floor(c_acctbal / 2000.0) AS BIGINT) AS bal,
        |    c_mktsegment AS s FROM customer),
        |l0 AS (SELECT nation, bal, CAST(count(*) AS BIGINT) AS n0,
        |    CAST(count(DISTINCT s) AS BIGINT) AS d0 FROM q GROUP BY 1, 2),
        |l1 AS (SELECT nation, CAST(count(*) AS BIGINT) AS n1,
        |    CAST(count(DISTINCT s) AS BIGINT) AS d1 FROM q GROUP BY 1)
        |SELECT q.c_custkey,
        |  CAST(CASE WHEN n0 >= 8 AND d0 >= 3 THEN 0
        |            WHEN n1 >= 8 AND d1 >= 3 THEN 1 END AS BIGINT) AS lvl,
        |  CASE WHEN n0 >= 8 AND d0 >= 3 THEN n0
        |       WHEN n1 >= 8 AND d1 >= 3 THEN n1 END AS grp_n,
        |  CASE WHEN n0 >= 8 AND d0 >= 3 THEN d0
        |       WHEN n1 >= 8 AND d1 >= 3 THEN d1 END AS grp_l
        |FROM q JOIN l0 USING (nation, bal) JOIN l1 USING (nation)
        |WHERE (n0 >= 8 AND d0 >= 3) OR (n1 >= 8 AND d1 >= 3)""".stripMargin,
    "q229_rl_diversity" ->
      // both levels' descending count vectors, s1 and the rank->=l
      // tail, and the same finest-first CASE pick
      """WITH q AS (SELECT c_custkey, c_nationkey AS nation,
        |    CAST(floor(c_acctbal / 2000.0) AS BIGINT) AS bal,
        |    c_mktsegment AS s FROM customer),
        |n0 AS (SELECT nation, bal, CAST(count(*) AS BIGINT) AS n FROM q GROUP BY 1, 2),
        |p0 AS (SELECT nation, bal, s, count(*) AS sc FROM q GROUP BY 1, 2, 3),
        |r0 AS (SELECT nation, bal, sc, row_number() OVER (
        |    PARTITION BY nation, bal ORDER BY sc DESC, s ASC) AS rk FROM p0),
        |s0 AS (SELECT nation, bal, CAST(max(CASE WHEN rk = 1 THEN sc END) AS BIGINT) AS s1,
        |    CAST(coalesce(sum(CASE WHEN rk >= 4 THEN sc END), 0) AS BIGINT) AS t
        |  FROM r0 GROUP BY 1, 2),
        |n1 AS (SELECT nation, CAST(count(*) AS BIGINT) AS n FROM q GROUP BY 1),
        |p1 AS (SELECT nation, s, count(*) AS sc FROM q GROUP BY 1, 2),
        |r1 AS (SELECT nation, sc, row_number() OVER (
        |    PARTITION BY nation ORDER BY sc DESC, s ASC) AS rk FROM p1),
        |s1t AS (SELECT nation, CAST(max(CASE WHEN rk = 1 THEN sc END) AS BIGINT) AS s1,
        |    CAST(coalesce(sum(CASE WHEN rk >= 4 THEN sc END), 0) AS BIGINT) AS t
        |  FROM r1 GROUP BY 1)
        |SELECT q.c_custkey,
        |  CAST(CASE WHEN n0.n >= 10 AND s0.s1 < 2 * s0.t THEN 0
        |            WHEN n1.n >= 10 AND s1t.s1 < 2 * s1t.t THEN 1 END AS BIGINT) AS lvl,
        |  CASE WHEN n0.n >= 10 AND s0.s1 < 2 * s0.t THEN n0.n
        |       WHEN n1.n >= 10 AND s1t.s1 < 2 * s1t.t THEN n1.n END AS grp_n,
        |  CASE WHEN n0.n >= 10 AND s0.s1 < 2 * s0.t THEN s0.s1
        |       WHEN n1.n >= 10 AND s1t.s1 < 2 * s1t.t THEN s1t.s1 END AS grp_s1,
        |  CASE WHEN n0.n >= 10 AND s0.s1 < 2 * s0.t THEN s0.t
        |       WHEN n1.n >= 10 AND s1t.s1 < 2 * s1t.t THEN s1t.t END AS grp_tail
        |FROM q JOIN n0 USING (nation, bal) JOIN s0 USING (nation, bal)
        |  JOIN n1 USING (nation) JOIN s1t USING (nation)
        |WHERE (n0.n >= 10 AND s0.s1 < 2 * s0.t)
        |   OR (n1.n >= 10 AND s1t.s1 < 2 * s1t.t)""".stripMargin,
    "q193_fuzzy_vocab_join" ->
      // the |V|² cross join the deletion-neighborhood scheme replaces
      """WITH v AS (SELECT DISTINCT lower(w) AS w FROM (
        |    SELECT unnest(string_split(p_name, ' ')) AS w FROM part
        |    UNION ALL SELECT unnest(string_split(p_type, ' ')) FROM part
        |    UNION ALL SELECT unnest(string_split(p_brand, ' ')) FROM part
        |    UNION ALL SELECT unnest(string_split(lower(text), ' ')) FROM documents)
        |  WHERE length(w) > 0)
        |SELECT a.w AS a, b.w AS b,
        |  CAST(levenshtein(a.w, b.w) AS BIGINT) AS dist
        |FROM v a JOIN v b ON a.w < b.w AND levenshtein(a.w, b.w) <= 2""".stripMargin,
    "q192_skyline" ->
      // the naive quadratic dominance filter the operator avoids
      """WITH p AS (SELECT p_brand, p_partkey, p_size,
        |    CAST(p_retailprice AS DECIMAL(18,2)) AS price FROM part)
        |SELECT r.p_brand, r.p_partkey, r.p_size,
        |  CAST(r.price AS DOUBLE) AS price
        |FROM p r WHERE NOT EXISTS (
        |  SELECT 1 FROM p q WHERE q.p_brand = r.p_brand
        |    AND q.p_size >= r.p_size AND q.price <= r.price
        |    AND (q.p_size > r.p_size OR q.price < r.price))""".stripMargin,
    "q186_mad_outliers" ->
      // both medians replayed with q121's rank convention, then the
      // identical |x - med| > 3*MAD count per group
      """WITH v AS (SELECT l_suppkey,
        |    CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS x
        |  FROM lineitem),
        |m AS (SELECT l_suppkey, x AS med FROM (
        |    SELECT l_suppkey, x, row_number() OVER (PARTITION BY l_suppkey ORDER BY x) AS rn,
        |           count(*) OVER (PARTITION BY l_suppkey) AS cnt FROM v)
        |  WHERE rn = greatest(1, (50 * cnt + 99) // 100)),
        |d AS (SELECT v.l_suppkey, v.x, m.med, abs(v.x - m.med) AS dev
        |      FROM v JOIN m ON v.l_suppkey = m.l_suppkey),
        |md AS (SELECT l_suppkey, dev AS mad FROM (
        |    SELECT l_suppkey, dev, row_number() OVER (PARTITION BY l_suppkey ORDER BY dev) AS rn,
        |           count(*) OVER (PARTITION BY l_suppkey) AS cnt FROM d)
        |  WHERE rn = greatest(1, (50 * cnt + 99) // 100))
        |SELECT d.l_suppkey, CAST(count(*) AS BIGINT) AS n,
        |  min(d.med) AS median, min(md.mad) AS mad,
        |  CAST(sum(CASE WHEN d.dev > 3.0 * md.mad THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
        |FROM d JOIN md ON d.l_suppkey = md.l_suppkey
        |GROUP BY 1""".stripMargin,
    "q109_exact_percentiles" ->
      // replay: same rank arithmetic (integer ceil division), value
      // fetched by row_number — the sort the engine side avoids
      """WITH v AS (SELECT CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS c
        |           FROM lineitem),
        |n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM v),
        |ks(q_pct) AS (VALUES (50), (90), (99)),
        |r AS (SELECT CAST(q_pct AS BIGINT) AS q_pct,
        |             greatest(1, (q_pct * n.n + 99) // 100) AS rk FROM ks, n),
        |w AS (SELECT c, row_number() OVER (ORDER BY c) AS rn FROM v)
        |SELECT r.q_pct, CAST(r.rk AS BIGINT) AS rk, w.c AS value
        |FROM r JOIN w ON w.rn = r.rk""".stripMargin,
    "q107_retention" ->
      // replay: first signup week per user, distinct active weeks,
      // offset counts; epoch-ms integer division on both engines
      """WITH e AS (SELECT user_id, event_type, epoch_ms(ts) AS ms FROM events),
        |f AS (SELECT user_id, min(ms) // 604800000 AS p0 FROM e
        |      WHERE event_type = 'signup' GROUP BY user_id),
        |a AS (SELECT DISTINCT user_id, ms // 604800000 AS p FROM e),
        |j AS (SELECT f.p0, a.p FROM a JOIN f USING (user_id) WHERE a.p >= f.p0)
        |SELECT CAST(p0 * 604800000 AS BIGINT) AS cohort_ms,
        |       CAST(p - p0 AS BIGINT) AS period_offset,
        |       CAST(count(*) AS BIGINT) AS n_active
        |FROM j GROUP BY p0, p""".stripMargin,
    "q118_retention_stream" ->
      // replay: identical to q107's — the streaming triangle's final
      // totals equal the batch operator by the parity contract (the
      // replay is event-time-ordered), and DuckDB replays the batch side
      """WITH e AS (SELECT user_id, event_type, epoch_ms(ts) AS ms FROM events),
        |f AS (SELECT user_id, min(ms) // 604800000 AS p0 FROM e
        |      WHERE event_type = 'signup' GROUP BY user_id),
        |a AS (SELECT DISTINCT user_id, ms // 604800000 AS p FROM e),
        |j AS (SELECT f.p0, a.p FROM a JOIN f USING (user_id) WHERE a.p >= f.p0)
        |SELECT CAST(p0 * 604800000 AS BIGINT) AS cohort_ms,
        |       CAST(p - p0 AS BIGINT) AS period_offset,
        |       CAST(count(*) AS BIGINT) AS n_active
        |FROM j GROUP BY p0, p""".stripMargin,
    "q108_snapshot_diff" ->
      // replay: the same two versions, full outer join, null-safe
      // column compare (IS DISTINCT FROM == Spark's <=> negated)
      """WITH b AS (SELECT * FROM orders WHERE o_orderkey % 11 <> 0),
        |a AS (SELECT o_orderkey,
        |        o_custkey + CASE WHEN o_orderkey % 7 = 0 THEN 1000000 ELSE 0 END AS o_custkey,
        |        o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
        |      FROM orders WHERE o_orderkey % 13 <> 0)
        |SELECT o_orderkey, change_type FROM (
        |  SELECT COALESCE(b.o_orderkey, a.o_orderkey) AS o_orderkey,
        |    CASE WHEN b.o_orderkey IS NULL THEN 'added'
        |         WHEN a.o_orderkey IS NULL THEN 'removed'
        |         WHEN (b.o_custkey IS DISTINCT FROM a.o_custkey)
        |           OR (b.o_orderstatus IS DISTINCT FROM a.o_orderstatus)
        |           OR (b.o_totalprice IS DISTINCT FROM a.o_totalprice)
        |           OR (b.o_orderdate IS DISTINCT FROM a.o_orderdate)
        |           OR (b.o_orderpriority IS DISTINCT FROM a.o_orderpriority)
        |         THEN 'changed' ELSE 'unchanged' END AS change_type
        |  FROM b FULL JOIN a ON b.o_orderkey = a.o_orderkey
        |) WHERE change_type <> 'unchanged'""".stripMargin,
    "q120_line_scrub" ->
      // replay: same 2-word-line reconstruction (1-based inclusive list
      // slices == Spark's slice), then first-occurrence filter — DuckDB
      // list_position over the preceding-lines slice returns 0 when
      // absent, mirroring the engine's !exists(slice) predicate
      """WITH t AS (SELECT doc_id,
        |    list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS toks
        |  FROM documents),
        |c AS (SELECT doc_id, CASE WHEN len(toks) = 0 THEN '' ELSE array_to_string(
        |    list_transform(range(0, CAST(ceil(len(toks) / 2.0) AS INT)),
        |      j -> array_to_string(toks[j*2+1 : j*2+2], ' ')), chr(10)) END AS text2
        |  FROM t),
        |l AS (SELECT doc_id, string_split(text2, chr(10)) AS ls FROM c),
        |k AS (SELECT doc_id, ls,
        |    list_filter(ls, (x, i) -> list_position(ls[1:i-1], x) = 0) AS kept FROM l)
        |SELECT doc_id, array_to_string(kept, chr(10)) AS cleaned,
        |  CAST(len(ls) AS BIGINT) AS n_lines, CAST(len(kept) AS BIGINT) AS n_kept
        |FROM k""".stripMargin,
    "q119_funnel_stream" ->
      // replay: identical to q106's — the per-user machine's final
      // snapshot over an event-time-ordered replay equals the batch
      // funnel (FunnelSpec's parity), and DuckDB replays the batch side
      """WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS t FROM events
        |           WHERE event_type IN ('view', 'click', 'purchase')),
        |t1 AS (SELECT user_id, min(t) AS t FROM e WHERE event_type = 'view' GROUP BY user_id),
        |t2 AS (SELECT e.user_id, min(e.t) AS t FROM e JOIN t1 USING (user_id)
        |       WHERE e.event_type = 'click' AND e.t > t1.t GROUP BY e.user_id),
        |t3 AS (SELECT e.user_id, min(e.t) AS t FROM e JOIN t2 USING (user_id)
        |       WHERE e.event_type = 'purchase' AND e.t > t2.t GROUP BY e.user_id),
        |u AS (SELECT DISTINCT user_id FROM e)
        |SELECT u.user_id,
        |  CAST(CASE WHEN t3.t IS NOT NULL THEN 3 WHEN t2.t IS NOT NULL THEN 2
        |            WHEN t1.t IS NOT NULL THEN 1 ELSE 0 END AS BIGINT) AS steps_completed,
        |  t3.t IS NOT NULL AS converted
        |FROM u LEFT JOIN t1 USING (user_id) LEFT JOIN t2 USING (user_id)
        |       LEFT JOIN t3 USING (user_id)""".stripMargin,
    "q127_token_drift" ->
      // replay: same md5-hex split, q04's tokenizer replay, FULL JOIN of
      // the two vocab counts, HUGEINT products cast to DECIMAL(38,0)
      // (Spark's decimal type — the driver's hasher is type-sensitive)
      """WITH da AS (SELECT text FROM documents
        |            WHERE substring(md5(CAST(doc_id AS VARCHAR)), 1, 1) < '8'),
        |db AS (SELECT text FROM documents
        |       WHERE substring(md5(CAST(doc_id AS VARCHAR)), 1, 1) >= '8'),
        |ca AS (SELECT word AS token, count(*) AS n_a FROM (
        |         SELECT unnest(string_split_regex(lower(text), '\s+')) AS word FROM da)
        |       WHERE word <> '' GROUP BY 1),
        |cb AS (SELECT word AS token, count(*) AS n_b FROM (
        |         SELECT unnest(string_split_regex(lower(text), '\s+')) AS word FROM db)
        |       WHERE word <> '' GROUP BY 1),
        |j AS (SELECT COALESCE(ca.token, cb.token) AS token,
        |        COALESCE(n_a, 0) AS n_a, COALESCE(n_b, 0) AS n_b
        |      FROM ca FULL JOIN cb ON ca.token = cb.token),
        |t AS (SELECT (SELECT COALESCE(sum(n_a), 0) FROM j) AS ta,
        |             (SELECT COALESCE(sum(n_b), 0) FROM j) AS tb)
        |SELECT token, n_a, n_b,
        |  CAST(abs(n_a * tb - n_b * ta) AS BIGINT) AS move
        |FROM j, t
        |ORDER BY move DESC, token ASC LIMIT 50""".stripMargin,
    "q125_table_fingerprint" ->
      // replay: same canonical strings (chr(1) separators, chr(2) null
      // sentinel), same 15-hex-digit md5 prefix via the '0x' cast
      // (q110's trick), bit_xor + HUGEINT sum mod 2^62 cast back to
      // BIGINT (the driver's hasher is type-sensitive)
      """WITH t AS (SELECT l_returnflag,
        |    CAST('0x' || substr(md5(concat_ws(chr(1),
        |      COALESCE(CAST(l_orderkey AS VARCHAR), chr(2)),
        |      COALESCE(CAST(l_linenumber AS VARCHAR), chr(2)),
        |      COALESCE(CAST(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS VARCHAR), chr(2)),
        |      COALESCE(CAST(epoch_ms(l_shipdate) AS VARCHAR), chr(2)),
        |      COALESCE(l_linestatus, chr(2)))), 1, 15) AS BIGINT) AS h
        |  FROM lineitem)
        |SELECT l_returnflag, count(*) AS n, bit_xor(h) AS xor_fp,
        |  CAST(sum(h) % 4611686018427387904 AS BIGINT) AS sum_fp
        |FROM t GROUP BY 1""".stripMargin,
    "q122_window_stream" ->
      // replay: identical to q21's — event-time-ordered delivery with a
      // sentinel-advanced final watermark makes the append-mode output
      // set equal the batch tumbling aggregate
      """SELECT (epoch_ms(ts) // 3600000) * 3600000 AS win_start_ms, event_type,
        |count(*) AS cnt, CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_v
        |FROM events GROUP BY 1, 2""".stripMargin,
    "q123_running_agg_stream" ->
      // replay: identical to q08's — a commutative running aggregate's
      // final update equals the batch aggregate on any delivery order
      """SELECT user_id, event_type, min(event_id) AS first_event_id, count(*) AS n
        |FROM events GROUP BY user_id, event_type""".stripMargin,
    "q128_sliding_stream" ->
      // replay: identical to q22's — the same sentinel-flush argument
      // as q122, per overlapping window
      """SELECT (epoch_ms(ts) // 1200000 - k.k) * 1200000 AS win_start_ms, event_type,
        |count(*) AS cnt, CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_v
        |FROM events, (VALUES (0),(1),(2)) k(k)
        |GROUP BY 1, 2""".stripMargin,
    "q126_session_stream" ->
      // replay: identical to q23's — in-order delivery with a
      // sentinel-advanced final watermark closes every session exactly
      // as the batch gap-split does
      """WITH e AS (SELECT user_id, epoch_ms(ts) AS ems FROM events),
        |d AS (SELECT user_id, ems,
        |  CASE WHEN lag(ems) OVER (PARTITION BY user_id ORDER BY ems) IS NULL
        |         OR ems - lag(ems) OVER (PARTITION BY user_id ORDER BY ems) >= 1800000
        |       THEN 1 ELSE 0 END AS new_s FROM e),
        |s AS (SELECT user_id, ems,
        |  sum(new_s) OVER (PARTITION BY user_id ORDER BY ems ROWS UNBOUNDED PRECEDING) AS sid FROM d)
        |SELECT min(ems) AS session_start_ms, user_id, count(*) AS n_events
        |FROM s GROUP BY user_id, sid""".stripMargin,
    "q124_interval_join_stream" ->
      // replay: identical to q24's — a stream-stream INNER join's output
      // set is delivery-order independent under conservative state
      // eviction. The bound compares at MICROSECOND precision (epoch_us),
      // unlike q24's ms convention: the Spark side must keep the raw µs
      // event-time columns in its range predicate (watermark state-
      // eviction bounds are derived from them), so the oracle follows
      // the Spark predicate rather than the other way around — an
      // ms-truncated oracle would diverge on any pair whose true gap
      // falls within 1 ms of the ±6 h boundary.
      """SELECT p.event_id AS purchase_id, c.event_id AS click_id,
        |epoch_ms(p.ts) - epoch_ms(c.ts) AS delta_ms
        |FROM events p JOIN events c
        |ON p.user_id = c.user_id AND p.event_type = 'purchase' AND c.event_type = 'click'
        |AND abs(epoch_us(p.ts) - epoch_us(c.ts)) <= 21600000000""".stripMargin,
    "q222_interval_join_outer_stream" ->
      // q124's replay as a LEFT join: the unmatched purchases carry
      // NULL click_id/delta_ms — the rows the streaming side may only
      // emit on watermark expiry. Same µs-precision bound (the Spark
      // side's range predicate runs on the raw event-time columns).
      """SELECT p.event_id AS purchase_id, c.event_id AS click_id,
        |epoch_ms(p.ts) - epoch_ms(c.ts) AS delta_ms
        |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        |LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
        |ON p.user_id = c.user_id
        |AND abs(epoch_us(p.ts) - epoch_us(c.ts)) <= 21600000000""".stripMargin,
    "q227_interval_join_full_stream" ->
      // both unmatched sides carry NULLs; same µs-precision bound
      """SELECT p.event_id AS purchase_id, c.event_id AS click_id,
        |epoch_ms(p.ts) - epoch_ms(c.ts) AS delta_ms
        |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        |FULL JOIN (SELECT * FROM events WHERE event_type = 'click') c
        |ON p.user_id = c.user_id
        |AND abs(epoch_us(p.ts) - epoch_us(c.ts)) <= 21600000000""".stripMargin,
    "q235_interval_join_right_stream" ->
      // the unmatched clicks carry NULLs; same µs-precision bound
      """SELECT p.event_id AS purchase_id, c.event_id AS click_id,
        |epoch_ms(p.ts) - epoch_ms(c.ts) AS delta_ms
        |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        |RIGHT JOIN (SELECT * FROM events WHERE event_type = 'click') c
        |ON p.user_id = c.user_id
        |AND abs(epoch_us(p.ts) - epoch_us(c.ts)) <= 21600000000""".stripMargin,
    "q226_regex_search" ->
      // the unaccelerated regexp scan the index prunes
      """WITH pats(qid, pat) AS (VALUES
        |  (CAST(0 AS BIGINT), 'merge.*batch'),
        |  (CAST(1 AS BIGINT), 'sorts? merge'),
        |  (CAST(2 AS BIGINT), 'table .able'))
        |SELECT pats.qid, d.doc_id
        |FROM pats, documents d
        |WHERE regexp_matches(lower(d.text), pats.pat)""".stripMargin,
    "q228_join_view_stream" ->
      // the one-shot join the incremental view must converge to
      """SELECT o.o_orderkey, CAST(o.o_custkey AS BIGINT) AS o_custkey,
        |  CAST(l.l_linenumber AS BIGINT) AS l_linenumber,
        |  CAST(CAST(l.l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
        |FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey""".stripMargin,
    "q230_feature_hash" ->
      // the splitmix finalizer on HUGEINT over distinct token bases,
      // buckets unsigned (2^64 mod 256 = 0 makes it pmod-identical)
      s"""WITH t AS (
        |  SELECT doc_id, list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS toks
        |  FROM documents),
        |db AS (
        |  SELECT doc_id, unnest(list_transform(toks, s ->
        |    ${polyBaseSql("s")})) AS b
        |  FROM t),
        |bx AS (SELECT DISTINCT b FROM db),
        |z1t AS (SELECT b, xor(b, b // 1073741824) AS z1 FROM bx),
        |z2t AS (SELECT b, ${mulMod64("z1", mix1Lit)} AS z2 FROM z1t),
        |z3t AS (SELECT b, xor(z2, z2 // 134217728) AS z3 FROM z2t),
        |z4t AS (SELECT b, ${mulMod64("z3", mix2Lit)} AS z4 FROM z3t),
        |mx AS (SELECT b, CAST(xor(z4, z4 // 2147483648) % 256 AS BIGINT) AS bucket FROM z4t)
        |SELECT db.doc_id, mx.bucket, CAST(count(*) AS BIGINT) AS cnt
        |FROM db JOIN mx USING (b)
        |GROUP BY 1, 2""".stripMargin,
    "q231_delta_attribution" ->
      // exact cents totals per nation, net movement, identical division
      """WITH j AS (SELECT c.c_nationkey AS nation,
        |    CAST(year(o.o_orderdate) >= 1998 AS BOOLEAN) AS is_cur,
        |    CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
        |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey),
        |per AS (SELECT nation,
        |    CAST(coalesce(sum(CASE WHEN NOT is_cur THEN cents END), 0) AS BIGINT) AS prev,
        |    CAST(coalesce(sum(CASE WHEN is_cur THEN cents END), 0) AS BIGINT) AS cur
        |  FROM j GROUP BY 1),
        |d AS (SELECT nation, prev, cur, cur - prev AS delta FROM per),
        |t AS (SELECT CAST(sum(delta) AS BIGINT) AS total FROM d)
        |SELECT d.nation, d.prev, d.cur, d.delta,
        |  CASE WHEN t.total <> 0
        |       THEN CAST(d.delta AS DOUBLE) / CAST(t.total AS DOUBLE) END AS share
        |FROM d, t""".stripMargin,
    "q232_coordinated_sample" ->
      // the kept-key set replayed via the splitmix bucket on the
      // key's decimal string, then the same join+aggregate
      s"""WITH ks AS (SELECT DISTINCT o_orderkey AS k FROM orders),
        |bs AS (SELECT k, ${polyBaseSql("CAST(k AS VARCHAR)")} AS b FROM ks),
        |z1t AS (SELECT k, xor(b, b // 1073741824) AS z1 FROM bs),
        |z2t AS (SELECT k, ${mulMod64("z1", mix1Lit)} AS z2 FROM z1t),
        |z3t AS (SELECT k, xor(z2, z2 // 134217728) AS z3 FROM z2t),
        |z4t AS (SELECT k, ${mulMod64("z3", mix2Lit)} AS z4 FROM z3t),
        |sel AS (SELECT k FROM (
        |    SELECT k, xor(z4, z4 // 2147483648) % 256 AS bucket FROM z4t)
        |  WHERE bucket < 16)
        |SELECT o.o_orderpriority, CAST(count(*) AS BIGINT) AS n,
        |  CAST(count(DISTINCT o.o_orderkey) AS BIGINT) AS n_orders,
        |  CAST(sum(CAST(CAST(l.l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS cents
        |FROM orders o
        |JOIN sel ON o.o_orderkey = sel.k
        |JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        |GROUP BY 1""".stripMargin,
    "q233_jaccard_join" ->
      // the |D|^2 brute force the prefix filter replaces — q37's
      // shingle CTE (the proven Dedup.shingles replica), then the
      // same integer threshold arithmetic
      """WITH t AS (
        |  SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '') AS toks
        |  FROM documents),
        |sh AS (
        |  SELECT doc_id,
        |    CASE WHEN len(toks) < 3 THEN [array_to_string(toks, ' ')]
        |         ELSE list_distinct(list_transform(range(len(toks) - 2),
        |                i -> array_to_string(toks[i+1:i+3], ' ')))
        |    END AS sh
        |  FROM t),
        |p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |    CAST(len(list_intersect(a.sh, b.sh)) AS BIGINT) AS inter,
        |    CAST(len(a.sh) AS BIGINT) AS n_a, CAST(len(b.sh) AS BIGINT) AS n_b
        |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id)
        |SELECT id_a, id_b, inter, n_a, n_b FROM p
        |WHERE inter * 10000 >= 4000 * (n_a + n_b - inter)""".stripMargin,
    "q234_join_agg_view_stream" ->
      // the one-shot join + group-by the incremental composition
      // must converge to
      """SELECT o.o_custkey, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CAST(CAST(l.l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS cents
        |FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        |GROUP BY 1""".stripMargin,
    "q129_restart_exactly_once" ->
      // replay: identical to q21's — the stop/restart must be invisible
      // in the final table; any offset replay, lost batch or stale
      // window state across the checkpoint boundary breaks the compare
      """SELECT (epoch_ms(ts) // 3600000) * 3600000 AS win_start_ms, event_type,
        |count(*) AS cnt, CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_v
        |FROM events GROUP BY 1, 2""".stripMargin,
    "q130_late_drop_stream" ->
      // replay: the drop rule itself. Slice of a row = its position
      // among 8 equal ms-ranges (the inverse of Replay's boundary
      // formula: idx = ((v-lo)*8+7)//N for ranges [lo+N*i/8,
      // lo+N*(i+1)/8), N=hi-lo+1 — ReplaySpec pins the equivalence);
      // LATE-filter watermark of the batch at delivery position p =
      // running max of the slices' max epoch-ms over positions ≤ p−2,
      // minus 240 h — the 2-PRECEDING frame is Spark's one-batch lag
      // between late filtering and eviction (SPARK-40925; StreamingSpec
      // pins it: a 1-PRECEDING rule would drop slices displaced by one
      // position, which Spark keeps). Spark tracks event-time stats in
      // TRUNCATED ms and updates watermarks only between micro-batches;
      // the first two delivered slices see no watermark. A row survives
      // iff its hourly window's end EXCEEDS the watermark (Spark drops
      // window.end <= wm). The VALUES list is q130Order as
      // (slice, position) pairs.
      """WITH b AS (SELECT min(epoch_ms(ts)) AS lo, max(epoch_ms(ts)) AS hi FROM events),
        |e AS (SELECT event_type, epoch_ms(ts) AS ems,
        |        ((epoch_ms(ts) - b.lo) * 8 + 7) // (b.hi - b.lo + 1) AS slice
        |      FROM events, b),
        |sm AS (SELECT slice, max(ems) AS smax FROM e GROUP BY slice),
        |ord(slice, pos) AS (VALUES (2,0),(3,1),(0,2),(1,3),(6,4),(7,5),(4,6),(5,7)),
        |w AS (SELECT o.slice,
        |        max(sm.smax) OVER (ORDER BY o.pos
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 2 PRECEDING) - 864000000 AS wm
        |      FROM ord o JOIN sm ON o.slice = sm.slice),
        |kept AS (SELECT e.event_type, e.ems FROM e JOIN w ON e.slice = w.slice
        |         WHERE w.wm IS NULL OR ((e.ems // 3600000) + 1) * 3600000 > w.wm)
        |SELECT (ems // 3600000) * 3600000 AS win_start_ms, event_type,
        |count(*) AS cnt FROM kept GROUP BY 1, 2""".stripMargin,
    "q135_dedup_stream" ->
      // replay: the echoes must be COMPLETELY invisible — the streamed
      // dedup of (events ∪ redelivered clicks) is exactly events
      "SELECT event_id, user_id, event_type FROM events",
    "q134_retention_restart" ->
      // replay: identical to q107's — the mid-replay stop/restart of
      // the custom keyed state must be invisible in the result
      """WITH e AS (SELECT user_id, event_type, epoch_ms(ts) AS ms FROM events),
        |f AS (SELECT user_id, min(ms) // 604800000 AS p0 FROM e
        |      WHERE event_type = 'signup' GROUP BY user_id),
        |a AS (SELECT DISTINCT user_id, ms // 604800000 AS p FROM e),
        |j AS (SELECT f.p0, a.p FROM a JOIN f USING (user_id) WHERE a.p >= f.p0)
        |SELECT CAST(p0 * 604800000 AS BIGINT) AS cohort_ms,
        |       CAST(p - p0 AS BIGINT) AS period_offset,
        |       CAST(count(*) AS BIGINT) AS n_active
        |FROM j GROUP BY p0, p""".stripMargin,
    "q133_retention_rocksdb" ->
      // replay: identical to q107's — the state backend must be
      // invisible in the result
      """WITH e AS (SELECT user_id, event_type, epoch_ms(ts) AS ms FROM events),
        |f AS (SELECT user_id, min(ms) // 604800000 AS p0 FROM e
        |      WHERE event_type = 'signup' GROUP BY user_id),
        |a AS (SELECT DISTINCT user_id, ms // 604800000 AS p FROM e),
        |j AS (SELECT f.p0, a.p FROM a JOIN f USING (user_id) WHERE a.p >= f.p0)
        |SELECT CAST(p0 * 604800000 AS BIGINT) AS cohort_ms,
        |       CAST(p - p0 AS BIGINT) AS period_offset,
        |       CAST(count(*) AS BIGINT) AS n_active
        |FROM j GROUP BY p0, p""".stripMargin,
    "q131_groupwise_percentiles" ->
      // replay: q121's rank arithmetic per (group, pct) virtual group —
      // value by partitioned row_number, the per-group sort the engine
      // side avoids
      """WITH v AS (SELECT l_suppkey,
        |    CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS c
        |  FROM lineitem),
        |r AS (SELECT l_suppkey, c,
        |    row_number() OVER (PARTITION BY l_suppkey ORDER BY c) AS rn,
        |    count(*) OVER (PARTITION BY l_suppkey) AS cnt FROM v),
        |ks(q_pct) AS (VALUES (50), (90), (99))
        |SELECT r.l_suppkey, CAST(ks.q_pct AS BIGINT) AS q_pct,
        |  CAST(r.cnt AS BIGINT) AS n,
        |  CAST(greatest(1, (ks.q_pct * r.cnt + 99) // 100) AS BIGINT) AS rk,
        |  r.c AS value
        |FROM r, ks WHERE r.rn = greatest(1, (ks.q_pct * r.cnt + 99) // 100)""".stripMargin,
    "q132_drift_baseline" ->
      // replay: identical to q127's — the persisted-baseline roundtrip
      // must be invisible in the drift result
      """WITH da AS (SELECT text FROM documents
        |            WHERE substring(md5(CAST(doc_id AS VARCHAR)), 1, 1) < '8'),
        |db AS (SELECT text FROM documents
        |       WHERE substring(md5(CAST(doc_id AS VARCHAR)), 1, 1) >= '8'),
        |ca AS (SELECT word AS token, count(*) AS n_a FROM (
        |         SELECT unnest(string_split_regex(lower(text), '\s+')) AS word FROM da)
        |       WHERE word <> '' GROUP BY 1),
        |cb AS (SELECT word AS token, count(*) AS n_b FROM (
        |         SELECT unnest(string_split_regex(lower(text), '\s+')) AS word FROM db)
        |       WHERE word <> '' GROUP BY 1),
        |j AS (SELECT COALESCE(ca.token, cb.token) AS token,
        |        COALESCE(n_a, 0) AS n_a, COALESCE(n_b, 0) AS n_b
        |      FROM ca FULL JOIN cb ON ca.token = cb.token),
        |t AS (SELECT (SELECT COALESCE(sum(n_a), 0) FROM j) AS ta,
        |             (SELECT COALESCE(sum(n_b), 0) FROM j) AS tb)
        |SELECT token, n_a, n_b,
        |  CAST(abs(n_a * tb - n_b * ta) AS BIGINT) AS move
        |FROM j, t
        |ORDER BY move DESC, token ASC LIMIT 50""".stripMargin,
    "q106_funnel" ->
      // replay: greedy earliest-match == chained conditional mins
      // (earliest step-i match never forecloses step i+1); epoch_us is
      // exact against Spark's µs timestamps (q93's convention)
      """WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS t FROM events
        |           WHERE event_type IN ('view', 'click', 'purchase')),
        |t1 AS (SELECT user_id, min(t) AS t FROM e WHERE event_type = 'view' GROUP BY user_id),
        |t2 AS (SELECT e.user_id, min(e.t) AS t FROM e JOIN t1 USING (user_id)
        |       WHERE e.event_type = 'click' AND e.t > t1.t GROUP BY e.user_id),
        |t3 AS (SELECT e.user_id, min(e.t) AS t FROM e JOIN t2 USING (user_id)
        |       WHERE e.event_type = 'purchase' AND e.t > t2.t GROUP BY e.user_id),
        |u AS (SELECT DISTINCT user_id FROM e)
        |SELECT u.user_id,
        |  CAST(CASE WHEN t3.t IS NOT NULL THEN 3 WHEN t2.t IS NOT NULL THEN 2
        |            WHEN t1.t IS NOT NULL THEN 1 ELSE 0 END AS BIGINT) AS steps_completed,
        |  t3.t IS NOT NULL AS converted
        |FROM u LEFT JOIN t1 USING (user_id) LEFT JOIN t2 USING (user_id)
        |       LEFT JOIN t3 USING (user_id)""".stripMargin,
    "q105_entropy" ->
      // replay: per-doc unigram histogram, bitlen via binary format
      // length (q81's trick); zero-token docs join back as zeros
      """WITH t AS (SELECT doc_id,
        |    list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '') AS toks
        |  FROM documents),
        |u AS (SELECT doc_id, unnest(toks) AS tok FROM t),
        |c AS (SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS c FROM u GROUP BY doc_id, tok),
        |n AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n, CAST(count(*) AS BIGINT) AS nd
        |      FROM c GROUP BY doc_id),
        |e AS (SELECT c.doc_id,
        |    CAST(sum(c.c * (length(format('{:b}', n.n)) - length(format('{:b}', c.c)))) AS BIGINT) AS ent
        |  FROM c JOIN n USING (doc_id) GROUP BY c.doc_id)
        |SELECT t.doc_id, CAST(coalesce(n.n, 0) AS BIGINT) AS n_tokens,
        |       CAST(coalesce(n.nd, 0) AS BIGINT) AS n_distinct,
        |       CAST(coalesce(e.ent, 0) AS BIGINT) AS ent_bits
        |FROM t LEFT JOIN n USING (doc_id) LEFT JOIN e USING (doc_id)""".stripMargin,
    "q100_dsir_weights" ->
      // replay: same md5 feature buckets ('0x' hex cast % 1024), add-one
      // smoothed bucket counts per corpus, bitlen via binary format
      // length (q81's trick) — the whole weight is integer arithmetic
      """WITH t AS (SELECT doc_id, source,
        |    list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '') AS toks
        |  FROM documents),
        |f AS (SELECT doc_id, source,
        |    toks || CASE WHEN len(toks) >= 2
        |      THEN list_transform(range(len(toks) - 1), i -> toks[i+1] || ' ' || toks[i+2])
        |      ELSE [] END AS fs
        |  FROM t),
        |x AS (SELECT doc_id, source,
        |    CAST(('0x' || substring(md5(unnest(fs)), 1, 8)) AS BIGINT) % 1024 AS b
        |  FROM f),
        |tc AS (SELECT b, count(*) AS c FROM x WHERE source = 'src0' GROUP BY b),
        |rc AS (SELECT b, count(*) AS c FROM x GROUP BY b),
        |nt AS (SELECT CAST(coalesce(sum(c), 0) AS BIGINT) AS nt FROM tc),
        |nr AS (SELECT CAST(coalesce(sum(c), 0) AS BIGINT) AS nr FROM rc),
        |sc AS (SELECT x.doc_id,
        |    CAST(count(*) AS BIGINT) AS n_feats,
        |    CAST(sum(length(format('{:b}', coalesce(tc.c, 0) + 1))
        |           - length(format('{:b}', coalesce(rc.c, 0) + 1))) AS BIGINT) AS s_bits
        |  FROM x LEFT JOIN tc USING (b) LEFT JOIN rc USING (b)
        |  GROUP BY x.doc_id)
        |SELECT sc.doc_id, sc.n_feats,
        |  CAST(sc.s_bits + sc.n_feats *
        |    (length(format('{:b}', nr.nr)) - length(format('{:b}', nt.nt))) AS BIGINT) AS weight_bits
        |FROM sc, nt, nr
        |UNION ALL
        |SELECT doc_id, 0, 0 FROM f WHERE len(fs) = 0""".stripMargin,
    "q99_stratified_priority" ->
      // q97's md5 uniform + IEEE division, ranked per source
      """SELECT source, doc_id, n_chars FROM (
        |  SELECT source, doc_id, n_chars,
        |    row_number() OVER (PARTITION BY source ORDER BY
        |      CAST(CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 13)) AS BIGINT) AS DOUBLE)
        |        / CAST(n_chars AS DOUBLE), doc_id) AS rk
        |  FROM documents
        |) WHERE rk <= 10""".stripMargin,
    "q97_priority_sample" ->
      // same 52-bit md5 uniform ('0x'-prefixed hex cast == Spark's conv)
      // and the same single IEEE division; ties break by doc_id
      """SELECT doc_id, n_chars FROM (
        |  SELECT doc_id, n_chars,
        |    CAST(CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 13)) AS BIGINT) AS DOUBLE)
        |      / CAST(n_chars AS DOUBLE) AS pri
        |  FROM documents
        |)
        |ORDER BY pri, doc_id
        |LIMIT 100""".stripMargin,
    "q96_overlap_join" ->
      // the plain overlap join at epoch_us (Spark's µs precision)
      """WITH wa AS (
        |  SELECT event_id AS a_id, ts AS a_start, ts + INTERVAL 10 MINUTE AS a_end
        |  FROM events WHERE event_id % 500 = 0
        |), wb AS (
        |  SELECT event_id AS b_id, ts AS b_start, ts + INTERVAL 7 MINUTE AS b_end
        |  FROM events WHERE event_id % 700 = 0
        |)
        |SELECT a_id, b_id FROM wa JOIN wb
        |  ON epoch_us(a_start) <= epoch_us(b_end)
        | AND epoch_us(b_start) <= epoch_us(a_end)""".stripMargin,
    "q95_corpus_report" ->
      // q91's integer score replayed, plus tokenizer/fingerprint CTEs —
      // the data card composed from already-proven oracle pieces
      """WITH t AS (
        |  SELECT doc_id, source, lang, text,
        |    list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '') AS toks
        |  FROM documents
        |),
        |f AS (
        |  SELECT doc_id,
        |    CAST(len(toks) AS BIGINT) AS n_tokens,
        |    CAST(len(list_filter(toks, tk -> list_contains(['the','a','an','and','or','of','to','in','is','it','for','on','with','as','at','by','be','this','that','are'], tk))) AS BIGINT) AS n_stop,
        |    CAST(len(list_distinct(toks)) AS BIGINT) AS n_uniq,
        |    CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS BIGINT) AS n_digit,
        |    CAST(length(regexp_replace(text, '[A-Za-z0-9\s]', '', 'g')) AS BIGINT) AS n_punct,
        |    CAST(length(text) AS BIGINT) AS n_chars
        |  FROM t
        |),
        |sc AS (
        |  SELECT doc_id,
        |    (n_stop * 1000) // greatest(n_tokens, 1) * 4
        |      + (n_uniq * 1000) // greatest(n_tokens, 1) * 2
        |      + (n_digit * 1000) // greatest(n_chars, 1) * (-3)
        |      + (n_punct * 1000) // greatest(n_chars, 1) * (-2) - 900 AS score
        |  FROM f
        |)
        |SELECT t.source, count(*) AS n_docs,
        |  CAST(sum(len(t.toks)) AS BIGINT) AS n_tokens,
        |  count(DISTINCT t.lang) AS n_langs,
        |  CAST(sum(CASE WHEN sc.score >= 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_quality_keep,
        |  count(DISTINCT md5(array_to_string(t.toks, ' '))) AS n_unique_texts,
        |  CAST(sum(sc.score) AS BIGINT) AS score_sum
        |FROM t JOIN sc USING (doc_id)
        |GROUP BY t.source""".stripMargin,
    "q94_nfc_fingerprint" ->
      // chr(769) = U+0301 combining acute, chr(776) = U+0308 combining
      // diaeresis — the same planted decomposed tail; length counts
      // codepoints in both engines
      """WITH p AS (
        |  SELECT doc_id,
        |         text || ' cafe' || chr(769) || ' nai' || chr(776) || 've' AS t
        |  FROM documents
        |)
        |SELECT doc_id, CAST(length(t) AS BIGINT) AS n_raw,
        |       CAST(length(nfc_normalize(t)) AS BIGINT) AS n_nfc,
        |       md5(nfc_normalize(t)) AS fp
        |FROM p""".stripMargin,
    "q93_range_join" ->
      // the plain range join; epoch_us matches Spark's µs timestamp
      // precision exactly (the parquet ns values are µs-aligned)
      """WITH w AS (
        |  SELECT event_id AS w_id, ts AS w_start,
        |         ts + INTERVAL 10 MINUTE AS w_end
        |  FROM events WHERE event_id % 500 = 0
        |)
        |SELECT w.w_id, e.event_id, epoch_ms(e.ts) AS ts_ms
        |FROM events e JOIN w
        |  ON epoch_us(e.ts) >= epoch_us(w.w_start)
        | AND epoch_us(e.ts) <= epoch_us(w.w_end)""".stripMargin,
    "q86_ivfpq_residual" ->
      // q77's coarse replay + residual computation + salted-sample PQ
      // codebook + residual ADC; every float fold index-ordered (DuckDB
      // lambda index i is 1-based — used directly against 1-based list
      // indexing, so components align with Spark's 0-based zip_with)
      """WITH sampled AS (
        |  SELECT vec_id, embedding, md5(CAST(vec_id AS VARCHAR)) AS mk
        |  FROM embeddings ORDER BY mk, vec_id LIMIT 16
        |), cent AS (
        |  SELECT CAST(row_number() OVER (ORDER BY mk, vec_id) - 1 AS INTEGER) AS cell,
        |         CAST(embedding AS DOUBLE[]) AS centroid
        |  FROM sampled
        |), cb AS (SELECT list(centroid ORDER BY cell) AS cents FROM cent),
        |assigned AS (
        |  SELECT cell, cand_id, cv FROM (
        |    SELECT c.cell, e.vec_id AS cand_id, CAST(e.embedding AS DOUBLE[]) AS cv,
        |      row_number() OVER (PARTITION BY e.vec_id
        |        ORDER BY list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), c.centroid) DESC, c.cell ASC) AS rk
        |    FROM embeddings e CROSS JOIN cent c
        |  ) WHERE rk = 1
        |), resid AS (
        |  SELECT a.cell, a.cand_id,
        |         list_transform(a.cv, (x, i) -> x - cb.cents[a.cell+1][i]) AS rv
        |  FROM assigned a CROSS JOIN cb
        |), psampled AS (
        |  SELECT cand_id, rv, md5(CAST(cand_id AS VARCHAR) || ':pq') AS mk
        |  FROM resid ORDER BY mk, cand_id LIMIT 16
        |), pcent AS (
        |  SELECT CAST(row_number() OVER (ORDER BY mk, cand_id) - 1 AS INTEGER) AS cell,
        |         rv AS centroid
        |  FROM psampled
        |), pcb AS (SELECT list(centroid ORDER BY cell) AS cents FROM pcent),
        |enc AS (
        |  SELECT cand_id, cell2, list(code ORDER BY m) AS codes FROM (
        |    SELECT cand_id, cell2, m, cell AS code FROM (
        |      SELECT r.cand_id, r.cell AS cell2, mm.m, p.cell,
        |        row_number() OVER (PARTITION BY r.cand_id, mm.m
        |          ORDER BY list_sum(list_transform(range(8), j ->
        |            (r.rv[mm.m*8+j+1] - p.centroid[mm.m*8+j+1])
        |            * (r.rv[mm.m*8+j+1] - p.centroid[mm.m*8+j+1]))) ASC,
        |          p.cell ASC) AS rk
        |      FROM resid r
        |      CROSS JOIN (SELECT unnest(range(8)) AS m) mm
        |      CROSS JOIN pcent p)
        |    WHERE rk = 1)
        |  GROUP BY cand_id, cell2
        |), probes AS (
        |  SELECT cell, query_id, qv FROM (
        |    SELECT c.cell, q.vec_id AS query_id, CAST(q.embedding AS DOUBLE[]) AS qv,
        |      row_number() OVER (PARTITION BY q.vec_id
        |        ORDER BY list_cosine_similarity(CAST(q.embedding AS DOUBLE[]), c.centroid) DESC, c.cell ASC) AS rk
        |    FROM embeddings q CROSS JOIN cent c WHERE q.vec_id < 10
        |  ) WHERE rk <= 4
        |), qres AS (
        |  SELECT p.cell, p.query_id,
        |         list_transform(p.qv, (x, i) -> x - cb.cents[p.cell+1][i]) AS qv
        |  FROM probes p CROSS JOIN cb
        |), scored AS (
        |  SELECT p.query_id, e.cand_id,
        |    list_sum(list_transform(range(8), m ->
        |      list_sum(list_transform(range(8), j ->
        |        (p.qv[m*8+j+1] - pcb.cents[e.codes[m+1]+1][m*8+j+1])
        |        * (p.qv[m*8+j+1] - pcb.cents[e.codes[m+1]+1][m*8+j+1]))))) AS adist
        |  FROM qres p JOIN enc e ON e.cell2 = p.cell
        |  CROSS JOIN pcb
        |  WHERE p.query_id <> e.cand_id
        |)
        |SELECT query_id, cand_id, rk FROM (
        |  SELECT query_id, cand_id,
        |    row_number() OVER (PARTITION BY query_id ORDER BY adist ASC, cand_id ASC) AS rk
        |  FROM scored) WHERE rk <= 5""".stripMargin,
    "q85_lm_score_ref" ->
      // counts from the even half, scored odd half, OOV counts default to
      // bitlen(1) — all integer, replayed exactly
      """WITH t AS (SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '') AS toks
        |           FROM documents),
        |bg AS (SELECT doc_id, toks[i+1] AS w1, toks[i+2] AS w2
        |       FROM (SELECT doc_id, toks, unnest(range(len(toks) - 1)) AS i FROM t WHERE len(toks) >= 2)),
        |c2 AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c2 FROM bg WHERE doc_id % 2 = 0 GROUP BY w1, w2),
        |c1 AS (SELECT w1, CAST(sum(c2) AS BIGINT) AS c1 FROM c2 GROUP BY w1),
        |db AS (SELECT doc_id, w1, w2, CAST(count(*) AS BIGINT) AS cnt FROM bg
        |       WHERE doc_id % 2 = 1 GROUP BY doc_id, w1, w2)
        |SELECT db.doc_id, CAST(sum(cnt) AS BIGINT) AS n_bigrams,
        |       CAST(sum(CASE WHEN c2.c2 IS NULL THEN cnt ELSE 0 END) AS BIGINT) AS n_oov_bigrams,
        |       CAST(sum(cnt * (length(format('{:b}', coalesce(c1.c1, 1)))
        |                       - length(format('{:b}', coalesce(c2.c2, 1))))) AS BIGINT) AS surprisal_bits
        |FROM db LEFT JOIN c2 ON db.w1 = c2.w1 AND db.w2 = c2.w2
        |        LEFT JOIN c1 ON db.w1 = c1.w1
        |GROUP BY db.doc_id""".stripMargin,
    "q84_event_pagerank" ->
      // three unrolled fixed-point iterations — every quantity BIGINT,
      // every division floor (DuckDB // == Spark div for non-negatives),
      // so ranks are bit-identical with no float summation order issues
      """WITH tr AS (
        |  SELECT lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS src,
        |         event_type AS dst
        |  FROM events),
        |e AS (SELECT src, dst, CAST(count(*) AS BIGINT) AS w FROM tr
        |      WHERE src IS NOT NULL GROUP BY src, dst),
        |nodes AS (SELECT src AS v FROM e UNION SELECT dst FROM e),
        |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM nodes),
        |outw AS (SELECT src, CAST(sum(w) AS BIGINT) AS wout FROM e GROUP BY src),
        |it0 AS (SELECT v, CAST(1000000000000 // n AS BIGINT) AS r FROM nodes, nn),
        |it1 AS (SELECT nodes.v,
        |          CAST((1000000000000 * 15) // (100 * nn.n)
        |               + (85 * coalesce(s.s, 0)) // 100 AS BIGINT) AS r
        |        FROM nodes CROSS JOIN nn
        |        LEFT JOIN (SELECT e.dst AS v, CAST(sum((p.r * e.w) // o.wout) AS BIGINT) AS s
        |                   FROM e JOIN outw o ON e.src = o.src JOIN it0 p ON p.v = e.src
        |                   GROUP BY e.dst) s ON s.v = nodes.v),
        |it2 AS (SELECT nodes.v,
        |          CAST((1000000000000 * 15) // (100 * nn.n)
        |               + (85 * coalesce(s.s, 0)) // 100 AS BIGINT) AS r
        |        FROM nodes CROSS JOIN nn
        |        LEFT JOIN (SELECT e.dst AS v, CAST(sum((p.r * e.w) // o.wout) AS BIGINT) AS s
        |                   FROM e JOIN outw o ON e.src = o.src JOIN it1 p ON p.v = e.src
        |                   GROUP BY e.dst) s ON s.v = nodes.v),
        |it3 AS (SELECT nodes.v,
        |          CAST((1000000000000 * 15) // (100 * nn.n)
        |               + (85 * coalesce(s.s, 0)) // 100 AS BIGINT) AS r
        |        FROM nodes CROSS JOIN nn
        |        LEFT JOIN (SELECT e.dst AS v, CAST(sum((p.r * e.w) // o.wout) AS BIGINT) AS s
        |                   FROM e JOIN outw o ON e.src = o.src JOIN it2 p ON p.v = e.src
        |                   GROUP BY e.dst) s ON s.v = nodes.v)
        |SELECT v AS event_type, r AS rank_fp FROM it3""".stripMargin,
    "q83_bpe_pairs" ->
      // char decomposition via 1-based single-char slices (character-
      // aware in both engines); same weighting and total rank order
      """WITH w AS (SELECT word, count(*) AS freq FROM
        |  (SELECT unnest(list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '')) AS word
        |   FROM documents) GROUP BY word),
        |s AS (SELECT freq, list_transform(range(length(word)), j -> word[j+1:j+1]) || ['</w>'] AS syms
        |      FROM w),
        |p AS (SELECT syms[i+1] AS l, syms[i+2] AS r, freq
        |      FROM (SELECT syms, freq, unnest(range(len(syms) - 1)) AS i FROM s)),
        |c AS (SELECT l, r, CAST(sum(freq) AS BIGINT) AS cnt FROM p GROUP BY l, r)
        |SELECT l, r, cnt, rk FROM (
        |  SELECT l, r, cnt, CAST(row_number() OVER (ORDER BY cnt DESC, l, r) AS BIGINT) AS rk
        |  FROM c)
        |WHERE rk <= 30""".stripMargin,
    "q82_span_screen_scrub" ->
      // q80's indexed-gram span replay + q75's outside-the-spans text
      // reconstruction, over the odd-id (incoming) half only
      """WITH t AS (SELECT doc_id,
        |             coalesce(list_filter(string_split_regex(lower(text), '\s+'), x -> x <> ''), []) AS toks
        |           FROM documents),
        |g AS (SELECT doc_id, i AS pos, md5(array_to_string(toks[i+1 : i+8], ' ')) AS gram
        |      FROM (SELECT doc_id, toks, unnest(range(len(toks) - 7)) AS i FROM t WHERE len(toks) >= 8)),
        |idx AS (SELECT DISTINCT gram FROM g WHERE doc_id % 2 = 0),
        |h AS (SELECT g.doc_id, g.pos FROM g JOIN idx USING (gram) WHERE g.doc_id % 2 = 1),
        |b AS (SELECT doc_id, pos,
        |        CASE WHEN pos <= lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) + 8 THEN 0 ELSE 1 END AS brk
        |      FROM h),
        |m AS (SELECT doc_id, pos,
        |        sum(brk) OVER (PARTITION BY doc_id ORDER BY pos ROWS UNBOUNDED PRECEDING) AS grp
        |      FROM b),
        |spans AS (SELECT doc_id, min(pos) AS s, max(pos) + 8 AS e FROM m GROUP BY doc_id, grp),
        |rm AS (SELECT doc_id, CAST(sum(e - s) AS BIGINT) AS n_removed FROM spans GROUP BY doc_id),
        |odd AS (SELECT doc_id, toks FROM t WHERE doc_id % 2 = 1),
        |p AS (SELECT doc_id, toks, unnest(range(len(toks))) AS i FROM odd),
        |kept AS (SELECT p.doc_id, p.i, p.toks[p.i + 1] AS tok FROM p
        |         WHERE NOT EXISTS (SELECT 1 FROM spans s
        |                           WHERE s.doc_id = p.doc_id AND p.i >= s.s AND p.i < s.e)),
        |agg AS (SELECT doc_id, string_agg(tok, ' ' ORDER BY i) AS scrubbed FROM kept GROUP BY doc_id)
        |SELECT odd.doc_id, CAST(len(odd.toks) AS BIGINT) AS n_tokens,
        |       coalesce(rm.n_removed, 0) AS n_removed,
        |       coalesce(agg.scrubbed, '') AS scrubbed_text
        |FROM odd LEFT JOIN rm USING (doc_id) LEFT JOIN agg USING (doc_id)""".stripMargin,
    "q81_lm_surprisal" ->
      // bitlen(x) = length of the binary string = floor(log2 x)+1 in both
      // engines (Spark bin() / DuckDB format('{:b}')), so the whole score
      // is integer arithmetic
      """WITH t AS (SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '') AS toks
        |           FROM documents),
        |b AS (SELECT doc_id, toks[i+1] AS w1, toks[i+2] AS w2
        |      FROM (SELECT doc_id, toks, unnest(range(len(toks) - 1)) AS i FROM t WHERE len(toks) >= 2)),
        |db AS (SELECT doc_id, w1, w2, count(*) AS cnt FROM b GROUP BY doc_id, w1, w2),
        |c2 AS (SELECT w1, w2, CAST(sum(cnt) AS BIGINT) AS c2 FROM db GROUP BY w1, w2),
        |c1 AS (SELECT w1, CAST(sum(cnt) AS BIGINT) AS c1 FROM db GROUP BY w1)
        |SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n_bigrams,
        |       CAST(sum(cnt * (length(format('{:b}', c1.c1)) - length(format('{:b}', c2.c2)))) AS BIGINT) AS surprisal_bits
        |FROM db JOIN c2 USING (w1, w2) JOIN c1 USING (w1)
        |GROUP BY doc_id""".stripMargin,
    "q80_span_screen" ->
      // replay: indexed side = distinct 8-gram fingerprints of even-id
      // docs; hits = odd-id gram occurrences present in that set; spans
      // merge by q74's lag/running-sum chain
      """WITH t AS (SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '') AS toks
        |           FROM documents),
        |g AS (SELECT doc_id, i AS pos, md5(array_to_string(toks[i+1 : i+8], ' ')) AS gram
        |      FROM (SELECT doc_id, toks, unnest(range(len(toks) - 7)) AS i FROM t WHERE len(toks) >= 8)),
        |idx AS (SELECT DISTINCT gram FROM g WHERE doc_id % 2 = 0),
        |h AS (SELECT g.doc_id, g.pos FROM g JOIN idx USING (gram) WHERE g.doc_id % 2 = 1),
        |b AS (SELECT doc_id, pos,
        |        CASE WHEN pos <= lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) + 8 THEN 0 ELSE 1 END AS brk
        |      FROM h),
        |m AS (SELECT doc_id, pos,
        |        sum(brk) OVER (PARTITION BY doc_id ORDER BY pos ROWS UNBOUNDED PRECEDING) AS grp
        |      FROM b)
        |SELECT doc_id, min(pos) AS span_start, max(pos) + 8 AS span_end,
        |       max(pos) + 8 - min(pos) AS n_span_tokens
        |FROM m GROUP BY doc_id, grp""".stripMargin,
    "q79_semantic_dedup" ->
      // brute-force pair ground truth (q45's construction) + recursive
      // min-label components (q55's shape) + canonical-only selection
      """WITH RECURSIVE em AS (
        |  SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
        |  UNION ALL
        |  SELECT vec_id + 10000000,
        |         list_transform(CAST(embedding AS DOUBLE[]),
        |                        (x, i) -> x * (1.0 + 0.01 * ((i - 1) % 3 - 1)))
        |  FROM embeddings WHERE vec_id % 20 = 0),
        |pr AS (SELECT a.id AS id_a, b.id AS id_b FROM em a, em b
        |       WHERE a.id < b.id AND list_cosine_similarity(a.v, b.v) >= 0.95),
        |edges AS (SELECT id_a AS src, id_b AS dst FROM pr UNION SELECT id_b, id_a FROM pr),
        |cc AS (
        |  SELECT src AS id, src AS label FROM edges
        |  UNION
        |  SELECT e.dst AS id, cc.label FROM cc JOIN edges e ON e.src = cc.id),
        |drop_ids AS (SELECT id FROM (SELECT id, min(label) AS cluster FROM cc GROUP BY id)
        |             WHERE id <> cluster)
        |SELECT em.id FROM em WHERE em.id NOT IN (SELECT id FROM drop_ids)""".stripMargin,
    "q78_shuffle_rank" ->
      """SELECT doc_id,
        |  CAST(row_number() OVER (ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS BIGINT) AS shuffle_rank
        |FROM documents""".stripMargin,
    "q76_pq_topk" ->
      // full PQ replay: deterministic 16-row codebook (same md5-order
      // sample as q42), per-subspace argmin encode (squared L2, ties to
      // the lowest codeword), ADC = sum over subspaces of ||subq -
      // codeword||^2 — every float fold is left-to-right in both engines
      // so ranks compare exactly; only (query_id, cand_id, rk) is output
      """WITH sampled AS (
        |  SELECT vec_id, embedding, md5(CAST(vec_id AS VARCHAR)) AS mk
        |  FROM embeddings ORDER BY mk, vec_id LIMIT 16
        |), cent AS (
        |  SELECT CAST(row_number() OVER (ORDER BY mk, vec_id) - 1 AS INTEGER) AS cell,
        |         CAST(embedding AS DOUBLE[]) AS centroid
        |  FROM sampled
        |), cb AS (SELECT list(centroid ORDER BY cell) AS cents FROM cent),
        |enc AS (
        |  SELECT cand_id, list(code ORDER BY m) AS codes FROM (
        |    SELECT cand_id, m, cell AS code FROM (
        |      SELECT e.vec_id AS cand_id, mm.m, c.cell,
        |        row_number() OVER (PARTITION BY e.vec_id, mm.m
        |          ORDER BY list_sum(list_transform(range(8), j ->
        |            (CAST(e.embedding[mm.m*8+j+1] AS DOUBLE) - c.centroid[mm.m*8+j+1])
        |            * (CAST(e.embedding[mm.m*8+j+1] AS DOUBLE) - c.centroid[mm.m*8+j+1]))) ASC,
        |          c.cell ASC) AS rk
        |      FROM embeddings e
        |      CROSS JOIN (SELECT unnest(range(8)) AS m) mm
        |      CROSS JOIN cent c)
        |    WHERE rk = 1)
        |  GROUP BY cand_id
        |), scored AS (
        |  SELECT q.vec_id AS query_id, e.cand_id,
        |    list_sum(list_transform(range(8), m ->
        |      list_sum(list_transform(range(8), j ->
        |        (CAST(q.embedding[m*8+j+1] AS DOUBLE) - cb.cents[e.codes[m+1]+1][m*8+j+1])
        |        * (CAST(q.embedding[m*8+j+1] AS DOUBLE) - cb.cents[e.codes[m+1]+1][m*8+j+1]))))) AS adist
        |  FROM enc e CROSS JOIN cb
        |  CROSS JOIN embeddings q
        |  WHERE q.vec_id < 10 AND q.vec_id <> e.cand_id
        |)
        |SELECT query_id, cand_id, rk FROM (
        |  SELECT query_id, cand_id,
        |    row_number() OVER (PARTITION BY query_id ORDER BY adist ASC, cand_id ASC) AS rk
        |  FROM scored) WHERE rk <= 5""".stripMargin,
    "q77_ivfpq_topk" ->
      // q42's coarse IVF replay (cosine cells + probes) composed with
      // q76's PQ replay (encode + ADC); nCells = ksub = 16 so the one
      // deterministic sample serves both roles, exactly as the Spark side
      """WITH sampled AS (
        |  SELECT vec_id, embedding, md5(CAST(vec_id AS VARCHAR)) AS mk
        |  FROM embeddings ORDER BY mk, vec_id LIMIT 16
        |), cent AS (
        |  SELECT CAST(row_number() OVER (ORDER BY mk, vec_id) - 1 AS INTEGER) AS cell,
        |         CAST(embedding AS DOUBLE[]) AS centroid
        |  FROM sampled
        |), cb AS (SELECT list(centroid ORDER BY cell) AS cents FROM cent),
        |assigned AS (
        |  SELECT cell, cand_id FROM (
        |    SELECT c.cell, e.vec_id AS cand_id,
        |      row_number() OVER (PARTITION BY e.vec_id
        |        ORDER BY list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), c.centroid) DESC, c.cell ASC) AS rk
        |    FROM embeddings e CROSS JOIN cent c
        |  ) WHERE rk = 1
        |), enc AS (
        |  SELECT cand_id, list(code ORDER BY m) AS codes FROM (
        |    SELECT cand_id, m, cell AS code FROM (
        |      SELECT e.vec_id AS cand_id, mm.m, c.cell,
        |        row_number() OVER (PARTITION BY e.vec_id, mm.m
        |          ORDER BY list_sum(list_transform(range(8), j ->
        |            (CAST(e.embedding[mm.m*8+j+1] AS DOUBLE) - c.centroid[mm.m*8+j+1])
        |            * (CAST(e.embedding[mm.m*8+j+1] AS DOUBLE) - c.centroid[mm.m*8+j+1]))) ASC,
        |          c.cell ASC) AS rk
        |      FROM embeddings e
        |      CROSS JOIN (SELECT unnest(range(8)) AS m) mm
        |      CROSS JOIN cent c)
        |    WHERE rk = 1)
        |  GROUP BY cand_id
        |), probes AS (
        |  SELECT cell, query_id, qv FROM (
        |    SELECT c.cell, q.vec_id AS query_id, CAST(q.embedding AS DOUBLE[]) AS qv,
        |      row_number() OVER (PARTITION BY q.vec_id
        |        ORDER BY list_cosine_similarity(CAST(q.embedding AS DOUBLE[]), c.centroid) DESC, c.cell ASC) AS rk
        |    FROM embeddings q CROSS JOIN cent c WHERE q.vec_id < 10
        |  ) WHERE rk <= 4
        |), scored AS (
        |  SELECT p.query_id, a.cand_id,
        |    list_sum(list_transform(range(8), m ->
        |      list_sum(list_transform(range(8), j ->
        |        (p.qv[m*8+j+1] - cb.cents[e.codes[m+1]+1][m*8+j+1])
        |        * (p.qv[m*8+j+1] - cb.cents[e.codes[m+1]+1][m*8+j+1]))))) AS adist
        |  FROM probes p JOIN assigned a USING (cell)
        |  JOIN enc e ON e.cand_id = a.cand_id
        |  CROSS JOIN cb
        |  WHERE p.query_id <> a.cand_id
        |)
        |SELECT query_id, cand_id, rk FROM (
        |  SELECT query_id, cand_id,
        |    row_number() OVER (PARTITION BY query_id ORDER BY adist ASC, cand_id ASC) AS rk
        |  FROM scored) WHERE rk <= 5""".stripMargin,
    "q72_crosscorpus_embedding" ->
      // brute-force cross ground truth over the same two planted corpora
      // (q45's construction, split into disjoint sides; DuckDB lambda
      // index is 1-based vs Spark's 0-based)
      """WITH a AS (SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |b AS (SELECT vec_id + 10000000 AS id,
        |        list_transform(CAST(embedding AS DOUBLE[]),
        |                       (x, i) -> x * (1.0 + 0.01 * ((i - 1) % 3 - 1))) AS v
        |      FROM embeddings WHERE vec_id % 20 = 0)
        |SELECT id_a, id_b FROM (
        |  SELECT a.id AS id_a, b.id AS id_b, list_cosine_similarity(a.v, b.v) AS c
        |  FROM a, b
        |) WHERE c >= 0.95""".stripMargin,
    "q71_crosscorpus_neardup" ->
      // brute-force cross-corpus ground truth (same shingle construction
      // as the q52/q55 oracles)
      """WITH t AS (SELECT doc_id,
        |  list_distinct(list_transform(range(len(toks)-2), i -> array_to_string(toks[i+1:i+3], ' '))) AS sh
        |  FROM (SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '') AS toks
        |        FROM documents)),
        |a AS (SELECT * FROM t WHERE doc_id % 2 = 0 AND len(sh) > 0),
        |b AS (SELECT * FROM t WHERE doc_id % 2 = 1 AND len(sh) > 0)
        |SELECT id_a, id_b, jaccard FROM (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |    CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) / len(list_distinct(a.sh || b.sh)) AS jaccard
        |  FROM a, b
        |) WHERE jaccard >= 0.8""".stripMargin,
    "q37_minhash_pairs" ->
      // full replay of the MinHash-LSH chain: shingles (with the <n
      // whole-doc fallback), ONE polynomial base per shingle, the 32
      // splitmix-finalized hash-family members vectorized as rows over
      // DISTINCT bases (not nested lambdas — 10x cheaper), signed minima
      // per (doc, k), 16x2 banding joined on the band SLICE (the bucket
      // hash is only an equality key, so slices replay it exactly), and
      // the exact-Jaccard verify at 0.4
      s"""WITH t AS (
         |  SELECT doc_id, list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS toks
         |  FROM documents),
         |sh AS (
         |  SELECT doc_id,
         |    CASE WHEN len(toks) < 3 THEN [array_to_string(toks, ' ')]
         |         ELSE list_distinct(list_transform(range(len(toks) - 2),
         |                i -> array_to_string(toks[i+1:i+3], ' ')))
         |    END AS sh
         |  FROM t),
         |db AS (
         |  SELECT doc_id, sh, unnest(list_transform(sh, s ->
         |    ${polyBaseSql("s")})) AS b
         |  FROM sh),
         |bx AS (SELECT DISTINCT b FROM db),
         |z0t AS (SELECT b, k, xor(b, g) AS z0 FROM bx
         |        CROSS JOIN (SELECT unnest(range(32)) AS k, unnest([${goldenLits(32)}]) AS g) kg),
         |z1t AS (SELECT b, k, xor(z0, z0 // 1073741824) AS z1 FROM z0t),
         |z2t AS (SELECT b, k, ${mulMod64("z1", mix1Lit)} AS z2 FROM z1t),
         |z3t AS (SELECT b, k, xor(z2, z2 // 134217728) AS z3 FROM z2t),
         |z4t AS (SELECT b, k, ${mulMod64("z3", mix2Lit)} AS z4 FROM z3t),
         |mk AS (SELECT b, k,
         |  CAST(CASE WHEN z5 >= 9223372036854775808 THEN z5 - 18446744073709551616 ELSE z5 END AS BIGINT) AS h
         |  FROM (SELECT b, k, xor(z4, z4 // 2147483648) AS z5 FROM z4t)),
         |sigr AS (SELECT db.doc_id, mk.k, min(mk.h) AS m
         |         FROM db JOIN mk USING (b) GROUP BY db.doc_id, mk.k),
         |sig AS (SELECT doc_id, list(m ORDER BY k) AS sig FROM sigr GROUP BY doc_id),
         |keyed AS (
         |  SELECT s.doc_id, sh.sh, u.band,
         |    array_to_string(s.sig[CAST(2*u.band+1 AS INT):CAST(2*u.band+2 AS INT)], ',') AS bkey
         |  FROM sig s JOIN sh USING (doc_id)
         |  CROSS JOIN (SELECT unnest(range(16)) AS band) u),
         |cand AS (
         |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b, a.sh AS sha, b.sh AS shb
         |  FROM keyed a JOIN keyed b ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id)
         |SELECT id_a, id_b,
         |  CAST(len(list_intersect(sha, shb)) AS DOUBLE) / len(list_distinct(sha || shb)) AS jaccard
         |FROM cand
         |WHERE CAST(len(list_intersect(sha, shb)) AS DOUBLE) / len(list_distinct(sha || shb)) >= 0.4""".stripMargin,
    "q38_simhash" ->
      // Charikar bit votes replayed: one base fold per token, splitmix
      // finalizer vectorized over distinct bases, per-bit majority via
      // (h // 2^b) % 2, empty docs vote to 0
      s"""WITH t AS (
         |  SELECT doc_id, list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS toks
         |  FROM documents),
         |db AS (
         |  SELECT doc_id, unnest(list_transform(toks, s ->
         |    ${polyBaseSql("s")})) AS b
         |  FROM t),
         |bx AS (SELECT DISTINCT b FROM db),
         |z1t AS (SELECT b, xor(b, b // 1073741824) AS z1 FROM bx),
         |z2t AS (SELECT b, ${mulMod64("z1", mix1Lit)} AS z2 FROM z1t),
         |z3t AS (SELECT b, xor(z2, z2 // 134217728) AS z3 FROM z2t),
         |z4t AS (SELECT b, ${mulMod64("z3", mix2Lit)} AS z4 FROM z3t),
         |mx AS (SELECT b, xor(z4, z4 // 2147483648) AS h FROM z4t),
         |votes AS (
         |  SELECT db.doc_id, bits.bit,
         |    sum(CASE WHEN (mx.h // bits.p) % 2 = 1 THEN 1 ELSE -1 END) AS v
         |  FROM db JOIN mx USING (b)
         |  CROSS JOIN (SELECT unnest(range(64)) AS bit,
         |              unnest([${(0 until 64).map(b => java.lang.Long.toUnsignedString(1L << b)).mkString(", ")}]) AS p) bits
         |  GROUP BY db.doc_id, bits.bit),
         |shh AS (
         |  SELECT doc_id, sum(CASE WHEN v > 0 THEN CAST(p AS HUGEINT) ELSE 0 END) AS u
         |  FROM (SELECT doc_id, v, [${(0 until 64).map(b => java.lang.Long.toUnsignedString(1L << b)).mkString(", ")}][CAST(bit+1 AS INT)] AS p FROM votes)
         |  GROUP BY doc_id)
         |SELECT doc_id,
         |  CAST(CASE WHEN u >= 9223372036854775808 THEN u - 18446744073709551616 ELSE u END AS BIGINT) AS simhash
         |FROM shh
         |UNION ALL
         |SELECT doc_id, 0 FROM t WHERE len(toks) = 0""".stripMargin,
    // q44_approx_distinct / q54_approx_percentile: genuinely approximate
    // engine-internal sketches (HLL++ / KLL) — no other engine can replay
    // them; driver records rows-only checks, accuracy is asserted in
    // ScalaTest error-bound tests instead.
    // q47 left the no-oracle list in round 7 (portable winnowing kernel),
    // q37/q38 followed: the minhash/simhash element hash became the
    // portable splitmix(polyBase ^ k·GOLDEN) family, so the full LSH
    // banding and bit-vote chains replay above.
  )
}
