package graft.core

import org.apache.spark.sql.SparkSession

/** Session factory for the graft engine.
  *
  * Replaces the reference's JobManager/TaskManager bootstrap
  * (reference: jobmanager/api.py, taskmanager/task_executor.py) — on Spark
  * the cluster runtime, scheduling, shuffle transport, checkpointing and
  * state backends are provided by the platform, so "starting the engine"
  * is just configuring a SparkSession.
  *
  * Scale notes (100 TB target):
  *  - AQE on: runtime coalescing of shuffle partitions + skew-join splitting
  *    replace any hand-tuned parallelism (reference: scheduler.py bin-packing).
  *  - shuffle.partitions defaults to the local core count here; on a real
  *    cluster this should be ~2-3x total executor cores (or left to AQE's
  *    coalescing with a high initial value).
  *  - Timezone pinned to UTC so event-time window math is stable across
  *    environments.
  */
object GraftSession {

  /** STATIC conf (build-time only — ignored once the first session
    * exists): the default 100-entry generated-class cache thrashes in
    * any process running >100 distinct plans; a 160-query bench
    * recompiled generated classes on every repeat late in the run
    * (measured: 2-3x inflated medians for whichever queries landed
    * after the cache filled; raising it took the suite 215->173 s).
    * Every session builder in this repo must set it — new mains that
    * build their own session should reference this constant.
    */
  val CodegenCacheMaxEntries = "4000"

  /** Spark 4.x class name (the 3.x one lived one package up). See the
    * config comment in [[local]] for why the FileSystem-based manager
    * is the right one here.
    */
  val CheckpointFileManagerClass: String =
    "org.apache.spark.sql.execution.streaming.checkpointing.FileSystemBasedCheckpointFileManager"

  /** Default parallelism knob; mirrors `Config.PARALLELISM`
    * (reference: common/config.py) but resolved from the host.
    */
  def defaultCores: Int = sys.env.get("SPARK_GRAFT_CPUS").map(_.toInt)
    .getOrElse(Runtime.getRuntime.availableProcessors())

  def local(cores: Int = defaultCores, appName: String = "graft"): SparkSession = {
    val spark = SparkSession.builder()
      // graft sessions ship with the kernel SQL functions registered
      // (simhash64, minhash_signature, word_shingles, cosine_similarity,
      // rolling_fingerprint); externally-built sessions can opt in via
      // spark.sql.extensions=graft.functions.GraftExtensions
      .withExtensions(new graft.functions.GraftExtensions)
      .master(s"local[$cores]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.codegen.cache.maxEntries", CodegenCacheMaxEntries)
      // index lookups push `col IN (query vocabulary)` into parquet;
      // past this threshold Spark silently degrades the pushed filter
      // to [min, max] — which spans the whole key space for a
      // scattered vocabulary and decodes entire postings tables
      // (measured 2.3x on the trigram index's 188-gram read). Query
      // vocabularies are bounded (maxQueryTerms/maxQueryGrams), so a
      // generous literal count is safe.
      .config("spark.sql.parquet.pushdown.inFilterThreshold", "1000")
      // Streaming checkpoint logs through the FileSystem API, not
      // FileContext: without the native Hadoop library (this image has
      // none), FileContext's rename/create path FORKS A SHELL per
      // operation (readLink + chmod via Hadoop Shell.execCommand —
      // confirmed by stack sampling under walCommit), costing ~35-45 ms
      // per offsets/commits log write and per state-store delta commit.
      // The FileSystem manager does plain java renames: measured
      // walCommit 46 -> 9 ms, commitOffsets 46 -> 9 ms on the
      // MemoryStream floor probe. Both managers implement the same
      // rename-based atomic contract; on HDFS either is correct, and on
      // object stores Spark ignores this knob's benefit anyway.
      .config("spark.sql.streaming.checkpointFileManagerClass",
        CheckpointFileManagerClass)
      .config("spark.sql.session.timeZone", "UTC")
      // older testdata generations wrote events.parquet as TIMESTAMP(NANOS),
      // which Spark's reader rejects without this conf; harmless for the
      // current timestamp[us] generation (Tables.events adapts per schema).
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }

  /** RocksDB keyed-state backend — the reference's
    * `Config.STATE_BACKEND=rocksdb` (reference: common/config.py:25,
    * taskmanager/state/rocksdb_backend.py:20-165, ~150 lines of manual
    * pickling/snapshotting) is one config key on Spark; state snapshots,
    * changelog checkpointing and recovery are native. Call before starting
    * stateful streaming queries. The default (in-memory HDFSBackedStateStore)
    * matches the reference's InMemoryStateBackend.
    */
  def useRocksDBStateStore(spark: SparkSession): SparkSession = {
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    spark
  }

  /** Tune the session for a latency-sensitive STATEFUL streaming query
    * whose steady-state key cardinality is roughly `distinctKeys`.
    *
    * Streaming disables AQE, and every shuffle partition of a stateful
    * query is a state-store instance committed per micro-batch — so a
    * partition count sized for batch data volume (core count, or a
    * cluster's 2-3x cores) pays per-batch state-store overhead on mostly
    * empty partitions. Measured on this container (50-key running agg,
    * update mode): ~630 ms/batch at 32 partitions vs ~260 ms at 8. The
    * rule here: enough partitions that each holds ~8 keys, capped at core
    * count, so small-cardinality jobs get the tuned floor by default.
    *
    * Call BEFORE starting the query — Spark pins a stateful query's
    * partitioning in its checkpoint at first start, so a later conf change
    * does not apply to an existing checkpoint.
    */
  def forStreaming(spark: SparkSession, distinctKeys: Int): SparkSession = {
    require(distinctKeys > 0, "distinctKeys must be positive")
    // distinctKeys / 8 + 1 (not (k + 7) / 8, which overflows Int near MaxValue)
    val parts = math.max(1, math.min(defaultCores, distinctKeys / 8 + (if (distinctKeys % 8 == 0) 0 else 1)))
    spark.conf.set("spark.sql.shuffle.partitions", parts.toString)
    spark
  }

  /** Apply graft's standard runtime configuration to an externally-created
    * session (e.g. the driver-owned Verify/Bench mains).
    */
  def tune(spark: SparkSession): SparkSession = {
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    spark.conf.set("spark.sql.streaming.checkpointFileManagerClass",
      CheckpointFileManagerClass)
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark
  }
}
