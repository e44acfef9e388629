package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A tiny crash-safe persisted-table lifecycle shared by the continuous
  * folds ([[graft.ops.Diff.maintainAggStream]]'s materialized view,
  * [[graft.ops.Sketches]]' standing bucket tables): `path/_store/data`
  * holds the table, `path/_store/ledger` the last-applied streaming
  * batch id — both inside ONE directory swap, so content and ledger can
  * never disagree after a crash, and a foreachBatch re-delivery
  * (batchId ≤ ledger) is a no-op instead of a double-apply.
  *
  * The swap itself is the two-rename protocol ([[swapDirs]], shared
  * with every standing index); readers racing the visibility window
  * retry via [[retryingStaleReads]] at the call sites that fold, and a
  * crash BETWEEN the two renames (no `_store` at all) is rolled
  * forward or back by [[ensureStore]] on the next read — the staging
  * dir always holds a complete replacement (its writes finish before
  * any rename starts), and the first rename parks the previous content
  * at `_store.old`, so one of the two is always restorable.
  *
  * SINGLE-WRITER CONTRACT — ENFORCED: folds serialize through the
  * shared `_store.next` staging dir, which is exactly foreachBatch's
  * serial-per-query execution model. Two DIFFERENT queries folding the
  * same path concurrently would race the staging dir and corrupt
  * silently, so every mutation here ([[init]]/[[fold]]/[[reset]]/
  * [[compact]]) acquires the path-scoped [[WriterLease]] for its
  * duration: the second concurrent writer fails with the named
  * another-writer-holds-the-lease error instead. The lease is
  * store-scoped (`path/_writer.lease`), so [[Catalog]] — which holds
  * its own base-scoped lease across a multi-store mutation and then
  * folds its manifest through here — nests without deadlock (base and
  * manifest are different paths). Re-delivery no-ops (batchId ≤
  * ledger) stay lock-free; readers never touch the lease. A pipeline
  * that needs one batch applied to MANY stores (the multi-writer-
  * shaped case) goes through [[Catalog]], which keeps one writer per
  * store generation and serializes visibility at its manifest swap.
  */
object SwapStore {

  private def store(path: String) = s"$path/_store"

  /** The ledger is ONE int64 in ONE parquet file, but it is read twice
    * and written once per fold — and `spark.range(1).write.parquet` /
    * `spark.read.parquet(...).head` each cost a full Spark job with
    * planning (~100-300 ms, measured as the dominant per-batch driver
    * gap of the fold-based streaming gates: q210 spent more wall in
    * gaps than in jobs). These helpers move the ledger to direct
    * parquet-mr I/O — SAME on-disk layout (a `part-*.parquet` with an
    * optional int64 `last_batch` column plus a `_SUCCESS` marker, which
    * is exactly what the Spark writer produced, so stores written by
    * either path interread) — at ~1 ms and zero Spark jobs.
    */
  private val ledgerSchema = org.apache.parquet.schema.MessageTypeParser
    .parseMessageType("message spark_schema { optional int64 last_batch; }")

  private[graft] def writeLedgerDir(spark: SparkSession, dir: String,
                                    batchId: Long): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    val d = new org.apache.hadoop.fs.Path(dir)
    val fs = d.getFileSystem(conf)
    fs.delete(d, true)
    fs.mkdirs(d)
    val file = new org.apache.hadoop.fs.Path(d, "part-00000-ledger.parquet")
    val wconf = new org.apache.hadoop.conf.Configuration(conf)
    org.apache.parquet.hadoop.example.GroupWriteSupport.setSchema(ledgerSchema, wconf)
    val writer = org.apache.parquet.hadoop.example.ExampleParquetWriter
      .builder(org.apache.parquet.hadoop.util.HadoopOutputFile.fromPath(file, wconf))
      .withConf(wconf)
      .withCompressionCodec(org.apache.parquet.hadoop.metadata.CompressionCodecName.SNAPPY)
      .build()
    try {
      val g = new org.apache.parquet.example.data.simple.SimpleGroup(ledgerSchema)
      g.add("last_batch", batchId)
      writer.write(g)
    } finally writer.close()
    fs.create(new org.apache.hadoop.fs.Path(d, "_SUCCESS"), true).close()
  }

  private[graft] def readLedgerDir(spark: SparkSession, dir: String): Long = {
    val conf = spark.sparkContext.hadoopConfiguration
    val d = new org.apache.hadoop.fs.Path(dir)
    val fs = d.getFileSystem(conf)
    val part = fs.listStatus(d).map(_.getPath)
      .find(p => p.getName.endsWith(".parquet") && !p.getName.startsWith("_"))
      .getOrElse(throw new java.io.FileNotFoundException(
        s"SwapStore: no ledger part file under $dir"))
    val reader = org.apache.parquet.hadoop.ParquetReader
      .builder(new org.apache.parquet.hadoop.example.GroupReadSupport(), part)
      .withConf(conf).build()
    try {
      val g = reader.read()
      require(g != null, s"SwapStore: empty ledger file $part")
      g.getLong("last_batch", 0)
    } finally reader.close()
  }

  /** The [[graft.core.Catalog]] manifest is a store-count-sized
    * (store, gen) pair table, yet every fold/savepoint/answer used to
    * pay full Spark jobs to read and rewrite it (`spark.read.parquet.
    * collect` + `coalesce(1).write.parquet`, ~100-300 ms of planning
    * each — the same driver-gap tax the ledger paid before its direct
    * path). Same cure: direct parquet-mr I/O with the SAME on-disk
    * layout Spark produced (`part-*.parquet` + `_SUCCESS`, UTF8-
    * annotated binary + int64 columns), so manifests written by either
    * path interread — old catalogs stay readable, and Spark can still
    * scan a manifest directory written here.
    */
  private val pairsSchema = org.apache.parquet.schema.MessageTypeParser
    .parseMessageType(
      "message spark_schema { optional binary store (UTF8); optional int64 gen; }")

  private[graft] def writePairsDir(spark: SparkSession, dir: String,
                                   rows: Seq[(String, Long)]): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    val d = new org.apache.hadoop.fs.Path(dir)
    val fs = d.getFileSystem(conf)
    fs.delete(d, true)
    fs.mkdirs(d)
    val file = new org.apache.hadoop.fs.Path(d, "part-00000-pairs.parquet")
    val wconf = new org.apache.hadoop.conf.Configuration(conf)
    org.apache.parquet.hadoop.example.GroupWriteSupport.setSchema(pairsSchema, wconf)
    val writer = org.apache.parquet.hadoop.example.ExampleParquetWriter
      .builder(org.apache.parquet.hadoop.util.HadoopOutputFile.fromPath(file, wconf))
      .withConf(wconf)
      .withCompressionCodec(org.apache.parquet.hadoop.metadata.CompressionCodecName.SNAPPY)
      .build()
    try rows.foreach { case (s, g) =>
      val row = new org.apache.parquet.example.data.simple.SimpleGroup(pairsSchema)
      row.add("store", org.apache.parquet.io.api.Binary.fromString(s))
      row.add("gen", g)
      writer.write(row)
    } finally writer.close()
    fs.create(new org.apache.hadoop.fs.Path(d, "_SUCCESS"), true).close()
  }

  /** Read a (store, gen) pair directory written by EITHER
    * [[writePairsDir]] or a Spark parquet write (a legacy manifest may
    * span several part files — all are read).
    */
  private[graft] def readPairsDir(spark: SparkSession, dir: String): Seq[(String, Long)] = {
    val conf = spark.sparkContext.hadoopConfiguration
    val d = new org.apache.hadoop.fs.Path(dir)
    val fs = d.getFileSystem(conf)
    val parts = fs.listStatus(d).map(_.getPath)
      .filter(p => p.getName.endsWith(".parquet") && !p.getName.startsWith("_"))
      .sortBy(_.getName)
    require(parts.nonEmpty, s"SwapStore: no pair part files under $dir")
    val out = scala.collection.mutable.ListBuffer.empty[(String, Long)]
    parts.foreach { part =>
      val reader = org.apache.parquet.hadoop.ParquetReader
        .builder(new org.apache.parquet.hadoop.example.GroupReadSupport(), part)
        .withConf(conf).build()
      try {
        var g = reader.read()
        while (g != null) {
          out += ((g.getBinary("store", 0).toStringUsingUTF8, g.getLong("gen", 0)))
          g = reader.read()
        }
      } finally reader.close()
    }
    out.toSeq
  }

  private def fsOf(spark: SparkSession, path: String) =
    new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Recover from a crash inside [[swapDirs]]' two-rename window: if
    * `_store` is missing, roll FORWARD to a complete `_store.next`
    * (both its parquet writes carry `_SUCCESS` markers — the ledger is
    * written last, so its marker implies the data's) or, failing that,
    * roll BACK to `_store.old`. Either direction converges: forward
    * lands with the advanced ledger (the crashed fold's replay is a
    * no-op), back lands with the previous ledger (the replay re-folds).
    *
    * A reader can race a LIVE writer inside the same window (the
    * writer is between its two renames, not crashed). Both sides
    * tolerate losing that race: here, a rename that fails because the
    * writer completed first is accepted as long as `_store` exists
    * afterwards, and a rename that instead lands INSIDE the concurrent
    * store (filesystems resolve rename-onto-existing-dir by moving the
    * source into it) is detected and the junk removed — the moved dir
    * is a stale copy either way. On the writer side, [[swapDirs]]
    * accepts its second rename failing when the recovery completed the
    * swap for it.
    */
  private def ensureStore(spark: SparkSession, path: String): Unit = {
    val fs = fsOf(spark, path)
    val st = new org.apache.hadoop.fs.Path(store(path))
    if (fs.exists(st)) return
    val next = new org.apache.hadoop.fs.Path(s"$path/_store.next")
    val old = new org.apache.hadoop.fs.Path(s"${store(path)}.old")
    def complete(p: org.apache.hadoop.fs.Path): Boolean =
      fs.exists(new org.apache.hadoop.fs.Path(p, "data/_SUCCESS")) &&
        fs.exists(new org.apache.hadoop.fs.Path(p, "ledger/_SUCCESS"))
    def cleanNested(): Unit =
      Seq("_store.next", "_store.old").foreach { n =>
        val junk = new org.apache.hadoop.fs.Path(st, n)
        if (fs.exists(junk)) fs.delete(junk, true)
      }
    if (fs.exists(next) && complete(next)) {
      if (fs.rename(next, st)) fs.delete(old, true)
      else require(fs.exists(st),
        s"SwapStore.ensureStore: roll-forward rename $next -> $st failed")
      cleanNested()
    } else if (fs.exists(old)) {
      require(fs.rename(old, st) || fs.exists(st),
        s"SwapStore.ensureStore: roll-back rename $old -> $st failed")
      cleanNested()
    }
    // neither exists: nothing to recover — let the read surface the
    // genuine missing-store error
  }

  /** Atomically replace the directory at `path` with `tmp` via two
    * renames (path -> path.old, tmp -> path). Crash between the
    * renames leaves the previous content at `path.old`; the window
    * where `path` does not exist is what [[retryingStaleReads]]
    * absorbs on the reader side.
    */
  private[graft] def swapDirs(spark: SparkSession, path: String, tmp: String): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    val dst = new org.apache.hadoop.fs.Path(path)
    val src = new org.apache.hadoop.fs.Path(tmp)
    val old = new org.apache.hadoop.fs.Path(s"$path.old")
    val fs = dst.getFileSystem(conf)
    fs.delete(old, true) // clear any leftover from a prior crashed swap
    require(fs.rename(dst, old), s"swap failed: rename $path -> $path.old")
    // a racing reader's ensureStore may roll our own staging dir
    // forward between the two renames — losing the second rename is
    // fine iff the swap nonetheless completed (dst present, src gone)
    if (!fs.rename(src, dst))
      require(fs.exists(dst) && !fs.exists(src),
        s"swap failed: rename $tmp -> $path " +
          s"(previous content preserved at $path.old)")
    fs.delete(old, true)
  }

  /** Run `body`, retrying (bounded, short linear backoff) when it dies
    * on a missing path/file — the [[swapDirs]] visibility window. The
    * classifier is scoped to the two exception TYPES a mid-swap read
    * actually produces (`FileNotFoundException` from a listed-then-
    * vanished file, `AnalysisException [PATH_NOT_FOUND]` from plan-time
    * resolution), anywhere in the cause chain — a genuinely wrong store
    * path raises something else and surfaces immediately instead of
    * burning the retry budget.
    */
  private[graft] def retryingStaleReads[T](attempts: Int = 5, backoffMs: Long = 500)
                                          (body: => T): T = {
    def missingFile(e: Throwable): Boolean = e != null && {
      e.isInstanceOf[java.io.FileNotFoundException] ||
        (e.isInstanceOf[org.apache.spark.sql.AnalysisException] &&
          Option(e.getMessage).exists(_.contains("PATH_NOT_FOUND"))) ||
        missingFile(e.getCause)
    }
    var left = math.max(attempts, 1)
    while (true) {
      try return body
      catch {
        case e: Throwable if missingFile(e) && left > 1 =>
          left -= 1
          Thread.sleep(backoffMs)
        case e: Throwable => throw e
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** Create (or replace) the store with `df` and an empty ledger. */
  def init(df: DataFrame, path: String): Unit = {
    val sp = df.sparkSession
    WriterLease.withLeaseHandle(sp, path, s"SwapStore.init($path)") { lease =>
      val tmp = s"$path/_store.next"
      df.write.mode("overwrite").parquet(s"$tmp/data")
      writeLedgerDir(sp, s"$tmp/ledger", -1L)
      val fs = new org.apache.hadoop.fs.Path(path)
        .getFileSystem(sp.sparkContext.hadoopConfiguration)
      lease.assertHeld()
      if (!fs.exists(new org.apache.hadoop.fs.Path(store(path))))
        require(fs.rename(new org.apache.hadoop.fs.Path(tmp),
          new org.apache.hadoop.fs.Path(store(path))),
          s"SwapStore.init: rename $tmp failed")
      else swapDirs(sp, store(path), tmp)
    }
  }

  /** The current table. */
  def read(spark: SparkSession, path: String): DataFrame = {
    ensureStore(spark, path)
    spark.read.parquet(s"${store(path)}/data")
  }

  /** The last applied batch id (-1 after [[init]]). */
  def lastBatch(spark: SparkSession, path: String): Long = {
    ensureStore(spark, path)
    readLedgerDir(spark, s"${store(path)}/ledger")
  }

  /** Apply `transform` to the current table and swap the result in,
    * advancing the ledger to `batchId` — or do nothing if `batchId` was
    * already applied. The transform's output plan executes fully
    * (reading the CURRENT files) before any rename happens.
    */
  def fold(spark: SparkSession, path: String, batchId: Long)
          (transform: DataFrame => DataFrame): Unit = {
    if (batchId <= lastBatch(spark, path)) return // re-delivery: lock-free no-op
    WriterLease.withLeaseHandle(spark, path,
        s"SwapStore.fold($path, batch $batchId)") { lease =>
      // re-check under the lease: the lock-free fast path above can
      // race a concurrent writer that applied this very batch between
      // our read and our acquire
      if (batchId > lastBatch(spark, path)) {
        val out = transform(read(spark, path))
        val tmp = s"$path/_store.next"
        out.write.mode("overwrite").parquet(s"$tmp/data")
        writeLedgerDir(spark, s"$tmp/ledger", batchId)
        lease.assertHeld()
        swapDirs(spark, store(path), tmp)
      }
    }
  }

  /** Replace the store's table AND ledger unconditionally — the
    * restore path ([[Catalog.restore]]) and the in-place manifest
    * rewrite ([[Catalog.addStore]]): unlike [[fold]], the ledger may
    * move BACKWARD (to a savepoint's fork point) or stay put. `df` may
    * read the store's current files — like [[fold]]'s transform, the
    * plan materializes fully into the staging dir before any rename.
    * Same crash-safe swap as [[fold]], same single-writer contract.
    */
  def reset(spark: SparkSession, path: String, df: DataFrame, batchId: Long): Unit =
    WriterLease.withLeaseHandle(spark, path,
        s"SwapStore.reset($path)") { lease =>
      val tmp = s"$path/_store.next"
      df.write.mode("overwrite").parquet(s"$tmp/data")
      writeLedgerDir(spark, s"$tmp/ledger", batchId)
      lease.assertHeld()
      swapDirs(spark, store(path), tmp)
    }

  /** [[init]]/[[read]]/[[fold]]/[[reset]] specialized to a (store, gen)
    * PAIR table held entirely on the driver — the [[Catalog]] manifest's
    * shape. Zero Spark jobs: the data dir goes through
    * [[writePairsDir]]/[[readPairsDir]] and the ledger through its
    * direct path, under exactly the DataFrame forms' lease, ledger and
    * two-rename swap semantics (same staging dir, same recovery).
    */
  private[graft] def initPairs(spark: SparkSession, path: String,
                               rows: Seq[(String, Long)]): Unit =
    WriterLease.withLeaseHandle(spark, path, s"SwapStore.init($path)") { lease =>
      val tmp = s"$path/_store.next"
      writePairsDir(spark, s"$tmp/data", rows)
      writeLedgerDir(spark, s"$tmp/ledger", -1L)
      val fs = fsOf(spark, path)
      lease.assertHeld()
      if (!fs.exists(new org.apache.hadoop.fs.Path(store(path))))
        require(fs.rename(new org.apache.hadoop.fs.Path(tmp),
          new org.apache.hadoop.fs.Path(store(path))),
          s"SwapStore.init: rename $tmp failed")
      else swapDirs(spark, store(path), tmp)
    }

  private[graft] def readPairs(spark: SparkSession, path: String): Seq[(String, Long)] = {
    ensureStore(spark, path)
    readPairsDir(spark, s"${store(path)}/data")
  }

  private[graft] def foldPairs(spark: SparkSession, path: String, batchId: Long)
      (transform: Seq[(String, Long)] => Seq[(String, Long)]): Unit = {
    if (batchId <= lastBatch(spark, path)) return // re-delivery: lock-free no-op
    WriterLease.withLeaseHandle(spark, path,
        s"SwapStore.fold($path, batch $batchId)") { lease =>
      if (batchId > lastBatch(spark, path)) { // re-check under the lease
        val out = transform(readPairs(spark, path))
        val tmp = s"$path/_store.next"
        writePairsDir(spark, s"$tmp/data", out)
        writeLedgerDir(spark, s"$tmp/ledger", batchId)
        lease.assertHeld()
        swapDirs(spark, store(path), tmp)
      }
    }
  }

  private[graft] def resetPairs(spark: SparkSession, path: String,
                                rows: Seq[(String, Long)], batchId: Long): Unit =
    WriterLease.withLeaseHandle(spark, path, s"SwapStore.reset($path)") { lease =>
      val tmp = s"$path/_store.next"
      writePairsDir(spark, s"$tmp/data", rows)
      writeLedgerDir(spark, s"$tmp/ledger", batchId)
      lease.assertHeld()
      swapDirs(spark, store(path), tmp)
    }

  /** Rewrite the store's data into `files` parquet files WITHOUT
    * advancing the ledger — the small-file bound for stores that fold
    * often (every fold's groupBy writes shuffle-partition-many files;
    * a periodic compact keeps the read side to `files` regardless of
    * fold count). Content- and ledger-invariant (SwapStoreSpec), same
    * crash-safe swap as [[fold]].
    */
  def compact(spark: SparkSession, path: String, files: Int = 1): Unit = {
    require(files > 0, "SwapStore.compact: files must be positive")
    WriterLease.withLeaseHandle(spark, path,
        s"SwapStore.compact($path)") { lease =>
      val last = lastBatch(spark, path)
      val tmp = s"$path/_store.next"
      read(spark, path).coalesce(files)
        .write.mode("overwrite").parquet(s"$tmp/data")
      writeLedgerDir(spark, s"$tmp/ledger", last)
      lease.assertHeld()
      swapDirs(spark, store(path), tmp)
    }
  }
}
