package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns for training-data pipelines (north-star extension).
  *
  * Media is an opaque `binary` column plus a typed metadata struct —
  * the same layout vision/audio corpora use in parquet (bytes + width/
  * height/etc). The Spark-side plumbing here is real and tested: schemas,
  * iterator-based partition processing (one codec context per partition,
  * not per row), size-aware repartitioning, and the handoff into the
  * embedding/ANN pipeline.
  *
  * The actual codecs are NOT real: this container has no image/audio
  * libraries, so `decodeStub` derives deterministic fake pixels/samples
  * from the bytes (clearly marked below). Swapping in a real decoder
  * changes only the body of that one function — batching, schema and
  * partitioning stay as they are.
  */
object Multimodal {

  /** One media record: bytes + envelope metadata. */
  case class MediaRecord(media_id: Long, media_type: String, content: Array[Byte],
                         width: Int, height: Int, n_frames: Int)

  /** Decoded/feature row produced by the partition-wise processors. */
  case class MediaFeatures(media_id: Long, media_type: String,
                           width: Int, height: Int,
                           mean_intensity: Double, embedding: Array[Float])

  /** Deterministic synthetic media table — stands in for a real binary
    * corpus so the pipeline is runnable/testable in this container.
    * Content bytes are a pure function of media_id.
    */
  def syntheticMedia(spark: SparkSession, n: Int): Dataset[MediaRecord] = {
    import spark.implicits._
    syntheticMediaFor(spark.range(n).as[Long])
  }

  /** Same synthetic corpus keyed by caller-supplied ids — lets a query
    * derive its media set from another table's id column lazily (no
    * driver-side count to size a range). Content bytes are plain integer
    * arithmetic in (media_id, byte offset) — NOT a JVM PRNG — so any
    * engine can replay them: the q43 oracle recomputes the same bytes in
    * DuckDB SQL and checks the decoded means rows+schema+hash.
    */
  def syntheticMediaFor(ids: Dataset[Long]): Dataset[MediaRecord] = {
    import ids.sparkSession.implicits._
    ids.map { i =>
      val w = 32 + (i % 4).toInt * 16
      val h = 32 + (i % 3).toInt * 16
      val bytes = Array.tabulate(w * h) { j =>
        // 0..255 by construction (all terms non-negative); (b & 0xff) in
        // the decoder recovers the exact value
        ((i * 7349L + j * 131L + (i % 97) * (j % 89)) % 256).toByte
      }
      MediaRecord(i, if (i % 5 == 4) "video" else "image", bytes, w, h,
        if (i % 5 == 4) 16 + (i % 7).toInt else 1)
    }
  }

  /** >>> STUB DECODER <<<
    * Stands in for e.g. libjpeg/ffmpeg: derives per-pixel-ish statistics
    * and a feature vector deterministically from the bytes. A real
    * implementation replaces ONLY this function body.
    */
  private def decodeStub(r: MediaRecord, dim: Int): MediaFeatures = {
    var sum = 0L
    var i = 0
    while (i < r.content.length) { sum += (r.content(i) & 0xff); i += 1 }
    val mean = if (r.content.length == 0) 0.0 else sum.toDouble / r.content.length
    val emb = new Array[Float](dim)
    var d = 0
    while (d < dim) {
      // deterministic pseudo-feature from (content hash, dim index)
      val h = scala.util.hashing.MurmurHash3.bytesHash(r.content, d)
      emb(d) = (h % 1000) / 1000.0f
      d += 1
    }
    MediaFeatures(r.media_id, r.media_type, r.width, r.height, mean, emb)
  }

  /** Decode + feature-extract, partition-wise. `mapPartitions` so a real
    * decoder pays its setup (codec tables, model weights) once per
    * partition; `repartition(parallelism)` first so huge binary rows
    * spread evenly instead of following parquet row-group skew.
    */
  def decodeAndEmbed(media: Dataset[MediaRecord], dim: Int = 64,
                     parallelism: Int = 0): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    val spread = if (parallelism > 0) media.repartition(parallelism) else media
    spread.mapPartitions { it =>
      // real impl: open codec context here, once per partition
      it.map(r => decodeStub(r, dim))
    }
  }

  /** Resize: metadata-level transform (real resample would live in the
    * decode kernel). Keeps the binary opaque; emits the target geometry
    * the way an image pipeline records post-resize dimensions.
    */
  def resizePlan(media: Dataset[MediaRecord], maxSide: Int): DataFrame = {
    val d = media.toDF()
    val scale = least(lit(1.0), lit(maxSide) / greatest(col("width"), col("height")))
    d.withColumn("target_width", ceil(col("width") * scale).cast("int"))
      .withColumn("target_height", ceil(col("height") * scale).cast("int"))
      .withColumn("needs_resize", col("target_width") =!= col("width") ||
        col("target_height") =!= col("height"))
  }

  /** Frame sampling for video rows: every `stride`-th frame index, capped
    * at `maxFrames` — the selection logic of a frame-sampling UDF, as a
    * column expression (the decode of selected frames goes through
    * decodeAndEmbed).
    */
  def frameSamplePlan(media: Dataset[MediaRecord], stride: Int, maxFrames: Int): DataFrame =
    media.toDF()
      .where(col("media_type") === "video")
      .withColumn("sampled_frames",
        slice(sequence(lit(0), col("n_frames") - 1, lit(stride)), 1, maxFrames))
}
