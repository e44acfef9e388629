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
  * Codecs: [[decodeImages]] and [[decodeAudio]] are REAL — they parse
  * actual PNG/JPEG/GIF/BMP and WAV/PCM16 containers through the decoders
  * bundled in every Java 17 runtime (javax.imageio, javax.sound.sampled),
  * so they work in any Spark executor JVM with no external native
  * libraries. `decodeStub` remains only for formats the JDK cannot decode
  * (video frames); swapping in e.g. an ffmpeg binding changes only that
  * one function body — batching, schema and partitioning stay as they
  * are.
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

  /** Deterministic grayscale value for (media id, pixel index): 0..255 by
    * construction (all terms non-negative) in plain integer arithmetic —
    * NOT a JVM PRNG — so any engine can replay it (the q43/q68 oracles
    * recompute it in DuckDB SQL).
    */
  private[ops] def synthByte(i: Long, j: Long): Int =
    ((i * 7349L + j * 131L + (i % 97) * (j % 89)) % 256).toInt

  /** Deterministic PCM sample for (media id, sample index): −1024..1023,
    * same replayability contract as [[synthByte]] (q69 oracle).
    */
  private[ops] def synthSample(i: Long, t: Long): Int =
    (((i * 7349L + t * 131L) % 2048L) - 1024L).toInt

  /** Same synthetic corpus keyed by caller-supplied ids — lets a query
    * derive its media set from another table's id column lazily (no
    * driver-side count to size a range). Content bytes are RAW
    * [[synthByte]] values (no container format) — the input shape for the
    * stub decode path; [[syntheticPngMediaFor]] wraps the same pixels in
    * a real PNG container for the real-codec path.
    */
  def syntheticMediaFor(ids: Dataset[Long]): Dataset[MediaRecord] = {
    import ids.sparkSession.implicits._
    ids.map { i =>
      val w = 32 + (i % 4).toInt * 16
      val h = 32 + (i % 3).toInt * 16
      val bytes = Array.tabulate(w * h) { j =>
        // (b & 0xff) in the decoder recovers the exact 0..255 value
        synthByte(i, j).toByte
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

  // ------------------------------------------------------------------
  // REAL codecs — JDK-bundled decoders, no external native libraries.
  //
  // javax.imageio (PNG/JPEG/GIF/BMP readers) and javax.sound.sampled
  // (WAV/PCM parsing) ship inside every Java 17 runtime, so they exist in
  // any Spark executor JVM — these paths decode actual containers, they
  // are not stubs. `decodeStub` remains only for formats the JDK cannot
  // decode (video frames), with the swap seam unchanged.
  //
  // PNG and PCM16 WAV are LOSSLESS, which makes the whole
  // encode → shuffle → decode pipeline oracle-checkable: the synthetic
  // pixels/samples are engine-portable integer arithmetic, so DuckDB
  // recomputes the decoded statistics without ever touching a codec —
  // any byte the codec path drops or distorts fails the hash compare
  // (q68 images, q69 audio).
  // ------------------------------------------------------------------

  /** One audio clip: a real WAV (RIFF/PCM16LE mono) byte container. */
  case class AudioRecord(media_id: Long, content: Array[Byte], sample_rate: Int)

  /** Decoded audio statistics; means are exact-integer ratios. */
  case class AudioFeatures(media_id: Long, n_samples: Long,
                           mean_abs: Double, mean_square: Double,
                           embedding: Array[Float])

  /** Encode 8-bit grayscale pixels (row-major) as a real PNG. */
  def encodeGrayPng(pixels: Array[Byte], w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    img.getRaster.setDataElements(0, 0, w, h, pixels)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Synthetic corpus of REAL PNG files: [[synthByte]] pixels, encoded
    * through the JDK PNG writer — the input for [[decodeImages]].
    */
  def syntheticPngMediaFor(ids: Dataset[Long]): Dataset[MediaRecord] = {
    import ids.sparkSession.implicits._
    ids.map { i =>
      val w = 32 + (i % 4).toInt * 16
      val h = 32 + (i % 3).toInt * 16
      val px = Array.tabulate(w * h)(j => synthByte(i, j).toByte)
      MediaRecord(i, "image/png", encodeGrayPng(px, w, h), w, h, 1)
    }
  }

  /** REAL image decode + feature extraction: ImageIO parses the container
    * (PNG/JPEG/GIF/BMP), features come from the decoded raster — mean
    * intensity over all bands and a `dim`-bucket pooled-intensity
    * embedding in [0,1]. Width/height are the DECODED geometry, not the
    * envelope metadata. Undecodable rows are skipped, not fatal: one
    * corrupt file in a 100 TB corpus must not kill the scan (count them
    * upstream with a `where(decodable)` split if the loss rate matters).
    * mapPartitions like the stub path — a heavier codec would amortize
    * per-partition setup here.
    */
  def decodeImages(media: Dataset[MediaRecord], dim: Int = 64): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.flatMap { r =>
        val img =
          // NonFatal, not just IOException: the JDK readers throw
          // RuntimeExceptions on corrupt input (AIOOBE from truncated GIF
          // LZW data, "New BMP version not implemented", …) and one bad
          // file in a 100 TB corpus must not kill the scan
          try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.content))
          catch { case scala.util.control.NonFatal(_) => null }
        if (img == null) None
        else {
          val w = img.getWidth
          val h = img.getHeight
          val raster = img.getRaster
          val bands = raster.getNumBands
          val n = w.toLong * h
          var sum = 0L
          val bSum = new Array[Long](dim)
          val bCnt = new Array[Long](dim)
          var idx = 0L
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              var b = 0
              var px = 0
              while (b < bands) { px += raster.getSample(x, y, b); b += 1 }
              sum += px
              val bk = (idx * dim / n).toInt
              bSum(bk) += px
              bCnt(bk) += 1
              idx += 1
              x += 1
            }
            y += 1
          }
          val emb = Array.tabulate(dim) { d =>
            if (bCnt(d) == 0) 0f
            else (bSum(d).toDouble / (bCnt(d) * bands) / 255.0).toFloat
          }
          Some(MediaFeatures(r.media_id, r.media_type, w, h,
            sum.toDouble / (n * bands), emb))
        }
      }
    }
  }

  /** Encode PCM16 mono samples as a real WAV (44-byte RIFF header +
    * little-endian samples).
    */
  def encodeWavPcm16(samples: Array[Short], sampleRate: Int): Array[Byte] = {
    val dataLen = samples.length * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1) // PCM
      .putShort(1) // mono
      .putInt(sampleRate)
      .putInt(sampleRate * 2) // byte rate
      .putShort(2)            // block align
      .putShort(16)           // bits per sample
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(bb.putShort)
    bb.array()
  }

  /** Synthetic corpus of REAL WAV clips: [[synthSample]] PCM16 samples
    * through [[encodeWavPcm16]] — the input for [[decodeAudio]].
    */
  def syntheticWavFor(ids: Dataset[Long], nSamples: Int = 4096,
                      sampleRate: Int = 16000): Dataset[AudioRecord] = {
    import ids.sparkSession.implicits._
    ids.map { i =>
      AudioRecord(i,
        encodeWavPcm16(Array.tabulate(nSamples)(t => synthSample(i, t).toShort),
          sampleRate), sampleRate)
    }
  }

  /** REAL audio decode: javax.sound.sampled parses the WAV container and
    * yields the PCM frames. Features are exact-integer ratios (mean |s|,
    * mean s² — no sqrt, so cross-engine bit-exact) plus a `dim`-bucket
    * mean-|s| envelope embedding in [0,1]. Unparseable rows skipped, same
    * contract as [[decodeImages]].
    */
  def decodeAudio(audio: Dataset[AudioRecord], dim: Int = 16): Dataset[AudioFeatures] = {
    import audio.sparkSession.implicits._
    audio.mapPartitions { it =>
      it.flatMap { r =>
        try {
          val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
            new java.io.ByteArrayInputStream(r.content))
          val fmt = ais.getFormat
          require(fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1,
            s"decodeAudio expects PCM16 mono, got $fmt")
          val bytes = ais.readAllBytes()
          val bb = java.nio.ByteBuffer.wrap(bytes).order(
            if (fmt.isBigEndian) java.nio.ByteOrder.BIG_ENDIAN
            else java.nio.ByteOrder.LITTLE_ENDIAN)
          val n = bytes.length / 2
          var sumAbs = 0L
          var sumSq = 0L
          val bSum = new Array[Long](dim)
          val bCnt = new Array[Long](dim)
          var t = 0
          while (t < n) {
            val s = bb.getShort(2 * t).toLong
            val a = math.abs(s)
            sumAbs += a
            sumSq += s * s
            val bk = (t.toLong * dim / n).toInt
            bSum(bk) += a
            bCnt(bk) += 1
            t += 1
          }
          val emb = Array.tabulate(dim) { d =>
            if (bCnt(d) == 0) 0f else (bSum(d).toDouble / bCnt(d) / 32768.0).toFloat
          }
          if (n == 0) None
          else Some(AudioFeatures(r.media_id, n.toLong,
            sumAbs.toDouble / n, sumSq.toDouble / n, emb))
        } catch {
          // same contract as decodeImages: any per-row decode failure
          // (unsupported container, truncated header, runtime exception
          // from the parser) skips the row, never the scan
          case scala.util.control.NonFatal(_) => None
        }
      }
    }
  }
}
