package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** REAL codec paths (JDK-bundled ImageIO / javax.sound.sampled): the
  * synthetic pixels/samples are integer formulas, the containers are real
  * PNG/WAV bytes, and both formats are lossless — so decode output must
  * equal the formula EXACTLY, proving the full encode→decode roundtrip.
  */
class MultimodalCodecSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ids(n: Int) = spark.range(n).as[Long]

  test("png: real ImageIO decode recovers the exact synthetic pixels") {
    val feats = Multimodal.decodeImages(
        Multimodal.syntheticPngMediaFor(ids(30)), dim = 16)
      .collect().sortBy(_.media_id)
    assert(feats.length == 30)
    for (f <- feats) {
      val i = f.media_id
      val w = 32 + (i % 4).toInt * 16
      val h = 32 + (i % 3).toInt * 16
      // decoded geometry comes from the PNG container, not metadata
      assert(f.width == w && f.height == h, s"decoded dims wrong for $i")
      val n = w * h
      val want = (0 until n).map(j => Multimodal.synthByte(i, j).toLong).sum.toDouble / n
      assert(f.mean_intensity == want, s"mean for $i: ${f.mean_intensity} != $want")
      assert(f.embedding.length == 16)
      assert(f.embedding.forall(v => v >= 0f && v <= 1f))
    }
  }

  test("png: pooled embedding equals driver-side bucket means") {
    val f = Multimodal.decodeImages(Multimodal.syntheticPngMediaFor(ids(3)), dim = 8)
      .collect().find(_.media_id == 1L).get
    val n = f.width * f.height
    val want = Array.tabulate(8) { d =>
      val js = (0 until n).filter(j => j.toLong * 8 / n == d)
      (js.map(j => Multimodal.synthByte(1L, j).toLong).sum.toDouble / js.size / 255.0).toFloat
    }
    assert(f.embedding.sameElements(want))
  }

  test("corrupt image bytes are skipped, not fatal") {
    val media = Multimodal.syntheticPngMediaFor(ids(5)).collect().toSeq :+
      Multimodal.MediaRecord(99L, "image/png", Array[Byte](1, 2, 3, 4), 0, 0, 1) :+
      Multimodal.MediaRecord(98L, "image/png", Array.emptyByteArray, 0, 0, 1)
    val got = Multimodal.decodeImages(media.toDS(), dim = 4).collect()
    assert(got.map(_.media_id).sorted.toSeq == (0L until 5L).toSeq)
  }

  test("jpeg: the same ImageIO path decodes a lossy container (dims exact, mean close)") {
    // prove the decoder is format-general, not PNG-special-cased: encode
    // the pixels as JPEG (lossy), decode through the same path
    val w = 48; val h = 32
    val px = Array.tabulate(w * h)(j => Multimodal.synthByte(7L, j).toByte)
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    img.getRaster.setDataElements(0, 0, w, h, px)
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "jpg", bos), "no JDK jpeg writer")
    val rec = Multimodal.MediaRecord(7L, "image/jpeg", bos.toByteArray, w, h, 1)
    val got = Multimodal.decodeImages(Seq(rec).toDS(), dim = 4).collect()
    assert(got.length == 1 && got.head.width == w && got.head.height == h)
    val exact = px.map(_ & 0xff).map(_.toLong).sum.toDouble / (w * h)
    assert(math.abs(got.head.mean_intensity - exact) < 10.0,
      s"jpeg mean drifted implausibly: ${got.head.mean_intensity} vs $exact")
  }

  test("wav: real javax.sound decode recovers the exact synthetic samples") {
    val feats = Multimodal.decodeAudio(Multimodal.syntheticWavFor(ids(20)), dim = 16)
      .collect().sortBy(_.media_id)
    assert(feats.length == 20)
    for (f <- feats) {
      val i = f.media_id
      assert(f.n_samples == 4096L)
      val smp = (0 until 4096).map(t => Multimodal.synthSample(i, t).toLong)
      assert(f.mean_abs == smp.map(math.abs).sum.toDouble / 4096)
      assert(f.mean_square == smp.map(s => s * s).sum.toDouble / 4096)
      assert(f.embedding.length == 16 && f.embedding.forall(v => v >= 0f && v <= 1f))
    }
  }

  test("decoded image embeddings feed the ANN pipeline end-to-end") {
    // the documented handoff: real PNG decode → pooled-intensity embedding
    // → cosine top-k. A perturbed copy of each query image must rank
    // its source first (embeddings are locality-preserving pixel pools)
    import org.apache.spark.sql.functions._
    val feats = Multimodal.decodeImages(Multimodal.syntheticPngMediaFor(ids(24)), dim = 16)
      .toDF().select(col("media_id"), col("embedding"))
    // plant near-duplicates: same pixels, one gray level shifted
    val planted = Multimodal.syntheticPngMediaFor(ids(6)).map { r =>
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.content))
      val w = img.getWidth; val h = img.getHeight
      val px = Array.tabulate(w * h) { j =>
        val v = img.getRaster.getSample(j % w, j / w, 0)
        (math.min(255, v + 1)).toByte
      }
      Multimodal.MediaRecord(r.media_id + 1000L, "image/png",
        Multimodal.encodeGrayPng(px, w, h), w, h, 1)
    }
    val plantedFeats = Multimodal.decodeImages(planted, dim = 16)
      .toDF().select(col("media_id"), col("embedding"))
    val ranked = Similarity.bruteForceTopK(
      plantedFeats, feats.union(plantedFeats),
      col("media_id"), col("embedding"), col("media_id"), col("embedding"), k = 1)
      .as[(Long, Long, Long)].collect()
    assert(ranked.length == 6)
    assert(ranked.forall { case (q, c, rk) => rk == 1L && c == q - 1000L },
      s"perturbed images did not rank their source first: ${ranked.toSeq}")
  }

  test("png decode runs inside a streaming query (per-micro-batch ingestion)") {
    // continuous media ingestion: a stream of real PNG records decoded by
    // the same mapPartitions operator — works unchanged on a streaming
    // Dataset because it is a narrow transform (no state, no shuffle)
    implicit val ctx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val in = MemoryStream[(Long, Array[Byte])]
    val media = in.toDS().map { case (id, bytes) =>
      Multimodal.MediaRecord(id, "image/png", bytes, 0, 0, 1)
    }
    val q = Multimodal.decodeImages(media, dim = 4).toDF()
      .writeStream.format("memory").queryName("decoded_media").outputMode("append")
      .start()
    try {
      val recs = Multimodal.syntheticPngMediaFor(ids(4)).collect()
      in.addData(recs.take(2).map(r => (r.media_id, r.content)).toSeq)
      q.processAllAvailable()
      in.addData(recs.drop(2).map(r => (r.media_id, r.content)).toSeq)
      q.processAllAvailable()
      val got = spark.table("decoded_media")
        .select("media_id", "mean_intensity")
        .as[(Long, Double)].collect().toMap
      assert(got.keySet == Set(0L, 1L, 2L, 3L))
      for ((i, mean) <- got) {
        val w = 32 + (i % 4).toInt * 16
        val h = 32 + (i % 3).toInt * 16
        val want = (0 until w * h).map(j => Multimodal.synthByte(i, j).toLong).sum.toDouble / (w * h)
        assert(mean == want, s"streamed decode mean for $i: $mean != $want")
      }
    } finally q.stop()
  }

  test("wav: unparseable clip skipped; results invariant under repartitioning") {
    val good = Multimodal.syntheticWavFor(ids(8)).collect().toSeq :+
      Multimodal.AudioRecord(99L, Array[Byte](82, 73, 70, 70, 0, 0), 16000)
    val a = Multimodal.decodeAudio(good.toDS(), dim = 8).collect()
      .map(f => (f.media_id, f.mean_abs, f.mean_square)).sortBy(_._1).toSeq
    assert(a.map(_._1) == (0L until 8L).toSeq)
    val b = Multimodal.decodeAudio(good.toDS().repartition(7), dim = 8).collect()
      .map(f => (f.media_id, f.mean_abs, f.mean_square)).sortBy(_._1).toSeq
    assert(a == b)
  }
}
