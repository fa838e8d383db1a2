package graft

import graft.ops.{MediaKernels, MultimodalOps}

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("PPM codec: encode→decode roundtrip and comment-tolerant header") {
    val rgb = Array.tabulate[Byte](4 * 3 * 3)(i => (i * 7).toByte)
    val (w, h, px) = MediaKernels.decodePpm(MediaKernels.encodePpm(4, 3, rgb))
    assert((w, h) == (4, 3))
    assert(px.toSeq == rgb.toSeq)
    // a PPM written by another tool may carry '#' comments in the header
    val commented = "P6\n# made by graft\n4 3\n255\n".getBytes("US-ASCII") ++ rgb
    val (w2, h2, px2) = MediaKernels.decodePpm(commented)
    assert((w2, h2) == (4, 3))
    assert(px2.toSeq == rgb.toSeq)
  }

  test("WAV codec: encode→decode roundtrip and unknown-chunk tolerance") {
    val samples = Array.tabulate[Short](100)(i => (i * 331 - 16000).toShort)
    val (rate, got) =
      MediaKernels.decodeWavPcm16(MediaKernels.encodeWavPcm16(22050, samples))
    assert(rate == 22050)
    assert(got.toSeq == samples.toSeq)
    // a WAV from another tool may carry extra chunks (e.g. LIST) before
    // data — the chunk walk must skip them
    val canonical = MediaKernels.encodeWavPcm16(8000, samples)
    val extra = java.nio.ByteBuffer.allocate(12)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .put("LIST".getBytes("US-ASCII")).putInt(4)
      .put("INFO".getBytes("US-ASCII")).array()
    val withChunk = canonical.slice(0, 36) ++ extra ++ canonical.slice(36, canonical.length)
    // fix RIFF size field (bytes 4-7) for the inserted 12 bytes
    val bb = java.nio.ByteBuffer.wrap(withChunk)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(4, bb.getInt(4) + 12)
    val (rate2, got2) = MediaKernels.decodeWavPcm16(withChunk)
    assert(rate2 == 8000)
    assert(got2.toSeq == samples.toSeq)
  }

  test("audio decode recovers the generated samples exactly") {
    val clips = MultimodalOps.decodeAudio(
      MultimodalOps.mediaTable(spark, sf).limit(30)).collect()
    assert(clips.nonEmpty)
    clips.foreach { c =>
      assert(c.sample_rate == 16000)
      assert(c.samples.nonEmpty)
    }
  }

  test("resizeNearest: exact corner mapping on a known buffer") {
    // 2x2 single-channel image [[1,2],[3,4]] upscaled to 4x4: each source
    // pixel becomes a 2x2 block
    val src = Array[Byte](1, 2, 3, 4)
    val out = MediaKernels.resizeNearest(src, 2, 2, 1, 4, 4)
    assert(out.toSeq == Seq[Byte](1, 1, 2, 2, 1, 1, 2, 2,
      3, 3, 4, 4, 3, 3, 4, 4))
  }

  test("decode→resize pipeline preserves rows and partitioning") {
    val media = MultimodalOps.mediaTable(spark, sf).repartition(5)
    val frames = MultimodalOps.decodeFrames(media, batchSize = 8)
    // narrow transform: partition count unchanged (no shuffle)
    assert(frames.rdd.getNumPartitions == 5)
    val expectedFrames = media.collect().map(_.n_frames.toLong).sum
    assert(frames.count() == expectedFrames)
    val resized = MultimodalOps.resizeFrames(frames, 8, 6)
    val lens = resized.map(f => f.pixels.length).distinct().collect().toSeq
    assert(lens == Seq(8 * 6 * 3))
  }

  test("feature extraction is deterministic, unit-L1, fixed-dim") {
    val media = MultimodalOps.mediaTable(spark, sf).limit(20)
    val f1 = MultimodalOps.extractFeatures(media, dim = 16)
      .collect().sortBy(_.media_id)
    val f2 = MultimodalOps.extractFeatures(media, dim = 16)
      .collect().sortBy(_.media_id)
    assert(f1.map(_.feature.toSeq).toSeq == f2.map(_.feature.toSeq).toSeq)
    assert(f1.forall(_.feature.length == 16))
    assert(f1.forall(m => math.abs(m.feature.sum - 1f) < 1e-3))
  }

  test("metadata queries over a STORED media table prune the payload " +
      "column at the scan") {
    // the synthetic mediaTable generates payloads from documents.text, so
    // its own scan can't skip text — but the production shape is a WRITTEN
    // media store, where metadata queries must read footers + metadata
    // columns only, never the blobs. Prove it on a written store.
    val dir = java.nio.file.Files
      .createTempDirectory("graft_media_store").toString + "/media"
    MultimodalOps.mediaTable(spark, sf).limit(50).write
      .mode("overwrite").parquet(dir)
    val meta = spark.read.parquet(dir)
      .groupBy($"kind").agg(org.apache.spark.sql.functions.sum($"n_frames"))
    val plan = meta.queryExecution.executedPlan.toString
    assert(plan.contains("ReadSchema"))
    assert(!plan.contains("payload"), s"payload not pruned:\n$plan")
  }

  test("frame sampling keeps every step-th frame only") {
    val media = MultimodalOps.mediaTable(spark, sf)
      .filter(_.kind == "video").limit(5)
    val frames = MultimodalOps.decodeFrames(media)
    val sampled = MultimodalOps.sampleFrames(frames, step = 4)
    val byId = sampled.collect().groupBy(_.media_id)
    media.collect().foreach { m =>
      val expected = (m.n_frames + 3) / 4 // ceil(n/4): frames 0,4,8,…
      assert(byId(m.media_id).length == expected)
      assert(byId(m.media_id).forall(_.frame_idx % 4 == 0))
    }
  }

  test("perceptual hash: signature is resolution-invariant for one scene, " +
      "distinct scenes differ, dedup finds exactly the planted pair (q119)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("q119spec").toString
    // doc 0 and 1 share scene 0 at DIFFERENT resolutions (n_chars drive
    // w/h); docs 2 and 50 are their own scenes
    Seq((0L, "a" * 20), (1L, "b" * 333), (2L, "c" * 77), (50L, "d" * 200))
      .map { case (id, t) => (id, t, t.length.toLong) }
      .toDF("doc_id", "text", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val sigs = MultimodalOps.imageSignatures(
      MultimodalOps.patternImageTable(spark, dir)).collect()
      .map(s => s.media_id -> s).toMap
    // different resolutions (20 vs 333 chars → different w/h), same scene
    assert(sigs(0L).sig.toSeq == sigs(1L).sig.toSeq)
    assert(sigs(0L).ahash == sigs(1L).ahash)
    assert(sigs(0L).sig.toSeq != sigs(2L).sig.toSeq)
    val pairs = SparkEntry.queries("q119_media_dedup")(spark, dir)
      .as[(Long, Long)].collect().toList
    assert(pairs == List((0L, 1L)), pairs)
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }

  test("JPEG kernel: ImageIO roundtrip bounds tile-center error, sniffing " +
      "dispatch decodes both codecs, cross-codec dedup finds exactly the " +
      "planted ppm/jpeg pair (q182)") {
    import spark.implicits._
    // raw roundtrip: a 4-level block scene survives lossy JPEG with
    // tile-center luminance error well inside the ±31 snap tolerance
    val w = 48; val h = 40
    val gray = new Array[Byte](w * h)
    for (y <- 0 until h; x <- 0 until w)
      gray(y * w + x) =
        MultimodalOps.tileValue4(7L, (y * 8 / h) * 8 + x * 8 / w)
    val jpeg = MediaKernels.encodeJpegGray(w, h, gray, 0.9f)
    assert(jpeg(0) == 0xff.toByte && jpeg(1) == 0xd8.toByte, "JFIF magic")
    val (dw, dh, dec) = MediaKernels.decodeJpegGray(jpeg)
    assert((dw, dh) == ((w, h)))
    var maxCenterErr = 0
    for (cy <- 0 until 8; cx <- 0 until 8) {
      val x = (2 * cx + 1) * w / 16; val y = (2 * cy + 1) * h / 16
      maxCenterErr = math.max(maxCenterErr,
        math.abs((dec(y * w + x) & 0xff) - (gray(y * w + x) & 0xff)))
    }
    assert(maxCenterErr <= 20, s"tile-center JPEG error $maxCenterErr")
    // sniffing dispatch + planted cross-codec pair end to end: docs 0/1
    // share scene 0 (ppm + jpeg at different resolutions); 2/3/50 are
    // their own scenes across both codecs (parity picks the codec)
    val dir = java.nio.file.Files.createTempDirectory("q182spec").toString
    Seq((0L, "a" * 20), (1L, "b" * 333), (2L, "c" * 77), (3L, "e" * 41),
        (50L, "d" * 200))
      .map { case (id, t) => (id, t, t.length.toLong) }
      .toDF("doc_id", "text", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val media = MultimodalOps.mixedCodecImageTable(spark, dir).collect()
      .map(m => m.media_id -> m).toMap
    assert(new String(media(0L).payload.take(2), "US-ASCII") == "P6")
    assert(media(1L).payload(0) == 0xff.toByte)
    val out = SparkEntry.queries("q182_media_dedup_crosscodec")(spark, dir)
      .as[(Long, Long, String, String)].collect().toList
    assert(out == List((0L, 1L, "ppm", "jpeg")), out)
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }

  test("streaming media gate equals the batch index probe of the same " +
      "arrivals (q189)") {
    import org.apache.spark.sql.functions._
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val cut = math.floor(
      (docs.agg(max(col("doc_id"))).head.getLong(0) + 1) * 0.8).toLong
    // the gate itself (drains the stream, probes the shared index)
    val streamed = SparkEntry.queries("q189_stream_media_dedup_gate")(
        spark, sf)
      .as[(Long, Long)].collect().toSeq
    assert(streamed.nonEmpty)
    // batch recomputation of the SAME rule: arrival signatures (fresh ∪
    // re-crawl under re-fetch ids, scenes seeded by the ORIGINAL id)
    // joined against snapshot signatures on (ahash, sig)
    def sigsOf(rows: org.apache.spark.sql.DataFrame) =
      MultimodalOps.imageSignatures(MultimodalOps.patternImagesOf(
        rows.as[(Long, Long, Long)])).toDF()
    val snapSigs = sigsOf(docs.filter(col("doc_id") < cut)
      .select(col("doc_id"), col("doc_id"), col("n_chars")))
    val arrSigs = sigsOf(docs
      .filter(col("doc_id") >= cut || col("doc_id") % 7 === 0)
      .select(
        when(col("doc_id") < cut, col("doc_id") + lit(1000000L))
          .otherwise(col("doc_id")).as("media_id"),
        col("doc_id").as("seed"), col("n_chars")))
    val batch = snapSigs.as("a").join(arrSigs.as("b"),
        col("a.ahash") === col("b.ahash"))
      .filter(col("a.sig") === col("b.sig"))
      .select(col("a.media_id").as("snap_id"),
        col("b.media_id").as("inc_id"))
      .orderBy(col("snap_id"), col("inc_id"))
      .as[(Long, Long)].collect().toSeq
    assert(streamed === batch, "stream must equal the batch probe")
    // every re-crawl matches its original — the planted invariant the
    // oracle arithmetic states
    val recrawls = docs.filter(col("doc_id") < cut && col("doc_id") % 7 === 0)
      .select(col("doc_id")).as[Long].collect().toSet
    val selfPairs = streamed.filter { case (s0, i) => i == s0 + 1000000L }
      .map(_._1).toSet
    assert(selfPairs === recrawls)
  }
}
