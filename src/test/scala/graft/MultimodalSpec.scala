package graft

import graft.ops.{MediaKernels, MultimodalOps}

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

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
}
