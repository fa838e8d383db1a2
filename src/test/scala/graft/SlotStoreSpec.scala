package graft

import graft.ops.SlotStore
import org.apache.spark.sql.functions._

/** Slot-store compaction (round 17, VERDICT r16 #3): per-batch-id
  * overwrite slots fold into one committed artifact past a threshold,
  * reads stay content-identical, replay idempotence survives, and the
  * store's file count is BOUNDED by the threshold instead of growing
  * one slot per batch forever. */
class SlotStoreSpec extends SparkSpec {
  import spark.implicits._

  private def slotDf(id: Long) =
    Seq((id, s"v$id")).toDF("batch", "payload")

  test("reads are content-identical across the compaction boundary, and " +
      "the file count after N batches is threshold-bounded (the " +
      "accretion assertion)") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_slots").toString
    val n = 10
    (0L until n.toLong).foreach { id =>
      SlotStore.writeSlot(slotDf(id), root, id, threshold = 4)
    }
    // content: exactly one row per batch id, whatever got folded
    val got = SlotStore.read(spark, root).get
      .as[(Long, String)].collect().toSet
    assert(got == (0L until n.toLong).map(id => (id, s"v$id")).toSet)
    // accretion: without compaction this store holds 10 slot dirs; with
    // threshold 4 the committed tail can never exceed threshold slots
    // plus one compact artifact (<= 4 files, coalesced)
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dirs = fs.listStatus(new org.apache.hadoop.fs.Path(root)).toSeq
      .map(_.getPath.getName)
    val liveSlots = dirs.count(_.matches("b\\d+"))
    val compacts = dirs.count(_.matches("c\\d+"))
    assert(compacts == 1, s"expected one live compact artifact: $dirs")
    assert(liveSlots < 4, s"live slot tail not threshold-bounded: $dirs")
    assert(SlotStore.dataFileCount(spark, root) <= 4 + liveSlots * 2,
      s"file count grew past the compaction bound: " +
        s"${SlotStore.dataFileCount(spark, root)} files in $dirs")
  }

  test("replay idempotence across a fold: a re-written slot at/below the " +
      "watermark is ignored (its content already rides the compact " +
      "artifact), and one above it reads normally") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_slots_replay").toString
    (0L to 5L).foreach(id =>
      SlotStore.writeSlot(slotDf(id), root, id, threshold = 3))
    val before = SlotStore.read(spark, root).get
      .as[(Long, String)].collect().toSet
    // replay of a FOLDED batch (id 1): the streaming contract says same
    // batch id => same data; the rewrite must not double-contribute
    slotDf(1L).write.mode("overwrite").parquet(s"$root/b1")
    val after = SlotStore.read(spark, root).get
      .as[(Long, String)].collect().toSet
    assert(after == before, "replayed folded slot changed the read")
    // replay of a LIVE-tail batch rewrites in place, still one row
    slotDf(5L).write.mode("overwrite").parquet(s"$root/b5")
    val again = SlotStore.read(spark, root).get
      .as[(Long, String)].collect().toSet
    assert(again == before)
  }

  test("mid-run discipline: beforeId excludes the in-flight batch from " +
      "both reads and folds, and a watermark at/above beforeId fails " +
      "loudly instead of serving a superset") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_slots_mid").toString
    (0L to 4L).foreach(id =>
      slotDf(id).write.mode("overwrite").parquet(s"$root/b$id"))
    // batch 4 is in flight: its own slot is invisible to it
    val seen = SlotStore.read(spark, root, beforeId = 4L).get
      .as[(Long, String)].collect().toMap
    assert(seen.keySet == Set(0L, 1L, 2L, 3L))
    // fold committed-only: threshold met among ids < 4, watermark lands
    // at 3 and b4 survives
    SlotStore.maybeCompact(spark, root, beforeId = 4L, threshold = 3)
    val seenAfter = SlotStore.read(spark, root, beforeId = 4L).get
      .as[(Long, String)].collect().toMap
    assert(seenAfter.keySet == Set(0L, 1L, 2L, 3L))
    assert(SlotStore.read(spark, root).get.count() == 5) // serve sees all
    // a caller claiming an id at/below the watermark is a fold-safety
    // violation — loud failure, not a silently wrong superset
    intercept[IllegalArgumentException] {
      SlotStore.read(spark, root, beforeId = 2L)
    }
  }

  test("empty store reads None (callers keep their typed fallbacks)") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_slots_empty").toString
    assert(SlotStore.read(spark, root).isEmpty)
    SlotStore.maybeCompact(spark, root) // no-op, no throw
  }
}
