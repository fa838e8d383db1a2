package graft.ops

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Per-batch-id slot stores with bounded file accretion (round 17,
  * VERDICT r16 #3).
  *
  * The streaming gates accumulate state as one OVERWRITE parquet slot
  * per micro-batch id (`root/b<id>`): a replayed batch rewrites its own
  * slot instead of double-contributing — the q112 idempotency rule in
  * its append-free form. The cost of that discipline is one small file
  * set per batch FOREVER: a long-lived stream pays growing
  * file-listing and probe read amplification (q146's band store probes
  * every earlier slot per batch; q188's postings deltas union at every
  * serve). This module adds the q127 compaction move to the slot
  * layout without giving up replay idempotence:
  *
  *  - COMPACT: once the live tail holds >= `threshold` slots, fold them
  *    into one `root/c<watermark>` artifact (watermark = max folded
  *    id), committed under the q112 `_SUCCESS` rule — write-then-mark,
  *    so a crashed compaction leaves an invisible residue dir and the
  *    slots it failed to fold stay live. Folded slot dirs and
  *    superseded compact artifacts are then deleted (best-effort:
  *    a surviving stale dir is invisible to reads, just disk).
  *  - READ: newest valid compact artifact ∪ slots ABOVE its watermark.
  *    A replayed batch id at/below the watermark rewrites its slot dir,
  *    but the read ignores it — its content is already inside the
  *    compact artifact, and the streaming contract (same batch id ⇒
  *    same data) makes the exclusion exact.
  *  - MID-RUN SAFETY: a compaction issued while the stream is live may
  *    only fold COMMITTED batches — pass `beforeId` = the current batch
  *    id (batches process sequentially, so every id below the one in
  *    flight is committed and can never replay). At serve time the
  *    stream has terminated and everything is committed
  *    (`beforeId` = MaxValue).
  *
  * 100 TB posture: slot count stays bounded by the threshold instead of
  * growing with stream lifetime; compaction cost is the folded deltas'
  * size (increment-scale), paid once per `threshold` batches, and the
  * serve's listing/scan cost stops growing with batch count.
  */
object SlotStore {

  /** Live-tail slot count that triggers a fold. 8 keeps the demo
    * catalog's short AvailableNow runs (1-4 batches) compaction-free —
    * the bench measures the plain slot path — while any longer-lived
    * stream self-compacts; SlotStoreSpec exercises the fold directly. */
  val DefaultCompactSlots = 8

  private def fsOf(s: SparkSession, root: String): (FileSystem, Path) = {
    val p = new Path(root)
    (p.getFileSystem(s.sparkContext.hadoopConfiguration), p)
  }

  /** Write one batch's delta into its keyed slot (overwrite ⇒ replay
    * rewrites, never double-counts), then fold the committed tail when
    * it crossed the threshold. The write happens BEFORE the fold so a
    * compaction failure cannot lose the batch's own delta. */
  def writeSlot(df: DataFrame, root: String, batchId: Long,
      threshold: Int = DefaultCompactSlots): Unit = {
    df.write.mode("overwrite").parquet(s"$root/b$batchId")
    maybeCompact(df.sparkSession, root, beforeId = batchId, threshold)
  }

  /** Newest committed compact watermark under `root` (-1 when none). */
  private def watermarkOf(fs: FileSystem, root: Path): Long = {
    if (!fs.exists(root)) return -1L
    val ws = fs.listStatus(root).toSeq
      .filter(st => st.getPath.getName.matches("c\\d+") &&
        fs.exists(new Path(st.getPath, "_SUCCESS")))
      .map(_.getPath.getName.drop(1).toLong)
    if (ws.isEmpty) -1L else ws.max
  }

  private def slotIds(fs: FileSystem, root: Path): Seq[Long] =
    if (!fs.exists(root)) Seq.empty
    else fs.listStatus(root).toSeq.map(_.getPath.getName)
      .filter(_.matches("b\\d+")).map(_.drop(1).toLong)

  /** Every live piece of the store: the newest compact artifact (if
    * any) plus the slots above its watermark and below `beforeId`. */
  private def livePaths(s: SparkSession, root: String,
      beforeId: Long): Seq[String] = {
    val (fs, p) = fsOf(s, root)
    val w = watermarkOf(fs, p)
    // the fold-committed-only discipline guarantees w < any live or
    // replayable batch id; a violation means a caller folded an
    // uncommitted batch — fail loudly rather than serve a superset
    require(w < beforeId,
      s"slot store $root: compact watermark $w >= beforeId $beforeId — " +
        "a compaction folded a batch that was not yet committed")
    val compact = if (w >= 0) Seq(s"$root/c$w") else Seq.empty
    compact ++ slotIds(fs, p).filter(id => id > w && id < beforeId)
      .sorted.map(id => s"$root/b$id")
  }

  /** The store's content as one relation: compact ∪ live tail, slots
    * with id >= `beforeId` excluded (the streamBandsBefore replay rule —
    * a retried batch never sees its own earlier write). None when the
    * store holds nothing (callers keep their typed empty fallbacks). */
  def read(s: SparkSession, root: String,
      beforeId: Long = Long.MaxValue): Option[DataFrame] = {
    val paths = livePaths(s, root, beforeId)
    if (paths.isEmpty) None else Some(s.read.parquet(paths: _*))
  }

  /** Fold the committed tail (watermark < id < beforeId) into a new
    * compact artifact when it holds >= `threshold` slots. Idempotent
    * and crash-safe: the artifact commits under `_SUCCESS` before any
    * folded dir is deleted. */
  def maybeCompact(s: SparkSession, root: String,
      beforeId: Long = Long.MaxValue,
      threshold: Int = DefaultCompactSlots): Unit = {
    val (fs, p) = fsOf(s, root)
    val w = watermarkOf(fs, p)
    val tail = slotIds(fs, p).filter(id => id > w && id < beforeId).sorted
    if (tail.size < threshold) return
    val newW = tail.max
    val pieces = (if (w >= 0) Seq(s"$root/c$w") else Seq.empty) ++
      tail.map(id => s"$root/b$id")
    // few small delta files in, few out — but the fold width SCALES
    // with the folded bytes (~128 MB target files, floor 4, cap 200):
    // a fixed tiny coalesce would serialize a large fold onto 4 write
    // tasks at cluster scale, while an unbounded width defeats the
    // file-count fix. Sizing is fs-metadata only.
    val totalBytes = pieces.map(pp =>
      fs.getContentSummary(new Path(pp)).getLength).sum
    val width = math.max(4,
      math.min(200, (totalBytes >> 27).toInt + 1))
    s.read.parquet(pieces: _*).coalesce(width)
      .write.mode("overwrite").parquet(s"$root/c$newW")
    Upsert.touchCommitMarker(s, s"$root/c$newW")
    // best-effort sweep of superseded pieces (stale dirs are invisible
    // to livePaths — the newest valid compact hides b<=w and older c)
    (tail.map(id => s"b$id") ++ (if (w >= 0) Seq(s"c$w") else Seq.empty))
      .foreach { n =>
        try { fs.delete(new Path(p, n), true); () }
        catch { case _: Throwable => () }
      }
  }

  /** Newest committed compact watermark under `root` (-1 when no fold
    * has committed) — lets a caller ASSERT a fold actually ran (the
    * q212 in-leg proof: the oracle check is only evidence about the
    * compacted layout if the execution provably compacted). */
  private[graft] def compactWatermark(s: SparkSession, root: String): Long = {
    val (fs, p) = fsOf(s, root)
    watermarkOf(fs, p)
  }

  /** Count of live slot dirs above the compact watermark — bounded by
    * the fold threshold after any post-threshold write. */
  private[graft] def liveSlotCount(s: SparkSession, root: String): Int = {
    val (fs, p) = fsOf(s, root)
    val w = watermarkOf(fs, p)
    slotIds(fs, p).count(_ > w)
  }

  /** Total data files under the store across compact + slot dirs — the
    * accretion meter SlotStoreSpec asserts on (bounded by compaction,
    * growing without it). */
  private[graft] def dataFileCount(s: SparkSession, root: String): Int = {
    val (fs, p) = fsOf(s, root)
    if (!fs.exists(p)) return 0
    fs.listStatus(p).toSeq
      .filter(st => st.getPath.getName.matches("[bc]\\d+"))
      .map(st => fs.listStatus(st.getPath)
        .count(_.getPath.getName.endsWith(".parquet")))
      .sum
  }
}
