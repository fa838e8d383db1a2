package graft.schema

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.{col, max}

/** Memoized 80% snapshot/increment id cuts (VERDICT r15 #3).
  *
  * Every incremental-maintainer family splits its input at the same
  * demo cut — `floor((max(id) + 1) * 0.8)` — and before this memo ~20
  * catalog entries each re-derived it with their own one-row
  * `agg(max(id)).head` action: a bounded driver action, but one extra
  * corpus scan per entry per bench rep for a constant that is fully
  * determined by (sfDir, table, pre-filter). The memo pays the scan
  * once per JVM per key and serves the literal thereafter.
  *
  * Key discipline (the ArtifactCache tag rule applied to a scalar): the
  * cache key must uniquely determine the VALUE. The sfDir pins the
  * input files (spec temp dirs are unique per test, so tests always
  * re-derive); the method pins the table, the id column, and any
  * pre-filter that could change the max — events cuts exist in a raw
  * and a `value IS NOT NULL` variant because a null-valued max-id event
  * would legitimately make them differ. Callers MUST use the variant
  * whose derivation matches what their oracle states.
  *
  * SELF-INVALIDATION (round 17, VERDICT r16 #5 / ADVICE r16 #3): sfDir
  * alone is only a content key while the files under it are immutable —
  * rewriting a table in place within one JVM would previously serve a
  * stale cut silently (only unique spec temp dirs protected tests). The
  * key now also carries the table's FILE SIGNATURE (file count, newest
  * modification time, total bytes — fs metadata, no data scan), so an
  * in-place rewrite re-derives automatically; [[invalidate]] remains as
  * the explicit hook mirroring `ArtifactCache.invalidate` for callers
  * that want deterministic eviction.
  *
  * 100 TB posture: max(id) over a snapshot is metadata-cheap in parquet
  * (row-group statistics serve it without a data scan) and the
  * signature is one directory listing per call — both metadata-plane;
  * the point of the memo is not the single scan's cost but not
  * multiplying it by catalog size × bench reps.
  */
object Cuts {
  private val cache =
    scala.collection.concurrent.TrieMap.empty[(String, String), Long]

  /** fs-metadata content signature of `$d/$table.parquet` (a file or a
    * parquet directory): (#children, max mtime, Σ length). Changes on
    * any in-place rewrite; costs one listStatus, never a data read.
    *
    * Session-free (round 17, post-review): the ArtifactCache tag
    * builders embed this signature so DERIVED artifacts (edge stores,
    * LSH/hash/posting indexes, sketch snapshots) invalidate on the same
    * in-place rewrite that re-derives the cut — half-fixing only the
    * cut would serve a FRESH cut against a STALE artifact, worse than
    * consistently stale. Tag builders have no SparkSession, and the
    * testdata/spec dirs are plain paths a default Hadoop Configuration
    * resolves; a missing table reads "absent" (stable — some spec tags
    * are built for planted dirs before/without every table). */
  private[graft] def tableSig(d: String, table: String): String =
    try {
      val p = new org.apache.hadoop.fs.Path(s"$d/$table.parquet")
      val fs = p.getFileSystem(new org.apache.hadoop.conf.Configuration())
      val st = fs.getFileStatus(p)
      if (st.isDirectory) {
        val kids = fs.listStatus(p)
        val mt = if (kids.isEmpty) 0L
          else kids.map(_.getModificationTime).max
        s"${kids.length}.$mt.${kids.map(_.getLen).sum}"
      } else s"1.${st.getModificationTime}.${st.getLen}"
    } catch { case _: Throwable => "absent" }

  private def sigOf(s: SparkSession, d: String, table: String): String =
    tableSig(d, table)

  private def cut80(s: SparkSession, d: String, table: String,
      key: String)(maxId: => Long): Long =
    cache.getOrElseUpdate((d, s"$key|${sigOf(s, d, table)}"),
      math.floor((maxId + 1) * 0.8).toLong)

  /** Explicitly drop every memoized cut under `d` (test/data-regeneration
    * paths; the signature in the key already makes in-place rewrites
    * self-invalidating, this is the deterministic-eviction twin —
    * superseded signature entries are also swept here, bounding the map
    * for a session that regenerates one dir many times). */
  private[graft] def invalidate(d: String): Unit =
    cache.keys.filter(_._1 == d).foreach(cache.remove)

  /** max(doc_id) over the documents table — also valid for any frame
    * that id-preservingly derives from it (the lazy shingle relation is
    * a pure per-row projection). */
  def documents(s: SparkSession, d: String): Long =
    cut80(s, d, "documents", "documents") {
      Tables.documents(s, d).agg(max(col("doc_id"))).head.getLong(0)
    }

  /** max(event_id) over the raw events table. */
  def events(s: SparkSession, d: String): Long =
    cut80(s, d, "events", "events") {
      Tables.events(s, d).agg(max(col("event_id"))).head.getLong(0)
    }

  /** max(event_id) over events with `value IS NOT NULL` — the winsorize/
    * z-score maintainers split AFTER dropping null measurements, so their
    * cut can differ from the raw-table cut when the max-id event carries
    * a null value. */
  def eventsValued(s: SparkSession, d: String): Long =
    cut80(s, d, "events", "events|value_not_null") {
      Tables.events(s, d).filter(col("value").isNotNull)
        .agg(max(col("event_id"))).head.getLong(0)
    }

  /** max(l_orderkey) over lineitem (the co-purchase graph family's cut). */
  def lineitem(s: SparkSession, d: String): Long =
    cut80(s, d, "lineitem", "lineitem") {
      Tables.lineitem(s, d).agg(max(col("l_orderkey"))).head.getLong(0)
    }

  /** max(vec_id) over the embeddings BASE set (vec_id >= 10 — ids below
    * 10 are the q44c query vectors, excluded from the index corpus, so
    * the cut derives from the base exactly as the entry states). */
  def embeddingsBase(s: SparkSession, d: String): Long =
    cut80(s, d, "embeddings", "embeddings|base_ge10") {
      Tables.embeddings(s, d).filter(col("vec_id") >= 10)
        .agg(max(col("vec_id"))).head.getLong(0)
    }
}
