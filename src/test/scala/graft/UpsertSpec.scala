package graft

import graft.ops.Upsert
import org.apache.spark.sql.functions._

class UpsertSpec extends SparkSpec {
  import spark.implicits._

  // FIXTURES.md §2 golden scenario: store {A,B}; batch {B′,C} → {A, B, C}
  // with B keeping its ORIGINAL (store) payload.
  test("keep-first: existing rows beat incoming on key collision") {
    val existing = Seq(("A", "a-old"), ("B", "b-old")).toDF("k", "v")
    val incoming = Seq(("B", "b-new"), ("C", "c-new")).toDF("k", "v")
    val out = Upsert.keepFirst(existing, incoming, Seq("k"), Seq(col("v")))
      .orderBy("k").as[(String, String)].collect().toSeq
    assert(out == Seq(("A", "a-old"), ("B", "b-old"), ("C", "c-new")))
  }

  test("keep-first: first occurrence wins within the incoming batch") {
    val existing = spark.emptyDataset[(Int, String, String)]
      .toDF("k", "v", "pos")
    val incoming = Seq((1, "first", "p1"), (1, "second", "p2"))
      .toDF("k", "v", "pos")
    val out = Upsert.keepFirst(existing, incoming, Seq("k"), Seq(col("pos")))
      .select("v").as[String].collect().toSeq
    assert(out == Seq("first"))
  }

  test("insertIfAbsent ≡ keepFirst when incoming is unique per key") {
    val existing = Seq((1, "old1"), (3, "old3")).toDF("k", "v")
    val incoming = Seq((2, "new2"), (3, "new3")).toDF("k", "v")
    val a = Upsert.insertIfAbsent(existing, incoming, Seq("k"))
      .orderBy("k").as[(Int, String)].collect().toSeq
    val b = Upsert.keepFirst(existing, incoming, Seq("k"), Seq(col("k")))
      .orderBy("k").as[(Int, String)].collect().toSeq
    assert(a == b && a == Seq((1, "old1"), (2, "new2"), (3, "old3")))
  }

  test("partitionedUpsert rewrites only touched partitions") {
    val store = java.nio.file.Files
      .createTempDirectory("graft_part_store").toString
    val seed = Seq((1, "a-v1", "p1"), (2, "b-v1", "p1"), (3, "c-v1", "p2"))
      .toDF("k", "v", "p")
    Upsert.partitionedUpsert(spark, store, seed, Seq("k"), "p", Seq(col("v")))

    def fileStates(part: String) = new java.io.File(s"$store/p=$part")
      .listFiles().filter(_.getName.endsWith(".parquet"))
      .map(f => (f.getName, f.lastModified)).toSet
    val p1Before = fileStates("p1")

    // incoming touches only p2: k=3 collides (existing wins), k=4 is new
    val incoming = Seq((3, "c-v2", "p2"), (4, "d-v1", "p2"))
      .toDF("k", "v", "p")
    Upsert.partitionedUpsert(spark, store, incoming, Seq("k"), "p",
      Seq(col("v")))

    // untouched partition: exact same files, byte-for-byte untouched
    assert(fileStates("p1") == p1Before)
    val out = spark.read.parquet(store)
      .orderBy("k").as[(Int, String, String)].collect().toSeq
    assert(out == Seq((1, "a-v1", "p1"), (2, "b-v1", "p1"),
      (3, "c-v1", "p2"), (4, "d-v1", "p2")))
  }

  // property-style: seeded random trials (scalacheck-scalatest bridge is not
  // in the offline dep set; the invariants are what matters)
  test("property: upsert is idempotent, keys unique, row counts bounded") {
    val rng = new scala.util.Random(42)
    for (_ <- 1 to 15) {
      val oldKeys = List.fill(rng.nextInt(20))(rng.nextInt(15)).distinct
      val newKeys = List.fill(rng.nextInt(20))(rng.nextInt(15))
      val existing = oldKeys.map(k => (k, s"old$k")).toDF("k", "v")
      val incoming = newKeys.map(k => (k, s"new$k")).toDF("k", "v")
      val once = Upsert.keepFirst(existing, incoming, Seq("k"), Seq(col("v")))
      val twice = Upsert.keepFirst(once, incoming, Seq("k"), Seq(col("v")))
      val n1 = once.count()
      // key-uniqueness invariant
      assert(once.select("k").distinct().count() == n1)
      // bounds: max(|old|,|new distinct|) ≤ |final| ≤ |old ∪ new|
      assert(n1 >= (oldKeys.size max newKeys.distinct.size).toLong)
      assert(n1 == (oldKeys ++ newKeys).distinct.size.toLong)
      // idempotence: re-upserting the same batch changes nothing
      assert(twice.orderBy("k", "v").collect().toSeq ==
        once.orderBy("k", "v").collect().toSeq)
    }
  }

  test("applyChangelog: latest-op-per-key wins; I/U/D golden case") {
    val snap = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
    val changes = Seq(
      (2L, "b2", "U", 1L),   // superseded by the seq-2 delete below
      (2L, "b2", "D", 2L),   // delete key 2
      (3L, "c1", "U", 1L),
      (3L, "c2", "U", 2L),   // latest update wins
      (4L, "d", "I", 1L))    // fresh insert
      .toDF("k", "v", "op", "seq")
    val out = Upsert.applyChangelog(snap, changes, Seq("k"), "op", "seq")
      .orderBy("k").as[(Long, String)].collect().toSeq
    assert(out == Seq((1L, "a"), (3L, "c2"), (4L, "d")))
  }

  test("applyChangelog is idempotent under changelog replay") {
    val snap = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    val changes = Seq((1L, "a9", "U", 5L), (2L, "x", "D", 9L))
      .toDF("k", "v", "op", "seq")
    val once = Upsert.applyChangelog(snap, changes, Seq("k"), "op", "seq")
    val twice = Upsert.applyChangelog(once, changes, Seq("k"), "op", "seq")
    assert(once.orderBy("k").collect().toSeq ==
      twice.orderBy("k").collect().toSeq)
  }

  test("versioned changelog store: a RETRIED micro-batch rewrites its own " +
      "version instead of double-applying (q112's replay contract)") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_cdc_spec").toString
    def read(v: Long) = spark.read.parquet(s"$root/v$v")
      .orderBy("k").as[(Long, String)].collect().toSeq
    // seed snapshot = v0
    Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
      .write.mode("overwrite").parquet(s"$root/v0")
    val batch0 = Seq((1L, "", "D", 1L), (2L, "b2", "U", 1L),
      (9L, "i", "I", 1L)).toDF("k", "v", "op", "seq")
    Upsert.applyChangelogVersioned(spark, root, batch0,
      Seq("k"), "op", "seq", batchId = 0L)
    val afterBatch0 = read(1L)
    assert(afterBatch0 == Seq((2L, "b2"), (3L, "c"), (9L, "i")))
    // REPLAY batch 0: must re-derive v1 from v0 (the latest version ≤ 0),
    // not from v1 — content unchanged, no phantom version
    Upsert.applyChangelogVersioned(spark, root, batch0,
      Seq("k"), "op", "seq", batchId = 0L)
    assert(read(1L) == afterBatch0)
    assert(Upsert.latestVersionPath(spark, root) == s"$root/v1")
    // next batch deletes the batch-0 insert — builds on v1
    val batch1 = Seq((9L, "", "D", 1L)).toDF("k", "v", "op", "seq")
    Upsert.applyChangelogVersioned(spark, root, batch1,
      Seq("k"), "op", "seq", batchId = 1L)
    assert(read(2L) == Seq((2L, "b2"), (3L, "c")))
    assert(Upsert.latestVersionPath(spark, root) == s"$root/v2")
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
  }

  test("atomic publish: a crashed batch's partial version dir (no _SUCCESS) " +
      "is invisible to reads and healed by the retry (VERDICT r13 #1)") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_crash_spec").toString
    Seq((1L, "a"), (2L, "b")).toDF("k", "v")
      .write.mode("overwrite").parquet(s"$root/v0")
    Upsert.applyChangelogVersioned(spark, root,
      Seq((2L, "b2", "U", 1L)).toDF("k", "v", "op", "seq"),
      Seq("k"), "op", "seq", batchId = 0L)
    assert(Upsert.latestVersionPath(spark, root) == s"$root/v1")
    // simulate a crash mid-write of v2: real parquet data landed but the
    // job died before commit — no _SUCCESS marker. (Write it whole, then
    // strip the marker: same observable state as a task-level crash.)
    Seq((99L, "garbage")).toDF("k", "v")
      .write.mode("overwrite").parquet(s"$root/v2")
    val marker = new java.io.File(s"$root/v2/_SUCCESS")
    assert(marker.exists()); assert(marker.delete())
    // the partial v2 must not be servable as newest, nor time-travelable
    assert(Upsert.latestVersionPath(spark, root) == s"$root/v1")
    assert(Upsert.versionPathAsOf(spark, root, 5L) == s"$root/v1")
    // the RETRIED batch 1 derives its base from committed v1 (not the
    // garbage), clobbers the residue, and publishes v2 atomically
    Upsert.applyChangelogVersioned(spark, root,
      Seq((3L, "c", "I", 1L)).toDF("k", "v", "op", "seq"),
      Seq("k"), "op", "seq", batchId = 1L)
    assert(Upsert.latestVersionPath(spark, root) == s"$root/v2")
    assert(spark.read.parquet(s"$root/v2").orderBy("k")
      .as[(Long, String)].collect().toSeq ==
      Seq((1L, "a"), (2L, "b2"), (3L, "c")))
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
  }

  test("vacuum retention: keeps newest-N plus pins, sweeps the rest " +
      "(including uncommitted residue), and a pruned asOf fails loudly " +
      "(q205, VERDICT r13 #7)") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_vacuum_spec").toString
    Seq((1L, "a")).toDF("k", "v")
      .write.mode("overwrite").parquet(s"$root/v0")
    for (b <- 0L to 2L)
      Upsert.applyChangelogVersioned(spark, root,
        Seq((10L + b, s"x$b", "I", 1L)).toDF("k", "v", "op", "seq"),
        Seq("k"), "op", "seq", batchId = b)
    // plant an uncommitted residue dir too — vacuum must sweep it
    Seq((99L, "junk")).toDF("k", "v")
      .write.mode("overwrite").parquet(s"$root/v9")
    assert(new java.io.File(s"$root/v9/_SUCCESS").delete())
    val retained = Upsert.vacuumVersions(spark, root, keepLast = 2,
      pinned = Set(1L))
    assert(retained == Seq(1L, 2L, 3L))
    assert(!new java.io.File(s"$root/v0").exists())
    assert(!new java.io.File(s"$root/v9").exists())
    // retained versions still read exactly
    assert(spark.read.parquet(Upsert.versionPathAsOf(spark, root, 1L))
      .count() == 2) // v0's row + batch 0's insert
    assert(Upsert.latestVersionPath(spark, root) == s"$root/v3")
    // pruned asOf = loud, specific failure — never a silent mis-resolve
    val e = intercept[IllegalArgumentException] {
      Upsert.versionPathAsOf(spark, root, 0L)
    }
    assert(e.getMessage.contains("pruned") ||
      e.getMessage.contains("no committed version"))
    // a pin naming a non-committed version fails LOUDLY up front
    // (ADVICE r14 #3) — the reproducibility anchor it was meant to
    // protect does not exist, and nothing is deleted on the way out
    val before = new java.io.File(root).list().sorted.toSeq
    val ePin = intercept[IllegalArgumentException] {
      Upsert.vacuumVersions(spark, root, keepLast = 1, pinned = Set(42L))
    }
    assert(ePin.getMessage.contains("42"))
    assert(new java.io.File(root).list().sorted.toSeq === before,
      "a rejected vacuum must not have deleted anything")
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
  }

  test("time travel: versionPathAsOf resolves the newest version ≤ asOf " +
      "and versionDiff reports added/changed/deleted (q122)") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_tt_spec").toString
    Seq((1L, 10.0), (2L, 20.0), (3L, 30.0)).toDF("k", "v")
      .write.mode("overwrite").parquet(s"$root/v0")
    // batch 0: delete 1, change 2; batch 1: insert 9
    Upsert.applyChangelogVersioned(spark, root,
      Seq((1L, 0.0, "D", 1L), (2L, 25.0, "U", 1L)).toDF("k", "v", "op", "seq"),
      Seq("k"), "op", "seq", batchId = 0L)
    Upsert.applyChangelogVersioned(spark, root,
      Seq((9L, 90.0, "I", 1L)).toDF("k", "v", "op", "seq"),
      Seq("k"), "op", "seq", batchId = 1L)
    // as-of reads: version 0 still shows the pre-batch world; a "gap"
    // asOf between existing versions resolves downward
    assert(Upsert.versionPathAsOf(spark, root, 0L) == s"$root/v0")
    assert(Upsert.versionPathAsOf(spark, root, 1L) == s"$root/v1")
    assert(spark.read.parquet(Upsert.versionPathAsOf(spark, root, 0L))
      .count() == 3)
    val d01 = Upsert.versionDiff(
      spark.read.parquet(s"$root/v0"), spark.read.parquet(s"$root/v1"),
      "k", "v").orderBy("change")
      .as[(String, Long, Double)].collect().toSeq
    assert(d01 == Seq(("added", 0L, 0.0), ("changed", 1L, 5.0),
      ("deleted", 1L, -10.0)))
    val d12 = Upsert.versionDiff(
      spark.read.parquet(s"$root/v1"), spark.read.parquet(s"$root/v2"),
      "k", "v").orderBy("change")
      .as[(String, Long, Double)].collect().toSeq
    assert(d12 == Seq(("added", 1L, 90.0), ("changed", 0L, 0.0),
      ("deleted", 0L, 0.0)))
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
  }
}
