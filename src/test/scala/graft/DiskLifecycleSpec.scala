package graft

/** Long-lived-session DISK residency (round 17, VERDICT r16 #4) — the
  * on-disk twin of CacheLifecycleSpec: a session composing the catalog
  * repeatedly must not accrete scratch stores, stream checkpoints, or
  * versioned-store version directories run over run. The mechanisms are
  * TempDirs' generational sweep (a prefix's previous dir is deleted
  * when its next dir is acquired — safe under the sequential-catalog
  * one-live-generation contract) and the serve-time retention vacuum on
  * drained streams' versioned stores; this spec is the assertion.
  */
class DiskLifecycleSpec extends SparkSpec {

  // one representative per scratch-owning shape: batch roundtrip store
  // (q167), layout maintenance store (q133), versioned time travel
  // (q122), streaming sink store + foreachBatch checkpoint (q63),
  // versioned CDC stream store (q112), slot-store stream (q188),
  // memory-sink stream checkpoint (q61)
  private val names = Seq(
    "q167_orc_roundtrip", "q133_zorder_maintain", "q122_time_travel",
    "q63_stream_upsert", "q112_stream_cdc_upsert",
    "q188_stream_bm25_serve", "q61_stream_window_agg")

  private val tmp = new java.io.File(
    System.getProperty("java.io.tmpdir"))

  private def graftDirCount(): Int =
    tmp.listFiles().count(f => f.isDirectory &&
      f.getName.startsWith("graft_"))

  test("repeated catalog runs do not accrete scratch dirs: tmpdir " +
      "footprint after pass 2 equals pass 1 (generational TempDirs)") {
    val sf = "/root/testdata/sf0.001"
    def pass(): Int = {
      names.foreach { n =>
        SparkEntry.queries(n)(spark, sf)
          .write.mode("overwrite").format("noop").save()
      }
      graftDirCount()
    }
    val after1 = pass()
    val after2 = pass()
    val after3 = pass()
    // each prefix keeps exactly ONE live generation: pass 2 acquires a
    // fresh dir per prefix and deletes pass 1's, so the count is flat.
    // (<=, not ==, for the same reason as CacheLifecycleSpec: unrelated
    // suites' exit hooks may remove dirs concurrently — only growth is
    // a leak signal.)
    assert(after2 <= after1 && after3 <= after2,
      s"scratch-dir footprint grew across passes: $after1 -> $after2 " +
        s"-> $after3 (a TempDirs site is missing the generational sweep)")
  }

  test("a drained stream's versioned store is retention-vacuumed at the " +
      "serve handoff: at most keepLast=2 version dirs survive") {
    val sf = "/root/testdata/sf0.001"
    SparkEntry.queries("q112_stream_cdc_upsert")(spark, sf)
      .write.mode("overwrite").format("noop").save()
    // the live cdc store is the single current generation of its prefix
    val stores = tmp.listFiles().filter(f => f.isDirectory &&
      f.getName.startsWith("graft_cdc_store"))
    assert(stores.nonEmpty, "no live cdc store found")
    val newest = stores.maxBy(_.lastModified())
    val versions = newest.listFiles().count(_.getName.matches("v\\d+"))
    assert(versions <= 2,
      s"versioned store not vacuumed at serve: $versions version dirs " +
        s"under ${newest.getName}")
  }
}
