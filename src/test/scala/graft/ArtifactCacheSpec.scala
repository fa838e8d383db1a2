package graft

import org.scalatest.funsuite.AnyFunSuite

/** The ArtifactCache content-tag contract (VERDICT r14 #3): a tag must
  * uniquely determine the artifact's content, so two builds under
  * DIFFERENT parameterizations must never cross-serve — the second
  * tag forces a rebuild — while an identical tag is served from the
  * memo. Pure JVM test (the memo is session-independent by design).
  */
class ArtifactCacheSpec extends AnyFunSuite {
  import graft.ops.ArtifactCache

  test("different tags on one table never cross-serve: a parameter " +
      "retune (the r13 8x4 -> 32x3 banding case) forces a rebuild") {
    val table = s"artifact_cache_spec_${System.nanoTime()}"
    var builds = List.empty[String]
    def build(params: String): Unit =
      ArtifactCache.once(table, Some(s"dirA|documents|$params")) {
        builds ::= params
      }
    build("mh8x8x4");  assert(builds == List("mh8x8x4"))
    // same tag -> memo hit, no rebuild
    build("mh8x8x4");  assert(builds == List("mh8x8x4"))
    // re-tuned banding -> different tag -> MUST rebuild, not serve stale
    build("mh96x32x3")
    assert(builds == List("mh96x32x3", "mh8x8x4"))
    // flipping back is ALSO a rebuild (the memo holds one generation —
    // the table on disk now has the 96x32x3 content)
    build("mh8x8x4")
    assert(builds == List("mh8x8x4", "mh96x32x3", "mh8x8x4"))
  }

  test("the LSH tag family encodes the banding scheme, so a constants " +
      "retune changes every tag (the contract the shared indexes rely on)") {
    // private tags surfaced via the package-private accessors
    val tags = Seq(
      graft.ops.TextOps.corpusLshPairsTag("/x").get,
      graft.ops.TextOps.fullLshIndexTag("/x").get,
      graft.ops.TextOps.snapshotLshTag("/x").get)
    tags.foreach { t =>
      assert(t.contains("mh96x32x3"),
        s"tag '$t' does not pin the MinHash banding parameters — a " +
          "runtime retune would silently serve a stale index")
    }
  }

  test("artifact tags embed the source table's file signature, so an " +
      "in-place rewrite invalidates DERIVED artifacts too — not just " +
      "the cut memo (round 17: a fresh cut against a stale edge store " +
      "would be worse than consistently stale)") {
    // the signature is fs-METADATA (count/mtime/bytes), so plain files
    // exercise it — no SparkSession needed in this pure-JVM suite
    import java.nio.file.{Files, Paths}
    val dir = Files.createTempDirectory("graft_tag_sig").toString
    Files.createDirectories(Paths.get(s"$dir/lineitem.parquet"))
    Files.write(Paths.get(s"$dir/lineitem.parquet/part-0"),
      Array.fill(50)('x'.toByte))
    val t1 = graft.ops.GraphOps.edgeTag(dir).get
    // same tag while the files are untouched (the memo must still hit)
    assert(graft.ops.GraphOps.edgeTag(dir).get == t1)
    Files.write(Paths.get(s"$dir/lineitem.parquet/part-0"),
      Array.fill(500)('x'.toByte))
    val t2 = graft.ops.GraphOps.edgeTag(dir).get
    assert(t2 != t1,
      "in-place rewrite did not change the artifact tag — " +
        "ArtifactCache would serve a stale edge store against a fresh cut")
    // a missing table reads a stable sentinel, never throws (spec tags
    // are sometimes built against dirs that lack unrelated tables)
    assert(graft.ops.TextOps.snapshotLshTag("/nonexistent").get
      .contains("documents@absent"))
  }

  test("the file signature is per-file and recursive (ADVICE r17 #2): " +
      "an equal-stat rename and a one-level-deeper rewrite both change " +
      "it — the cases the old (#children, max mtime, sum bytes) " +
      "aggregate served stale through") {
    import java.nio.file.{Files, Paths}
    import java.nio.file.attribute.FileTime
    val dir = Files.createTempDirectory("graft_tag_sig_rec").toString
    val tbl = Paths.get(s"$dir/documents.parquet")
    Files.createDirectories(tbl)
    val f0 = tbl.resolve("part-0")
    Files.write(f0, Array.fill(50)('x'.toByte))
    val mt = FileTime.fromMillis(1700000000000L)
    Files.setLastModifiedTime(f0, mt)
    val sig1 = graft.schema.Cuts.tableSig(dir, "documents")
    // RENAME preserving count, bytes, and mtime: the aggregate signature
    // was blind to this; the per-file listing is not
    Files.move(f0, tbl.resolve("part-1"))
    Files.setLastModifiedTime(tbl.resolve("part-1"), mt)
    val sig2 = graft.schema.Cuts.tableSig(dir, "documents")
    assert(sig2 != sig1, "equal-stat rename did not change the signature")
    // NESTED rewrite (partitioned layout): change a file one level down
    // while the immediate children's own stats stay fixed
    val part = tbl.resolve("shard=0")
    Files.createDirectories(part)
    Files.write(part.resolve("part-0"), Array.fill(10)('y'.toByte))
    // pin the nested file's mtime to the SAME fixed stamp before and
    // after the rewrite, so the signature change below is attributable
    // to the LENGTH alone (a stat the old top-level aggregate also
    // missed when total bytes balanced out)
    Files.setLastModifiedTime(part.resolve("part-0"), mt)
    val sig3 = graft.schema.Cuts.tableSig(dir, "documents")
    Files.write(part.resolve("part-0"), Array.fill(99)('y'.toByte))
    Files.setLastModifiedTime(part.resolve("part-0"), mt)
    val sig4 = graft.schema.Cuts.tableSig(dir, "documents")
    assert(sig4 != sig3, "nested rewrite did not change the signature")
  }

  test("a None tag disables the memo: every call builds") {
    val table = s"artifact_cache_spec_none_${System.nanoTime()}"
    var n = 0
    ArtifactCache.once(table, None) { n += 1 }
    ArtifactCache.once(table, None) { n += 1 }
    assert(n == 2)
  }

  test("invalidate drops the memo for one table only") {
    val t1 = s"artifact_cache_spec_inv1_${System.nanoTime()}"
    val t2 = s"artifact_cache_spec_inv2_${System.nanoTime()}"
    var n1 = 0; var n2 = 0
    ArtifactCache.once(t1, Some("t")) { n1 += 1 }
    ArtifactCache.once(t2, Some("t")) { n2 += 1 }
    ArtifactCache.invalidate(t1)
    ArtifactCache.once(t1, Some("t")) { n1 += 1 }
    ArtifactCache.once(t2, Some("t")) { n2 += 1 }
    assert(n1 == 2 && n2 == 1)
  }
}
