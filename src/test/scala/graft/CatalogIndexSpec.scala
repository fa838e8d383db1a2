package graft

import org.scalatest.funsuite.AnyFunSuite

/** CATALOG.md is generated (graft.tools.CatalogIndex); this spec fails
  * when it goes stale — every query added without regenerating the index
  * breaks the build instead of silently rotting the doc. No SparkSession
  * needed: the catalog Seq and the source scan are both session-free.
  */
class CatalogIndexSpec extends AnyFunSuite {

  test("every catalog query has a locatable definition site") {
    val where = graft.tools.CatalogIndex.locate()
    val missing = SparkEntry.catalog.map(_.name).filterNot(where.contains)
    assert(missing.isEmpty, s"unlocatable: $missing")
  }

  test("checked-in CATALOG.md matches a fresh regeneration") {
    val fresh = graft.tools.CatalogIndex.render()
    val onDisk = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("CATALOG.md")), "UTF-8")
    assert(onDisk == fresh,
      "CATALOG.md is stale — run `sbt \"runMain graft.tools.CatalogIndex\"`")
  }

  test("family classification covers every query with the three known " +
      "families and the maintainer set names real queries") {
    val names = SparkEntry.catalog.map(_.name).toSet
    SparkEntry.catalog.foreach { q =>
      assert(Set("batch", "stream", "maint")(Families.of(q.name)))
    }
    val ghosts = Families.maintSet.filterNot(names)
    assert(ghosts.isEmpty, s"maintSet names unknown queries: $ghosts")
  }
}
