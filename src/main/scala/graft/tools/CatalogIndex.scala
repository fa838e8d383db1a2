package graft.tools

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

/** Regenerates CATALOG.md — the navigable index of every catalog query
  * (VERDICT r11 #7: 200+ queries across 12 files are past hand-navigation):
  *
  *   sbt "runMain graft.tools.CatalogIndex"
  *
  * For each entry in SparkEntry.catalog it records the defining file:line
  * (located by scanning src for the unique `Q("name"` token — no runtime
  * reflection games), the bench-composition family (graft.Families, the
  * same classification the bench's metric line reports), and the oracle
  * kind (exact DuckDB SQL vs rows-only). Run at round-close after adding
  * queries; CatalogIndexSpec fails if the checked-in file is stale.
  */
object CatalogIndex {

  def locate(): Map[String, String] = {
    val root = Paths.get("src/main/scala/graft")
    val files = Files.walk(root).iterator().asScala
      .filter(p => p.toString.endsWith(".scala")).toSeq
    files.flatMap { p: Path =>
      val rel = p.toString
      Files.readAllLines(p).asScala.zipWithIndex.collect {
        case (line, i) if line.contains("Q(\"q") =>
          val name = line.substring(line.indexOf("Q(\"q") + 3)
            .takeWhile(_ != '"')
          name -> s"$rel:${i + 1}"
      }
    }.toMap
  }

  def render(): String = {
    val where = locate()
    val rows = graft.SparkEntry.catalog.sortBy(_.name).map { q =>
      val oracle = if (q.oracle.isDefined) "exact SQL" else "rows-only"
      s"| ${q.name} | ${graft.Families.of(q.name)} | $oracle | ${where.getOrElse(q.name, "?")} |"
    }
    val counts = graft.SparkEntry.catalog.groupBy(q => graft.Families.of(q.name))
      .view.mapValues(_.size).toMap
    val header = Seq(
      "# CATALOG — generated query index",
      "",
      "GENERATED FILE — do not edit by hand; regenerate with",
      "`sbt \"runMain graft.tools.CatalogIndex\"` (CatalogIndexSpec keeps",
      s"it honest). ${graft.SparkEntry.catalog.size} queries: " +
        s"${counts.getOrElse("batch", 0)} batch, " +
        s"${counts.getOrElse("stream", 0)} streaming, " +
        s"${counts.getOrElse("maint", 0)} maintainers",
      "(family semantics: see graft.Families and BASELINE.md).",
      "",
      "| query | family | oracle | where |",
      "|---|---|---|---|")
    (header ++ rows).mkString("", "\n", "\n")
  }

  def main(args: Array[String]): Unit = {
    Files.write(Paths.get("CATALOG.md"), render().getBytes("UTF-8"))
    println(s"CATALOG.md written: ${graft.SparkEntry.catalog.size} queries")
  }
}
