package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Store schema evolution — a 100 TB training-data store accretes columns
  * over months of pipeline versions; old partitions must stay readable
  * next to new ones without a rewrite.
  *
  *  - `mergeSchema` unifies generations at read time (old rows null-fill
  *    new columns);
  *  - a pinned read schema (the engine's default posture, SURVEY §1.2)
  *    reads BOTH generations: new columns null on old files, dropped
  *    columns simply unselected — so deploying a new schema version never
  *    requires rewriting history.
  */
class SchemaEvolutionSpec extends SparkSpec {
  import spark.implicits._

  private def writeGenerations(): String = {
    val dir = Files.createTempDirectory("graft_evolve").toString + "/store"
    // generation 1: (doc_id, text)
    Seq((1L, "alpha"), (2L, "beta")).toDF("doc_id", "text")
      .write.mode("append").parquet(dir)
    // generation 2 adds a quality score
    Seq((3L, "gamma", 0.9), (4L, "delta", 0.5))
      .toDF("doc_id", "text", "quality")
      .write.mode("append").parquet(dir)
    dir
  }

  test("mergeSchema unifies generations; old rows null-fill new columns") {
    val dir = writeGenerations()
    val df = spark.read.option("mergeSchema", true).parquet(dir)
    assert(df.columns.sorted.toSeq === Seq("doc_id", "quality", "text"))
    val byId = df.collect().map(r =>
      r.getLong(r.fieldIndex("doc_id")) ->
        (if (r.isNullAt(r.fieldIndex("quality"))) None
         else Some(r.getDouble(r.fieldIndex("quality"))))).toMap
    assert(byId === Map(1L -> None, 2L -> None,
      3L -> Some(0.9), 4L -> Some(0.5)))
  }

  test("a pinned read schema reads both generations without a rewrite") {
    val dir = writeGenerations()
    val pinned = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("quality",
        org.apache.spark.sql.types.DoubleType)))
    val df = spark.read.schema(pinned).parquet(dir)
    assert(df.count() === 4)
    assert(df.filter(col("quality").isNull).count() === 2)
    // aggregation over the evolved column works across generations
    val avg = df.agg(round(org.apache.spark.sql.functions.avg("quality"), 2))
      .head().getDouble(0)
    assert(avg === 0.7)
  }
}
