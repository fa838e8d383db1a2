package graft

import graft.ops.LayoutOps
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

class LayoutSpec extends SparkSpec {
  import spark.implicits._

  test("zOrder2 matches a reference Morton interleave bit-for-bit") {
    def morton(a: Long, b: Long, bits: Int): Long =
      (0 until bits).foldLeft(0L)((acc, i) =>
        acc | (((a >> i) & 1L) << (2 * i)) | (((b >> i) & 1L) << (2 * i + 1)))
    val cases = Seq((0L, 0L), (1L, 0L), (0L, 1L), (255L, 255L),
      (65535L, 0L), (12345L, 54321L), (40000L, 7L))
    val got = cases.toDF("a", "b")
      .select(LayoutOps.zOrder2(col("a"), col("b"), 16).as("z"))
      .as[Long].collect().toSeq
    assert(got == cases.map { case (a, b) => morton(a, b, 16) })
  }

  test("z-ordered layout: the 2-D box scan reads a fraction of the rows " +
      "a shuffled layout reads, with identical results") {
    val dir = java.nio.file.Files.createTempDirectory("zorder_spec").toString
    // 256×256 grid; box = the 32×32 corner (1/64 of the data)
    val grid = spark.range(0, 65536L)
      .select((col("id") % 256).as("x"), (col("id") / 256).as("y"))
    LayoutOps.zOrderWrite(grid, "x", "y", bits = 8, nFiles = 16,
      path = s"$dir/z")
    // control: same rows, layout deliberately decorrelated from (x, y)
    grid.withColumn("r", xxhash64(col("x"), col("y")))
      .repartitionByRange(16, col("r")).sortWithinPartitions(col("r"))
      .drop("r").write.mode("overwrite").parquet(s"$dir/rand")
    def scanRows(path: String): (Long, Long) = {
      val df = spark.read.parquet(path)
        .filter(col("x") < 32 && col("y") < 32)
      val n = df.count()
      val read = df.queryExecution.executedPlan.collect {
        case f: FileSourceScanExec => f.metrics("numOutputRows").value
      }.sum
      (n, read)
    }
    val (nZ, readZ) = scanRows(s"$dir/z")
    val (nR, readR) = scanRows(s"$dir/rand")
    assert(nZ == 1024 && nR == 1024) // result parity
    // the z layout confines the box to few files; row-group stats prune
    // the rest. The shuffled layout's per-file (x, y) ranges all overlap
    // the box, so nothing prunes.
    assert(readZ * 2 <= readR,
      s"z-layout read $readZ rows vs shuffled $readR — no pruning win")
    assert(readZ <= 16384, s"box scan read $readZ rows from the z layout")
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }

  test("compaction: exact target file count, byte-equal content, and a " +
      "shuffle-free plan") {
    val dir = java.nio.file.Files.createTempDirectory("compact_spec").toString
    val df = spark.range(0, 50000L)
      .select(col("id"), (col("id") * 7 % 101).as("v"))
    df.repartition(40).write.mode("overwrite").parquet(s"$dir/frag")
    def files(p: String) = new java.io.File(p).listFiles
      .count(_.getName.endsWith(".parquet"))
    assert(files(s"$dir/frag") == 40)
    val n = LayoutOps.compactStore(spark, s"$dir/frag",
      targetRowsPerFile = 20000L, outPath = s"$dir/tight")
    assert(n == 3 && files(s"$dir/tight") == 3)
    // content parity both directions
    val a = spark.read.parquet(s"$dir/frag")
    val b = spark.read.parquet(s"$dir/tight")
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
    // the compaction plan is coalesce-over-scan: NO exchange anywhere —
    // the whole point vs a repartition-based rewrite
    val plan = spark.read.parquet(s"$dir/frag").coalesce(3)
      .queryExecution.executedPlan
    val exchanges = plan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }
    assert(exchanges.isEmpty, s"compaction plan shuffled: $plan")
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }

  test("shard manifest: signature is order-invariant, and any dropped or " +
      "corrupted row flips exactly its shard's signature") {
    val docs = (0L until 64L).map(i => (i, s"doc text number $i"))
      .toDF("doc_id", "text")
    def manifest(df: org.apache.spark.sql.DataFrame) = df
      .withColumn("shard", col("doc_id") % 8)
      .withColumn("sig",
        expr("CAST(conv(substr(md5(concat(doc_id, ':', text)), 1, 15)," +
          " 16, 10) AS BIGINT)"))
      .groupBy(col("shard"))
      .agg(expr("bit_xor(sig)").as("content_sig"),
        count(lit(1)).as("n_rows"))
    val base = manifest(docs).collect().map(r =>
      r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // order/partitioning invariance: xor needs no sort to reproduce
    val shuffled = manifest(docs.repartition(7, col("text"))
      .orderBy(col("text"))).collect().map(r =>
      r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(shuffled === base)
    // corruption: one flipped char in doc 9 → ONLY shard 1's sig changes
    val tampered = manifest(docs.withColumn("text",
      when(col("doc_id") === 9L, lit("doc text number X"))
        .otherwise(col("text")))).collect().map(r =>
      r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(tampered(1L)._1 !== base(1L)._1)
    assert((0L until 8L).filter(_ != 1L)
      .forall(sh => tampered(sh) === base(sh)))
    // drop: losing doc 10 changes shard 2's count AND signature
    val dropped = manifest(docs.filter(col("doc_id") =!= 10L))
      .collect().map(r =>
        r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(dropped(2L)._2 === base(2L)._2 - 1)
    assert(dropped(2L)._1 !== base(2L)._1)
  }

  test("incremental z-order maintenance rewrites ONLY touched range " +
      "partitions (others byte-identical) with full-content parity") {
    val dir = java.nio.file.Files.createTempDirectory("zmaint_spec").toString
    val grid = spark.range(0, 4096L)
      .selectExpr("id % 1024 AS k", "id div 7 % 64 AS v")
    val isInc = col("k") < 256 // increment = key range [0, 256) → part 0
    LayoutOps.zOrderWriteBucketed(grid.filter(!isInc), "k", "k", "v",
      bits = 10, path = s"$dir/store")
    def dirDigests(): Map[String, Seq[(String, String)]] =
      new java.io.File(s"$dir/store").listFiles.filter(_.isDirectory)
        .map { d =>
          d.getName -> d.listFiles.filter(_.getName.endsWith(".parquet"))
            .sortBy(_.getName).toSeq.map { f =>
              val md = java.security.MessageDigest.getInstance("MD5")
              f.getName -> md.digest(
                java.nio.file.Files.readAllBytes(f.toPath))
                .map("%02x".format(_)).mkString
            }
        }.toMap
    val before = dirDigests()
    assert(before.keySet == Set("part_range=1", "part_range=2",
      "part_range=3"))
    LayoutOps.zOrderMaintain(spark, s"$dir/store", grid.filter(isInc),
      "k", "k", "v", bits = 10)
    val after = dirDigests()
    // new partition materialized; every pre-existing one untouched
    assert(after.keySet ==
      Set("part_range=0", "part_range=1", "part_range=2", "part_range=3"))
    for (p <- before.keySet)
      assert(after(p) == before(p), s"$p was rewritten by maintenance")
    // content parity with the source, both directions
    val got = spark.read.parquet(s"$dir/store").select(col("k"), col("v"))
    assert(got.exceptAll(grid).isEmpty && grid.exceptAll(got).isEmpty)
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }
}
