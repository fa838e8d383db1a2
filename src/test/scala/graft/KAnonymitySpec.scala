package graft

import org.apache.spark.sql.functions._

/** q113: k-anonymity over the quasi-identifier generalization lattice. */
class KAnonymitySpec extends SparkSpec {
  import spark.implicits._

  test("k-anonymity report: hand-built lattice, all four cube levels") {
    // 8 customers: (nation 1, seg A) ×5, (1, B) ×1, (2, A) ×2.
    //  gid 0 (both released): classes 5/1/2 → k=1, 3 rows in classes <5
    //  gid 1 (nation only):   classes 6/2   → k=2, 2 rows at risk
    //  gid 2 (segment only):  classes 7/1   → k=1, 1 row at risk
    //  gid 3 (generalized):   class 8       → k=8, none
    val rows = (1 to 5).map(i => (i.toLong, s"c$i", 1, 0.0, "A")) ++
      Seq((6L, "c6", 1, 0.0, "B"), (7L, "c7", 2, 0.0, "A"),
        (8L, "c8", 2, 0.0, "A"))
    val dir = java.nio.file.Files.createTempDirectory("q113spec").toString
    rows.toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal",
        "c_mktsegment")
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")
    val out = SparkEntry.queries("q113_k_anonymity")(spark, dir)
      .as[(Long, Long, Long, Long, Double)].collect().toList
    assert(out === List(
      (0L, 3L, 1L, 3L, 0.375),
      (1L, 2L, 2L, 2L, 0.25),
      (2L, 2L, 1L, 1L, 0.125),
      (3L, 1L, 8L, 0L, 0.0)), out)
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }
}
