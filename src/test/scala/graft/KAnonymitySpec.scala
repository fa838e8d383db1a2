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

  test("DP count release: noise matches the inverse-CDF hand computation, " +
      "is reproducible, and the zero clamp post-processes") {
    // two segments; the noise for each is fully determined by its name
    val rows = (1 to 40).map(i => (i.toLong, s"c$i", 1, 0.0, "AA")) ++
      Seq((41L, "c41", 1, 0.0, "ZZ"))
    val dir = java.nio.file.Files.createTempDirectory("q154spec").toString
    rows.toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal",
        "c_mktsegment")
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")
    // reference implementation of the release formula, straight from the
    // mechanism definition (md5 first 8 hex → uniform → Laplace icdf)
    def release(seg: String, trueN: Long): Double = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s"dp1_$seg".getBytes("UTF-8"))
        .take(4).map("%02x".format(_)).mkString
      val u = (java.lang.Long.parseLong(hex, 16) + 1L) / 4294967297.0
      val noise = BigDecimal(-2.0 * math.signum(u - 0.5) *
        math.log(1.0 - 2.0 * math.abs(u - 0.5)))
        .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
      math.max(0.0, math.floor((trueN + noise) * 10000) / 10000)
    }
    val out = SparkEntry.queries("q154_dp_counts")(spark, dir)
      .as[(String, Double, Double)].collect().toList
    assert(out === List(
      ("AA", 0.5, release("AA", 40L)),
      ("ZZ", 0.5, release("ZZ", 1L))), out)
    // the release is nonzero noise (the draw isn't degenerate) and
    // reproducible run-to-run (no fresh randomness = no budget burn)
    assert(out.map(_._3) != List(40.0, 1.0))
    val again = SparkEntry.queries("q154_dp_counts")(spark, dir)
      .as[(String, Double, Double)].collect().toList
    assert(again === out)
    // clamp: a tag whose draw is a large negative noise on a tiny count
    // floors at 0 — verified against the reference formula directly
    val clamped = (1 to 200).map(i => s"S$i")
      .map(sgm => release(sgm, 1L))
    assert(clamped.forall(_ >= 0.0))
    assert(clamped.contains(0.0),
      "expected at least one of 200 single-row groups to clamp at 0")
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }
}
