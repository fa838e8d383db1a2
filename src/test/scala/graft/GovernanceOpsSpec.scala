package graft

import graft.expr.Crypto
import org.apache.spark.sql.functions._

/** Governance/ops additions: data-contract validation (q118),
  * ANALYZE-style stats collection (q124), encryption key rotation (q120).
  */
class GovernanceOpsSpec extends SparkSpec {
  import spark.implicits._

  test("data contract: every rule counts exactly its planted violation") {
    val dir = java.nio.file.Files.createTempDirectory("q118spec").toString
    val ts = java.sql.Timestamp.valueOf("1996-06-01 00:00:00")
    val late = java.sql.Timestamp.valueOf("2002-01-01 00:00:00")
    // 8 rows, one violation per rule: dup key, enum 'X', price 500k,
    // 2002 date, null key, orphan custkey 99, priority 'BOGUS'
    Seq(
      (Some(1L), 1L, "O", 100.0, ts, "1-URGENT"),
      (Some(1L), 1L, "F", 200.0, ts, "5-LOW"),
      (Some(2L), 1L, "X", 300.0, ts, "2-HIGH"),
      (Some(3L), 1L, "O", 500000.0, ts, "3-MEDIUM"),
      (Some(4L), 1L, "F", 400.0, late, "4-NOT SPECIFIED"),
      (None, 1L, "O", 10.0, ts, "5-LOW"),
      (Some(5L), 99L, "O", 10.0, ts, "5-LOW"),
      (Some(6L), 1L, "O", 10.0, ts, "BOGUS"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    Seq((1L, "c1", 1, 0.0, "A"), (99L + 1, "c2", 1, 0.0, "B"))
      .toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")
    val out = SparkEntry.queries("q118_data_contract")(spark, dir)
      .as[(String, Long, Long, Boolean)].collect().toList
    assert(out == List(
      ("custkey_fk", 8L, 1L, false),
      ("orderdate_range", 8L, 1L, false),
      ("orderkey_not_null", 8L, 1L, false),
      ("orderkey_unique", 8L, 1L, false),
      ("priority_enum", 8L, 1L, false),
      ("status_enum", 8L, 1L, false),
      ("totalprice_range", 8L, 1L, false)), out)
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }

  test("streaming contract gate ≡ batch report on the additive rules " +
      "(q126 vs q118)") {
    val dir = java.nio.file.Files.createTempDirectory("q126spec").toString
    val ts = java.sql.Timestamp.valueOf("1996-06-01 00:00:00")
    // the streaming file source globs the testdata's SINGLE-FILE layout
    // (orders.parquet is a file, not a directory) — write-then-move
    val staging = s"$dir/_orders"
    Seq(
      (Some(1L), 1L, "O", 100.0, ts, "1-URGENT"),
      (Some(2L), 1L, "X", 300.0, ts, "2-HIGH"),
      (Some(3L), 99L, "O", 500000.0, ts, "BOGUS"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .coalesce(1).write.parquet(staging)
    val part = new java.io.File(staging).listFiles()
      .find(_.getName.endsWith(".parquet")).get
    java.nio.file.Files.move(part.toPath,
      java.nio.file.Paths.get(s"$dir/orders.parquet"))
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(staging))
    Seq((1L, "c1", 1, 0.0, "A"))
      .toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")
    val streamed = SparkEntry.queries("q126_stream_contract_gate")(spark, dir)
      .as[(String, Long, Long, Boolean)].collect().toList
    val batch = SparkEntry.queries("q118_data_contract")(spark, dir)
      .as[(String, Long, Long, Boolean)].collect().toList
      .filterNot(_._1 == "orderkey_unique")
    assert(streamed == batch, s"stream=$streamed batch=$batch")
    assert(streamed.exists(r => r._1 == "custkey_fk" && r._3 == 1L))
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }

  test("stats collection: nulls, exact NDV, typed min/max per column") {
    val dir = java.nio.file.Files.createTempDirectory("q124spec").toString
    Seq(
      (1L, Some(1.0), Some(0.0), 10.0, Some("A"), Some("X")),
      (2L, Some(1.0), Some(0.1), 20.0, Some("B"), Some("Y")),
      (3L, Some(2.0), None, 30.0, Some("A"), None),
      (4L, None, Some(0.1), 40.0, None, Some("X")))
      .toDF("l_orderkey", "l_quantity", "l_discount", "l_extendedprice",
        "l_returnflag", "l_linestatus")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val out = SparkEntry.queries("q124_stats_collect")(spark, dir)
      .select("column_name", "n_rows", "n_nulls", "ndv", "min_num",
        "max_num", "min_str", "max_str", "ndv_approx_ok")
      .as[(String, Long, Long, Long, Option[Double], Option[Double],
        Option[String], Option[String], Boolean)].collect().toList
    assert(out == List(
      ("l_discount", 4L, 1L, 2L, Some(0.0), Some(0.1), None, None, true),
      ("l_extendedprice", 4L, 0L, 4L, Some(10.0), Some(40.0), None, None, true),
      ("l_linestatus", 4L, 1L, 2L, None, None, Some("X"), Some("Y"), true),
      ("l_quantity", 4L, 1L, 2L, Some(1.0), Some(2.0), None, None, true),
      ("l_returnflag", 4L, 1L, 2L, None, None, Some("A"), Some("B"), true)),
      out)
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }

  test("key rotation: decrypt-under-new-key restores plaintext, blind " +
      "index untouched; the wrong old key cannot silently rotate") {
    val dir = java.nio.file.Files.createTempDirectory("q120spec").toString
    Seq((1L, "  Alice Smith "), (2L, "BOB@EXAMPLE.COM"), (3L, "carol"))
      .toDF("c_custkey", "c_name")
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")
    val out = SparkEntry.queries("q120_key_rotation")(spark, dir)
      .as[(Long, String, Boolean)].collect().toList
    assert(out == List((1L, "alice smith"), (2L, "bob@example.com"),
      (3L, "carol")).map { case (k, n) => (k, n, true) }, out)
    // AES-GCM authenticates: rotating with the wrong old key must raise,
    // not emit garbage ciphertext
    val enc = Seq("x").toDF("v")
      .select(Crypto.encrypt(col("v"), "0123456789abcdef").as("e"))
    intercept[Exception] {
      enc.select(Crypto.decrypt(col("e"), "federated-wrong!")).collect()
    }
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }

  test("FD profiling: keys hold, a planted violation is counted exactly") {
    // orders: custkey 1 places an O and an F order → custkey→status is
    // violated by exactly that one lhs value; orderkey→custkey holds
    val orders = Seq(
      (1L, 1L, "O", 10.0, java.sql.Timestamp.valueOf("1996-01-01 00:00:00"),
        "1-URGENT"),
      (2L, 1L, "F", 10.0, java.sql.Timestamp.valueOf("1996-01-02 00:00:00"),
        "1-URGENT"),
      (3L, 2L, "O", 10.0, java.sql.Timestamp.valueOf("1996-01-03 00:00:00"),
        "1-URGENT"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
    val customer = Seq((1L, "c1", 1, 0.0, "A"), (2L, "c2", 1, 0.0, "A"))
      .toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal",
        "c_mktsegment")
    val nation = Seq((0, "ALG", 0), (1, "ARG", 1))
      .toDF("n_nationkey", "n_name", "n_regionkey")
    val dir = java.nio.file.Files.createTempDirectory("graft_fd").toString
    orders.write.mode("overwrite").parquet(s"$dir/orders.parquet")
    customer.write.mode("overwrite").parquet(s"$dir/customer.parquet")
    nation.write.mode("overwrite").parquet(s"$dir/nation.parquet")
    val out = SparkEntry.queries("q161_fd_profile")(spark, dir)
      .as[(String, String, Long, Long, Boolean)].collect().toList
    assert(out === List(
      ("customer", "c_custkey->c_nationkey", 2L, 0L, true),
      ("customer", "c_mktsegment->c_nationkey", 1L, 0L, true),
      ("nation", "n_nationkey->n_regionkey", 2L, 0L, true),
      ("nation", "n_regionkey->n_name", 2L, 0L, true),
      ("orders", "o_custkey->o_orderstatus", 2L, 1L, false),
      ("orders", "o_orderkey->o_custkey", 3L, 0L, true)), out)
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }

  test("seasonality: flat revenue yields index 1.0 exactly; trend only " +
      "where 12 trailing months exist") {
    // 24 flat months (1996-01 .. 1997-12), one 120.00 order each: the
    // trailing-12 trend equals the monthly value wherever defined
    // (months 1996-12 onward), so every seasonal index is exactly 1.0;
    // moy 12 contributes two trend-defined months, the others one
    val orders = (0 until 24).map { i =>
      val y = 1996 + i / 12; val mo = i % 12 + 1
      (i.toLong, 1L, "O", 120.0,
        java.sql.Timestamp.valueOf(f"$y-$mo%02d-15 00:00:00"), "1-URGENT")
    }.toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
      "o_orderdate", "o_orderpriority")
    val dir = java.nio.file.Files.createTempDirectory("graft_seas").toString
    orders.write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val out = SparkEntry.queries("q180_seasonality")(spark, dir)
      .as[(Int, Long, Double)].collect().toList
    val expected = (1 to 12).map(m => (m, if (m == 12) 2L else 1L, 1.0))
    assert(out === expected.toList, out)
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }

  test("RFM segmentation: evenly spread metrics land 2 customers per " +
      "quintile, inverse R/M pairing shows in the cells, degenerate F " +
      "collapses to bucket 1") {
    // 10 customers, one order each: customer i orders on day i (so
    // recency-days = 9-i) with price (i+1)*100 — R and M quintiles pair
    // inversely; F is constant (degenerate metric → everyone bucket 1)
    val orders = (0 until 10).map { i =>
      (i.toLong + 1, i.toLong, "O", (i + 1) * 100.0,
        java.sql.Timestamp.valueOf(f"1996-01-${i + 1}%02d 00:00:00"),
        "1-URGENT")
    }.toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
      "o_orderdate", "o_orderpriority")
    val dir = java.nio.file.Files.createTempDirectory("graft_rfm").toString
    orders.write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val out = SparkEntry.queries("q177_rfm_segmentation")(spark, dir)
      .as[(Int, Int, Int, Long)].collect().toList
    assert(out === List(
      (1, 1, 5, 2L), (2, 1, 4, 2L), (3, 1, 3, 2L),
      (4, 1, 2, 2L), (5, 1, 1, 2L)), out)
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }

  test("Benford audit: uniform digits flag nonconforming, counts and " +
      "expectations match the closed form") {
    // one order per leading digit 1..9 (prices 1.00 .. 9.00): shares are
    // uniform 1/9, which Benford's law decisively rejects
    val orders = (1 to 9).map(i =>
      (i.toLong, 1L, "O", i * 1.0,
        java.sql.Timestamp.valueOf("1996-01-01 00:00:00"), "1-URGENT"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
    val dir = java.nio.file.Files.createTempDirectory("graft_ben").toString
    orders.write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val out = SparkEntry.queries("q174_benford_audit")(spark, dir)
      .as[(String, Long, Double, Double, Double, Boolean)]
      .collect().toList
    assert(out.map(_._1) === (1 to 9).map(_.toString).toList)
    assert(out.forall(_._2 == 1L))
    def q5(x: Double) = math.floor(x * 100000) / 100000
    out.foreach { r =>
      val d = r._1.toInt
      assert(r._3 === q5(1.0 / 9), r)
      assert(r._4 === q5(math.log(1.0 + 1.0 / d) / math.log(10.0)), r)
      assert(r._6, "uniform digits must flag nonconforming")
    }
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }
}
