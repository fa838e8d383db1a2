package graft

import graft.ops.MaterializedViewOps._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class MaterializedViewSpec extends SparkSpec {
  import spark.implicits._

  private def fakeOrders(keys: Seq[Long]): DataFrame =
    keys.toDF("o_orderkey").select(col("o_orderkey"),
      (col("o_orderkey") % 7 + 1).as("o_custkey"),
      expr("CAST(o_orderkey % 3 AS STRING)").as("o_orderstatus"),
      // two distinct months; cents-exact prices incl. a .005 midpoint
      to_timestamp(when(col("o_orderkey") % 2 === 0, "2024-01-15")
        .otherwise("2024-02-20")).as("o_orderdate"),
      (col("o_orderkey") * 10.01 + 0.005).as("o_totalprice"))

  test("split-then-merge equals aggregate-once on every algebraic column, " +
      "for any increment split and merge order") {
    val all = fakeOrders(1L to 300L)
    val whole = serveView(revenueState(all)).drop("cust_ndv_est")
    for (mod <- Seq(2L, 5L)) {
      val parts = (0L until mod).map(m =>
        revenueState(all.filter(col("o_orderkey") % mod === m)))
      val merged = serveView(mergeStates(parts.reverse: _*))
        .drop("cust_ndv_est")
      assert(merged.exceptAll(whole).isEmpty &&
        whole.exceptAll(merged).isEmpty,
        s"mod=$mod split-merge diverged from aggregate-once")
    }
  }

  test("sketch union: estimate from merged states tracks the exact NDV") {
    val all = fakeOrders(1L to 500L)
    val merged = mergeStates(
      revenueState(all.filter(col("o_orderkey") <= 250L)),
      revenueState(all.filter(col("o_orderkey") > 250L)))
    val rows = serveView(merged)
      .join(all.groupBy(date_format(col("o_orderdate"), "yyyy-MM")
          .as("month"), col("o_orderstatus").as("status"))
        .agg(countDistinct(col("o_custkey")).as("exact")),
        Seq("month", "status"))
      .select(col("cust_ndv_est"), col("exact"))
      .as[(Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (est, exact) =>
      assert(math.abs(est - exact) <= math.max(1L, exact / 20),
        s"estimate $est vs exact $exact")
    }
  }

  test("maintenance reads the view (group-sized), never the history") {
    val all = fakeOrders(1L to 400L)
    val dir = java.nio.file.Files.createTempDirectory("mv_spec").toString
    revenueState(all.filter(col("o_orderkey") <= 390L))
      .write.parquet(s"$dir/mv")
    val mv = spark.read.parquet(s"$dir/mv")
    // the stored view has one row per (month, status) group — merging it
    // with an increment state touches group-count rows, not fact rows
    assert(mv.count() == 6) // 2 months × 3 statuses
    val merged = mergeStates(mv,
      revenueState(all.filter(col("o_orderkey") > 390L)))
    val whole = serveView(revenueState(all)).drop("cust_ndv_est")
    val got = serveView(merged).drop("cust_ndv_est")
    assert(got.exceptAll(whole).isEmpty && whole.exceptAll(got).isEmpty)
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }

  test("quantile histogram state: split-then-merge is BIT-IDENTICAL to " +
      "aggregate-once for any split, and the estimate brackets the exact " +
      "percentile within one bin") {
    val all = fakeOrders(1L to 300L)
    val whole = priceHistogramState(all)
    for (mod <- Seq(2L, 5L)) {
      val parts = (0L until mod).map(m =>
        priceHistogramState(all.filter(col("o_orderkey") % mod === m)))
      val merged = mergeHistogramStates(parts.reverse: _*)
      assert(merged.exceptAll(whole).isEmpty &&
        whole.exceptAll(merged).isEmpty,
        s"mod=$mod histogram split-merge diverged")
    }
    // served estimates carry their own proof columns: every pXX_ok must
    // hold (exact type-1 percentile falls in the estimated bin)
    val served = serveQuantilesVerified(whole, all)
    val oks = served.select(col("p50_ok"), col("p95_ok"), col("p99_ok"))
      .as[(Boolean, Boolean, Boolean)].collect()
    assert(oks.nonEmpty)
    assert(oks.forall { case (a, b, c) => a && b && c }, oks.toList)
    // and the estimate is the bin LOWER EDGE: est <= exact < est + $100
    val vals = served.select(col("p95_est"), col("p95_exact"))
      .as[(Double, Double)].collect()
    vals.foreach { case (est, exact) =>
      assert(est <= exact && exact < est + 100.0, s"est=$est exact=$exact")
    }
  }

  test("quantile view on a known distribution reads back exact deciles") {
    // 1000 orders priced 100.00..1099.00: p50 target = ceil(0.5·1000) =
    // row 500 → price 599.00 → bin 5 → est $500; p99 → row 990 → 1089.00
    // → bin 10 → est $1000.
    val orders = (1L to 1000L).toDF("o_orderkey").select(col("o_orderkey"),
      to_timestamp(lit("2024-03-01")).as("o_orderdate"),
      lit("O").as("o_orderstatus"),
      (col("o_orderkey") + 99.0).as("o_totalprice"))
    val served = serveQuantilesVerified(priceHistogramState(orders), orders)
      .select(col("n"), col("p50_est"), col("p50_exact"), col("p99_est"),
        col("p99_exact"))
      .as[(Long, Double, Double, Double, Double)].collect().toList
    assert(served === List((1000L, 500.0, 599.0, 1000.0, 1089.0)), served)
  }
}
