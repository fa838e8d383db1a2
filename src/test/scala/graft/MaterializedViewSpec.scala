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
}
