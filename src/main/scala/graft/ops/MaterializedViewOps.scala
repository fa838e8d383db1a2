package graft.ops

import graft.Q
import graft.schema.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental materialized-view maintenance: a written aggregate table
  * kept current by merging PARTIAL AGGREGATE STATES from new data only —
  * history is never rescanned.
  *
  * The algebra: every column in the view is either algebraic (count/sum —
  * merged by summing states), derived (avg = sum/count — recomputed from
  * merged states at read), or a MERGEABLE SKETCH (distinct counts via
  * DataSketches HLL: `hll_sketch_agg` states union with `hll_union_agg`
  * and estimate at read). Nothing in the view requires the raw rows again,
  * which is the property that makes maintenance cost ∝ increment.
  *
  * Exactness discipline: money sums are carried as integer CENTS
  * (`round(price·100)` → BIGINT), so split-then-merge equals
  * aggregate-once bit-for-bit in any split/order — the float-associativity
  * hazard of maintaining a double sum across increments never arises.
  * Derived doubles (revenue, avg) are computed once at read from exact
  * integers, identically in both engines.
  *
  * Scale (100 TB): the view is group-count-sized; maintenance reads the
  * increment (one partition/day) plus the view — never the fact history.
  * With the view stored partitioned by group key prefix, the merge
  * touches only groups present in the increment (dynamic partition
  * overwrite, the q21 posture). The HLL state is ~1.5 KB/group at
  * lgK=12 regardless of fact cardinality.
  */
object MaterializedViewOps {

  private val cents =
    expr("CAST(round(o_totalprice * 100) AS BIGINT)")

  /** Partial-aggregate state of the orders revenue view for any slice of
    * the fact table: one row per (month, status) with algebraic counters
    * and the HLL customer sketch. */
  def revenueState(orders: DataFrame): DataFrame =
    orders.groupBy(
        // string month key: a DATE column round-trips through the
        // driver's pandas compare as datetime.date on the Spark side but
        // datetime64 on the DuckDB side — strings compare byte-exact
        date_format(col("o_orderdate"), "yyyy-MM").as("month"),
        col("o_orderstatus").as("status"))
      .agg(count(lit(1)).as("n"),
        sum(cents).as("cents"),
        hll_sketch_agg(col("o_custkey"), lit(12)).as("cust_hll"))

  /** Merge any number of state slices into one consistent state: sum the
    * algebraic counters, union the sketches. Associative + commutative,
    * so increments can land in any order or grouping. */
  def mergeStates(states: DataFrame*): DataFrame =
    states.reduce(_ unionByName _)
      .groupBy(col("month"), col("status"))
      .agg(sum(col("n")).as("n"), sum(col("cents")).as("cents"),
        hll_union_agg(col("cust_hll"), lit(true)).as("cust_hll"))

  /** Serve the view: derived columns from exact integer states, distinct
    * customers from the sketch estimate. */
  def serveView(state: DataFrame): DataFrame =
    state.select(col("month"), col("status"), col("n"),
      round(col("cents") / 100.0, 2).as("revenue"),
      round(col("cents") / (col("n") * 100.0), 2).as("avg_price"),
      hll_sketch_estimate(col("cust_hll")).as("cust_ndv_est"))

  val catalog: Seq[Q] = Seq(

    // ---- incremental MV maintenance (q128): the orders revenue view is
    // BUILT from 90% of the fact table and written; the remaining 10%
    // arrives as an increment and is merged state-to-state — the
    // maintenance plan's inputs are the group-sized view plus the
    // increment only (asserted in MaterializedViewSpec; by construction
    // here, since history is simply not passed to the merge). The emitted
    // view must equal the aggregate-once view EXACTLY on every algebraic
    // column — that equality IS the maintenance correctness claim, and
    // the oracle states it by aggregating once over the full table in
    // DuckDB. The sketch column is verified the measured-recall way
    // (VERDICT r10 #3): the estimate's relative error vs the exact NDV
    // (known to the oracle) is computed IN-PLAN and emitted as data with
    // a ±5% bound — a broken union would blow the bound and flip hashes.
    Q("q128_incremental_mv",
      (s, d) => {
        val store = java.nio.file.Files
          .createTempDirectory("graft_mv_").toString
        val orders = Tables.orders(s, d)
        val base = orders.filter(col("o_orderkey") % 10 =!= 0)
        val increment = orders.filter(col("o_orderkey") % 10 === 0)
        revenueState(base).write.mode("overwrite").parquet(store)
        val maintained =
          mergeStates(s.read.parquet(store), revenueState(increment))
        // exact NDV per group for the bound — verification-only column
        // (linear, one extra agg over the fact table at oracle/bench SF;
        // production serves the estimate alone — the sketch exists so the
        // exact pass is never needed)
        val exact = orders.groupBy(
            date_format(col("o_orderdate"), "yyyy-MM").as("month"),
            col("o_orderstatus").as("status"))
          .agg(countDistinct(col("o_custkey")).as("cust_ndv"))
        serveView(maintained).join(exact, Seq("month", "status"))
          .select(col("month"), col("status"), col("n"), col("revenue"),
            col("avg_price"), col("cust_ndv"),
            (abs(col("cust_ndv_est") - col("cust_ndv")) <=
              greatest(lit(1.0), col("cust_ndv") * 0.05))
              .as("ndv_est_ok"))
          .orderBy(col("month"), col("status"))
      },
      Some("""SELECT strftime(o_orderdate, '%Y-%m') AS month,
              o_orderstatus AS status, count(*) AS n,
              round(sum(CAST(round(o_totalprice * 100) AS BIGINT)) / 100.0,
                2) AS revenue,
              round(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                / (count(*) * 100.0), 2) AS avg_price,
              count(DISTINCT o_custkey) AS cust_ndv,
              true AS ndv_est_ok
              FROM orders
              GROUP BY 1, 2
              ORDER BY month, status"""))
  )
}
