package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic zipfian skew fixture + the two manual skew mitigations,
  * factored so the spec tier (ScaleBehaviorSpec) and the measurement tool
  * (graft.tools.SkewBench) exercise the SAME generator and the SAME
  * salted shapes as the catalog queries (q18/q29) — VERDICT r10 #4: the
  * skew machinery existed and was proven result-equal, but the driver
  * testdata has no genuinely hot key, so the plans were never measured
  * under the condition they exist for. This supplies that condition.
  *
  * The key column is zipf(s) by inverse CDF of the continuous x^-s
  * density on [1, nKeys]: u uniform from a hash of the row id (pure,
  * seedless, engine-deterministic), key = floor((1 − u(1 − N^(1−s)))^
  * (1/(1−s))). At the default s = 1.5, N = 10⁵, key 1 ALONE carries
  * (1 − 2^(1−s))/(1 − N^(1−s)) ≈ 29% of all rows (uniform share 10⁻⁵)
  * — far past any per-reducer share at realistic partition counts, i.e.
  * exactly the one-reducer hot spot the salted patterns and AQE's skew
  * split exist to spread. s = 1 (harmonic) is supported via its own
  * closed form exp(u·ln N).
  */
object SkewData {

  /** Zipf(s) key in [1, nKeys], a pure function of `id`. */
  def zipfKey(id: Column, nKeys: Int, s: Double = 1.5): Column = {
    val u = pmod(xxhash64(id), lit(1000000L)) / lit(1000000.0)
    val x =
      if (s == 1.0) exp(u * lit(math.log(nKeys.toDouble)))
      else pow(lit(1.0) - u * lit(1.0 - math.pow(nKeys.toDouble, 1.0 - s)),
        lit(1.0 / (1.0 - s)))
    least(floor(x).cast("long"), lit(nKeys.toLong))
  }

  /** (k, v) fact table of `nRows` zipfian-keyed rows, `parts`-way. */
  def fact(spark: SparkSession, nRows: Long, nKeys: Int,
      parts: Int): DataFrame =
    spark.range(0L, nRows, 1L, parts)
      .select(zipfKey(col("id"), nKeys).as("k"), col("id").as("v"))

  /** (k, w) uniform dim table covering the key domain. */
  def dim(spark: SparkSession, nKeys: Int): DataFrame =
    spark.range(1L, nKeys + 1L).select(col("id").as("k"),
      (col("id") * 2).as("w"))

  /** The q29 salted-join shape on (k, v)×(k, w): fact side salted by a
    * deterministic hash, dim side replicated across salts. Provably equals
    * [[plainJoinAgg]] — every fact row matches its key exactly once. */
  def saltedJoinAgg(factDf: DataFrame, dimDf: DataFrame,
      saltN: Int): DataFrame = {
    val f = factDf.withColumn("_fsalt", pmod(col("v") * 31, lit(saltN)))
    val d = dimDf.select(col("k").as("dk"), col("w"),
      explode(sequence(lit(0), lit(saltN - 1))).as("_dsalt"))
    f.join(d, col("k") === col("dk") && col("_fsalt") === col("_dsalt"))
      .agg(count(lit(1)).as("n"), sum(col("v") + col("w")).as("s"))
  }

  def plainJoinAgg(factDf: DataFrame, dimDf: DataFrame): DataFrame =
    factDf.join(dimDf, "k")
      .agg(count(lit(1)).as("n"), sum(col("v") + col("w")).as("s"))

  /** The q18 two-stage salted aggregation on (k, v). Provably equals
    * [[plainAgg]]. */
  def saltedAgg(factDf: DataFrame, saltN: Int): DataFrame =
    factDf.withColumn("_salt", pmod(col("v") * 31, lit(saltN)))
      .groupBy(col("k"), col("_salt"))
      .agg(sum(col("v")).as("pv"), count(lit(1)).as("pn"))
      .groupBy(col("k"))
      .agg(sum(col("pv")).as("sv"), sum(col("pn")).as("n"))
      .agg(count(lit(1)).as("n_keys"), sum(col("sv")).as("s"),
        max(col("n")).as("max_key_rows"))

  def plainAgg(factDf: DataFrame): DataFrame =
    factDf.groupBy(col("k"))
      .agg(sum(col("v")).as("sv"), count(lit(1)).as("n"))
      .agg(count(lit(1)).as("n_keys"), sum(col("sv")).as("s"),
        max(col("n")).as("max_key_rows"))

  /** HOLISTIC aggregate (collect_list) — the agg class where salting
    * actually pays: partial aggregation combines map-side lists but can't
    * REDUCE them, so the hot key's full row set still lands on one
    * reducer. (For algebraic aggregates — sum/count — the map-side
    * combine already neutralizes skew; SkewBench measures both so the
    * boundary is evidence, not folklore.) */
  def holisticAgg(factDf: DataFrame): DataFrame =
    factDf.groupBy(col("k"))
      .agg(size(collect_list(col("v"))).cast("long").as("sz"))
      .agg(count(lit(1)).as("n_keys"), sum(col("sz")).as("s"),
        max(col("sz")).as("max_key_rows"))

  /** Two-stage salted holistic aggregate: collect per (k, salt) — the hot
    * key's rows spread over saltN reducers — then merge per-key partial
    * sizes. Provably equals [[holisticAgg]]. */
  def saltedHolisticAgg(factDf: DataFrame, saltN: Int): DataFrame =
    factDf.withColumn("_salt", pmod(col("v") * 31, lit(saltN)))
      .groupBy(col("k"), col("_salt"))
      .agg(size(collect_list(col("v"))).cast("long").as("psz"))
      .groupBy(col("k")).agg(sum(col("psz")).as("sz"))
      .agg(count(lit(1)).as("n_keys"), sum(col("sz")).as("s"),
        max(col("sz")).as("max_key_rows"))
}
