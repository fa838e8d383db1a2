package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Keep-first upsert — the reference's only multi-table operator
  * (`/root/reference/ingestion/io_utils.py:16-39`): read existing store,
  * concat new rows AFTER existing, `drop_duplicates(subset=key)` with
  * pandas' default keep='first' — so EXISTING rows win over re-fetched ones,
  * and the first occurrence wins within the new batch.
  *
  * Spark has no implicit row order, so "first" must be explicit
  * (SURVEY.md §2.4 U2: bare `dropDuplicates` keeps an ARBITRARY row — not
  * parity). Two formulations:
  *
  *  - [[keepFirst]]: priority tag + one window pass. General (any per-batch
  *    tie-break ordering), single shuffle on the key.
  *  - [[insertIfAbsent]]: anti-join. Equivalent when incoming rows are
  *    already unique per key; cheaper at scale when `existing` is huge and
  *    bucketed/partitioned by key (the anti-join can broadcast the small
  *    incoming side, touching no existing-side shuffle at all).
  *
  * At 100 TB the store would be key-bucketed parquet; both formulations then
  * run shuffle-free on the store side (bucket-local window / broadcast anti
  * join). Full-store rewrite (the reference's behavior, `io_utils.py:37`)
  * becomes dynamic partition overwrite of touched partitions only.
  */
object Upsert {

  /** Union + keep the first row per key: existing rows beat incoming; ties
    * within each side break by `order` ascending.
    *
    * @param order deterministic within-batch tie-break (the stand-in for
    *              pandas' positional row order)
    */
  def keepFirst(existing: DataFrame, incoming: DataFrame, keys: Seq[String],
      order: Seq[Column]): DataFrame = {
    val pri = "_graft_pri"
    val rn = "_graft_rn"
    val unioned = existing.withColumn(pri, lit(0))
      .unionByName(incoming.withColumn(pri, lit(1)), allowMissingColumns = false)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(pri) +: order: _*)
    unioned.withColumn(rn, row_number().over(w))
      .filter(col(rn) === 1)
      .drop(pri, rn)
  }

  /** existing ∪ (incoming ⟕̸ existing): insert-if-absent. Caller guarantees
    * incoming is unique per key (dedupe first with [[keepFirst]] over an
    * empty existing side, or `dropDuplicates` when arbitrariness is fine).
    */
  def insertIfAbsent(existing: DataFrame, incoming: DataFrame,
      keys: Seq[String]): DataFrame = {
    val cond = keys.map(k => existing(k) === incoming(k)).reduce(_ && _)
    existing.unionByName(
      incoming.join(existing, cond, "left_anti"),
      allowMissingColumns = false)
  }
}
