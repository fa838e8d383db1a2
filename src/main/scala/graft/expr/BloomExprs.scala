package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.ColumnShim

/** Bloom-filter semi-join pre-filtering surfaced as column functions —
  * the same Catalyst machinery Spark's own InjectRuntimeFilter rule plans
  * (BloomFilterAggregate on the build side, BloomFilterMightContain on the
  * probe side, keys pre-hashed with xxhash64), exposed so a pipeline can
  * apply it EXPLICITLY: build once, reuse across many probe queries —
  * runtime filters are per-query and only fire under join-selectivity
  * heuristics, while a curated filter (e.g. "known-duplicate document ids",
  * "already-ingested keys") is a reusable artifact.
  *
  * Scale: the filter is an aggregate (partial per partition, merged once —
  * no row shuffle), its size is bounded by numBits/8 bytes regardless of
  * build cardinality, and the probe is a broadcast of that one blob plus a
  * codegen'd hash+test per row. False positives only ever ADD candidates —
  * a following exact join keeps semantics exact (asserted in BloomSpec).
  */
object BloomExprs {

  /** Aggregate `key` values into a serialized bloom filter sized for
    * `expectedItems` distinct keys at ~`fpp` false-positive rate. */
  def bloomAgg(key: Column, expectedItems: Long, fpp: Double = 0.03): Column = {
    // standard sizing: bits = -n·ln(p)/ln(2)²
    val numBits = math.max(64L,
      (-expectedItems * math.log(fpp) / (math.log(2) * math.log(2))).toLong)
    ColumnShim.column(new BloomFilterAggregate(
      ColumnShim.expression(xxhash64(key)),
      Literal(expectedItems), Literal(numBits)).toAggregateExpression())
  }

  /** Probe: may the filter contain `key`? (No false negatives.) */
  def mightContain(bloom: Column, key: Column): Column =
    ColumnShim.column(BloomFilterMightContain(
      ColumnShim.expression(bloom),
      ColumnShim.expression(xxhash64(key))))
}
