package graft.expr

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Expression, Literal, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types.{BooleanType, DataType}
import org.apache.spark.util.sketch.BloomFilter

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

  /** Build the filter (one aggregate job over `keys` — partial per
    * partition, merged once) and return the serialized blob. The blob is
    * numBits/8 bytes BY CONSTRUCTION — bounded by the sizing parameters,
    * not by data — so holding it on the driver is safe at any corpus
    * scale. An EMPTY (or all-null-key) build side yields a real empty
    * filter, not null: BloomFilterAggregate evaluates to null when zero
    * rows aggregate, and shipping that null would NPE the probe's lazy
    * deserialization in executor tasks — where the subquery path just
    * filtered every row. An empty filter gives the same every-row-false
    * verdicts with no special cases downstream. */
  def buildBloom(keys: DataFrame, keyCol: Column, expectedItems: Long,
      fpp: Double = 0.03): Array[Byte] =
    Option(keys.agg(bloomAgg(keyCol, expectedItems, fpp).as("bf"))
        .head.getAs[Array[Byte]](0))
      .getOrElse {
        val empty = org.apache.spark.util.sketch.BloomFilter.create(1)
        val out = new java.io.ByteArrayOutputStream()
        empty.writeTo(out)
        out.toByteArray
      }

  /** Probe against a DRIVER-BROADCAST filter instead of an in-plan scalar
    * subquery. A subquery's result is inlined as a Literal into the
    * expression tree, so a megabyte-scale blob rides in EVERY task binary
    * of every downstream stage (the audit's "Broadcasting large task
    * binary" 1.9-2.7 MiB warnings, all from q78). A broadcast variable
    * ships the blob to each executor ONCE over the torrent protocol and
    * the task closure carries only the handle — the right posture for the
    * reusable 100 TB decontamination artifact, where the filter is sized
    * in the tens of MB and probed by many queries. */
  def mightContainBroadcast(bloom: Broadcast[Array[Byte]],
      key: Column): Column =
    ColumnShim.column(BloomMightContainBroadcast(
      bloom, ColumnShim.expression(xxhash64(key))))
}

/** [[BloomFilterMightContain]] semantics over a broadcast blob: the child
  * is the pre-hashed (xxhash64) key; the filter deserializes lazily once
  * per executor JVM from the broadcast value, never entering the task
  * binary or the constraint/canonicalization machinery (the broadcast
  * handle is compact and serializable). */
case class BloomMightContainBroadcast(bloom: Broadcast[Array[Byte]],
    child: Expression) extends UnaryExpression {

  // child is always the xxhash64(key) the companion constructor builds,
  // so the input is LongType by construction (no ExpectsInputTypes needed)
  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain_broadcast"

  @transient private lazy val filter: BloomFilter =
    BloomFilter.readFrom(new java.io.ByteArrayInputStream(bloom.value))

  /** Called from both eval and generated code; public-to-codegen. */
  def test(hashed: Long): Boolean = filter.mightContainLong(hashed)

  override def nullSafeEval(hashed: Any): Any =
    test(hashed.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    // reference object = this expression; the generated call goes through
    // test() so the lazily-deserialized filter is shared across rows
    val ref = ctx.addReferenceObj("bloomProbe", this,
      classOf[BloomMightContainBroadcast].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.test($c);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): BloomMightContainBroadcast =
    copy(child = newChild)
}
