package graft.expr

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Misra-Gries heavy-hitter summary: a mergeable, fixed-size (≤ k
  * counters) sketch with the classical guarantee that every key whose
  * true frequency exceeds n/k IS present in the summary, and each
  * surviving counter underestimates its key's true count by at most n/k.
  *
  * Why a custom Aggregator (SURVEY §7.3): finding the hot keys of a
  * 100-TB fact table with `groupBy(key).count` shuffles the full key set
  * — the exact cost skew diagnosis is trying to avoid. Misra-Gries
  * participates in partial aggregation: every map task reduces its slice
  * to ≤ k counters BEFORE the exchange (the merge below is the
  * Agarwal/Cormode mergeable-summaries construction: union counters,
  * then subtract the (k+1)-largest count and drop non-positives — the
  * union's error bounds ADD, preserving the n/k guarantee), so the
  * shuffle carries k·partitions counters, independent of cardinality.
  *
  * The summary CONTENT depends on merge order (like any MG instance);
  * only the guarantee is deterministic. Deterministic final answers come
  * from the two-pass pattern in `ops.Relational.q130`: pass 1 MG
  * candidates (superset of everything above n/k), pass 2 exact recount of
  * candidates only, threshold filter — the output is exactly the keys
  * above the threshold with exact counts, for any partitioning/merge
  * order (HeavyHittersSpec proves partitioning-invariance).
  */
final class MisraGries(k: Int)
    extends Aggregator[Long, Map[Long, Long], Seq[Long]] {
  require(k > 1, s"k must be > 1, got $k")

  override def zero: Map[Long, Long] = Map.empty

  override def reduce(buf: Map[Long, Long], key: Long): Map[Long, Long] =
    buf.get(key) match {
      case Some(c) => buf.updated(key, c + 1L)
      case None if buf.size < k => buf.updated(key, 1L)
      case None =>
        // decrement-all: amortized O(1) per stream element (each
        // decrement pays back one prior increment), O(k) worst-case here
        buf.flatMap { case (x, c) =>
          if (c > 1L) Some(x -> (c - 1L)) else None
        }
    }

  override def merge(b1: Map[Long, Long], b2: Map[Long, Long])
      : Map[Long, Long] = {
    val union = b2.foldLeft(b1) { case (m, (x, c)) =>
      m.updated(x, m.getOrElse(x, 0L) + c)
    }
    if (union.size <= k) union
    else {
      // subtract the (k+1)-th largest count; ≤ k survive
      val cut = union.valuesIterator.toSeq.sorted(Ordering[Long].reverse)
        .apply(k)
      union.flatMap { case (x, c) =>
        if (c > cut) Some(x -> (c - cut)) else None
      }
    }
  }

  /** Candidate keys, sorted for stable downstream handling. */
  override def finish(buf: Map[Long, Long]): Seq[Long] =
    buf.keys.toSeq.sorted

  override def bufferEncoder: Encoder[Map[Long, Long]] =
    HeavyHitters.mapEncoder
  override def outputEncoder: Encoder[Seq[Long]] =
    HeavyHitters.seqEncoder
}

/** One surviving counter of a Misra-Gries summary. */
final case class MGEntry(key: Long, cnt: Long)

/** [[MisraGries]] with the COUNTERS exposed (not just the keys): the form
  * a maintained/streaming summary needs, since cross-batch merging
  * operates on (key, lower-bound count) pairs. Same reduce/merge. */
final class MisraGriesSummary(k: Int)
    extends Aggregator[Long, Map[Long, Long], Seq[MGEntry]] {
  private val inner = new MisraGries(k)
  override def zero: Map[Long, Long] = inner.zero
  override def reduce(b: Map[Long, Long], key: Long): Map[Long, Long] =
    inner.reduce(b, key)
  override def merge(b1: Map[Long, Long], b2: Map[Long, Long])
      : Map[Long, Long] = inner.merge(b1, b2)
  override def finish(buf: Map[Long, Long]): Seq[MGEntry] =
    buf.toSeq.sortBy(_._1).map { case (x, c) => MGEntry(x, c) }
  override def bufferEncoder: Encoder[Map[Long, Long]] =
    HeavyHitters.mapEncoder
  override def outputEncoder: Encoder[Seq[MGEntry]] =
    HeavyHitters.entrySeqEncoder
}

object HeavyHitters {
  private[expr] lazy val mapEncoder: Encoder[Map[Long, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[Long, Long]]()
  private[expr] lazy val seqEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
  private[expr] lazy val entrySeqEncoder: Encoder[Seq[MGEntry]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[MGEntry]]()

  /** misra_gries(key) as a Column: returns array<bigint> of candidate
    * keys — every key with frequency > n/k is guaranteed present. */
  def misraGries(k: Int)(key: Column): Column =
    udaf(new MisraGries(k), Encoders.scalaLong).apply(key)

  /** misra_gries_summary(key): array<struct<key,cnt>> — counters kept. */
  def misraGriesSummary(k: Int)(key: Column): Column =
    udaf(new MisraGriesSummary(k), Encoders.scalaLong).apply(key)

  /** The Agarwal/Cormode summary merge expressed RELATIONALLY, for
    * merging a stored summary with a new batch's summary (the streaming
    * maintenance path, q134): sum counters per key, then subtract the
    * (k+1)-th largest total from every counter and keep the positive
    * ones (≤ k survive; when ≤ k keys exist the cut is 0 and nothing is
    * lost). Input: (key, cnt) rows from any number of summaries; both
    * the cut and the subtraction are integer-exact, and error bounds add
    * across merges exactly as in the in-JVM merge, so any key above
    * n_total/k still survives an arbitrary merge tree.
    */
  def mergeSummaries(summaries: org.apache.spark.sql.DataFrame, k: Int)
      : org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    val summed = summaries.groupBy(col("key"))
      .agg(sum(col("cnt")).as("cnt"))
    val cut = summed.select(col("cnt")).orderBy(col("cnt").desc)
      .limit(k + 1)
      .agg(when(count(lit(1)) === k + 1, min(col("cnt")))
        .otherwise(lit(0L)).as("cut"))
    summed.crossJoin(broadcast(cut))
      .select(col("key"), (col("cnt") - col("cut")).as("cnt"))
      .filter(col("cnt") > 0L)
  }
}
