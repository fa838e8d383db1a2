package graft

import org.apache.spark.sql.execution.joins.CartesianProductExec
import org.apache.spark.sql.execution.window.WindowExec

/** Catalog-wide physical-plan audit: structural anti-patterns that are
  * invisible at test scale but fatal at 100 TB, enforced for EVERY pure
  * batch query so a future operator can't reintroduce them:
  *
  *  - a Window with an empty partitionSpec funnels the whole table through
  *    ONE task (the round-1 q56 finding — since reformulated as a
  *    self-join; this spec keeps it out permanently);
  *  - a non-broadcast CartesianProduct is O(n²) rows shuffled; only the
  *    explicitly-quarantined all-pairs correctness oracles may contain one.
  */
class PlanAuditSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  /** Queries excluded from the audit: side-effecting (HTTP server, file
    * writes, store swaps) or streaming (plans only exist per micro-batch). */
  private val sideEffecting = Set(
    "q23_ingest_e2e", "q24_csv_roundtrip",
    "q60_stream_dedup", "q61_stream_window_agg", "q62_stream_stateful",
    "q63_stream_upsert")

  /** All-pairs formulations quarantined BY DESIGN as correctness oracles
    * for the sub-quadratic paths (SURVEY §9 "Dedup family"). */
  private val cartesianAllowed = Set("q42_embed_neardup", "q36_simhash")

  private lazy val pureQueryPlans =
    SparkEntry.queries.keys.toSeq.sorted
      .filterNot(sideEffecting)
      .map { name =>
        name -> SparkEntry.queries(name)(spark, sf).queryExecution.sparkPlan
      }

  test("no catalog query plans a partition-less (single-task) Window") {
    pureQueryPlans.foreach { case (name, plan) =>
      val bad = plan.collect {
        case w: WindowExec if w.partitionSpec.isEmpty => w
      }
      assert(bad.isEmpty,
        s"$name plans a global Window (whole table through one task)")
    }
  }

  test("no catalog query plans a non-broadcast cartesian product, except " +
      "the quarantined all-pairs oracles") {
    pureQueryPlans.foreach { case (name, plan) =>
      val cart = plan.collect { case c: CartesianProductExec => c }
      if (cartesianAllowed(name)) ()
      else assert(cart.isEmpty, s"$name plans CartesianProduct:\n$plan")
    }
  }

  test("dedup pair detection keeps its shuffle-exchange budget " +
      "(capDf regression guard, VERDICT r5 #8)") {
    // The r5 df-floor rescue once re-referenced the unpersisted posting
    // stream enough times that q35's plan reached 104 exchanges (~15×
    // wall). These budgets hold ~25% above the healthy plans' counts
    // (q34: 15, q35: 35 at calibration) — subtree cloning from a lost
    // persist or a new corpus-wide pass blows through them; partition-
    // count or AQE changes do not (exchange NODES, not tasks).
    // sparkPlan is pre-EnsureRequirements (no exchanges yet) and AQE
    // hides children, so count shuffle markers in the executed-plan
    // string; "BroadcastExchange HashedRelation…" never matches the
    // lowercase partitioning words.
    val rx = "Exchange (hashpartitioning|rangepartitioning|SinglePartition)".r
    val budgets = Map("q34_minhash_lsh" -> 20, "q35_ngram_jaccard" -> 44)
    budgets.foreach { case (name, budget) =>
      val s = SparkEntry.queries(name)(spark, sf)
        .queryExecution.executedPlan.toString
      val n = rx.findAllIn(s).size
      assert(n <= budget,
        s"$name plans $n shuffle exchanges (budget $budget) — a capDf " +
          "consumer is likely re-deriving the posting stream per branch")
    }
  }
}
