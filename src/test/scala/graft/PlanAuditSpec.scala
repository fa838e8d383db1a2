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
    "q63_stream_upsert", "q64_stream_stream_join", "q65_stream_tws",
    "q66_stream_decontam", "q67_stream_quality",
    "q68_stream_redaction", "q107_stream_rag_chunks",
    "q108_stream_ann_serving", "q109_stream_neardup_gate",
    "q112_stream_cdc_upsert", "q114_stream_bpe_encode",
    "q116_stream_drift_gate",
    // written-index variants: composing their plan DROPs + rewrites the
    // warehouse index table (q34b/q34c), runs driver-side k-means
    // training (q44b), or rewrites the bucketed events store (q54b) —
    // real multi-job runs, not pure plans
    "q34b_minhash_lsh_indexed", "q34c_minhash_incremental",
    "q117_contamination_indexed",
    "q44b_ann_ivf_indexed", "q44c_ann_ivf_incremental",
    "q54b_asof_join_bucketed")

  /** All-pairs formulations quarantined BY DESIGN as correctness oracles
    * for the sub-quadratic paths (SURVEY §9 "Dedup family"). This audit
    * runs at sf0.001, BELOW q42's row-count gate (VERDICT r14 #4), so
    * its oracle cartesian is in-plan here by design; above the gate the
    * plan carries none (PlanHygieneSpec's 1100-vector assertion). */
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

  test("corpus loaders fan an under-split scan out to the parallelism floor") {
    // The under-split hazard shipped three times (docsWithShingles r5,
    // mediaTable r6, the 17-query raw-consumer family caught by the r6
    // driver bench): a single-file corpus scans as ONE partition and every
    // CPU-heavy narrow chain downstream serializes onto one task. The fix
    // lives in Tables.load (fanOut); this asserts the loaders themselves
    // deliver at least the floor on a single-file source, so the class of
    // bug can't ship a fourth time.
    val min = graft.schema.Tables.minSplits(spark)
    Seq(
      "documents"  -> graft.schema.Tables.documents(spark, sf),
      "events"     -> graft.schema.Tables.events(spark, sf),
      "embeddings" -> graft.schema.Tables.embeddings(spark, sf),
      // VERDICT r7 #3: the TPC-H fact tables scanned 1-3 splits below the
      // guard's own floor, so the relational family (q10-q17, q26, q29)
      // was the contention-amplified victim family two driver rounds
      // running (q11b 1.89 → 5.05 s).
      "orders"     -> graft.schema.Tables.orders(spark, sf),
      "lineitem"   -> graft.schema.Tables.lineitem(spark, sf)
    ).foreach { case (name, df) =>
      val n = df.rdd.getNumPartitions
      assert(n >= min,
        s"$name loads with $n partition(s) on a single-file source " +
          s"(floor $min) — the Tables.load fanOut guard is gone")
    }
  }

  test("the fan-out guard is a NO-OP when the scan already supplies the " +
      "floor (the at-scale claim, exercised)") {
    // Every SCALING.md row arguing the guard floor "disappears at real
    // scale" rests on the condition keying off actual vs available
    // splits. Prove it: the same loader over a MULTI-file table (what
    // 100 TB parquet always is) must plan NO guard repartition.
    val tmp = java.nio.file.Files
      .createTempDirectory("graft_manyfile").toString
    try {
      val floor = graft.schema.Tables.minSplits(spark)
      // POSITIVE control first (ADVICE r10 #4): the marker must RENDER in
      // this Spark version's plan string on the single-file load, or the
      // negative assertion below would pass vacuously after a plan-format
      // change.
      val single = graft.schema.Tables.lineitem(spark, sf)
      assert(single.queryExecution.executedPlan.toString
          .contains("REPARTITION_BY_NUM"),
        "positive control: the guard's repartition marker no longer " +
          "renders as REPARTITION_BY_NUM in executedPlan strings — " +
          "update both assertions")
      spark.read.parquet(s"$sf/lineitem.parquet")
        .repartition(floor * 2)
        .write.mode("overwrite").parquet(s"$tmp/lineitem.parquet")
      val df = graft.schema.Tables.lineitem(spark, tmp)
      assert(df.rdd.getNumPartitions >= floor)
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("REPARTITION_BY_NUM"),
        s"guard repartitioned a scan that already had >= $floor splits:\n$plan")
    } finally
      org.apache.commons.io.FileUtils
        .deleteDirectory(new java.io.File(tmp))
  }

  test("per-family representatives keep the fan-out exchange ahead of " +
      "their CPU-heavy chains") {
    // One query per family the r6 driver bench caught inflated 3.4-17×:
    // text hashing (q36), quality scoring (q47), JSON mining (q50),
    // embedding LSH (q42b), retrieval (q57). Each plan must contain the
    // guard's own repartition — `REPARTITION_BY_NUM` on the table key —
    // at a width ≥ the floor; ENSURE_REQUIREMENTS exchanges from later
    // joins/aggs never carry that tag, so removing the loader guard (or
    // rebasing a query onto an unguarded scan) fails this even when the
    // query still shuffles elsewhere.
    val min = graft.schema.Tables.minSplits(spark)
    val reps = Map(
      "q36_simhash"            -> "doc_id",
      "q47_quality_filter"     -> "doc_id",
      "q50_json_props"         -> "event_id",
      "q42b_embed_neardup_lsh" -> "vec_id",
      "q57_tfidf"              -> "doc_id",
      // relational representative (VERDICT r7 #3): the Expand that
      // countDistinct+HLL puts over lineitem must run at guard width,
      // not the source's 1-3 splits
      "q11b_approx_distinct"   -> "l_orderkey")
    reps.foreach { case (name, key) =>
      val s = SparkEntry.queries(name)(spark, sf)
        .queryExecution.executedPlan.toString
      val rx = (s"Exchange hashpartitioning\\($key#\\d+L?, (\\d+)\\), " +
        "REPARTITION_BY_NUM").r
      val widths = rx.findAllMatchIn(s).map(_.group(1).toInt).toSeq
      assert(widths.nonEmpty && widths.max >= min,
        s"$name has no fan-out repartition on $key at width ≥ $min — " +
          "its CPU-heavy chain inherits the source's split count")
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
    // Budgets are calibrated against a cache-free session. Earlier tests
    // (and pureQueryPlans composition) leave CacheManager entries behind —
    // persist() registers at COMPOSE time, no action needed — and a cached
    // subtree substituted into q34's plan re-renders ITS exchanges inside
    // the InMemoryRelation, inflating the count (observed 20 → 29 purely
    // from test ordering). Clear to the calibrated state first.
    spark.catalog.clearCache()
    budgets.foreach { case (name, budget) =>
      val s = SparkEntry.queries(name)(spark, sf)
        .queryExecution.executedPlan.toString
      val n = rx.findAllIn(s).size
      assert(n <= budget,
        s"$name plans $n shuffle exchanges (budget $budget) — a capDf " +
          "consumer is likely re-deriving the posting stream per branch")
    }
  }

  test("no plan pays an exchange on a bucketed store's own bucket key " +
      "above a de-bucketed scan of it, at the BENCH's partition count " +
      "(round 18 — the 'Bucketed: false (disabled by query planner)' " +
      "hazard that re-exchanged the full edge snapshot every PageRank " +
      "iteration)") {
    // The failure mode: a join/agg input arrives pre-partitioned at
    // spark.sql.shuffle.partitions while the store is bucketed N < that
    // — EnsureRequirements then re-exchanges the BUCKETED side to the
    // larger count and the planner disables the bucketed scan, so the
    // store's layout silently stops serving the probe. Invisible at the
    // spec session's 4 partitions (4 < every bucket count, so the
    // bucketed side always anchors); fires at the bench/driver's 32.
    // Audit: recompose every query whose plan scans a bucketed graft
    // store, at 32 partitions with AQE off (static final plan), and
    // flag any shuffle exchange hashing EXACTLY a store's bucket
    // columns whose first-exchange-free subtree contains a de-bucketed
    // scan of that store.
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.exchange.{BroadcastExchangeExec, ShuffleExchangeExec}
    import org.apache.spark.sql.catalyst.plans.physical.HashPartitioning
    import org.apache.spark.sql.catalyst.expressions.AttributeReference
    def graftBucketScans(p: SparkPlan): Seq[FileSourceScanExec] =
      p.collect {
        case sc: FileSourceScanExec
            if sc.relation.bucketSpec.isDefined &&
              sc.tableIdentifier.exists(_.table.startsWith("graft_")) => sc
      }
    val bucketScanners = pureQueryPlans
      .filter { case (_, plan) => graftBucketScans(plan).nonEmpty }
      .map(_._1)
    assert(bucketScanners.nonEmpty, "no bucketed-store scanners found — " +
      "the membership probe is broken")
    def scansBelowFirstExchange(p: SparkPlan): Seq[FileSourceScanExec] =
      p match {
        case _: ShuffleExchangeExec => Seq.empty
        case _: BroadcastExchangeExec => Seq.empty
        case sc: FileSourceScanExec => Seq(sc)
        case other => other.children.flatMap(scansBelowFirstExchange)
      }
    def violations(plan: SparkPlan): Seq[String] = plan.collect {
      case ex: ShuffleExchangeExec => ex.outputPartitioning match {
        case hp: HashPartitioning =>
          val keys = hp.expressions
            .collect { case a: AttributeReference => a.name }.toSet
          scansBelowFirstExchange(ex.child).collect {
            case sc if !sc.bucketedScan &&
                sc.relation.bucketSpec
                  .exists(_.bucketColumnNames.toSet == keys) &&
                sc.tableIdentifier.exists(_.table.startsWith("graft_")) =>
              s"exchange(${keys.mkString(",")}) above de-bucketed scan " +
                s"of ${sc.tableIdentifier.get.table}"
          }
        case _ => Seq.empty
      }
    }.flatten
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    val prevParts = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      spark.conf.set("spark.sql.shuffle.partitions", "32")
      bucketScanners.foreach { name =>
        val plan = SparkEntry.queries(name)(spark, sf)
          .queryExecution.executedPlan
        val bad = violations(plan)
        assert(bad.isEmpty,
          s"$name at shuffle.partitions=32: ${bad.mkString("; ")} — the " +
            "store's layout is being re-exchanged instead of anchoring " +
            "the join/agg (align the other side to the bucket count)")
      }
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      spark.conf.set("spark.sql.shuffle.partitions", prevParts)
    }
  }

  test("no filter re-derives a higher-order chain below the fan-out " +
      "guard (inferred/pushed-filter inline, the q66 lesson)") {
    // Predicate pushdown substitutes project aliases into the pushed
    // condition with no reference-count guard, and InferFiltersFromGenerate
    // manufactures a size()>0 filter from every inner explode. Either way
    // an expensive lambda chain (tokenize, shingle, gram transform) lands
    // BELOW the loader's fan-out repartition: it then executes in the
    // scan stage — serially on an under-split source (q66 measured 24-31 s
    // vs 1.8 s at sf0.1) and as duplicated CPU at any scale. Higher-order
    // functions render as lambdafunction(...) in the condition; no
    // catalog plan may carry one under a RepartitionByExpression.
    // A lambda whose body is a bare element cast (isnotnull(transform(x,
    // cast)) inferred from a join on a cast-projected vector) costs one
    // array copy per row — allowed. So is constant arithmetic over such a
    // cast ((cast(x) * 1.5), the q42b dup-seeding projection): one fused
    // multiply per element, the same cost class as the copy itself, and
    // Catalyst infers its isnotnull from the LSH join no matter where the
    // projection sits. Anything else (tokenize, shingle, gram build, any
    // non-literal operand) is the real hazard and stays flagged.
    import org.apache.spark.sql.catalyst.plans.logical.{Filter => LFilter, RepartitionByExpression}
    val expensiveLambda =
      ("lambdafunction\\((?!cast\\(lambda" +
        "|\\(cast\\(lambda [^)]*\\) [*+/-] -?[\\d.]+\\))").r
    SparkEntry.queries.keys.toSeq.sorted.filterNot(sideEffecting)
      .foreach { name =>
        val plan =
          SparkEntry.queries(name)(spark, sf).queryExecution.optimizedPlan
        plan.foreach {
          case r: RepartitionByExpression => r.child.foreach {
            case f: LFilter =>
              val cond = f.condition.toString
              assert(expensiveLambda.findFirstIn(cond).isEmpty,
                s"$name pushes a higher-order chain below the fan-out " +
                  s"guard: ${cond.take(200)}")
            case _ =>
          }
          case _ =>
        }
      }
  }
}
