package graft

import graft.expr.BloomExprs
import org.apache.spark.sql.functions._

/** Bloom-filter semi-join pre-filtering (expr/BloomExprs, q75): no false
  * negatives, real pruning, and exactness of the bloom+exact-join
  * composition.
  */
class BloomSpec extends SparkSpec {
  import spark.implicits._

  private def buildAndProbe(buildKeys: Seq[Long], probeKeys: Seq[Long]) = {
    val build = buildKeys.toDF("k")
    val bf = build.agg(BloomExprs.bloomAgg(col("k"), 1000L).as("bf")).scalar()
    probeKeys.toDF("p")
      .withColumn("hit", BloomExprs.mightContain(bf, col("p")))
  }

  test("no false negatives: every build key passes the probe") {
    val keys = (1L to 500L).map(_ * 7)
    val hits = buildAndProbe(keys, keys).filter(col("hit")).count()
    assert(hits == 500)
  }

  test("prunes non-members (fpp-bounded false positives)") {
    val build = (1L to 500L)
    val probe = (100001L to 110000L) // disjoint from build
    val fp = buildAndProbe(build, probe).filter(col("hit")).count()
    // sized for fpp ~3%; allow 3x headroom against hash unluckiness
    assert(fp < 10000 * 0.09, s"false positives: $fp / 10000")
  }

  test("bloom pre-filter + exact semi-join equals plain semi-join") {
    val orders = (1L to 2000L).map(k => (k, k % 7 == 0)).toDF("key", "sel")
    val items = (1L to 6000L).map(i => (i, i % 2000 + 1)).toDF("id", "fk")
    val selected = orders.filter(col("sel"))
    val bf = selected.agg(BloomExprs.bloomAgg(col("key"), 300L).as("bf"))
      .scalar()
    val pre = items.filter(BloomExprs.mightContain(bf, col("fk")))
    val viaBloom = pre.join(selected.select("key"),
        pre("fk") === col("key"), "left_semi")
      .select("id").as[Long].collect().toSet
    val exact = items.join(selected.select("key"),
        items("fk") === col("key"), "left_semi")
      .select("id").as[Long].collect().toSet
    assert(viaBloom == exact)
    // and the pre-filter really pruned: candidates well under the full scan
    val candidates = pre.count()
    assert(candidates < 6000, s"no pruning: $candidates")
    assert(candidates >= exact.size) // superset property
  }

  test("broadcast probe: identical verdicts to the subquery probe, " +
      "no false negatives") {
    val buildKeys = (1L to 500L).map(_ * 7)
    val probeKeys = (1L to 5000L).toDF("p")
    val blob = BloomExprs.buildBloom(buildKeys.toDF("k"), col("k"), 1000L)
    val bc = spark.sparkContext.broadcast(blob)
    val viaBroadcast = probeKeys
      .filter(BloomExprs.mightContainBroadcast(bc, col("p")))
      .as[Long].collect().toSet
    // same blob through the subquery/Literal path must agree bit-for-bit
    val bfCol = buildKeys.toDF("k")
      .agg(BloomExprs.bloomAgg(col("k"), 1000L).as("bf")).scalar()
    val viaSubquery = probeKeys
      .filter(BloomExprs.mightContain(bfCol, col("p")))
      .as[Long].collect().toSet
    assert(viaBroadcast == viaSubquery)
    // no false negatives through the broadcast path
    assert(buildKeys.filter(_ <= 5000).toSet.subsetOf(viaBroadcast))
  }

  test("broadcast probe evaluates identically interpreted and codegen'd") {
    val blob = BloomExprs.buildBloom(
      (1L to 100L).toDF("k"), col("k"), 100L)
    val bc = spark.sparkContext.broadcast(blob)
    val df = (1L to 300L).toDF("p")
      .withColumn("hit", BloomExprs.mightContainBroadcast(bc, col("p")))
    val viaCodegen = df.filter(col("hit")).select("p").as[Long]
      .collect().toSet
    // force the interpreted path by evaluating the expression directly
    // (same xxhash64 pre-hash the Column constructor applies)
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.{BoundReference, XxHash64}
    val bound = graft.expr.BloomMightContainBroadcast(bc,
      XxHash64(Seq(BoundReference(0, org.apache.spark.sql.types.LongType,
        nullable = false)), 42L))
    val viaEval = (1L to 300L).filter { k =>
      bound.eval(InternalRow(k)) == true
    }.toSet
    assert(viaCodegen == viaEval)
  }

  test("empty build side yields a real empty filter: every probe false, " +
      "no NPE") {
    val blob = BloomExprs.buildBloom(
      Seq.empty[Long].toDF("k"), col("k"), 100L)
    assert(blob != null && blob.nonEmpty)
    val bc = spark.sparkContext.broadcast(blob)
    val hits = (1L to 100L).toDF("p")
      .filter(BloomExprs.mightContainBroadcast(bc, col("p"))).count()
    assert(hits === 0)
  }

  test("q78's plan carries the bloom probe below the exact semi-join") {
    val df = SparkEntry.queries("q78_contamination")(
      spark, "/root/testdata/sf0.001")
    val plan = df.queryExecution.optimizedPlan.toString
    val probeAt = plan.indexOf("might_contain")
    val joinAt = plan.indexOf("Join LeftSemi")
    assert(probeAt >= 0, "bloom probe missing from the plan")
    assert(joinAt >= 0, "exact semi-join missing from the plan")
    // textual order: children print BELOW their parents, so the probe
    // filter (inside the semi-join's left child) must appear after it
    assert(probeAt > joinAt, "bloom probe is not below the exact semi-join")
    // and the composition changes nothing: 250 eval docs, hash-identical
    // output is the driver oracle's job — here assert rows + schema
    assert(df.columns.toSeq ==
      Seq("doc_id", "n_shared", "contaminated"))
  }
}
