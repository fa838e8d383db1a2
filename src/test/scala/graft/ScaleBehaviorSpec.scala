package graft

import org.apache.spark.sql.functions._

/** Runtime-adaptive execution (AQE) behaviors the 100 TB posture relies on
  * (SURVEY §9 "Joins"/"Shuffle sizing"): skewed-join splitting and
  * shuffle-partition coalescing. These are RUNTIME re-plans — the spec
  * executes the query, then asserts on the final adaptive plan.
  */
class ScaleBehaviorSpec extends SparkSpec {
  import spark.implicits._

  private def withConf[T](pairs: (String, String)*)(f: => T): T = {
    val saved = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try f
    finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("AQE splits a skewed sort-merge join at runtime (skew=true)") {
    withConf(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1", // force SMJ
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "32KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "32KB") {
      // hot key 0 carries 100k of 300k fact rows; dim is uniform
      val fact = spark.range(0, 300000)
        .select(when($"id" % 3 === 0, 0L).otherwise($"id").as("k"),
          $"id".as("v"))
      val dim = spark.range(0, 1000).select($"id".as("k"), ($"id" * 2).as("w"))
      val joined = fact.join(dim, "k")
      val n = joined.collect().length
      // matches: 100000 (hot key) + ids 1..999 not divisible by 3
      assert(n === 100000 + 666)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"AQE did not split the skewed partition:\n$plan")
    }
  }

  test("AQE splits the ZIPFIAN hot key and the salted shapes equal their " +
      "plain twins on it (VERDICT r10 #4: the skew machinery measured " +
      "under a genuinely hot key)") {
    import graft.ops.SkewData
    // zipf(1.5) over 1000 keys: key 1 carries ~30% of all rows — far past
    // the per-reducer share, i.e. the real condition q18/q29/AQE exist for
    // (the driver testdata is uniform; SkewBench measures this at size,
    // this test pins the behavior in CI)
    val fact = SkewData.fact(spark, nRows = 300000, nKeys = 1000, parts = 8)
      .persist()
    val dim = SkewData.dim(spark, nKeys = 1000)
    val hot = fact.groupBy("k").count().agg(max("count")).head.getLong(0)
    assert(hot > 300000 / 4, s"zipf generator lost its hot key: $hot")
    withConf(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "32KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "32KB") {
      val joined = SkewData.plainJoinAgg(fact, dim)
      val plainRow = joined.collect().toSeq.map(_.toSeq)
      assert(joined.queryExecution.executedPlan.toString.contains("skew=true"),
        "AQE did not split the zipfian hot partition")
      val salted = SkewData.saltedJoinAgg(fact, dim, saltN = 8)
        .collect().toSeq.map(_.toSeq)
      assert(salted === plainRow)
    }
    val plainAgg = SkewData.plainAgg(fact).collect().toSeq.map(_.toSeq)
    assert(SkewData.saltedAgg(fact, 16).collect().toSeq.map(_.toSeq)
      === plainAgg)
    assert(SkewData.holisticAgg(fact).collect().toSeq.map(_.toSeq)
      === SkewData.saltedHolisticAgg(fact, 16).collect().toSeq.map(_.toSeq))
    fact.unpersist()
  }

  test("AQE coalesces an over-partitioned small shuffle") {
    withConf(
      "spark.sql.shuffle.partitions" -> "200",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "true") {
      val agg = spark.range(0, 10000)
        .groupBy(($"id" % 7).as("k")).agg(sum($"id").as("s"))
      agg.collect()
      val plan = agg.queryExecution.executedPlan.toString
      assert(plan.contains("coalesced"),
        s"AQE did not coalesce the 200-partition shuffle:\n$plan")
    }
  }
}
