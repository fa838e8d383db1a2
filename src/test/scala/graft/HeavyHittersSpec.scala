package graft

import graft.expr.HeavyHitters.misraGries
import graft.expr.MisraGries
import org.apache.spark.sql.functions._

class HeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  /** 10k-element stream: key 1 at 20%, key 2 at 10%, long uniform tail. */
  private def stream = spark.range(0, 10000L).selectExpr(
    """CASE WHEN id % 5 = 0 THEN 1
            WHEN id % 10 = 1 THEN 2
            ELSE 100 + (id % 997) END AS key""")

  test("MG guarantee: every key above n/k survives, under any " +
      "partitioning") {
    for (parts <- Seq(1, 4, 13)) {
      val cand = stream.repartition(parts)
        .agg(misraGries(16)(col("key")).as("c"))
        .select(explode(col("c")).as("key")).as[Long].collect().toSet
      assert(cand.size <= 16)
      // n/k = 10000/16 = 625; keys 1 (2000) and 2 (1000) are above it
      assert(cand(1L) && cand(2L),
        s"parts=$parts lost a guaranteed heavy hitter: $cand")
    }
  }

  test("two-pass answer (candidates → exact recount → threshold) is " +
      "deterministic across partitionings and exactly the true hot set") {
    def run(parts: Int): Map[Long, Long] = {
      val keyed = stream.repartition(parts)
      val cand = keyed.agg(misraGries(16)(col("key")).as("c"))
        .select(explode(col("c")).as("key"))
      keyed.join(broadcast(cand), Seq("key"), "left_semi")
        .groupBy(col("key")).agg(count(lit(1)).as("cnt"))
        .filter(col("cnt") * 100L >= lit(10000L) * 8L)
        .as[(Long, Long)].collect().toMap
    }
    // ≥ 8% of 10000 = 800: exactly keys 1 (2000) and 2 (1000)
    val expected = Map(1L -> 2000L, 2L -> 1000L)
    assert(run(1) == expected && run(4) == expected && run(13) == expected)
  }

  test("relational mergeSummaries: bounds hold across an arbitrary " +
      "merge tree and the result stays ≤ k counters") {
    import graft.expr.HeavyHitters.{misraGriesSummary, mergeSummaries}
    val k = 16
    def summarize(parts: Int, mod: Int, keep: Int) = stream
      .filter(expr(s"key % $mod = $keep OR key < 100")) // slice w/ heavies
      .repartition(parts)
      .agg(misraGriesSummary(k)(col("key")).as("s"))
      .select(explode(col("s")).as("e"))
      .select(col("e.key").as("key"), col("e.cnt").as("cnt"))
    // three slices covering the stream (key<100 heavies in each on
    // purpose; tail split 3 ways) merged relationally
    val merged = mergeSummaries(
      summarize(3, 3, 0).unionByName(summarize(5, 3, 1))
        .unionByName(summarize(2, 3, 2)), k)
      .as[(Long, Long)].collect().toMap
    assert(merged.size <= k)
    // heavies were triplicated by the slicing (3 × 2000 and 3 × 1000 of
    // 3 × 3000 heavy rows + 7000 tail = 16000 total); n/k = 1000
    assert(merged.contains(1L) && merged.contains(2L))
    assert(merged(1L) >= 6000L - 16000L / k && merged(1L) <= 6000L)
  }

  test("merge preserves the additive error bound (counter ≥ true − n/k)") {
    val mg = new MisraGries(8)
    // two slices with a shared heavy key and disjoint noise
    val s1 = (1 to 300).map(_ => 7L) ++ (1 to 200).map(i => (i % 20).toLong)
    val s2 = (1 to 300).map(_ => 7L) ++ (1 to 200).map(i => (30 + i % 20).toLong)
    val b1 = s1.foldLeft(mg.zero)(mg.reduce)
    val b2 = s2.foldLeft(mg.zero)(mg.reduce)
    val merged = mg.merge(b1, b2)
    assert(merged.size <= 8)
    val n = s1.size + s2.size // 1000, n/k = 125
    assert(merged.getOrElse(7L, 0L) >= 600L - n / 8)
    assert(merged.getOrElse(7L, 0L) <= 600L) // never overestimates
  }
}
