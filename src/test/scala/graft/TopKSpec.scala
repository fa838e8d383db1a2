package graft

import graft.expr.TopKAgg
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The bounded top-k aggregate: result-equal to the window formulation,
  * planned as a two-phase (partial/final) aggregate — the property that
  * makes it the at-scale replacement for window top-k. */
class TopKSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def viaAgg(k: Int) = spark.read
    .parquet(s"$sf/orders.parquet")
    .groupBy($"o_custkey")
    .agg(TopKAgg.topK(k)($"o_totalprice", $"o_orderkey").as("top"))
    .select($"o_custkey", posexplode($"top").as(Seq("i", "t")))
    .select($"o_custkey", ($"i" + 1).as("rank"),
      $"t.id".as("o_orderkey"), $"t.score".as("o_totalprice"))

  private def viaWindow(k: Int) = {
    val w = Window.partitionBy($"o_custkey")
      .orderBy($"o_totalprice".desc, $"o_orderkey".asc)
    spark.read.parquet(s"$sf/orders.parquet")
      .withColumn("rank", row_number().over(w))
      .filter($"rank" <= k)
      .select($"o_custkey", $"rank".cast("long"), $"o_orderkey", $"o_totalprice")
  }

  test("aggregate top-k equals the window formulation (k=1,3,5)") {
    for (k <- Seq(1, 3, 5)) {
      val a = viaAgg(k).collect().map(_.toSeq).toSet
      val b = viaWindow(k).collect().map(_.toSeq).toSet
      assert(a === b, s"mismatch at k=$k")
    }
  }

  test("plans as a two-phase aggregate: map-side partial before the shuffle") {
    val plan = viaAgg(3).queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"), plan)
    assert(plan.contains("partial_"), s"no partial (map-side) phase:\n$plan")
  }

  test("property: matches local sort-take on random data with ties") {
    val rnd = new scala.util.Random(42)
    val rows = Seq.fill(2000)((rnd.nextInt(20).toLong,
      rnd.nextInt(50).toDouble, rnd.nextLong().abs))
    val df = rows.toDF("key", "score", "id")
    val got = df.groupBy($"key")
      .agg(TopKAgg.topK(4)($"score", $"id").as("top"))
      .as[(Long, Seq[(Double, Long)])].collect().toMap
    val expected = rows.groupBy(_._1).map { case (key, g) =>
      key -> g.map(r => (r._2, r._3))
        .sortBy { case (s, id) => (-s, id) }.take(4)
    }
    assert(got.keySet === expected.keySet)
    got.foreach { case (key, top) => assert(top === expected(key), s"key $key") }
  }
}
