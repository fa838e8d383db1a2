package graft

import org.apache.spark.sql.functions._

/** Bucketed-table joins: the write-side co-location strategy that turns
  * the big fact-fact join shuffle-free at 100 TB. Both sides bucketed by
  * the join key into the same bucket count → SortMergeJoin consumes bucket
  * files directly, no Exchange on either side.
  */
class BucketingSpec extends SparkSpec {

  test("join of co-bucketed tables plans no shuffle on either side") {
    val sf = "/root/testdata/sf0.001"
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_customer")
    // a dropped-in-a-previous-JVM table leaves its warehouse directory
    // behind while the fresh session's catalog has no entry to DROP —
    // remove the locations directly
    val wh = new java.net.URI(spark.conf.get("spark.sql.warehouse.dir")).getPath
    Seq("b_orders", "b_customer").foreach { t =>
      val dir = new java.io.File(wh, t)
      if (dir.exists()) {
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles().foreach(rm)
          f.delete(); ()
        }
        rm(dir)
      }
    }
    spark.read.parquet(s"$sf/orders.parquet")
      .write.bucketBy(4, "o_custkey").sortBy("o_custkey")
      .mode("overwrite").saveAsTable("b_orders")
    spark.read.parquet(s"$sf/customer.parquet")
      .write.bucketBy(4, "c_custkey").sortBy("c_custkey")
      .mode("overwrite").saveAsTable("b_customer")

    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("b_customer")
        .join(spark.table("b_orders"), col("c_custkey") === col("o_custkey"))
        .groupBy(col("c_custkey")).agg(count(lit(1)).as("n"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      // the ONLY acceptable exchange would be none at all: bucket layout
      // satisfies the join's distribution requirement on both sides
      assert(!plan.contains("Exchange hashpartitioning"), plan)
      // and the result is still right
      val n = joined.count()
      assert(n == spark.table("b_customer")
        .join(spark.table("b_orders"), col("c_custkey") === col("o_custkey"))
        .select("c_custkey").distinct().count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    }
  }
}
