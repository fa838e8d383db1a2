package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only profiler (test scope, never shipped) for the dup-cluster
  * family's cost split: pair detection vs connected-components loop vs
  * final aggregation. Prints wall times per piece so loop tuning
  * (VERDICT r5 #6) is measured, not guessed.
  *
  *   sbt "Test/runMain graft.ops.ProfileCC"
  * (lives in graft.ops for access to private[ops] docsWithShingles)
  */
object ProfileCC {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()
    spark.read.parquet(s"$sfDir/region.parquet").count()

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"  $label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    (1 to 3).foreach { round =>
      println(s"--- round $round (exact path, q45 shape) ---")
      spark.catalog.clearCache()
      val sh = TextOps.docsWithShingles(spark, sfDir)
      time("shingles materialize") {
        sh.write.mode("overwrite").format("noop").save()
      }
      val pairs = time("pairs (exact capped)") {
        val p = TextOps.exactJaccardPairsCapped(sh, 0.5, dfCap = 16)
          .select(col("id_a").as("a"), col("id_b").as("b"))
          .localCheckpoint(true)
        println(s"    n_pairs=${p.count()}")
        p
      }
      val labels = time("connectedComponents") {
        val l = PipelineOps.connectedComponents(pairs)
        l.write.mode("overwrite").format("noop").save()
        l
      }
      time("final agg") {
        labels.groupBy(col("cluster_id")).agg(count(lit(1)).as("n_docs"))
          .orderBy(col("cluster_id"))
          .write.mode("overwrite").format("noop").save()
      }

      println(s"--- round $round (lsh path, q45b shape) ---")
      spark.catalog.clearCache()
      val sh2 = TextOps.docsWithShingles(spark, sfDir)
      time("shingles materialize") {
        sh2.write.mode("overwrite").format("noop").save()
      }
      val pairs2 = time("pairs (minhash lsh)") {
        val p = TextOps.minHashLshPairs(sh2, 0.5, dfCap = 16)
          .select(col("id_a").as("a"), col("id_b").as("b"))
          .localCheckpoint(true)
        println(s"    n_pairs=${p.count()}")
        p
      }
      time("connectedComponents") {
        PipelineOps.connectedComponents(pairs2)
          .write.mode("overwrite").format("noop").save()
      }
    }
    spark.stop()
  }
}
