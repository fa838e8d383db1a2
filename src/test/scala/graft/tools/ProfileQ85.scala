package graft.ops

import org.apache.spark.sql.SparkSession

/** Dev-only profiler (test scope): q85/q86 warm wall after the shared
  * pair/label artifacts are built.
  *
  *   sbt "Test/runMain graft.ops.ProfileQ85"
  */
object ProfileQ85 {
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

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"  $label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    for (q <- Seq("q45_dup_clusters", "q85_canonical_docs",
        "q86_leakage_safe_split")) {
      time(s"$q cold") {
        spark.catalog.clearCache()
        graft.SparkEntry.queries(q)(spark, sfDir)
          .write.mode("overwrite").format("noop").save()
      }
      (1 to 2).foreach { _ =>
        time(s"$q warm") {
          spark.catalog.clearCache()
          graft.SparkEntry.queries(q)(spark, sfDir)
            .write.mode("overwrite").format("noop").save()
        }
      }
    }
    spark.stop()
  }
}
