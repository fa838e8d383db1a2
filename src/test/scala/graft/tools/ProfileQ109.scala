package graft.ops

import org.apache.spark.sql.SparkSession

/** Dev-only profiler (test scope): q109/q146 drain cost. */
object ProfileQ109 {
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
      println(f"  $label%-24s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    for (q <- Seq("q109_stream_neardup_gate", "q146_stream_cluster_maintain");
         i <- 1 to 3) {
      spark.catalog.clearCache()
      val df = time(s"$q rep$i build") {
        graft.SparkEntry.queries(q)(spark, sfDir)
      }
      time(s"$q rep$i serve") {
        df.write.mode("overwrite").format("noop").save()
      }
    }
    spark.stop()
  }
}
