package graft.ops

import org.apache.spark.sql.SparkSession

/** Dev-only profiler (test scope): q192 build (stream drain) vs serve. */
object ProfileQ192 {
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
    (1 to 3).foreach { i =>
      spark.catalog.clearCache()
      val df = time(s"rep$i build (drain)") {
        graft.SparkEntry.queries("q192_stream_hll_gate")(spark, sfDir)
      }
      time(s"rep$i serve (noop)") {
        df.write.mode("overwrite").format("noop").save()
      }
    }
    spark.stop()
  }
}
