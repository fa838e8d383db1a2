package graft

import org.apache.spark.sql.SparkSession

/** Dev scratch main: time named catalog queries with the Bench policy
  * (min-of-2, cache-cleared, noop write). Usage:
  * `runMain graft.Scratch <sfDir> q44_ann_ivf q74_ann_pq ...` */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sf = args.head
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000).selectExpr("sum(id)").collect()
    args.tail.foreach { name =>
      val times = (1 to 2).map { _ =>
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, sf)
          .write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"TIME $name%-24s ${times.min}%8.2f s  (${times.map(t => f"$t%.2f").mkString(", ")})")
    }
    spark.stop()
  }
}
