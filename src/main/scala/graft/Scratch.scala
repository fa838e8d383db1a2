package graft

import org.apache.spark.sql.SparkSession

/** Throwaway dev harness — run one query by name: runMain graft.Scratch <q> <sfDir>. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val name = args(0)
    val sf = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val df = SparkEntry.queries(name)(spark, sf)
    df.show(10, truncate = false)
    println("ROWS=" + df.count())
    if (args.length > 2 && args(2) == "explain") df.explain("formatted")
    spark.stop()
  }
}
