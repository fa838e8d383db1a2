package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Dev-only plan/timing probe (test scope, never shipped): explains one
  * query from the catalog, times it Bench-style (rebuild + clearCache per
  * run), and prints per-stage wall times so plan-shape regressions can be
  * diagnosed without a full Bench run.
  * Usage: sbt "Test/runMain graft.tools.PlanProbe q35_ngram_jaccard [explain] [stages]"
  */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("q35_ngram_jaccard")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()
    @volatile var stages = List.empty[(Int, String, Long, Int)]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val ms = (for { s <- si.submissionTime; c <- si.completionTime }
          yield c - s).getOrElse(-1L)
        stages ::= ((si.stageId, si.name.takeWhile(_ != '\n').take(60), ms,
          si.numTasks))
      }
    })
    if (args.contains("explain"))
      graft.SparkEntry.queries(name)(spark, sfDir).explain("formatted")
    (1 to 3).foreach { i =>
      spark.catalog.clearCache()
      stages = Nil
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, sfDir)
        .write.mode("overwrite").format("noop").save()
      println(f"RUN$i ${(System.nanoTime() - t0) / 1e9}%.2f s  (${stages.size} stages)")
      if (args.contains("stages") && i == 3)
        stages.reverse.foreach { case (id, n, ms, nt) =>
          println(f"  stage $id%4d $ms%6d ms  $nt%3d tasks  $n")
        }
    }
    spark.stop()
  }
}
