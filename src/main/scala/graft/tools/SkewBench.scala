package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted,
  SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import graft.ops.SkewData

/** Skew-mitigation measurement (VERDICT r10 #4): runs the q29/q18 salted
  * shapes and their plain twins against a ZIPFIAN fact table — a key
  * distribution the driver testdata doesn't have — and reports, per
  * variant: wall time, total shuffle bytes, and the LONGEST single task
  * (the straggler that decides wall-clock on a real cluster; a hot key is
  * invisible in totals but dominates this column). Results go to
  * SCALING.md's skew section.
  *
  * The fact table is WRITTEN to parquet first so every variant reads the
  * same multi-file scan (no in-memory range lineage differences), and the
  * plain SMJ runs both with AQE's skew split disabled (the unmitigated
  * baseline) and enabled (the automatic mitigation q29's manual salting
  * is the fallback for).
  *
  * Usage: `sbt "runMain graft.tools.SkewBench"` (~2 min at the default
  * 4M × 100k-key size).
  */
object SkewBench {

  private final class Meter extends SparkListener {
    @volatile var shuffleBytes = 0L
    @volatile var maxTaskMs = 0L
    override def onStageCompleted(e: SparkListenerStageCompleted): Unit =
      shuffleBytes += e.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten
    override def onTaskEnd(e: SparkListenerTaskEnd): Unit =
      if (e.taskInfo != null && e.taskInfo.duration > maxTaskMs)
        maxTaskMs = e.taskInfo.duration
    def reset(): Unit = { shuffleBytes = 0L; maxTaskMs = 0L }
  }

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val nRows = sys.env.getOrElse("SPARK_GRAFT_SKEW_ROWS", "4000000").toLong
    val nKeys = 100000
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val meter = new Meter
    spark.sparkContext.addSparkListener(meter)
    spark.range(1000000).selectExpr("sum(id)").collect() // warmup

    val dir = java.nio.file.Files.createTempDirectory("graft_skew").toString
    SkewData.fact(spark, nRows, nKeys, parts = cpus.toInt)
      .write.mode("overwrite").parquet(s"$dir/fact")
    val fact = spark.read.parquet(s"$dir/fact")
    val dim = SkewData.dim(spark, nKeys)

    def conf(k: String, v: String): Unit = spark.conf.set(k, v)

    // common: force SMJ for the join variants so the skew actually lands
    // on a shuffle (the dim is broadcastable at this size; at 100 TB the
    // dim that needs salting is the one that is NOT)
    def noBroadcast(): Unit =
      conf("spark.sql.autoBroadcastJoinThreshold", "-1")
    def restoreBroadcast(): Unit =
      conf("spark.sql.autoBroadcastJoinThreshold", "10485760")

    def measure(name: String)(mk: => org.apache.spark.sql.DataFrame)
        : Seq[Any] = {
      var best = Double.MaxValue
      var row: Seq[Any] = Nil
      var shuffleMb = 0.0
      var maxTaskS = 0.0
      (1 to 2).foreach { _ =>
        spark.catalog.clearCache()
        Thread.sleep(300)
        meter.reset()
        val t0 = System.nanoTime()
        val r = mk.collect()
        val sec = (System.nanoTime() - t0) / 1e9
        // drain the async listener bus BEFORE reading the meter, and
        // record shuffle/max-task from the SAME run as the best wall —
        // otherwise the printed straggler can come from a contended rep
        // while the wall comes from the clean one
        Thread.sleep(300)
        if (sec < best) {
          best = sec
          row = r.head.toSeq
          shuffleMb = meter.shuffleBytes / 1e6
          maxTaskS = meter.maxTaskMs / 1e3
        }
      }
      println(f"$name%-28s ${best}%7.2f s ${shuffleMb}%9.2f MB " +
        f"maxTask ${maxTaskS}%6.2f s   result=${row.mkString(",")}")
      row
    }

    println(s"zipf fact: $nRows rows, $nKeys keys, cpus=$cpus")
    // hot-key profile (the q77 diagnostic on this table)
    val prof = fact.groupBy("k").count()
      .selectExpr("count(*) n_keys", "max(count) max_cnt",
        "round(max(count) / avg(count), 1) skew_ratio")
      .collect().head
    println(s"profile: $prof")

    conf("spark.sql.adaptive.skewJoin.enabled", "false")
    noBroadcast()
    val a = measure("join plain SMJ (no AQE skew)")(
      SkewData.plainJoinAgg(fact, dim))
    conf("spark.sql.adaptive.skewJoin.enabled", "true")
    val b = measure("join plain SMJ (AQE skew)")(
      SkewData.plainJoinAgg(fact, dim))
    conf("spark.sql.adaptive.skewJoin.enabled", "false")
    val c = measure("join salted x8 (q29 shape)")(
      SkewData.saltedJoinAgg(fact, dim, saltN = 8))
    restoreBroadcast()
    val d = measure("join broadcast dim")(
      SkewData.plainJoinAgg(fact, dim))
    require(Seq(b, c, d).forall(_ == a), "join variants disagree")

    val e = measure("agg plain")(SkewData.plainAgg(fact))
    val f = measure("agg salted x16 (q18 shape)")(
      SkewData.saltedAgg(fact, saltN = 16))
    require(e == f, "agg variants disagree")

    val g = measure("holistic agg plain")(SkewData.holisticAgg(fact))
    val h = measure("holistic agg salted x16")(
      SkewData.saltedHolisticAgg(fact, saltN = 16))
    require(g == h, "holistic agg variants disagree")

    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    spark.stop()
  }
}
