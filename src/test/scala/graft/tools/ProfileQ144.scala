package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only profiler (test scope, never shipped): splits q144's WARM
  * maintain-phase wall (ArtifactCache hot on the snapshot index+labels)
  * into its stages so tail trimming is measured, not guessed.
  *
  *   sbt "Test/runMain graft.ops.ProfileQ144"
  */
object ProfileQ144 {
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
      println(f"  $label%-32s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    // cold run builds the shared artifacts (index + labels)
    time("q144 cold (artifact build)") {
      graft.SparkEntry.queries("q144_incremental_clusters")(spark, sfDir)
        .write.mode("overwrite").format("noop").save()
    }
    (1 to 3).foreach { round =>
      println(s"--- warm round $round ---")
      spark.catalog.clearCache()
      time("q144 warm total") {
        graft.SparkEntry.queries("q144_incremental_clusters")(spark, sfDir)
          .write.mode("overwrite").format("noop").save()
      }
    }

    // stage split of the warm path, replicating incrementalDupClusters'
    // structure against the hot artifacts
    println("--- warm stage split ---")
    spark.catalog.clearCache()
    val sh = TextOps.docsWithShinglesLazy(spark, sfDir)
    val cut = sh.agg(
      floor((max(col("doc_id")) + 1) * lit(0.8)).as("cut"))
    val incRaw = sh.crossJoin(broadcast(cut))
      .filter(col("doc_id") >= col("cut")).drop("cut")
    val inc = time("increment persist+count") {
      val i = incRaw.persist(); i.count(); i
    }
    val table = TextOps.SnapshotLshTable
    val incBands = time("increment banding (frozen hot)") {
      val b = TextOps
        .bandedSignaturesFrozenHot(inc, spark.table(s"${table}_hot"))
        .persist()
      b.count(); b
    }
    val crossCand = time("index probe (cross candidates)") {
      val c = spark.table(table)
        .select(col("band"), col("bucket"), col("doc_id").as("id_a"))
        .join(incBands.select(col("band"), col("bucket"),
          col("doc_id").as("id_b")), Seq("band", "bucket"))
        .select(col("id_a"), col("id_b"))
        .dropDuplicates("id_a", "id_b")
        .persist()
      c.count(); c
    }
    val cand = time("candidate union") {
      val c = crossCand
        .unionByName(TextOps.candidatesFromBandedIndex(incBands))
        .persist()
      c.count(); c
    }
    val edges = time("unified verify") {
      val e = TextOps.verifyJaccardCandidates(cand,
          TextOps.lookupForCandidates(sh, cand), 0.5)
        .select(col("id_a"), col("id_b")).localCheckpoint(true)
      e.count(); e
    }
    time("contract+closure+serve") {
      PipelineOps.mergeDeltaIntoLabels(
          spark.table(s"${table}_labels"), edges)
        .groupBy(col("cluster_id")).agg(count(lit(1)).as("n_docs"))
        .orderBy(col("cluster_id"))
        .write.mode("overwrite").format("noop").save()
    }
    spark.stop()
  }
}
