package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-4 throwaway profiler: times the sub-stages of the regressed
  * queries (q41, q45) and the verification-entangled ones (q36, q44, q74)
  * at bench config (local[32], sf0.1) so the fix targets the real term. */
object ProfileR4 {
  def main(args: Array[String]): Unit = {
    val sf = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // warmup (same as Bench)
    spark.range(1000000).selectExpr("sum(id)").collect()
    spark.read.parquet(s"$sf/region.parquet").count()

    def time(label: String)(f: => Unit): Unit = {
      val times = (1 to 2).map { _ =>
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        f
        (System.nanoTime() - t0) / 1e9
      }
      println(f"PROF $label%-28s ${times.min}%8.2f s  (runs: ${times.map(t => f"$t%.2f").mkString(", ")})")
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()

    import graft.ops.PipelineOps
    import graft.schema.Tables

    // ---- q41 pieces
    val e = Tables.embeddings(spark, sf)
    time("q41.ann_only") {
      val q = e.filter(col("vec_id") < 10)
      val c = e.filter(col("vec_id") >= 10)
      noop(VectorOps.annTopK(q, c, dim = 64, k = 5))
    }
    time("q41.brute_only") {
      val q = e.filter(col("vec_id") < 10)
      val c = e.filter(col("vec_id") >= 10)
      noop(VectorOps.cosineTopK(q, c, k = 5))
    }
    time("q41.full_recall") {
      val q = e.filter(col("vec_id") < 10)
      val c = e.filter(col("vec_id") >= 10)
      noop(VectorOps.recallVsExact(
        VectorOps.annTopK(q, c, dim = 64, k = 5),
        VectorOps.cosineTopK(q, c, k = 5))
        .agg(count(lit(1)).as("n_queries")))
    }

    // ---- q44 pieces
    time("q44.build_probe_only") {
      val q = e.filter(col("vec_id") < 10)
      val c = e.filter(col("vec_id") >= 10)
      noop(VectorOps.ivfTopK(q, c, dim = 64, k = 5, nCells = 16, nProbe = 4))
    }

    // ---- q74 pieces
    time("q74.train_only") {
      val c = e.filter(col("vec_id") >= 10)
      val idx = VectorOps.pqTrain(c, dim = 64, m = 8, k = 16)
      noop(idx.index)
    }
    time("q74.probe_only") {
      val q = e.filter(col("vec_id") < 10)
      val c = e.filter(col("vec_id") >= 10)
      noop(VectorOps.pqTopK(
        VectorOps.pqTrain(c, dim = 64, m = 8, k = 16), q, k = 30))
    }
    time("q74.train_probe_rerank") {
      val q = e.filter(col("vec_id") < 10)
      val c = e.filter(col("vec_id") >= 10)
      noop(VectorOps.pqTopKReranked(
        VectorOps.pqTrain(c, dim = 64, m = 8, k = 16), q, c, k = 5,
        shortlist = 30))
    }

    // ---- q36 pieces
    time("q36.signatures_only") {
      noop(TextOps.simHashSignatures(
        Tables.documents(spark, sf).select(col("doc_id"),
          TextOps.toks(col("text")).as("tk"))))
    }
    time("q36.pigeon_only") {
      val sig = TextOps.simHashSignatures(
        Tables.documents(spark, sf).select(col("doc_id"),
          TextOps.toks(col("text")).as("tk")))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      noop(TextOps.simHashPairsFromSignatures(sig, maxHamming = 3)
        .agg(count(lit(1)).as("n_pairs")))
      sig.unpersist()
    }
    // ---- q41 finer: bucket assignment alone vs candidate join
    time("q41.buckets_only") {
      val c = e.filter(col("vec_id") >= 10)
      noop(VectorOps.hyperplaneBuckets(c, 64, 16, 4))
    }

    // ---- q45 pieces
    time("q45.pairs_only") {
      val sh = TextOps.docsWithShingles(spark, sf)
      noop(TextOps.exactJaccardPairs(sh, sh, 0.5)
        .select(col("id_a").as("a"), col("id_b").as("b")))
    }
    time("q45.full") {
      val sh = TextOps.docsWithShingles(spark, sf)
      val pairs = TextOps.exactJaccardPairs(sh, sh, 0.5)
        .select(col("id_a").as("a"), col("id_b").as("b"))
      val cc = PipelineOps.connectedComponents(pairs)
      noop(cc.groupBy(col("cluster_id")).agg(count(lit(1)).as("n_docs")))
    }
    spark.stop()
  }
}
