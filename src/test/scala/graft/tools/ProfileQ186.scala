package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dev-only profiler (test scope, never shipped): splits q186's prefix
  * filter into stages at a chosen SF.
  *
  *   sbt "Test/runMain graft.ops.ProfileQ186"
  */
object ProfileQ186 {
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

    val threshold = 0.5
    val docs = TextOps.docsWithShingles(spark, sfDir)
    val posts = docs
      .select(col("doc_id"), size(col("sh")).as("sz"),
        explode(col("sh")).as("s0"))
      .select(col("doc_id"), col("sz"), xxhash64(col("s0")).as("s"))
    val nPosts = time("posting stream count") { posts.count() }
    println(s"    posts=$nPosts")
    val dfRel = posts.groupBy(col("s")).agg(count(lit(1)).as("df"))
    val rarity = Window.partitionBy(col("doc_id"))
      .orderBy(col("df"), col("s"))
    val prefix = time("prefix build (df join + window)") {
      val p = posts.join(dfRel, Seq("s"))
        .withColumn("rn", row_number().over(rarity))
        .filter(col("rn") <= col("sz") - ceil(col("sz") * threshold) + 1)
        .select(col("s"), col("doc_id"), col("sz"))
        .persist()
      println(s"    prefix_posts=${p.count()}")
      p
    }
    val cand = time("bucket expansion + length filter") {
      val c = prefix.groupBy(col("s"))
        .agg(collect_set(struct(col("doc_id"), col("sz"))).as("ids"))
        .filter(size(col("ids")) > 1)
        .repartition(col("s"))
        .select(explode(col("ids")).as("a"), col("ids"))
        .select(col("a.doc_id").as("id_a"), col("a.sz").as("sz_a"),
          explode(filter(col("ids"),
            x => x("doc_id") > col("a.doc_id"))).as("b"))
        .select(col("id_a"), col("sz_a"), col("b.doc_id").as("id_b"),
          col("b.sz").as("sz_b"))
        .filter(least(col("sz_a"), col("sz_b")).cast("double") >=
          greatest(col("sz_a"), col("sz_b")) * threshold)
        .select(col("id_a"), col("id_b"))
        .dropDuplicates("id_a", "id_b")
        .persist()
      println(s"    candidates=${c.count()}")
      c
    }
    time("verify") {
      val v = TextOps.verifyJaccardCandidates(cand,
        TextOps.lookupForCandidates(docs, cand), threshold)
      println(s"    pairs=${v.count()}")
    }
    // bucket fanout distribution
    val fan = prefix.groupBy(col("s")).agg(count(lit(1)).as("n"))
      .agg(max(col("n")).as("max_n"),
        sum(col("n") * (col("n") - 1) / 2).as("sum_pairs"))
      .collect()(0)
    println(s"    max_bucket=${fan.get(0)} raw_pair_expansions=${fan.get(1)}")
    spark.stop()
  }
}
