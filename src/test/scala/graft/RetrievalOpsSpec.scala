package graft

import graft.ops.RetrievalOps
import org.apache.spark.sql.functions._

class RetrievalOpsSpec extends SparkSpec {
  import spark.implicits._

  test("held-out LM floors unseen bigrams and ranks a gibberish arrival " +
      "above in-distribution text (q151)") {
    val sf = "/root/testdata/sf0.001"
    val out = SparkEntry.queries("q151_heldout_lm")(spark, sf)
      .as[(Long, Int, Double)].collect()
    assert(out.nonEmpty)
    // Laplace floor: every probability positive -> every nll finite, > 0
    out.foreach { case (id, nBi, nll) =>
      assert(nBi > 0, s"doc $id has no bigram positions")
      assert(nll > 0 && !nll.isInfinite && !nll.isNaN,
        s"doc $id avg_nll=$nll")
    }
    // scoring covers exactly the increment docs with >= 2 tokens
    val docs = graft.schema.Tables.documents(spark, sf)
    val cut = math.floor(
      (docs.agg(max(col("doc_id"))).head.getLong(0) + 1) * 0.8).toLong
    val expected = docs.filter(col("doc_id") >= cut)
      .filter(size(graft.ops.TextOps.toks(col("text"))) >= 2).count()
    assert(out.length.toLong === expected)
    // a doc of tokens the snapshot never saw must out-nll every scored
    // doc: its bigram term is 0 and its unigram back-off is the floor
    val worstSeen = out.map(_._3).max
    val floorNll = {
      val totals = docs.filter(col("doc_id") < cut)
        .select(explode(graft.ops.TextOps.toks(col("text"))).as("t"))
        .agg(count(lit(1)).as("n"), countDistinct(col("t")).as("v"))
        .as[(Long, Long)].head()
      -math.log(0.3 * 1.0 / (totals._1 + totals._2))
    }
    assert(floorNll > worstSeen,
      s"floor $floorNll should exceed max observed $worstSeen")
  }

  test("incremental BM25 serve equals the from-scratch full-corpus run " +
      "bit-for-bit (q187)") {
    val sf = "/root/testdata/sf0.001"
    // tag = None forces a fresh snapshot build into a spec-private table;
    // the assertion is the operator's whole point: algebraic stat merges
    // (df, N, Σdl) make the maintained index EXACT, so the incrementally
    // served top-20 must equal q58's full rebuild including scores
    val inc = RetrievalOps.bm25Incremental(spark, sf,
        table = "graft_bm25_spec_postings", tag = None)
      .as[(Long, Double)].collect().toSeq
    val full = SparkEntry.queries("q58_bm25")(spark, sf)
      .as[(Long, Double)].collect().toSeq
    assert(full.nonEmpty && inc === full)
    // the serve probe must carry snapshot AND increment docs — otherwise
    // the equality above could hold vacuously on a degenerate split
    val cut = math.floor((spark.read.parquet(s"$sf/documents.parquet")
      .agg(max(col("doc_id"))).head.getLong(0) + 1) * 0.8).toLong
    assert(inc.exists(_._1 < cut) && inc.exists(_._1 >= cut),
      s"top-20 $inc spans only one side of the $cut split")
  }

  test("bigram quality matches the hand-computed interpolated LM") {
    // Corpus: d1 = "x y x", d2 = "x y".
    // Unigrams: c(x)=3, c(y)=2, N=5. Bigrams: c(x y)=2, c(y x)=1.
    // p(y|x) = 0.7*2/3 + 0.3*2/5, p(x|y) = 0.7*1/2 + 0.3*3/5.
    val docs = Seq((1L, "x y x"), (2L, "x y")).toDF("doc_id", "text")
    val out = RetrievalOps.bigramQuality(docs)
      .select("doc_id", "n_bi", "avg_nll").as[(Long, Int, Double)]
      .collect().map(r => r._1 -> (r._2, r._3)).toMap

    val pxy = 0.7 * 2.0 / 3.0 + 0.3 * 2.0 / 5.0
    val pyx = 0.7 * 1.0 / 2.0 + 0.3 * 3.0 / 5.0
    val d1 = (-math.log(pxy) - math.log(pyx)) / 2.0
    val d2 = -math.log(pxy)

    assert(out.keySet == Set(1L, 2L))
    assert(out(1L)._1 == 2 && out(2L)._1 == 1)
    assert(math.abs(out(1L)._2 - d1) < 1e-6, s"${out(1L)._2} vs $d1")
    assert(math.abs(out(2L)._2 - d2) < 1e-6, s"${out(2L)._2} vs $d2")
  }

  test("a document of improbable bigrams scores worse than a typical one") {
    // "a b" repeated is the corpus backbone; the rare doc chains tokens
    // that never co-occur elsewhere, so its interpolated probabilities
    // collapse to the 0.3-weighted unigram tail.
    val docs = Seq(
      (1L, "a b a b a b a b"),
      (2L, "a b a b a b a b"),
      (3L, "b a q z a q")).toDF("doc_id", "text")
    val scores = RetrievalOps.bigramQuality(docs)
      .select("doc_id", "avg_nll").as[(Long, Double)].collect().toMap
    assert(scores(3L) > scores(1L), scores.toString)
    assert(math.abs(scores(1L) - scores(2L)) < 1e-9)
  }

  test("frequent pairs: A-priori pruning drops rare-token pairs, support " +
      "counts distinct co-occurring docs, ties order lexically") {
    // 10 docs: 'a b' in all 10, 'c' in 5 (frequent), 'z' in 1 (pruned
    // by the 10% threshold? df=1 = 10% — threshold is >= so z stays...
    // use 20 docs so z's df=1 < 2 and prunes)
    val docs = ((1 to 20).map { i =>
      val extra = if (i <= 10) " c" else ""
      val rare = if (i == 1) " z" else ""
      (i.toLong, s"a b$extra$rare", "en", "s", 0L)
    }).toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = java.nio.file.Files.createTempDirectory("graft_fp").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = SparkEntry.queries("q171_frequent_pairs")(spark, dir)
      .as[(String, String, Long)].collect().toList
    // (a,b) support 20; (a,c)/(b,c) support 10; no pair involving z
    assert(out === List(("a", "b", 20L), ("a", "c", 10L), ("b", "c", 10L)),
      out)

    // association rules over the same corpus: c→a has confidence 1.0
    // (every c-doc has a), a→c only 0.5; both lift 1.0 (a is universal);
    // a↔b are perfectly associated (conf 1.0, lift 1.0)
    val rules = SparkEntry.queries("q173_association_rules")(spark, dir)
      .as[(String, String, Long, Double, Double)].collect().toList
    val byPair = rules.map(r => (r._1, r._2) -> ((r._3, r._4, r._5))).toMap
    assert(byPair(("c", "a")) === ((10L, 1.0, 1.0)), byPair)
    assert(byPair(("a", "c")) === ((10L, 0.5, 1.0)), byPair)
    assert(byPair(("a", "b")) === ((20L, 1.0, 1.0)), byPair)
    assert(!byPair.keySet.exists(p => p._1 == "z" || p._2 == "z"))
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }
}
