package graft

import graft.ops.RetrievalOps

class RetrievalOpsSpec extends SparkSpec {
  import spark.implicits._

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
}
