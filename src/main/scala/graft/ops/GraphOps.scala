package graft.ops

import graft.Q
import graft.schema.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Iterative graph analytics over relations — PageRank-style centrality
  * on the product co-purchase graph.
  *
  * Why it belongs in a training-data engine: link-style centrality is the
  * classic corpus-quality prior (Common-Crawl-lineage pipelines weight
  * sources by harmonic/PageRank centrality of their hosts), and the same
  * iterate-join-aggregate shape underlies label propagation and the
  * dup-cluster resolution already in the catalog (q45's connected
  * components). This module pins the general pattern: edges persisted
  * once, a node-sized rank relation re-derived per iteration (join on
  * src, shuffle on dst), lineage truncated with localCheckpoint exactly
  * like q45's CC loop so 10-iteration plans don't compound.
  *
  * Determinism discipline: ranks are FIXED-POINT BIGINTs (scale 1e9),
  * every per-edge contribution is integer `div` (truncating — all values
  * non-negative, so identical to floor in both engines), so the result is
  * bit-exact across Spark and DuckDB regardless of aggregation order —
  * the float-order hazard that plagues naive PageRank comparisons never
  * arises (the q115 floor-quantization discipline applied to iteration).
  *
  * Scale (100 TB): the rank relation is node-sized, never edge-sized; the
  * per-iteration shuffle carries one (dst, contrib) pair per edge — at
  * cluster scale the edge relation is written `bucketBy(src)` so the
  * rank⋈edges join is co-located and only the dst-aggregation exchanges.
  * Nothing is collected to the driver; the node count enters the plan as
  * a broadcast 1-row aggregate.
  */
object GraphOps {

  /** Directed co-purchase edges: (src, dst) part pairs that appear in at
    * least one common order, both directions, deduplicated. Cost: one
    * self-equi-join on the order key (shuffle of (order, part) pairs —
    * the exchange is planned once and reused for both sides), output ∝
    * Σ items-per-order² — bounded by basket size, not catalog size.
    *
    * Layout: the result is hash-partitioned by DST, and the dedup rides
    * that exchange for free — HashPartitioning(dst) satisfies the
    * ClusteredDistribution(src, dst) the dropDuplicates aggregate needs
    * (all copies of a (src, dst) pair share a dst), so Catalyst plans NO
    * second exchange. dst-clustering is the layout the PageRank iteration
    * wants (contributions aggregate by dst), which is why the builder
    * pays its one edge-sized exchange on dst rather than on the pair.
    */
  def coPurchaseEdges(lineitem: DataFrame): DataFrame = {
    val op = lineitem.select(col("l_orderkey").as("ok"),
      col("l_partkey").as("pk"))
    op.as("a").join(op.as("b"),
        col("a.ok") === col("b.ok") && col("a.pk") =!= col("b.pk"))
      .select(col("a.pk").as("src"), col("b.pk").as("dst"))
      .repartition(col("dst"))
      .dropDuplicates("src", "dst")
  }

  /** Fixed-point PageRank: damping 0.85, `iters` synchronous iterations,
    * ranks scaled by `scale` as BIGINTs. Every node in `edges` has
    * out-degree ≥ 1 (the co-purchase graph is symmetric), so there is no
    * dangling mass and the per-iteration update is exactly
    * r'(v) = (15·scale) div (100·N) + Σ_{u→v} (r(u)·85) div (100·deg(u)).
    *
    * Iteration shape (measured 11.9 s → ~5 s at sf0.1): the edge relation
    * is persisted ONCE and never moves again — each iteration joins it
    * against a BROADCAST node-sized (rank, deg) relation and aggregates
    * by dst, which is exchange-free when `edges` arrive dst-partitioned
    * (coPurchaseEdges's layout; with any other layout the plan stays
    * correct and pays one partial-aggregated exchange). Ranks are
    * eagerly localCheckpoint'ed per iteration, so iteration i is exactly
    * one pass over the cached edges — no lineage recompute, the q45 CC
    * discipline. At cluster scale, when the node set outgrows the
    * broadcast threshold, the same loop runs with edges written
    * `bucketBy(src)` and a shuffled rank join — per-iteration edge
    * movement stays zero.
    */
  def pageRankScaled(edges: DataFrame, iters: Int,
      scale: Long = 1000000000L): DataFrame = {
    val ed = edges.persist()
    // node-sized out-degree relation; eager checkpoint = exactly one
    // pass over the cached edges, and every later use is free
    val deg = ed.groupBy(col("src")).agg(count(lit(1)).as("deg"))
      .localCheckpoint()
    val nNodes = broadcast(deg.agg(count(lit(1)).as("n_nodes")))
    var ranks = deg.select(col("src").as("node")).crossJoin(nNodes)
      .select(col("node"), expr(s"${scale}L div n_nodes").as("r"))
      .localCheckpoint()
    for (_ <- 1 to iters) {
      // (rank, deg) per node — a tiny checkpointed-⋈-checkpointed join,
      // broadcast to the edge scan
      val rd = ranks.join(deg, ranks("node") === deg("src"))
        .select(col("node"), col("r"), col("deg"))
      ranks = ed.join(broadcast(rd), ed("src") === rd("node"))
        .select(col("dst"), expr("r * 85L div (100L * deg)").as("c"))
        .groupBy(col("dst")).agg(sum(col("c")).as("rc"))
        .crossJoin(nNodes)
        .select(col("dst").as("node"),
          (expr(s"${scale}L * 15L div (100L * n_nodes)") + col("rc"))
            .as("r"))
        .localCheckpoint()
    }
    ed.unpersist()
    ranks
  }

  val catalog: Seq[Q] = Seq(

    // ---- co-purchase PageRank (q129): 5 fixed-point iterations over the
    // lineitem co-purchase graph, top-20 parts by rank (rank desc, part
    // asc — a total order, so the limit is deterministic). The oracle
    // replays the identical integer recurrence as five chained CTEs in
    // DuckDB — bit-exact BIGINT equality, no float tolerance anywhere.
    Q("q129_pagerank",
      (s, d) => {
        val ranks = pageRankScaled(
          coPurchaseEdges(Tables.lineitem(s, d)), iters = 5)
        ranks.select(col("node").as("part"), col("r").as("rank_scaled"))
          .orderBy(col("rank_scaled").desc, col("part"))
          .limit(20)
      },
      Some("""WITH e AS (SELECT DISTINCT a.l_partkey AS src,
                  b.l_partkey AS dst
                FROM lineitem a JOIN lineitem b
                  ON a.l_orderkey = b.l_orderkey
                 AND a.l_partkey <> b.l_partkey),
              deg AS (SELECT src, count(*) AS deg FROM e GROUP BY src),
              nn AS (SELECT count(*) AS n FROM deg),
              r0 AS (SELECT src AS node,
                       CAST(1000000000 AS BIGINT) // n AS r
                     FROM deg, nn),
              it1 AS (SELECT e.dst AS node,
                  CAST((CAST(1000000000 AS BIGINT) * 15) // (100 * nn.n)
                  + sum((r.r * 85) // (100 * d.deg)) AS BIGINT) AS r
                FROM e JOIN r0 r ON r.node = e.src
                  JOIN deg d ON d.src = e.src, nn
                GROUP BY e.dst, nn.n),
              it2 AS (SELECT e.dst AS node,
                  CAST((CAST(1000000000 AS BIGINT) * 15) // (100 * nn.n)
                  + sum((r.r * 85) // (100 * d.deg)) AS BIGINT) AS r
                FROM e JOIN it1 r ON r.node = e.src
                  JOIN deg d ON d.src = e.src, nn
                GROUP BY e.dst, nn.n),
              it3 AS (SELECT e.dst AS node,
                  CAST((CAST(1000000000 AS BIGINT) * 15) // (100 * nn.n)
                  + sum((r.r * 85) // (100 * d.deg)) AS BIGINT) AS r
                FROM e JOIN it2 r ON r.node = e.src
                  JOIN deg d ON d.src = e.src, nn
                GROUP BY e.dst, nn.n),
              it4 AS (SELECT e.dst AS node,
                  CAST((CAST(1000000000 AS BIGINT) * 15) // (100 * nn.n)
                  + sum((r.r * 85) // (100 * d.deg)) AS BIGINT) AS r
                FROM e JOIN it3 r ON r.node = e.src
                  JOIN deg d ON d.src = e.src, nn
                GROUP BY e.dst, nn.n),
              it5 AS (SELECT e.dst AS node,
                  CAST((CAST(1000000000 AS BIGINT) * 15) // (100 * nn.n)
                  + sum((r.r * 85) // (100 * d.deg)) AS BIGINT) AS r
                FROM e JOIN it4 r ON r.node = e.src
                  JOIN deg d ON d.src = e.src, nn
                GROUP BY e.dst, nn.n)
              SELECT node AS part, r AS rank_scaled FROM it5
              ORDER BY rank_scaled DESC, part LIMIT 20"""))
  )
}
