package graft

/** The bench-composition family of each catalog query (VERDICT r11 #1) —
  * shared by [[Bench]] (per-family subtotals in the metric line) and
  * `graft.tools.CatalogIndex` (the generated CATALOG.md).
  *
  *  - `stream`: membership in the StreamingOps catalog (programmatic) —
  *    pays checkpoint/state machinery per run;
  *  - `maint`: batch queries whose body REBUILDS a write-once artifact
  *    (snapshot index / versioned store / layout / MV / label store)
  *    every run — the amortizable cost the bench's measured per-query
  *    build_sec makes visible;
  *  - `batch`: everything else — the plan alone is the cost.
  */
object Families {
  lazy val streamSet: Set[String] =
    streaming.StreamingOps.catalog.map(_.name).toSet

  val maintSet: Set[String] = Set(
    "q34b_minhash_lsh_indexed", "q34c_minhash_incremental",
    "q44b_ann_ivf_indexed", "q44c_ann_ivf_incremental",
    "q117_contamination_indexed", "q121_exact_dedup_indexed",
    "q122_time_travel", "q125_zorder", "q127_compaction",
    "q128_incremental_mv", "q133_zorder_maintain", "q139_quantile_mv",
    "q142_shard_manifest", "q144_incremental_clusters", "q148_crawl_delta",
    "q149_semantic_dedup_incremental", "q158_winsorize_maintain",
    "q160_entity_resolution_incremental",
    "q165_dataset_card_incremental", "q178_zscore_maintain",
    "q187_bm25_incremental", "q191_hll_incremental",
    "q193_bottomk_quantile", "q196_cms_frequency",
    "q203_pareto_maintain", "q205_version_vacuum",
    "q207_packing_maintain", "q209_pagerank_maintain",
    "q210_transitivity_maintain")

  def of(name: String): String =
    if (streamSet(name)) "stream"
    else if (maintSet(name)) "maint"
    else "batch"
}
