package graft.ops

import org.apache.spark.sql.DataFrame

/** Gate for in-plan verification cost (VERDICT r3 #1).
  *
  * Several catalog queries carry their own correctness verification inside
  * the plan: an exact brute-force top-k to measure ANN recall (q41/q44/q74),
  * an all-pairs signature scan to check pigeonhole completeness (q36). That
  * verification is the POINT at oracle scale — the driver's DuckDB compare
  * runs at sf0.01 and the invariants must be computed, not assumed — but it
  * is quadratic, i.e. exactly the cost the production operator exists to
  * avoid. Charging it to the benched plan at sf0.1+ means the bench measures
  * the oracle, not the operator, and the n² term eventually IS the bench.
  *
  * So: verification stays in-plan only while the verified input is at most
  * [[MaxRows]] rows (covers every oracle SF; the driver verifies at sf0.01 =
  * 500 docs/vectors). Above the gate the query runs the production path
  * alone and the verification columns report the un-checked sentinel —
  * honestly documented at each use site — while the same properties are
  * asserted for all sizes in the spec tier (VectorOpsSpec recall ≥ 0.9 on
  * clustered data, TextOpsSpec pigeonhole-vs-brute equality), where the
  * quadratic oracle runs on purpose-built small corpora.
  */
object VerifyGate {

  /** Largest verified-input size that keeps quadratic verification in the
    * benched plan. Sits between the driver's oracle SF (500 rows at sf0.01)
    * and the bench SF (2000-5000 rows at sf0.1).
    *
    * Memory derivation (VERDICT r13 #8): the gate bounds the QUADRATIC
    * term, so the worst in-plan verification is MaxRows² = 1e6 pairs —
    * at ~100 B/pair of join state that is ~100 MB spread across the
    * session's shuffle partitions (~3 MB/task at 32), comfortably inside
    * any executor; the gate probe itself reads MaxRows+1 rows (≤ ~1 MB).
    * A retune must keep MaxRows² × 100 B ≪ aggregate executor memory. */
  val MaxRows = 1000L

  /** Gate for LINEAR corpus-sized verification legs (VERDICT r14 #1 —
    * q193/q194's merge-equals-full rebuild and exact-rank pass). These
    * legs are O(n), not O(n²), so the quadratic MaxRows bound is the
    * wrong dial: the cost being gated is "one more full-corpus scan at
    * serve time", which a sketch-sized read exists to avoid. The bound
    * sits between the events table's oracle SF (10k rows at sf0.01 —
    * verification runs in-plan where the driver's DuckDB compare needs
    * it) and its bench SF (100k at sf0.1 — the production read stays
    * sketch-sized). Memory is not the constraint for a linear aggregate;
    * the bound only decides who pays a corpus scan. */
  val MaxRowsLinear = 20000L

  /** [[small]] for linear verification legs — same probe/force-flag
    * semantics, [[MaxRowsLinear]] bound. */
  def smallLinear(df: DataFrame): Boolean =
    sys.props.get("graft.forceVerify").contains("1") ||
      df.limit(MaxRowsLinear.toInt + 1).count() <= MaxRowsLinear

  /** True when `df` is small enough to verify in-plan. The probe reads at
    * most MaxRows+1 rows (limit pushes into the scan) — one cheap job, paid
    * by the benched query itself so the gate never hides cost.
    *
    * The `graft.forceVerify` system property (VERDICT r11 #5) holds the
    * gate open regardless of size, so the MEASUREMENT tier — RecallProbe
    * re-deriving the pinned recall constants, VectorOpsSpec's
    * sf-parameterized floor assertions — can compute the exact-vs-approx
    * comparison at bench SF (2000 vectors at sf0.1). Neither Bench nor
    * Verify sets it: benched plans and driver correctness runs always see
    * the honest size-gated behavior. */
  def small(df: DataFrame): Boolean =
    sys.props.get("graft.forceVerify").contains("1") ||
      df.limit(MaxRows.toInt + 1).count() <= MaxRows
}
