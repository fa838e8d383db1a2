package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.graftshim.CheckpointShim

/** One-generation residency tracker for persisted / eager-checkpointed
  * frames whose lifetime a LAZY return value prevents scoping with
  * try/finally (the pair-sweep tracker pattern, factored once in round
  * 16 so every family shares the same release semantics).
  *
  * Discipline:
  *  - `evict()` runs BEFORE the new generation is built (the
  *    plan-equality rule: `Dataset.unpersist` removes CacheManager
  *    entries by LOGICAL PLAN, so evicting after re-persisting a
  *    plan-identical relation would silently de-cache the NEW
  *    generation — the q144 evict-before-register regression);
  *  - [[GenTracker.release]] frees checkpointed frames at the RDD-block
  *    layer (ADVICE r15: on those, `Dataset.unpersist` is a
  *    CacheManager no-op and blocks were only ever GC-reclaimed);
  *  - a released CHECKPOINTED frame is unrecoverable by design (the
  *    checkpoint truncated its lineage), so eviction must only run once
  *    the previous generation's consumers have acted — which the
  *    catalog's sequential execution order guarantees: a query's plan
  *    fully executes before the next query composes.
  */
final class GenTracker {
  private val live =
    new java.util.concurrent.atomic.AtomicReference[Seq[DataFrame]](Nil)

  /** Free the previous generation's storage. Call before building the
    * replacement generation. */
  def evict(): Unit = live.getAndSet(Nil).foreach(GenTracker.release)

  /** Register the new generation (replaces, does not free, any current
    * registration — pair with a preceding evict()). */
  def set(frames: DataFrame*): Unit = live.set(frames)

  /** Append to the current generation — for frames created by a CALLER
    * around a helper that already evicted+set (registering them before
    * the call would let the helper's evict free them mid-composition). */
  def add(frames: DataFrame*): Unit =
    live.getAndUpdate(cur => cur ++ frames)
}

object GenTracker {
  /** Free a frame's storage at whichever layer holds it: the underlying
    * RDD's blocks for checkpointed frames, the CacheManager entry for
    * plain persists. Non-blocking in both cases. */
  def release(df: DataFrame): Unit =
    CheckpointShim.checkpointedRdd(df) match {
      case Some(rdd) => rdd.unpersist(blocking = false); ()
      case None => df.unpersist(false); ()
    }
}
