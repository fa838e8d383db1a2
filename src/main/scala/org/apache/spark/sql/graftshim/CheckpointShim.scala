package org.apache.spark.sql.graftshim

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.Dataset
import org.apache.spark.sql.execution.LogicalRDD

/** Access to the block-backed RDD beneath a (local)checkpointed Dataset.
  *
  * `Dataset.unpersist` routes through the CacheManager, which only knows
  * about `persist()`-registered plans — a checkpointed Dataset's storage
  * is RDD-level block storage the CacheManager never registered, so
  * `unpersist` on one is a silent no-op and the MEMORY_AND_DISK blocks
  * linger until the ContextCleaner happens to GC the RDD (ADVICE r15).
  * Deterministic release needs the underlying RDD, which only surfaces
  * through the `LogicalRDD` leaf the checkpoint planted — a package
  * detail this shim localizes next to [[ColumnShim]], the engine's one
  * other Spark-private touch point.
  */
object CheckpointShim {

  /** The checkpoint-backed RDD of `ds`, when `ds` is the direct result
    * of `Dataset.checkpoint`/`localCheckpoint` (analyzed plan = one
    * LogicalRDD leaf). None for ordinary Datasets — including plans
    * that merely CONTAIN a checkpointed subtree, which callers own. */
  def checkpointedRdd(ds: Dataset[_]): Option[RDD[_]] =
    ds.queryExecution.analyzed match {
      case l: LogicalRDD => Some(l.rdd)
      case _ => None
    }
}
