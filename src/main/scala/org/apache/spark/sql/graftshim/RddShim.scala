package org.apache.spark.sql.graftshim

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.LogicalRDD

/** Companion to [[ColumnShim]]: reaches the `private[sql]` plan node behind
  * a `localCheckpoint()`ed frame so the engine can release its storage.
  *
  * `Dataset.localCheckpoint` persists an internal `RDD[InternalRow]` and
  * wraps it in a `LogicalRDD` leaf; `Dataset.unpersist` only consults the
  * `CacheManager`, which never knew about that RDD — so without this hook a
  * checkpointed frame's blocks are unreleasable through the public API.
  * [[graft.CacheScope]] uses it to give checkpoint blocks the same scoped
  * lifecycle as `persist()`ed plans.
  */
object RddShim {
  /** The checkpointed RDD behind `df`, if `df` is exactly a checkpoint /
    * existing-RDD leaf (possibly under a projection-free subquery alias). */
  def leafRdd(df: DataFrame): Option[RDD[_]] = df.queryExecution.analyzed match {
    case LogicalRDD(_, rdd, _, _, _, _) => Some(rdd)
    case _ => None
  }

  /** Every checkpoint / existing-RDD leaf anywhere in `df`'s plan — a
    * derived frame (filter/join/agg over a pinned frame) still references
    * the checkpointed RDD as one of its leaves. Used by
    * [[graft.CacheScope.requireLive]] to detect use-after-release. */
  def allLeafRdds(df: DataFrame): Seq[RDD[_]] =
    df.queryExecution.analyzed.collectLeaves().collect {
      case LogicalRDD(_, rdd, _, _, _, _) => rdd
    }
}
