package graft

import org.apache.spark.sql.DataFrame

/** Release discipline for `localCheckpoint`'d DataFrames inside iterative
  * loops (Dedup's components fixpoints, AffinityPropagation's damped
  * loop): a superseded generation's checkpoint RDD otherwise stays pinned
  * in storage memory until driver GC — across a 200-iteration loop, or
  * repeated runs in one session (the bench), that pressure evicts the
  * warmed table caches and, at distributed-AP scale, is up to
  * generations × N² rows of dead storage. */
private[graft] object Checkpoints {

  /** Unpersist the RDD(s) behind a localCheckpoint'd DataFrame. The plan
    * becomes unrecomputable — only call on a generation no later plan
    * reads. */
  def release(df: DataFrame): Unit =
    df.queryExecution.analyzed.collect {
      case r: org.apache.spark.sql.execution.LogicalRDD => r.rdd
    }.foreach(_.unpersist(false))
}
