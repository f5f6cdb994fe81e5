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

  /** The checkpoint RDD(s) behind a localCheckpoint'd DataFrame. An RDD
    * references the SparkContext but NOT the SparkSession, so a release
    * registry may hold these STRONGLY under a session-weak key without
    * making the entry unreclaimable — and the deterministic release then
    * survives the result DataFrame being GC'd first (round-8 ADVICE: a
    * WeakReference'd DataFrame value silently lapsed to the async
    * ContextCleaner whenever the result died before the next run). */
  def checkpointRdds(df: DataFrame): Seq[org.apache.spark.rdd.RDD[_]] =
    df.queryExecution.analyzed.collect {
      case r: org.apache.spark.sql.execution.LogicalRDD => r.rdd
    }

  /** Unpersist the RDD(s) behind a localCheckpoint'd DataFrame. The plan
    * becomes unrecomputable — only call on a generation no later plan
    * reads. */
  def release(df: DataFrame): Unit = releaseRdds(checkpointRdds(df))

  def releaseRdds(rdds: Seq[org.apache.spark.rdd.RDD[_]]): Unit =
    rdds.foreach(_.unpersist(false))
}
