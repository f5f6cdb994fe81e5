package graft

import org.apache.spark.sql.SparkSession

/** Marker-file commit protocol shared by the engine's versioned targets
  * (the upsert sink, the ingest-dedup corpus, the persisted ANN index).
  * One discipline, three stores:
  *
  *   - `<root>/_commits/<incId>` — an INCREMENT is visible iff its
  *     marker exists; markers are written LAST, after every data
  *     directory of the increment, so a crash mid-write leaves an
  *     invisible orphan the retry overwrites. Increment markers are the
  *     exactly-once HIGH-WATER MARK (the Delta txn-appId semantics) and
  *     are therefore NEVER deleted by compaction — only their data
  *     directories retire once a generation covers them.
  *   - `<root>/_gens/<genId>_<coveredMaxInc>` — a GENERATION is a
  *     committed compaction of every increment with id ≤ coveredMaxInc.
  *     Readers resolve the highest committed generation plus the tail
  *     increments above its cover, so read-plan fan-in is bounded by
  *     (1 generation + tail) at any lifetime batch count. Generation ids
  *     grow monotonically; the covered bound rides the marker NAME so
  *     resolution needs no file reads.
  *
  * All operations are driver-side filesystem metadata — no Spark jobs. */
private[graft] object MarkerStore {

  type Path = org.apache.hadoop.fs.Path

  def fs(spark: SparkSession, dir: String): org.apache.hadoop.fs.FileSystem =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Touch a marker file (parents created; overwrite is a no-op commit —
    * idempotent retries land the same marker). */
  def touch(spark: SparkSession, path: String): Unit = {
    val out = fs(spark, path).create(new Path(path), true)
    out.close()
  }

  def commitInc(spark: SparkSession, root: String, id: Long): Unit =
    touch(spark, s"$root/_commits/$id")

  def committedIncs(spark: SparkSession, root: String): Seq[Long] = {
    val f = fs(spark, root)
    val dir = new Path(s"$root/_commits")
    if (!f.exists(dir)) Seq.empty
    else f.listStatus(dir).toSeq.map(_.getPath.getName.toLong)
  }

  def commitGen(spark: SparkSession, root: String, gen: Long,
      covered: Long): Unit =
    touch(spark, s"$root/_gens/${gen}_$covered")

  /** Every committed (genId, coveredMaxInc), unordered. */
  def committedGens(spark: SparkSession, root: String): Seq[(Long, Long)] = {
    val f = fs(spark, root)
    val dir = new Path(s"$root/_gens")
    if (!f.exists(dir)) Seq.empty
    else f.listStatus(dir).toSeq.map { s =>
      val n = s.getPath.getName
      val cut = n.indexOf('_', 1) // genId ≥ 1, so position 0 is a digit
      (n.substring(0, cut).toLong, n.substring(cut + 1).toLong)
    }
  }

  /** The live generation — highest committed genId — with its cover. */
  def liveGen(spark: SparkSession, root: String): Option[(Long, Long)] =
    committedGens(spark, root) match {
      case s if s.isEmpty => None
      case s => Some(s.maxBy(_._1))
    }

  /** Reader resolution: (live generation if any, committed increment ids
    * ABOVE its cover, ascending). With no generation the tail is every
    * committed increment. */
  def resolve(spark: SparkSession, root: String): (Option[(Long, Long)], Seq[Long]) = {
    val gen = liveGen(spark, root)
    val floor = gen.map(_._2).getOrElse(Long.MinValue)
    (gen, committedIncs(spark, root).filter(_ > floor).sorted)
  }
}
