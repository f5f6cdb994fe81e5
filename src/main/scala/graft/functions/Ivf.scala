package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic IVF seed selection shared by the ANN index
  * (Dedup.simsearch_ivf) and the sparse AP graph builder
  * (ap.AffinityPropagation.sparseSimilarities).
  *
  * Two stages, both deterministic and bounded:
  *   1. hash-spread sample: TakeOrdered of `sampleN` rows by
  *      xxhash64(vec_id) — an unbiased pseudo-random pick computed with
  *      an O(N) bounded heap, no full sort, no data-order dependence;
  *   2. greedy farthest-point selection of `k` seeds on the driver —
  *      O(sampleN·k) distance evaluations over the bounded sample, the
  *      classic k-center 2-approximation, which spreads seeds across the
  *      data's clusters far better than any random pick.
  *
  * The driver-side collect is `sampleN` rows (default 256) regardless of
  * table size — a bounded, scale-safe exception to the no-collect rule.
  */
object Ivf {

  /** Data-adaptive centroid count shared by the ANN index and the sparse
    * AP graph builder: min(⌈N/125⌉, ⌈√(8N)⌉), floored at 16 (identical
    * to the historical fixed 16 for every fixture N ≤ 2000) and capped
    * at 2²⁰. ⌈N/125⌉ keeps home buckets ~constant (bounded per-bucket
    * work) while the assignment crossJoin stays cheap; past N = 125 000
    * that growth would make the assignment stage quadratic (N·c), so
    * the count switches to the √(8N) balance point where assignment
    * (N·c·d) and in-bucket candidate work (N·nprobe·(N/c)·d) are both
    * Θ(N^1.5·d) — the single-level-IVF optimum. */
  def autoCentroids(n: Long): Int =
    math.min(1 << 20, math.max(16,
      math.min(math.ceil(n / 125.0), math.ceil(math.sqrt(8.0 * n))).toInt))

  /** (vec_id, vector) seed rows; `vecs` must have columns
    * (vec_id: long, v: array<double>). */
  def seeds(vecs: DataFrame, k: Int, sampleN: Int = 256): Seq[(Long, Seq[Double])] = {
    val sample = vecs
      .select(col("vec_id"), col("v"))
      .orderBy(xxhash64(col("vec_id")), col("vec_id")).limit(sampleN)
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    require(sample.nonEmpty, "Ivf.seeds: empty input")

    def d2(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { val t = a(i) - b(i); s += t * t; i += 1 }
      s
    }

    val chosen = scala.collection.mutable.ArrayBuffer(sample.minBy(_._1))
    val minD = Array.fill(sample.length)(Double.PositiveInfinity)
    var exhausted = false
    while (chosen.length < math.min(k, sample.length) && !exhausted) {
      var bi = -1; var bd = -1.0
      var i = 0
      while (i < sample.length) {
        val dd = math.min(minD(i), d2(sample(i)._2, chosen.last._2))
        minD(i) = dd
        // strict > with ascending scan ⇒ ties resolve to the smallest
        // sample index — deterministic
        if (dd > bd) { bd = dd; bi = i }
        i += 1
      }
      // bd == 0 ⇒ every remaining sample point coincides with a chosen
      // seed (duplicate embeddings — plausible in a dedup corpus). Stop
      // rather than emit duplicate seeds: downstream bucket assignment
      // has no distinct, and a duplicated centroid would let the same
      // neighbor fill two of the top-k rank slots (round-2 ADVICE).
      if (bd <= 0.0) exhausted = true
      else chosen += sample(bi)
    }
    chosen.map { case (id, v) => (id, v.toSeq) }.toSeq
  }
}
