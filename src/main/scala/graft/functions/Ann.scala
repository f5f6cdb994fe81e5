package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Brute-force cosine kNN as a broadcast-index kernel.
  *
  * The declarative form (cross join + zip_with fold) allocates an
  * intermediate array per candidate pair — 40× slower than the baseline
  * at 4M pairs. This kernel broadcasts the (small) index side — N×d
  * doubles — and streams the query side through mapPartitions with
  * primitive-array dot products: the standard Spark "small index, big
  * query stream" ANN pattern (at larger index sizes the IVF-sharded
  * variant in Dedup.simsearch_ivf is the scale path).
  *
  * Bit-compatibility: the dot product and norm are the same left-to-right
  * folds the SQL formulation uses, so cosines are bit-identical to the
  * DuckDB oracle and the ranking (cos DESC, id ASC) is exact.
  */
object Ann {

  /** Hard cap on the collected index side (~512 MB of doubles at d=64).
    * The broadcast-index kernel's driver memory grows linearly with the
    * index; past this, the IVF path (Dedup.simsearch_ivf /
    * Graft.similarTopKIvf) is the declared scale route. */
  val MaxIndexRows: Int = 1 << 20

  def topkCosine(spark: SparkSession, embeddings: DataFrame, k: Int,
      maxIndexRows: Int = MaxIndexRows): DataFrame = {
    import spark.implicits._
    val vecs = embeddings
      .select(col("vec_id"), transform(col("embedding"), _.cast("double")).as("v"))
      .as[(Long, Seq[Double])]

    // Fail fast on an oversized index: the limit bounds what the driver
    // ever materializes, and the cap+1'th row proves the overflow.
    val collected = vecs.limit(maxIndexRows + 1).collect()
    require(collected.length <= maxIndexRows,
      s"Ann.topkCosine: index side exceeds $maxIndexRows rows — the broadcast-index " +
        "kernel is the small-index path; use the IVF route (simsearch_ivf / " +
        "Graft.similarTopKIvf) for indexes this large")
    val index: Array[(Long, Array[Double], Double)] = collected
      .sortBy(_._1)
      .map { case (id, v) =>
        val a = v.toArray
        var n = 0.0; var j = 0
        while (j < a.length) { n += a(j) * a(j); j += 1 }
        (id, a, math.sqrt(n))
      }
    val bc = spark.sparkContext.broadcast(index)

    vecs.mapPartitions { it =>
      val idx = bc.value
      it.flatMap { case (qid, qv) =>
        val q = qv.toArray
        var nq = 0.0; var j = 0
        while (j < q.length) { nq += q(j) * q(j); j += 1 }
        nq = math.sqrt(nq)
        // top-k by (cos DESC, id ASC) via insertion into a k-slot array
        val topC = new Array[Double](k)
        val topI = new Array[Long](k)
        var filled = 0
        var ii = 0
        while (ii < idx.length) {
          val (kid, kv, nk) = idx(ii)
          if (kid != qid) {
            var dot = 0.0; var p = 0
            while (p < kv.length) { dot += q(p) * kv(p); p += 1 }
            val cos = dot / (nq * nk)
            var pos = filled
            while (pos > 0 && (topC(pos - 1) < cos ||
              (topC(pos - 1) == cos && topI(pos - 1) > kid))) pos -= 1
            if (pos < k) {
              val upTo = math.min(filled, k - 1)
              var m = upTo
              while (m > pos) { topC(m) = topC(m - 1); topI(m) = topI(m - 1); m -= 1 }
              topC(pos) = cos; topI(pos) = kid
              if (filled < k) filled += 1
            }
          }
          ii += 1
        }
        (0 until filled).iterator.map(r => (qid, topI(r), r + 1, topC(r)))
      }
    }.toDF("i", "k", "rnk", "cos")
  }
}
