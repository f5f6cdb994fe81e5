package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off validation (round 10): the two-level IVF assignment inside
  * the sparse AP graph builder, forced via an explicit centroid count
  * above Ivf.TwoLevelThreshold, must still produce a graph AP converges
  * on with a sane exemplar count. */
object TwoLevelProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.1")
      .select("vec_id", "embedding")
    val t0 = System.nanoTime()
    val flat = ap.AffinityPropagation.sparseSimilarities(emb, 50, centroids = 300)
    val nFlat = flat.count()
    val t1 = System.nanoTime()
    val two = ap.AffinityPropagation.sparseSimilarities(emb, 50, centroids = 600)
    val nTwo = two.count()
    val t2 = System.nanoTime()
    println(f"flat c=300: $nFlat edges in ${(t1 - t0) / 1e9}%.1f s; " +
      f"two-level c=600: $nTwo edges in ${(t2 - t1) / 1e9}%.1f s")
    val r = ap.AffinityPropagation.solveFromSimilarities(spark, two,
      localNodeThreshold = 0)
    println(s"AP on two-level graph: converged=${r.converged} " +
      s"iters=${r.iterations} exemplars=${r.exemplars.size}")
    spark.stop()
  }
}
